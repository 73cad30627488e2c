"""kgspark — a PySpark-native knowledge-graph construction engine.

Brand-new implementation of the capabilities of the reference repo
ishanc/knowledgeGraph (a single-process Flask + networkx + LLM app), re-expressed
Spark-first: declarative DataFrame plans, vectorized Arrow/pandas UDFs only,
broadcast/shuffle-aware joins, salted skew handling, and a resumable
checkpoint-manifest pipeline.

Module map (SURVEY.md §7.1):
  session    — SparkSession factory (Arrow, AQE, skew-join on)
  textnorm   — byte-identical clean_text / json byte-cleaning (ref knowledgeGraph.py:14-20)
  html       — deterministic html(binary) -> text extractor
  synth      — seeded Common-Crawl-style `pages` corpus + golden triples
  chunk      — sentence chunker (ref knowledge_graph_builder.py:304-342)
  embed      — dedup-embed-join with a deterministic feature-hash embedder
  openie     — rule-based hierarchical concept extractor (ref :198-235 semantics)
  linking    — alias-table entity linking with candidate scoring
  canon      — MinHash-LSH blocking + connected-components canonicalization
  edges      — fwd/rev typed weighted edge generator (ref :527-563)
  topics     — clustering + tf-idf top-k + topic naming (ref :237-302)
  graph_api  — triple query / node history / confidence / validate (ref :675-738)
  dedup      — exact / minhash-LSH / simhash / prefix-filtered ngram-jaccard /
               embedding near-dup
  similarity — brute-force + sign-LSH + IVF cosine top-k ANN
  textstats  — lang-id, quality scoring, token counting, fingerprinting
  multimodal — binary-column decode/feature plumbing (decode stubbed)
  entities   — E3 entity+relation extraction API surface
  sources    — S1-S7 binary-file format dispatch (codec-less formats stubbed)
  schema_induce — A10 dynamic schema induction from nested JSON
  validate   — P5/P6 envelope validation + JSON byte repair
  catalog    — S12/S13 document catalog list / row-delete
  viz        — S11 bounded-sample self-contained HTML graph export
  skew       — salted two-phase aggregation, hot-key detection
  streaming  — incremental KG via foreachBatch merge-dedup
  checkpoint — per-stage manifest, lineage counters + timings, resume
  io_tables  — Iceberg-or-parquet catalog seam, table schemas
  pipeline   — end-to-end spark-submit driver

Round-2/3 additions:
  graph_algs — pagerank / HITS / trustrank / k-hop BFS / triangles /
               common-neighbor link prediction / LPA communities / k-core
  density    — DBSCAN via banded-LSH eps-graph + connected components
  relops     — as-of join, bucketized range join
  kgtrain    — deterministic KG-embedding negative sampling
  curate     — fused single-pass corpus curation (annotate-don't-drop)
  skew       — salted aggregation/joins, hot-key detection
  ole        — pure-stdlib OLE2/CFB + BIFF8 .xls + [MS-DOC] .doc codecs
  trainprep  — train/val/test hash split, greedy packing, source mixing
  pii        — regex PII detect/count/redact (Java∩RE2 subset)
  decontam   — 13-gram benchmark decontamination
  web        — host graph, URL-canonical dedup, domain caps, anchor text,
               Milne-Witten commonness priors + mention linking
  lm         — corpus-trained bigram-LM perplexity + CCNet NTILE buckets
  quotes     — quotation attribution (speaker, said, quote)
  hearst     — Hearst-pattern hypernym triples
  cooc       — document-level PMI association edges
  summarize  — token-overlap centrality extractive summaries
  keywords   — per-document TF-IDF keyword extraction
"""

__version__ = "0.1.0"
