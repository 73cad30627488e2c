"""Structured-data extraction from web pages — the schema.org front door.

Real-world web-scale KG construction mines the structured data publishers
already embed: OpenGraph/meta tags, schema.org JSON-LD blocks, and HTML
tables. The reference pipeline extracts triples from free text only
(knowledge_graph_builder.py:268-340); these operators add the
structured-markup channel a Common-Crawl-scale run would lean on first,
since embedded JSON-LD is the highest-precision triple source on the web
(public specs: W3C JSON-LD 1.1, RDF 1.1 Concepts, schema.org, WHATWG HTML).

Scale posture:
- `meta_tags` / `html_tables` are pure JVM column expressions
  (regexp_extract_all + posexplode) — map-only, whole-stage codegen,
  no Python in the hot path.
- `jsonld_triples` does the block *extraction* JVM-side (codegen scan +
  posexplode prunes the overwhelming majority of pages that carry no
  JSON-LD before any Arrow transfer), then parses only the surviving
  payloads in an Arrow-batched mapInPandas stage — arbitrary nested JSON
  is the one part SQL genuinely can't express.

All regexes stay in the Java∩RE2∩DuckDB-common subset (ASCII literals,
lazy quantifiers, (?s) dotall, non-capturing groups) so the DuckDB
oracles replicate extraction exactly.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# One <meta ...> tag; body captured for attribute extraction. Attribute
# order varies in the wild (content before property and vice versa), so
# the attributes are pulled from the captured body, not the tag pattern.
META_TAG = "<meta ([^>]*?)/?>"
META_PROP = '(?:property|name)="([^"]*)"'
META_CONTENT = 'content="([^"]*)"'

# JSON-LD script blocks; (?s) because embedded JSON routinely spans lines.
JSONLD_BLOCK = '(?s)<script type="application/ld\\+json">(.*?)</script>'

# One element carrying an itemprop: tag name, attributes (no '>'), the
# closing '>', then the immediate text run. content= and inner text are
# pulled from the match afterwards.
MICRO_ELEM = '<[a-zA-Z0-9]+ [^>]*itemprop="[^"]*"[^>]*>[^<]*'
MICRO_PROP = 'itemprop="([^"]*)"'
MICRO_CONTENT = 'content="([^"]*)"'
MICRO_TEXT = ">([^<]*)$"

# One element carrying an RDFa-Lite property=: same flat-element shape as
# MICRO_ELEM. RDFa Lite (W3C) and HTML microdata are sibling syntaxes;
# OpenGraph <meta property="og:..."> is RDFa, so it lands here too.
RDFA_ELEM = '<[a-zA-Z0-9]+ [^>]*property="[^"]*"[^>]*>[^<]*'
RDFA_PROP = 'property="([^"]*)"'
RDFA_CONTENT = 'content="([^"]*)"'
RDFA_RESOURCE = '(?:resource|href)="([^"]*)"'
RDFA_TEXT = ">([^<]*)$"

# Breadcrumb trail container (ARIA authoring practice / Bootstrap
# convention: <nav aria-label="breadcrumb">) and its items — anchors plus
# the aria-current="page" terminal span, one alternation so document
# order is preserved in a single extract_all pass.
CRUMB_NAV = '(?s)<nav [^>]*aria-label="breadcrumb"[^>]*>(.*?)</nav>'
CRUMB_ITEM = ('<a [^>]*href="[^"]*"[^>]*>[^<]*</a>'
              '|<span [^>]*aria-current="page"[^>]*>[^<]*</span>')
CRUMB_HREF = 'href="([^"]*)"'
CRUMB_LABEL = ">([^<]*)</"

# HTML tables; (?s) for multi-line markup, lazy to split adjacent tables.
TABLE_BLOCK = "(?s)<table[^>]*>(.*?)</table>"
TABLE_ROW = "(?s)<tr[^>]*>(.*?)</tr>"
TABLE_CELL = "(?s)<t[dh][^>]*>(.*?)</t[dh]>"
ANY_TAG = "<[^>]*>"


def meta_tags(df: DataFrame, url_col: str = "url",
              html_col: str = "html") -> DataFrame:
    """Extract <meta property/name="..." content="..."> pairs per page:
    (url, tag_no, prop, content). OpenGraph (og:*), twitter:*, and plain
    name= metadata all land here — the publication-date / title / type
    signals an entity-linking stage joins against. Tags without a
    property/name attribute (charset etc.) are dropped.

    Map-only: one regexp_extract_all + posexplode, two per-tag extracts.
    """
    tags = F.regexp_extract_all(F.col(html_col), F.lit(META_TAG), F.lit(1))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(tags).alias("__pos", "__tag"),
    )
    return (
        ex.select(
            "url",
            (F.col("__pos") + 1).cast("long").alias("tag_no"),
            F.regexp_extract("__tag", META_PROP, 1).alias("prop"),
            F.regexp_extract("__tag", META_CONTENT, 1).alias("content"),
        )
        .where(F.col("prop") != "")
    )


def microdata_items(df: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Extract HTML-microdata properties per page: (url, item_no, prop,
    value) — the second structured-markup channel next to JSON-LD (WHATWG
    HTML microdata). An element's value is its content= attribute when
    present (meta/link style), else its immediate text run trimmed
    (span/a style, per the spec's textContent rule restricted to the flat
    first text node — nesting is out of scope and documented). itemscope
    grouping is not reconstructed; item_no is the document-order property
    index, which downstream blocking keys on alongside prop.

    Map-only: one regexp_extract_all + posexplode, three per-match
    extracts — same shape as meta_tags.
    """
    elems = F.regexp_extract_all(F.col(html_col), F.lit(MICRO_ELEM),
                                 F.lit(0))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(elems).alias("__pos", "__elem"),
    )
    content = F.regexp_extract("__elem", MICRO_CONTENT, 1)
    text = F.trim(F.regexp_extract("__elem", MICRO_TEXT, 1))
    return ex.select(
        "url",
        (F.col("__pos") + 1).cast("long").alias("item_no"),
        F.regexp_extract("__elem", MICRO_PROP, 1).alias("prop"),
        F.when(content != "", content).otherwise(text).alias("value"),
    )


def rdfa_properties(df: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Extract RDFa-Lite property annotations per page: (url, item_no,
    prop, value, is_iri) — the third embedded-markup channel next to
    JSON-LD and microdata (W3C RDFa Lite 1.1). The reference mines free
    text only (knowledge_graph_builder.py:268-340); a Common-Crawl-scale
    KG run reads all three publisher syntaxes.

    Object resolution follows RDFa Core's processing order restricted to
    flat elements: a content= attribute yields a literal (is_iri=0);
    otherwise resource=/href= yields an IRI object (is_iri=1); otherwise
    the element's immediate text run, trimmed, is the literal. Chaining /
    nested typeof subjects are out of scope (documented; item_no is the
    document-order property index, as in microdata_items). prefix=
    expansion is left to the caller — prop is emitted verbatim, so
    og:title / schema:name CURIEs survive for downstream vocab joins.

    Scale: map-only — one regexp_extract_all + posexplode, three per-match
    extracts, all JVM column expressions (no Python, no shuffle).
    """
    elems = F.regexp_extract_all(F.col(html_col), F.lit(RDFA_ELEM), F.lit(0))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(elems).alias("__pos", "__elem"),
    )
    content = F.regexp_extract("__elem", RDFA_CONTENT, 1)
    resource = F.regexp_extract("__elem", RDFA_RESOURCE, 1)
    text = F.trim(F.regexp_extract("__elem", RDFA_TEXT, 1))
    return ex.select(
        "url",
        (F.col("__pos") + 1).cast("long").alias("item_no"),
        F.regexp_extract("__elem", RDFA_PROP, 1).alias("prop"),
        F.when(content != "", content)
         .otherwise(F.when(resource != "", resource).otherwise(text))
         .alias("value"),
        F.when((content == "") & (resource != ""), F.lit(1))
         .otherwise(F.lit(0)).cast("long").alias("is_iri"),
    )


def breadcrumb_trails(df: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Extract breadcrumb navigation trails per page: (url, pos, label,
    href) — pos is 1-based position within the page's breadcrumb nav(s),
    href is '' for the aria-current="page" terminal item. Breadcrumbs are
    the publisher's own statement of where a page sits in the site
    taxonomy (schema.org BreadcrumbList's HTML form); the reference has
    no site-structure channel at all (its KG is text-extraction only,
    knowledge_graph_builder.py:268-340).

    Map-only: nav-block extract + item posexplode + per-item extracts,
    all JVM regex (Java∩RE2∩DuckDB subset).
    """
    navs = F.regexp_extract_all(F.col(html_col), F.lit(CRUMB_NAV), F.lit(1))
    # concat multiple navs before item extraction so pos numbers the
    # page's full crumb sequence (multi-nav pages are vanishingly rare
    # and still deterministic here)
    items = F.regexp_extract_all(
        F.array_join(navs, ""), F.lit(CRUMB_ITEM), F.lit(0))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(items).alias("__pos", "__item"),
    )
    return ex.select(
        "url",
        (F.col("__pos") + 1).cast("long").alias("pos"),
        F.trim(F.regexp_extract("__item", CRUMB_LABEL, 1)).alias("label"),
        F.regexp_extract("__item", CRUMB_HREF, 1).alias("href"),
    )


def breadcrumb_edges(trails: DataFrame) -> DataFrame:
    """Site-taxonomy induction from breadcrumb trails: consecutive-item
    pairs aggregated across pages into (parent, child, n_pages) edges —
    the corpus-level is-under graph (category → subcategory → leaf) that
    entity-linking and topic blocking join against.

    Scale: one window (partition by url — page-cardinality keys, no
    skew) for the successor lookup, then a partial-aggregating groupBy
    on the bounded label-pair space.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("pos")
    pairs = trails.select(
        "url", "label", F.lead("label").over(w).alias("__next")
    ).where(F.col("__next").isNotNull())
    return (
        pairs.groupBy(F.col("label").alias("parent"),
                      F.col("__next").alias("child"))
        .agg(F.count("*").cast("long").alias("n_pages"))
    )


def html_tables(df: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """Flatten every <table> into cells: (url, table_no, row_no, col_no,
    cell) with inner markup stripped and whitespace trimmed — the
    relational-data channel of a web corpus (infobox mining, list pages).
    <th> and <td> cells are treated alike; the header row is just row 1.

    Map-only: three nested regexp_extract_all + posexplode levels, all
    JVM-side.
    """
    tables = F.regexp_extract_all(F.col(html_col), F.lit(TABLE_BLOCK),
                                  F.lit(1))
    t = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(tables).alias("__tpos", "__table"),
    )
    rows = F.regexp_extract_all(F.col("__table"), F.lit(TABLE_ROW), F.lit(1))
    r = t.select(
        "url", "__tpos", F.posexplode(rows).alias("__rpos", "__row")
    )
    cells = F.regexp_extract_all(F.col("__row"), F.lit(TABLE_CELL), F.lit(1))
    c = r.select(
        "url", "__tpos", "__rpos",
        F.posexplode(cells).alias("__cpos", "__cell"),
    )
    return c.select(
        "url",
        (F.col("__tpos") + 1).cast("long").alias("table_no"),
        (F.col("__rpos") + 1).cast("long").alias("row_no"),
        (F.col("__cpos") + 1).cast("long").alias("col_no"),
        F.trim(F.regexp_replace("__cell", ANY_TAG, "")).alias("cell"),
    )


def _lex(v) -> str:
    """JSON lexical form for a scalar — matches what DuckDB's
    json_extract_string returns (true/false/null lowercase, numbers as
    written), so oracles replicate byte-for-byte."""
    if isinstance(v, str):
        return v
    return json.dumps(v)


def _flatten_node(node: dict, subj: str, block_no: int, node_no: int,
                  out: list, blank_seq: list) -> None:
    for key, val in node.items():
        if key == "@id":
            continue
        vals = val if isinstance(val, list) else [val]
        for item in vals:
            if isinstance(item, dict):
                child_id = item.get("@id")
                if not isinstance(child_id, str) or not child_id:
                    blank_seq[0] += 1
                    child_id = f"_:b{block_no}.{node_no}.{blank_seq[0]}"
                out.append((block_no, node_no, subj, key, child_id))
                _flatten_node(item, child_id, block_no, node_no,
                              out, blank_seq)
            elif isinstance(item, list):
                # nested arrays have no RDF meaning at this level; keep
                # the JSON lexical form so nothing is silently dropped
                out.append((block_no, node_no, subj, key, json.dumps(item)))
            else:
                out.append((block_no, node_no, subj, key, _lex(item)))


def jsonld_triples(df: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """schema.org JSON-LD → triples: (url, block_no, node_no, subj, pred,
    obj). Per page, every <script type="application/ld+json"> payload is
    parsed; a top-level object is one node, a top-level array is one node
    per element. subj is the node's @id, else a deterministic blank label
    `_:b{block}.{node}`; nested objects recurse with blank labels
    `_:b{block}.{node}.{seq}` in document order; arrays fan out one
    triple per element; scalars keep their JSON lexical form (`@type`
    rows carry the schema.org class). Unparseable payloads emit one
    (subj='', pred='@error', obj='json_decode') row — the error-column
    posture, never an exception (a 100 TB crawl always contains broken
    markup).

    JVM-side block extraction prunes no-JSON-LD pages before Arrow;
    parsing is an Arrow-batched mapInPandas stage (nested arbitrary JSON
    is not expressible as column ops).
    """
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_BLOCK),
                                  F.lit(1))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("__pos", "__payload"),
    )

    schema = ("url string, block_no long, node_no long, "
              "subj string, pred string, obj string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, bnos, nnos, subjs, preds, objs = [], [], [], [], [], []
            for url, pos, payload in zip(
                pdf["url"], pdf["__pos"], pdf["__payload"]
            ):
                block_no = int(pos) + 1
                try:
                    doc = json.loads(payload)
                except (ValueError, TypeError):
                    urls.append(url); bnos.append(block_no); nnos.append(0)
                    subjs.append(""); preds.append("@error")
                    objs.append("json_decode")
                    continue
                nodes = doc if isinstance(doc, list) else [doc]
                for node_idx, node in enumerate(nodes, start=1):
                    if not isinstance(node, dict):
                        continue
                    subj = node.get("@id")
                    if not isinstance(subj, str) or not subj:
                        subj = f"_:b{block_no}.{node_idx}"
                    out: list = []
                    _flatten_node(node, subj, block_no, node_idx, out, [0])
                    for bno, nno, s, p, o in out:
                        urls.append(url); bnos.append(bno); nnos.append(nno)
                        subjs.append(s); preds.append(p); objs.append(o)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "block_no": pd.Series(bnos, dtype="int64"),
                "node_no": pd.Series(nnos, dtype="int64"),
                "subj": pd.Series(subjs, dtype="object"),
                "pred": pd.Series(preds, dtype="object"),
                "obj": pd.Series(objs, dtype="object"),
            })

    return ex.mapInPandas(parse, schema)


def table_triples(cells: DataFrame, layout: str = "header") -> DataFrame:
    """Lift flattened table cells (html_tables output) into KG facts —
    the infobox/list-page mining step of web-scale KG construction
    (reference keeps tables as opaque text, knowledgeGraph.py:43-55;
    this is the structured channel it never taps).

    layout='header' (horizontal list tables):
      row 1 is the header; each later row describes the entity named in
      its first cell: (subj=row col 1, pred=header[col], obj=cell) for
      every col > 1 that has BOTH a header and a non-empty cell.
    layout='attribute' (vertical infobox tables):
      no header; every row with >= 2 cells is a fact about the PAGE:
      (subj=url, pred=col-1 cell, obj=col-2 cell).

    Empty subjects/preds/objs are dropped (stripped markup leaves ''
    cells). Output: (url, table_no, row_no, subj, pred, obj).

    Scale shape: two (one for 'attribute') self-equi-joins keyed on
    (url, table_no) — both sides partition identically so the second
    join reuses the first's exchange; header/subject sides are
    row-pruned before shuffling. No UDF, no collect.
    """
    if layout == "attribute":
        k = cells.where((F.col("col_no") == 1) & (F.col("cell") != ""))
        v = cells.where((F.col("col_no") == 2) & (F.col("cell") != ""))
        return (
            k.alias("k")
            .join(
                v.alias("v"),
                (F.col("k.url") == F.col("v.url"))
                & (F.col("k.table_no") == F.col("v.table_no"))
                & (F.col("k.row_no") == F.col("v.row_no")),
            )
            .select(
                F.col("k.url").alias("url"),
                F.col("k.table_no").alias("table_no"),
                F.col("k.row_no").alias("row_no"),
                F.col("k.url").alias("subj"),
                F.col("k.cell").alias("pred"),
                F.col("v.cell").alias("obj"),
            )
        )
    if layout != "header":
        raise ValueError(f"layout must be 'header' or 'attribute', got {layout!r}")
    hdr = (
        cells.where((F.col("row_no") == 1) & (F.col("cell") != ""))
        .select("url", "table_no", "col_no", F.col("cell").alias("pred"))
    )
    subj = (
        cells.where((F.col("row_no") > 1) & (F.col("col_no") == 1)
                    & (F.col("cell") != ""))
        .select("url", "table_no", "row_no", F.col("cell").alias("subj"))
    )
    data = cells.where(
        (F.col("row_no") > 1) & (F.col("col_no") > 1) & (F.col("cell") != "")
    )
    return (
        data.join(hdr, ["url", "table_no", "col_no"])
        .join(subj, ["url", "table_no", "row_no"])
        .select("url", "table_no", "row_no", "subj", "pred",
                F.col("cell").alias("obj"))
    )


def _json_escape(col):
    """Canonical JSON string escape chain (backslash first, then quote
    and the control characters) — replace column ops, byte-replicable in
    any SQL engine."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def jsonld_lines(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    base_iri: str = "https://kg.example.org/",
    pred_base: str = "https://kg.example.org/prop/",
) -> DataFrame:
    """Serialize a (subj, pred, obj) table to flattened JSON-LD node
    objects, one per line (W3C JSON-LD 1.1 flattened document form,
    newline-delimited) — the inverse sink of :func:`jsonld_triples`, so
    the schema.org front door round-trips.

    Each subject becomes ``{"@id": <iri>, <pred-iri>: ["v", ...], ...}``
    with predicates and values sorted (canonical output: a re-run or a
    different partitioning emits byte-identical lines). Subjects/
    predicates already IRIs pass through; bare names are minted under
    ``base_iri`` / ``pred_base`` exactly like ntriples_lines. Objects
    are emitted as JSON string literals with the canonical escape chain.

    Returns (subj, line). Plan: one (subj, pred) aggregation + one subj
    aggregation — two keyed shuffles, the second reusing the first's
    hash partitioning on the subj prefix.
    """
    s, p = F.col(subj_col), F.col(pred_col)
    s_iri = F.when(
        s.startswith("http://") | s.startswith("https://"), s
    ).otherwise(F.concat(F.lit(base_iri), s))
    p_iri = F.when(
        p.startswith("http://") | p.startswith("https://"), p
    ).otherwise(F.concat(F.lit(pred_base), p))
    vals = (
        triples.select(
            s_iri.alias("_s"), p_iri.alias("_p"),
            _json_escape(F.col(obj_col).cast("string")).alias("_v"),
        )
        .groupBy("_s", "_p")
        .agg(F.array_sort(F.collect_set("_v")).alias("_vs"))
    )
    frag = F.concat(
        F.lit('"'), _json_escape(F.col("_p")), F.lit('":["'),
        F.array_join("_vs", '","'), F.lit('"]'),
    )
    return (
        vals.select("_s", frag.alias("_frag"))
        .groupBy("_s")
        .agg(F.array_sort(F.collect_list("_frag")).alias("_frags"))
        .select(
            F.col("_s").alias("subj"),
            F.concat(
                F.lit('{"@id":"'), _json_escape(F.col("_s")), F.lit('",'),
                F.array_join("_frags", ","), F.lit("}"),
            ).alias("line"),
        )
    )
