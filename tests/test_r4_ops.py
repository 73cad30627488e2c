"""Round-4 ops: trained PQ codebooks + composed IVF-PQ.

Closes r3 verdict item #2: bounded-round distributed integer Lloyd per
subspace (kgspark.embed.train_pq_codebook), then PQ codes stored inside
IVF lists with residual encoding + ADC search (kgspark.similarity.
ivfpq_topk) — the Jégou et al. 2011 layout the code already cited.
"""

from __future__ import annotations

import pytest

from kgspark.embed import pq_codebook, train_pq_codebook
from kgspark.similarity import ivfpq_topk, pq_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _tdiv(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def _lloyd_inmemory(vecs, m, k, dsub, rounds, seed="pq", half_range=200000):
    """Pure-Python replica of the documented train_pq_codebook semantics:
    init = pq_codebook(seed); assignment = exact integer sq-L2 argmin with
    ties -> lowest centroid index; update = per-dim integer mean truncated
    toward zero; empty clusters keep the previous centroid."""
    book = pq_codebook(m, k, dsub, seed, half_range)
    subs = [
        (s, v[s * dsub:(s + 1) * dsub])
        for v in vecs
        for s in range(m)
    ]
    for _ in range(rounds):
        sums = {}
        for s, sub in subs:
            best_c, best_d = 0, None
            for c in range(k):
                d = sum((a - b) * (a - b) for a, b in zip(sub, book[s][c]))
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            n, acc = sums.setdefault((s, best_c), [0, [0] * dsub])
            sums[(s, best_c)][0] = n + 1
            for i, a in enumerate(sub):
                acc[i] += a
        new_book = [[list(book[s][c]) for c in range(k)] for s in range(m)]
        for (s, c), (n, acc) in sums.items():
            new_book[s][c] = [_tdiv(a, n) for a in acc]
        book = new_book
    return book


def _micro(vecs):
    # same quantization as the operators: round(x * 1e6) as int
    out = []
    for v in vecs:
        out.append([int(round(float(x) * 1000000.0)) for x in v])
    return out


def test_train_pq_codebook_matches_inmemory_lloyd(spark, emb):
    m, k, in_dim, rounds = 2, 4, 8, 2
    dsub = in_dim // m
    df = emb.selectExpr("vec_id", "slice(embedding, 1, 8) AS embedding")
    got = train_pq_codebook(df, m=m, k=k, in_dim=in_dim, rounds=rounds)
    vecs = _micro([r["embedding"] for r in df.collect()])
    want = _lloyd_inmemory(vecs, m, k, dsub, rounds)
    assert got == want


def test_trained_book_reduces_distortion(emb):
    """The point of training: total quantization error must not exceed the
    data-independent init book's (and on real data it drops a lot)."""
    m, k, in_dim = 8, 16, 64
    dsub = in_dim // m
    vecs = _micro([r["embedding"] for r in emb.collect()])
    init = pq_codebook(m, k, dsub)
    trained = train_pq_codebook(emb, m=m, k=k, in_dim=in_dim, rounds=2)

    def err(book):
        tot = 0
        for v in vecs:
            for s in range(m):
                sub = v[s * dsub:(s + 1) * dsub]
                tot += min(
                    sum((a - b) * (a - b) for a, b in zip(sub, book[s][c]))
                    for c in range(k)
                )
        return tot

    e_init, e_trained = err(init), err(trained)
    assert e_trained < e_init  # strictly tighter on real embeddings


def test_train_pq_codebook_rejects_bad_dims(emb):
    with pytest.raises(ValueError):
        train_pq_codebook(emb, m=7, in_dim=64)


def test_ivfpq_topk_shape_and_order(emb):
    out = ivfpq_topk(
        emb, emb.where("vec_id < 3"), k=5, nlist=8, nprobe=2,
        m=8, n_centroids=16, in_dim=64,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        dists = [r["dist"] for r in rows]
        assert dists == sorted(dists)
        assert all(r["vec_id"] != q for r in rows)


def test_ivfpq_recall_not_below_pq(emb):
    """r3-verdict done-criterion: composed IVF-PQ recall@k >= the plain
    PQ-ADC recall@k against exact integer-L2 brute-force truth.

    Compared at EQUAL scan coverage (nprobe = nlist, both methods score
    every candidate) over 40 queries — at few queries the 5-item truth
    sets make recall pure noise, and nprobe < nlist trades recall for
    pruning by design (that knob is exercised separately below)."""
    k, nq = 5, 40
    q = emb.where(f"vec_id < {nq}")
    vecs = {r["vec_id"]: v for r, v in
            ((r, _micro([r["embedding"]])[0]) for r in emb.collect())}

    def truth(qid):
        qv = vecs[qid]
        scored = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, v)), vid)
            for vid, v in vecs.items() if vid != qid
        )
        return {vid for _, vid in scored[:k]}

    def recall(df):
        hits = tot = 0
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        for qid, ids in got.items():
            t = truth(qid)
            hits += len(ids & t)
            tot += len(t)
        return hits / tot

    r_ivfpq = recall(ivfpq_topk(emb, q, k=k, nlist=8, nprobe=8,
                                m=8, n_centroids=16, in_dim=64))
    r_pq = recall(pq_topk(emb, q, k=k, m=8, n_centroids=16, in_dim=64))
    assert r_ivfpq >= r_pq
    assert r_ivfpq > 0


def test_ivfpq_nprobe_prunes_candidates(emb):
    """nprobe < nlist must actually prune: each query's candidates come
    only from its nprobe nearest lists (~nprobe/nlist of the corpus),
    and results still rank correctly within the probed subset."""
    out = ivfpq_topk(
        emb, emb.where("vec_id < 3"), k=5, nlist=8, nprobe=2,
        m=8, n_centroids=16, in_dim=64,
    ).collect()
    assert len(out) == 15  # 3 queries x full top-5 despite pruning
    # pruned search is a subset of the full-probe candidate order:
    full = ivfpq_topk(
        emb, emb.where("vec_id < 3"), k=500, nlist=8, nprobe=8,
        m=8, n_centroids=16, in_dim=64,
    ).collect()
    full_d = {(r["query_id"], r["vec_id"]): r["dist"] for r in full}
    for r in out:
        # same (query, candidate) pair scores identically either way:
        # dist depends only on the candidate's own list residual
        assert full_d[(r["query_id"], r["vec_id"])] == r["dist"]


# ---------------------------------------------------------------------------
# span_scrub: exact repeated-substring REMOVAL (r3 verdict item #5)
# ---------------------------------------------------------------------------

def test_span_scrub_byte_exact_on_crafted_corpus(spark):
    """Byte-exact expected output: 'a b c' owned by doc 0 pos 0; doc 2's
    three overlapping dup grams merge into one [0, 5) cut; docs 3/4 are
    wiped entirely; empty doc survives as ''."""
    from kgspark.dedup import span_scrub

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "x y a b c z"),
            (2, "a b c d e q"),
            (3, "a b c"),
            (4, "a b c"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_scrub(docs, k=3).collect()}
    want = {
        0: (6, 0, "a b c d e f"),   # owner of every dup gram it has
        1: (6, 3, "x y z"),         # [2, 5) cut
        2: (6, 5, "q"),             # [0,3)+[1,4)+[2,5) merged to [0,5)
        3: (3, 3, ""),              # whole doc duplicated
        4: (3, 3, ""),
        5: (0, 0, ""),              # no tokens at all
    }
    assert len(got) == len(want)
    for did, (nt, rm, txt) in want.items():
        r = got[did]
        assert (r["n_tokens"], r["removed_tokens"], r["clean_text"]) == \
            (nt, rm, txt), did


def test_span_scrub_preserves_unique_docs(spark):
    """Docs sharing no k-gram pass through whitespace-normalized only."""
    from kgspark.dedup import span_scrub

    docs = spark.createDataFrame(
        [(0, "alpha  beta\tgamma delta"), (1, "one two three four")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_scrub(docs, k=3).collect()}
    assert out[0]["clean_text"] == "alpha beta gamma delta"
    assert out[0]["removed_tokens"] == 0
    assert out[1]["clean_text"] == "one two three four"


# ---------------------------------------------------------------------------
# bpe_train_batched: bounded-jobs BPE training (r3 verdict item #6)
# ---------------------------------------------------------------------------

def _crafted_corpus(spark, n_docs=60):
    """Deterministic corpus with a few hundred distinct words so dozens of
    merges exist (the parquet testdata has only 31 distinct words)."""
    syll = ["ba", "ke", "lo", "mi", "tu", "ran", "pos", "zil"]
    rows = []
    for d in range(n_docs):
        words = []
        for j in range(30):
            a = syll[(d * 7 + j * 3) % 8]
            b = syll[(d * 5 + j * j) % 8]
            c = syll[(d + j * 11) % 8] if (d + j) % 3 else ""
            words.append(a + b + c)
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batched_bpe_inmemory(word_cnt, n_merges, batch_m):
    """Pure-Python replica of bpe_train_batched's documented policy:
    same ranking, same (8*batch_m + 256) candidate horizon, same greedy
    disjoint selection, merges applied sequentially in rank order (which
    disjointness makes equal to the one-pass batch application)."""
    from collections import Counter

    from kgspark.bpe import fold_merge, select_disjoint_pairs

    entries = [(list(w), c) for w, c in word_cnt.items()]
    merges = []
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        wts = Counter()
        for s, c in entries:
            for i in range(len(s) - 1):
                wts[(s[i], s[i + 1])] += c
        cand = sorted(
            ((l, r, w) for (l, r), w in wts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[: 8 * batch_m + 256]
        batch = select_disjoint_pairs(cand, want)
        if not batch:
            break
        base = len(merges)
        merges.extend(
            (base + i, l, r, w) for i, (l, r, w) in enumerate(batch)
        )
        for left, right, _w in batch:
            entries = [(fold_merge(s, left, right), c) for s, c in entries]
    return merges


def test_bpe_batched_m1_equals_sequential(spark):
    from kgspark.bpe import bpe_train, bpe_train_batched

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seq = [tuple(r) for r in bpe_train(docs, 12).orderBy("rank").collect()]
    bat = [tuple(r) for r in
           bpe_train_batched(docs, 12, batch_m=1).orderBy("rank").collect()]
    assert bat == seq
    assert len(bat) == 12


def test_bpe_batched_matches_inmemory_replica(spark):
    from collections import Counter

    from kgspark.bpe import bpe_train_batched

    docs = _crafted_corpus(spark)
    wc = Counter()
    for r in docs.collect():
        for w in r["text"].split():
            wc[w] += 1
    want = _batched_bpe_inmemory(wc, n_merges=40, batch_m=8)
    got = [tuple(r) for r in
           bpe_train_batched(docs, 40, batch_m=8).orderBy("rank").collect()]
    assert got == want
    assert len(got) == 40


def test_bpe_batched_bounded_rounds(spark, monkeypatch):
    """The point of batching: strictly fewer distributed rounds than
    merges. Count rounds via the per-round materialize call."""
    import kgspark.bpe as bpe_mod

    calls = {"n": 0}
    real = bpe_mod.materialize

    def counting(df):
        calls["n"] += 1
        return real(df)

    monkeypatch.setattr(bpe_mod, "materialize", counting)
    docs = _crafted_corpus(spark)
    out = bpe_mod.bpe_train_batched(docs, 32, batch_m=8).collect()
    assert len(out) == 32
    rounds = calls["n"] - 1  # first call materializes the symbol table
    assert rounds <= 16      # >= 2 merges/round on average; 4 if conflict-free


# ---------------------------------------------------------------------------
# Predicate schema mining + encoding census (round-4 ops)
# ---------------------------------------------------------------------------

def test_predicate_profile_cardinality_classes(spark):
    from kgspark.graph_algs import predicate_profile

    triples = spark.createDataFrame(
        [
            # born_in: each subject one object, objects shared -> functional
            ("alice", "born_in", "paris"),
            ("bob", "born_in", "paris"),
            ("carol", "born_in", "rome"),
            # isbn_of: 1:1 both ways
            ("book1", "isbn_of", "i1"),
            ("book2", "isbn_of", "i2"),
            # capital_of: each object one subject, subject repeated ->
            # inverse_functional
            ("paris", "capital_of", "france"),
            ("paris", "capital_of", "gaul"),
            # knows: many-many
            ("alice", "knows", "bob"),
            ("alice", "knows", "carol"),
            ("bob", "knows", "alice"),
            ("bob", "knows", "carol"),
            ("bob", "knows", "carol"),  # dup collapses via distinct
        ],
        "subj string, pred string, obj string",
    )
    out = {r["pred"]: r.asDict() for r in predicate_profile(triples).collect()}
    assert out["born_in"]["card_class"] == "functional"
    assert out["born_in"]["n_triples"] == 3
    assert out["born_in"]["n_subj"] == 3
    assert out["born_in"]["n_obj"] == 2
    assert out["isbn_of"]["card_class"] == "one_to_one"
    assert out["capital_of"]["card_class"] == "inverse_functional"
    assert out["knows"]["card_class"] == "many_to_many"
    assert out["knows"]["n_triples"] == 4  # dup dropped
    assert out["knows"]["fanout_ppm"] == 2_000_000
    assert out["knows"]["max_out"] == 2 and out["knows"]["max_in"] == 2


def test_predicate_cooccurrence_conf_and_jaccard(spark):
    from kgspark.graph_algs import predicate_cooccurrence

    triples = spark.createDataFrame(
        [
            ("s1", "capital", "x"), ("s1", "population", "y"),
            ("s2", "capital", "x"), ("s2", "population", "y"),
            ("s3", "capital", "x"),
            ("s4", "flag", "z"), ("s4", "population", "y"),
        ],
        "subj string, pred string, obj string",
    )
    out = {(r["pred_p"], r["pred_q"]): r.asDict()
           for r in predicate_cooccurrence(triples).collect()}
    cp = out[("capital", "population")]
    assert cp["n_p"] == 3 and cp["n_q"] == 3 and cp["n_both"] == 2
    assert cp["conf_p_ppm"] == 666_666       # 2e6 div 3, truncated
    assert cp["jaccard_ppm"] == 500_000      # 2 / (3+3-2)
    fp = out[("flag", "population")]
    assert fp["n_both"] == 1 and fp["n_p"] == 1
    assert ("population", "capital") not in out  # p < q only


def test_mojibake_stats_census(spark):
    from kgspark.textstats import mojibake_stats

    docs = spark.createDataFrame(
        [
            (0, "clean text", "a"),
            (1, "double enc: naÃ¯ve", "a"),         # Ã
            (2, "smart quote gone â€œbad", "a"),  # â€
            (3, "lossy � here", "b"),
            (4, "bell \x07 char", "b"),
            (5, None, "b"),
            (6, "tabs\tand\nnewlines are fine", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r.asDict() for r in mojibake_stats(docs).collect()}
    assert out["a"]["n_docs"] == 3 and out["a"]["n_mojibake"] == 2
    assert out["a"]["mojibake_ppm"] == 666_666
    assert out["b"]["n_replacement"] == 1
    assert out["b"]["n_ctrl"] == 1          # \t\n don't count
    assert out["b"]["n_mojibake"] == 0
    assert out["b"]["ctrl_ppm"] == 250_000


def test_ifp_sameas_candidates(spark):
    from kgspark.canon import ifp_sameas

    rows = [
        # 'email' is a near-key: one shared value (the dup pair)...
        ("alice", "email", "a@x.com"),
        ("alice_dup", "email", "a@x.com"),
        # ...plus singletons so mean fan-in 11/10 = 1.1e6 ppm (<= default)
        *[(f"e{k}", "email", f"e{k}@x.com") for k in range(9)],
        # second witness for the same pair, same arithmetic
        ("alice", "phone", "555"),
        ("alice_dup", "phone", "555"),
        *[(f"p{k}", "phone", f"55{k + 6}") for k in range(9)],
        # junk value shared by 4 subjects (> max_group 3) under a
        # qualifying near-key predicate: 33/30 = 1.1e6 ppm
        ("s1", "fax", "N/A"), ("s2", "fax", "N/A"), ("s3", "fax", "N/A"),
        ("s4", "fax", "N/A"),
        *[(f"u{k}", "fax", f"f{k}") for k in range(29)],
        # high-fan-in predicate: excluded by the ppm threshold (4e6)
        ("alice", "type", "Person"), ("alice_dup", "type", "Person"),
        ("bob", "type", "Person"), ("carol", "type", "Person"),
    ]
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    out = {(r["a"], r["b"]): r["n_witnesses"]
           for r in ifp_sameas(triples, max_group=3).collect()}
    # alice/alice_dup share email AND phone -> 2 witnesses
    assert out.get(("alice", "alice_dup")) == 2
    # 'type' (fan-in 4e6 ppm) excluded: no Person-driven pairs
    assert ("alice", "bob") not in out and ("bob", "carol") not in out
    # the N/A fax group (size 4 > max_group 3) is dropped entirely
    assert not any("s1" in p or "s2" in p for p in out)
    assert out == {("alice", "alice_dup"): 2}


def test_domain_range_induction(spark):
    from kgspark.graph_algs import domain_range

    triples = spark.createDataFrame(
        [
            ("paris", "is_a", "City"),
            ("france", "is_a", "Country"),
            ("rome", "is_a", "City"),
            ("rome", "is_a", "Capital"),      # multi-typed
            ("paris", "capital_of", "france"),
            ("rome", "capital_of", "italy"),  # italy untyped
            ("alice", "lives_in", "paris"),   # alice untyped
        ],
        "subj string, pred string, obj string",
    )
    out = {(r["pred"], r["subj_type"], r["obj_type"]): (r["n"], r["share_ppm"])
           for r in domain_range(triples).collect()}
    # paris(City)->france(Country); rome is City AND Capital -> 2 rows
    assert out[("capital_of", "City", "Country")] == (1, 333_333)
    assert out[("capital_of", "City", "unknown")] == (1, 333_333)
    assert out[("capital_of", "Capital", "unknown")] == (1, 333_333)
    assert out[("lives_in", "unknown", "City")] == (1, 1_000_000)
    # is_a rows themselves are excluded from the distribution
    assert not any(p == "is_a" for p, _, _ in out)


def test_sitemap_urls_extraction(spark):
    from kgspark.web import sitemap_urls

    xml = (
        "<urlset>"
        "<url><loc>https://a/1</loc><lastmod>2024-01-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a/2</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://a/sitemap.xml", xml), ("https://b/sitemap.xml", "<urlset></urlset>")],
        "sitemap_url string, xml string",
    )
    rows = {(r["sitemap_url"], r["url_no"]): r.asDict()
            for r in sitemap_urls(df).collect()}
    r1 = rows[("https://a/sitemap.xml", 1)]
    assert r1["loc"] == "https://a/1" and r1["lastmod"] == "2024-01-01"
    assert r1["changefreq"] == "daily" and r1["priority"] == "0.8"
    r2 = rows[("https://a/sitemap.xml", 2)]
    assert r2["loc"] == "https://a/2" and r2["lastmod"] == ""
    # empty urlset contributes nothing
    assert not any(k[0] == "https://b/sitemap.xml" for k in rows)


def test_harmonic_centrality_chain(spark):
    from kgspark.graph_algs import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "subj string, obj string",
    )
    out = {r["node"]: (r["n_in"], r["h_micro"])
           for r in harmonic_centrality(edges, depth=3).collect()}
    # into d within 3 hops: c@1, b@2, a@3 -> 1e6 + 500000 + 333333
    assert out["d"] == (3, 1_833_333)
    # into e: d@1, c@2, b@3 (a is 4 hops away -> excluded by the bound)
    assert out["e"] == (3, 1_833_333)
    assert out["b"] == (1, 1_000_000)
    assert "a" not in out  # nothing reaches the source


def test_cardinality_violations(spark):
    from kgspark.graph_algs import cardinality_violations

    triples = spark.createDataFrame(
        [
            ("alice", "born_in", "paris"),
            ("alice", "born_in", "rome"),    # violation: 2 objects
            ("bob", "born_in", "rome"),
            ("alice", "knows", "bob"),
            ("alice", "knows", "carol"),     # not declared -> ignored
            ("bob", "born_in", "rome"),      # dup row collapses
        ],
        "subj string, pred string, obj string",
    )
    declared = spark.createDataFrame(
        [("born_in", "functional"), ("knows", "many_to_many")],
        "pred string, card_class string",
    )
    out = {(r["pred"], r["subj"]): (r["n_objects"], r["sample_obj"])
           for r in cardinality_violations(triples, declared).collect()}
    assert out == {("born_in", "alice"): (2, "paris")}


def test_type_completeness(spark):
    from kgspark.graph_algs import type_completeness

    triples = spark.createDataFrame(
        [
            ("paris", "is_a", "City"),
            ("rome", "is_a", "City"),
            ("lyon", "is_a", "City"),
            ("paris", "capital_of", "france"),
            ("rome", "capital_of", "italy"),
            ("paris", "population", "2m"),
        ],
        "subj string, pred string, obj string",
    )
    out = {(r["subj_type"], r["pred"]):
           (r["n_typed"], r["n_with"], r["completeness_ppm"])
           for r in type_completeness(triples).collect()}
    assert out[("City", "capital_of")] == (3, 2, 666_666)
    assert out[("City", "population")] == (3, 1, 333_333)
    assert not any(p == "is_a" for _, p in out)
