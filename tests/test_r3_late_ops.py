"""Unit tests for the late round-3 operators: duplicated-span coverage,
directed SCC, SCD-2 compaction, time-decayed counts, stopword discovery,
C4 line filtering, entity salience, TextRank."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dup_span_stats
# ---------------------------------------------------------------------------

def test_dup_span_coverage_merges_overlaps(spark):
    from kgspark.dedup import dup_span_stats

    # "a b c d" appears in docs 1 and 2 -> with k=3 the two grams
    # (a b c) and (b c d) overlap; coverage must be 4, not 6.
    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "q a b c d r s"),
            (3, "u v w u v w u"),  # self-repeat only: grams unique to doc 3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_stats(df, k=3).collect()}
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["covered_tokens"] == 4
    assert out[2]["n_dup_grams"] == 2
    assert out[2]["covered_tokens"] == 4
    # doc 3's repeated grams occur in ONE doc only -> not duplicated
    assert out[3]["n_dup_grams"] == 0
    assert out[3]["covered_tokens"] == 0
    assert out[3]["n_tokens"] == 7


def test_dup_span_short_docs_no_grams(spark):
    from kgspark.dedup import dup_span_stats

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = dup_span_stats(df, k=3).collect()
    assert {r["n_dup_grams"] for r in rows} == {0}
    assert {r["n_tokens"] for r in rows} == {2}


# ---------------------------------------------------------------------------
# scc
# ---------------------------------------------------------------------------

def test_scc_two_cycles_and_bridge(spark):
    from kgspark.graph_algs import scc

    # cycle {a,b,c}, cycle {d,e}, bridge c->d, tail d->f
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),
            ("d", "e"), ("e", "d"),
            ("c", "d"), ("d", "f"),
        ],
        "subj string, obj string",
    )
    got = {r["node"]: r["scc_id"] for r in scc(edges).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "d",
        "f": "f",
    }


def test_scc_dag_is_all_singletons(spark):
    from kgspark.graph_algs import scc

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "subj string, obj string"
    )
    got = {r["node"]: r["scc_id"] for r in scc(edges).collect()}
    assert got == {"a": "a", "b": "b", "c": "c"}


# ---------------------------------------------------------------------------
# scd2_compact / decayed_counts
# ---------------------------------------------------------------------------

def test_scd2_runs_and_sentinel(spark):
    from kgspark.relops import scd2_compact

    t = datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (i, t.replace(hour=i), 10, s, 0.0, "{}")
            for i, s in enumerate(["on", "on", "off", "on"])
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = scd2_compact(df).orderBy("valid_from").collect()
    assert [r["state"] for r in out] == ["on", "off", "on"]
    assert [r["n_events"] for r in out] == [2, 1, 1]
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[-1]["is_current"] is True
    assert out[-1]["valid_to"].year == 9999
    assert not any(r["is_current"] for r in out[:-1])


def test_decayed_counts_halves_per_half_life(spark):
    from kgspark.relops import decayed_counts

    t0 = datetime(2024, 1, 15, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 15), 1, "x", 0.0, "{}"),   # age 0  -> 1.0
            (2, datetime(2024, 1, 8), 1, "x", 0.0, "{}"),    # age 7d -> 0.5
            (3, datetime(2024, 1, 1), 2, "x", 0.0, "{}"),    # age 14d -> 0.25
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["user_id"]: r for r in decayed_counts(df, half_life_days=7.0).collect()}
    assert out[1]["decayed_micro"] == 1_500_000
    assert out[2]["decayed_micro"] == 250_000
    assert out[1]["n_events"] == 2


# ---------------------------------------------------------------------------
# stopword_discovery
# ---------------------------------------------------------------------------

def test_stopword_discovery_threshold(spark):
    from kgspark.textstats import stopword_discovery

    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the cat cat"), (4, "bird")],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in stopword_discovery(df, df_ratio=0.5).collect()}
    assert out["the"]["is_stopword"] and out["the"]["doc_freq"] == 3
    assert out["cat"]["is_stopword"] and out["cat"]["term_freq"] == 3
    assert out["cat"]["doc_freq"] == 2
    assert not out["dog"]["is_stopword"]
    assert not out["bird"]["is_stopword"]


# ---------------------------------------------------------------------------
# c4_line_stats
# ---------------------------------------------------------------------------

def test_c4_rules(spark):
    from kgspark.c4 import c4_line_stats

    good = "this line ends with a period.\nand so does this one here.\nthird full sentence right here."
    df = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nplease enable javascript now."),
            (3, good + "\nlorem ipsum dolor."),
            (4, good + "\ncode { brace }"),
            (5, "too short.\nno punct here at all\nok fine."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_stats(df).collect()}
    assert out[1]["keep_page"] and out[1]["n_kept_lines"] == 3
    # javascript line is dropped at line level but page survives
    assert out[2]["n_js_lines"] == 1 and out[2]["n_kept_lines"] == 3
    assert out[2]["keep_page"]
    assert out[3]["has_lorem"] and not out[3]["keep_page"]
    assert out[4]["has_brace"] and not out[4]["keep_page"]
    # all 3 lines fail: two have <3 words, the middle lacks punctuation
    assert out[5]["n_kept_lines"] == 0 and not out[5]["keep_page"]
    assert out[5]["kept_text"] == "" and out[5]["n_lines"] == 3


# ---------------------------------------------------------------------------
# entity_salience
# ---------------------------------------------------------------------------

def test_entity_salience_frequency_and_position(spark):
    from kgspark.entities import entity_salience

    aliases = spark.createDataFrame(
        [("spark", "Apache Spark", 0.9), ("ml", "Machine Learning", 0.9),
         ("hash table", "Hash Table", 1.0)],
        "surface string, canonical string, score double",
    )
    df = spark.createDataFrame(
        [(1, "spark spark ml"), (2, "x y z spark")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["canonical"]): r
           for r in entity_salience(df, aliases).collect()}
    # multi-token surfaces are excluded from the fast path
    assert all(c != "Hash Table" for (_, c) in out)
    s1 = out[(1, "Apache Spark")]
    assert s1["n_mentions"] == 2 and s1["first_pos"] == 0
    assert s1["salience_micro"] == 666667  # (2/3) * 2^0 * 1e6
    s2 = out[(2, "Apache Spark")]
    assert s2["first_pos"] == 3 and s2["n_mentions"] == 1
    assert s2["salience_micro"] < s1["salience_micro"]


# ---------------------------------------------------------------------------
# textrank_terms
# ---------------------------------------------------------------------------

def test_textrank_hub_outranks_leaf(spark):
    from kgspark.keywords import textrank_terms

    # "core" is adjacent to every other word; leaves only touch core
    df = spark.createDataFrame(
        [(1, "alpha core beta core gamma core delta")],
        "doc_id long, text string",
    )
    ranks = {r["node"]: r["rank"] for r in textrank_terms(df).collect()}
    assert set(ranks) == {"alpha", "beta", "gamma", "delta", "core"}
    assert ranks["core"] == max(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# signed_random_projection
# ---------------------------------------------------------------------------

def test_rproj_matches_bruteforce_and_preserves_similarity(spark):
    from kgspark.embed import rproj_signs, signed_random_projection

    vecs = [
        (1, [0.5] * 8),
        (2, [0.5] * 7 + [0.4]),          # near-dup of 1
        (3, [(-1.0) ** i * 0.3 for i in range(8)]),  # far from 1
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: [r[f"rp_{j}"] for j in range(4)]
        for r in signed_random_projection(
            df, out_dim=4, in_dim=8
        ).collect()
    }
    signs = rproj_signs(4, 8)
    for vid, emb in vecs:
        # fp32 storage: replicate the float cast
        import struct
        mic = [
            round(struct.unpack("f", struct.pack("f", v))[0] * 1e6)
            for v in emb
        ]
        want = [sum(s * m for s, m in zip(signs[j], mic)) for j in range(4)]
        assert out[vid] == want, vid
    # JL sanity: near-dup pair stays closer than the far pair in L1
    d12 = sum(abs(a - b) for a, b in zip(out[1], out[2]))
    d13 = sum(abs(a - b) for a, b in zip(out[1], out[3]))
    assert d12 < d13


# ---------------------------------------------------------------------------
# heaps_curve
# ---------------------------------------------------------------------------

def test_heaps_curve_cumulative_and_saturation(spark):
    from kgspark.textstats import heaps_curve

    # ids 0..9 with buckets=2 -> bucket 0 = ids 0-4, bucket 1 = ids 5-9
    rows = [(i, "alpha beta") for i in range(5)]
    rows += [(i, "alpha gamma delta") for i in range(5, 10)]
    rows += [(10, None)]  # null text dropped (max id still counts? no: dropped)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["cum_docs"], r["cum_tokens"], r["cum_types"])
        for r in heaps_curve(df, buckets=2).collect()
    }
    # null-text row dropped BEFORE max(): max id = 9, split at id 5
    assert got[0] == (5, 10, 2)            # alpha,beta
    assert got[1] == (10, 25, 4)           # + gamma,delta
    import pytest as _pytest
    with _pytest.raises(ValueError):
        heaps_curve(df, buckets=0)


# ---------------------------------------------------------------------------
# pq_assign
# ---------------------------------------------------------------------------

def test_pq_assign_matches_bruteforce(spark):
    import struct

    from kgspark.embed import pq_assign, pq_codebook

    vecs = [
        (1, [0.1 * ((i % 5) - 2) for i in range(8)]),
        (2, [0.0] * 8),
        (3, [-0.2, 0.2] * 4),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    m, k, dsub = 2, 4, 4
    out = {r["vec_id"]: r for r in pq_assign(df, m=m, k=k, in_dim=8).collect()}
    book = pq_codebook(m, k, dsub)
    for vid, emb in vecs:
        mic = [round(struct.unpack("f", struct.pack("f", v))[0] * 1e6)
               for v in emb]
        total = 0
        for s in range(m):
            sub = mic[s * dsub:(s + 1) * dsub]
            dists = [sum((a - b) ** 2 for a, b in zip(sub, book[s][c]))
                     for c in range(k)]
            best = min(range(k), key=lambda c: (dists[c], c))
            assert out[vid][f"code_{s}"] == best, (vid, s)
            total += dists[best]
        assert out[vid]["distortion"] == total
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pq_assign(df, m=3, in_dim=8)


# ---------------------------------------------------------------------------
# window_chunks
# ---------------------------------------------------------------------------

def test_window_chunks_stride_and_tail(spark):
    from kgspark.chunk import window_chunks

    text10 = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text10), (2, "a b c"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {}
    for r in window_chunks(df, size=4, stride=3).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_no"]] = (
            r["n_tokens"], r["chunk_text"])
    # doc 1: 10 tokens, size 4 stride 3 -> ceil(6/3)=2 extra -> 3 chunks
    assert set(got[1]) == {0, 1, 2}
    assert got[1][0] == (4, "w0 w1 w2 w3")
    assert got[1][1] == (4, "w3 w4 w5 w6")
    assert got[1][2] == (4, "w6 w7 w8 w9")
    # short doc -> single chunk; null/empty yield nothing
    assert got[2] == {0: (3, "a b c")}
    assert 3 not in got and 4 not in got
    import pytest as _pytest
    with _pytest.raises(ValueError):
        window_chunks(df, size=4, stride=5)


def test_topic_boundaries_hand_case(spark):
    from kgspark.chunk import topic_boundaries

    # window=2 blocks: [a b][a c][x y][x z] — cohesion 1,0,1 across the
    # 3 gaps; gap 1 is a local min with depth (1-0)+(1-0)=2
    docs = spark.createDataFrame(
        [(1, "a b a c x y x z"), (2, "a b")],   # doc 2: single block
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.gap_no): (r.score, r.depth, r.is_boundary)
        for r in topic_boundaries(docs, window=2, min_depth=2).collect()
    }
    assert got == {
        (1, 0): (1, 0, 0),
        (1, 1): (0, 2, 1),
        (1, 2): (1, 0, 0),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="window"):
        topic_boundaries(docs, window=0)
