"""Training-data prep operators (kgspark.trainprep): deterministic split,
greedy sequence packing, domain-mixing resampler."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.trainprep import hash_split, mix_sources, pack_greedy


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_hash_split_deterministic_and_proportional(spark):
    docs = _docs(spark)
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # pure function of (salt, id): same assignment on re-run and re-order
    again = hash_split(docs.orderBy(F.desc("doc_id")),
                       {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (out.join(again.withColumnRenamed("split", "s2"), "doc_id")
            .where(F.col("split") != F.col("s2")).count()) == 0
    # different salt -> different assignment
    salted = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x")
    assert (out.join(salted.withColumnRenamed("split", "s2"), "doc_id")
            .where(F.col("split") != F.col("s2")).count()) > 0


def test_hash_split_no_shuffle(spark):
    plan = hash_split(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection


def test_pack_greedy_respects_budget_and_order(spark):
    rows = [(i, 30 + (i * 37) % 70) for i in range(300)] + [(999, 500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_greedy(df, max_tokens=128, n_groups=4).collect()
    assert len(out) == 301
    by_seq: dict[tuple, list] = {}
    for r in out:
        by_seq.setdefault((r["group_id"], r["seq_id"]), []).append(r)
    for (g, s), members in by_seq.items():
        total = sum(m["n_tokens"] for m in members)
        if total > 128:  # only an oversized doc may exceed, and only alone
            assert len(members) == 1 and members[0]["n_tokens"] > 128
    # full greedy re-simulation per group: seq assignment must equal the spec
    for g in {r["group_id"] for r in out}:
        grp = sorted((r for r in out if r["group_id"] == g),
                     key=lambda r: r["doc_id"])
        cum, seq = 0, 0
        for r in grp:
            n = r["n_tokens"]
            if cum > 0 and cum + n > 128:
                seq += 1
                cum = 0
            assert r["seq_id"] == seq, (g, r["doc_id"], r["seq_id"], seq)
            cum += n


def test_pack_greedy_deterministic_groups(spark):
    df = spark.createDataFrame([(i, 10) for i in range(100)],
                               "doc_id long, n_tokens long")
    a = {r["doc_id"]: (r["group_id"], r["seq_id"])
         for r in pack_greedy(df, 64, n_groups=8).collect()}
    b = {r["doc_id"]: (r["group_id"], r["seq_id"])
         for r in pack_greedy(df.repartition(7), 64, n_groups=8).collect()}
    assert a == b


def test_mix_sources_hits_target_ratios(spark):
    docs = _docs(spark, 4000)  # 4 sources x 1000
    out = mix_sources(docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # binding source src0 (ratio 1.0) keeps everything; others halve
    assert counts["src0"] == 1000
    assert abs(counts["src1"] - 500) < 60 and abs(counts["src2"] - 500) < 60
    assert "src3" not in counts  # absent from target -> dropped
    # deterministic on replay
    n1 = out.count()
    assert mix_sources(docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}).count() == n1


def test_mix_sources_no_global_sort(spark):
    plan = (mix_sources(_docs(spark), {"src0": 0.6, "src1": 0.4})
            ._jdf.queryExecution().executedPlan().toString())
    assert "rangepartitioning" not in plan.lower()  # no per-source rank/sort


def test_pack_greedy_preserves_string_ids(spark):
    df = spark.createDataFrame(
        [(f"uid-{i:03d}", 40) for i in range(30)], "doc_uid string, n_tokens long"
    )
    out = pack_greedy(df, 100, id_col="doc_uid", n_groups=2).collect()
    ids = {r["doc_id"] for r in out}
    assert len(out) == 30 and None not in ids  # ids survive, not NULLed
    assert all(isinstance(i, str) for i in ids)
    # lexicographic greedy: within a group, seq_id nondecreasing in id order
    for g in {r["group_id"] for r in out}:
        grp = sorted((r for r in out if r["group_id"] == g),
                     key=lambda r: r["doc_id"])
        seqs = [r["seq_id"] for r in grp]
        assert seqs == sorted(seqs)


def test_stratified_sample_deterministic_and_capped(spark):
    from kgspark.trainprep import stratified_sample

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)] + [(100, "tiny")],
        "doc_id long, source string",
    )
    out1 = sorted((r["doc_id"], r["source"], r["sample_rank"])
                  for r in stratified_sample(df, 4).collect())
    out2 = sorted((r["doc_id"], r["source"], r["sample_rank"])
                  for r in stratified_sample(df, 4).collect())
    assert out1 == out2                       # replayable
    per = {}
    for _id, s, rk in out1:
        per.setdefault(s, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert {s: len(v) for s, v in per.items()} == {
        "s0": 4, "s1": 4, "s2": 4, "tiny": 1}  # short stratum keeps all
    # a different salt draws a different sample
    alt = sorted((r["doc_id"], r["source"], r["sample_rank"])
                 for r in stratified_sample(df, 4, salt="other").collect())
    assert alt != out1


def test_snapshot_delta_statuses(spark):
    from kgspark.trainprep import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"]
           for r in snapshot_delta(old, new).collect()}
    assert out == {1: "removed", 3: "changed", 5: "added"}

    full = {r["doc_id"]: r["status"]
            for r in snapshot_delta(old, new, include_unchanged=True).collect()}
    assert full == {1: "removed", 2: "unchanged", 3: "changed",
                    4: "unchanged", 5: "added"}


def test_snapshot_delta_null_vs_empty_and_multicol(spark):
    from kgspark.trainprep import snapshot_delta

    old = spark.createDataFrame([(1, None, "x")],
                                "doc_id long, text string, title string")
    new = spark.createDataFrame([(1, "", "x")],
                                "doc_id long, text string, title string")
    # null -> "" is a real content change (NUL sentinel != empty string)
    out = snapshot_delta(old, new, content_cols=("text", "title")).collect()
    assert [(r["doc_id"], r["status"]) for r in out] == [(1, "changed")]
    # hash covers every content column
    same = snapshot_delta(old, old, content_cols=("text", "title")).count()
    assert same == 0


def test_snapshot_delta_single_join_plan(spark):
    from kgspark.trainprep import snapshot_delta

    old = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text"))
    new = spark.range(50, 150).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text"))
    out = snapshot_delta(old, new)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
        + plan.count("BroadcastHashJoin") == 1
    got = {r["status"] for r in out.collect()}
    assert got == {"added", "removed"}
    assert out.count() == 100  # 50 removed + 50 added


def test_temperature_weights_flatten_distribution(spark):
    import math

    from kgspark.trainprep import temperature_weights

    rows = [(i, "big") for i in range(90)] + [(i + 100, "small")
                                              for i in range(10)]
    rows.append((999, None))  # null source dropped
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r for r in temperature_weights(df).collect()}
    wb = round(math.sqrt(90) * 1e6)
    ws = round(math.sqrt(10) * 1e6)
    assert got["big"]["w_scaled"] == wb and got["small"]["w_scaled"] == ws
    assert got["big"]["weight_ppm"] == wb * 1000000 // (wb + ws)
    # alpha=0.5 flattens: small's share (25%) beats its raw share (10%)
    assert got["small"]["weight_ppm"] > 100000
    assert got["big"]["weight_ppm"] + got["small"]["weight_ppm"] <= 1000000
    # boost: small docs upsampled (>1e6 ppm each), big downsampled
    assert got["small"]["boost_ppm"] > 1000000 > got["big"]["boost_ppm"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_weights(df, alpha_permille=0)


def test_pack_stats_fill_and_overflow(spark):
    from kgspark.trainprep import pack_greedy, pack_stats

    rows = [(i, 50) for i in range(6)] + [(100, 300)]  # one overflow doc
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_greedy(df, max_tokens=120, n_groups=1)
    row = pack_stats(packed, max_tokens=120).collect()[0]
    # group packs in id order: [50,50] [50,50] [50,50] [300]
    assert row["n_docs"] == 7 and row["n_seqs"] == 4
    assert row["total_tokens"] == 600 and row["capacity"] == 480
    assert row["fill_ppm"] == 600 * 1000000 // 480
    assert row["n_overflow_docs"] == 1
    # empty input -> sentinel, never a divide-by-zero
    empty = pack_stats(packed.limit(0), max_tokens=120).collect()[0]
    assert empty["fill_ppm"] == -1 and empty["n_seqs"] == 0


def test_densify_calendar_zero_fill(spark):
    from datetime import datetime

    from kgspark.trainprep import densify_calendar

    d = datetime
    cells = spark.createDataFrame(
        [("a", d(2024, 1, 1), 5), ("a", d(2024, 1, 3), 2),
         ("b", d(2024, 1, 2), 7)],
        "event_type string, window_start timestamp, cnt long",
    )
    got = {(r["event_type"], r["window_start"].day): r["cnt"]
           for r in densify_calendar(cells).collect()}
    # global span = Jan 1..3, both keys densified
    assert len(got) == 6
    assert got[("a", 1)] == 5 and got[("a", 2)] == 0 and got[("a", 3)] == 2
    assert got[("b", 1)] == 0 and got[("b", 2)] == 7 and got[("b", 3)] == 0


def test_budget_allocation_caps_and_redistributes(spark):
    from kgspark.trainprep import budget_allocation

    # big: 96 docs, tiny: 4 docs. sqrt weights ~ (9.8M, 2M) -> ppm
    rows = [(i, "big") for i in range(96)] + [(100 + i, "tiny")
                                              for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r
           for r in budget_allocation(df, budget_docs=50).collect()}
    tiny = got["tiny"]
    # tiny's fair share (~8 docs) exceeds availability -> capped + flagged
    assert tiny["alloc_docs"] == 4 and tiny["saturated"] == 1
    big = got["big"]
    # big absorbs the redistributed shortfall but never exceeds budget
    assert big["saturated"] == 0
    assert big["alloc_docs"] > 50 * big["weight_ppm"] // 1000000
    assert big["alloc_docs"] + tiny["alloc_docs"] <= 50
    import pytest as _pytest
    with _pytest.raises(ValueError):
        budget_allocation(df, budget_docs=-1)


def test_contrastive_triplets(spark):
    from kgspark.trainprep import contrastive_triplets

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " extra"),           # near-dup of 1 (and of 3)
        (3, base),                      # exact dup of 1
        (4, "completely different words here nothing shared at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["anchor"]: (r["pos_id"], r["pos_ppm"], r["neg_id"],
                         r["neg_ppm"])
           for r in contrastive_triplets(df, pos_threshold_ppm=500_000)
           .collect()}
    # 1 and 3 are identical -> ppm 1e6; 2 is the near-dup
    assert out[1][0] == 3 and out[1][1] == 1_000_000
    assert out[3][0] == 1 and out[3][1] == 1_000_000
    assert out[2][0] in (1, 3)
    # doc 4 never collides -> no anchor row; no negatives anywhere -> -1
    assert 4 not in out
    assert all(v[2] == -1 and v[3] == -1 for v in out.values()) or any(
        v[2] != -1 for v in out.values())


def test_contrastive_hard_negative_below_threshold(spark):
    from kgspark.trainprep import contrastive_triplets

    # high threshold turns the near-dup pair into a hard negative while
    # the exact dup stays positive
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base), (3, base + " tail tokens differ a bit")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["anchor"]: (r["pos_id"], r["neg_id"])
           for r in contrastive_triplets(df, pos_threshold_ppm=999_999)
           .collect()}
    assert out[1][0] == 2
    # 3 collides in a band with 1/2 but ppm < threshold -> hard negative
    if out[1][1] != -1:
        assert out[1][1] == 3


def test_rater_agreement_kappa(spark):
    from kgspark.trainprep import rater_agreement

    # classic 2x2 example: n=100, agree=70, marginals a:(60,40) b:(50,50)
    rows = ([("x", "x")] * 40 + [("x", "y")] * 20
            + [("y", "x")] * 10 + [("y", "y")] * 30
            + [(None, "x"), ("x", None)])  # nulls excluded
    df = spark.createDataFrame(rows, "a string, b string")
    confusion, summary = rater_agreement(df, "a", "b")
    cm = {(r["label_a"], r["label_b"]): r["n"] for r in confusion.collect()}
    assert cm == {("x", "x"): 40, ("x", "y"): 20, ("y", "x"): 10,
                  ("y", "y"): 30}
    s = summary.collect()[0]
    # S = 60*50 + 40*50 = 5000; kappa = (100*70 - 5000)/(10000 - 5000)
    assert (s["n"], s["n_agree"]) == (100, 70)
    assert s["agree_ppm"] == 700000
    assert s["chance_ppm"] == 500000
    assert s["kappa_ppm"] == 400000


def test_rater_agreement_degenerate_and_perfect(spark):
    from kgspark.trainprep import rater_agreement

    same = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    _, summ = rater_agreement(same, "a", "b")
    assert summ.collect()[0]["kappa_ppm"] == 1000000  # pe=1, full agree
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    _, summ2 = rater_agreement(perfect, "a", "b")
    assert summ2.collect()[0]["kappa_ppm"] == 1000000
    empty = spark.createDataFrame([], "a string, b string")
    _, summ3 = rater_agreement(empty, "a", "b")
    assert summ3.collect()[0]["n"] == 0


def test_fim_splits_replica(spark):
    import hashlib

    from kgspark.trainprep import fim_splits

    docs = [(0, "hello world"), (1, "abcdef"), (2, "x"), (3, ""),
            (4, "the quick brown fox")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.cut1, r.cut2, r.fim_text)
           for r in fim_splits(df, rate_pct=60).collect()}

    def hex6(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    for did, txt in docs:
        L = len(txt)
        sel = hex6(f"fim:{did}") % 100 < 60 and L >= 2
        if not sel:
            assert got[did] == (-1, -1, txt), did
            continue
        ca, cb = hex6(f"a:{did}") % (L + 1), hex6(f"b:{did}") % (L + 1)
        c1, c2 = min(ca, cb), max(ca, cb)
        want = (txt[:c1] + "<FIM_SUF>" + txt[c2:] + "<FIM_MID>"
                + txt[c1:c2])
        assert got[did] == (c1, c2, want), did
    # reconstruction invariant: removing the sentinels recovers all chars
    for did, txt in docs:
        c1, c2, ft = got[did]
        if c1 >= 0:
            body = ft.replace("<FIM_SUF>", "").replace("<FIM_MID>", "")
            assert sorted(body) == sorted(txt)
