"""ANN search tests: brute-force top-k, sign-LSH bucketed, IVF."""

from __future__ import annotations

import pytest

from kgspark.similarity import cosine_topk, cosine_topk_lsh, ivf_fit_assign, ivf_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    rows = emb.where("vec_id < 3").select(
        emb["vec_id"].alias("query_id"), emb["embedding"].alias("qemb")
    )
    return rows.collect() and rows  # materialize sanity + return df


def test_cosine_topk_shape(emb, queries):
    out = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 5
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        cs = [r["cos"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)
        assert all(r["vec_id"] != q for r in rows)


def test_lsh_subset_of_bucket(emb, queries):
    brute = cosine_topk(emb, queries, k=3)
    lsh = cosine_topk_lsh(emb, queries, k=3)
    # LSH returns candidates sharing >= 1 band with the query; every returned
    # (query, vec) pair must score identically to the exact computation.
    b = {(r["query_id"], r["vec_id"]): r["cos"]
         for r in cosine_topk(emb, queries, k=10 ** 6).collect()}
    for r in lsh.collect():
        assert b[(r["query_id"], r["vec_id"])] == r["cos"]


def test_ivf_recall_at_nprobe_all(emb, queries):
    assigned, centers = ivf_fit_assign(emb, nlist=4)
    # probing ALL lists must equal brute force exactly
    ivf_all = ivf_topk(assigned, centers, queries, k=5, nprobe=4)
    brute = cosine_topk(emb, queries, k=5)
    assert sorted(map(tuple, ivf_all.collect())) == sorted(map(tuple, brute.collect()))
    # probing 2/4 lists: results are a subset of the corpus with exact scores
    ivf2 = ivf_topk(assigned, centers, queries, k=5, nprobe=2)
    assert ivf2.count() > 0


def test_pq_topk_adc_matches_bruteforce(spark):
    import struct

    from kgspark.embed import pq_codebook
    from kgspark.similarity import pq_topk

    vecs = [(i, [0.05 * ((i * 7 + j) % 9 - 4) for j in range(8)])
            for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = pq_topk(df, df.where("vec_id < 1"), k=3, m=2, n_centroids=4,
                  in_dim=8).collect()
    # brute-force replica
    m, cn, dsub = 2, 4, 4
    book = pq_codebook(m, cn, dsub)

    def mic(v):
        return [round(struct.unpack("f", struct.pack("f", x))[0] * 1e6)
                for x in v]

    codes = {}
    for vid, emb in vecs:
        q = mic(emb)
        codes[vid] = [
            min(range(cn), key=lambda c: (
                sum((a - b) ** 2
                    for a, b in zip(q[s * dsub:(s + 1) * dsub], book[s][c])),
                c))
            for s in range(m)
        ]
    q0 = mic(vecs[0][1])
    want = sorted(
        (sum(sum((a - b) ** 2 for a, b in zip(
            q0[s * dsub:(s + 1) * dsub], book[s][codes[vid][s]]))
            for s in range(m)), vid)
        for vid, _ in vecs if vid != 0
    )[:3]
    got = sorted((r["dist"], r["vec_id"]) for r in out)
    assert got == want
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


def test_ranking_metrics_exact(spark):
    from kgspark.similarity import ranking_metrics

    ranked = spark.createDataFrame(
        [
            # q1: relevant at rank 2
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            # q2: relevant at rank 1
            (2, 20, 1), (2, 21, 2),
            # q3: nothing relevant retrieved
            (3, 30, 1), (3, 31, 2),
        ],
        "query_id long, vec_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 11), (1, 99), (2, 20), (3, 777)],
        "query_id long, vec_id long",
    )
    row = ranking_metrics(ranked, truth, ks=(1, 2)).collect()[0]
    assert row["n_queries"] == 3
    assert row["sum_rr_ppm"] == 1000000 // 2 + 1000000  # q1 + q2
    assert row["hits_1"] == 1 and row["hits_2"] == 2
    assert row["n_no_rel"] == 1


def test_label_prototypes_and_eval(spark):
    from kgspark.embed import label_prototypes, prototype_eval

    # two tight clusters around (+1e5 micro) and (-1e5 micro)
    rows = [
        (1, [0.10, 0.10], 0), (2, [0.12, 0.08], 0), (3, [0.08, 0.12], 0),
        (4, [-0.10, -0.10], 1), (5, [-0.12, -0.08], 1),
        (6, [0.09, 0.11], 1),  # mislabeled point near cluster 0
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    protos = {r["label"]: (r["n_vecs"], r["proto"])
              for r in label_prototypes(df, in_dim=2).collect()}
    assert protos[0][0] == 3
    # floor mean of [100000, 120000, 80000] = 100000
    assert protos[0][1][0] == 100000
    ev = prototype_eval(df, in_dim=2).collect()[0]
    # the mislabeled point classifies to 0, everything else correct
    assert (ev["n_total"], ev["n_correct"]) == (6, 5)
    assert ev["acc_ppm"] == 5 * 1000000 // 6
    empty = prototype_eval(df.limit(0), in_dim=2).collect()[0]
    assert empty["acc_ppm"] == -1


def test_norm_stats_exact(spark):
    import math

    from kgspark.embed import norm_stats

    rows = [
        (1, [0.3, 0.4], 0),          # norm = 0.5 -> 500000 micro
        (2, [0.0, 0.0], 0),          # zero vector -> 0
        (3, [1.0, 0.0], 1),
        (4, None, 1),                # null vec dropped
        (5, [1.0, 1.0], None),       # null label dropped
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in norm_stats(df, in_dim=2).collect()}
    a = got[0]
    assert (a["n_vecs"], a["min_norm"], a["max_norm"]) == (2, 0, 500000)
    assert a["sum_norm"] == 500000
    b = got[1]
    assert (b["n_vecs"], b["min_norm"]) == (1, 1000000)
    assert set(got) == {0, 1}


def test_dim_truncation_report_full_dim_is_perfect(spark):
    from kgspark.similarity import dim_truncation_report

    # signal lives in dim 4; dims 1-3 are near-constant -> truncation
    # at d<=3 scrambles the ranking, d=4 must be perfect
    rows = [(i, [1.0, 0.5, 0.25, float((-1) ** i * (i + 1))])
            for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS qemb"
    )
    rep = {r.dim: r for r in dim_truncation_report(
        emb, q, dims=[2, 4], k=3).collect()}
    assert rep[4].recall_ppm == 1_000_000
    assert rep[4].n_truth == 6 and rep[4].hits == 6
    assert 0 <= rep[2].recall_ppm <= 1_000_000
    assert rep[2].hits <= rep[2].n_truth


def test_knn_graph_exact_and_lsh_recall(spark):
    from kgspark.similarity import knn_graph

    rows = [(i, [float((i >> b) & 1) * 2 - 1 for b in range(16)])
            for i in range(32)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = knn_graph(emb, k=3, exact=True)
    got = exact.collect()
    # every node has exactly 3 ranked neighbors, no self edges
    per = {}
    for r in got:
        assert r.src != r.dst
        per.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per.values())
    assert len(per) == 32
    # LSH path: same schema, recall vs exact is substantial on this
    # clustered fixture
    approx = {(r.src, r.dst)
              for r in knn_graph(emb, k=3, bands=8, band_bits=4).collect()}
    truth = {(r.src, r.dst) for r in got}
    assert len(approx & truth) / len(truth) >= 0.5
    plan = knn_graph(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_mips_topk_exact_vs_python(spark):
    import math

    from kgspark.similarity import mips_topk, mips_topk_lsh

    # norms vary 1x-9x so inner-product order DIFFERS from cosine order:
    # direction repeats every 8 ids, magnitude grows with id
    rows = [
        (i, [float(i % 8 + 1) * (1.0 if ((i >> b) & 1) else -0.5)
             for b in range(12)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:3]], "query_id long, qemb array<float>"
    )
    got = mips_topk(emb, q, k=4).collect()
    vecs = {i: v for i, v in rows}
    for qid in (0, 1, 2):
        dots = sorted(
            ((round(sum(float(a) * float(b)
                        for a, b in zip(vecs[i], vecs[qid])), 6), -i), i)
            for i in vecs if i != qid
        )[::-1]
        want = [i for _, i in dots[:4]]
        mine = [r.vec_id for r in sorted(
            (r for r in got if r.query_id == qid), key=lambda r: r.rank)]
        assert mine == want, (qid, mine, want)
    # MIPS winner for query 0 must be a LARGE-norm vector (id >= 32 has
    # norm 8-9x), proving we are not just doing cosine
    top0 = [r for r in got if r.query_id == 0 and r.rank == 1][0]
    n = math.sqrt(sum(x * x for x in vecs[top0.vec_id]))
    n0 = math.sqrt(sum(x * x for x in vecs[0]))
    assert n > 2 * n0

    # LSH reduction path: every emitted dot is EXACT (matches brute) and
    # recall on this clustered fixture is substantial
    brute = {(r.query_id, r.vec_id): r.dot
             for r in mips_topk(emb, q, k=10 ** 6).collect()}
    approx = mips_topk_lsh(emb, q, k=4, bands=8, band_bits=4).collect()
    for r in approx:
        assert brute[(r.query_id, r.vec_id)] == r.dot
    truth = {(r.query_id, r.vec_id) for r in got}
    hit = {(r.query_id, r.vec_id) for r in approx}
    assert len(hit & truth) / len(truth) >= 0.5


def test_sq8_encode_and_topk(spark):
    from kgspark.embed import sq8_encode, sq8_stats
    from kgspark.similarity import mips_topk, sq8_topk

    rows = [
        (i, [float(i % 8 + 1) * (1.0 if ((i >> b) & 1) else -0.5)
             for b in range(12)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    st = sq8_stats(emb, dim=12)
    stats = {r.dim1: (r.lo, r.hi) for r in st.collect()}
    assert set(stats) == set(range(1, 13))
    codes = sq8_encode(emb, st)
    got = {r.vec_id: r.codes for r in codes.collect()}
    vecs = dict(rows)
    import math
    for i, v in vecs.items():
        for j, x in enumerate(v, start=1):
            lo, hi = stats[j]
            want = max(0, min(255, math.floor(
                (float(x) - lo) * 255.0 / (hi - lo) + 0.5)))
            assert got[i][j - 1] == want, (i, j)
    # per-dim extremes land exactly on 0 / 255
    flat = [c for cs in got.values() for c in cs]
    assert min(flat) == 0 and max(flat) == 255
    # ADC top-k over 8-bit codes reproduces the exact MIPS ranking here
    q = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:2]], "query_id long, qemb array<float>")
    sq = sq8_topk(codes, st, q, k=3)
    exact = mips_topk(emb, q, k=3)
    assert (
        [(r.query_id, r.vec_id, r.rank) for r in sorted(
            sq.collect(), key=lambda r: (r.query_id, r.rank))]
        == [(r.query_id, r.vec_id, r.rank) for r in sorted(
            exact.collect(), key=lambda r: (r.query_id, r.rank))]
    )


def test_mmr_rerank_matches_python_replica(spark):
    from kgspark.similarity import mmr_rerank

    # two ORTHOGONAL clusters, query on the diagonal: pure relevance
    # fills from one cluster; MMR at lam=0.5 must alternate clusters
    rows = [(i, [1.0 + 0.01 * i, 0.0, 0.0]) for i in range(6)]
    rows += [(i, [0.0, 1.0 + 0.01 * (i - 6), 0.0]) for i in range(6, 12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(99, [1.0, 1.0, 0.0])], "query_id long, qemb array<float>")
    got = sorted(
        [(r.pick_no, r.vec_id, r.score_num)
         for r in mmr_rerank(emb, q, k=3, pool=8, lam_tenths=5).collect()]
    )

    import math
    vecs = dict(rows)
    qv = [1.0, 1.0, 0.0]

    def cos_ppm(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return round(round(d / (na * nb), 6) * 1e6)

    rel = sorted(((cos_ppm(vecs[i], qv), -i), i) for i in vecs)[::-1]
    poolv = [i for _, i in rel[:8]]
    relmap = {i: c for (c, _), i in rel}
    picked, want = [], []
    for step in range(1, 4):
        best = None
        for d in poolv:
            if d in picked:
                continue
            ms = max((cos_ppm(vecs[d], vecs[s]) for s in picked), default=0)
            sc = 5 * relmap[d] - (5 * ms if picked else 0)
            key = (-sc, d)
            if best is None or key < best[0]:
                best = (key, d, sc)
        picked.append(best[1])
        want.append((step, best[1], best[2]))
    assert got == sorted(want)
    # diversity: picks span BOTH clusters; pure relevance top-3 does not
    pure = [i for _, i in rel[:3]]
    assert [v for _, v, _ in want] != pure
    sides = {v < 6 for _, v, _ in want}
    assert sides == {True, False}


def test_kcenter_coreset_greedy_sequence(spark):
    from kgspark.embed import kcenter_coreset

    # 1-D line: seed = min id (x=0); then farthest-point order is known
    rows = [(1, [0.0]), (2, [10.0]), (3, [4.0]), (4, [9.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kcenter_coreset(df, k=4).collect()
    seq = [(r.pick_no, r.vec_id, r.d2_q) for r in
           sorted(out, key=lambda r: r.pick_no)]
    # pick 2: x=10 (d2=1e8); pick 3: x=4 (min-dist to {0,10} = 16e6,
    # beats x=9's 1e6); pick 4: x=9 (min-dist to {0,10,4} = 1e6)
    assert seq == [(1, 1, -1), (2, 2, 100_000_000),
                   (3, 3, 16_000_000), (4, 4, 1_000_000)]


def test_kcenter_tie_breaks_on_id_and_k_overrun(spark):
    from kgspark.embed import kcenter_coreset

    # ids 7 and 9 equidistant from the seed -> lower id wins
    rows = [(5, [0.0]), (9, [1.0]), (7, [-1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.pick_no: r.vec_id for r in kcenter_coreset(df, k=3).collect()}
    assert out == {1: 5, 2: 7, 3: 9}
    # k > n: output stops at n rows
    assert kcenter_coreset(df, k=10).count() == 3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        kcenter_coreset(df, k=0)


def test_kcenter_pinned_tie_quantization(spark):
    from kgspark.embed import kcenter_coreset

    # 0.0625*1000 = 62.5 exactly in fp64 -> floor(+0.5) pins to 63
    rows = [(1, [0.0]), (2, [0.0625])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.pick_no: r.d2_q for r in kcenter_coreset(df, k=2).collect()}
    assert out[2] == 63 * 63


def test_graph_walk_reaches_true_nn(spark):
    import math

    from kgspark.similarity import graph_walk_topk, knn_graph

    # 8 unit vectors fanned 10° apart; query at 52° -> true NN = node 5
    vecs = [
        (i, [math.cos(math.radians(10 * i)),
             math.sin(math.radians(10 * i))])
        for i in range(8)
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(100, [math.cos(math.radians(52)), math.sin(math.radians(52))])],
        "query_id long, qemb array<float>",
    )
    graph = knn_graph(emb, k=2, exact=True)
    out = sorted(
        graph_walk_topk(emb, graph, q, hops=4, k=5).collect(),
        key=lambda r: r.rank,
    )
    # greedy routing walks 0 -> 2 -> 3 -> 4 -> 5 and finds the true NN
    assert out[0].vec_id == 5 and out[0].rank == 1
    # visited set is deduped and ranks are dense
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids))
    # scores decrease with rank (ties broken by id)
    assert all(a.cos >= b.cos for a, b in zip(out, out[1:]))
    # fewer hops cannot reach it yet: with 1 hop the best visited is 2
    short = sorted(
        graph_walk_topk(emb, graph, q, hops=1, k=3).collect(),
        key=lambda r: r.rank,
    )
    assert short[0].vec_id == 2
    # walk never returns the query itself even when it is in the corpus
    q_self = spark.createDataFrame(
        [(5, vecs[5][1])], "query_id long, qemb array<float>")
    self_out = graph_walk_topk(emb, graph, q_self, hops=4, k=5).collect()
    assert all(r.vec_id != 5 for r in self_out)


def test_ivfpq_partitioned_codes_prune(spark, tmp_path):
    """Round-5 verdict item 4: the IVF-PQ codes table written
    partitioned by list_id is (a) laid out as hive-style list_id=*
    directories, (b) probe-from-storage with prune_lists=True returns
    the EXACT inline ivfpq_topk result, and (c) the probe's scan
    carries a static list_id PartitionFilter — only the nprobe probed
    partitions of the index are read."""
    import os

    from kgspark.io_tables import write_table
    from kgspark.similarity import ivfpq_index, ivfpq_probe, ivfpq_topk

    dim, nlist, m, kcent = 16, 4, 4, 4
    rows = []
    for i in range(60):
        vec = [
            float(((i * 37 + j * 11) % 19) - 9) / 10.0 for j in range(dim)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where("vec_id % 13 = 0")

    coded, coarse, book = ivfpq_index(
        emb, nlist=nlist, m=m, n_centroids=kcent, in_dim=dim
    )
    base = str(tmp_path)
    write_table(coded, base, "ivfpq_codes", partition_cols=["list_id"])
    table_path = os.path.join(base, "ivfpq_codes.parquet")
    parts = sorted(
        d for d in os.listdir(table_path) if d.startswith("list_id=")
    )
    assert len(parts) >= 2, parts

    stored = spark.read.parquet(table_path)
    inline = {
        (r.query_id, r.vec_id, r.dist, r.rank)
        for r in ivfpq_topk(
            emb, queries, k=3, nlist=nlist, nprobe=2, m=m,
            n_centroids=kcent, in_dim=dim,
        ).collect()
    }
    probe = ivfpq_probe(
        stored, coarse, book, queries, k=3, nprobe=2, m=m,
        n_centroids=kcent, in_dim=dim, prune_lists=True,
    )
    from_disk = {
        (r.query_id, r.vec_id, r.dist, r.rank) for r in probe.collect()
    }
    assert from_disk == inline and len(inline) > 0

    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the codes scan must prune statically: a PartitionFilters entry
    # naming list_id with a non-empty IN list
    import re

    mt = re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]*IN \(", plan)
    assert mt, plan[:2000]
