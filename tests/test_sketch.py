"""Count-Min and HyperLogLog sketches (kgspark.sketch)."""

import pytest
from pyspark.sql import functions as F

from kgspark.sketch import cms_lookup, cms_table, hll_estimate, hll_registers


def _stream(spark, values):
    return spark.createDataFrame([(v,) for v in values], "token string")


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    vals = ["a"] * 50 + ["b"] * 20 + ["c"] * 5
    cms = cms_table(_stream(spark, vals), depth=4, width=1024)
    est = {r.value: r.est for r in
           cms_lookup(cms, ["a", "b", "c", "zzz"], depth=4, width=1024).collect()}
    assert est["a"] >= 50 and est["b"] >= 20 and est["c"] >= 5
    # 3 values in 1024 buckets x 4 rows: collisions essentially impossible
    assert est["a"] == 50 and est["b"] == 20 and est["c"] == 5
    assert est["zzz"] == 0


def test_cms_shard_merge_is_elementwise_sum(spark):
    a = ["x"] * 10 + ["y"] * 3
    b = ["x"] * 7 + ["z"] * 2
    ca = cms_table(_stream(spark, a))
    cb = cms_table(_stream(spark, b))
    merged = (
        ca.unionByName(cb).groupBy("d", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = cms_table(_stream(spark, a + b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_total_mass_per_row_equals_stream_size(spark):
    vals = [f"v{i % 37}" for i in range(500)]
    cms = cms_table(_stream(spark, vals), depth=4, width=256)
    per_row = {r.d: r.s for r in
               cms.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 500, 1: 500, 2: 500, 3: 500}


def test_cms_lookup_empty_probe_raises(spark):
    cms = cms_table(_stream(spark, ["a"]))
    with pytest.raises(ValueError):
        cms_lookup(cms, [])


def test_hll_estimate_within_tolerance(spark):
    n = 5000
    regs = hll_registers(_stream(spark, [f"tok{i}" for i in range(n)]), p=10)
    est = hll_estimate(regs, p=10)
    # p=10 -> standard error ~3.2%; allow 4 sigma
    assert abs(est - n) / n < 0.13
    # multiplicity must not change the registers
    regs2 = hll_registers(
        _stream(spark, [f"tok{i % n}" for i in range(3 * n)]), p=10
    )
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, regs2.collect())
    )


def test_hll_shard_merge_is_elementwise_max(spark):
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)] + a[:100]
    ra, rb = hll_registers(_stream(spark, a)), hll_registers(_stream(spark, b))
    merged = (
        ra.unionByName(rb).groupBy("idx")
        .agg(F.max("max_rho").cast("long").alias("max_rho"))
    )
    whole = hll_registers(_stream(spark, a + b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_bad_p_and_null_values(spark):
    with pytest.raises(ValueError):
        hll_registers(_stream(spark, ["a"]), p=2)
    df = spark.createDataFrame([("a",), (None,)], "token string")
    assert hll_registers(df, p=10).count() == 1


def test_sketch_determinism_across_partitionings(spark):
    vals = [f"w{i % 101}" for i in range(1000)]
    s1, s17 = _stream(spark, vals).repartition(1), _stream(spark, vals).repartition(17)
    assert sorted(map(tuple, cms_table(s1).collect())) == sorted(
        map(tuple, cms_table(s17).collect())
    )
    assert sorted(map(tuple, hll_registers(s1).collect())) == sorted(
        map(tuple, hll_registers(s17).collect())
    )


def test_bloom_no_false_negatives_and_prune_power(spark):
    from kgspark.sketch import bloom_bits, bloom_member

    build = _stream(spark, [f"in{i}" for i in range(200)])
    bits = bloom_bits(build, m_bits=65536, k=3)
    # every built value MUST probe true (no false negatives, ever)
    members = bloom_member(build.distinct(), bits, m_bits=65536, k=3)
    assert members.where(~F.col("maybe_member")).count() == 0
    # at m/n ~ 328 bits/value the filter rejects nearly all outsiders;
    # any that survive are bounded false positives, never misses
    probe = _stream(spark, [f"out{i}" for i in range(500)]).distinct()
    fp = bloom_member(probe, bits, m_bits=65536, k=3)
    assert fp.where(F.col("maybe_member")).count() <= 5
    # bits table is bounded by m and by 3 * n_values
    assert bits.count() <= 3 * 200


def test_bloom_shard_merge_is_union_distinct(spark):
    from kgspark.sketch import bloom_bits

    a = _stream(spark, [f"a{i}" for i in range(50)])
    b = _stream(spark, [f"b{i}" for i in range(50)])
    merged = bloom_bits(a, m_bits=4096, k=2).union(
        bloom_bits(b, m_bits=4096, k=2)
    ).distinct()
    whole = bloom_bits(a.union(b), m_bits=4096, k=2)
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in whole.collect()
    )


def test_bloom_param_validation_and_nulls(spark):
    from kgspark.sketch import bloom_bits, bloom_member

    s = _stream(spark, ["x"])
    with pytest.raises(ValueError):
        bloom_bits(s, k=6)
    with pytest.raises(ValueError):
        bloom_bits(s, m_bits=1)
    with pytest.raises(ValueError):
        bloom_member(s, bloom_bits(s), k=0)
    # NULL values: dropped from the build, probe false
    nulls = spark.createDataFrame([(None,), ("x",)], "token string")
    bits = bloom_bits(nulls, m_bits=4096, k=3)
    assert bits.count() <= 3
    probed = bloom_member(nulls, bits, m_bits=4096, k=3).collect()
    got = {r["token"]: r["maybe_member"] for r in probed}
    assert got["x"] is True and got[None] is False


def test_hll_merge_law_and_set_estimates(spark):
    from kgspark.sketch import (hll_estimate, hll_merge, hll_registers,
                                hll_set_estimates)

    a = spark.range(0, 3000).selectExpr("'u' || id AS token")
    b = spark.range(2000, 6000).selectExpr("'u' || id AS token")
    ra, rb = hll_registers(a), hll_registers(b)
    # THE merge law: merge(sketch(A), sketch(B)) == sketch(A ++ B), exactly
    merged = {(r.idx, r.max_rho) for r in hll_merge(ra, rb).collect()}
    direct = {(r.idx, r.max_rho)
              for r in hll_registers(a.unionByName(b)).collect()}
    assert merged == direct
    est = hll_set_estimates(ra, rb)
    assert abs(est["card_a"] - 3000) / 3000 < 0.15
    assert abs(est["card_b"] - 4000) / 4000 < 0.15
    assert abs(est["card_union"] - 6000) / 6000 < 0.15
    # inclusion-exclusion intersection (|A ∩ B| = 1000); compounded
    # error tolerated at 3x the union tolerance
    assert abs(est["card_intersect"] - 1000) / 1000 < 0.45


def _kmv_df(spark, rows):
    return spark.createDataFrame(rows, "source string, token string")


def test_kmv_exact_when_not_full(spark):
    from kgspark.sketch import _KMV_DOMAIN, kmv_estimate, kmv_table

    df = _kmv_df(spark, [("s", f"t{i}") for i in range(10)]
                 + [("s", "t0")])  # dup collapses
    sk = kmv_table(df, k=64)
    assert sk.count() == 10
    est = kmv_estimate(sk, k=64).collect()[0]
    assert (est.n_kept, est.theta, est.est_distinct) == (
        10, _KMV_DOMAIN, 10)


def test_kmv_merge_law_exact(spark):
    from kgspark.sketch import kmv_table, kmv_union

    a = _kmv_df(spark, [("s", f"a{i}") for i in range(50)])
    b = _kmv_df(spark, [("s", f"b{i}") for i in range(50)]
                + [("s", "a0"), ("s", "a1")])
    k = 16
    merged = kmv_union(kmv_table(a, k=k), kmv_table(b, k=k), k=k)
    direct = kmv_table(a.unionByName(b), k=k)
    got = sorted(r.h for r in merged.collect())
    want = sorted(r.h for r in direct.collect())
    assert got == want and len(got) == k


def test_kmv_estimate_accuracy_when_full(spark):
    from kgspark.sketch import kmv_estimate, kmv_table

    n = 2000
    df = _kmv_df(spark, [("s", f"v{i}") for i in range(n)])
    est = kmv_estimate(kmv_table(df, k=64), k=64).collect()[0]
    assert est.n_kept == 64 and est.theta < (1 << 48)
    assert abs(est.est_distinct - n) / n < 0.25


def test_kmv_intersect_exact_and_estimated(spark):
    from kgspark.sketch import _KMV_DOMAIN, kmv_intersect, kmv_table

    # not-full sketches -> exact intersection
    a = _kmv_df(spark, [("s", f"x{i}") for i in range(20)])
    b = _kmv_df(spark, [("s", f"x{i}") for i in range(10, 40)])
    got = kmv_intersect(kmv_table(a, k=64), kmv_table(b, k=64),
                        k=64).collect()[0]
    assert (got.n_sample, got.theta, got.est_intersect) == (
        10, _KMV_DOMAIN, 10)
    # disjoint sets -> zero (left join coalesce path)
    c = _kmv_df(spark, [("s", f"y{i}") for i in range(20)])
    got0 = kmv_intersect(kmv_table(a, k=64), kmv_table(c, k=64),
                         k=64).collect()[0]
    assert got0.n_sample == 0 and got0.est_intersect == 0
    # full sketches: 3000 overlap of two 5000-sets, k=128 -> within 35%
    big_a = _kmv_df(spark, [("s", f"v{i}") for i in range(5000)])
    big_b = _kmv_df(spark, [("s", f"v{i}") for i in range(2000, 7000)])
    k = 128
    gi = kmv_intersect(kmv_table(big_a, k=k), kmv_table(big_b, k=k),
                       k=k).collect()[0]
    assert abs(gi.est_intersect - 3000) / 3000 < 0.35


def test_ams_merge_law_and_estimate(spark):
    from kgspark.sketch import ams_estimate, ams_sketch

    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [("z",)], "token string"
    )
    b = spark.createDataFrame(
        [("x",)] * 2 + [("w",)] * 4, "token string"
    )
    both = a.unionByName(b)
    ska = {r.rep: r.component for r in ams_sketch(a, reps=6).collect()}
    skb = {r.rep: r.component for r in ams_sketch(b, reps=6).collect()}
    sku = {r.rep: r.component for r in ams_sketch(both, reps=6).collect()}
    # merge law: sketch of the multiset union == componentwise sum
    assert sku == {j: ska[j] + skb[j] for j in ska}
    # determinism
    assert ska == {r.rep: r.component
                   for r in ams_sketch(a, reps=6).collect()}
    # estimate is the exact integer mean of squares
    est = ams_estimate(ams_sketch(both, reps=6)).collect()[0]
    assert est.reps == 6
    assert est.est_f2 == sum(c * c for c in sku.values()) // 6
    # single-value stream: every component is ±n, estimate exactly n²
    one = spark.createDataFrame([("k",)] * 7, "token string")
    est1 = ams_estimate(ams_sketch(one, reps=4)).collect()[0]
    assert est1.est_f2 == 49
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ams_sketch(a, reps=0)
