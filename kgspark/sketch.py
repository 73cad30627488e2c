"""Mergeable frequency/cardinality sketches in pure DataFrame aggregations:
Count-Min (Cormode & Muthukrishnan 2005) and HyperLogLog registers
(Flajolet et al. 2007) — both public-literature constructions.

Why sketches in a 100 TB pipeline: the exact answers (full token counts,
exact distinct counts per partition/source) are themselves huge shuffles;
a sketch is a BOUNDED-SIZE summary (depth×width counters / 2^p registers)
that map-side combines perfectly — the groupBy state never exceeds the
sketch size regardless of corpus size — and merges across
days/shards/sources by elementwise sum (CMS) / max (HLL). Spark ships
approx_count_distinct, but its binary sketch state is opaque and
engine-private; these produce PORTABLE, engine-checkable sketch tables.

Determinism contract: hashing is md5-hex6 (the repo-wide convention,
kgtrain._hex6_to_int) and every counter/register is exact integer
arithmetic — both sketch tables are bit-reproducible across
partitionings, retries, and engines (full DuckDB oracles). HLL's fp64
harmonic-mean ESTIMATE is derived for human use and stays out of the
hash contract (the register table is the sketch), because Σ2^-M_j is
not exactly representable once registers spread >52 powers apart.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.kgtrain import _hex6_to_int

__all__ = [
    "bloom_bits",
    "bloom_member",
    "cms_table",
    "cms_lookup",
    "hll_registers",
    "hll_estimate",
]


def _bucket(md5_col, row: int, width: int):
    """CMS row hash d: 24 bits from the d-th disjoint nibble window of ONE
    md5 (md5 has 32 nibbles -> depth <= 5 windows). Disjoint bits of a
    strong hash give the d independent functions CMS needs at a quarter
    of the hashing cost of d salted md5 calls."""
    return (
        _hex6_to_int(F.substring(md5_col, 6 * row + 1, 6)) % F.lit(width)
    ).cast("long")


def cms_table(
    df: DataFrame,
    value_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of a value stream as a (d, b, cnt) table —
    depth×width counters, built by ONE map-side-combined groupBy whose
    state is bounded by the sketch size, never the stream size.

    Point estimates read min_d cnt[d, h_d(v)] (see cms_lookup): always an
    OVERcount, within eps·N with probability 1-delta for width=ceil(e/eps),
    depth=ceil(ln(1/delta)). Sketches over shards merge by summing cnt on
    (d, b). NULL values are dropped (no frequency to attribute).
    """
    if not 1 <= depth <= 5:
        raise ValueError("cms_table: depth must be in [1, 5] (md5 windows)")
    v = F.col(value_col)
    h = F.md5(v)
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                _bucket(h, d, width).alias("b"),
            )
            for d in range(depth)
        ])
    ).alias("r")
    return (
        df.where(v.isNotNull())
        .select(rows)
        .groupBy(F.col("r.d").alias("d"), F.col("r.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    values: Sequence[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the sketch for a small set of probe values:
    (value, est) with est = min over rows d of the (d, h_d(v)) counter
    (0 when a row's bucket is empty — the true count is then 0 too).
    The probe table is dimension-sized and broadcast; the sketch table is
    sketch-sized. depth/width must match the build."""
    if not values:
        raise ValueError("cms_lookup: values must be non-empty")
    spark = cms.sparkSession
    probes = spark.createDataFrame(
        [(str(x),) for x in sorted(set(values))], "value string"
    )
    keyed = probes.select(
        "value",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("long").alias("d"),
                    _bucket(F.md5(F.col("value")), d, width).alias("b"),
                )
                for d in range(depth)
            ])
        ).alias("r"),
    ).select("value", F.col("r.d").alias("d"), F.col("r.b").alias("b"))
    return (
        keyed.join(cms, ["d", "b"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def _leading_zeros_24(w_col):
    """Leading zeros of a 24-bit integer via 24 exact comparisons —
    24 - (position of highest set bit); no fp64 log anywhere."""
    highest = sum(
        [F.when(w_col >= F.lit(1 << j), 1).otherwise(0) for j in range(24)],
        F.lit(0),
    )
    return F.lit(24) - highest


def hll_registers(
    df: DataFrame,
    value_col: str = "token",
    p: int = 10,
) -> DataFrame:
    """HyperLogLog register table: (idx, max_rho) with idx = md5-hex6(v)
    mod 2^p and rho = leading zeros of a second independent 24-bit hash
    + 1 (25 for a zero hash word). 2^p rows at most, one
    map-side-combined max-groupBy; shards merge by max on idx. The table
    is the sketch — exact integers, engine-portable."""
    if not 4 <= p <= 16:
        raise ValueError("hll_registers: p must be in [4, 16]")
    v = F.col(value_col)
    h = F.md5(v)
    idx = (_hex6_to_int(h) % F.lit(1 << p)).cast("long")
    w = _hex6_to_int(F.substring(h, 7, 6))
    rho = (_leading_zeros_24(w) + F.lit(1)).cast("long")
    return (
        df.where(v.isNotNull())
        .select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> float:
    """Harmonic-mean cardinality estimate from a register table — driver
    helper over the (≤2^p)-row sketch, fp64 by nature (NOT in any hash
    contract). Applies the standard small-range linear-counting
    correction; empty registers count as rho=0."""
    import math

    m = 1 << p
    rows = registers.collect()
    seen = {int(r["idx"]): int(r["max_rho"]) for r in rows}
    s = sum(2.0 ** -seen.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / s
    zeros = m - len(seen)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def _bloom_pos(md5_col, j: int, m_bits: int):
    """Bloom hash j: the j-th disjoint 6-nibble window of ONE md5, mod m —
    the same disjoint-window trick as the CMS rows (md5 has 32 nibbles ->
    k <= 5 windows), k independent functions for one hash call."""
    return (
        _hex6_to_int(F.substring(md5_col, 6 * j + 1, 6)) % F.lit(m_bits)
    ).cast("long")


def bloom_bits(
    df: DataFrame,
    value_col: str = "token",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Bloom filter of a value set as its table of SET bit positions —
    one distinct over the exploded k positions per value, bounded by
    m_bits rows no matter how many values stream in. Shards/days merge
    by union+distinct (bitwise OR in table form).

    Why this shape at 100 TB: membership pruning (decontamination
    allowlists, 'seen before' URL filters, semi-join pre-filters) must
    not shuffle the big side. The bits table is sketch-sized, so the
    probe side (bloom_member) is a broadcast join — the big table never
    moves. False-positive rate ~ (1 - e^{-kn/m})^k; pick m_bits ~ 10n
    bits for ~1% at k=3. Exact integers end-to-end (md5 nibble windows,
    the repo determinism convention) — the table is engine-portable and
    DuckDB-oracle-checkable, unlike Spark's opaque bloom_filter_agg
    binary state.
    """
    if not 1 <= k <= 5:
        raise ValueError("bloom_bits: k must be in [1, 5]")
    if not 2 <= m_bits <= (1 << 24):
        raise ValueError("bloom_bits: m_bits must be in [2, 2^24]")
    v = F.col(value_col)
    h = F.md5(v)
    pos = F.array(*[_bloom_pos(h, j, m_bits) for j in range(k)])
    return (
        df.where(v.isNotNull())
        .select(F.explode(pos).alias("bit"))
        .distinct()
    )


def bloom_member(
    df: DataFrame,
    bits: DataFrame,
    value_col: str = "token",
    m_bits: int = 4096,
    k: int = 3,
    flag_col: str = "maybe_member",
) -> DataFrame:
    """Annotate each row with `maybe_member`: true iff ALL k Bloom
    positions of value_col are set in `bits` (false => definitely not in
    the built set; true => member or false positive, rate per
    bloom_bits). NULL values probe false.

    Plan shape: k broadcast LEFT joins of the (<= m_bits)-row bits table
    against per-row positions — the probed table is never shuffled, so
    this composes as a pre-filter in front of any exact semi-join
    (probe, filter, then exact-verify only the survivors). m_bits and k
    must match the bloom_bits call that built the table.
    """
    if not 1 <= k <= 5:
        raise ValueError("bloom_member: k must be in [1, 5]")
    h = F.md5(F.col(value_col))
    out = df
    hit_cols = []
    for j in range(k):
        bcol = f"__bloom_b{j}"
        out = out.join(
            F.broadcast(bits.select(F.col("bit").alias(bcol))),
            on=_bloom_pos(h, j, m_bits) == F.col(bcol),
            how="left",
        )
        hit_cols.append(F.col(bcol).isNotNull())
    flag = hit_cols[0]
    for c in hit_cols[1:]:
        flag = flag & c
    return out.withColumn(flag_col, flag).drop(
        *[f"__bloom_b{j}" for j in range(k)]
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two HLL register tables: per-idx max. The mergeability LAW —
    merge(sketch(A), sketch(B)) == sketch(A ++ B) EXACTLY, row for row —
    is what makes the sketch shard-safe at 100 TB: per-partition /
    per-day register tables combine associatively with no re-scan
    (pytest asserts the law on real streams). Union + max-groupBy, one
    map-side-combined shuffle of <= 2^p rows per side."""
    return (
        a.select("idx", "max_rho").unionByName(b.select("idx", "max_rho"))
        .groupBy("idx")
        .agg(F.max("max_rho").cast("long").alias("max_rho"))
    )


def hll_set_estimates(a: DataFrame, b: DataFrame, p: int = 10) -> dict:
    """Driver helper: {card_a, card_b, card_union, card_intersect} —
    union from the merged sketch, intersection by inclusion-exclusion
    (the standard HLL composition; error compounds, documented). fp64
    by nature, NOT in any hash contract (the hll_estimate posture)."""
    ea = hll_estimate(a, p)
    eb = hll_estimate(b, p)
    eu = hll_estimate(hll_merge(a, b), p)
    return {"card_a": ea, "card_b": eb, "card_union": eu,
            "card_intersect": max(ea + eb - eu, 0.0)}


# --------------------------------------------------------------------------
# KMV / theta sketch — distinct counting WITH set-intersection estimates
# --------------------------------------------------------------------------

_KMV_DOMAIN = 1 << 48  # 12 md5 nibbles


def _hash48(col):
    """First 12 md5 nibbles -> int in [0, 2^48) — the KMV hash order."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def kmv_table(
    df: DataFrame,
    value_col: str = "token",
    k: int = 64,
    group_col: str = "source",
) -> DataFrame:
    """K-minimum-values (theta) sketch table (Bar-Yossef et al. 2002;
    the DataSketches theta family): per group, the `k` smallest
    DISTINCT 48-bit md5 hash values of the value column — (group, h).
    The table IS the sketch: mergeable by union + re-rank
    (kmv_union), and unlike HLL it supports direct INTERSECTION
    estimation (kmv_intersect) because it carries an order-statistic
    sample, not just register maxima.

    Scale: one distinct shuffle on (group, hash), one per-group top-k
    window — groups are sources/shards, so the window never sees a
    corpus-global partition.
    """
    if k < 1:
        raise ValueError("kmv_table: k must be >= 1")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"),
                _hash48(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", "h")
    )


def _theta(k: int):
    """Per-group theta: kth-min + 1 when the sketch is full, else the
    full domain (a non-full sketch IS the exact distinct set)."""
    return F.when(
        F.col("n_kept") >= k, F.col("max_h") + 1
    ).otherwise(F.lit(_KMV_DOMAIN)).cast("long")


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(grp, n_kept, theta, est_distinct): est = n_kept * DOMAIN div
    theta — exact long arithmetic, exact count when the sketch is not
    full (theta = DOMAIN)."""
    agg = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("max_h"),
    )
    return agg.select(
        "grp", "n_kept", _theta(k).alias("theta"),
        F.expr(f"n_kept * {_KMV_DOMAIN}L div "
               f"(CASE WHEN n_kept >= {k} THEN max_h + 1 "
               f"ELSE {_KMV_DOMAIN}L END)").cast("long")
        .alias("est_distinct"),
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two sketch tables: union, distinct, re-rank to k — the
    merge law kmv_union(sk(A), sk(B)) == kmv_table(A UNION B) holds
    EXACTLY (both sides keep the k smallest distinct hashes of the
    union; asserted in tests)."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        u.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", "h")
    )


def kmv_intersect(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch intersection estimate per group: theta =
    min(theta_a, theta_b); sample = hashes present in BOTH sketches
    below theta; est = n_sample * DOMAIN div theta. When neither
    sketch is full the estimate is the EXACT intersection size.
    Returns (grp, n_sample, theta, est_intersect)."""

    def th(sk):
        return sk.groupBy("grp").agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("max_h"),
        ).select("grp", _theta(k).alias("theta"))

    thetas = (
        th(a).withColumnRenamed("theta", "ta")
        .join(th(b).withColumnRenamed("theta", "tb"), "grp")
        .select("grp", F.least("ta", "tb").alias("theta"))
    )
    sample = (
        a.join(b, ["grp", "h"])
        .join(F.broadcast(thetas), "grp")
        .where(F.col("h") < F.col("theta"))
        .groupBy("grp", "theta")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    )
    return (
        thetas.join(sample.select("grp", "n_sample"), "grp", "left")
        .select(
            "grp",
            F.coalesce("n_sample", F.lit(0)).cast("long")
            .alias("n_sample"),
            "theta",
            (F.coalesce("n_sample", F.lit(0)) * F.lit(_KMV_DOMAIN)
             ).cast("long").alias("__num"),
        )
        .select(
            "grp", "n_sample", "theta",
            F.expr("__num div theta").cast("long")
            .alias("est_intersect"),
        )
    )


def ams_sketch(
    df: DataFrame,
    value_col: str = "token",
    reps: int = 8,
) -> DataFrame:
    """AMS "tug-of-war" second-frequency-moment sketch (Alon, Matias &
    Szegedy 1996): rep j keeps component_j = Σ_rows s_j(v), where
    s_j(v) ∈ {-1,+1} is a hash sign — so component_j = Σ_values
    c_v·s_j(v) and E[component²] = F2 = Σ c_v². Completes the sketch
    family: CMS answers point frequency, HLL/KMV cardinality, AMS the
    self-join size / repeat-rate moment (the collision mass that prices
    a groupBy/join on this key stream).

    Deterministic + exact: the sign is the parity of md5(rep||'|'||v)
    (the repo-wide md5-hex6 convention), components are exact integer
    sums — bit-reproducible across partitionings and engines. Merge law
    (pytest-proven): sketch(A ⊎ B) = sketch(A) + sketch(B)
    componentwise, the mergeable-summary property that lets shards/days
    combine by elementwise addition.

    Scale shape: one map-side-combined aggregation whose state is
    `reps` counters per task — NO value-keyed shuffle (the stream is
    never grouped by value, unlike an exact F2), so it survives any key
    cardinality. Row cost is `reps` md5 calls.
    """
    if reps < 1:
        raise ValueError("ams_sketch: reps must be >= 1")
    rows = (
        df.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .select(
            F.explode(
                F.array(*[F.lit(j) for j in range(reps)])
            ).alias("rep"),
            "v",
        )
    )
    h = F.md5(F.concat(F.col("rep").cast("string"), F.lit("|"), F.col("v")))
    sign = F.lit(1) - F.lit(2) * (
        _hex6_to_int(F.substring(h, 1, 6)) % F.lit(2)
    )
    return rows.groupBy(F.col("rep").cast("int").alias("rep")).agg(
        F.sum(sign).cast("long").alias("component")
    )


def ams_estimate(sketch: DataFrame) -> DataFrame:
    """1-row (est_f2, reps) from an ams_sketch table: the mean of
    component² as an exact integer floor division (mean beats median
    here because determinism, not tail robustness, is the contract;
    variance shrinks 1/reps either way)."""
    return sketch.agg(
        F.expr("sum(component * component) div count(1)")
        .cast("long").alias("est_f2"),
        F.count(F.lit(1)).cast("long").alias("reps"),
    )
