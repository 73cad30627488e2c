"""Geo-coordinate literal extraction + canonicalization — the third
literal front door beside kgspark.timex (dates) and kgspark.units
(quantities): turn degree-marked coordinate mentions in web text into
exact integer micro-degrees a KG can index and range-query.

The reference stores untyped string literals only (ref
/root/reference/knowledge_graph_builder.py:137-168); beyond-reference
KG-construction surface.

Recognized form: ``<deg>[.<frac>]° <H>`` with hemisphere H in N/S/E/W and
an optional space before the hemisphere letter (``40.7128° N``,
``74.006°W``). Canonical value = micro-degrees as BIGINT: deg·1e6 + frac
right-padded to 6 digits, negated for S/W. Out-of-range mentions
(lat > 90, lon > 180) are dropped — a lexical sanity bound, applied in
exact integers.

Scale shape: map-only JVM regex + integer arithmetic — no Python, no
joins, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P_COORD = r"\b([0-9]{1,3})(?:\.([0-9]{1,6}))?° ?([NSEW])\b"

# shifts that make micro-degree coordinates non-negative, so truncating
# integer division == floor division on every engine (no negative-cell
# boundary drift between Spark `div` and an oracle's `//`)
_LAT_SHIFT = 90_000_000
_LON_SHIFT = 180_000_000


def near_pairs(
    points: DataFrame,
    radius_micro: int,
    id_col: str = "id",
    lat_col: str = "lat_micro",
    lon_col: str = "lon_micro",
) -> DataFrame:
    """Distance-bounded spatial self-join via grid-cell blocking: all
    unordered point pairs within ``radius_micro`` micro-degrees (planar
    L2 over the micro-degree grid — the equirectangular small-area
    approximation; no cos(lat) correction, documented: at entity-
    resolution radii of ≤ ~1° the cell blocking is what matters, and the
    caller can post-filter with a true geodesic if needed).

    -> (a, b, dist2): a < b (each pair once), dist2 = Δlat² + Δlon² in
    exact squared micro-degrees (BIGINT — fits: max Δ 360e6 squared is
    ~1.3e17 < 2^63).

    Plan: each point keys to one home cell of side ``radius_micro``
    (coordinates shifted non-negative so truncating div is floor div);
    the probe side replicates into its 3×3 cell neighborhood (constant
    9× blowup), one equi-join on the cell key, then the exact distance
    filter. A qualifying pair's second point always lies in the first
    point's 3×3 neighborhood (cell side = radius), and matches exactly
    once — b's home cell is unique — so no dedup pass. The reference has
    no spatial surface at all (ref /root/reference/
    knowledge_graph_builder.py stores untyped strings).

    Scale posture (100 TB): ONE shuffle on the cell key; replication is
    a fixed 9×; per-cell population is bounded by point density × r², so
    the join never goes quadratic in n — dense hot cells (city centers)
    are the residual skew and AQE skew-join handles them (cells are
    many and the key space is uniform-ish after hashing).
    """
    if radius_micro <= 0:
        raise ValueError(f"near_pairs: radius_micro > 0, got {radius_micro}")
    r = int(radius_micro)
    p = points.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("long").alias("__lat"),
        F.col(lon_col).cast("long").alias("__lon"),
    ).withColumn(
        "__ci", F.expr(f"(__lat + {_LAT_SHIFT}) div {r}")
    ).withColumn(
        "__cj", F.expr(f"(__lon + {_LON_SHIFT}) div {r}")
    )
    off = F.array([F.lit(x) for x in (-1, 0, 1)])
    probe = (
        p.withColumn("__di", F.explode(off))
        .withColumn("__dj", F.explode(off))
        .select(
            F.col("__id").alias("a"), F.col("__lat").alias("__alat"),
            F.col("__lon").alias("__alon"),
            (F.col("__ci") + F.col("__di")).alias("__ci"),
            (F.col("__cj") + F.col("__dj")).alias("__cj"),
        )
    )
    build = p.select(
        F.col("__id").alias("b"), F.col("__lat").alias("__blat"),
        F.col("__lon").alias("__blon"), "__ci", "__cj",
    )
    dlat = F.col("__alat") - F.col("__blat")
    dlon = F.col("__alon") - F.col("__blon")
    dist2 = (dlat * dlat + dlon * dlon).cast("long")
    return (
        probe.join(build, ["__ci", "__cj"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", dist2.alias("dist2"))
        .where(F.col("dist2") <= F.lit(r * r))
    )


def extract_coords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, mention, axis, hemi, microdeg): one row per coordinate
    mention (bag semantics); axis 'lat' for N/S, 'lon' for E/W; microdeg
    a signed BIGINT in micro-degrees."""
    t = docs.select(F.col(id_col), F.col(text_col).alias("__tx"))
    m = t.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all("__tx", F.lit(P_COORD), F.lit(0))
        ).alias("mention"),
    )
    deg = F.regexp_extract("mention", P_COORD, 1).cast("long")
    fr = F.rpad(
        F.coalesce(
            F.nullif(F.regexp_extract("mention", P_COORD, 2), F.lit("")),
            F.lit("0"),
        ),
        6, "0",
    ).cast("long")
    hemi = F.regexp_extract("mention", P_COORD, 3)
    axis = F.when(hemi.isin("N", "S"), F.lit("lat")).otherwise(F.lit("lon"))
    sign = F.when(hemi.isin("S", "W"), F.lit(-1)).otherwise(F.lit(1))
    micro = (deg * 1_000_000 + fr) * sign
    bound = F.when(axis == "lat", F.lit(90_000_000)).otherwise(
        F.lit(180_000_000)
    )
    return (
        m.select(
            F.col(id_col), "mention", axis.alias("axis"),
            hemi.alias("hemi"), micro.cast("long").alias("microdeg"),
            bound.alias("__b"),
        )
        .where(F.abs(F.col("microdeg")) <= F.col("__b"))
        .drop("__b")
    )
