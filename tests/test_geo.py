"""kgspark.geo: coordinate extraction + micro-degree canonicalization."""

from __future__ import annotations

from kgspark.geo import extract_coords


def test_extract_coords_forms_and_signs(spark):
    docs = spark.createDataFrame(
        [(1, "at 40.7128° N, 74.006°W near 0° E"),
         (2, "no coords 12.3 plain")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.mention): (r.axis, r.hemi, r.microdeg)
        for r in extract_coords(docs).collect()
    }
    assert got == {
        (1, "40.7128° N"): ("lat", "N", 40_712_800),
        (1, "74.006°W"): ("lon", "W", -74_006_000),
        (1, "0° E"): ("lon", "E", 0),
    }


def test_extract_coords_range_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "bad 91° N bad 181° E edge 90° S edge 180° W")],
        "doc_id long, text string",
    )
    got = {(r.mention, r.microdeg) for r in extract_coords(docs).collect()}
    assert got == {("90° S", -90_000_000), ("180° W", -180_000_000)}


def test_extract_coords_null_empty(spark):
    docs = spark.createDataFrame([(1, None), (2, "")],
                                 "doc_id long, text string")
    assert extract_coords(docs).count() == 0


def test_near_pairs_brute_force_replica(spark):
    from kgspark.geo import near_pairs

    # 40 deterministic points spanning negative coords and cell borders
    pts = []
    for i in range(40):
        lat = (i % 5) * 700_000 - 1_400_000 + (i % 3) * 111_111
        lon = (i // 5) * 600_000 - 2_000_000 + (i % 7) * 77_777
        pts.append((i, lat, lon))
    df = spark.createDataFrame(pts, "id long, lat_micro long, lon_micro long")
    r = 500_000
    got = {(x.a, x.b): x.dist2 for x in near_pairs(df, r).collect()}
    want = {}
    for i, la, lo in pts:
        for j, lb, lj in pts:
            if i < j:
                d2 = (la - lb) ** 2 + (lo - lj) ** 2
                if d2 <= r * r:
                    want[(i, j)] = d2
    assert got == want and len(want) > 10


def test_near_pairs_exact_radius_and_validation(spark):
    import pytest as _p

    from kgspark.geo import near_pairs

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 1000), (3, 0, 2001)],
        "id long, lat_micro long, lon_micro long",
    )
    got = {(r.a, r.b) for r in near_pairs(df, 1000).collect()}
    # (1,2) exactly at radius -> kept; (2,3) at 1001 -> dropped
    assert got == {(1, 2)}
    with _p.raises(ValueError, match="radius"):
        near_pairs(df, 0)
