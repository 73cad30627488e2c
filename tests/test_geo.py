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
