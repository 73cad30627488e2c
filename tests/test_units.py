"""kgspark.units: quantity extraction + base-unit canonicalization."""

from __future__ import annotations

from kgspark.units import extract_quantities


def test_extract_quantities_scales_and_fractions(spark):
    docs = spark.createDataFrame(
        [(1, "ship 2.5 kg and 300MB plus 7 cm now"),
         (2, "1.5 mg floors to one")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.mention): (r.dimension, r.unit, r.base_unit,
                                r.base_value)
        for r in extract_quantities(docs).collect()
    }
    assert got == {
        (1, "2.5 kg"): ("mass", "kg", "mg", 2_500_000),
        (1, "300MB"): ("data", "MB", "B", 300_000_000),
        (1, "7 cm"): ("length", "cm", "mm", 70),
        (2, "1.5 mg"): ("mass", "mg", "mg", 1),   # sub-base floors
    }


def test_extract_quantities_longest_unit_wins_and_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "gap 12 mm wide, disk 3 TB, code g77 no, 5 qq no")],
        "doc_id long, text string",
    )
    got = {(r.mention, r.unit, r.base_value)
           for r in extract_quantities(docs).collect()}
    assert got == {("12 mm", "mm", 12), ("3 TB", "TB", 3_000_000_000_000)}


def test_extract_quantities_null_empty(spark):
    docs = spark.createDataFrame([(1, None), (2, "")],
                                 "doc_id long, text string")
    assert extract_quantities(docs).count() == 0
