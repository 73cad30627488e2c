"""One-call curation pipeline: annotation semantics + reject priority."""

from __future__ import annotations

from kgspark.curate import curate

GOOD = ("the cat and the dog run to the house and it is a good day "
        "for all of them in the sun")


def _docs(spark):
    rows = [
        (0, GOOD),
        (1, "el la de que y en un es por con amigos casa"),   # spanish
        (2, "the aa bb cc dd ee"),   # en-detected, low quality score
        (3, GOOD + " spam spam spam spam spam spam spam spam spam spam"
                   " spam spam spam spam spam spam spam spam spam spam"),
        (4, GOOD),                                             # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_reasons_and_priority(spark):
    out = {r["doc_id"]: r for r in
           curate(_docs(spark), min_quality=0.5,
                  max_top_2gram_frac=0.3).collect()}
    assert out[0]["keep"] and out[0]["reject_reason"] == ""
    assert out[1]["reject_reason"] == "lang"
    assert out[2]["reject_reason"] == "quality"
    assert out[3]["reject_reason"] == "repetition"
    assert out[4]["reject_reason"] == "duplicate"
    assert out[4]["canonical_id"] == 0
    # annotation, not filtering: every input row present
    assert len(out) == 5


def test_curate_dedup_off(spark):
    out = {r["doc_id"]: r for r in
           curate(_docs(spark), min_quality=0.5, max_top_2gram_frac=0.3,
                  dedup=False).collect()}
    assert out[4]["keep"] and out[4]["canonical_id"] == 4


def test_curate_lang_none_skips_lang_check(spark):
    out = {r["doc_id"]: r for r in
           curate(_docs(spark), lang=None, min_quality=0.2,
                  max_top_2gram_frac=0.9).collect()}
    assert out[1]["reject_reason"] != "lang"


def test_curate_empty_and_null_text_rejected(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, GOOD), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in curate(docs, min_quality=0.3).collect()}
    assert out[0]["keep"]
    assert out[1]["reject_reason"] == "empty" and not out[1]["keep"]
    assert out[2]["reject_reason"] == "empty" and not out[2]["keep"]
    assert len(out) == 3
