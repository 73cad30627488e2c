"""Quotation-attribution extraction (kgspark.quotes)."""

from __future__ import annotations

from pyspark.sql import Row

from kgspark.quotes import quote_triples


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_both_cue_orders(spark):
    df = _df(spark, [
        '"The graph is ready," said Alice Smith. and Bob said: '
        '"We shipped it."',
    ])
    got = sorted(
        (r["speaker"], r["quote"], r["cue_order"])
        for r in quote_triples(df).collect()
    )
    assert got == [
        ("Alice Smith", "The graph is ready", "quote_first"),
        ("Bob", "We shipped it", "speaker_first"),
    ]


def test_multiple_matches_and_trim(spark):
    df = _df(spark, ['"One." said Ann. "Two!" said Ann.'])
    got = [(r["speaker"], r["quote"]) for r in quote_triples(df).collect()]
    assert got == [("Ann", "One"), ("Ann", "Two")]


def test_lowercase_speaker_and_null_skipped(spark):
    df = _df(spark, ['"nope" said nobody here.', None, "no quotes at all"])
    assert quote_triples(df).count() == 0


def test_documented_limitation_leading_capitalized_word(spark):
    # no lookbehind in the Java∩RE2∩DuckDB subset: a capitalized word
    # preceding the name joins the speaker span (see module docstring)
    df = _df(spark, ['Later Bob said: "hi there."'])
    got = quote_triples(df).collect()
    assert [(r["speaker"], r["quote"]) for r in got] == [
        ("Later Bob", "hi there")
    ]


def test_speaker_up_to_three_words(spark):
    df = _df(spark, ['Jean Claude Van said: "Four names clip."'])
    got = quote_triples(df).collect()
    assert [(r["speaker"], r["quote"]) for r in got] == [
        ("Jean Claude Van", "Four names clip")
    ]
