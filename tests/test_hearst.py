"""Hearst-pattern hypernym extraction (kgspark.hearst)."""

from __future__ import annotations

from pyspark.sql import Row

from kgspark.hearst import hearst_triples


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _triples(df):
    return sorted(
        (r["hyponym"], r["hypernym"], r["pattern"]) for r in df.collect()
    )


def test_such_as_list(spark):
    df = _df(spark, ["engines such as spark, flink and trino run here."])
    assert _triples(hearst_triples(df)) == [
        ("flink", "engines", "such_as"),
        ("spark", "engines", "such_as"),
        ("trino", "engines", "such_as"),
    ]


def test_and_other_including_especially(spark):
    df = _df(spark, [
        "rows, columns and other structures.",
        "formats including parquet or orc.",
        "joins, especially hash and merge.",
    ])
    assert _triples(hearst_triples(df)) == [
        ("columns", "structures", "and_other"),
        ("hash", "joins", "especially"),
        ("merge", "joins", "especially"),
        ("orc", "formats", "including"),
        ("parquet", "formats", "including"),
        ("rows", "structures", "and_other"),
    ]


def test_single_item_and_two_item_lists(spark):
    df = _df(spark, ["tools such as duckdb.", "caches such as lru or arc."])
    assert _triples(hearst_triples(df)) == [
        ("arc", "caches", "such_as"),
        ("duckdb", "tools", "such_as"),
        ("lru", "caches", "such_as"),
    ]


def test_no_match_null_and_capitalized_skipped(spark):
    # NP scope is lowercase words; capitalized/NULL/plain text emit nothing
    df = _df(spark, ["Engines such as Spark.", None, "no pattern here"])
    assert hearst_triples(df).count() == 0


def test_multiple_patterns_same_doc(spark):
    df = _df(spark, [
        "dbs such as duck and pg. files, logs and other assets."
    ])
    assert _triples(hearst_triples(df)) == [
        ("duck", "dbs", "such_as"),
        ("files", "assets", "and_other"),
        ("logs", "assets", "and_other"),
        ("pg", "dbs", "such_as"),
    ]


def test_combined_list_tail_never_emits_other(spark):
    # 'animals such as cats, dogs and other pets': the greedy list tail
    # absorbs 'and other' in the such_as capture; the 'other' hyponym is
    # filtered while cats/dogs surface under BOTH hypernyms
    df = _df(spark, ["animals such as cats, dogs and other pets."])
    assert _triples(hearst_triples(df)) == [
        ("cats", "animals", "such_as"),
        ("cats", "pets", "and_other"),
        ("dogs", "animals", "such_as"),
        ("dogs", "pets", "and_other"),
    ]
