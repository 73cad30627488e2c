"""Table IO seam tests (parquet fallback of the Iceberg catalog seam)."""

from __future__ import annotations

from kgspark.io_tables import (
    PAGES_SCHEMA,
    TRIPLES_SCHEMA,
    iceberg_available,
    read_table,
    write_table,
)
from kgspark.synth import pages_df


def test_roundtrip_parquet(spark, tmp_path):
    base = str(tmp_path)
    df = pages_df(spark, 10, seed=3)
    write_table(df, base, "pages")
    back = read_table(spark, base, "pages")
    assert back.schema == PAGES_SCHEMA
    assert back.count() == 10
    # byte-identity survives the parquet round trip
    a = {r["url"]: r["text"] for r in df.collect()}
    b = {r["url"]: r["text"] for r in back.collect()}
    assert a == b


def test_bucket_by_fallback(spark, tmp_path):
    base = str(tmp_path)
    t = spark.createDataFrame(
        [("s", "p", "o", 1.0, None, "x", 0.8, True)],
        TRIPLES_SCHEMA,
    )
    write_table(t, base, "triples", bucket_by=(4, "subj"))
    assert read_table(spark, base, "triples").count() == 1


def test_append_mode(spark, tmp_path):
    base = str(tmp_path)
    df = pages_df(spark, 5, seed=1)
    write_table(df, base, "pages")
    write_table(df, base, "pages", mode="append")
    assert read_table(spark, base, "pages").count() == 10


def test_no_iceberg_in_sandbox(spark):
    assert not iceberg_available(spark)
