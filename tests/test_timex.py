"""kgspark.timex: TIMEX-lite date extraction + ISO normalization."""

from __future__ import annotations

from kgspark.timex import extract_dates


def test_extract_dates_three_forms(spark):
    docs = spark.createDataFrame(
        [(1, "released 2024-05-13 then May 3, 2019 and 7 Dec 1999 end"),
         (2, "no dates here"),
         (3, "dup 2020-01-01 dup 2020-01-01")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.fmt, r.mention, r.iso_date)
        for r in extract_dates(docs).collect()
    )
    assert got == [
        (1, "abbr", "7 Dec 1999", "1999-12-07"),
        (1, "iso", "2024-05-13", "2024-05-13"),
        (1, "long", "May 3, 2019", "2019-05-03"),
        (3, "iso", "2020-01-01", "2020-01-01"),
        (3, "iso", "2020-01-01", "2020-01-01"),   # bag semantics
    ]


def test_extract_dates_lexical_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "bad 2024-13-01 bad 2024-00-10 bad 2024-05-32 "
             "bad 32 Jan 2020 ok 31 Jan 2020 y3k 2101-01-01 "
             "old 1899-01-01")],
        "doc_id long, text string",
    )
    got = {(r.fmt, r.mention) for r in extract_dates(docs).collect()}
    assert got == {("abbr", "31 Jan 2020")}


def test_extract_dates_null_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    assert extract_dates(docs).count() == 0
