"""Pipeline canonicalization stage: near-dup entity surfaces the alias
dictionary does NOT know must merge via MinHash-LSH + connected components,
and the entities output table must reflect canonical entities only."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kgspark.io_tables import PAGES_SCHEMA
from kgspark.pipeline import build_kg


def _page(url, text, ts):
    return (url, ts, text.encode(), text, "en")


def test_near_dup_surfaces_merge(spark, tmp_path):
    ts = dt.datetime(2024, 5, 1)
    pages = spark.createDataFrame(
        [
            _page("u1", "Initech Systems is a company. Initech Systems has Division9.", ts),
            # punctuation near-dup surface, unknown to the alias table
            _page("u2", "Initech Systems. is a company. Initech Systems. has Division9.", ts),
            _page("u3", "Globex is a company.", ts),
        ],
        PAGES_SCHEMA,
    )
    out = build_kg(spark, pages, str(tmp_path / "run"), with_topics=False)
    subs = {r["subj"] for r in out["triples"].select("subj").distinct().collect()}
    # one canonical survivor, not both variants
    variants = {s for s in subs if s.lower().startswith("initech")}
    assert variants == {"Initech Systems"}, subs

    ents = {r["entity"]: r for r in out["entities"].collect()}
    assert "Initech Systems" in ents
    assert not any(e.endswith(".") and e.lower().startswith("initech") for e in ents)
    # degree counts subj+obj appearances in canonical triples
    assert ents["Initech Systems"]["degree"] >= 4
    assert ents["Globex"]["n_sources"] == 1


def test_entities_table_shape(spark, tmp_path):
    from kgspark.synth import pages_df

    out = build_kg(spark, pages_df(spark, 25, seed=6), str(tmp_path / "r2"),
                   with_topics=False)
    e = out["entities"]
    assert set(e.columns) == {"entity", "degree", "last_ts", "n_sources", "importance"}
    assert e.count() == e.select("entity").distinct().count()
    assert e.where(F.col("degree") <= 0).count() == 0
