"""graphml: canonical GraphML line-table export."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from kgspark.graphml import graphml_lines


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("a<b", "rel&1", 'c"d', 480000),
        ("x", "knows", "a<b", 1000000),
        ("x", "knows", "a<b", 1000000),  # dup collapses
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, w long"
    )


def _doc(df) -> str:
    rows = df.orderBy("section", "sort_key", "line").collect()
    return "\n".join(r["line"] for r in rows)


def test_well_formed_and_escaped(edges):
    doc = _doc(graphml_lines(edges, weight="w"))
    root = ET.fromstring(doc)  # parses => well-formed XML
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    node_ids = {n.get("id") for n in g.findall(f"{ns}node")}
    assert node_ids == {"a<b", "x", 'c"d'}  # ET un-escapes
    es = g.findall(f"{ns}edge")
    assert len(es) == 2  # duplicate edge collapsed
    by_pair = {(e.get("source"), e.get("target")): e for e in es}
    e1 = by_pair[("a<b", 'c"d')]
    datas = {d.get("key"): d.text for d in e1}
    assert datas == {"label": "rel&1", "weight": "480000"}


def test_sections_and_counts(edges):
    df = graphml_lines(edges, weight="w")
    counts = {r["section"]: r["n"] for r in
              df.groupBy("section").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 5, 1: 3, 2: 2, 3: 2}


def test_no_weight_column(spark):
    e = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    doc = _doc(graphml_lines(e))
    assert "weight\">" not in doc.replace('<key id="weight"', "")
    ET.fromstring(doc)


def test_empty_edges_still_valid_doc(spark):
    e = spark.createDataFrame([], "subj string, pred string, obj string")
    doc = _doc(graphml_lines(e))
    root = ET.fromstring(doc)
    assert len(list(root)) == 3  # two <key> declarations + empty <graph>
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    assert len(list(root.find(f"{ns}graph"))) == 0
