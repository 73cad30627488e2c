"""Source dispatch (S1-S7), schema induction (A10), eps elbow (A5),
bisecting fallback (A6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgspark.schema_induce import analyze_document, induce_schema
from kgspark.sources import dispatch, read_documents
from kgspark.topics import cluster_chunks, eps_elbow


def test_dispatch_formats(tmp_path):
    assert dispatch("a.txt", b"hello\t world\n")["content"] == "hello world"
    assert dispatch("a.html", b"<p>hi</p>")["content"] == "hi"
    csv = dispatch("a.csv", b"x,y\n1,2\n")
    assert csv["error"] is None and '"x": 1' in csv["content"]
    j = dispatch("a.json", b'{"k": [1, 2]}')
    assert j["content"] == '{"k": [1, 2]}'


def test_dispatch_stubs_and_errors():
    pdf = dispatch("a.pdf", b"%PDF")
    assert pdf["content"] is None and "NotImplementedError" in pdf["error"]
    img = dispatch("b.png", b"\x89PNG")
    assert "NotImplementedError" in img["error"]
    bad = dispatch("c.xyz", b"")
    assert "Unsupported file format: .xyz" in bad["error"]
    corrupt = dispatch("d.json", b"{nope")
    assert corrupt["error"] and corrupt["content"] is None


def test_read_documents_scan(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes(b"alpha  beta")
    (tmp_path / "b.html").write_bytes(b"<body><p>gamma</p></body>")
    (tmp_path / "c.pdf").write_bytes(b"%PDF-1.4")
    out = {os.path.basename(r["path"]): r
           for r in read_documents(spark, str(tmp_path)).collect()}
    assert out["a.txt"]["content"] == "alpha beta"
    assert out["b.html"]["content"] == "gamma"
    assert out["c.pdf"]["error"] and "NotImplementedError" in out["c.pdf"]["error"]


def test_analyze_document_matches_reference_semantics():
    doc = '{"person": {"name": "Ada", "age": 36, "jobs": [{"title": "eng"}]}}'
    rows = analyze_document(doc)
    classes = {r["a"] for r in rows if r["kind"] == "class"}
    rels = {(r["a"], r["rel"], r["b"]) for r in rows if r["kind"] == "relationship"}
    props = {(r["a"], r["b"]) for r in rows if r["kind"] == "property"}
    assert {"Person", "Name", "Age", "Jobs", "Title"} <= classes
    assert ("Person", "hasName", "Name") in rels
    assert ("Jobs", "hasTitle", "Title") in rels
    assert ("Name", "str") in props and ("Age", "int") in props
    assert analyze_document("not json") == []


def test_induce_schema_distinct(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": 1}}',), ('{"a": {"b": 2}}',)], "raw_json string"
    )
    rows = induce_schema(df).collect()
    # identical structure across docs -> one distinct row set
    assert len(rows) == len({tuple(r) for r in rows})
    kinds = {r["kind"] for r in rows}
    assert kinds == {"class", "relationship", "property"}


def test_eps_elbow(spark):
    # two tight clusters far apart: the elbow lands on a 2-NN distance from
    # the tight within-cluster regime (all 2-NN distances are within-cluster)
    rows = [(f"a{i}", [0.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (f"b{i}", [10.0 + i * 0.01, 0.0]) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, "chunk_uid string, embedding array<float>")
    eps = eps_elbow(emb, max_rows=100)
    assert 0.0 < eps < 1.0


def test_bisecting_fallback(spark):
    from kgspark.embed import embed_udf

    df = spark.createDataFrame(
        [(f"text number {i}",) for i in range(12)], "chunk_text string"
    ).withColumn("embedding", embed_udf(16)(F.col("chunk_text")))
    out, k = cluster_chunks(df, k=3, method="bisecting")
    assert k == 3
    assert out.select("cluster").distinct().count() == 3
