"""API-surface tests: graph read API, viz export, catalog, validation,
entity extraction, silhouette sweep."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgspark.catalog import delete_document, list_documents
from kgspark.entities import entities_table, extract_entities
from kgspark.graph_api import (
    get_node_history,
    get_relationship_confidence,
    query_graph,
    validate_relationship,
)
from kgspark.linking import alias_table
from kgspark.validate import fix_json_content, parse_envelopes
from kgspark.viz import export_html

TRIPLES = [
    ("Acme Corp", "is_a", "company", 0.8, None, "d1", 0.8, True),
    ("company", "has_instance", "Acme Corp", 0.8, None, "d1", 0.8, True),
    ("Acme Corp", "related_to", "Globex", 0.48, None, "d2", 0.8, True),
]
TRIPLES_SCHEMA = (
    "subj string, pred string, obj string, weight double, ts timestamp, "
    "source string, confidence double, bidirectional boolean"
)


def _triples(spark):
    return spark.createDataFrame(TRIPLES, TRIPLES_SCHEMA)


def test_query_graph(spark):
    out = query_graph(_triples(spark), "ACME")
    rows = {(r["subject"], r["relation"], r["object"]) for r in out.collect()}
    assert ("Acme Corp", "is_a", "company") in rows
    assert len(rows) == 3  # acme appears as subj or obj in all three
    assert query_graph(_triples(spark), "zzz").count() == 0


def test_relationship_confidence_and_validate(spark):
    t = _triples(spark)
    assert get_relationship_confidence(t, "Acme Corp", "company") == 0.8
    assert get_relationship_confidence(t, "nope", "company") == 0.0
    v = validate_relationship(t, "Acme Corp", "is_a", "company")
    assert v == {"exists": True, "type_matches": True, "confidence": 0.8}
    v2 = validate_relationship(t, "Acme Corp", "has", "company")
    assert v2["exists"] and not v2["type_matches"]
    assert validate_relationship(t, "x", "y", "z") == {
        "exists": False, "type_matches": False, "confidence": 0.0
    }


def test_node_history(spark):
    nodes = spark.createDataFrame(
        [("Acme Corp", "concept", None, "d1", 0.8)],
        "node_id string, node_type string, ts timestamp, source string, confidence double",
    )
    h = get_node_history(_triples(spark), nodes, "Acme Corp").collect()
    events = [r["event"] for r in h]
    assert "node_created" in events
    assert events.count("relationship") == 3


def test_viz_export(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("Acme Corp", "concept", 20.0), ("company", "topic", 30.0),
         ("Globex", "concept", 12.5)],
        "node_id string, node_type string, size double",
    )
    out = export_html(nodes, _triples(spark), str(tmp_path / "g.html"))
    html = open(out).read()
    assert "Acme Corp" in html and "#ff7f0e" in html
    assert '"width": 4.0' in html  # weight 0.8 * 5 (ref :621)
    assert "<svg>" in html and "cdn" not in html.lower()  # self-contained


def test_catalog_list_and_delete(spark, tmp_path):
    docs = spark.createDataFrame(
        [("a.txt", "hello world", None, "s1"), ("b.txt", "", None, "s2")],
        "filename string, content string, ts timestamp, source string",
    )
    listed = {r["filename"]: r for r in list_documents(docs).collect()}
    assert listed["a.txt"]["is_valid"] and listed["a.txt"]["n_chars"] == 11
    assert not listed["b.txt"]["is_valid"]

    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    removed = delete_document(spark, path, "a.txt")
    assert removed == 1
    left = spark.read.parquet(path)
    assert [r["filename"] for r in left.collect()] == ["b.txt"]


def test_envelope_validation(spark):
    rows = [
        ('{"filename":"a.txt","file_type":"txt","timestamp":"2024-01-01T00:00:00","data":{"content":"hi"}}',),
        ('{"filename":"b.bin","file_type":"exe","data":{"content":"x"}}',),   # bad type
        ('{"filename":"c.txt","file_type":"txt","data":{"content":""}}',),    # empty
        ("not json at all",),
    ]
    df = spark.createDataFrame(rows, "raw_json string")
    out = {r["filename"]: r for r in parse_envelopes(df).collect()}
    assert out["a.txt"]["is_valid"] and out["a.txt"]["content"] == "hi"
    assert not out["b.bin"]["is_valid"]
    assert not out["c.txt"]["is_valid"]
    assert None in out and not out[None]["is_valid"]


def test_fix_json_content(spark):
    df = spark.createDataFrame(
        [('{"a":\r\n"b\x00c\x01"}',)], "raw_json string"
    )
    fixed = fix_json_content(df).collect()[0]["raw_json"]
    assert fixed == '{"a":\n"bc"}'


def test_extract_entities_priority():
    amap = {"acme": "Acme Corp", "apache spark": "Apache Spark", "spark": "Spark?"}
    ents = extract_entities(
        "We deployed Apache Spark at Acme with Globex Systems yesterday.", amap
    )
    by_text = {e["text"]: e for e in ents}
    assert by_text["Apache Spark"]["weight"] == 1.0        # longest dict hit wins
    assert by_text["Acme Corp"]["source"] == "dict"
    assert by_text["Globex Systems"]["weight"] == 0.5      # heuristic span
    assert extract_entities(None, amap) == []


def test_entities_table_dedup(spark):
    docs = spark.createDataFrame(
        [("d1", "Acme ships globally."), ("d2", "ACME is mentioned again.")],
        "filename string, content string",
    )
    out = entities_table(docs, alias_table(spark))
    acme = [r for r in out.collect() if r["text"] == "Acme Corp"]
    assert len(acme) == 1 and acme[0]["weight"] == 1.0


def test_silhouette_sweep_small(spark):
    from kgspark.embed import embed_udf
    from kgspark.topics import cluster_chunks

    texts = [(f"alpha beta {i}",) for i in range(6)] + [
        (f"gamma delta {i}",) for i in range(6)
    ]
    df = spark.createDataFrame(texts, "chunk_text string").withColumn(
        "embedding", embed_udf(16)(F.col("chunk_text"))
    )
    out, k = cluster_chunks(df, k=None, k_min=2, k_max=4)
    assert 2 <= k <= 4
    assert out.select("cluster").distinct().count() == k


def test_excel_stub_or_real():
    from kgspark.sources import dispatch

    out = dispatch("t.xlsx", b"PK\x03\x04fake")
    # with no excel codec installed the seam reports, never crashes the scan
    assert out["content"] is None and out["error"]


def test_write_envelopes_reference_format(spark, tmp_path):
    import json

    from kgspark.validate import write_envelopes

    docs = spark.createDataFrame(
        [("a.txt", "txt", "héllo wörld", None)],
        "filename string, file_type string, content string, ts timestamp",
    )
    out = str(tmp_path / "envs")
    write_envelopes(docs, out)
    rows = spark.read.parquet(out).collect()
    env = rows[0]["envelope_json"]
    # byte-format fidelity to ref knowledgeGraph.py:113-121:
    # indent=4, ensure_ascii=False (unicode kept raw), default=str
    assert env == json.dumps(
        {"filename": "a.txt", "file_type": "txt",
         "data": {"content": "héllo wörld"}, "timestamp": None},
        indent=4, ensure_ascii=False, default=str,
    )
    assert "héllo" in env and "\\u" not in env
