"""Aho-Corasick gazetteer scan: correctness vs the naive substring loop and
linear-scan behavior at 10^4 surfaces."""

from __future__ import annotations

import random
import time

from kgspark.entities import build_automaton, extract_entities, match_surfaces


def _gazetteer(n=10_000, seed=7):
    rng = random.Random(seed)
    words = ["acme", "globex", "initech", "umbrella", "stark", "wayne",
             "cyberdyne", "tyrell", "weyland", "hooli"]
    surfaces = {}
    for i in range(n):
        s = f"{rng.choice(words)} {rng.choice(words)} {i}"
        surfaces[s] = s.title()
    return surfaces


def test_automaton_matches_equal_naive():
    amap = _gazetteer()
    auto = build_automaton(amap)
    rng = random.Random(13)
    keys = list(amap)
    for _ in range(50):
        # docs embedding a few known surfaces plus noise
        doc = " ".join(
            [rng.choice(keys) for _ in range(3)]
            + ["lorem ipsum dolor sit amet"] * 2
        )
        naive = {s for s in amap if s in doc}
        assert match_surfaces(doc, auto) == naive


def test_extract_entities_identical_with_and_without_automaton():
    amap = {"apache spark": "Apache Spark", "spark": "Spark SQL",
            "acme": "Acme Corp"}
    auto = build_automaton(amap)
    for doc in ["we run apache spark at acme", "spark only", "", "no hits"]:
        assert extract_entities(doc, amap, automaton=auto) == \
               extract_entities(doc, amap)


def test_subquadratic_scan_at_1e4_surfaces():
    """The AC pass over N docs must beat the naive O(|aliases| * doc) loop
    by a wide margin at 10^4 surfaces (the structural point of the
    automaton; generous 2x bound to keep the test unflaky)."""
    amap = _gazetteer()
    auto = build_automaton(amap)
    docs = [f"filler text about acme globex {i} and more filler words here"
            for i in range(200)]
    t0 = time.perf_counter()
    ac_res = [match_surfaces(d, auto) for d in docs]
    t_ac = time.perf_counter() - t0
    t0 = time.perf_counter()
    naive_res = [{s for s in amap if s in d} for d in docs]
    t_naive = time.perf_counter() - t0
    assert ac_res == naive_res
    assert t_ac < t_naive / 2, (t_ac, t_naive)


def test_entity_cooccurrence_pairs_within_doc(spark):
    from kgspark.entities import entity_cooccurrence
    from kgspark.linking import alias_table

    aliases = alias_table(spark, [
        ("spark", "Apache Spark", 1.0),
        ("duckdb", "DuckDB", 1.0),
        ("flink", "Apache Flink", 1.0),
    ])
    docs = spark.createDataFrame(
        [(0, "spark beats duckdb"), (1, "spark and duckdb and flink"),
         (2, "only spark here"), (3, None)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["e1"], r["e2"], r["n_docs"])
        for r in entity_cooccurrence(
            docs, aliases, text_col="text", id_col="doc_id").collect()
    )
    assert got == [
        ("Apache Flink", "Apache Spark", 1),
        ("Apache Flink", "DuckDB", 1),
        ("Apache Spark", "DuckDB", 2),
    ]
    assert entity_cooccurrence(
        docs, aliases, text_col="text", id_col="doc_id", min_docs=2
    ).count() == 1
