"""Adversarial oracle cross-checks for the deterministic-ranking operators.

The driver gate compares against benign corpus data; these tests re-run
the same Spark-vs-DuckDB comparison on seeded ADVERSARIAL inputs — heavy
ties, NULLs, duplicate scores, random graphs — where tie-break and
boundary bugs actually live."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import Row


def test_lm_buckets_matches_sql_ntile_on_ties_and_nulls(spark):
    from kgspark.lm import lm_buckets

    rng = random.Random(7)
    # scores drawn from a tiny value set -> massive ties; ~10% NULLs
    rows = [
        Row(doc_id=i, n_bigrams=5,
            bits=None if rng.random() < 0.1 else float(rng.choice([1, 2, 3])))
        for i in range(97)
    ]
    for n in (1, 2, 3, 5, 10):
        got = {r["doc_id"]: r["bucket"]
               for r in lm_buckets(spark.createDataFrame(rows), n=n).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE s(doc_id BIGINT, bits DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?, ?)",
                        [(r.doc_id, r.bits) for r in rows])
        want = dict(con.execute(f"""
            SELECT doc_id, ntile({n}) OVER (
              ORDER BY coalesce(bits, 'infinity'::DOUBLE) ASC, doc_id ASC)
            FROM s""").fetchall())
        assert got == want, f"n={n}"


def test_doc_keywords_rank_matches_sql_on_tied_tf(spark):
    from kgspark.keywords import doc_keywords

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
             for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["token"], r["tf"], r["dfreq"])
        for r in doc_keywords(df, k=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", texts)
    want = sorted(con.execute(r"""
        WITH t AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
          FROM d
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY 1)
        SELECT doc_id, token, tf, dfreq FROM (
          SELECT f.*, d2.dfreq, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY tf DESC, d2.dfreq ASC, token ASC) AS rn
          FROM tf f JOIN df d2 USING (token)
        ) WHERE rn <= 2""").fetchall())
    assert got == want


def test_label_propagation_matches_sql_on_random_graph(spark):
    from kgspark.graph_algs import label_propagation

    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(70)})
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = dict(
        (r["node"], r["label"])
        for r in label_propagation(df, iterations=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(s VARCHAR, t VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = dict(con.execute("""
        WITH ed AS (SELECT DISTINCT s, t FROM e WHERE s <> t),
        adj AS (
          SELECT DISTINCT node, nbr FROM (
            SELECT s AS node, t AS nbr FROM ed
            UNION ALL SELECT t, s FROM ed)
        ),
        l0 AS (SELECT DISTINCT node, node AS label FROM adj),
        c1 AS (SELECT a.node, l.label, count(*) AS c FROM adj a
               JOIN l0 l ON l.node = a.nbr GROUP BY 1, 2),
        l1 AS (SELECT node, label FROM (
          SELECT node, label, row_number() OVER (
            PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM c1)
          WHERE rn = 1),
        c2 AS (SELECT a.node, l.label, count(*) AS c FROM adj a
               JOIN l1 l ON l.node = a.nbr GROUP BY 1, 2),
        l2 AS (SELECT node, label FROM (
          SELECT node, label, row_number() OVER (
            PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM c2)
          WHERE rn = 1)
        SELECT node, label FROM l2""").fetchall())
    assert got == want
