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


def test_bm25_matches_sql_on_tiny_vocab_ties(spark):
    from pyspark.sql import functions as F

    from kgspark.search import bm25_topk

    rng = random.Random(17)
    vocab = ["q1", "q2", "pad"]
    texts = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score_unats"], r["n_hit_terms"])
        for r in bm25_topk(df, ["q1", "q2"], top_k=25).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", texts)
    want = con.execute(r"""
WITH bm_t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
  FROM d
),
bm_corpus AS (SELECT count(*) AS n_docs, sum(len(ts)) AS sum_dl FROM bm_t),
bm_s AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS token FROM bm_t),
bm_f AS (SELECT * FROM bm_s WHERE token IN ('q1', 'q2')),
bm_tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM bm_f GROUP BY 1, 2, 3),
bm_df AS (SELECT token, count(DISTINCT doc_id) AS df FROM bm_f GROUP BY 1),
bm_c AS (
  SELECT t.doc_id,
    round(
      ln(1.0::DOUBLE
         + (CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5::DOUBLE)
           / (CAST(d.df AS DOUBLE) + 0.5::DOUBLE))
      * ((CAST(t.tf AS DOUBLE) * 2.2::DOUBLE)
         / (CAST(t.tf AS DOUBLE)
            + 1.2::DOUBLE * (0.25::DOUBLE
                + 0.75::DOUBLE * CAST(t.dl AS DOUBLE)
                  / (CAST(c.sum_dl AS DOUBLE) / CAST(c.n_docs AS DOUBLE)))))
      * 1000000.0::DOUBLE, 0)::BIGINT AS c
  FROM bm_tf t JOIN bm_df d USING (token), bm_corpus c
)
SELECT doc_id, sum(c)::BIGINT, count(*)::BIGINT
FROM bm_c GROUP BY doc_id ORDER BY 2 DESC, 1 ASC LIMIT 25""").fetchall()
    assert got == [tuple(w) for w in want]


def test_bursts_matches_sql_on_random_counts(spark):
    from datetime import datetime

    from kgspark.relops import burst_windows

    rng = random.Random(19)
    rows = []
    for _ in range(400):
        rows.append((
            rng.choice(["a", "b", "c"]),
            datetime(2024, 1, rng.randint(1, 28), rng.randint(0, 23), 0),
        ))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = sorted(
        (r["event_type"], r["window_start"], r["cnt"], r["is_burst"])
        for r in burst_windows(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(event_type VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
    want = sorted(con.execute("""
WITH c AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS w, count(*) AS cnt
  FROM ev GROUP BY 1, 2
),
s AS (
  SELECT *, count(*) OVER (PARTITION BY event_type) AS n,
         sum(cnt) OVER (PARTITION BY event_type) AS s,
         sum(cnt * cnt) OVER (PARTITION BY event_type) AS ss
  FROM c
)
SELECT event_type, w, cnt::BIGINT,
       (n * cnt > s AND
        (n * cnt - s)::HUGEINT * (n * cnt - s)::HUGEINT
          * (n - 1)::HUGEINT * 1000000::HUGEINT
        > 4000000::HUGEINT * n::HUGEINT
          * (n::HUGEINT * ss::HUGEINT - s::HUGEINT * s::HUGEINT))
FROM s""").fetchall())
    assert got == [tuple(w) for w in want]


def test_dsir_matches_sql_on_random_corpus(spark):
    from pyspark.sql import functions as F

    from kgspark.dsir import dsir_weights

    rng = random.Random(23)
    texts = [
        (i, " ".join(f"w{rng.randint(0, 20)}" for _ in range(rng.randint(0, 9))),
         rng.random() < 0.3)
        for i in range(50)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string, is_target boolean")
    got = sorted(tuple(r) for r in dsir_weights(df, n_buckets=64).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, is_target BOOLEAN)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", texts)
    hex6 = "0"
    for i in range(6):
        hex6 = (f"(({hex6}) * 16 + "
                f"(strpos('0123456789abcdef', substr(md5(g), {i + 1}, 1)) - 1))")
    want = sorted(tuple(w) for w in con.execute(rf"""
WITH t AS (
  SELECT doc_id, is_target,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
  FROM d
),
g AS (
  SELECT doc_id, is_target,
         unnest(ts || (CASE WHEN len(ts) >= 2
           THEN [array_to_string(ts[i:i+1], ' ') for i in range(1, len(ts))]
           ELSE []::VARCHAR[] END)) AS g
  FROM t
),
b AS (SELECT doc_id, is_target, ({hex6}) % 64 AS b FROM g),
cnt AS (
  SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
  FROM b GROUP BY b
),
tot AS (
  SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tt,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS tr
  FROM b
),
lr AS (
  SELECT b, round((ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 64 AS DOUBLE))
                 - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 64 AS DOUBLE)))
                 * 1000000.0::DOUBLE, 0)::BIGINT AS lr
  FROM cnt, tot
),
s AS (SELECT doc_id, sum(lr)::BIGINT AS sc, count(*)::BIGINT AS ng
      FROM b JOIN lr USING (b) GROUP BY doc_id)
SELECT t.doc_id, t.is_target, coalesce(s.ng, 0)::BIGINT,
       coalesce(s.sc, 0)::BIGINT
FROM t LEFT JOIN s USING (doc_id)""").fetchall())
    assert got == want


def test_sssp_matches_sql_on_random_weighted_graph(spark):
    from kgspark.graph_algs import sssp

    rng = random.Random(29)
    nodes = [f"n{i:02d}" for i in range(25)]
    edges = sorted({
        (rng.choice(nodes), rng.choice(nodes), round(rng.uniform(0.1, 5.0), 2))
        for _ in range(80)
    })
    df = spark.createDataFrame(edges, "subj string, obj string, weight double")
    start = min(e[0] for e in edges)
    got = sorted(
        (r["node"], round(r["dist"] * 1e6))
        for r in sssp(df, start, rounds=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(s VARCHAR, t VARCHAR, w DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    want = sorted(con.execute(f"""
WITH ed AS (SELECT s, t, min(w) AS w FROM e GROUP BY 1, 2),
d0 AS (SELECT '{start}' AS node, 0.0::DOUBLE AS dist),
d1 AS (SELECT node, min(dist) AS dist FROM (
  SELECT node, dist FROM d0
  UNION ALL SELECT e.t, p.dist + e.w FROM d0 p JOIN ed e ON e.s = p.node
) GROUP BY node),
d2 AS (SELECT node, min(dist) AS dist FROM (
  SELECT node, dist FROM d1
  UNION ALL SELECT e.t, p.dist + e.w FROM d1 p JOIN ed e ON e.s = p.node
) GROUP BY node),
d3 AS (SELECT node, min(dist) AS dist FROM (
  SELECT node, dist FROM d2
  UNION ALL SELECT e.t, p.dist + e.w FROM d2 p JOIN ed e ON e.s = p.node
) GROUP BY node)
SELECT node, round(dist * 1000000.0::DOUBLE, 0)::BIGINT FROM d3""").fetchall())
    assert got == [tuple(w) for w in want]


def test_iban_mod97_fold_matches_python_bignum(spark):
    """The 10-chunk mod-97 fold == Python arbitrary-precision % 97 on
    random digit strings up to the 70-digit design bound, and the
    whole census agrees with a Python reference on random well-formed
    IBANs (valid and corrupted)."""
    import random as _r

    from pyspark.sql import functions as F

    from kgspark.pii import IBAN_COUNTRY_LEN, iban_census, iban_mod97

    rng = _r.Random(421)
    digit_strings = [
        "".join(rng.choice("0123456789") for _ in range(rng.randint(1, 70)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in digit_strings], "s string")
    got = {r.s: r.m for r in
           df.select("s", iban_mod97(F.col("s")).alias("m")).collect()}
    for s in digit_strings:
        assert got[s] == int(s) % 97, s

    def py_valid(iban):
        up = iban.replace(" ", "").upper()
        re = up[4:] + up[:4]
        digits = "".join(str(ord(c) - 55) if c.isalpha() else c
                         for c in re)
        return int(digits) % 97 == 1

    cands = []
    for i in range(200):
        cc, ln = rng.choice(list(IBAN_COUNTRY_LEN.items()))
        bban = "".join(rng.choice("0123456789") for _ in range(ln - 4))
        chk = 98 - int(
            "".join(str(ord(c) - 55) if c.isalpha() else c
                    for c in bban + cc + "00")
        ) % 97
        iban = f"{cc}{chk:02d}{bban}"
        if i % 3 == 0:  # corrupt a digit
            j = rng.randint(4, len(iban) - 1)
            iban = iban[:j] + str((int(iban[j]) + 1) % 10) + iban[j + 1:]
        cands.append((i, iban))
    cdf = spark.createDataFrame(cands, "rec_id long, iban string")
    out = {r.rec_id: r.is_valid for r in iban_census(cdf).collect()}
    for i, iban in cands:
        assert out[i] == int(py_valid(iban)), iban


def test_gtin_census_matches_python_reference(spark):
    import random as _r

    from kgspark.pii import gtin_census

    rng = _r.Random(97)
    rows = []
    for i in range(200):
        d12 = [rng.randint(0, 9) for _ in range(12)]
        chk = (10 - sum(d * (1 if j % 2 == 0 else 3)
                        for j, d in enumerate(d12)) % 10) % 10
        last = chk if i % 2 == 0 else (chk + rng.randint(1, 9)) % 10
        code = "".join(map(str, d12)) + str(last)
        rows.append((i, f"x {code} y", int(last == chk)))
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string")
    out = {r.doc_id: r.n_valid for r in gtin_census(df).collect()}
    for i, _t, want in rows:
        assert out[i] == want, i
