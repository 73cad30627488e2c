"""kgembed: TransE scoring + filtered link-prediction ranks."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kgspark.kgembed import hash_embeddings, lp_ranks, transe_score


def _emb(value: str, dim: int = 8, salt: str = "") -> list[int]:
    h = hashlib.md5((salt + value).encode()).hexdigest()
    return [int(h[2 * i: 2 * i + 2], 16) - 128 for i in range(dim)]


def _l1(s: str, p: str, o: str, salt_e="e", salt_r="r") -> int:
    se, pe, oe = _emb(s, salt=salt_e), _emb(p, salt=salt_r), _emb(o, salt=salt_e)
    return sum(abs(a + b - c) for a, b, c in zip(se, pe, oe))


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("a", "is_a", "T1"), ("b", "is_a", "T1"), ("c", "is_a", "T2"),
        ("a", "has", "B1"), ("b", "has", "B2"), ("c", "has", "B1"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.fixture(scope="module")
def embs(spark, triples):
    ents = triples.select(F.col("subj").alias("e")).union(
        triples.select("obj")
    )
    ent = hash_embeddings(ents, "e", salt="e")
    rel = hash_embeddings(
        triples.select(F.col("pred").alias("r")), "r", salt="r"
    ).withColumnRenamed("entity", "rel")
    return ent, rel


def test_hash_embeddings_match_hashlib(spark):
    df = spark.createDataFrame([("x",), ("y",), ("x",)], "v string")
    out = {r["entity"]: r["emb"] for r in
           hash_embeddings(df, "v", dim=4, salt="s").collect()}
    assert set(out) == {"x", "y"}  # distinct
    assert out["x"] == _emb("x", dim=4, salt="s")
    assert all(-128 <= c <= 127 for e in out.values() for c in e)
    with pytest.raises(ValueError, match="dim"):
        hash_embeddings(df, "v", dim=17)


def test_transe_score_exact(triples, embs):
    ent, rel = embs
    got = {
        (r["subj"], r["pred"], r["obj"]): r["l1_score"]
        for r in transe_score(triples, ent, rel).collect()
    }
    assert len(got) == 6
    for (s, p, o), v in got.items():
        assert v == _l1(s, p, o), (s, p, o)


def test_transe_drops_uncovered(triples, embs):
    ent, rel = embs
    ent2 = ent.where(F.col("entity") != "c")
    out = transe_score(triples, ent2, rel)
    assert {(r["subj"], r["obj"]) for r in out.collect()} == {
        ("a", "T1"), ("b", "T1"), ("a", "B1"), ("b", "B2")
    }


def test_lp_ranks_brute_force(triples, embs):
    ent, rel = embs
    out = {
        (r["subj"], r["pred"], r["obj"]): (r["rank"], r["n_cand"])
        for r in lp_ranks(triples, ent, rel, filtered=True).collect()
    }
    assert len(out) == 6
    tset = {("a", "is_a", "T1"), ("b", "is_a", "T1"), ("c", "is_a", "T2"),
            ("a", "has", "B1"), ("b", "has", "B2"), ("c", "has", "B1")}
    ranges = {"is_a": {"T1", "T2"}, "has": {"B1", "B2"}}
    for (s, p, o), (rank, n_cand) in out.items():
        cands = {c for c in ranges[p] if c == o or (s, p, c) not in tset}
        assert n_cand == len(cands)
        te = _l1(s, p, o)
        expect = 1 + sum(
            1 for c in cands
            if (_l1(s, p, c), c) < (te, o)
        )
        assert rank == expect, (s, p, o)


def test_lp_ranks_filtered_vs_raw(spark, embs):
    ent, rel = embs
    # two true objects for (a, is_a): filtered protocol removes the OTHER
    # true object from each one's candidate list
    t = spark.createDataFrame(
        [("a", "is_a", "T1"), ("a", "is_a", "T2"), ("c", "is_a", "T2")],
        "subj string, pred string, obj string",
    )
    filt = {(r["subj"], r["obj"]): r["n_cand"]
            for r in lp_ranks(t, ent, rel, filtered=True).collect()}
    raw = {(r["subj"], r["obj"]): r["n_cand"]
           for r in lp_ranks(t, ent, rel, filtered=False).collect()}
    assert filt[("a", "T1")] == 1 and raw[("a", "T1")] == 2
    assert filt[("c", "T2")] == 2  # a's truths don't affect c


def test_lp_rank_deterministic_tie_break(spark):
    # identical embeddings for every entity -> all energies equal; rank is
    # then the candidate's position in lexicographic order
    ents = ["o1", "o2", "o3", "s"]
    ent = spark.createDataFrame(
        [(e, [0, 0]) for e in ents], "entity string, emb array<int>"
    )
    rel = spark.createDataFrame([("p", [0, 0])], "rel string, emb array<int>")
    t = spark.createDataFrame(
        [("s", "p", "o1"), ("s", "p", "o2"), ("s", "p", "o3")],
        "subj string, pred string, obj string",
    )
    got = {r["obj"]: r["rank"]
           for r in lp_ranks(t, ent, rel, filtered=True).collect()}
    # filtered: each truth competes only against itself -> rank 1 always?
    # no: candidates are the 3 range objects, the OTHER two are true
    # triples of (s, p) and get filtered -> n_cand == 1, rank == 1
    assert got == {"o1": 1, "o2": 1, "o3": 1}
    raw = {r["obj"]: r["rank"]
           for r in lp_ranks(t, ent, rel, filtered=False).collect()}
    assert raw == {"o1": 1, "o2": 2, "o3": 3}


def test_energy_outliers_integer_rank(spark):
    from kgspark.kgembed import energy_outliers

    rows = [("s%02d" % i, "p", "o", 100 + i) for i in range(40)]
    rows += [("t%02d" % i, "q", "o", 50) for i in range(10)]  # small group
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, l1_score long"
    )
    out = energy_outliers(df, permille=900, min_group=20).collect()
    # p group: n=40, thr = 36 -> ranks 37..40 = the 4 highest energies
    assert sorted(r["subj"] for r in out) == ["s36", "s37", "s38", "s39"]
    assert all(r["pred"] == "p" and r["n"] == 40 and r["thr_rank"] == 36
               for r in out)
    # q group skipped by min_group
    import pytest as _p
    with _p.raises(ValueError, match="permille"):
        energy_outliers(df, permille=0)


def test_energy_outliers_tie_break_deterministic(spark):
    from kgspark.kgembed import energy_outliers

    rows = [("s%02d" % i, "p", "o", 7) for i in range(20)]  # all equal
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, l1_score long"
    )
    out = energy_outliers(df, permille=900, min_group=20).collect()
    # thr 18: ranks 19, 20 = last two subjects in (score, subj, obj) order
    assert sorted(r["subj"] for r in out) == ["s18", "s19"]


def test_distmult_score_hand_case_and_symmetry(spark):
    from kgspark.kgembed import distmult_score

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("a", "p", "zz")],
        "subj string, pred string, obj string",
    )
    ent = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3, -1])], "entity string, emb array<int>"
    )
    rel = spark.createDataFrame(
        [("p", [2, 5])], "rel string, emb array<int>"
    )
    got = {(r.subj, r.obj): r.dm_score
           for r in distmult_score(t, ent, rel).collect()}
    # a·p·b = 1*2*3 + 2*5*(-1) = -4; symmetric; zz uncovered -> dropped
    assert got == {("a", "b"): -4, ("b", "a"): -4}


def test_complex_score_hand_case_and_antisymmetry(spark):
    from kgspark.kgembed import complex_score

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("a", "p", "zz")],
        "subj string, pred string, obj string",
    )
    # arrays are [re_0, re_1, im_0, im_1]
    ent = spark.createDataFrame(
        [("a", [1, 2, 3, -1]), ("b", [2, 0, 1, 1])],
        "entity string, emb array<int>",
    )
    rel = spark.createDataFrame(
        [("p", [1, 1, 2, -2])], "rel string, emb array<int>"
    )
    got = {(r.subj, r.obj): r.cx_score
           for r in complex_score(t, ent, rel).collect()}
    # hand-computed Re(<s, p, conj(o)>): i=0 gives 2+3+2-12, i=1 gives
    # 0-1-4-0 -> -10; the reverse direction differs (antisymmetry, the
    # property DistMult cannot have); zz uncovered -> dropped
    assert got == {("a", "b"): -10, ("b", "a"): 18}


def test_rotate_score_hand_case_and_direction(spark):
    from kgspark.kgembed import rotate_score

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("a", "p", "zz")],
        "subj string, pred string, obj string",
    )
    # arrays are [re_0, re_1, im_0, im_1] (same layout as complex_score)
    ent = spark.createDataFrame(
        [("a", [1, 2, 3, -1]), ("b", [2, 0, 1, 1])],
        "entity string, emb array<int>",
    )
    rel = spark.createDataFrame(
        [("p", [1, 1, 2, -2])], "rel string, emb array<int>"
    )
    got = {(r.subj, r.obj): r.ro_score
           for r in rotate_score(t, ent, rel).collect()}
    # hand-computed ||h∘r − t||_1: a∘p = (−5+5i, 0−5i), minus b=(2+i, 0+i)
    # → |−7|+|4| + |0|+|−6| = 17; b∘p = (0+5i, 2+i), minus a=(1+3i, 2−i)
    # → 3 + 2 = 5 — direction-sensitive; zz uncovered -> dropped
    assert got == {("a", "b"): 17, ("b", "a"): 5}
