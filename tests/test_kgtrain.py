"""Deterministic negative sampling for KG-embedding training."""

from __future__ import annotations

from kgspark.kgtrain import negative_samples

TRIPLES = [("a", "likes", "b"), ("b", "likes", "c"), ("c", "knows", "a")]


def _t(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_negative_samples_deterministic_and_disjoint(spark):
    t = _t(spark)
    one = sorted(map(tuple, negative_samples(t, k=2).collect()))
    two = sorted(map(tuple, negative_samples(t, k=2).collect()))
    assert one == two                      # replayable: no RNG anywhere
    true_set = set(TRIPLES)
    for subj, pred, obj, neg_id, side in one:
        assert (subj, pred, obj) not in true_set
        assert neg_id in (0, 1)
        orig = [tr for tr in TRIPLES
                if (tr[1] == pred and (tr[2] == obj if side == "head" else tr[0] == subj))]
        assert orig, (subj, pred, obj, side)  # exactly one side was replaced
    assert len(one) <= len(TRIPLES) * 2


def test_negative_samples_replacements_are_known_entities(spark):
    ents = {x for tr in TRIPLES for x in (tr[0], tr[2])}
    for subj, pred, obj, _nid, side in negative_samples(_t(spark), k=3).collect():
        assert (subj if side == "head" else obj) in ents


def test_neighbor_sample_deterministic_fanout(spark):
    import hashlib

    from kgspark.kgtrain import neighbor_sample

    # hub node h has 10 out-neighbors; fanout must cap it at 3
    edges = [("a", "h"), ("b", "h")]
    edges += [("h", f"n{i}") for i in range(10)]
    edges += [(f"n{i}", f"m{i}") for i in range(10)]
    edges += [(f"n{i}", f"m{i}x") for i in range(10)]
    t = spark.createDataFrame(
        [(s, "rel", o) for s, o in edges], "subj string, pred string, obj string"
    )
    seeds = spark.createDataFrame([("a",), ("b",)], "seed string")
    got = neighbor_sample(t, seeds, fanouts=(3, 2))
    rows = got.collect()

    def rank(src):
        outs = sorted({o for s, o in edges if s == src},
                      key=lambda d: (hashlib.md5(
                          f"{src}:{d}".encode()).hexdigest(), d))
        return outs

    # python replica of the two-hop block for each seed
    want = set()
    for seed in ("a", "b"):
        f1 = rank(seed)[:3]
        for d in f1:
            want.add((seed, seed, d, 1))
        f2 = set()
        for n in f1:
            for d in rank(n)[:2]:
                want.add((seed, n, d, 2))
                f2.add(d)
    assert {(r.seed, r.src, r.dst, r.hop) for r in rows} == want
    # hub capped: h contributes at most 2 hop-2 edges per seed
    per = {}
    for r in rows:
        if r.hop == 2 and r.src == "h":
            per.setdefault(r.seed, 0)
            per[r.seed] += 1
    assert all(v <= 2 for v in per.values()) and per
