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
