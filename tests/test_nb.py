"""Multinomial Naive Bayes: train/score/classify, fixed-point determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgspark.nb import classify_nb, score_nb, train_nb


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark shuffle", "eng"),
        (2, "spark join", "eng"),
        (3, "cat dog dog", "pets"),
        (4, "dog hamster", "pets"),
        (5, "spark cat", "eng"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_train_counts(corpus):
    classes, counts = train_nb(corpus)
    cl = {r["label"]: r for r in classes.collect()}
    assert cl["eng"]["tot_tokens"] == 7 and cl["pets"]["tot_tokens"] == 5
    assert cl["eng"]["v"] == 6 and cl["pets"]["v"] == 6  # shared vocab
    assert cl["eng"]["prior_unats"] == round(math.log(3 / 5) * 1e6)
    got = {(r["label"], r["token"]): r["cnt"] for r in counts.collect()}
    assert got[("eng", "spark")] == 4
    assert got[("pets", "dog")] == 3
    assert ("pets", "spark") not in got  # absent pairs are not materialized


def test_score_matches_hand_computation(corpus):
    classes, counts = train_nb(corpus)
    scores = score_nb(corpus, classes, counts)
    got = {
        (r["doc_id"], r["label"]): r["score_unats"] for r in scores.collect()
    }
    # doc 2 = "spark join" under eng: prior ln(3/5), spark (4+1)/(7+6),
    # join (1+1)/(7+6); every term quantized BEFORE the sum
    exp = (
        round(math.log(3 / 5) * 1e6)
        + round(math.log(5 / 13) * 1e6)
        + round(math.log(2 / 13) * 1e6)
    )
    assert got[(2, "eng")] == exp
    # under pets: spark unseen -> (0+1)/(5+6), join unseen -> 1/11
    exp_p = round(math.log(2 / 5) * 1e6) + 2 * round(math.log(1 / 11) * 1e6)
    assert got[(2, "pets")] == exp_p
    assert got[(2, "eng")] > got[(2, "pets")]
    # every doc gets every class
    assert len(got) == 5 * 2


def test_classify_argmax_and_margin(corpus):
    classes, counts = train_nb(corpus)
    out = classify_nb(score_nb(corpus, classes, counts))
    pred = {r["doc_id"]: r for r in out.collect()}
    assert [pred[i]["pred"] for i in (1, 2, 3, 4)] == [
        "eng", "eng", "pets", "pets"]
    assert all(r["margin_unats"] >= 0 for r in pred.values())
    sc = {
        (r["doc_id"], r["label"]): r["score_unats"]
        for r in score_nb(corpus, classes, counts).collect()
    }
    assert pred[3]["margin_unats"] == sc[(3, "pets")] - sc[(3, "eng")]


def test_score_oov_and_empty_docs(spark, corpus):
    classes, counts = train_nb(corpus)
    unseen = spark.createDataFrame(
        [(10, "zebra zebra"), (11, ""), (12, None)],
        "doc_id long, text string",
    )
    scores = score_nb(unseen, classes, counts)
    got = {(r["doc_id"], r["label"]): r["score_unats"]
           for r in scores.collect()}
    assert len(got) == 6  # every doc x every class, even null text
    # empty & null docs score on priors alone
    pri = {r["label"]: r["prior_unats"] for r in classes.collect()}
    assert got[(11, "eng")] == pri["eng"] and got[(12, "pets")] == pri["pets"]
    # OOV tokens take the smoothed zero count, stay finite
    assert got[(10, "eng")] == pri["eng"] + 2 * round(
        math.log(1 / 13) * 1e6)


def test_null_labels_excluded_from_fit(spark, corpus):
    extra = spark.createDataFrame(
        [(99, "spark spark spark", None)],
        "doc_id long, text string, label string",
    )
    classes, _ = train_nb(corpus.unionByName(extra))
    cl = {r["label"]: r for r in classes.collect()}
    assert set(cl) == {"eng", "pets"}
    assert cl["eng"]["tot_tokens"] == 7  # unlabeled doc not counted


def test_determinism_across_partitionings(corpus):
    classes, counts = train_nb(corpus)
    a = sorted(map(tuple, classify_nb(
        score_nb(corpus, classes, counts)).collect()))
    b = sorted(map(tuple, classify_nb(
        score_nb(corpus.repartition(7), classes, counts)).collect()))
    assert a == b


def test_no_global_window_in_classify(corpus):
    classes, counts = train_nb(corpus)
    out = classify_nb(score_nb(corpus, classes, counts))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the argmax window must partition by document (a bare orderBy window
    # would funnel the corpus through one task); the only SinglePartition
    # exchanges allowed are the 1-row scalar aggregates (vocab size, n)
    assert "windowspecdefinition(doc_id" in plan
    for chunk in plan.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate(keys=[]" in chunk.splitlines()[1]


def test_roc_auc_tie_adjusted_hand_case(spark):
    from kgspark.nb import roc_auc

    sc = spark.createDataFrame(
        [(3, 1), (2, 0), (1, 1), (1, 0)], "score long, label int"
    )
    r = roc_auc(sc).collect()[0]
    # pairs: (3>2) win, (3>1) win, (1<2) loss, (1=1) tie=1/2 -> 2.5/4
    assert (r.n_pos, r.n_neg, r.auc_num_x2, r.auc_ppm) == (2, 2, 5, 625000)
    # degenerate: single class -> sentinel
    one = spark.createDataFrame([(5, 1), (3, 1)], "score long, label int")
    assert roc_auc(one).collect()[0].auc_ppm == -1


def test_roc_auc_matches_bruteforce_pair_count(spark):
    from kgspark.nb import roc_auc

    # deterministic pseudo-data: score correlated with label via modular
    # arithmetic, plenty of ties
    rows = [((i * 37) % 23 + 10 * ((i * 13) % 7 == 0), int((i * 13) % 7 == 0))
            for i in range(200)]
    sc = spark.createDataFrame(rows, "score long, label int")
    r = roc_auc(sc).collect()[0]
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    num2 = sum(2 for p in pos for n in neg if p > n) + sum(
        1 for p in pos for n in neg if p == n)
    assert r.auc_num_x2 == num2
    assert r.auc_ppm == num2 * 1000000 // (2 * len(pos) * len(neg))


def test_calibration_bins_edges_and_gaps(spark):
    from kgspark.nb import calibration_bins

    sc = spark.createDataFrame(
        [(50000, 0), (150000, 1), (999999, 1), (1000000, 1)],
        "prob_ppm long, label int",
    )
    got = {r.bin: (r.n, r.n_pos, r.mean_prob_ppm, r.frac_pos_ppm, r.gap_ppm)
           for r in calibration_bins(sc).collect()}
    assert got == {
        0: (1, 0, 50000, 0, 50000),
        1: (1, 1, 150000, 1000000, 850000),
        9: (2, 2, 999999, 1000000, 1),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(sc, n_bins=0)


def test_top_features_lift_ranking(spark):
    from kgspark.nb import top_features, train_nb

    docs = spark.createDataFrame(
        [(1, "spam spam buy", "s"), (2, "buy spam now", "s"),
         (3, "hello world now", "h"), (4, "hello there world", "h")],
        "doc_id long, text string, label string",
    )
    classes, counts = train_nb(docs)
    out = top_features(classes, counts, k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append((r.rank, r.token))
    # 'spam' dominates class s, 'hello'/'world' dominate class h
    assert sorted(by_label["s"])[0][1] == "spam"
    assert {t for _, t in by_label["h"]} <= {"hello", "world", "there"}
    assert all(len(v) == 2 for v in by_label.values())
    # exact-integer check on a hand case: class s has tot=6, V=6, g=12
    # cnt(spam|s)=3 -> in_ppm = 4*1e6 // 12 = 333333;
    # rest: cnt_all-cnt=0, g-tot=6 -> out_ppm = 1e6 // 12 = 83333
    spam = [r for r in out if r.label == "s" and r.token == "spam"][0]
    assert spam.lift_ppm == (333333 * 1000000) // 83333
