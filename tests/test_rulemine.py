"""kgspark.rulemine: AMIE-lite chain-rule mining + application."""

from __future__ import annotations

from kgspark.rulemine import apply_chain_rules, mine_chain_rules


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_mine_chain_rules_support_and_confidence(spark):
    # bornIn ∘ cityIn ⇒ nationality holds for 2 of 3 body pairs
    t = _t(spark, [
        ("ada", "bornIn", "london"), ("london", "cityIn", "uk"),
        ("ada", "nationality", "uk"),
        ("alan", "bornIn", "london"),
        ("alan", "nationality", "uk"),
        ("kurt", "bornIn", "vienna"), ("vienna", "cityIn", "at"),
        ("kurt", "nationality", "us"),          # counterexample
    ])
    got = {
        (r.body_q, r.body_r, r.head_p): (r.support, r.n_body, r.conf_ppm)
        for r in mine_chain_rules(t, min_support=2).collect()
    }
    assert got[("bornIn", "cityIn", "nationality")] == (2, 3, 666666)
    # no other rule reaches support 2
    assert len(got) == 1


def test_mine_chain_rules_x_neq_y_and_distinct_pairs(spark):
    # symmetric edges would create x==y bodies — they must be excluded;
    # duplicated assertions must not inflate support
    t = _t(spark, [
        ("a", "rel", "b"), ("b", "rel", "a"),
        ("a", "rel", "b"),                       # duplicate assertion
        ("b", "rel", "c"), ("a", "hop", "c"),
        ("x", "rel", "y"), ("y", "rel", "z"), ("x", "hop", "z"),
    ])
    got = {
        (r.body_q, r.body_r, r.head_p): (r.support, r.n_body)
        for r in mine_chain_rules(t, min_support=2).collect()
    }
    # body pairs of (rel, rel): (a,c), (x,z), (b,b)->excluded, (a,a)->excluded,
    # plus (b,a)->? b-rel->a-rel->b excluded... the x!=y filter leaves
    # {(a,c),(x,z)}; both satisfy hop
    assert got[("rel", "rel", "hop")] == (2, 2)


def test_mine_chain_rules_mid_degree_guard(spark):
    # hub mid-node 'h' exceeds the cap -> its body pairs vanish
    rows = [("s%d" % i, "p", "h") for i in range(6)]
    rows += [("h", "q", "t%d" % i) for i in range(6)]
    rows += [("a", "p", "m"), ("m", "q", "b"),
             ("c", "p", "m2"), ("m2", "q", "d"),
             ("a", "r", "b"), ("c", "r", "d")]
    t = _t(spark, rows)
    exact = {
        (r.body_q, r.body_r, r.head_p): r.n_body
        for r in mine_chain_rules(t, min_support=2).collect()
    }
    assert exact[("p", "q", "r")] == 38  # 36 hub pairs + 2 clean ones
    capped = {
        (r.body_q, r.body_r, r.head_p): (r.support, r.n_body, r.conf_ppm)
        for r in mine_chain_rules(t, min_support=2, max_mid_degree=4)
        .collect()
    }
    assert capped[("p", "q", "r")] == (2, 2, 1000000)


def test_apply_chain_rules_predicts_missing_heads_only(spark):
    # bornIn ∘ cityIn ⇒ nationality fires for ada/alan/kurt; ada already
    # asserts the head -> only alan and kurt are predictions
    t = _t(spark, [
        ("ada", "bornIn", "london"), ("london", "cityIn", "uk"),
        ("ada", "nationality", "uk"),
        ("alan", "bornIn", "london"),
        ("kurt", "bornIn", "vienna"), ("vienna", "cityIn", "at"),
    ])
    rules = spark.createDataFrame(
        [("bornIn", "cityIn", "nationality", 666666)],
        "body_q string, body_r string, head_p string, conf_ppm long",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_rules, r.conf_ppm)
        for r in apply_chain_rules(t, rules).collect()
    }
    assert got == {
        ("alan", "nationality", "uk"): (1, 666666),
        ("kurt", "nationality", "at"): (1, 666666),
    }


def test_apply_chain_rules_conf_filter_and_best_rule_scoring(spark):
    # two rules derive the same missing head -> n_rules=2, conf = max;
    # a below-threshold rule must not fire
    t = _t(spark, [
        ("a", "p", "m"), ("m", "q", "b"),
        ("a", "p2", "m"), ("m", "q2", "b"),
        ("a", "lowp", "m"), ("m", "lowq", "b"),
    ])
    rules = spark.createDataFrame(
        [("p", "q", "head", 900000),
         ("p2", "q2", "head", 700000),
         ("lowp", "lowq", "head", 100000)],
        "body_q string, body_r string, head_p string, conf_ppm long",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_rules, r.conf_ppm)
        for r in apply_chain_rules(t, rules, min_conf_ppm=500000).collect()
    }
    assert got == {("a", "head", "b"): (2, 900000)}
