"""Horn-rule mining over the triple table (AMIE-lite).

Mines length-2 chain rules  q(x,z) ∧ r(z,y) ⇒ p(x,y)  with exact-integer
support and confidence — the inductive complement of kgspark.reason's
deductive layer: reason.py APPLIES declared axioms, this module DISCOVERS
which axioms the data itself obeys (transitivity, composition,
inverse-composition), the KG-quality signal AMIE introduced (Galárraga et
al., WWW 2013). The reference has no rule layer at all (its graph is
write-only below the UI, ref knowledge_graph_builder.py).

Definitions (standard confidence):
  body(q,r)        = distinct (x, y) pairs with q(x,z) ∧ r(z,y), x != y
  support(q,r,p)   = |body(q,r) ∩ p(x,y)|
  conf_ppm         = support * 1e6 div |body(q,r)|

Scale shape: one mid-node equi-join (z) builds the body — the same 2-hop
shape as bounded_closure, partitioned by z; the body is materialized ONCE
and feeds both the per-(q,r) size aggregate and the head-match join on
(x, y). The (q, r, p) group space is schema-bounded (predicates², not
rows). Mid-node fan-out is the quadratic hazard: `max_mid_degree` drops
hub mid-nodes before the join (documented approximation, the AMIE
sampling posture); None = exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize


def mine_chain_rules(
    triples: DataFrame,
    min_support: int = 2,
    max_mid_degree: int | None = None,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """-> (body_q, body_r, head_p, support, n_body, conf_ppm), one row per
    chain rule with support >= min_support, exact integers throughout."""
    t = materialize(
        triples.select(
            F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
            F.col(obj_col).alias("o"),
        ).distinct()
    )
    if max_mid_degree is not None:
        deg = (
            t.select(F.col("o").alias("n")).union(t.select(F.col("s").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_mid_degree)
            .select("n")
        )
        t_in = t.join(F.broadcast(deg.withColumnRenamed("n", "o")), "o")
        t_out = t.join(F.broadcast(deg.withColumnRenamed("n", "s")), "s")
    else:
        t_in, t_out = t, t
    body = (
        t_in.select(F.col("s").alias("x"), F.col("p").alias("body_q"),
                    F.col("o").alias("z"))
        .join(
            t_out.select(F.col("s").alias("z"), F.col("p").alias("body_r"),
                         F.col("o").alias("y")),
            "z",
        )
        .where(F.col("x") != F.col("y"))
        .select("body_q", "body_r", "x", "y")
        .distinct()
    )
    body = materialize(body)
    n_body = body.groupBy("body_q", "body_r").agg(
        F.count(F.lit(1)).cast("long").alias("n_body")
    )
    sup = (
        body.join(
            t.select(F.col("s").alias("x"), F.col("p").alias("head_p"),
                     F.col("o").alias("y")),
            ["x", "y"],
        )
        .groupBy("body_q", "body_r", "head_p")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    return sup.join(n_body, ["body_q", "body_r"]).select(
        "body_q", "body_r", "head_p", "support", "n_body",
        F.expr("support * 1000000 div n_body").alias("conf_ppm"),
    )


def apply_chain_rules(
    triples: DataFrame,
    rules: DataFrame,
    min_conf_ppm: int = 500_000,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Rule APPLICATION — the prediction step AMIE rules exist for: fire
    every mined chain rule  q(x,z) ∧ r(z,y) ⇒ p(x,y)  with
    conf_ppm >= min_conf_ppm against `triples` and emit the head triples
    the KG does NOT yet assert, scored by the best firing rule.

    -> (subj, pred, obj, n_rules, conf_ppm): one row per predicted-missing
    triple; n_rules = how many distinct qualifying rules derive it,
    conf_ppm = the max confidence among them. Exact integers throughout —
    hash-deterministic cross-engine.

    Scale shape: the rule table is schema-bounded (predicates³) and
    broadcast; the body is ONE mid-node equi-join over the rule-filtered
    atom sets (each side shrinks to the predicates the rules mention
    before shuffling), and the novelty check is a left_anti join on the
    full key — no all-pairs stage anywhere. Ref has no inference layer
    (its graph is write-only below the UI, ref knowledge_graph_builder.py).
    """
    t = materialize(
        triples.select(
            F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
            F.col(obj_col).alias("o"),
        ).distinct()
    )
    r = (
        rules.where(F.col("conf_ppm") >= F.lit(min_conf_ppm))
        .select("body_q", "body_r", "head_p", "conf_ppm")
        .distinct()
    )
    left = t.join(
        F.broadcast(r), t["p"] == F.col("body_q")
    ).select(
        F.col("s").alias("x"), F.col("o").alias("z"),
        "body_q", "body_r", "head_p", "conf_ppm",
    )
    right = t.select(
        F.col("s").alias("z"), F.col("p").alias("rp"), F.col("o").alias("y")
    )
    fired = (
        left.join(right, "z")
        .where((F.col("rp") == F.col("body_r")) & (F.col("x") != F.col("y")))
        .select("x", "head_p", "y", "body_q", "body_r", "conf_ppm")
        .distinct()
    )
    novel = fired.join(
        t,
        (fired["x"] == t["s"]) & (fired["head_p"] == t["p"])
        & (fired["y"] == t["o"]),
        "left_anti",
    )
    return novel.groupBy(
        F.col("x").alias("subj"), F.col("head_p").alias("pred"),
        F.col("y").alias("obj"),
    ).agg(
        F.count_distinct(F.col("body_q"), F.col("body_r")).cast("long")
        .alias("n_rules"),
        F.max("conf_ppm").cast("long").alias("conf_ppm"),
    )
