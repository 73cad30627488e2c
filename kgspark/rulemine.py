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
