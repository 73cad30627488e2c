"""Taxonomy semantics over the is_a DAG — ancestor closure, depths, and
Wu-Palmer similarity.

The reference stores is_a/has_instance edges (ref /root/reference/
knowledge_graph_builder.py:131-141) but offers no taxonomy reasoning; this
module adds the standard least-common-subsumer similarity (Wu & Palmer,
ACL 1994): sim(a, b) = 2 * depth(lcs) / (depth(a) + depth(b)), with depth
counted from the root and the LCS being the common ancestor of maximum
depth (on a DAG, node depth is the MAX root-path length — the usual
generalization).

Scale posture (100 TB): the ancestor closure is hop-bounded frontier
iteration (max_depth distinct self-joins on the child key — taxonomies are
shallow by nature, so the bound is a schema property, not a data gamble);
similarities are computed for an EXPLICIT candidate pair table, never all
n² node pairs — blocking (same-type, same-brand, LSH, ...) is the caller's
job, exactly like the dedup stack. All arithmetic is exact-integer
(depths, and similarity as parts-per-million with truncating division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize


def ancestor_closure(
    isa: DataFrame, max_depth: int = 16,
    child: str = "child", parent: str = "parent",
) -> DataFrame:
    """Hop-bounded ancestor closure of an is_a edge table.

    Returns (node, anc, hops) with hops = the MAXIMUM path length from
    node up to anc found within max_depth (DAG convention for depth), and
    a (node, node, 0) self row for every node that appears anywhere in
    the edge table. Cycles are tolerated: the hop bound terminates them,
    and the self row keeps hops=0 as the canonical self-distance.
    """
    if max_depth < 1:
        raise ValueError(f"ancestor_closure: max_depth >= 1, got {max_depth}")
    edges = isa.select(
        F.col(child).alias("node"), F.col(parent).alias("anc")
    ).where(F.col("node") != F.col("anc")).distinct()
    nodes = (
        edges.select("node")
        .union(edges.select(F.col("anc").alias("node")))
        .distinct()
    )
    acc = nodes.select(
        "node", F.col("node").alias("anc"), F.lit(0).alias("hops")
    ).unionByName(edges.select("node", "anc", F.lit(1).alias("hops")))
    edges = materialize(edges)  # joined max_depth times
    frontier = edges
    for hop in range(2, max_depth + 1):
        frontier = materialize(
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.anc") == F.col("e.node"))
            .select(F.col("f.node").alias("node"), F.col("e.anc").alias("anc"))
            .where(F.col("node") != F.col("anc"))
            .distinct()
        )
        if frontier.isEmpty():
            # real taxonomy depth reached — the bound is a guard, not a
            # work quota (taxonomies are shallow; cycles still terminate
            # at max_depth)
            break
        acc = acc.unionByName(
            frontier.select("node", "anc", F.lit(hop).alias("hops"))
        )
    return acc.groupBy("node", "anc").agg(
        F.max("hops").cast("long").alias("hops")
    )


def taxonomy_similarity(
    isa: DataFrame,
    pairs: DataFrame,
    root: str,
    max_depth: int = 16,
    child: str = "child",
    parent: str = "parent",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Wu-Palmer similarity for each (a, b) row of ``pairs`` over the
    ``isa`` taxonomy rooted at ``root``.

    Returns (a, b, depth_a, depth_b, lcs, lcs_depth, wu_palmer_ppm) where
    wu_palmer_ppm = (2 * 1e6 * lcs_depth) // (depth_a + depth_b) — exact
    integer, truncating division. The LCS is the deepest common ancestor;
    equal-depth ties break to the lexicographically smallest ancestor
    (total deterministic order). Pairs where either side cannot reach the
    root, or with no common ancestor, are dropped (inner joins): being
    outside the taxonomy is a data-quality signal for shape_report, not a
    similarity of 0.

    Plan: one bounded closure (shared by both endpoints and the depth
    table), then two hash joins pairs->ancestors, one join on the shared
    ancestor, and a (a, b) group-by argmax. The pair table drives the
    cost — candidates come blocked from the caller.
    """
    # the closure feeds the depth table AND both pair-side joins:
    # materialize once instead of recomputing max_depth shuffles 3x
    anc = materialize(
        ancestor_closure(isa, max_depth, child=child, parent=parent)
    )
    depth = anc.where(F.col("anc") == F.lit(root)).select(
        "node", F.col("hops").alias("depth")
    )
    anc_d = anc.join(
        depth.select(F.col("node").alias("anc"),
                     F.col("depth").alias("anc_depth")),
        "anc",
    )
    p = pairs.select(F.col(a).alias("a"), F.col(b).alias("b")).distinct()
    joined = (
        p.join(
            anc_d.select(F.col("node").alias("a"), "anc",
                         F.col("anc_depth").alias("_d")),
            "a",
        )
        .join(
            anc_d.select(F.col("node").alias("b"),
                         F.col("anc").alias("anc_b")),
            "b",
        )
        .where(F.col("anc") == F.col("anc_b"))
    )
    # deepest common ancestor; equal-depth ties -> min ancestor name.
    # Two-step (max depth, then min name at that depth): a single max_by
    # would be tie-nondeterministic.
    best_d = joined.groupBy("a", "b").agg(F.max("_d").alias("lcs_depth"))
    lcs = (
        joined.join(best_d, ["a", "b"])
        .where(F.col("_d") == F.col("lcs_depth"))
        .groupBy("a", "b", "lcs_depth")
        .agg(F.min("anc").alias("lcs"))
    )
    out = (
        lcs.join(depth.select(F.col("node").alias("a"),
                              F.col("depth").alias("depth_a")), "a")
        .join(depth.select(F.col("node").alias("b"),
                           F.col("depth").alias("depth_b")), "b")
    )
    return out.select(
        "a", "b",
        F.col("depth_a").cast("long").alias("depth_a"),
        F.col("depth_b").cast("long").alias("depth_b"),
        "lcs",
        F.col("lcs_depth").cast("long").alias("lcs_depth"),
        # CASE-guard: ANSI div throws on zero; the only zero-sum pair is
        # (root, root), whose self-similarity is 1 by convention
        F.expr(
            "CASE WHEN depth_a + depth_b = 0 THEN 1000000 "
            "ELSE (2000000 * lcs_depth) div (depth_a + depth_b) END"
        ).cast("long").alias("wu_palmer_ppm"),
    )


def transitive_reduction(
    isa: DataFrame, max_depth: int = 16,
    child: str = "child", parent: str = "parent",
) -> DataFrame:
    """Transitive-reduction audit of an is_a DAG (Aho, Garey & Ullman
    1972 semantics): a direct edge (c, p) is REDUNDANT iff some other
    path c ->+ p of length >= 2 exists — deleting it leaves reachability
    unchanged. Asserted shortcut edges ("x is_a thing" when the hierarchy
    already implies it) are classic ontology noise: they distort
    Wu-Palmer depths (taxonomy_similarity), inflate rule-mining supports
    and double-count closure materialization. The reference stores is_a
    edges verbatim with no such audit (ref knowledge_graph_builder.py:
    131-141).

    Returns every distinct non-self edge ANNOTATED, never dropped:
    (child, parent, max_hops, redundant) with max_hops = the longest
    c->...->p path length found within max_depth and redundant = 1 iff
    max_hops >= 2. Cycles terminate at the hop bound, so flags follow the
    bounded-closure semantics there (documented posture shared with
    ancestor_closure).

    100 TB: one hop-bounded ancestor closure (taxonomies are shallow — the
    bound is a schema property) + one edge-keyed hash join. No n² shape.
    """
    edges = isa.select(
        F.col(child).alias("child"), F.col(parent).alias("parent")
    ).where(F.col("child") != F.col("parent")).distinct()
    cl = ancestor_closure(isa, max_depth, child=child, parent=parent).select(
        F.col("node").alias("child"),
        F.col("anc").alias("parent"),
        "hops",
    )
    return edges.join(cl, ["child", "parent"]).select(
        "child",
        "parent",
        F.col("hops").cast("long").alias("max_hops"),
        F.when(F.col("hops") >= 2, F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("redundant"),
    )
