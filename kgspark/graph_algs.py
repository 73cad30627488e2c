"""Distributed graph analytics over the triple table.

The reference's graph lives in driver-memory networkx (degree lookups,
neighborhood walks — /root/reference/knowledge_graph_builder.py:595-607,
app.py graph queries); at 10^12-triple scale the equivalents are iterative
DataFrame programs over the edges table:

  pagerank   power iteration with damping + dangling-mass redistribution —
             each round is one join + one aggregation, lineage truncated via
             materialize(); no driver-side collect (the dangling mass rides
             as a 1-row DataFrame through a crossJoin).
  k_hop      bounded BFS from a start node: frontier join per hop, visited
             set accumulated with min-hop semantics.

Both are deterministic fp64 programs with exact SQL twins (the oracles unroll
the same iterations as chained CTEs), rounded at the comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "subj",
    dst: str = "obj",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank) after `iterations` power-iteration rounds.

    rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/outdeg(u)
                                   + dangling_mass_i / N)

    Dangling nodes (no out-edges) redistribute their mass uniformly — the
    standard correction, without which rank leaks every round.

    With `weight_col`, each edge carries that weight instead of 1:
    contributions become rank·w_uv / W_u with W_u the node's out-weight
    sum — weighted PageRank, the right ranking over a KG whose edges
    already carry extraction confidence (kgspark.edges weights). Parallel
    (s, t) edges sum their weights first; the plan shape is unchanged."""
    if weight_col is None:
        e = edges.select(
            F.col(src).alias("s"), F.col(dst).alias("t")
        ).distinct().withColumn("w", F.lit(1.0))
    else:
        e = (
            edges.select(
                F.col(src).alias("s"), F.col(dst).alias("t"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .groupBy("s", "t").agg(F.sum("w").alias("w"))
        )
    e = materialize(e)
    nodes = e.select(F.col("s").alias("node")).union(
        e.select(F.col("t").alias("node"))
    ).distinct()
    nodes = materialize(nodes)
    n = nodes.count()
    if weight_col is None:
        deg = e.groupBy("s").agg(
            F.count(F.lit(1)).cast("double").alias("d")
        )
        contrib_expr = F.sum(F.col("rank") / F.col("d"))
    else:
        deg = e.groupBy("s").agg(F.sum("w").alias("d"))
        contrib_expr = F.sum(F.col("rank") * F.col("w") / F.col("d"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(deg, "s")
            .groupBy(F.col("t").alias("node"))
            .agg(contrib_expr.alias("contrib"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = materialize(
            nodes.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
    return ranks


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, hub, auth) after `iterations` HITS rounds (Kleinberg 1999).

    Per round: auth(v) = Σ_{u→v} hub(u), then L1-normalize; hub(u) =
    Σ_{u→v} auth(v), then L1-normalize. L1 (sum=1) instead of the classic
    L2 keeps the normalizer a plain SUM — expressible in the SQL oracle
    and numerically identical across engines. On a host graph, hubs are
    link directories, authorities the heavily-cited sites.

    Scale shape mirrors pagerank(): each half-round is one shuffle join of
    the edge table against the score vector plus one aggregation; the
    normalizer rides as a 1-row DataFrame through a crossJoin (broadcast,
    never a driver collect). Hub hosts skew the dst key; AQE splits them.
    Lineage is truncated per round via materialize().
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    nodes = e.select(F.col("s").alias("node")).union(
        e.select(F.col("t").alias("node"))
    ).distinct()
    nodes = materialize(nodes)
    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )
    for _ in range(iterations):
        # each raw-sum table is materialized before its normalizer
        # re-aggregates it (the pagerank pattern) — without this, the
        # crossJoin references the edge-join subplan twice and only
        # ReuseExchange luck avoids paying it twice
        a_raw = materialize(
            e.join(scores.select(F.col("node").alias("s"), "hub"), "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        auth = a_raw.crossJoin(
            a_raw.agg(F.sum("a_raw").alias("__z"))
        ).select("node", (F.col("a_raw") / F.col("__z")).alias("auth"))
        h_raw = materialize(
            e.join(auth.select(F.col("node").alias("t"), "auth"), "t")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        hub = h_raw.crossJoin(
            h_raw.agg(F.sum("h_raw").alias("__z"))
        ).select("node", (F.col("h_raw") / F.col("__z")).alias("hub"))
        scores = materialize(
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )
    return scores


def k_hop(
    edges: DataFrame,
    start,
    k: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, hop): every node reachable from `start` within k hops, with its
    MINIMUM hop distance (BFS level). `start` may be a literal or a 1-row
    DataFrame(start) so callers can compute it without a driver round-trip."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    if isinstance(start, DataFrame):
        visited = start.select(
            F.col(start.columns[0]).alias("node"), F.lit(0).alias("hop")
        )
    else:
        spark = edges.sparkSession
        visited = spark.createDataFrame([(start, 0)], "node string, hop int")
    visited = materialize(visited)
    frontier = visited
    for depth in range(1, k + 1):
        # frontier/visited are k-hop-ball-sized — tiny next to the edge
        # table — so both joins broadcast: the edges never shuffle
        nxt = (
            e.join(F.broadcast(frontier), e["s"] == frontier["node"])
            .select(F.col("t").alias("node"), F.lit(depth).alias("hop"))
            .distinct()
            .join(F.broadcast(visited.select("node")), "node", "left_anti")
        )
        nxt = materialize(nxt)
        visited = materialize(visited.unionByName(nxt))
        frontier = nxt
    return visited.select("node", F.col("hop").cast("long").alias("hop"))


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """Enumerate each undirected triangle exactly once as (u, v, w) using
    degree-ordered orientation (compact-forward). Input: canonical distinct
    (a, b) edges with a < b, already materialized. The orientation bounds
    oriented out-degree by O(sqrt(m)), which keeps the wedge self-join from
    going quadratic on hub nodes — the property that matters at web scale."""
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge from lower (deg, id) to higher (deg, id)
    j = (
        und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    e = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
    )
    e = materialize(e)
    x, y = e.alias("x"), e.alias("y")
    wedges = x.join(y, on=(F.col("x.src") == F.col("y.src")) & (
        (F.col("x.dst_d") < F.col("y.dst_d"))
        | ((F.col("x.dst_d") == F.col("y.dst_d")) & (F.col("x.dst") < F.col("y.dst")))
    )).select(
        F.col("x.src").alias("u"), F.col("x.dst").alias("v"), F.col("y.dst").alias("w")
    )
    return wedges.join(
        e.select(F.col("src").alias("v"), F.col("dst").alias("w")), ["v", "w"]
    )


def triangle_count(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, triangles): undirected triangle count per node.

    Degree-ordered orientation (compact-forward): every undirected edge is
    directed from its lower-(degree, id) endpoint to the higher one, so each
    triangle is counted exactly once as wedge u->v, u->w (v ordered before w)
    closed by the oriented edge v->w. The orientation bounds oriented
    out-degree by O(sqrt(m)) — the property that keeps the wedge self-join
    from going quadratic on hub nodes at web scale (the naive neighbor
    self-join blows up on exactly those)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = materialize(und)
    tris = _oriented_triangles(und)
    corners = (
        tris.select(F.col("u").alias("node"))
        .union(tris.select(F.col("v").alias("node")))
        .union(tris.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, degree): nodes surviving `rounds` synchronous k-core peel
    iterations over the undirected graph, with the induced degree that
    justified their survival.

    Each round drops every node whose degree in the current induced
    subgraph is < k (Seidman 1983 coreness peel). True k-core iterates to
    a fixpoint whose round count is data-dependent; pinning `rounds` keeps
    the operator deterministic and SQL-expressible (the oracle unrolls
    the same rounds) — the LPA/bounded-BFS posture. Each extra round only
    removes more non-core nodes, so the result is a superset of the exact
    k-core that converges to it; at web scale the dense-core signal
    (spam-farm/community kernels) stabilizes within a few rounds.

    Scale shape: per round one semi-join of the adjacency against the
    alive set on EACH endpoint plus one per-node degree count — all
    key-partitioned shuffles, no global stage; lineage truncated per
    round via materialize()."""
    if rounds < 1:
        raise ValueError(f"k_core needs rounds >= 1, got {rounds}")
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = materialize(
        adj.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(adj.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .distinct()
    )
    alive = adj.select("node").distinct()
    deg = None
    for _ in range(rounds):
        deg = (
            adj.join(alive, "node", "left_semi")
            .join(alive.select(F.col("node").alias("nbr")), "nbr",
                  "left_semi")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
            .where(F.col("degree") >= k)
        )
        deg = materialize(deg)
        alive = deg.select("node")
    return deg.select("node", F.col("degree").cast("long").alias("degree"))


def k_truss(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(a, b, support): undirected edges surviving `rounds` synchronous
    k-truss peel iterations, with the triangle support that justified
    survival. The k-truss (Cohen 2008) keeps every edge that participates
    in >= k-2 triangles within the surviving subgraph — a strictly denser
    community kernel than the k-core (every k-truss edge's endpoints are
    in the (k-1)-core), the standard "cohesive subgraph" tier above
    triangles in web/KG spam and community mining.

    Bounded-rounds posture (same as k_core): true k-truss iterates to a
    data-dependent fixpoint; pinning `rounds` keeps the operator
    deterministic and SQL-expressible. Each round only removes edges, so
    the result is a superset of the exact k-truss converging to it.

    Scale shape: per round one degree-oriented triangle enumeration
    (compact-forward — oriented out-degree O(sqrt(m)), so the wedge join
    never goes quadratic on hubs) + one explode-to-3-edges groupBy.
    Everything is key-partitioned; lineage truncated per round."""
    if rounds < 1:
        raise ValueError(f"k_truss needs rounds >= 1, got {rounds}")
    if k < 3:
        raise ValueError(f"k_truss needs k >= 3, got {k}")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = materialize(und)
    sup = None
    for _ in range(rounds):
        tris = _oriented_triangles(und)
        # each triangle supports its 3 canonical (least, greatest) edges
        tri_edges = (
            tris.select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .union(tris.select(
                F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
            ))
            .union(tris.select(
                F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
            ))
        )
        sup = (
            tri_edges.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .where(F.col("support") >= k - 2)
        )
        sup = materialize(sup)
        und = sup.select("a", "b")
    return sup


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, rank): TrustRank (Gyöngyi et al., VLDB 2004) — PageRank with
    teleport restricted to a trusted seed set; the standard web-spam
    demotion signal over a host graph (good seeds keep mass in their
    neighborhoods, spam farms starve).

      rank_{i+1}(v) = (1-d)*t(v) + d*(sum_{u->v} rank_i(u)/outdeg(u)
                                      + dangling_mass_i * t(v))

    with t(v) = 1/|S| on the seed set, 0 elsewhere; rank_0 = t. Dangling
    mass flows back to the seeds (the teleport distribution), not
    uniformly — that is what differentiates it from pagerank().

    Seeds outside the graph's node set are ignored. Scale shape is
    pagerank()'s: one join + one agg per round, the dangling mass and the
    seed count ride as 1-row/dimension-sized DataFrames through broadcast
    joins, lineage truncated via materialize()."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    nodes = e.select(F.col("s").alias("node")).union(
        e.select(F.col("t").alias("node"))
    ).distinct()
    nodes = materialize(nodes)
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
    )
    seed_nodes = materialize(seed_nodes)
    ns = seed_nodes.count()
    if ns == 0:
        raise ValueError("trustrank: no seed intersects the graph")
    tvec = materialize(
        nodes.join(
            F.broadcast(seed_nodes.select("node", F.lit(1.0 / ns).alias("t"))),
            "node", "left",
        ).select("node", F.coalesce("t", F.lit(0.0)).alias("t"))
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("d"))
    ranks = tvec.select("node", F.col("t").alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(deg, "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("d")).alias("contrib"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = materialize(
            tvec.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0))
                       + F.col("dm") * F.col("t"))
                ).alias("rank"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, label): synchronous label-propagation communities (LPA,
    Raghavan et al. 2007) over the undirected graph.

    Labels start as the node's own id; each round every node adopts the
    most frequent label among its neighbors, ties broken by minimum label.
    The SYNCHRONOUS variant (all nodes update from the previous round's
    labels) with the total tie-break makes the result deterministic and
    SQL-expressible — the oracle unrolls the same rounds as chained CTEs.
    (Asynchronous LPA converges faster but is order-dependent; the
    deterministic form is the one a replayable pipeline wants.)

    Scale shape: per round one shuffle join of the adjacency against the
    label vector, one (node, label) count, and one per-node window argmax
    — the window partitions by node, so no global single-task stage. Hub
    nodes skew the nbr join key; AQE splits them. Lineage truncated per
    round via materialize(). Isolated nodes (no edges) are absent from
    the output, matching the adjacency's domain."""
    from pyspark.sql import Window

    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    adj = materialize(
        e.select(F.col("s").alias("node"), F.col("t").alias("nbr"))
        .union(e.select(F.col("t").alias("node"), F.col("s").alias("nbr")))
        .distinct()
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        cnt = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = materialize(
            cnt.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", "label")
        )
    return labels


def common_neighbors(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = None,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Link prediction over the undirected graph: for unlinked node pairs,
    (u, v, common, jaccard) — shared-neighbor count and Jaccard coefficient
    common / (deg_u + deg_v - common), keeping pairs with >= min_common.

    The wedge join through a shared neighbor is quadratic in that neighbor's
    degree; `max_degree` drops super-hub intermediates (standard practice —
    a hub shared by everyone predicts nothing anyway). At web scale set it
    near sqrt(corpus degree budget); None keeps all nodes. With max_degree
    set, BOTH the common count and the Jaccard degrees are measured over
    the hub-filtered graph (hub neighbors excluded from the neighbor sets)
    — mixing filtered numerators with unfiltered denominators would bias
    hub-adjacent pairs low."""
    nbrs = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .where(F.col("node") != F.col("nbr"))
        .distinct()
    )
    nbrs = materialize(nbrs)
    if max_degree is not None:
        full_deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        thru = full_deg.where(F.col("d") <= max_degree).select(
            F.col("node").alias("nbr")
        )
        wedge_src = nbrs.join(thru, "nbr")
    else:
        wedge_src = nbrs
    # degrees over the SAME (possibly hub-filtered) neighbor sets the
    # common counts come from, so jaccard is internally consistent
    deg = wedge_src.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    l, r = wedge_src.alias("l"), wedge_src.alias("r")
    pairs = (
        l.join(r, on=(F.col("l.nbr") == F.col("r.nbr"))
               & (F.col("l.node") < F.col("r.node")))
        .groupBy(F.col("l.node").alias("u"), F.col("r.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    linked = nbrs.select(F.col("node").alias("u"), F.col("nbr").alias("v"))
    unlinked = pairs.join(linked, ["u", "v"], "left_anti")
    return (
        unlinked.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u", "v", F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def graph_report(
    edges: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
) -> DataFrame:
    """(pred, n_edges, n_src, n_dst, n_reciprocal): per-predicate structural
    summary of the triple graph — the KG-quality audit table (edge volume,
    endpoint fan-out, and how many edges have their same-predicate reverse
    present; the reference emits fwd/rev pairs, so reciprocity is a direct
    consistency probe on its output).

    One distinct + one groupBy + one self-semi-join on the reversed key —
    every stage is key-partitioned; n_reciprocal's join is on the full
    (dst, src, pred) key, so hubs don't explode it."""
    e = edges.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("t")
    ).distinct()
    e = materialize(e)
    rec = (
        e.alias("x")
        .join(
            e.select(
                F.col("t").alias("s"), F.col("p").alias("p"),
                F.col("s").alias("t"),
            ).alias("y"),
            ["s", "p", "t"],
            "left_semi",
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    stats = e.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.countDistinct("s").cast("long").alias("n_src"),
        F.countDistinct("t").cast("long").alias("n_dst"),
    )
    return stats.join(rec, "p", "left").select(
        F.col("p").alias(pred), "n_edges", "n_src", "n_dst",
        F.coalesce(F.col("n_reciprocal"), F.lit(0)).cast("long")
        .alias("n_reciprocal"),
    )


def metapath_census(
    edges: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
) -> DataFrame:
    """(p1, p2, n_paths, n_pairs): census of length-2 predicate sequences —
    for every ordered predicate pair, how many 2-edge paths a->b->c compose
    them and how many DISTINCT (a, c) endpoint pairs those paths connect.
    The schema-level view of graph composition (which relations chain into
    which), the standard precursor to metapath-based similarity and to
    mining inference rules like has(x,brand) ∧ belongs_to(brand,y) =>
    related(x,y).

    One distinct + one self-join keyed on the shared middle node + one
    groupBy — all key-partitioned. Hub middle nodes fan out quadratically
    in their degree (inherent to path counting); AQE's skew-join split
    handles the shuffle side, and n_pairs stays bounded because it counts
    distinct endpoints, not paths. Self-loop composition (a->a->a) is
    counted like any other path; filter upstream if unwanted."""
    e = edges.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("t")
    ).distinct()
    e = materialize(e)
    paths = e.alias("x").join(
        e.select(
            F.col("s").alias("t"), F.col("p").alias("p2"),
            F.col("t").alias("t2"),
        ).alias("y"),
        "t",
    )
    return (
        paths.groupBy(
            F.col("x.p").alias("p1"), F.col("y.p2").alias("p2")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paths"),
            F.countDistinct("x.s", "y.t2").cast("long").alias("n_pairs"),
        )
    )


def sssp(
    edges: DataFrame,
    start,
    rounds: int = 4,
    src: str = "subj",
    dst: str = "obj",
    weight_col: str = "weight",
) -> DataFrame:
    """(node, dist): weighted shortest-path distance from `start` over at
    most `rounds` edges — frontier Bellman-Ford.

    Each round relaxes ONLY the nodes whose distance improved last round
    (the frontier), which provably yields the same dist_i as full
    relaxation: dist_i(v) = min cost over paths of <= i edges. The
    frontier is shortest-path-tree-growth-sized, so both joins broadcast
    it and the edge table never shuffles (k_hop's posture; at web scale
    with huge frontiers swap the broadcast for a key-partitioned join —
    the round structure is unchanged). Parallel edges collapse to their
    minimum weight. Distances are fp64 sums accumulated edge-by-edge
    along the path — the same binary tree every engine and partitioning
    produces, so min() is value-deterministic (no fp64 SUM aggregation
    anywhere). `start` may be a literal or a 1-row DataFrame.
    """
    e = materialize(
        edges.select(
            F.col(src).alias("s"),
            F.col(dst).alias("t"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("s", "t")
        .agg(F.min("w").alias("w"))
    )
    if isinstance(start, DataFrame):
        best = start.select(
            F.col(start.columns[0]).alias("node"), F.lit(0.0).alias("dist")
        )
    else:
        best = edges.sparkSession.createDataFrame(
            [(start, 0.0)], "node string, dist double"
        )
    best = materialize(best)
    frontier = best
    for _ in range(rounds):
        cand = (
            e.join(F.broadcast(frontier), e["s"] == frontier["node"])
            .select(F.col("t").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        improved = materialize(
            cand.join(
                best.select("node", F.col("dist").alias("__old")), "node", "left"
            )
            .where(F.col("__old").isNull() | (F.col("dist") < F.col("__old")))
            .select("node", "dist")
        )
        best = materialize(
            best.unionByName(improved).groupBy("node").agg(F.min("dist").alias("dist"))
        )
        frontier = improved
    return best


def hyperball(
    edges: DataFrame,
    rounds: int = 2,
    p: int = 4,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """HyperBall / HyperANF (Boldi & Vigna 2013, public): per-node
    HyperLogLog registers of the <= `rounds`-hop out-neighborhood ball
    (including the node itself). Returns (node, idx, max_rho) — the
    register tables, exact integers.

    This is how web-graph neighborhood functions (ball sizes, effective
    diameter, harmonic centrality) are computed at 10^11-edge scale:
    exact k-hop neighborhood SETS are quadratic, but each node's
    neighborhood SKETCH is <= 2^p registers, merged along edges by
    elementwise max. Per round: one edge-vs-registers join plus one
    (node, idx) max-groupBy — state is <= 2^p * |V| rows forever, and max
    is idempotent/commutative so the round is retry- and
    partitioning-proof. Register hashing matches kgspark.sketch
    (md5-hex6 idx, 24-comparison leading-zero rank), so ball-size
    estimates come from kgspark.sketch.hll_estimate on any node's slice.
    """
    from kgspark.kgtrain import _hex6_to_int
    from kgspark.sketch import _leading_zeros_24

    if not 2 <= p <= 16:
        raise ValueError("hyperball: p must be in [2, 16]")
    e = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
    )
    h = F.md5(F.col("node"))
    regs = materialize(
        nodes.select(
            "node",
            (_hex6_to_int(h) % F.lit(1 << p)).cast("long").alias("idx"),
            (_leading_zeros_24(_hex6_to_int(F.substring(h, 7, 6))) + F.lit(1))
            .cast("long")
            .alias("max_rho"),
        )
    )
    for _ in range(rounds):
        prop = (
            e.join(regs, e["t"] == regs["node"])
            .select(F.col("s").alias("node"), "idx", "max_rho")
        )
        regs = materialize(
            regs.unionByName(prop)
            .groupBy("node", "idx")
            .agg(F.max("max_rho").cast("long").alias("max_rho"))
        )
    return regs


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(label, n_nodes, intra2, deg_sum, q_num): exact-integer Newman
    modularity contributions of a node partition over the undirected
    simple graph.

    Q = sum_c [ in_c/(2m) - (tot_c/(2m))^2 ]  (Newman & Girvan 2004),
    where in_c = 2 x intra-community edge count and tot_c = sum of member
    degrees. Cross-engine fp64 division is a parity trap, so the engine
    emits the numerators multiplied out over the common denominator
    (2m)^2:  q_num = in_c * 2m - tot_c^2,  with Q = sum(q_num) / (2m)^2.
    decimal(38,0) arithmetic: at web scale tot_c approaches 2m ~ 10^12+
    and tot_c^2 overflows int64 long before the graph is interesting.

    Partner of label_propagation(): LPA gives the communities, this grades
    them — the standard accept/reject gate before a community-based domain
    cap or dedup block is trusted.

    Scale shape: one distinct + degree aggregation, two label-key joins
    (node-keyed, broadcast-eligible label vector at dimension scale, AQE
    otherwise), one groupBy label. 2m rides as a 1-row DataFrame through a
    crossJoin — no driver collect. Reference has no analogue (its graph is
    driver-memory networkx, knowledge_graph_builder.py:595-607).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("t"),
        )
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    e = materialize(e)
    lab = labels.select("node", "label")
    dec = lambda c: c.cast("decimal(38,0)")
    # 2m as a 1-row frame (never .collect() the edge count on the driver)
    two_m = e.agg((F.count(F.lit(1)) * 2).alias("two_m"))
    deg = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("t").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tot = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("deg_sum"),
        )
    )
    intra = (
        e.join(lab.select(F.col("node").alias("s"), F.col("label").alias("ls")), "s")
        .join(lab.select(F.col("node").alias("t"), F.col("label").alias("lt")), "t")
        .where(F.col("ls") == F.col("lt"))
        .groupBy(F.col("ls").alias("label"))
        .agg((F.count(F.lit(1)) * 2).alias("intra2"))
    )
    return (
        tot.join(intra, "label", "left")
        .na.fill({"intra2": 0})
        .crossJoin(F.broadcast(two_m))
        .select(
            "label",
            "n_nodes",
            F.col("intra2").cast("long").alias("intra2"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            (dec(F.col("intra2")) * dec(F.col("two_m"))
             - dec(F.col("deg_sum")) * dec(F.col("deg_sum"))).alias("q_num"),
        )
    )


def random_walks(
    edges: DataFrame,
    length: int = 3,
    num_walks: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(start, walk_no, step, node): a deterministic random-walk corpus
    over the undirected simple graph — the training input for
    DeepWalk/node2vec-style KG embeddings (Perozzi 2014, Grover 2016).

    `num_walks` walks of `length` steps start from every non-isolated
    node. The "randomness" is a hash: at step k the walk at node v moves
    to sorted-neighbor index md5(start:walk_no:k) mod deg(v). Replayable
    (same corpus every run, resumable mid-pipeline) and SQL-expressible,
    so the walk generator itself is oracle-checkable — the property a
    curation pipeline needs from its sampling stages; see
    kgspark/kgtrain.py for the same philosophy on negative sampling.

    Scale shape: the adjacency is indexed ONCE (row_number within node —
    the per-node window never sees more rows than the max degree) and
    materialized; each step is one node-keyed join of the W*N-row walk
    frontier against it (hub keys skew the probe side — AQE splits), with
    lineage truncated per step. No driver-side state. Walk count scales
    as W*N rows regardless of length; emitted long-format so downstream
    skip-gram windowing is a self-join on (start, walk_no).

    Reference has no analogue (driver-memory networkx graph,
    knowledge_graph_builder.py:595-607).
    """
    from pyspark.sql import Window

    from kgspark.kgtrain import _hex6_to_int

    if length < 1 or num_walks < 1:
        raise ValueError("length and num_walks must be >= 1")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    adj = (
        e.select(F.col("s").alias("node"), F.col("t").alias("nbr"))
        .union(e.select(F.col("t").alias("node"), F.col("s").alias("nbr")))
        .distinct()
    )
    w = Window.partitionBy("node").orderBy("nbr")
    idx = materialize(
        adj.select(
            "node", "nbr", (F.row_number().over(w) - 1).alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy("node")).alias("deg"),
        )
    )
    walks = idx.select("node").distinct().select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(num_walks - 1))
        ).alias("walk_no"),
        F.col("node").alias("cur"),
    )
    out = walks.select(
        "start", "walk_no", F.lit(0).alias("step"),
        F.col("cur").alias("node"),
    )
    for k in range(1, length + 1):
        pick = (
            _hex6_to_int(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("start"),
                        F.col("walk_no").cast("string"),
                        F.lit(str(k)),
                    )
                )
            )
            % F.col("deg")
        )
        walks = materialize(
            walks.join(idx, walks["cur"] == idx["node"])
            .where(F.col("i") == pick)
            .select("start", "walk_no", F.col("nbr").alias("cur"))
        )
        out = out.unionAll(
            walks.select(
                "start", "walk_no", F.lit(k).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def _min_reach_labels(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 30
) -> DataFrame:
    """(node, lbl): lbl = min node id over {v} + everything that can REACH v
    along edges(s -> t), by min-label propagation with path-halving pointer
    jumping (labels are node ids, so label(label(v)) is a valid shortcut:
    lbl(v)=u means u reaches v, lbl(u)=w means w reaches u, hence w reaches
    v — min-monotone and sound, the same argument as canon.py's CC).
    O(log diameter) rounds; raises on non-convergence."""
    labels = materialize(
        nodes.select("node", F.col("node").alias("lbl"))
    )
    for _ in range(max_iter):
        pred_min = (
            edges.join(labels, edges["s"] == labels["node"])
            .groupBy(F.col("t").alias("node"))
            .agg(F.min("lbl").alias("pmin"))
        )
        prop = labels.join(pred_min, "node", "left").select(
            "node",
            F.least("lbl", F.coalesce("pmin", "lbl")).alias("lbl"),
        )
        hop = prop.select(F.col("node").alias("lbl"), F.col("lbl").alias("l2"))
        new_labels = materialize(
            prop.join(hop, "lbl", "left")
            .join(labels.select("node", F.col("lbl").alias("__old")), "node")
            .select(
                "node",
                F.least("lbl", F.coalesce("l2", "lbl")).alias("lbl"),
                "__old",
            )
        )
        changed = (
            new_labels.where(F.col("lbl") != F.col("__old")).limit(1).count()
        )
        labels = new_labels.drop("__old")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"min-label propagation did not converge in {max_iter} rounds"
    )


def scc(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_peel: int = 20,
) -> DataFrame:
    """(node, scc_id): strongly connected components of the DIRECTED graph,
    by forward-backward min-label coloring (Fleischer/Hendrickson/Pinar's
    FW-BW scheme, the standard Pregel/GraphX SCC) — never a transitive
    closure, which is the O(n*m) trap at web scale:

      fwd(v) = min id that can reach v; bwd(v) = min id v can reach.
      fwd(v) == bwd(v) == m  =>  m and v reach each other => v in SCC(m);
      and both labels are constant on an SCC (members share reach sets),
      so every SCC whose pivot's label survives is assigned WHOLE. Peeling
      assigned nodes out and repeating terminates: the SCC of the smallest
      remaining id is always assigned (its id is both labels).

    Each peel round is two O(log diameter) label propagations over the
    still-active subgraph (shrinking every round); the active edge set is
    re-materialized per peel so late rounds shuffle only the residue.
    Reference has no graph algorithms at all (SURVEY.md section 2.6 —
    its graph lives in NetworkX on the driver); this is engine-side.
    """
    e = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    )
    nodes = materialize(
        e.select(F.col("s").alias("node"))
        .union(e.select("t"))
        .distinct()
    )
    rev = e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    done: DataFrame | None = None
    for _ in range(max_peel):
        fwd = _min_reach_labels(e, nodes)
        bwd = _min_reach_labels(rev, nodes).withColumnRenamed("lbl", "blbl")
        both = fwd.join(bwd, "node")
        assigned = materialize(
            both.where(F.col("lbl") == F.col("blbl"))
            .select("node", F.col("lbl").alias("scc_id"))
        )
        done = assigned if done is None else done.union(assigned)
        nodes = materialize(
            both.where(F.col("lbl") != F.col("blbl")).select("node")
        )
        if nodes.limit(1).count() == 0:
            return done
        alive = nodes.select(F.col("node").alias("s"))
        e = materialize(
            e.join(alive, "s")
            .join(nodes.select(F.col("node").alias("t")), "t")
            .select("s", "t")
        )
        rev = e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    raise RuntimeError(f"SCC peeling did not converge in {max_peel} rounds")


def adamic_adar(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = None,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Link prediction scored by Adamic-Adar: for unlinked pairs (u, v),
    aa = sum over shared neighbors w of 1/ln(deg(w)) — rare shared
    neighbors count more than hubs, the classic fix for common-neighbor
    counting's hub bias (common_neighbors above). Same wedge-join shape
    and the same `max_degree` hub cutoff; a shared neighbor has degree
    >= 2 by construction, so ln(deg) is never zero.

    Cross-engine determinism: each wedge's fp64 1/ln(d) term is quantized
    to integer micro-units BEFORE the sum (aa_micro), so the aggregate is
    an exact integer sum — the repo-wide parity rule for summed floats.
    """
    nbrs = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .where(F.col("node") != F.col("nbr"))
        .distinct()
    )
    nbrs = materialize(nbrs)
    if max_degree is not None:
        full_deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        thru = full_deg.where(F.col("d") <= max_degree).select(
            F.col("node").alias("nbr")
        )
        wedge_src = nbrs.join(thru, "nbr")
    else:
        wedge_src = nbrs
    # degree of the SHARED neighbor (the wedge midpoint), over the same
    # hub-filtered graph the wedges come from
    mid_deg = wedge_src.groupBy(F.col("nbr").alias("mid")).agg(
        F.count(F.lit(1)).alias("dmid")
    )
    term = F.round(1000000.0 / F.log(F.col("dmid").cast("double")), 0).cast(
        "long"
    )
    l, r = wedge_src.alias("l"), wedge_src.alias("r")
    pairs = (
        l.join(r, on=(F.col("l.nbr") == F.col("r.nbr"))
               & (F.col("l.node") < F.col("r.node")))
        .join(mid_deg, F.col("l.nbr") == F.col("mid"))
        .groupBy(F.col("l.node").alias("u"), F.col("r.node").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(term).alias("aa_micro"),
        )
        .where(F.col("common") >= min_common)
    )
    linked = nbrs.select(F.col("node").alias("u"), F.col("nbr").alias("v"))
    return (
        pairs.join(linked, ["u", "v"], "left_anti")
        .select(
            "u", "v",
            F.col("common").cast("long").alias("common"),
            F.col("aa_micro").cast("long").alias("aa_micro"),
        )
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Local clustering coefficient per node: (node, deg, n_tri,
    coef_micro) with coef_micro = (2e6 * triangles) DIV (deg*(deg-1)) —
    exact integer division on both engines (SQL `div` / DuckDB `//`),
    no fp64 in the contract. deg < 2 nodes emit 0 (no wedge to close).

    Reuses triangle_count's degree-ordered orientation (the O(sqrt m)
    oriented-degree bound is what keeps the wedge join subquadratic on
    hubs); degrees come from one extra distinct-edge aggregation.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = materialize(und)
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_count(und.select(F.col("a").alias(src),
                                    F.col("b").alias(dst)), src, dst)
    joined = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("n_tri"),
        (F.lit(2000000) * F.coalesce(F.col("triangles"), F.lit(0)))
        .cast("long").alias("__num"),
        (F.col("deg") * (F.col("deg") - F.lit(1))).cast("long").alias("__den"),
    )
    return joined.select(
        "node", "deg", "n_tri",
        F.when(F.col("deg") >= 2, F.expr("__num div __den"))
        .otherwise(F.lit(0)).cast("long").alias("coef_micro"),
    )


def wl_refine(
    edges: DataFrame,
    src: str = "subj",
    pred_col: str = "pred",
    dst: str = "obj",
    rounds: int = 2,
) -> DataFrame:
    """Weisfeiler-Leman color refinement over the typed (directed) triple
    graph: nodes that play the same structural role — same multiset of
    (direction, predicate, neighbor-class) at every refinement depth —
    converge to the same color. The distributed schema-discovery
    counterpart of the reference's per-batch type census
    (/root/reference/knowledge_graph_builder.py:219-246). Returns
    (node, wl_color, class_size) after `rounds` refinements.

    Per round: one message union (two projections of the edge table), a
    two-level aggregation — (node, message) counts first, so a hub's
    signature size is bounded by distinct (pred, neighbor-color) pairs,
    NOT by its degree — then md5 over the sorted count-annotated message
    list. Each round is two shuffles; colors are materialized per round so
    the plan stays linear in `rounds`.
    """
    if rounds < 1:
        raise ValueError("wl_refine: rounds must be >= 1")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    colors = materialize(nodes.select("node", F.md5(F.lit("wl0")).alias("color")))
    e = materialize(
        edges.select(
            F.col(src).alias("__s"),
            F.col(pred_col).alias("__p"),
            F.col(dst).alias("__d"),
        )
    )
    for _ in range(rounds):
        sc = colors.select(F.col("node").alias("__s"), F.col("color").alias("__sc"))
        dc = colors.select(F.col("node").alias("__d"), F.col("color").alias("__dc"))
        ed = e.join(sc, "__s").join(dc, "__d")
        msgs = ed.select(
            F.col("__s").alias("node"),
            F.concat(F.lit(">"), F.col("__p"), F.lit(":"), F.col("__dc")).alias("m"),
        ).union(
            ed.select(
                F.col("__d"),
                F.concat(F.lit("<"), F.col("__p"), F.lit(":"), F.col("__sc")),
            )
        )
        cnt = msgs.groupBy("node", "m").agg(F.count(F.lit(1)).alias("k"))
        sig = cnt.groupBy("node").agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat(F.col("m"), F.lit("*"), F.col("k").cast("string"))
                        )
                    ),
                )
            ).alias("sig")
        )
        colors = materialize(
            colors.join(sig, "node", "left").select(
                "node",
                F.md5(
                    F.concat(F.col("color"), F.lit("|"), F.coalesce("sig", F.lit("")))
                ).alias("color"),
            )
        )
    from pyspark.sql import Window

    wc = Window.partitionBy("color")
    return colors.select(
        "node",
        F.col("color").alias("wl_color"),
        F.count(F.lit(1)).over(wc).cast("long").alias("class_size"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(seed, node, rank): personalized PageRank vectors for EVERY seed
    simultaneously — teleport (and dangling mass) return to each walk's
    own seed, so each seed gets its own locality-biased rank distribution
    (Jeh & Widom, WWW 2003). PPR is the standard "importance relative to
    THIS entity" signal: related-entity ranking, seed-expanded community
    discovery, query-biased graph retrieval — where global pagerank()
    answers only "important overall" and trustrank() shares one seed set.

      rank_{i+1}(seed, v) = (1-d)·[v=seed]
                            + d·(Σ_{u→v} rank_i(seed,u)/outdeg(u)
                                 + dm_i(seed)·[v=seed])

    rank_0 = 1 at (seed, seed). Bounded iterations keep it deterministic
    and SQL-expressible (the LPA/k-core posture); sparsity is automatic —
    state holds only (seed, node) pairs the walk has reached, so i rounds
    touch at most the i-hop out-neighborhood of each seed.

    Scale shape: per round one join of edges against the sparse state
    (key-partitioned on the edge source), one groupBy per (seed, node),
    one dimension-sized dangling aggregate per seed; all seeds advance in
    the SAME two shuffles — k seeds cost one pass, not k passes. Lineage
    truncated per round via materialize().
    """
    if iterations < 1:
        raise ValueError("personalized_pagerank needs iterations >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    nodes = e.select(F.col("s").alias("node")).union(
        e.select(F.col("t").alias("node"))
    ).distinct()
    sd = (
        seeds.select(F.col(seeds.columns[0]).alias("seed"))
        .distinct()
        .join(nodes, F.col("seed") == F.col("node"), "left_semi")
    )
    sd = materialize(sd)
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("d"))
    state = sd.select(
        "seed", F.col("seed").alias("node"), F.lit(1.0).alias("rank")
    )
    base_t = F.lit(1.0) - F.lit(damping)
    for _ in range(iterations):
        contribs = (
            e.join(state, e["s"] == state["node"])
            .join(deg, "s")
            .groupBy("seed", F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("d")).alias("contrib"))
        )
        dangling = (
            state.join(deg, state["node"] == deg["s"], "left_anti")
            .groupBy("seed")
            .agg(F.sum("rank").alias("dm"))
        )
        seed_rows = sd.join(dangling, "seed", "left").select(
            "seed",
            F.col("seed").alias("node"),
            (
                base_t
                + F.lit(damping) * F.coalesce("dm", F.lit(0.0))
            ).alias("rank"),
        )
        spread = contribs.select(
            "seed", "node", (F.lit(damping) * F.col("contrib")).alias("rank")
        )
        state = materialize(
            spread.unionByName(seed_rows)
            .groupBy("seed", "node")
            .agg(F.sum("rank").alias("rank"))
        )
    return state


def bounded_closure(
    edges: DataFrame,
    depth: int = 3,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(anc, desc, min_depth): all-pairs reachability within `depth` hops
    — the bounded transitive closure that materializes ontology
    subsumption ("every ancestor type of every node", is-a chains),
    category rollups, and dependency cones. min_depth is the BFS
    distance. Self-pairs are excluded; cycles simply stop contributing
    once both directions are recorded.

    Use on pred-filtered subgraphs (taxonomies, is-a forests) — a bounded
    closure of a dense social graph explodes combinatorially by design,
    which is a property of the QUERY, not the plan. Depth is pinned so
    the operator is deterministic and its oracle unrolls (the k-core /
    LPA posture).

    Scale shape: semi-naive — each round joins the NEW frontier pairs
    (not the whole closure) against the edge table, one key-partitioned
    shuffle per round; the min-depth fold is one groupBy at the end.
    Lineage truncated per round via materialize().
    """
    if depth < 1:
        raise ValueError(f"bounded_closure needs depth >= 1, got {depth}")
    e = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    frontier = e.select("a", "b", F.lit(1).alias("d"))
    layers = [frontier]
    for i in range(2, depth + 1):
        frontier = materialize(
            frontier.join(
                e.select(F.col("a").alias("b"), F.col("b").alias("c")),
                "b",
            )
            .select(
                "a", F.col("c").alias("b"), F.lit(i).alias("d")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        layers.append(frontier)
    out = layers[0]
    for lay in layers[1:]:
        out = out.unionByName(lay)
    return out.groupBy(
        F.col("a").alias("anc"), F.col("b").alias("desc")
    ).agg(F.min("d").cast("long").alias("min_depth"))


def inverse_predicates(
    triples: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
) -> DataFrame:
    """Inverse-predicate mining (owl:inverseOf discovery): for every
    predicate pair (p, q) count how many p(a, b) facts have a matching
    q(b, a) fact — (pred_p, pred_q, n_p, n_q, n_inverse, inv_ppm) with
    inv_ppm = n_inverse·1e6 div n_p. p = q rows measure predicate
    SYMMETRY (a marriedTo b ⟺ b marriedTo a). High-ppm pairs feed schema
    alignment and edge canonicalization (keep one direction).

    Shape: one distinct, one self-join keyed on the REVERSED node pair
    (a key-partitioned equi-join — never all-pairs), one pair groupBy
    plus a dimension-sized predicate-count join.
    """
    t = triples.select(
        F.col(src).alias("a"), F.col(pred).alias("p"), F.col(dst).alias("b")
    ).distinct()
    t = materialize(t)
    n_per = t.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rev = t.select(
        F.col("b").alias("a"), F.col("p").alias("q"), F.col("a").alias("b")
    )
    inv = (
        t.join(rev, ["a", "b"])
        .groupBy(F.col("p").alias("pred_p"), F.col("q").alias("pred_q"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inverse"))
    )
    return (
        inv.join(
            n_per.select(F.col("p").alias("pred_p"),
                         F.col("n").alias("n_p")),
            "pred_p",
        )
        .join(
            n_per.select(F.col("p").alias("pred_q"),
                         F.col("n").alias("n_q")),
            "pred_q",
        )
        .select(
            "pred_p",
            "pred_q",
            "n_p",
            "n_q",
            "n_inverse",
            F.expr("n_inverse * 1000000 div n_p").cast("long").alias(
                "inv_ppm"
            ),
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Degree-assortativity census as exact integers: Spearman rank
    correlation between the endpoint degrees of every undirected edge —
    (n, sum_d2, rho_ppm), via kgspark.textstats.rank_correlation.
    Positive rho: hubs link hubs (social/citation graphs); negative:
    hubs link leaves (web/biology, Newman 2002). The one-number
    disassortativity check a KG-quality report leads with.

    Shape: one degree groupBy + two dimension joins onto the edge list,
    then rank_correlation's two sorts over the EDGE table (one row per
    edge, two longs — the calibration-scale posture documented there).
    """
    from kgspark.textstats import rank_correlation

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = materialize(und)
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    sig = (
        und.join(deg.select(F.col("n").alias("a"),
                            F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"),
                         F.col("d").alias("db")), "b")
        .select(
            F.concat_ws("|", "a", "b").alias("edge_id"),
            "da",
            "db",
        )
    )
    return rank_correlation(sig, "da", "db", "edge_id")


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center, context) pair census from a walk corpus — the
    co-occurrence table DeepWalk/node2vec actually train on (Perozzi
    2014): within each walk, every ordered pair of nodes at step distance
    1..window contributes one count. Input is random_walks() output
    (start, walk_no, step, node); returns (center, context, n).

    Shape: one self-join keyed on the walk id (walks are length+1 rows —
    the join is per-walk-local, never cross-walk) + one pair groupBy.
    """
    if window < 1:
        raise ValueError("skipgram_pairs: window must be >= 1")
    a = walks.select(
        F.col("start"), F.col("walk_no"),
        F.col("step").alias("si"), F.col("node").alias("center"),
    )
    b = walks.select(
        F.col("start"), F.col("walk_no"),
        F.col("step").alias("sj"), F.col("node").alias("context"),
    )
    return (
        a.join(b, ["start", "walk_no"])
        .where(
            (F.col("sj") != F.col("si"))
            & (F.abs(F.col("sj") - F.col("si")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def predicate_profile(
    triples: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
) -> DataFrame:
    """Per-predicate cardinality profile (ontology induction over extracted
    triples, ref's flat edge model knowledge_graph_builder.py as spec): for
    each predicate — n_triples, n_subj, n_obj, max fan-out (objects per
    subject), max fan-in (subjects per object), integer-ppm mean fan-out/in,
    and the OWL-style cardinality class:

      one_to_one          max_out = 1 and max_in = 1
      functional          max_out = 1  (each subject has one object — n:1)
      inverse_functional  max_in  = 1  (each object has one subject — 1:n)
      many_to_many        otherwise

    Functional predicates feed entity canonicalization (two subjects
    sharing an inverse-functional object are merge candidates); many-many
    predicates are excluded from such keys. All outputs exact integers.

    Shape: one distinct, two composite-key groupBys ((pred, subj) and
    (pred, obj) — partial-agg combines map-side; hot predicates don't hot
    the composite keys), one pred-level rollup each, one dimension-sized
    join. Never all-pairs; safe at any corpus scale.
    """
    t = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    t = materialize(t)
    out = (
        t.groupBy("p", "s")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("p")
        .agg(
            F.sum("k").cast("long").alias("n_triples"),
            F.count(F.lit(1)).cast("long").alias("n_subj"),
            F.max("k").cast("long").alias("max_out"),
        )
    )
    inn = (
        t.groupBy("p", "o")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obj"),
            F.max("k").cast("long").alias("max_in"),
        )
    )
    return (
        out.join(inn, "p")
        .select(
            F.col("p").alias("pred"),
            "n_triples",
            "n_subj",
            "n_obj",
            "max_out",
            "max_in",
            F.expr("n_triples * 1000000 div n_subj").cast("long").alias(
                "fanout_ppm"
            ),
            F.expr("n_triples * 1000000 div n_obj").cast("long").alias(
                "fanin_ppm"
            ),
            F.when((F.col("max_out") == 1) & (F.col("max_in") == 1),
                   F.lit("one_to_one"))
            .when(F.col("max_out") == 1, F.lit("functional"))
            .when(F.col("max_in") == 1, F.lit("inverse_functional"))
            .otherwise(F.lit("many_to_many"))
            .alias("card_class"),
        )
    )


def predicate_cooccurrence(
    triples: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    min_both: int = 1,
) -> DataFrame:
    """Schema association mining: for every predicate pair (p < q), the
    number of subjects exhibiting BOTH — (pred_p, pred_q, n_p, n_q, n_both,
    conf_p_ppm, jaccard_ppm) with conf_p_ppm = n_both·1e6 div n_p (P(q|p))
    and jaccard_ppm over the subject sets. High-confidence pairs induce
    schema shapes ("subjects with `capital` also have `population`") and
    drive attribute-completeness checks in KG QA.

    Shape: (subj, pred) distinct, subject-keyed self-join — fan-out per
    subject is bounded by the PREDICATE VOCABULARY (schema-sized, not
    corpus-sized), so no subject is a hot key even at 10^12 triples —
    one pair groupBy + a dimension-sized per-predicate count join.
    """
    sp = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p")
    ).distinct()
    sp = materialize(sp)
    n_per = sp.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    both = (
        sp.join(sp.select("s", F.col("p").alias("q")), "s")
        .where(F.col("p") < F.col("q"))
        .groupBy(F.col("p").alias("pred_p"), F.col("q").alias("pred_q"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .where(F.col("n_both") >= min_both)
    )
    return (
        both.join(
            n_per.select(F.col("p").alias("pred_p"), F.col("n").alias("n_p")),
            "pred_p",
        )
        .join(
            n_per.select(F.col("p").alias("pred_q"), F.col("n").alias("n_q")),
            "pred_q",
        )
        .select(
            "pred_p",
            "pred_q",
            "n_p",
            "n_q",
            "n_both",
            F.expr("n_both * 1000000 div n_p").cast("long").alias(
                "conf_p_ppm"
            ),
            F.expr(
                "n_both * 1000000 div (n_p + n_q - n_both)"
            ).cast("long").alias("jaccard_ppm"),
        )
    )


def domain_range(
    triples: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
    isa_pred: str = "is_a",
) -> DataFrame:
    """Domain/range induction per predicate (the ontology-induction
    companion to predicate_profile): typing every entity by its `isa_pred`
    objects, emit for each non-isa predicate the (subject-type,
    object-type) distribution — (pred, subj_type, obj_type, n, share_ppm)
    with share_ppm = n·1e6 div n_pred. Untyped endpoints surface as
    'unknown' (they are a data-quality signal, not discardable rows).
    Multi-typed entities contribute one row per (subj_type, obj_type)
    combination — the standard type-usage distribution semantics.

    Shape: the type table is entity-keyed (joins are equi-joins on the
    entity column; type fan-out is bounded by the type vocabulary), the
    final distribution is schema-sized, and per-pred totals come from a
    post-aggregation groupBy — no windows over corpus-sized data.
    """
    t = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    types = (
        t.where(F.col("p") == isa_pred)
        .select(F.col("s").alias("ent"), F.col("o").alias("typ"))
        .distinct()
    )
    base = t.where(F.col("p") != isa_pred)
    typed = (
        base.join(
            types.select(F.col("ent").alias("s"),
                         F.col("typ").alias("styp")),
            "s",
            "left",
        )
        .join(
            types.select(F.col("ent").alias("o"),
                         F.col("typ").alias("otyp")),
            "o",
            "left",
        )
        .select(
            "p",
            F.coalesce("styp", F.lit("unknown")).alias("subj_type"),
            F.coalesce("otyp", F.lit("unknown")).alias("obj_type"),
        )
    )
    dist = typed.groupBy("p", "subj_type", "obj_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = dist.groupBy("p").agg(F.sum("n").cast("long").alias("n_pred"))
    return (
        dist.join(totals, "p")
        .select(
            F.col("p").alias("pred"),
            "subj_type",
            "obj_type",
            "n",
            "n_pred",
            F.expr("n * 1000000 div n_pred").cast("long").alias("share_ppm"),
        )
    )


def type_violations(
    triples: DataFrame,
    min_share_ppm: int = 500_000,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
    isa_pred: str = "is_a",
) -> DataFrame:
    """Constraint-based KG error detection (the SDType/SHACL posture over
    INDUCED constraints): per predicate, take the dominant (subject-type,
    object-type) signature from the domain_range distribution — provided it
    is dominant enough (share_ppm >= min_share_ppm) — and flag every triple
    none of whose type combinations matches that signature.

    -> (subj, pred, obj, subj_types, obj_types, exp_subj_type,
    exp_obj_type, sig_share_ppm): one row per violating triple;
    subj_types/obj_types are the observed type sets rendered as sorted
    ','-joined strings ('unknown' for untyped endpoints), exp_* the
    induced signature, sig_share_ppm its dominance. Multi-typed entities
    are NOT flagged when any of their combinations matches — the standard
    any-match semantics. Exact integers/strings → hash-deterministic.

    Scale shape: the same entity-keyed type joins as domain_range; the
    signature table is schema-sized (argmax via a window over the
    predicate-type distribution, never over corpus rows); the verdict is
    one groupBy on the triple key. Ref has no typing layer at all
    (ref knowledge_graph_builder.py stores untyped edges).
    """
    t = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    types = (
        t.where(F.col("p") == isa_pred)
        .select(F.col("s").alias("ent"), F.col("o").alias("typ"))
        .distinct()
    )
    combos = (
        t.where(F.col("p") != isa_pred)
        .join(types.select(F.col("ent").alias("s"),
                           F.col("typ").alias("styp")), "s", "left")
        .join(types.select(F.col("ent").alias("o"),
                           F.col("typ").alias("otyp")), "o", "left")
        .select(
            "s", "p", "o",
            F.coalesce("styp", F.lit("unknown")).alias("styp"),
            F.coalesce("otyp", F.lit("unknown")).alias("otyp"),
        )
    )
    dist = combos.groupBy("p", "styp", "otyp").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = dist.groupBy("p").agg(F.sum("n").cast("long").alias("n_pred"))
    w = Window.partitionBy("p").orderBy(
        F.col("n").desc(), F.col("styp").asc(), F.col("otyp").asc()
    )
    sig = (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(totals, "p")
        .select(
            "p",
            F.col("styp").alias("exp_subj_type"),
            F.col("otyp").alias("exp_obj_type"),
            F.expr("n * 1000000 div n_pred").cast("long")
            .alias("sig_share_ppm"),
        )
        .where(F.col("sig_share_ppm") >= F.lit(min_share_ppm))
    )
    verdict = (
        combos.join(F.broadcast(sig), "p")
        .groupBy("s", "p", "o", "exp_subj_type", "exp_obj_type",
                 "sig_share_ppm")
        .agg(
            F.max(
                ((F.col("styp") == F.col("exp_subj_type"))
                 & (F.col("otyp") == F.col("exp_obj_type"))).cast("int")
            ).alias("ok"),
            F.concat_ws(",", F.sort_array(F.collect_set("styp")))
            .alias("subj_types"),
            F.concat_ws(",", F.sort_array(F.collect_set("otyp")))
            .alias("obj_types"),
        )
    )
    return verdict.where(F.col("ok") == 0).select(
        F.col("s").alias("subj"), F.col("p").alias("pred"),
        F.col("o").alias("obj"), "subj_types", "obj_types",
        "exp_subj_type", "exp_obj_type", "sig_share_ppm",
    )


def harmonic_centrality(
    edges: DataFrame,
    depth: int = 3,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Bounded harmonic centrality — Boldi & Vigna's ("Axioms for
    Centrality", 2014) recommended centrality for web-scale graphs because
    unreachable pairs contribute 0 instead of breaking the mean (vs
    closeness): h(v) = Σ 1/d(u, v) over nodes u that reach v within
    `depth` hops, in exact integer micro-units (1e6 div d — cross-engine
    stable). Emits (node, n_in, h_micro). Depth is pinned for determinism
    and an unrollable oracle — the k-core/LPA/bounded-closure posture;
    HyperBall (kgspark.graph_algs.hyperball) is the sketched variant when
    the closure itself is too large to materialize.

    Scale shape: the semi-naive bounded closure (one key-partitioned
    shuffle per round) plus a single node-keyed rollup.
    """
    cl = bounded_closure(edges, depth, src, dst)
    return cl.groupBy(F.col("desc").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum(F.expr("1000000 div min_depth")).cast("long").alias(
            "h_micro"
        ),
    )


def cardinality_violations(
    triples: DataFrame,
    declared: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
) -> DataFrame:
    """Constraint checking against a declared schema: for predicates
    declared `functional` (or `one_to_one`), report every subject holding
    MORE than one object — (pred, subj, n_objects, sample_obj) with
    sample_obj = the lexicographic min (deterministic witness). The QA
    consumer of predicate_profile: profile yesterday's KG, declare the
    stable classes, gate today's build on new violations.

    `declared` is (pred, card_class) — schema-sized, broadcast.

    Shape: one broadcast semi-join + one (pred, subj) groupBy — the same
    composite key as predicate_profile, partial-agg combined.
    """
    fns = declared.where(
        F.col("card_class").isin("functional", "one_to_one")
    ).select(F.col("pred").alias("p"))
    t = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    return (
        t.join(F.broadcast(fns), "p")
        .groupBy("p", "s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_objects"),
            F.min("o").alias("sample_obj"),
        )
        .where(F.col("n_objects") > 1)
        .select(
            F.col("p").alias("pred"),
            F.col("s").alias("subj"),
            "n_objects",
            "sample_obj",
        )
    )


def type_completeness(
    triples: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
    isa_pred: str = "is_a",
) -> DataFrame:
    """Property-completeness matrix (SHACL-lite schema QA): for every
    (entity type, predicate) pair — how many entities of that type carry
    the predicate at least once — (subj_type, pred, n_typed, n_with,
    completeness_ppm). Low-ppm cells are either optional properties or
    extraction gaps; a KG build gates on cells that DROP round-over-round.
    Types come from `isa_pred` objects; multi-typed entities count toward
    each of their types.

    Shape: entity-keyed equi-joins (type fan-out bounded by the type
    vocabulary), one (type, pred) distinct-entity groupBy, one
    dimension-sized per-type total join. Schema-sized output.
    """
    t = triples.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    types = (
        t.where(F.col("p") == isa_pred)
        .select(F.col("s").alias("ent"), F.col("o").alias("typ"))
        .distinct()
    )
    totals = types.groupBy("typ").agg(
        F.count(F.lit(1)).cast("long").alias("n_typed")
    )
    withp = (
        t.where(F.col("p") != isa_pred)
        .select(F.col("s").alias("ent"), "p")
        .distinct()
        .join(types, "ent")
        .groupBy("typ", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_with"))
    )
    return (
        withp.join(totals, "typ")
        .select(
            F.col("typ").alias("subj_type"),
            F.col("p").alias("pred"),
            "n_typed",
            "n_with",
            F.expr("n_with * 1000000 div n_typed").cast("long").alias(
                "completeness_ppm"
            ),
        )
    )


def simrank(
    edges: DataFrame,
    rounds: int = 2,
    c_ppm: int = 800_000,
    max_group: int = 256,
    max_degree_product: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round SimRank (Jeh & Widom, KDD 2002): two nodes are
    similar if their in-neighbors are similar, seeded from the identity.

        s_0(a, b) = 1 iff a = b
        s_k(a, b) = C / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)}
                    s_{k-1}(i, j)

    Integer parts-per-million arithmetic throughout (C = c_ppm, sums of
    ppm scores, truncating division) — bit-identical cross-engine. The
    reference has no node-similarity surface at all; within this repo
    SimRank complements common_neighbors/adamic_adar (one-hop overlap
    counts) with the recursive structural-equivalence measure used for
    entity resolution and collaborative filtering.

    BOUNDED-ROUNDS POSTURE (repo-wide, see k_core): s_rounds exactly, not
    the fixpoint — a fixpoint's round count is data-dependent. The score
    support after k rounds is exactly the pairs with a common ancestor at
    the SAME in-path depth d <= k, so the pair universe is generated from
    the d-step in-reach tables, never all n^2 pairs. Two skew guards, both
    deliberate approximations documented here: ancestor groups larger than
    ``max_group`` are dropped from pair generation (hub ancestors — the
    blocking-cap precedent from ifp_sameas), and pairs with
    |I(a)|*|I(b)| > ``max_degree_product`` are dropped (also keeps the
    ppm products inside long range). Dropped pairs read as score-0 in the
    next round's lookups.

    Returns (a, b, s_ppm) for canonical a < b pairs with s_ppm > 0.

    Plan per round: pair table x two in-neighbor joins x one lookup join
    against the previous round's scores (identity diagonal inlined as a
    CASE), then one (a, b) aggregation. Everything keyed; no windows.
    """
    if rounds < 1:
        raise ValueError(f"simrank: rounds >= 1, got {rounds}")
    e = (
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nb"))
        .where(F.col("node") != F.col("nb"))
        .distinct()
    )
    e = materialize(e)
    deg = e.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))

    # support pairs: common same-depth ancestor within `rounds` in-steps
    reach = e.select("node", F.col("nb").alias("anc"))
    pairs = None
    for d in range(1, rounds + 1):
        if d > 1:
            reach = (
                reach.alias("r")
                .join(e.alias("e"), F.col("r.anc") == F.col("e.node"))
                .select(F.col("r.node").alias("node"),
                        F.col("e.nb").alias("anc"))
                .distinct()
            )
        # count-prefilter BEFORE any pair fan-out: hub ancestors never
        # materialize their quadratic group
        ok = reach.groupBy("anc").agg(
            F.count(F.lit(1)).alias("n")
        ).where(F.col("n") <= max_group).select("anc")
        kept = reach.join(ok, "anc")
        p_d = (
            kept.alias("x")
            .join(kept.alias("y"),
                  (F.col("x.anc") == F.col("y.anc"))
                  & (F.col("x.node") < F.col("y.node")))
            .select(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
            .distinct()
        )
        pairs = p_d if pairs is None else pairs.unionByName(p_d).distinct()
    pairs = (
        pairs.join(deg.select(F.col("node").alias("a"),
                              F.col("deg").alias("na")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("nb_deg")), "b")
        .where(F.col("na") * F.col("nb_deg") <= F.lit(max_degree_product))
    )
    pairs = materialize(pairs)

    prev = None  # identity only
    for _ in range(rounds):
        quads = (
            pairs.join(e.select(F.col("node").alias("a"),
                                F.col("nb").alias("i")), "a")
            .join(e.select(F.col("node").alias("b"),
                           F.col("nb").alias("j")), "b")
        )
        lo = F.least("i", "j")
        hi = F.greatest("i", "j")
        if prev is None:
            looked = quads.select(
                "a", "b", "na", "nb_deg",
                F.when(F.col("i") == F.col("j"), F.lit(1_000_000))
                .otherwise(F.lit(0)).alias("s_prev"),
            )
        else:
            looked = (
                quads.select("a", "b", "na", "nb_deg",
                             lo.alias("lo"), hi.alias("hi"),
                             (F.col("i") == F.col("j")).alias("diag"))
                .join(
                    prev.select(F.col("a").alias("lo"),
                                F.col("b").alias("hi"),
                                F.col("s_ppm").alias("s_lookup")),
                    ["lo", "hi"], "left",
                )
                .select(
                    "a", "b", "na", "nb_deg",
                    F.when(F.col("diag"), F.lit(1_000_000))
                    .otherwise(F.coalesce("s_lookup", F.lit(0)))
                    .alias("s_prev"),
                )
            )
        cur = (
            looked.groupBy("a", "b", "na", "nb_deg")
            .agg(F.sum("s_prev").alias("s_sum"))
            .select(
                "a", "b",
                F.expr(
                    f"({c_ppm} * s_sum) div (na * nb_deg * 1000000)"
                ).cast("long").alias("s_ppm"),
            )
        )
        prev = materialize(cur.where(F.col("s_ppm") > 0))
    return prev


def compose_relation(
    r1: DataFrame, r2: DataFrame,
    x: str = "x", y: str = "y", c: str = "c",
) -> DataFrame:
    """Compose two weighted relations along the shared middle column:
    out(x, y) = sum over m of r1(x, m) * r2(m, y) — the commuting-matrix
    product that turns edge tables into metapath instance counts (feed
    the result to :func:`pathsim`). r1 is read as (x, y=m, c), r2 as
    (x=m, y, c); missing ``c`` columns default to count 1.
    """
    a = r1.select(
        F.col(x).alias("_x"), F.col(y).alias("_m"),
        (F.col(c) if c in r1.columns else F.lit(1)).cast("long").alias("_ca"),
    )
    b = r2.select(
        F.col(x).alias("_m"), F.col(y).alias("_y"),
        (F.col(c) if c in r2.columns else F.lit(1)).cast("long").alias("_cb"),
    )
    return (
        a.join(b, "_m")
        .groupBy(F.col("_x").alias(x), F.col("_y").alias(y))
        .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long").alias(c))
    )


def pathsim(
    rel: DataFrame,
    x: str = "x",
    y: str = "y",
    c: str = "c",
    max_group: int = 256,
) -> DataFrame:
    """PathSim (Sun et al., VLDB 2011): similarity of two x-nodes under
    the symmetric metapath P.P^-1, where ``rel`` holds the path-instance
    counts of P as (x, y, c) — build composed metapaths with
    :func:`compose_relation` first.

        s(a, b) = 2 * M(a,b) / (M(a,a) + M(b,b)),
        M(a, b) = sum_y c(a, y) * c(b, y)

    Exact integers end to end (ppm with truncating division). Unlike
    SimRank's recursive in-neighbor similarity, PathSim measures peer
    similarity along a CHOSEN semantic path and normalizes by
    self-visibility, so hubs don't dominate (the paper's motivation).

    Returns (a, b, m_ab, m_aa, m_bb, pathsim_ppm) for canonical a < b
    pairs with m_ab > 0. Candidate pairs come from the self-join on the
    shared y key — co-visiting pairs only, never the x^2 product; y
    groups larger than ``max_group`` distinct x are dropped first (the
    repo's blocking-cap posture for hub keys).
    """
    r = rel.select(
        F.col(x).alias("_x"), F.col(y).alias("_y"),
        F.col(c).cast("long").alias("_c"),
    ).where(F.col("_c") > 0)
    diag = r.groupBy("_x").agg(
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("m_self")
    )
    ok = r.groupBy("_y").agg(F.count(F.lit(1)).alias("_n")).where(
        F.col("_n") <= max_group
    ).select("_y")
    kept = r.join(ok, "_y")
    m = (
        kept.alias("p")
        .join(kept.alias("q"),
              (F.col("p._y") == F.col("q._y"))
              & (F.col("p._x") < F.col("q._x")))
        .groupBy(F.col("p._x").alias("a"), F.col("q._x").alias("b"))
        .agg(F.sum(F.col("p._c") * F.col("q._c")).cast("long").alias("m_ab"))
    )
    out = (
        m.join(diag.select(F.col("_x").alias("a"),
                           F.col("m_self").alias("m_aa")), "a")
        .join(diag.select(F.col("_x").alias("b"),
                          F.col("m_self").alias("m_bb")), "b")
    )
    return out.select(
        "a", "b", "m_ab", "m_aa", "m_bb",
        F.expr("(2000000 * m_ab) div (m_aa + m_bb)").cast("long")
        .alias("pathsim_ppm"),
    )


def quotient_graph(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    cls: str = "cls",
) -> DataFrame:
    """Graph summarization by node-class quotient (the SNAP / k-SNAP
    summary shape, Tian et al. SIGMOD 2008): collapse every node to its
    class and count the super-edges.

    ``labels`` assigns each node a class — any labeling works and each
    gives a different summary: WL refinement classes (structural
    bisimulation quotient), LPA communities, entity types from is_a,
    partition buckets. Returns one row per (cls_src, cls_dst):
    (n_edges, n_src distinct source nodes, n_dst distinct targets).
    Edges with an unlabeled endpoint are dropped (inner joins): labeling
    coverage is the caller's contract — coalesce a default class first
    to keep strays.

    Plan: two hash joins against the (dimension-sized) label table plus
    one aggregation; the summary is class-cardinality-sized, the
    canonical driver-safe "look at the whole 100 TB graph" output.
    """
    lab = labels.select(F.col(node).alias("_n"), F.col(cls).alias("_c"))
    e = (
        edges.select(F.col(src).alias("_sn"), F.col(dst).alias("_dn"))
        .join(lab.select(F.col("_n").alias("_sn"),
                         F.col("_c").alias("cls_src")), "_sn")
        .join(lab.select(F.col("_n").alias("_dn"),
                         F.col("_c").alias("cls_dst")), "_dn")
    )
    return e.groupBy("cls_src", "cls_dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.countDistinct("_sn").cast("long").alias("n_src"),
        F.countDistinct("_dn").cast("long").alias("n_dst"),
    )


def temporal_reach(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    strict: bool = False,
    src: str = "src",
    dst: str = "dst",
    ts: str = "ts",
) -> DataFrame:
    """Earliest-arrival time-respecting reachability (Wu et al., VLDB
    2014 "Path Problems in Temporal Graphs"): from each seed node, which
    nodes are reachable through a path whose edge timestamps never
    decrease (``strict=True``: strictly increase), within ``max_hops``
    edges — and what is the earliest possible arrival time?

    A static-reachability answer is WRONG on event data (citations,
    crawls, message logs): an edge that happened before you arrived
    cannot be taken. Returns (start, node, earliest_ts, hops) — hops =
    the fewest edges achieving that earliest arrival; seeds themselves
    are not emitted.

    Correctness of the compaction: with a monotone time constraint, an
    earlier arrival at a node permits a superset of the continuations of
    any later arrival, so keeping only the MIN arrival per (start, node)
    per round preserves all earliest arrivals downstream — the frontier
    stays node-sized, never path-sized. Bounded max_hops rounds, one
    keyed join + one aggregation each.
    """
    if max_hops < 1:
        raise ValueError(f"temporal_reach: max_hops >= 1, got {max_hops}")
    e = edges.select(
        F.col(src).alias("_u"), F.col(dst).alias("_v"),
        F.col(ts).cast("long").alias("_t"),
    ).distinct()
    e = materialize(e)
    cond_ok = (lambda at, t: t > at) if strict else (lambda at, t: t >= at)

    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("start")).distinct()
        .join(e, F.col("start") == F.col("_u"))
        .groupBy("start", F.col("_v").alias("node"))
        .agg(F.min("_t").alias("at"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    def _fresh(df):
        # localCheckpoint keeps attribute ids, so best/improved would
        # share exprIds across the self-join + union below and trip
        # Catalyst's Union constraint rewrite; re-aliasing mints new ids
        return df.select([F.col(c).alias(c) for c in df.columns])

    best = _fresh(materialize(frontier))
    frontier = best
    for hop in range(2, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_u"])
            .where(cond_ok(F.col("at"), F.col("_t")))
            .groupBy("start", F.col("_v").alias("node"))
            .agg(F.min("_t").alias("at"))
            .withColumn("hops", F.lit(hop).cast("long"))
        )
        # keep only strict improvements over best-so-far
        bmin = best.select(
            F.col("start").alias("_bs"), F.col("node").alias("_bn"),
            F.col("at").alias("_ba"),
        )
        improved = (
            nxt.join(
                bmin,
                (F.col("start") == F.col("_bs"))
                & (F.col("node") == F.col("_bn")),
                "left",
            )
            .where(F.col("_ba").isNull() | (F.col("at") < F.col("_ba")))
            .select("start", "node", "at", "hops")
        )
        improved = _fresh(materialize(improved))
        if improved.isEmpty():
            break
        # an improved row strictly dominates (smaller at); replace, don't
        # aggregate
        kept = best.join(
            improved.select(F.col("start").alias("_is"),
                            F.col("node").alias("_in")),
            (F.col("start") == F.col("_is")) & (F.col("node") == F.col("_in")),
            "left_anti",
        )
        best = _fresh(materialize(kept.unionByName(improved)))
        frontier = improved
    return best.select(
        "start", "node", F.col("at").alias("earliest_ts"), "hops"
    )


def infer_types(
    edges: DataFrame,
    seed_types: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    type_col: str = "type",
) -> DataFrame:
    """Semi-supervised type inference by neighbor plurality (the
    label-propagation completion recipe, Zhu & Ghahramani 2002, hard
    labels): untyped nodes adopt the most common type among their ALREADY
    TYPED neighbors; seeds never change; rounds are synchronous (round k
    votes see only types assigned in rounds < k), ties break on
    (votes desc, type asc) — fully deterministic, exact integer votes.

    edges are treated as undirected (typing homophily has no direction).
    Returns (node, type, round) with round=0 for seeds. Bounded
    ``rounds`` (repo posture); nodes never reached stay absent —
    explicitly untypeable is a shape_report signal, not a default type.

    Plan per round: one join of the frontier-adjacent edges against the
    typed table + one (node, type) count + one rank-1 window on the
    candidate nodes. The typed table only grows; each round's work is
    proportional to the newly reachable frontier.
    """
    if rounds < 1:
        raise ValueError(f"infer_types: rounds >= 1, got {rounds}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = materialize(und)
    typed = seed_types.select(
        F.col(node).alias("n"), F.col(type_col).alias("t"),
        F.lit(0).cast("long").alias("round"),
    ).distinct()
    typed = materialize(typed)
    for r in range(1, rounds + 1):
        from pyspark.sql import Window

        votes = (
            und.join(
                typed.select(F.col("n").alias("b"), "t"), "b"
            )  # neighbor b is typed
            .join(typed.select(F.col("n").alias("a")), "a", "left_anti")
            .groupBy(F.col("a").alias("n"), "t")
            .agg(F.count(F.lit(1)).alias("_v"))
        )
        w = Window.partitionBy("n").orderBy(F.desc("_v"), F.asc("t"))
        newly = (
            votes.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("n", "t", F.lit(r).cast("long").alias("round"))
        )
        newly = materialize(newly)
        if newly.isEmpty():
            break
        typed = materialize(typed.unionByName(newly))
    return typed.select(
        F.col("n").alias("node"), F.col("t").alias("type"), "round"
    )


def betweenness(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Source-sampled betweenness centrality (Brandes, J. Math. Soc.
    2001, dependency accumulation; source sampling per Brandes & Pich,
    2007): how often a node sits on shortest paths from the given seed
    sources — directed, unweighted, hop-bounded.

    Exact integer arithmetic end to end: shortest-path COUNTS sigma are
    exact longs (summed along BFS levels), and the dependency recursion

        delta(v) = sum over successors w on shortest paths of
                   sigma(v) * (1e6 + delta(w)) div sigma(w)

    is evaluated in ppm with one truncating division PER TERM in a fixed
    order — bit-replicable cross-engine, unlike a floating Brandes.
    Returns (node, bc_ppm) with bc_ppm = sum over sources of delta
    (sources excluded from their own accumulation, Brandes' convention).

    Scale posture: forward = one frontier join + (s, w) aggregation per
    level; backward = one three-way keyed join per level walking the
    level list in reverse — 2 * max_depth bounded rounds total, work
    proportional to the BFS cone of the seed set, never the full graph.
    Betweenness over ALL sources is quadratic by nature; sampling
    sources is the standard scale answer and the seed set is the
    caller's contract.
    """
    if max_depth < 1:
        raise ValueError(f"betweenness: max_depth >= 1, got {max_depth}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = materialize(e)
    lvl0 = (
        sources.select(F.col(sources.columns[0]).alias("s")).distinct()
        .select("s", F.col("s").alias("node"),
                F.lit(1).cast("long").alias("sigma"))
    )
    levels = [materialize(lvl0)]
    visited = levels[0].select("s", "node")
    for _ in range(max_depth):
        nxt = (
            levels[-1].join(e, levels[-1]["node"] == e["u"])
            .groupBy("s", F.col("v").alias("node"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .join(visited, ["s", "node"], "left_anti")
        )
        nxt = materialize(nxt)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = materialize(visited.unionByName(nxt.select("s", "node")))
    # backward accumulation; delta of the deepest level is 0
    sess = edges.sparkSession
    delta = sess.createDataFrame([], "s string, node string, delta long")
    acc = None
    for d in range(len(levels) - 2, -1, -1):
        cur, below = levels[d], levels[d + 1]
        succ = (
            cur.select("s", F.col("node").alias("_v"),
                       F.col("sigma").alias("_sv"))
            .join(e, F.col("_v") == F.col("u"))
            .join(
                below.select("s", F.col("node").alias("v"),
                             F.col("sigma").alias("_sw")),
                ["s", "v"],
            )
            .join(
                delta.select("s", F.col("node").alias("v"),
                             F.col("delta").alias("_dw")),
                ["s", "v"], "left",
            )
            .select(
                "s", F.col("_v").alias("node"),
                F.expr(
                    "(_sv * (1000000 + coalesce(_dw, 0))) div _sw"
                ).cast("long").alias("_term"),
            )
        )
        delta = materialize(
            succ.groupBy("s", "node").agg(
                F.sum("_term").cast("long").alias("delta")
            )
        )
        if d > 0:  # d=0 rows are the sources themselves (excluded)
            acc = delta if acc is None else acc.unionByName(delta)
    if acc is None:
        return sess.createDataFrame([], "node string, bc_ppm long")
    return acc.groupBy("node").agg(
        F.sum("delta").cast("long").alias("bc_ppm")
    )


def katz_centrality(
    edges: DataFrame,
    rounds: int = 3,
    alpha_num: int = 1,
    alpha_den: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded Katz centrality (Katz 1953) in exact integer ppm:
    katz_ppm(v) = Σ_{k=1..rounds} (paths_k(v) · 1e6 · alpha_num^k)
    div alpha_den^k, where paths_k(v) counts directed walks of length k
    ending at v. Unlike PageRank (kgspark.graph_algs.pagerank) there is
    no out-degree normalization — prestige flows undamped along every
    walk, attenuated only by alpha^k — and unlike harmonic centrality it
    weights by walk COUNT, not reachability. Bounded `rounds` is the
    same pinned-iteration posture as k-core/LPA: deterministic,
    oracle-unrollable, and the k-th term is bounded by alpha^k so the
    truncation error is geometric. Per-k floor division (nonnegative, so
    Spark `div` == floor) keeps every term cross-engine integer-exact.
    The reference has no centrality surface at all (networkx app,
    /root/reference/knowledge_graph_builder.py).

    Emits (node, katz_ppm) over ALL nodes (sink-only nodes score 0).

    Scale shape: `rounds` frontier joins, each a node-keyed hash join
    edges⋈weights followed by a dst-keyed partial-agg sum — the frontier
    is node-count sized, never path-materializing; walk counts grow but
    stay 64-bit for any alpha-damped depth worth running.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    w = nodes.withColumn("w", F.lit(1).cast("long"))
    acc = None
    num, den = 1, 1
    for _k in range(1, rounds + 1):
        num *= alpha_num
        den *= alpha_den
        w = materialize(
            edges.join(w.withColumnRenamed("node", src), src)
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("w").cast("long").alias("w"))
        )
        term = w.select(
            "node",
            F.expr(f"(w * 1000000 * {num}) div {den}")
            .cast("long").alias("t"),
        )
        acc = term if acc is None else acc.unionByName(term)
    scores = acc.groupBy("node").agg(
        F.sum("t").cast("long").alias("katz_ppm")
    )
    return (
        nodes.join(scores, "node", "left")
        .select("node", F.coalesce("katz_ppm", F.lit(0))
                .cast("long").alias("katz_ppm"))
    )


def topo_levels(
    edges: DataFrame,
    max_rounds: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Topological layering by Kahn peeling, with cycle detection.

    Round r removes every node whose remaining in-degree is zero and
    stamps it ``level = r`` — so a DAG node's level is the length of the
    longest path reaching it, the canonical layering for scheduling
    derived-table builds or stratifying an is_a taxonomy. Nodes still
    unpeeled after `max_rounds` get ``level = -1``: cycle members AND
    everything downstream of a cycle (a node fed by a cycle can never
    become a source — exactly the set whose stratum is undefined).
    Bounded rounds is the pinned-iteration posture shared with
    k-core/LPA: deterministic and oracle-unrollable; a graph deeper than
    `max_rounds` reports the tail as unresolved rather than guessing.
    The reference's graph layer (networkx app,
    /root/reference/knowledge_graph_builder.py) has no ordering surface.

    Emits (node, level) over all nodes.

    Scale shape: each round is one dst-distinct projection + two
    left_anti hash joins on the node key (no in-edge probe, then peel);
    the per-round state is node/edge-table sized and shrinks
    monotonically, and the loop exits early the first round nothing
    peels.
    """
    e = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .distinct()
    )
    remaining_n = materialize(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    remaining_e = e
    acc = None
    for r in range(max_rounds):
        srcs = materialize(
            remaining_n.join(
                remaining_e.select(F.col("t").alias("node")).distinct(),
                "node", "left_anti",
            )
        )
        if srcs.isEmpty():
            break
        lev = srcs.withColumn("level", F.lit(r).cast("long"))
        acc = lev if acc is None else acc.unionByName(lev)
        remaining_n = materialize(
            remaining_n.join(srcs, "node", "left_anti")
        )
        remaining_e = materialize(
            remaining_e.join(
                srcs.withColumnRenamed("node", "s"), "s", "left_anti"
            )
        )
    leftover = remaining_n.withColumn(
        "level", F.lit(-1).cast("long")
    )
    return leftover if acc is None else acc.unionByName(leftover)


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    max_rounds: int = 16,
) -> DataFrame:
    """Minimum spanning forest by Borůvka rounds (Borůvka 1926; the
    distributed-MST algorithm of choice because every round halves the
    component count): each component selects its minimum outgoing edge
    under the (weight, src, dst) total order, selected edges join the
    forest, touched components merge. The MSF is THE single-linkage
    clustering primitive — cut it at a distance threshold and you have
    exact single-linkage clusters of a similarity graph at any scale,
    where the naive agglomerative loop is hopelessly sequential.

    Deterministic for any weights because ties fall through to the
    (src, dst) lexicographic tiebreak (unique per edge). Self-loops are
    dropped; parallel edges are fine (the min wins). Emits the forest as
    (src, dst, w) canonical rows (src < dst).

    Scale shape: each round is two comp-label hash joins + one
    per-component struct-min aggregate + a pointer-jumping CC over the
    selected FOREST (O(log) itself); component count at least halves
    per round, so max_rounds=16 covers 65k+ components per connected
    piece and the loop early-exits the first round with no
    cross-component edge. Raises if the budget is exhausted with merges
    still pending rather than returning a partial forest.
    """
    from kgspark.canon import connected_components

    e = materialize(
        edges.where(F.col(src) != F.col(dst)).select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
            F.col(weight_col).alias("w"),
        ).groupBy("a", "b").agg(F.min("w").alias("w"))
    )
    comp = materialize(
        e.select(F.col("a").alias("name"))
        .unionByName(e.select(F.col("b").alias("name")))
        .distinct()
        .select("name", F.col("name").alias("component"))
    )
    sess = edges.sparkSession
    forest = None
    for rnd in range(max_rounds):
        lab = comp.select(
            F.col("name").alias("a"), F.col("component").alias("ca")
        )
        labb = comp.select(
            F.col("name").alias("b"), F.col("component").alias("cb")
        )
        cross = materialize(
            e.join(lab, "a").join(labb, "b")
            .where(F.col("ca") != F.col("cb"))
        )
        if cross.isEmpty():
            break
        both = cross.select(
            F.col("ca").alias("c"), "w", "a", "b"
        ).unionByName(cross.select(F.col("cb").alias("c"), "w", "a", "b"))
        sel = (
            both.groupBy("c")
            .agg(F.min(F.struct("w", "a", "b")).alias("m"))
            .select("m.a", "m.b", "m.w")
            .distinct()
        )
        forest = sel if forest is None else forest.unionByName(sel)
        cpairs = (
            cross.join(sel.select("a", "b"), ["a", "b"], "left_semi")
            .select(F.col("ca").alias("a"), F.col("cb").alias("b"))
            .distinct()
        )
        cnodes = comp.select(F.col("component").alias("name")).distinct()
        merged = connected_components(cnodes, cpairs)
        comp = materialize(
            comp.join(
                merged.withColumnRenamed("component", "__new")
                .withColumnRenamed("name", "component"),
                "component",
            ).select("name", F.col("__new").alias("component"))
        )
    else:
        raise RuntimeError(
            f"boruvka_mst: still merging after {max_rounds} rounds"
        )
    if forest is None:
        return sess.createDataFrame([], f"{src} string, {dst} string, w long")
    return forest.distinct().select(
        F.col("a").alias(src), F.col("b").alias(dst), "w"
    )


def single_linkage(
    edges: DataFrame,
    threshold,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    max_rounds: int = 16,
) -> DataFrame:
    """EXACT single-linkage clustering at a distance cut: clusters =
    connected components of the minimum-spanning-forest edges with
    weight <= threshold — the textbook identity (cutting the MST IS the
    single-linkage dendrogram), which turns the hopelessly sequential
    agglomerative loop into boruvka_mst + one pointer-jumping CC. This
    is the exact counterpart to the LSH-approximate near-dup clustering
    in kgspark.dedup/density: run it on a candidate-pair distance graph
    when the answer must match a single-machine scikit-style linkage
    exactly. Emits (node, cluster) for EVERY node incident to the input
    graph, cluster = min node label (the CC convention repo-wide).
    """
    from kgspark.canon import connected_components

    forest = boruvka_mst(
        edges, src=src, dst=dst, weight_col=weight_col,
        max_rounds=max_rounds,
    )
    kept = forest.where(F.col("w") <= threshold).select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    )
    nodes = (
        edges.select(F.col(src).alias("name"))
        .unionByName(edges.select(F.col(dst).alias("name")))
        .distinct()
    )
    return connected_components(nodes, kept).select(
        F.col("name").alias("node"), F.col("component").alias("cluster")
    )


def node2vec_walks(
    edges: DataFrame,
    length: int = 2,
    num_walks: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(start, walk_no, step, node): node2vec SECOND-ORDER biased walks
    (Grover & Leskovec, KDD 2016 §3.2) — random_walks' uniform hop
    replaced by the p/q-weighted transition: from (prev -> cur), a
    candidate x weighs 1/p if x = prev (return), 1 if x neighbors prev
    (BFS-ish), 1/q otherwise (DFS-ish). Weights are INTEGER per-mille
    (w = round(1000/p) etc.), the draw is md5(start:walk_no:k) mod the
    per-walk weight total resolved against a cumulative-weight window —
    pure integer arithmetic, so the biased sampler is exactly
    SQL-replicable (the kgtrain.py hash-randomness posture).

    Scale shape mirrors random_walks: adjacency indexed once; each step
    is a node-keyed join of the walk frontier against it plus ONE
    (prev, x)-keyed left join marking prev-neighborhood membership, and
    the cumulative window partitions by walk id — never more rows than
    the frontier's candidate fan. Step 1 has no prev and is uniform.
    Reference has no analogue (networkx pickle,
    knowledge_graph_builder.py:595-607).
    """
    from pyspark.sql import Window

    from kgspark.kgtrain import _hex6_to_int

    if length < 1 or num_walks < 1:
        raise ValueError("length and num_walks must be >= 1")
    w_ret = int(round(1000.0 / p))
    w_out = int(round(1000.0 / q))
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    adj = (
        e.select(F.col("s").alias("node"), F.col("t").alias("nbr"))
        .union(e.select(F.col("t").alias("node"), F.col("s").alias("nbr")))
        .distinct()
    )
    w = Window.partitionBy("node").orderBy("nbr")
    idx = materialize(
        adj.select(
            "node", "nbr", (F.row_number().over(w) - 1).alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy("node")).alias("deg"),
        )
    )
    flags = idx.select(F.col("node").alias("pn"), F.col("nbr").alias("px"),
                       F.lit(1).alias("is_nbr"))
    walks = idx.select("node").distinct().select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("walk_no"),
        F.col("node").alias("prev"),
        F.col("node").alias("cur"),
    )
    out = walks.select(
        "start", "walk_no", F.lit(0).alias("step"), F.col("cur").alias("node"),
    )

    def _h(k: int):
        return _hex6_to_int(F.md5(F.concat_ws(
            ":", F.col("start"), F.col("walk_no").cast("string"),
            F.lit(str(k)))))

    # step 1: uniform (no prev context yet), the random_walks hop
    step1 = materialize(
        walks.join(idx, walks["cur"] == idx["node"])
        .where(F.col("i") == _h(1) % F.col("deg"))
        .select("start", "walk_no", F.col("cur").alias("prev"),
                F.col("nbr").alias("cur"))
    )
    out = out.unionAll(step1.select(
        "start", "walk_no", F.lit(1).alias("step"),
        F.col("cur").alias("node")))
    walks = step1
    for k in range(2, length + 1):
        cands = (
            walks.join(idx, walks["cur"] == idx["node"])
            .join(
                flags,
                (F.col("prev") == F.col("pn")) & (F.col("nbr") == F.col("px")),
                "left",
            )
            .select(
                "start", "walk_no", "prev", "cur", "nbr",
                F.when(F.col("nbr") == F.col("prev"), F.lit(w_ret))
                .when(F.col("is_nbr").isNotNull(), F.lit(1000))
                .otherwise(F.lit(w_out))
                .cast("long").alias("wt"),
            )
        )
        wp = Window.partitionBy("start", "walk_no")
        cw = F.sum("wt").over(
            wp.orderBy("nbr").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow))
        tot = F.sum("wt").over(wp)
        picked = (
            cands.withColumn("cw", cw).withColumn("tot", tot)
            .withColumn("r", _h(k).cast("long") % F.col("tot"))
            .where((F.col("r") >= F.col("cw") - F.col("wt"))
                   & (F.col("r") < F.col("cw")))
        )
        walks = materialize(
            picked.select("start", "walk_no", F.col("cur").alias("prev"),
                          F.col("nbr").alias("cur"))
        )
        out = out.unionAll(walks.select(
            "start", "walk_no", F.lit(k).alias("step"),
            F.col("cur").alias("node")))
    return out.select(
        "start", F.col("walk_no").cast("long").alias("walk_no"),
        F.col("step").cast("long").alias("step"), "node",
    )


def louvain_move(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, community): bounded-round SYNCHRONOUS Louvain local-move
    phase (Blondel et al. 2008 phase 1) over the undirected simple
    graph — modularity ASCENT, vs label_propagation's majority vote.
    Every node starts in its own community; each round every node
    evaluates moving to each neighbor community C by the exact-INTEGER
    modularity-gain numerator

        score(C) = 2m * k_{v,C}  -  k_v * (Σtot(C) - [C = own] * k_v)

    (k_{v,C} = edges from v into C, Σtot = community degree sum, m =
    edge count; the common 1/(2m)² factor is dropped — argmax-invariant)
    and takes the best (score desc, label asc — deterministic). All
    moves apply simultaneously; bounded rounds keep the op replayable
    cross-engine (the k-core/LPA posture: true fixpoints of synchronous
    dynamics are data-dependent and can 2-cycle).

    Scale shape per round: one (nbr -> community) hash join, two
    map-side-combined aggregations (Σtot, k_{v,C}), one per-node argmax
    window — no global state, no driver loop over nodes. Reference has
    no analogue (networkx pickle, knowledge_graph_builder.py:83-92).
    """
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    adj = materialize(
        e.select(F.col("s").alias("node"), F.col("t").alias("nbr"))
        .union(e.select(F.col("t").alias("node"), F.col("s").alias("nbr")))
        .distinct()
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("kv"))
    m2 = adj.agg(F.count(F.lit(1)).alias("m2"))  # 2m = directed edge ends
    comm = materialize(deg.select("node", F.col("node").alias("c"), "kv"))
    for _ in range(rounds):
        sig = comm.groupBy("c").agg(F.sum("kv").alias("sig"))
        kvc = (
            adj.join(
                comm.select(F.col("node").alias("nbr"),
                            F.col("c").alias("cc")),
                "nbr",
            )
            .groupBy("node", "cc")
            .agg(F.count(F.lit(1)).alias("kvc"))
        )
        own = comm.select("node", F.col("c").alias("cc"),
                          F.lit(0).alias("kvc0"))
        cand = (
            kvc.join(own.select("node", "cc", F.col("kvc0").alias("__o")),
                     ["node", "cc"], "full")
            .select(
                "node", "cc",
                F.coalesce("kvc", F.lit(0)).alias("kvc"),
            )
        )
        scored = (
            cand.join(comm.select("node", F.col("c").alias("own"), "kv"),
                      "node")
            .join(sig, cand["cc"] == sig["c"])
            .crossJoin(F.broadcast(m2))
            .select(
                "node", "own", "kv", "cc",
                (
                    F.col("m2") * F.col("kvc")
                    - F.col("kv")
                    * (F.col("sig")
                       - F.when(F.col("cc") == F.col("own"), F.col("kv"))
                       .otherwise(F.lit(0)))
                ).cast("long").alias("score"),
            )
        )
        w = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("cc"))
        comm = materialize(
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("cc").alias("c"), "kv")
        )
    return comm.select("node", F.col("c").alias("community"))


def config_model_edges(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(edge_id, a, b): a DEGREE-PRESERVING null-model graph — the
    configuration model (Bollobás 1980; Newman SIAM Rev. 2003 §4.1) by
    stub matching: every node contributes deg(v) stubs, the stub list is
    shuffled, consecutive stubs pair into edges. Motif / clustering /
    assortativity measurements only mean something against exactly this
    baseline (same degree sequence, everything else randomized).

    The "shuffle" is the repo's hash order: stubs sort by
    md5(node:i)-prefixed composite keys, so the null graph is a pure
    function of the input (replayable, SQL-replicable). The global stub
    rank uses kgtrain.ranked_entities' range-partition + offset scheme —
    NEVER a single-task global window. Self-loops and multi-edges are
    legitimate configuration-model outcomes and are kept; an odd stub
    (sum of degrees is even for loop-free input, but filtered inputs may
    break that) is dropped.
    """
    from kgspark.kgtrain import ranked_entities

    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    ends = e.select(F.col("s").alias("node")).unionAll(
        e.select(F.col("t").alias("node")))
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    stubs = deg.select(
        "node",
        F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("i"),
    )
    composite = F.concat(
        F.md5(F.concat_ws(":", "node", F.col("i").cast("string"))),
        F.lit("|"), F.col("i").cast("string"), F.lit("|"), F.col("node"),
    )
    ranked, _n = ranked_entities(stubs.select(composite.alias("e")))
    parsed = ranked.select(
        F.regexp_replace("e", r"^[^|]*\|[^|]*\|", "").alias("node"),
        F.expr("__rank div 2").alias("edge_id"),
        (F.col("__rank") % 2).alias("side"),
    )
    return (
        parsed.groupBy("edge_id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(F.when(F.col("side") == 0, F.col("node"))).alias("a"),
            F.max(F.when(F.col("side") == 1, F.col("node"))).alias("b"),
        )
        .where(F.col("__n") == 2)
        .select(F.col("edge_id").cast("long").alias("edge_id"), "a", "b")
    )


def pseudo_diameter(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """One row (seed, far1, ecc1, far2, diameter_lb): the DOUBLE-SWEEP
    diameter lower bound (Magnien, Latapy & Habib, JEA 2009) over the
    undirected graph — BFS from a canonical seed (min node id), hop to
    the farthest node found (ecc1; ties -> min id), BFS again from
    there; the second eccentricity is the classic tight diameter lower
    bound at the cost of TWO BFS sweeps instead of all-pairs. `rounds`
    bounds both sweeps (the k-core/LPA replayability posture; nodes
    beyond `rounds` hops don't register, so the bound is conservative
    on graphs with larger true diameter).

    Scale shape: two k_hop frontier expansions (edge table never
    shuffles — ball-sized frontiers broadcast) + two 1-row argmax
    aggregations. Reference has no analogue (networkx pickle,
    knowledge_graph_builder.py:83-92).
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).where(
        F.col("s") != F.col("t")
    )
    sym = sym.unionAll(
        sym.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    seed = sym.agg(F.min("s").alias("start"))
    b1 = k_hop(sym, seed, k=rounds, src="s", dst="t")
    far1 = (
        b1.orderBy(F.desc("hop"), F.asc("node"))
        .limit(1)
        .select(F.col("node").alias("start"), F.col("hop").alias("ecc1"))
    )
    b2 = k_hop(sym, far1.select("start"), k=rounds, src="s", dst="t")
    far2 = (
        b2.orderBy(F.desc("hop"), F.asc("node"))
        .limit(1)
        .select(F.col("node").alias("far2"),
                F.col("hop").alias("diameter_lb"))
    )
    return (
        seed.crossJoin(far1.select(F.col("start").alias("far1"), "ecc1"))
        .crossJoin(far2)
        .select(
            F.col("start").alias("seed"), "far1",
            F.col("ecc1").cast("long").alias("ecc1"),
            "far2", F.col("diameter_lb").cast("long").alias("diameter_lb"),
        )
    )


def butterfly_pairs(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_u_degree: int = 128,
    k: int = 20,
) -> DataFrame:
    """Butterfly (2x2-biclique) counting in a bipartite graph — the
    bipartite analogue of triangle counting (Wang et al., VLDB 2019
    "Vertex Priority Based Butterfly Counting"): a butterfly is
    (u1,u2,v1,v2) with all four edges present. Returns the top-`k`
    v-side pairs by butterfly count: (v_a, v_b, n_common, n_bf) where
    n_common = |N(v_a) ∩ N(v_b)| over u's and n_bf = C(n_common, 2) —
    exact longs, order (n_bf desc, v_a asc, v_b asc).

    Scale shape: wedges are generated FROM THE U SIDE (pick the side
    whose degree is naturally bounded — e.g. customers with ~constant
    orders each, while a part's customer count grows with corpus
    size), so wedge volume is sum_u C(deg(u), 2): LINEAR in |U| when
    u-degrees are bounded. `max_u_degree` drops hub u's above the cap
    BEFORE the self-join (the winnowing max-df posture); degree-1 u's
    are dropped too (no wedge). The reference has no bipartite
    analytics (its graph is homogeneous, kg_query_engine.py).
    """
    e = edges.select(
        F.col(u_col).alias("__u"), F.col(v_col).alias("__v")
    ).distinct()
    deg = e.groupBy("__u").agg(F.count(F.lit(1)).alias("__d"))
    kept = deg.where(
        (F.col("__d") >= 2) & (F.col("__d") <= F.lit(max_u_degree))
    ).select("__u")
    e2 = materialize(e.join(kept, "__u"))
    a = e2.select("__u", F.col("__v").alias("v_a"))
    b = e2.select("__u", F.col("__v").alias("v_b"))
    wedges = a.join(b, "__u").where(F.col("v_a") < F.col("v_b"))
    pairs = (
        wedges.groupBy("v_a", "v_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= 2)
        .select(
            "v_a", "v_b", "n_common",
            F.expr("n_common * (n_common - 1) div 2").alias("n_bf"),
        )
    )
    return pairs.orderBy(
        F.desc("n_bf"), F.asc("v_a"), F.asc("v_b")
    ).limit(k)


def community_conductance(
    edges: DataFrame,
    assign: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    node_col: str = "node",
    comm_col: str = "label",
) -> DataFrame:
    """Per-community conductance audit (Kannan/Vempala/Vetta 2004; the
    standard community-QUALITY score, complementing the global
    modularity op): for each community C over the undirected graph,
    phi(C) = cut(C) / min(vol(C), 2m - vol(C)) where cut = edges with
    exactly one endpoint in C, vol = sum of member degrees
    (= 2*internal + cut), m = total undirected edges. Low phi = well
    separated; phi_ppm is the truncated-ppm integer ratio, -1 when the
    denominator is 0 (a community spanning the whole labeled graph, or
    edgeless). Returns (comm, n_nodes, internal_edges, cut_edges, vol,
    phi_ppm).

    Scale shape: edges canonicalize once (least/greatest distinct);
    two hash joins stamp endpoint labels; everything after is
    community-keyed groupBys plus a 1-row total broadcast. Edges whose
    endpoint lacks an assignment row are dropped (inner join) — pass a
    complete labeling (e.g. label_propagation output, whose domain is
    exactly the adjacency's).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = assign.select(
        F.col(node_col).alias("n"), F.col(comm_col).alias("c")
    )
    e2 = materialize(
        e.join(lab.withColumnsRenamed({"n": "a", "c": "ca"}), "a")
        .join(lab.withColumnsRenamed({"n": "b", "c": "cb"}), "b")
    )
    m_tot = e2.agg(F.count(F.lit(1)).cast("long").alias("m"))
    internal = (
        e2.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    cut = (
        e2.where(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("comm"))
        .unionAll(e2.where(F.col("ca") != F.col("cb"))
                  .select(F.col("cb").alias("comm")))
        .groupBy("comm")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    base = assign.groupBy(F.col(comm_col).alias("comm")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    joined = (
        base.join(internal, "comm", "left")
        .join(cut, "comm", "left")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "comm", "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).cast("long")
            .alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long")
            .alias("cut_edges"),
            F.col("m"),
        )
        .withColumn(
            "vol",
            (F.lit(2) * F.col("internal_edges") + F.col("cut_edges"))
            .cast("long"),
        )
    )
    return joined.withColumn(
        "__den",
        F.least(F.col("vol"), F.lit(2) * F.col("m") - F.col("vol"))
        .cast("long"),
    ).select(
        "comm", "n_nodes", "internal_edges", "cut_edges", "vol",
        F.when(F.col("__den") > 0,
               F.expr("cut_edges * 1000000L div __den"))
        .otherwise(F.lit(-1)).cast("long").alias("phi_ppm"),
    )


def edge_embeddedness(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Per-edge embeddedness + local bridges (Granovetter 1973; Easley
    & Kleinberg ch. 3): for each undirected edge (a, b), n_common =
    |N(a) ∩ N(b)| — the number of triangles the edge closes — and
    is_bridge = 1 when n_common = 0 (a LOCAL bridge: its endpoints'
    span is > 2, the tie that connects otherwise-distant parts).
    Complements common_neighbors (which scores UNLINKED pairs for link
    prediction); this scores the EDGES, the weak-tie/bottleneck audit.

    Scale shape: one canonical edge distinct, one symmetric adjacency,
    one wedge join driven from the edge list (volume = sum over common
    neighbors n of deg(n)^2, the triangle-counting shape).
    `max_center_degree` optionally drops hub CENTERS before the wedge
    join (cost cap; edges whose only common neighbors are hubs then
    read as bridges — leave None for the exact audit).

    Returns (a, b, n_common, is_bridge) for every undirected edge.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = materialize(
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"),
                           F.col("a").alias("nbr")))
        .distinct()
    )
    if max_center_degree is not None:
        centers = adj.groupBy(F.col("nbr").alias("__c")).agg(
            F.count(F.lit(1)).alias("__d")
        ).where(F.col("__d") <= max_center_degree).select("__c")
        adj = adj.join(centers, adj["nbr"] == F.col("__c")).select(
            "node", "nbr"
        )
    common = (
        e.join(adj.withColumnsRenamed({"node": "a", "nbr": "n"}), "a")
        .join(adj.withColumnsRenamed({"node": "b", "nbr": "n"}),
              ["b", "n"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        e.join(common, ["a", "b"], "left")
        .select(
            "a", "b",
            F.coalesce("n_common", F.lit(0)).cast("long")
            .alias("n_common"),
        )
        .withColumn(
            "is_bridge",
            F.when(F.col("n_common") == 0, 1).otherwise(0).cast("int"),
        )
    )


def powerlaw_fit(
    edges: DataFrame,
    dmin: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Power-law degree-tail MLE (Clauset, Shalizi & Newman 2009, the
    continuous-approximation estimator for discrete data):

        alpha ~= 1 + n / sum_{d_i >= dmin} ln(d_i / (dmin - 1/2))

    over total (undirected) degrees — the scale-free-ness probe of a
    KG/host graph (alpha in [2, 3] = classic heavy tail; alpha large =
    homogeneous degrees). Per-node log terms are quantized to integer
    micro-nats BEFORE the sum (the bm25/ln posture: fp64 ln with an
    identical expression tree both engines, rounded per node), so the
    compared sum is exact; alpha_ppm = 1e6 + n*1e12 div sum (fits a
    long through ~10^6 tail nodes; shard-and-merge the sum beyond).
    Returns one row (dmin, n_tail, sum_ln_ppm, alpha_ppm); empty tail
    -> n_tail 0, sentinel -1.
    """
    if dmin < 1:
        raise ValueError("powerlaw_fit: dmin must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .where(F.col("d") >= dmin)
    )
    ln_ppm = F.round(
        F.log(F.col("d").cast("double") / F.lit(dmin - 0.5)) * 1e6, 0
    ).cast("long")
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(ln_ppm).cast("long").alias("sum_ln_ppm"),
    )
    return agg.select(
        F.lit(dmin).cast("long").alias("dmin"),
        "n_tail",
        F.coalesce("sum_ln_ppm", F.lit(0)).cast("long")
        .alias("sum_ln_ppm"),
        F.when(
            F.coalesce("sum_ln_ppm", F.lit(0)) > 0,
            F.lit(1000000)
            + F.expr("n_tail * 1000000000000L div sum_ln_ppm"),
        ).otherwise(F.lit(-1)).cast("long").alias("alpha_ppm"),
    )


def rich_club(
    edges: DataFrame,
    ks: tuple[int, ...] = (1, 2, 4, 8, 16),
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004; Colizza 2006):
    for each threshold k, the density of the subgraph induced by nodes
    of degree > k — phi(k) = 2*E_k / (N_k*(N_k-1)). A rising phi(k)
    curve means hubs preferentially interconnect (the elite-core
    signature of web/citation graphs); flat-or-falling means hubs
    fan out to the periphery (typical KG star topology). Raw counts
    returned so the (uncorrected) coefficient is exact:
    (k, n_nodes, n_edges, phi_ppm), phi_ppm = 2e6*E div N*(N-1),
    sentinel -1 when N < 2.

    Scale shape: degrees once, edge endpoint degrees stamped via two
    hash joins; every edge contributes to all thresholds below
    min(deg_a, deg_b) through one explode over the PINNED k list —
    one pass, no per-k subgraph materialization.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError("rich_club: thresholds must be >= 1")
    klist = sorted(set(int(k) for k in ks))
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = materialize(e)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    karr = F.array([F.lit(k) for k in klist])
    nodes_k = (
        deg.select("d", F.explode(karr).alias("k"))
        .where(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    ed = (
        e.join(deg.withColumnsRenamed({"node": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "d": "db"}), "b")
        .select(F.least("da", "db").alias("md"))
        .select(F.explode(karr).alias("k"), "md")
        .where(F.col("md") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    base = nodes_k.join(ed, "k", "left").select(
        F.col("k").cast("long").alias("k"),
        "n_nodes",
        F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
    )
    return base.select(
        "k", "n_nodes", "n_edges",
        F.when(
            F.col("n_nodes") >= 2,
            F.expr("2000000L * n_edges div (n_nodes * (n_nodes - 1))"),
        ).otherwise(F.lit(-1)).cast("long").alias("phi_ppm"),
    )


def luby_mis(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Maximal independent set by Luby's algorithm (Luby 1986) with
    deterministic md5 priorities.

    Round r: an active node joins the MIS iff its priority md5(node) is
    strictly below every ACTIVE neighbor's priority (or it has no active
    neighbor left); the joined nodes and their neighbors then deactivate.
    md5 is injective on distinct labels in practice, so priorities form a
    strict total order and the per-round selection is provably
    independent: on any edge only the smaller-priority endpoint can win.
    Bounded `rounds` is the pinned-iteration posture shared with
    k-core/LPA — with (effectively random) hash priorities the active
    set shrinks geometrically, and anything still active after the last
    round reports 'unresolved' rather than guessing; both engines unroll
    the identical rounds so the output is replicable. The reference's
    networkx layer (/root/reference/knowledge_graph_builder.py) has no
    independent-set surface; MIS is the classic distributed symmetry-
    breaking primitive (graph coloring seeds, parallel scheduling,
    landmark selection).

    Emits (node, state in {'mis','covered','unresolved'}, rnd) — the
    round a node was decided, -1 for unresolved.

    Scale shape: each round is two node-keyed hash joins (active-edge
    restriction), one partial-agg min per node, and two left_anti
    deactivations — state is node/edge-table sized and shrinks
    monotonically; no per-node loops, no collect.
    """
    und = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    active = materialize(
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("p", F.md5("node"))
    )
    out = None
    for r in range(rounds):
        nb = (
            und.join(
                active.select(F.col("node").alias("a")), "a"
            )
            .join(
                active.select(
                    F.col("node").alias("b"), F.col("p").alias("pb")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("pb").alias("minp"))
        )
        mis_r = materialize(
            active.join(nb, "node", "left")
            .where(F.col("minp").isNull() | (F.col("p") < F.col("minp")))
            .select("node")
        )
        covered = materialize(
            und.join(mis_r.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"))
            .distinct()
            .join(active.select("node"), "node", "left_semi")
            .join(mis_r, "node", "left_anti")
        )
        inc = mis_r.select(
            "node", F.lit("mis").alias("state"),
            F.lit(r).cast("int").alias("rnd"),
        ).unionByName(
            covered.select(
                "node", F.lit("covered").alias("state"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        out = inc if out is None else out.unionByName(inc)
        active = materialize(
            active.join(mis_r, "node", "left_anti")
            .join(covered, "node", "left_anti")
        )
        if active.isEmpty():
            break
    leftover = active.select(
        "node", F.lit("unresolved").alias("state"),
        F.lit(-1).cast("int").alias("rnd"),
    )
    return out.unionByName(leftover)


def eigenvector_centrality(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded power-iteration eigenvector centrality in exact integer
    ppm over the undirected view of the edge table.

    x_0(v) = 1e6; each round computes x'(v) = Σ_{u~v} x(u) and
    renormalizes x ← (x' · 1e6) div max(x') — the max-norm power
    iteration, kept cross-engine exact by doing the normalization as a
    nonnegative integer floor division instead of fp64 (the same
    integer-ppm posture as katz_centrality/harmonic). Unlike PageRank
    there is no damping, teleport, or out-degree division: a node's
    score is driven purely by its neighbors' scores, the classic
    "important friends make you important" recursion (Bonacich 1987).
    Bounded `rounds` is the pinned-iteration posture — the iterate is a
    deterministic function of the graph, unrolled identically in the
    DuckDB oracle. The reference's networkx layer has no centrality
    surface (/root/reference/knowledge_graph_builder.py).

    Emits (node, eigen_ppm) with eigen_ppm in [0, 1e6]; the max-degree
    core saturates at 1e6.

    Scale shape: each round is one node-keyed hash join + partial-agg
    sum, plus a 1-row max aggregate broadcast back via crossJoin (the
    dangling-mass pattern from pagerank) — never a driver collect.
    Scores stay ≤ 1e6 after every normalization, so the pre-norm sums
    are bounded by degree·1e12 — 64-bit safe up to ~9M-degree hubs
    (document wider units beyond that).
    """
    und = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = materialize(und.select(F.col("a").alias("node")).distinct())
    x = nodes.withColumn("v", F.lit(1_000_000).cast("long"))
    for _r in range(rounds):
        raw = (
            und.join(
                x.select(F.col("node").alias("a"), F.col("v").alias("w")),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("w").cast("long").alias("raw"))
        )
        xs = nodes.join(raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(0)).cast("long").alias("raw")
        )
        mx = xs.agg(F.max("raw").alias("mx"))
        x = materialize(
            xs.crossJoin(F.broadcast(mx)).select(
                "node",
                F.expr("(raw * 1000000L) div mx").cast("long").alias("v"),
            )
        )
    return x.select("node", F.col("v").alias("eigen_ppm"))


def graphlet_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Small-graphlet census of the undirected simple graph: node/edge
    counts, wedges (2-paths), claws (3-stars), triangles, 3-edge paths
    and 4-cycles — the classical motif signature (Pržulj 2007
    graphlets; Ahmed et al. 2015 PGD counts the same family with the
    same combinatorial identities). Everything beyond triangles is
    CLOSED-FORM over degrees, edge-degree products and co-degrees, so
    nothing ever materializes a 4-node tuple:

      wedges    = Σ_v C(d_v, 2)
      claws     = Σ_v C(d_v, 3)
      triangles = ordered 3-join a<b<c
      p3        = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·triangles
      c4        = (Σ_{u<w} C(codeg(u,w), 2)) / 2   (each cycle has two
                  diagonals; the sum is provably even)

    All exact 64-bit integers. The reference's networkx layer has no
    motif surface (/root/reference/knowledge_graph_builder.py).

    Emits (metric, value) rows: n_nodes, n_edges, wedges, claws,
    triangles, p3, c4.

    Scale shape: degrees are one partial-agg groupBy; triangles join
    ordered adjacency (the standard compact-forward shape); the
    co-degree pass generates each center's neighbor pairs — the same
    wedge shuffle as butterfly_pairs, whose volume is Σ C(d_v,2): on
    hub-skewed graphs cap or salt the hot centers before calling (the
    butterflies docstring's bounded-degree-side rule).
    """
    und = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = materialize(
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e_lt = materialize(und.where(F.col("a") < F.col("b")))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("v"))
    n_edges = e_lt.agg(F.count(F.lit(1)).cast("long").alias("v"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("v")
    )
    claws = deg.agg(
        F.sum(F.expr("d * (d - 1) * (d - 2) div 6")).cast("long").alias("v")
    )
    tri = (
        e_lt.alias("e1")
        .join(
            e_lt.select(
                F.col("a").alias("b"), F.col("b").alias("c")
            ).alias("e2"),
            "b",
        )
        .join(
            e_lt.select(
                F.col("a").alias("a"), F.col("b").alias("c")
            ).alias("e3"),
            ["a", "c"],
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    edge_dd = (
        e_lt.join(deg.withColumnsRenamed({"node": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "d": "db"}), "b")
        .agg(
            F.sum(F.expr("(da - 1) * (db - 1)")).cast("long").alias("v")
        )
    )
    codeg = (
        und.alias("l")
        .join(
            und.select(
                F.col("a").alias("a"), F.col("b").alias("w")
            ).alias("r"),
            "a",
        )
        .where(F.col("b") < F.col("w"))
        .groupBy("b", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("v"))
    )

    def tag(df, name):
        return df.select(F.lit(name).alias("metric"),
                         F.coalesce("v", F.lit(0)).alias("v"))

    t = tri
    base = (
        tag(n_nodes, "n_nodes")
        .unionByName(tag(n_edges, "n_edges"))
        .unionByName(tag(wedges, "wedges"))
        .unionByName(tag(claws, "claws"))
        .unionByName(tag(t, "triangles"))
        .unionByName(tag(edge_dd, "edge_dd"))
        .unionByName(tag(codeg, "codeg_pairs"))
    )
    # derive p3 and c4 from the raw sums via a tiny pivot (7-row table)
    wide = base.groupBy().pivot(
        "metric",
        ["n_nodes", "n_edges", "wedges", "claws", "triangles",
         "edge_dd", "codeg_pairs"],
    ).agg(F.first("v"))
    return wide.selectExpr(
        "stack(7, "
        "'n_nodes', n_nodes, 'n_edges', n_edges, 'wedges', wedges, "
        "'claws', claws, 'triangles', triangles, "
        "'p3', edge_dd - 3 * triangles, "
        "'c4', codeg_pairs div 2) AS (metric, value)"
    ).select("metric", F.col("value").cast("long").alias("value"))


def salsa(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded SALSA (Lempel & Moran 2000) in exact integer ppm — the
    random-walk counterpart of HITS (kgspark.graph_algs.hits): where
    HITS sums raw neighbor scores and L1-normalizes, SALSA divides each
    contribution by the contributor's degree (a backward-forward random
    walk on the bipartite hub/authority view), which is the variant
    that resists tightly-knit-community score capture and powers
    link-recommendation systems (Twitter WTF, Goel et al. 2015).

      a_k(t) = Σ_{s→t} h_{k-1}(s) div outdeg(s)
      h_k(s) = Σ_{s→t} a_k(t)     div indeg(t)

    Per-contributor floor division is the pinned integer posture (the
    katz/harmonic per-k div): mass leaks ≤1 ppm per contributor per
    round, deterministically and identically in the unrolled DuckDB
    oracle — no fp, no normalization step needed because the walk is
    already stochastic. h_0 = 1e6 on every hub (node with out-edges); a
    node can be both hub and authority and then carries two rows.

    Emits (node, side ∈ {'hub','auth'}, score_ppm) after `rounds`
    full back-and-forth rounds.

    Scale shape: per round two node-keyed hash joins + partial-agg
    sums, state is node-table sized; degree tables are computed once.
    """
    e = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .distinct()
    )
    od = materialize(
        e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("od"))
    )
    ind = materialize(
        e.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("id"))
    )
    h = od.select("s", F.lit(1_000_000).cast("long").alias("h"))
    a = None
    for _k in range(rounds):
        a = materialize(
            e.join(h, "s").join(od, "s")
            .groupBy("t")
            .agg(F.sum(F.expr("h div od")).cast("long").alias("a"))
        )
        h = materialize(
            e.join(a, "t").join(ind, "t")
            .groupBy("s")
            .agg(F.sum(F.expr("a div id")).cast("long").alias("h"))
        )
    return (
        h.select(F.col("s").alias("node"), F.lit("hub").alias("side"),
                 F.col("h").alias("score_ppm"))
        .unionByName(
            a.select(F.col("t").alias("node"),
                     F.lit("auth").alias("side"),
                     F.col("a").alias("score_ppm"))
        )
    )


def attribute_assortativity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Categorical attribute assortativity (Newman 2003, "Mixing
    patterns in networks") as an exact rational — the homophily gauge
    that answers "do nodes link to their own kind?" for ANY label
    column (community ids, inferred types, domains), where
    degree_assortativity answers it only for degree. With directed
    label-pair counts E_ij, row/column sums A_i/B_j and m edges:

        r = (m·ΣE_ii − ΣA_i·B_i) / (m² − ΣA_i·B_i)

    multiplied out and evaluated in DECIMAL(38,0) — m·trace and m²
    are O(m²), so 64-bit longs overflow near m ≈ 3e6 edges; decimal
    widening keeps the rational exact to m ≈ 10¹⁶ (the DuckDB oracle
    mirrors with HUGEINT); r_ppm truncates toward zero identically in
    both engines (negative r = disassortative). A graph whose labels make the
    denominator 0 (all mass on one label) reports the -2e6 sentinel:
    r is undefined, not 1.

    Emits 1 row (m, trace_cnt, sum_ab, r_ppm).

    Scale shape: one labels join per endpoint (node-keyed), a
    label-pair groupBy whose state is |labels|², then label-sized
    aggregates — the mixing matrix never exceeds label-vocabulary
    size, so the reduction is sketch-small regardless of edge count.
    """
    la = labels.select(
        F.col(node_col).alias("__s"), F.col(label_col).alias("la"))
    lb = labels.select(
        F.col(node_col).alias("__t"), F.col(label_col).alias("lb"))
    pair = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__t"))
        .join(la, "__s").join(lb, "__t")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pair = materialize(pair)
    tot = pair.agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("trace_cnt"),
    )
    a = pair.groupBy("la").agg(F.sum("c").cast("long").alias("ai"))
    b = pair.groupBy("lb").agg(F.sum("c").cast("long").alias("bi"))
    ab = (
        a.join(b, a["la"] == b["lb"])
        .agg(F.coalesce(F.sum(F.expr("ai * bi")), F.lit(0))
             .cast("long").alias("sum_ab"))
    )
    return tot.crossJoin(F.broadcast(ab)).select(
        "m", "trace_cnt", "sum_ab",
        F.when(
            F.expr("cast(m as decimal(38,0)) * m - sum_ab") != 0,
            F.expr(
                "cast((1000000 * (cast(m as decimal(38,0)) * trace_cnt"
                " - sum_ab)) div (cast(m as decimal(38,0)) * m"
                " - sum_ab) as long)"),
        ).otherwise(F.lit(-2_000_000)).cast("long").alias("r_ppm"),
    )


def _bounded_reach(e: DataFrame, seed: DataFrame, max_hops: int):
    """Set of nodes reachable from `seed` over (s, t) edges within
    max_hops — frontier BFS with a visited left_anti, seed included."""
    visited = materialize(seed.select("node").distinct())
    frontier = visited
    for _ in range(max_hops):
        nxt = materialize(
            e.join(frontier.withColumnRenamed("node", "s"), "s")
            .select(F.col("t").alias("node")).distinct()
            .join(visited, "node", "left_anti")
        )
        if nxt.isEmpty():
            break
        visited = materialize(visited.unionByName(nxt))
        frontier = nxt
    return visited


def bowtie_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peel: int = 20,
    max_hops: int = 16,
) -> DataFrame:
    """Bowtie decomposition of a directed graph (Broder et al. 2000,
    "Graph structure in the Web" — THE census of a crawl's link
    graph): CORE = the largest strongly connected component, IN =
    nodes that reach the core, OUT = nodes the core reaches, OTHER =
    the rest (the paper's tendrils/tubes/disconnected, reported as one
    class in this lite taxonomy — splitting them is two more set
    differences over the same reach sets). The IN/OUT volume ratio is
    what tells a crawler whether its frontier seeds are upstream or
    downstream of the web's core.

    Composition of existing primitives: scc() (FW-BW coloring — never
    a transitive closure) picks the core (max size, min scc_id tie
    order), then two bounded frontier BFS passes (forward and over
    reversed edges) classify the rest. Bounded `max_hops` is the
    pinned-iteration posture; the oracle's recursive-CTE closure
    agrees whenever the graph's reach diameter fits the bound (the
    contract synthesis does by construction).

    Emits (node, cls ∈ {'core','in','out','other'}).

    Scale shape: the SCC peel dominates; the two BFS passes are
    node-keyed hash joins with monotonically shrinking frontiers.
    """
    e = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    nodes = materialize(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    comp = scc(e, src="s", dst="t", max_peel=max_peel)
    sizes = comp.groupBy("scc_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    core_row = F.broadcast(
        sizes.orderBy(F.desc("sz"), F.asc("scc_id")).limit(1)
        .select("scc_id")
    )
    core = materialize(
        comp.join(core_row, "scc_id").select("node")
    )
    rev = e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    fwd = _bounded_reach(e, core, max_hops)
    bwd = _bounded_reach(rev, core, max_hops)
    out_set = fwd.join(core, "node", "left_anti")
    in_set = bwd.join(core, "node", "left_anti")
    return (
        nodes.join(core.withColumn("__c", F.lit(1)), "node", "left")
        .join(in_set.withColumn("__i", F.lit(1)), "node", "left")
        .join(out_set.withColumn("__o", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("__c") == 1, "core")
            .when(F.col("__i") == 1, "in")
            .when(F.col("__o") == 1, "out")
            .otherwise("other").alias("cls"),
        )
    )


def clique4_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """K4 (4-clique) and diamond census — the DENSE 4-node motifs
    graphlet_census's closed forms cannot reach (its c4/p3 identities
    count sparse shapes; cliques need one more join level):

      k4       = ordered 4-join a<b<c<d over the triangle list
      diamonds = Σ_{(u,w)∈E} C(codeg(u,w), 2)   (two triangles sharing
                 the edge; non-induced, so a K4 shows up 6× — the
                 standard subgraph-count convention, documented)

    Clique density vs wedge counts is the classic community-quality
    probe (a near-clique region is a candidate tightly-knit community
    — exactly what SALSA/TrustRank call score-capture risk).

    Emits (metric, value) rows: triangles, k4, diamonds.

    Scale shape: triangles via ordered adjacency (compact-forward);
    K4 extends each triangle through the c<d edge list then verifies
    (a,d),(b,d) — join volume is triangle-count × degree, the
    standard k-clique join ladder; diamonds ride the same edge-keyed
    co-degree pass as graphlet_census (hub-cap the wedge side on
    skewed graphs, the butterflies rule).
    """
    und = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e_lt = materialize(und.where(F.col("a") < F.col("b")))
    tri = materialize(
        e_lt.alias("e1")
        .join(
            e_lt.select(F.col("a").alias("b"), F.col("b").alias("c"))
            .alias("e2"),
            "b",
        )
        .join(
            e_lt.select(F.col("a").alias("a"), F.col("b").alias("c"))
            .alias("e3"),
            ["a", "c"],
        )
        .select("a", "b", "c")
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("v"))
    k4 = (
        tri.join(
            e_lt.select(F.col("a").alias("c"), F.col("b").alias("d")),
            "c",
        )
        .join(
            e_lt.select(F.col("a").alias("a"), F.col("b").alias("d")),
            ["a", "d"],
        )
        .join(
            e_lt.select(F.col("a").alias("b"), F.col("b").alias("d")),
            ["b", "d"],
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    diamonds = (
        und.alias("l")
        .join(
            und.select(F.col("a").alias("a"), F.col("b").alias("w"))
            .alias("r"),
            "a",
        )
        .where(F.col("b") < F.col("w"))
        .join(
            e_lt.select(F.col("a").alias("b"), F.col("b").alias("w")),
            ["b", "w"], "left_semi",
        )
        .groupBy("b", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
            .cast("long").alias("v")
        )
    )

    def tag(df, name):
        return df.select(F.lit(name).alias("metric"),
                         F.coalesce("v", F.lit(0)).alias("value"))

    return (
        tag(n_tri, "triangles")
        .unionByName(tag(k4, "k4"))
        .unionByName(tag(diamonds, "diamonds"))
        .select("metric", F.col("value").cast("long").alias("value"))
    )
