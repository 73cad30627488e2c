"""Approximate-nearest-neighbor search over an embedding column.

Three tiers, cheapest plan that meets recall wins:

  brute     exact cosine top-k: broadcast the (small) query set against the
            corpus, JVM-side cosine (zip_with/aggregate), per-query window
            top-k. One pass over the corpus, zero shuffles of the big side
            before the (tiny) top-k aggregation.
  lsh       banded multi-table sign-LSH (kgspark.dedup.banded_sign_values):
            probe the corpus rows sharing ANY band value with the query —
            the 100 TB path when queries are many. Multi-band probing keeps
            recall high while each band's bucket stays tiny (single few-bit
            buckets are n/2^bits-sized all-scans regardless of similarity).
  ivf       KMeans coarse quantizer: corpus partitioned into nlist inverted
            lists; probe the nprobe nearest centroids per query. The standard
            IVF-Flat layout, as DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.dedup import banded_sign_values
from kgspark.embed import cosine_cols, dot_cols, l2_norm
from kgspark.session import materialize


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank")
        )
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, cos, rank). `queries` has
    (query_id, qemb); it is broadcast — the corpus is never shuffled."""
    q = queries.select(
        "query_id", F.col("qemb"), l2_norm(F.col("qemb")).alias("qnrm")
    )
    j = emb.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("e"),
        l2_norm(F.col(emb_col)).alias("nrm"),  # once per vector, not per query pair
    ).crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    scored = j.select(
        "query_id",
        "vec_id",
        F.round(cosine_cols(F.col("e"), F.col("qemb"),
                            na=F.col("nrm"), nb=F.col("qnrm")), 6).alias("cos"),
    )
    return _topk_per_query(scored, k)


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bands: int = 8,
    band_bits: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Banded ANN: candidates = corpus rows sharing >= 1 of the query's band
    values (multi-table probe, deduped per (query, vec)). Same output shape
    as cosine_topk; recall < 1 by design (scale path)."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("e"),
        l2_norm(F.col(emb_col)).alias("nrm"),
        F.posexplode(
            banded_sign_values(F.col(emb_col), bands, band_bits)
        ).alias("band", "val"),
    )
    q = queries.select(
        "query_id", "qemb", l2_norm(F.col("qemb")).alias("qnrm"),
        F.posexplode(
            banded_sign_values(F.col("qemb"), bands, band_bits)
        ).alias("band", "val"),
    )
    j = corpus.join(F.broadcast(q), ["band", "val"])
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    # one row per (query, candidate) no matter how many bands matched
    j = j.dropDuplicates(["query_id", "vec_id"])
    scored = j.select(
        "query_id",
        "vec_id",
        F.round(cosine_cols(F.col("e"), F.col("qemb"),
                            na=F.col("nrm"), nb=F.col("qnrm")), 6).alias("cos"),
    )
    return _topk_per_query(scored, k)


def ivf_fit_assign(
    emb: DataFrame,
    nlist: int = 16,
    emb_col: str = "embedding",
    seed: int = 42,
):
    """Fit the coarse quantizer and assign every vector to its inverted list.
    Returns (assigned_df with `list_id`, centers: list[list[float]])."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn("__f", array_to_vector(F.col(emb_col)))
    model = KMeans(k=nlist, seed=seed, featuresCol="__f", predictionCol="list_id").fit(
        feats
    )
    assigned = model.transform(feats).drop("__f")
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    centers: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe the nprobe closest inverted lists per query, exact cosine inside.

    centers ride along as a broadcast literal (nlist × dim floats — tiny);
    the corpus side is touched only on probed lists (partition-prunable when
    the assigned table is written partitioned by list_id).
    """
    spark = assigned.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "list_id int, cemb array<float>",
    )
    qc = (
        queries.crossJoin(F.broadcast(centers_df))
        .withColumn("cdist", cosine_cols(F.col("qemb"), F.col("cemb")))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("list_id"))
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qemb", l2_norm(F.col("qemb")).alias("qnrm"), "list_id")
    )
    j = assigned.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("e"), "list_id",
        l2_norm(F.col(emb_col)).alias("nrm"),
    ).join(F.broadcast(qc), "list_id")
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    scored = j.select(
        "query_id",
        "vec_id",
        F.round(cosine_cols(F.col("e"), F.col("qemb"),
                            na=F.col("nrm"), nb=F.col("qnrm")), 6).alias("cos"),
    )
    return _topk_per_query(scored, k)


def _adc_luts(book, vec_col: str, m: int, k: int, dsub: int) -> list:
    """Per-query ADC lookup tables (Jégou 2011's asymmetric-distance
    trick): for subspace s, an array of k longs holding
    ‖vec[s·dsub:(s+1)·dsub] − book[s][c]‖² for every centroid c —
    computed once per query row (the broadcast side), so scoring a
    candidate costs m element_at's instead of m·dsub multiply-adds, and
    the m·k·dsub codebook literals never enter the per-pair codegen tree
    (the r3-measured 8-10 s whole-stage-codegen compile came from
    exactly that tree)."""

    def lut(s: int):
        cb = F.array(*[
            F.array(*[F.lit(v).cast("long") for v in book[s][c]])
            for c in range(k)
        ])
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        return F.transform(
            cb,
            lambda cent: F.aggregate(
                F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ).alias(f"lut_{s}")

    return [lut(s) for s in range(m)]


def _adc_dist(m: int):
    """Σ_s lut_s[code_s] — the per-candidate ADC given LUT columns."""
    dist = F.lit(0).cast("long")
    for s in range(m):
        dist = dist + F.element_at(
            F.col(f"lut_{s}"), (F.col(f"code_{s}") + 1).cast("int")
        )
    return dist


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
    in_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "pq",
) -> DataFrame:
    """IVF-PQ-style asymmetric distance search (Jégou et al. 2011): the
    corpus is represented ONLY by its PQ codes (m small ints per vector —
    the 32×-compressed layout billion-scale ANN actually stores); each
    query keeps its exact vector and scores a candidate as

        dist(q, x) = Σ_s ‖q_s − centroid_s[code_s(x)]‖²   (ADC)

    Returns (query_id, vec_id, dist, rank) — top-k per query by
    (dist asc, vec_id asc). All arithmetic is exact integer micro-units
    (same quantization as pq_assign), so ranks are engine-independent.

    Shape: corpus → codes is map-only (pq_assign); the query side is a
    broadcast crossJoin (queries are few). The ADC uses the classic
    per-query LOOKUP TABLE: ‖q_s − centroid_s[c]‖² is computed ONCE per
    (query, subspace, centroid) on the broadcast side (m arrays of k
    longs per query), so the per-pair work is m element_at's + adds —
    not m·dsub multiply-adds — and the big codebook literals never enter
    the per-pair codegen tree. No Python, no shuffle of the corpus; the
    only shuffle is the per-query top-k window over scored rows. At
    scale the codes table is what you persist; re-scoring never touches
    the original vectors.
    """
    from kgspark.embed import pq_assign, pq_codebook

    if in_dim % m != 0:
        raise ValueError("pq_topk: in_dim must be divisible by m")
    dsub = in_dim // m
    book = pq_codebook(m, n_centroids, dsub, seed)
    coded = pq_assign(
        corpus, vec_col=vec_col, m=m, k=n_centroids, in_dim=in_dim,
        seed=seed,
    ).select(
        F.col(id_col).alias("vec_id"),
        *[f"code_{s}" for s in range(m)],
    )
    qmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), qmic.alias("__q")
    )
    q = q.select("query_id", *_adc_luts(book, "__q", m, n_centroids, dsub))
    pairs = coded.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    dist = _adc_dist(m)
    scored = pairs.select(
        "query_id", "vec_id", dist.cast("long").alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist",
                F.col("rank").cast("long").alias("rank"))
    )


def ivfpq_index(
    emb: DataFrame,
    nlist: int = 8,
    m: int = 8,
    n_centroids: int = 16,
    in_dim: int = 64,
    coarse_rounds: int = 2,
    pq_rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coarse_seed: str = "ivf",
    pq_seed: str = "pq",
):
    """Build the persistable half of :func:`ivfpq_topk`: train the
    coarse quantizer and the residual product codebook, then emit the
    codes table (vec_id, list_id, code_0..code_{m-1}) plus the two
    trained books. Write the codes with
    ``write_table(codes, base, name, partition_cols=["list_id"])`` and
    every later :func:`ivfpq_probe` with ``prune_lists=True`` scans
    only the nprobe probed partitions — the on-disk layout the
    docstring of ivfpq_topk promises (layout + plan proven in
    tests/test_similarity.py).

    Returns (codes, coarse, book)."""
    from kgspark.embed import pq_assign, train_pq_codebook
    from kgspark.session import materialize

    if in_dim % m != 0:
        raise ValueError("ivfpq_index: in_dim must be divisible by m")

    coarse = train_pq_codebook(
        emb, vec_col=vec_col, m=1, k=nlist, in_dim=in_dim,
        rounds=coarse_rounds, seed=coarse_seed,
    )[0]
    coarse_lit = F.array(*[
        F.array(*[F.lit(v).cast("long") for v in c]) for c in coarse
    ])

    vmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    cdists = F.transform(coarse_lit, lambda cent: _sq_l2i(F.col("__v"), cent))
    assigned = (
        emb.select(F.col(id_col).alias("vec_id"), vmic.alias("__v"))
        .withColumn(
            "list_id",
            (F.array_position(cdists, F.array_min(cdists)) - 1).cast("int"),
        )
        .withColumn(
            "res",
            F.zip_with(
                F.col("__v"),
                F.element_at(coarse_lit, F.col("list_id") + 1),
                lambda a, b: a - b,
            ),
        )
        .drop("__v")
    )
    assigned = materialize(assigned)
    book = train_pq_codebook(
        assigned, vec_col="res", m=m, k=n_centroids, in_dim=in_dim,
        rounds=pq_rounds, seed=pq_seed, pre_quantized=True,
    )
    coded = pq_assign(
        assigned, vec_col="res", m=m, k=n_centroids, in_dim=in_dim,
        book=book, pre_quantized=True,
    ).select("vec_id", "list_id", *[f"code_{s}" for s in range(m)])
    return coded, coarse, book


def ivfpq_probe(
    codes: DataFrame,
    coarse: list,
    book: list,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    m: int = 8,
    n_centroids: int = 16,
    in_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    prune_lists: bool = False,
) -> DataFrame:
    """Query half of :func:`ivfpq_topk` over a (possibly persisted)
    codes table from :func:`ivfpq_index`. With ``prune_lists=True``
    the distinct probed list_ids (a bounded driver set: at most nlist
    values, independent of corpus size) are applied as a LITERAL
    ``list_id IN (...)`` filter on the codes scan — when the codes
    table was written partitioned by list_id, that filter is a static
    PartitionFilter and the scan reads only the nprobe probed
    partitions of a 100 TB index. Results are identical either way
    (the broadcast join on list_id already restricts logically);
    pruning changes only what the scan touches."""
    dsub = in_dim // m
    coarse_lit = F.array(*[
        F.array(*[F.lit(v).cast("long") for v in c]) for c in coarse
    ])
    qmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), qmic.alias("__q"))
        .select(
            "query_id", "__q",
            F.posexplode(coarse_lit).alias("list_id", "cent"),
        )
        .withColumn("cdist", _sq_l2i(F.col("__q"), F.col("cent")))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("cdist"), F.asc("list_id")
                )
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select(
            "query_id", "list_id",
            F.zip_with("__q", "cent", lambda a, b: a - b).alias("qres"),
        )
    )
    probes = probes.select(
        "query_id", "list_id",
        *_adc_luts(book, "qres", m, n_centroids, dsub),
    )
    if prune_lists:
        probed_ids = sorted({
            r.list_id for r in probes.select("list_id").distinct().collect()
        })
        codes = codes.where(F.col("list_id").isin(probed_ids))
    j = codes.join(F.broadcast(probes), "list_id")
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    dist = _adc_dist(m)
    scored = j.select("query_id", "vec_id", dist.cast("long").alias("dist"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist",
                F.col("rank").cast("long").alias("rank"))
    )


def _sq_l2i(a, b):
    """Exact integer squared L2 between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_centroids: int = 16,
    in_dim: int = 64,
    coarse_rounds: int = 2,
    pq_rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coarse_seed: str = "ivf",
    pq_seed: str = "pq",
    exclude_self: bool = True,
) -> DataFrame:
    """Composed IVF-PQ: the billion-scale ANN layout of Jégou et al. 2011 —
    a TRAINED coarse quantizer partitions the corpus into nlist inverted
    lists, each vector is stored only as the PQ codes of its RESIDUAL
    (vector minus its coarse centroid), and a query probes the nprobe
    nearest lists scoring candidates by asymmetric distance (ADC) between
    the query residual and the candidate's reconstructed residual.

    Both quantizers are trained with bounded-round integer Lloyd
    (kgspark.embed.train_pq_codebook): the coarse one is a single-subspace
    book over the full vector (m=1, k=nlist); the product one is trained on
    residuals. All arithmetic is exact integer micro-units end-to-end, so
    ranks are engine-independent (hash-oracle-able).

    Shape at 100 TB: training touches the corpus `coarse_rounds+pq_rounds`
    times map-side with a m*k-row driver update each round; list assignment,
    residuals and code assignment are map-only JVM expressions (no shuffle
    of the corpus); query probes are a broadcast; the candidate scan is
    list-pruned (join on list_id — partition-prunable when the codes table
    is written partitioned by list_id) and per-candidate work is integer
    table lookups. The only shuffle is the per-query top-k window.

    Returns (query_id, vec_id, dist, rank) — top-k per query by
    (dist asc, vec_id asc), dist in squared integer micro-units.
    """
    coded, coarse, book = ivfpq_index(
        emb, nlist=nlist, m=m, n_centroids=n_centroids, in_dim=in_dim,
        coarse_rounds=coarse_rounds, pq_rounds=pq_rounds,
        vec_col=vec_col, id_col=id_col,
        coarse_seed=coarse_seed, pq_seed=pq_seed,
    )
    return ivfpq_probe(
        coded, coarse, book, queries, k=k, nprobe=nprobe, m=m,
        n_centroids=n_centroids, in_dim=in_dim, vec_col=vec_col,
        id_col=id_col, exclude_self=exclude_self,
    )


def ranking_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    ks=(1, 5, 10),
) -> DataFrame:
    """Retrieval-quality census over a ranked candidate list: ONE row
    (n_queries, sum_rr_ppm, hits_1, hits_5, hits_10, n_no_rel) from
    `ranked(query_id, vec_id, rank)` and `truth(query_id, vec_id)`
    (the relevant pairs). sum_rr_ppm = Σ_q (1e6 div first-relevant-rank)
    — the MRR numerator in exact integer ppm (divide by n_queries
    downstream, in a report, not in the engine); hits_k counts queries
    with a relevant candidate at rank ≤ k; queries whose ranking contains
    NO relevant candidate count in n_no_rel and contribute 0 everywhere
    (the standard "MRR over retrieved" convention, stated explicitly).

    Shape: one semi-join of ranked against truth (both candidate-list-
    sized, k rows per query), one per-query min, one global fold. The
    corpus never appears — this evaluates rankings, it does not produce
    them. Exact integers only.
    """
    rel = ranked.join(
        truth.select("query_id", "vec_id").distinct(),
        ["query_id", "vec_id"],
        "left_semi",
    )
    first = rel.groupBy("query_id").agg(
        F.min("rank").alias("first_rank")
    )
    per_q = (
        ranked.select("query_id").distinct()
        .join(first, "query_id", "left")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.coalesce(
            F.sum(F.expr("1000000 div first_rank")), F.lit(0)
        ).cast("long").alias("sum_rr_ppm"),
    ]
    for k in ks:
        aggs.append(
            F.sum(
                F.when(F.col("first_rank") <= k, 1).otherwise(0)
            ).cast("long").alias(f"hits_{k}")
        )
    aggs.append(
        F.sum(F.when(F.col("first_rank").isNull(), 1).otherwise(0))
        .cast("long").alias("n_no_rel")
    )
    return per_q.agg(*aggs)


def dim_truncation_report(
    emb: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Retrieval quality vs dimension budget — the Matryoshka question
    (Kusupati et al., "Matryoshka Representation Learning", 2022): how
    much exact-search recall@k survives if queries run on only the first
    d components? One row per d in `dims`: (dim, n_truth, hits,
    recall_ppm), where truth is full-dimension exact top-k and hits
    counts truth pairs the d-prefix top-k recovers; recall_ppm is the
    exact-integer ratio. The report is how an embedding-pipeline owner
    picks the serving dimension before building the ANN index
    (kgspark.similarity.ivfpq_topk et al.).

    Scale shape: the truth pass is one broadcast-query exact top-k
    (corpus never shuffled, same as cosine_topk), materialized once;
    each dim adds one map-side prefix-slice + the same broadcast top-k
    + a semi-join against the (queries·k)-sized truth table. Query sets
    are calibration-sized by contract (the bounded-sample posture of
    dedup_recall).
    """
    from kgspark.session import materialize

    truth = materialize(
        cosine_topk(emb, queries, k=k, emb_col=emb_col, id_col=id_col)
        .select("query_id", "vec_id")
    )
    out = None
    for d in sorted(dims):
        e_d = emb.select(
            F.col(id_col), F.slice(F.col(emb_col), 1, d).alias(emb_col)
        )
        q_d = queries.select(
            "query_id", F.slice(F.col("qemb"), 1, d).alias("qemb")
        )
        got = cosine_topk(
            e_d, q_d, k=k, emb_col=emb_col, id_col=id_col
        ).select("query_id", "vec_id")
        hits = got.join(
            truth, ["query_id", "vec_id"], "left_semi"
        ).agg(F.count(F.lit(1)).cast("long").alias("hits"))
        tot = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
        row = tot.crossJoin(hits).select(
            F.lit(d).cast("long").alias("dim"), "n_truth", "hits",
            F.expr("(hits * 1000000) div n_truth").cast("long")
            .alias("recall_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    bands: int = 8,
    band_bits: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = False,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over the corpus: per vector, its top-k
    most cosine-similar peers as (src, dst, cos, rank) edges — the
    substrate for graph-based semantic dedup (SemDeDup-style cluster
    pruning), label propagation over embeddings, and kNN-graph ANN
    indexes. Differs from cosine_topk (bounded external query set) in
    that EVERY corpus vector is a query.

    Default (scale path): candidates come from the banded sign-LSH
    self-join — explode each vector's band values, equi-join on
    (band, value), dedup pairs — so candidate volume tracks near-pair
    density, never n²; recall < 1 by design (more bands/fewer bits raise
    it). ``exact=True`` scores ALL pairs: a deliberate O(n²) cross join
    reserved for bounded calibration samples (the dedup_recall posture —
    the bound belongs in the caller's filter and is the caller's
    contract), where it doubles as the LSH path's recall oracle.

    Per-node top-k is a WindowGroupLimit: capped map-side before the
    final per-node sort.
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("e"),
        l2_norm(F.col(emb_col)).alias("nrm"),
    )
    if exact:
        right = base.select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qemb"),
            F.col("nrm").alias("qnrm"),
        )
        j = base.crossJoin(right).where(
            F.col("vec_id") != F.col("query_id")
        )
    else:
        lhs = base.select(
            "vec_id", "e", "nrm",
            F.posexplode(
                banded_sign_values(F.col("e"), bands, band_bits)
            ).alias("band", "val"),
        )
        rhs = lhs.select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qemb"),
            F.col("nrm").alias("qnrm"),
            "band", "val",
        )
        j = (
            lhs.join(rhs, ["band", "val"])
            .where(F.col("vec_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "vec_id"])
        )
    scored = j.select(
        "query_id", "vec_id",
        F.round(
            cosine_cols(F.col("e"), F.col("qemb"),
                        na=F.col("nrm"), nb=F.col("qnrm")), 6
        ).alias("cos"),
    )
    return _topk_per_query(scored, k).select(
        F.col("query_id").alias("src"),
        F.col("vec_id").alias("dst"),
        "cos", F.col("rank").cast("long").alias("rank"),
    )


def mips_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact maximum-inner-product top-k: (query_id, vec_id, dot, rank).

    MIPS is the retrieval primitive for trained dual-encoder / matrix-
    factorization scorers, where vector NORM carries information (cosine
    search would erase it). Beyond-reference scope: the reference's only
    ANN surface is a dict memo-cache (knowledge_graph_builder.py:94-102);
    design follows the MIPS reduction literature (Bachrach et al., RecSys
    2014; Shrivastava & Li, NIPS 2014).

    Plan shape mirrors cosine_topk: the (small) query set is broadcast
    against the corpus — the big side is never shuffled before the tiny
    per-query top-k window — and the dot product runs JVM-side in fp64.
    """
    q = queries.select("query_id", F.col("qemb"))
    j = emb.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("e")
    ).crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    scored = j.select(
        "query_id", "vec_id",
        F.round(dot_cols(F.col("e"), F.col("qemb")), 6).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot",
                F.col("rank").cast("long").alias("rank"))
    )


def mips_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bands: int = 8,
    band_bits: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate MIPS via the norm-augmentation reduction (Bachrach et
    al., RecSys 2014 / Neyshabur & Srebro, ICML 2015): append coordinate
    sqrt(M^2 - ||x||^2) to each corpus vector (M = max corpus norm) and
    0.0 to each query, so cos(x_aug, q_aug) = <x, q> / (M * ||q||) —
    MONOTONE in the inner product. MIPS then rides the existing banded
    sign-LSH machinery unchanged: candidates = corpus rows sharing any
    band value with the query on the AUGMENTED vectors; survivors are
    re-scored with the EXACT fp64 dot product, so emitted values are
    exact and only recall is approximate (the 100 TB path).

    M is a 1-row scalar aggregate broadcast-crossed onto the corpus (the
    documented scalar-broadcast BNLJ posture — not a data-sized join).
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).cast("array<double>").alias("e"),
    )
    mx = base.agg(
        F.max(l2_norm(F.col("e"))).alias("m")
    )
    corpus = base.crossJoin(F.broadcast(mx)).select(
        "vec_id", "e",
        F.concat(
            F.col("e"),
            F.array(F.sqrt(
                F.greatest(
                    F.col("m") * F.col("m")
                    - F.aggregate(F.col("e"), F.lit(0.0),
                                  lambda acc, x: acc + x * x),
                    F.lit(0.0),
                )
            )),
        ).alias("e_aug"),
    )
    corpus = corpus.select(
        "vec_id", "e",
        F.posexplode(
            banded_sign_values(F.col("e_aug"), bands, band_bits)
        ).alias("band", "val"),
    )
    q = queries.select(
        "query_id",
        F.col("qemb").cast("array<double>").alias("qe"),
    ).select(
        "query_id", "qe",
        F.posexplode(
            banded_sign_values(
                F.concat(F.col("qe"), F.array(F.lit(0.0))),
                bands, band_bits,
            )
        ).alias("band", "val"),
    )
    j = corpus.join(F.broadcast(q), ["band", "val"])
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    j = j.dropDuplicates(["query_id", "vec_id"])
    scored = j.select(
        "query_id", "vec_id",
        F.round(dot_cols(F.col("e"), F.col("qe")), 6).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot",
                F.col("rank").cast("long").alias("rank"))
    )


def sq8_topk(
    codes: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric top-k over int8 scalar-quantized codes (embed.sq8_encode):
    the query stays fp64, each corpus vector is decoded on the fly as
    decoded_j = codes_j * (hi_j - lo_j) / 255 + lo_j, and the estimated
    inner product ranks candidates — the FAISS SQ8 flat search, 4 bytes ->
    1 byte per dim. Map-only over the codes table (stats + queries ride a
    broadcast); all arithmetic is an fp64 expression tree identical to the
    SQL oracle, so scores are bit-deterministic. Returns
    (query_id, vec_id, dot_q, rank)."""
    arrs = stats.orderBy("dim1").agg(
        F.array_sort(
            F.collect_list(F.struct("dim1", "lo", "hi"))
        ).alias("s")
    ).select(
        F.transform("s", lambda t: t["lo"]).alias("lo_arr"),
        F.transform("s", lambda t: t["hi"]).alias("hi_arr"),
    )
    q = queries.select(
        "query_id", F.col("qemb").cast("array<double>").alias("qe")
    )
    j = codes.crossJoin(F.broadcast(arrs)).crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("vec_id") != F.col("query_id"))
    decoded = F.zip_with(
        F.col("codes").cast("array<double>"),
        F.zip_with("lo_arr", "hi_arr", lambda lo, hi: F.struct(
            lo.alias("lo"), hi.alias("hi"))),
        lambda c, s: c * (s["hi"] - s["lo"]) / F.lit(255.0) + s["lo"],
    )
    scored = j.select(
        "query_id", "vec_id",
        F.round(
            F.aggregate(
                F.zip_with(decoded, F.col("qe"), lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
            6,
        ).alias("dot_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot_q",
                F.col("rank").cast("long").alias("rank"))
    )


def mmr_rerank(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    pool: int = 10,
    lam_tenths: int = 7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversity stage of a RAG retriever: greedily pick
    k results from the top-`pool` cosine candidates, each step scoring

        score = lam * cos(q, d) - (1 - lam) * max_{s in picked} cos(d, s)

    lam is passed in TENTHS (7 -> 0.7) so the score is the exact
    integer lam_tenths * cos_ppm - (10 - lam_tenths) * maxsim_ppm over
    ppm-quantized cosines — no fp64 in any compared value, ties broken
    by vec_id (the kgtrain determinism posture).

    Scale shape: the pool is bounded per query by construction, so the
    in-pool pairwise cosine table is |Q| * pool² rows (tiny), computed
    ONCE; each of the k greedy rounds is an anti-join + left-join +
    per-query argmax window over <= pool rows per query. The corpus is
    touched only by the initial cosine_topk (broadcast queries, no
    corpus shuffle). Returns (query_id, vec_id, pick_no, score_num).
    """
    if not 0 <= lam_tenths <= 10:
        raise ValueError("lam_tenths must be in [0, 10]")
    cands = materialize(
        cosine_topk(emb, queries, k=pool, emb_col=emb_col, id_col=id_col)
        .select(
            "query_id", "vec_id",
            F.round(F.col("cos") * 1e6, 0).cast("long").alias("cos_ppm"),
        )
    )
    vecs = emb.select(F.col(id_col).alias("vid"),
                      F.col(emb_col).alias("e"),
                      l2_norm(F.col(emb_col)).alias("nrm"))
    a = cands.select("query_id", F.col("vec_id").alias("da")).join(
        vecs.withColumnsRenamed({"vid": "da", "e": "ea", "nrm": "na"}), "da")
    b = cands.select("query_id", F.col("vec_id").alias("db")).join(
        vecs.withColumnsRenamed({"vid": "db", "e": "eb", "nrm": "nb"}), "db")
    pairs = materialize(
        a.join(b, "query_id")
        .where(F.col("da") != F.col("db"))
        .select(
            "query_id", "da", "db",
            F.round(
                F.round(cosine_cols(F.col("ea"), F.col("eb"),
                                    na=F.col("na"), nb=F.col("nb")), 6)
                * 1e6, 0,
            ).cast("long").alias("pair_ppm"),
        )
    )
    lam = F.lit(lam_tenths).cast("long")
    lam_c = F.lit(10 - lam_tenths).cast("long")
    picked = None
    remaining = cands
    out = None
    w = Window.partitionBy("query_id")
    for step in range(1, k + 1):
        if picked is None:
            scored = remaining.select(
                "query_id", "vec_id", "cos_ppm",
                (lam * F.col("cos_ppm")).alias("score_num"),
            )
        else:
            maxsim = (
                pairs.join(
                    picked.select("query_id",
                                  F.col("vec_id").alias("db")),
                    ["query_id", "db"],
                )
                .groupBy("query_id", F.col("da").alias("vec_id"))
                .agg(F.max("pair_ppm").alias("ms"))
            )
            scored = (
                remaining.join(maxsim, ["query_id", "vec_id"], "left")
                .select(
                    "query_id", "vec_id", "cos_ppm",
                    (lam * F.col("cos_ppm")
                     - lam_c * F.coalesce("ms", F.lit(0))).alias("score_num"),
                )
            )
        pick = materialize(
            scored.withColumn(
                "rn",
                F.row_number().over(
                    w.orderBy(F.desc("score_num"), F.asc("vec_id"))),
            )
            .where(F.col("rn") == 1)
            .select("query_id", "vec_id",
                    F.lit(step).cast("long").alias("pick_no"),
                    F.col("score_num").cast("long").alias("score_num"))
        )
        out = pick if out is None else out.unionByName(pick)
        picked = (pick.select("query_id", "vec_id") if picked is None
                  else picked.unionByName(pick.select("query_id", "vec_id")))
        remaining = remaining.join(
            pick.select("query_id", "vec_id"), ["query_id", "vec_id"],
            "left_anti",
        )
    return out


def graph_walk_topk(
    emb: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    hops: int = 4,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "qemb",
) -> DataFrame:
    """Greedy graph-walk ANN search over a kNN graph (the NSW routing
    principle, Malkov et al. 2014 — the single-layer ancestor of HNSW
    and of DiskANN's Vamana search): every query starts at a pinned
    entry point (the global min vector id), and each hop moves to the
    best-cosine node among the current node's graph neighbors; the
    answer is the top-k over EVERYTHING scored along the walk. This is
    the third ANN scale path beside IVF (partition pruning) and PQ
    (compressed scan): the graph localizes the search so each query
    touches O(hops · degree) vectors, not the corpus.

    Determinism contract: scores are round(cos, 6) with (cos desc, id
    asc) tie order (the ann_topk posture); the walk is beam-1 with a
    FIXED hop count — a converged walk re-selects its own node, so
    fixed hops are idempotent and oracle-unrollable (no data-dependent
    early exit). Candidates equal to the query itself are excluded
    from scoring AND routing. Beam > 1 / multi-entry generalize the
    same shape (union more cursors); documented out of the lite scope.

    Emits (query_id, vec_id, cos, rank), rank 1..k per query.

    Scale shape: per hop one edge join (node-keyed) + one embedding
    join + a per-query argmax window over ~degree candidates; the
    query set rides broadcast-sized joins. The kNN graph itself comes
    from knn_graph (banded-LSH at scale).
    """
    from kgspark.embed import cosine_cols, l2_norm
    from kgspark.session import materialize

    base = materialize(
        emb.select(
            F.col(id_col).alias("cand"),
            F.col(emb_col).alias("e"),
            l2_norm(F.col(emb_col)).alias("nrm"),
        )
    )
    q = materialize(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_emb_col).alias("qe"),
            l2_norm(F.col(query_emb_col)).alias("qn"),
        )
    )
    edges = materialize(
        graph.select(F.col("src").alias("cand"), F.col("dst"))
    )
    entry = emb.agg(F.min(F.col(id_col)).alias("cand"))
    cur = materialize(
        q.select("query_id").crossJoin(F.broadcast(entry))
    )
    visited = None
    for _h in range(hops):
        cand = (
            cur.join(edges, "cand")
            .select("query_id", F.col("dst").alias("cand"))
            .unionByName(cur.select("query_id", "cand"))
            .distinct()
            .where(F.col("cand") != F.col("query_id"))
        )
        scored = materialize(
            cand.join(base, "cand")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "cand",
                F.round(
                    cosine_cols(F.col("e"), F.col("qe"),
                                na=F.col("nrm"), nb=F.col("qn")), 6
                ).alias("cos"),
            )
        )
        visited = (
            scored if visited is None else visited.unionByName(scored)
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("cand")
        )
        cur = materialize(
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("query_id", "cand")
        )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("cand")
    )
    return (
        visited.dropDuplicates(["query_id", "cand"])
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("cand").alias("vec_id"), "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )
