"""Embedding stage — dedup-embed-join with a deterministic embedder.

The reference embeds with sentence-transformers all-MiniLM-L6-v2 behind an
exact-text memo cache (ref /root/reference/knowledge_graph_builder.py:53,
94-102, joblib persist :83-92). Torch is neither available in this sandbox nor
sane to cold-load per task at 10^12-doc scale, so the embedder is INJECTED:

  - default: a deterministic feature-hashing embedder (md5 token hashing,
    signed buckets, L2-normalized) — reproducible on any executor, no model
    download, unit-testable;
  - a SentenceTransformer-backed embedder can be swapped in via the same
    `embed_fn` seam when the dependency exists (mapInPandas amortizes model
    load per partition).

The memo-cache becomes the idiomatic Spark pattern (SURVEY.md J4):
  distinct(texts) -> embed UDF -> broadcast hash join back; with a persisted
  cache table, a LEFT ANTI join embeds only never-seen texts (resume path).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, FloatType

DIM = 64  # keep parity with the driver testdata embeddings (64-d)


def hash_embed(text: str, dim: int = DIM) -> list[float]:
    """Deterministic feature-hash embedding: token -> (bucket, sign) via md5,
    accumulate, L2-normalize. Bigrams added so word order matters a little."""
    if not isinstance(text, str):
        return [0.0] * dim
    vec = np.zeros(dim, dtype=np.float64)
    tokens = text.lower().split()
    grams: list[str] = tokens + [a + "_" + b for a, b in zip(tokens, tokens[1:])]
    for g in grams:
        d = hashlib.md5(g.encode("utf-8")).digest()
        bucket = int.from_bytes(d[:4], "big") % dim
        sign = 1.0 if d[4] & 1 else -1.0
        vec[bucket] += sign
    norm = math.sqrt(float((vec * vec).sum()))
    if norm > 0:
        vec /= norm
    return [float(x) for x in vec]


def embed_udf(dim: int = DIM):
    @pandas_udf(ArrayType(FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed(t, dim))

    return _udf


def embed_udf_fp64(dim: int = DIM):
    """fp64 variant: hash_embed's exact values (bucket-count / sqrt(sum of
    squared counts) — pure integer-derived fp64) survive untruncated, making
    the embedder's output bit-reproducible by any fp64 SQL engine."""

    @pandas_udf(ArrayType(DoubleType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed(t, dim))

    return _udf


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    cache: DataFrame | None = None,
    dim: int = DIM,
    fp64: bool = False,
) -> DataFrame:
    """Attach an embedding column with the dedup-embed-join pattern.

    1. distinct(text)                       — the memo-cache as a relational op
    2. anti-join against persisted `cache`  — resume: never re-embed seen text
    3. embed UDF over the (small) novel set
    4. hash join embeddings back onto the full df

    Every join/anti-join is keyed on md5(text), never the raw text: at corpus
    scale the text is a multi-KB string and using it as a shuffle key multiplies
    shuffle width and comparison cost; the 32-char digest carries the same
    equality semantics (md5 collisions are negligible and identical on both
    sides). The text itself stays only on the embed side, projected away before
    the join back.

    `cache` is an optional DataFrame(text, embedding) from a prior run's
    embeddings table (checkpoint manifest decides whether to pass it).
    """
    mk = embed_udf_fp64 if fp64 else embed_udf
    distinct = (
        df.select(F.col(text_col).alias("__t"))
        .where(F.col("__t").isNotNull())
        .distinct()
        .withColumn("__th", F.md5(F.col("__t")))
    )
    if cache is not None:
        cached = cache.select(
            F.md5(F.col(text_col)).alias("__th"), F.col(out_col).alias("__e")
        )
        novel = distinct.join(cached, "__th", "left_anti")
        embedded = (
            novel.withColumn("__e", mk(dim)(F.col("__t")))
            .select("__th", "__e")
            .unionByName(cached)
        )
    else:
        embedded = distinct.select(
            "__th", mk(dim)(F.col("__t")).alias("__e")
        )
    # Embedding table is tiny relative to the corpus (distinct texts) but can
    # still be large at scale — let AQE pick broadcast vs shuffle; hint
    # broadcast only below a conservative row bound is unnecessary complexity.
    return (
        df.withColumn("__th", F.md5(F.col(text_col)))
        .join(embedded, "__th", "left")
        .drop("__th")
        .withColumnRenamed("__e", out_col)
    )


def l2_norm(a):
    """||a||_2 for an array<float|double> column, fp64, JVM-side."""
    a = a.cast("array<double>")
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def dot_cols(a, b):
    """fp64 dot product of two array columns, JVM-side."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_cols(a, b, na=None, nb=None):
    """cos(a, b) for two array<float|double> columns, JVM-side (no Python
    crossing): zip_with product -> aggregate sum, divided by norms. Inputs are
    cast to fp64 FIRST so per-element products match any fp64 oracle engine
    bit-for-bit (float*float would round each product to fp32).

    In pairwise joins pass precomputed norm COLUMNS as na/nb (one l2_norm
    projection per side before the join) — otherwise each candidate pair
    re-aggregates both arrays, tripling the per-pair array passes."""
    if na is None:
        na = l2_norm(a)
    if nb is None:
        nb = l2_norm(b)
    return dot_cols(a, b) / (na * nb)


def rproj_signs(out_dim: int, in_dim: int, seed: str = "rp") -> list:
    """Deterministic ±1 Rademacher sign matrix for signed random
    projection, derived from md5 so ANY engine (or the SQL oracle) can
    reproduce it: sign[j][i] = +1 if the first md5 nibble of
    f"{seed}:{j}:{i}" is even else -1. Achlioptas (JACM 2003) shows ±1
    entries satisfy the Johnson–Lindenstrauss lemma with the same
    distortion bounds as Gaussian projections — no float RNG needed."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def signed_random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    in_dim: int = 64,
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a ±1 sign
    matrix: out[j] = Σ_i sign[j][i] · v[i], emitted as exact integer
    micro-units. Each input element is quantized ONCE
    (round(v·1e6) as long) and then only multiplied by ±1 and summed —
    pure integer arithmetic after the single rounding, so the result is
    bit-identical on any engine and any partition order (the repo fp64
    parity rule, applied before the sum as always).

    Returns the input row plus `rp_0..rp_{out_dim-1}` long columns.

    Shape: a narrow projection — one transform() to micro-quantize, then
    out_dim JVM-side zip_with/aggregate passes per row; no shuffle, no
    UDF, no Python crossing. At 100 TB this is a map-only stage that
    whole-stage-codegens; the sign matrix is out_dim×in_dim literals in
    the plan (≤ a few KB), not a broadcast."""
    signs = rproj_signs(out_dim, in_dim, seed)
    vmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    out = df.withColumn("__vmic", vmic)
    for j in range(out_dim):
        sj = F.array(*[F.lit(s) for s in signs[j]])
        out = out.withColumn(
            f"rp_{j}",
            F.aggregate(
                F.zip_with("__vmic", sj, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    return out.drop("__vmic")


def pq_codebook(
    m: int = 8, k: int = 16, dsub: int = 8, seed: str = "pq",
    half_range: int = 200000,
) -> list:
    """Deterministic integer PQ codebook: centroid value (micro-units) for
    (subspace s, centroid c, dim d) = hex6(md5(f"{seed}:{s}:{c}:{d}"))
    mod (2·half_range + 1) − half_range. A data-independent codebook is
    the degenerate-but-deterministic end of the PQ spectrum (Jégou et al.
    2011 use k-means; any codebook quantizes, trained ones just quantize
    tighter) — and it makes every assignment reproducible on any engine
    with no training artifact to ship."""
    import hashlib

    span = 2 * half_range + 1
    return [
        [
            [
                int(
                    hashlib.md5(f"{seed}:{s}:{c}:{d}".encode()).hexdigest()[
                        :6
                    ],
                    16,
                )
                % span
                - half_range
                for d in range(dsub)
            ]
            for c in range(k)
        ]
        for s in range(m)
    ]


def _tdiv(a: int, b: int) -> int:
    """Integer division truncated toward zero (Spark `div` / DuckDB `//`
    semantics — Python's `//` floors, which differs on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def train_pq_codebook(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    in_dim: int = 64,
    rounds: int = 2,
    seed: str = "pq",
    half_range: int = 200000,
    pre_quantized: bool = False,
) -> list:
    """Distributed bounded-round Lloyd k-means per subspace over exact
    integer micro-units — the TRAINED codebook of Jégou et al. 2011 §II,
    replacing the data-independent hash init with centroids fitted to the
    corpus (trained codebooks quantize tighter; see pq_codebook docstring).

    Determinism (engine-independent, hash-oracle-able):
      - init = pq_codebook(seed) — a pure function, no RNG state;
      - assignment = exact integer squared-L2 argmin, ties -> lowest
        centroid index;
      - update = per-dimension integer mean, truncated toward zero
        (Spark `div` / DuckDB `//` semantics);
      - empty clusters keep their previous centroid;
      - `rounds` is pinned (bounded-rounds posture, same as k-core/LPA):
        a fixed small round count keeps the result replicable cross-engine
        while capturing most of the k-means distortion drop.

    Shape: ONE map-side job per round — subvectors posexploded once and
    materialized, assignment is a JVM expression over a nested codebook
    literal, the update aggregate returns exactly m*k rows to the driver
    (a few KB). All m subspaces train simultaneously in the same job, so
    the driver loop is `rounds` jobs total, not rounds*m.

    Returns the same nested-list shape as pq_codebook, so trained books
    drop into pq_assign(book=...) / pq_topk unchanged.

    If `pre_quantized`, `vec_col` is already array<long> micro-units
    (e.g. IVF residuals) and the micro-quantization step is skipped.
    """
    if in_dim % m != 0:
        raise ValueError("train_pq_codebook: in_dim must be divisible by m")
    from kgspark.session import materialize

    dsub = in_dim // m
    if pre_quantized:
        vmic = F.col(vec_col)
    else:
        vmic = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * 1000000.0, 0).cast("long"),
        )
    subs = materialize(
        df.select(
            F.posexplode(
                F.array(*[
                    F.slice(vmic, s * dsub + 1, dsub) for s in range(m)
                ])
            ).alias("s", "sub")
        )
    )
    book = pq_codebook(m, k, dsub, seed, half_range)
    for _r in range(rounds):
        cb_lit = F.array(*[
            F.array(*[
                F.array(*[F.lit(v).cast("long") for v in book[s][c]])
                for c in range(k)
            ])
            for s in range(m)
        ])
        cb_s = F.element_at(cb_lit, (F.col("s") + 1).cast("int"))
        dists = F.transform(
            cb_s,
            lambda cent: F.aggregate(
                F.zip_with(F.col("sub"), cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        stats = (
            subs.withColumn("code", code)
            .groupBy("s", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("sub", d + 1)).alias(f"s_{d}")
                    for d in range(dsub)
                ],
            )
            .collect()  # exactly <= m*k rows: the codebook update, not data
        )
        new_book = [[list(book[s][c]) for c in range(k)] for s in range(m)]
        for row in stats:
            new_book[row["s"]][row["code"]] = [
                _tdiv(int(row[f"s_{d}"]), int(row["n"])) for d in range(dsub)
            ]
        book = new_book
    return book


def pq_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    in_dim: int = 64,
    seed: str = "pq",
    book: list | None = None,
    pre_quantized: bool = False,
) -> DataFrame:
    """Product-quantization code assignment: split the vector into `m`
    subvectors, assign each to its nearest codebook centroid (squared L2),
    emit `code_0..code_{m-1}` plus the total quantization distortion.
    PQ codes are the memory layout of billion-scale ANN (IVF-PQ): 64 fp32
    dims become m small ints — 32× smaller — and distance evaluation
    becomes table lookups.

    Determinism: the input is micro-quantized ONCE (round(v·1e6) long);
    centroids are integers by construction; every distance is an exact
    integer sum of squared integer diffs; argmin ties break to the lowest
    centroid index (first position of the min). Bit-identical anywhere.

    Shape: map-only — zip_with/aggregate JVM expressions per (subspace,
    centroid), no shuffle, no UDF, no broadcast (the codebook is plan
    literals, a few KB). Whole-stage codegen handles the m·k expressions.
    """
    if in_dim % m != 0:
        raise ValueError("pq_assign: in_dim must be divisible by m")
    dsub = in_dim // m
    if book is None:
        book = pq_codebook(m, k, dsub, seed)
    if pre_quantized:  # vec_col already array<long> micro-units
        vmic = F.col(vec_col)
    else:
        vmic = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * 1000000.0, 0).cast("long"),
        )
    out = df.withColumn("__vmic", vmic)
    total = F.lit(0).cast("long")
    for s in range(m):
        sub = F.slice("__vmic", s * dsub + 1, dsub)
        dists = []
        for c in range(k):
            cent = F.array(*[F.lit(v).cast("long") for v in book[s][c]])
            dists.append(
                F.aggregate(
                    F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
            )
        arr = F.array(*dists)
        mind = F.array_min(arr)
        out = out.withColumn(
            f"code_{s}",
            (F.array_position(arr, mind) - 1).cast("long"),
        ).withColumn(f"__d_{s}", mind)
        total = total + F.col(f"__d_{s}")
    out = out.withColumn("distortion", total.cast("long"))
    return out.drop("__vmic", *[f"__d_{s}" for s in range(m)])


def label_prototypes(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    in_dim: int = 64,
) -> DataFrame:
    """Per-label class prototypes as exact integers: (label, n_vecs,
    proto) where proto is the per-dimension FLOOR-mean in micro-units
    (Σ round(v·1e6) div n — quantize once, integer sums, integer
    division; bit-identical on any engine and partitioning). The
    nearest-class-mean layout behind cheap few-shot classifiers and
    label-quality audits over embedding tables.

    Shape: one map-side-combined groupBy on label; in_dim sum aggregates
    over a dimension-sized result. No shuffles of the corpus beyond the
    label groupBy."""
    vmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    base = df.where(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(label_col).alias("label"), vmic.alias("__v"))
    sums = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        *[
            F.sum(F.element_at("__v", d + 1)).alias(f"__s{d}")
            for d in range(in_dim)
        ],
    )
    proto = F.array(
        *[F.expr(f"__s{d} div n_vecs").cast("long") for d in range(in_dim)]
    )
    return sums.select("label", "n_vecs", proto.alias("proto"))


def prototype_eval(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    in_dim: int = 64,
) -> DataFrame:
    """Nearest-class-mean accuracy census: assign every vector to its
    nearest label prototype (exact integer squared-L2 in micro-units,
    ties to the lowest label) and compare with the true label — ONE row
    (n_total, n_correct, acc_ppm). The 5-second answer to "are these
    labels/embeddings coherent at all?" before anyone trains a probe.

    Shape: prototypes are dimension-sized ⇒ broadcast crossJoin; the
    per-(vector, label) distance is a JVM zip_with/aggregate; one
    per-vector argmin via min_by struct ordering, one global fold.
    """
    protos = label_prototypes(df, vec_col, label_col, in_dim)
    vmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    base = df.where(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("true_label"),
        vmic.alias("__v"),
    )
    pairs = base.crossJoin(
        F.broadcast(protos.select(F.col("label").alias("cand"), "proto"))
    )
    dist = F.aggregate(
        F.zip_with("__v", "proto", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select("id", "true_label", "cand", dist.alias("d"))
    w = Window.partitionBy("id").orderBy(F.asc("d"), F.asc("cand"))
    best = scored.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    return best.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.coalesce(
            F.sum(F.when(F.col("cand") == F.col("true_label"), 1)
                  .otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_correct"),
    ).select(
        "n_total",
        "n_correct",
        F.expr(
            "CASE WHEN n_total = 0 THEN -1"
            " ELSE n_correct * 1000000 div n_total END"
        ).cast("long").alias("acc_ppm"),
    )


def norm_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    in_dim: int = 64,
) -> DataFrame:
    """Per-label vector-norm census — the degenerate-embedding detector
    (collapsed models emit near-zero or constant-norm vectors; truncated
    files emit zero tails): (label, n_vecs, min_norm, max_norm, sum_norm)
    with every norm an exact integer micro-unit —

        norm_micro = round(sqrt(Σ_d round(v_d·1e6)²))

    (quantize once; the integer sum of squares is exact; sqrt is
    IEEE-correctly-rounded; one final round). Pure map + one groupBy.
    """
    vmic = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0, 0).cast("long"),
    )
    ss = F.aggregate(
        vmic, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    norm = F.round(F.sqrt(ss.cast("double")), 0).cast("long")
    base = df.where(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(label_col).alias("label"), norm.alias("__n"))
    return base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("__n").cast("long").alias("min_norm"),
        F.max("__n").cast("long").alias("max_norm"),
        F.sum("__n").cast("long").alias("sum_norm"),
    )


def sq8_stats(emb: DataFrame, emb_col: str = "embedding",
              dim: int = DIM) -> DataFrame:
    """Per-dimension (dim1, lo, hi) training stats for int8 scalar
    quantization — the FAISS ``SQ8`` flat-compressed layout (distinct
    from PQ: no codebook, one byte per DIMENSION with a per-dim affine
    range). posexplode -> groupBy(dim) is a map-side-combined shuffle of
    d tiny groups; the stats table is dimension-sized (broadcast
    material). Beyond-reference scope (the reference keeps raw fp32
    lists in a joblib memo, knowledge_graph_builder.py:83-102)."""
    return (
        emb.select(
            F.posexplode(F.col(emb_col).cast("array<double>"))
            .alias("dim0", "x")
        )
        .groupBy("dim0")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .select((F.col("dim0") + 1).alias("dim1"), "lo", "hi")
    )


def sq8_encode(
    emb: DataFrame,
    stats: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int>) with codes[j] = floor((x_j - lo_j) *
    255 / (hi_j - lo_j) + 0.5), clamped to [0, 255]. floor(x + 0.5) is
    used instead of round() so the tie mode is pinned cross-engine; both
    engines evaluate the identical fp64 expression tree, so quantization
    is bit-deterministic. Stats ride in as two broadcast ARRAY columns
    (1-row cross join — the documented scalar-broadcast posture); the
    corpus is never shuffled (map-only encode)."""
    arrs = stats.orderBy("dim1").agg(
        F.array_sort(
            F.collect_list(F.struct("dim1", "lo", "hi"))
        ).alias("s")
    ).select(
        F.transform("s", lambda t: t["lo"]).alias("lo_arr"),
        F.transform("s", lambda t: t["hi"]).alias("hi_arr"),
    )
    enc = emb.crossJoin(F.broadcast(arrs))
    codes = F.zip_with(
        F.col(emb_col).cast("array<double>"),
        F.zip_with("lo_arr", "hi_arr", lambda lo, hi: F.struct(
            lo.alias("lo"), hi.alias("hi"))),
        lambda x, s: F.greatest(
            F.lit(0),
            F.least(
                F.lit(255),
                F.floor(
                    (x - s["lo"]) * F.lit(255.0)
                    / (s["hi"] - s["lo"]) + F.lit(0.5)
                ).cast("int"),
            ),
        ),
    )
    return enc.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center / farthest-point coreset (Gonzalez 1985) — the
    classic diversity-selection pass for training-data curation: pick
    `k` points, each maximizing its distance to the already-picked set
    (max-min). The pick sequence doubles as a 2-approx k-center cover,
    and `d2_q` of pick t is the covering radius AFTER t-1 picks — the
    standard coreset quality curve.

    Determinism contract: coordinates are quantized to integer
    milli-units with the pinned tie mode floor(x*1000 + 0.5) (the
    sq8_encode posture), so squared L2 distances are exact longs;
    seed = min id; argmax ties -> id asc. The seed row carries
    d2_q = -1 (sentinel, not NULL — hash-canonicalization posture).

    Scale shape: k bounded driver rounds; each round broadcasts ONE
    1-row pick and keeps a running min-distance column (the classic
    O(n*k) formulation — never the n x picked pair table), so every
    round is a map over the corpus plus a global top-1 (TakeOrdered).
    The reference has no selection stage at all (it embeds everything,
    /root/reference/knowledge_graph_builder.py:94-102).
    """
    from kgspark.session import materialize

    if k < 1:
        raise ValueError("kcenter_coreset: k must be >= 1")
    q = materialize(
        emb.select(
            F.col(id_col).alias("vid"),
            F.transform(
                F.col(emb_col),
                lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5))
                .cast("long"),
            ).alias("qv"),
        )
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    seed = q.orderBy(F.asc("vid")).limit(1)
    pick = materialize(
        seed.select(F.col("vid").alias("pid"), F.col("qv").alias("pq"),
                    F.lit(-1).cast("long").alias("pd2"))
    )
    out = pick.select(
        F.lit(1).cast("long").alias("pick_no"),
        F.col("pid").alias(id_col), F.col("pd2").alias("d2_q"),
    )
    state = materialize(
        q.join(pick.select("pid"), q["vid"] == F.col("pid"), "left_anti")
        .crossJoin(F.broadcast(pick.select("pq")))
        .select("vid", "qv", d2(F.col("qv"), F.col("pq")).alias("best"))
    )
    for step in range(2, k + 1):
        pick = materialize(
            state.orderBy(F.desc("best"), F.asc("vid")).limit(1)
            .select(F.col("vid").alias("pid"), F.col("qv").alias("pq"),
                    F.col("best").alias("pd2"))
        )
        out = out.unionByName(pick.select(
            F.lit(step).cast("long").alias("pick_no"),
            F.col("pid").alias(id_col), F.col("pd2").alias("d2_q"),
        ))
        state = materialize(
            state.join(pick.select("pid"),
                       state["vid"] == F.col("pid"), "left_anti")
            .crossJoin(F.broadcast(pick.select("pq")))
            .select(
                "vid", "qv",
                F.least(F.col("best"),
                        d2(F.col("qv"), F.col("pq"))).alias("best"),
            )
        )
    return out


def isotropy_report(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """1-row isotropy census of an embedding column — how far the
    cloud's mean pairwise similarity sits from zero (Mu & Viswanath
    2018, "All-but-the-Top": contextual/static embedding spaces are
    notoriously anisotropic; a high mean pairwise dot means cosine
    scores are inflated corpus-wide and ANN thresholds drift). The key
    identity makes it pair-free:

        Σ_{i≠j} <q_i, q_j>  =  ||Σ_i q_i||²  −  Σ_i ||q_i||²

    so the WHOLE pairwise sum costs one elementwise vector sum + one
    norm pass — never an O(n²) join (the same sufficient-statistic
    trick as rel variance, applied to vectors).

    Exactness: components quantized to floor(x·scale + 0.5) integers
    (the sq8/coreset pin; float→double is exact), every sum is 64-bit
    integer, and iso_ppm uses the PINNED two-step truncation
    ((pair_num div (n−1)) · 1e6) div sum_norm2 — ordered so
    intermediates stay < 2⁶³ to ~10⁸ rows at this scale/dim (beyond
    that, shard the report and combine the exact integer sufficient
    statistics: n, per-pos sums, Σ norm²  — all mergeable by addition).

    Emits (n, dim, sum_norm2, total_norm2, pair_dot_num, iso_ppm);
    iso_ppm ≈ 1e6 · mean pairwise dot / mean norm², the [−1e6, 1e6]
    anisotropy gauge; -1 sentinel when n < 2 or all-zero.

    Scale shape: one materialized quantization pass feeds (a) a
    map-side-combined per-row norm agg and (b) a posexplode + per-pos
    sum whose state is `dim` counters — both shuffle-light; the finale
    is a crossJoin of two 1-row frames (the grand-total posture).
    """
    from kgspark.session import materialize

    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
        .cast("long"),
    )
    base = materialize(df.select(q.alias("q")))
    norms = base.select(
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda a, x: a + x * x
        ).alias("n2")
    )
    a = norms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("n2"), F.lit(0)).cast("long").alias("sum_norm2"),
    )
    t = (
        base.select(F.posexplode("q").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").cast("long").alias("s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("dim"),
            F.coalesce(F.sum(F.expr("s * s")), F.lit(0))
            .cast("long").alias("total_norm2"),
        )
    )
    return a.crossJoin(F.broadcast(t)).select(
        "n", "dim", "sum_norm2", "total_norm2",
        (F.col("total_norm2") - F.col("sum_norm2"))
        .cast("long").alias("pair_dot_num"),
        F.when(
            (F.col("n") >= 2) & (F.col("sum_norm2") > 0),
            F.expr(
                "(((total_norm2 - sum_norm2) div (n - 1)) * 1000000L)"
                " div sum_norm2"
            ),
        ).otherwise(F.lit(-1)).cast("long").alias("iso_ppm"),
    )


def top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
    rounds: int = 6,
) -> DataFrame:
    """Top principal direction of an embedding cloud by EXACT-integer
    power iteration on the quantized Gram matrix — the one piece of
    spectral machinery a curation stack actually needs: the dominant
    component is what All-but-the-Top (Mu & Viswanath 2018) removes to
    fix anisotropy (isotropy_report MEASURES the problem; this finds
    the direction to project away), and its Rayleigh quotient is the
    variance share captured.

    Path: components quantized floor(x·scale+0.5) → Gram G[p,q] =
    Σ_rows v_p·v_q as d² exact 64-bit sums (one position-pair
    self-join per row — state is d², never n²) → `rounds` iterations
    x ← (G·x)·1e3 div max|G·x| (the eigenvector_centrality max-norm
    posture, truncation toward zero so signs stay exact; the iterate
    lives in MILLI units — 1e6 would push y·scale past 2⁶³ on wide
    clouds). Everything is deterministic integer arithmetic; the
    unrolled DuckDB oracle replays it bit-for-bit. Overflow budget:
    |G| ≤ n·(scale·max|x|)² and each product ≤ d·|G|·1e3·1e3 —
    64-bit safe to ~10⁶ rows at d=64/scale=1e3; shard-and-sum the
    Gram beyond (it is additive).

    Emits (pos, pc1_milli) — the max-norm direction in [-1000, 1000]
    after `rounds` (sign = whichever the iteration converges to;
    deterministic, ± is inherent to eigenvectors).

    Scale shape: ONE d²-keyed aggregation builds G; each round is a
    d²-row join + d-row aggregate — cluster cost lives entirely in
    the Gram pass, which is a single map-side-combined shuffle.
    """
    from kgspark.session import materialize

    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
        .cast("long"),
    )
    rows = materialize(
        df.select(F.monotonically_increasing_id().alias("rid"),
                  q.alias("q"))
        .select("rid", F.posexplode("q").alias("pos", "v"))
    )
    gram = materialize(
        rows.alias("a")
        .join(rows.select(F.col("rid").alias("rid"),
                          F.col("pos").alias("p2"),
                          F.col("v").alias("v2")).alias("b"),
              "rid")
        .groupBy(F.col("pos").alias("p1"), "p2")
        .agg(F.sum(F.expr("v * v2")).cast("long").alias("g"))
    )
    x = gram.select(F.col("p1").alias("pos")).distinct().withColumn(
        "xv", F.lit(1_000).cast("long")
    )
    for _r in range(rounds):
        y = (
            gram.join(x.select(F.col("pos").alias("p2"),
                               F.col("xv")), "p2")
            .groupBy(F.col("p1").alias("pos"))
            .agg(F.sum(F.expr("g * xv")).cast("long").alias("y"))
        )
        m = y.agg(F.max(F.abs(F.col("y"))).alias("m"))
        x = materialize(
            y.crossJoin(F.broadcast(m)).select(
                "pos",
                F.when(F.col("m") > 0,
                       F.expr("(y * 1000L) div m"))
                .otherwise(F.lit(0)).cast("long").alias("xv"),
            )
        )
    return x.select("pos", F.col("xv").alias("pc1_milli"))
