"""Knowledge-graph embedding scoring — TransE-style plausibility + link
prediction.

The reference has no KG-completion surface at all (its graph API stops at
lookups, /root/reference/knowledge_graph_builder.py:675-738); this module
adds the standard translational-embedding evaluation stack (Bordes et al.
2013, "Translating Embeddings for Modeling Multi-relational Data"): score
every triple by || e_s + e_p - e_o ||_1 and rank each test triple's true
object among a candidate set under the filtered protocol.

Embeddings are INPUTS here — any (entity, emb array<int|float>) /
(rel, emb) tables work; training is out of scope (an SGD loop is a
different engine concern). :func:`hash_embeddings` supplies deterministic
integer embeddings (md5-byte coordinates) so scores are exact integers —
the cross-engine-reproducible calibration path used by the contract
queries; swap in trained vectors for real ranking quality.

Scale posture (100 TB): scoring is three hash joins (entity/relation
tables broadcast when they fit) followed by map-only array arithmetic —
no shuffle beyond the joins. Link-prediction candidates are the
PREDICATE RANGE (objects observed for that predicate), never "all
entities": an all-entity cross join at web scale is a deliberate no-op,
while predicate ranges are the type-compatible candidate set and bounded
by the data's own schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_embeddings(
    df: DataFrame, col: str, dim: int = 8, salt: str = ""
) -> DataFrame:
    """Deterministic integer embeddings: coordinate i is byte i of
    md5(salt || value) shifted to [-128, 127].

    Exact-integer by construction, so every downstream L1 score is an
    exact integer too — the property the DuckDB oracles hash against.
    dim <= 16 (md5 has 16 bytes).
    """
    if not 1 <= dim <= 16:
        raise ValueError(f"hash_embeddings: dim must be in 1..16, got {dim}")
    h = F.md5(F.concat(F.lit(salt), F.col("entity")))
    dims = [
        (F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("int") - 128)
        for i in range(dim)
    ]
    return (
        df.select(F.col(col).alias("entity"))
        .where(F.col("entity").isNotNull())
        .distinct()
        .select("entity", F.array(*dims).alias("emb"))
    )


def _l1_spo(se, pe, oe):
    """sum_i | se_i + pe_i - oe_i | as a long (sequential fold, so float
    inputs are order-stable too)."""
    diff = F.zip_with(
        F.zip_with(se, pe, lambda x, y: x + y), oe,
        lambda x, y: F.abs(x - y),
    )
    return F.aggregate(
        diff, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )


def transe_score(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """Score every (subj, pred, obj) triple with the TransE L1 energy
    || e_s + e_p - e_o ||_1 (LOWER = more plausible).

    ent_emb: (entity, emb), rel_emb: (rel, emb). Returns the triple columns
    plus ``l1_score`` (long for integer embeddings). Triples whose subject,
    predicate, or object has no embedding row are dropped (inner joins) —
    embedding coverage is the caller's contract.
    """
    out = (
        triples.select("subj", "pred", "obj")
        .join(
            ent_emb.select(
                F.col("entity").alias("subj"), F.col("emb").alias("_se")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("rel").alias("pred"), F.col("emb").alias("_pe")
            ),
            "pred",
        )
        .join(
            ent_emb.select(
                F.col("entity").alias("obj"), F.col("emb").alias("_oe")
            ),
            "obj",
        )
    )
    return out.select(
        "subj", "pred", "obj",
        _l1_spo(F.col("_se"), F.col("_pe"), F.col("_oe")).alias("l1_score"),
    )


def distmult_score(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """Score every (subj, pred, obj) triple with the DistMult bilinear
    product Σ_i e_s[i]·e_p[i]·e_o[i] (Yang et al., ICLR 2015; HIGHER =
    more plausible) — the diagonal-bilinear counterpart to
    :func:`transe_score`'s translational energy. DistMult's known
    symmetry (score(s,p,o) = score(o,p,s)) is inherited, not hidden —
    callers ranking antisymmetric predicates should prefer TransE.

    Same contract as transe_score: (entity, emb)/(rel, emb) inputs, inner
    joins drop uncovered triples, exact longs for integer embeddings
    (sequential fold keeps float inputs order-stable too). Scale shape is
    identical: three hash joins + map-only zip_with/aggregate.
    """
    prod = F.aggregate(
        F.zip_with(
            F.zip_with(
                F.col("_se"), F.col("_pe"), lambda x, y: x * y
            ),
            F.col("_oe"),
            lambda x, y: x * y,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    out = (
        triples.select("subj", "pred", "obj")
        .join(
            ent_emb.select(
                F.col("entity").alias("subj"), F.col("emb").alias("_se")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("rel").alias("pred"), F.col("emb").alias("_pe")
            ),
            "pred",
        )
        .join(
            ent_emb.select(
                F.col("entity").alias("obj"), F.col("emb").alias("_oe")
            ),
            "obj",
        )
    )
    return out.select("subj", "pred", "obj", prod.alias("dm_score"))


def complex_score(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """Score every (subj, pred, obj) triple with ComplEx (Trouillon et
    al., ICML 2016, "Complex Embeddings for Simple Link Prediction";
    HIGHER = more plausible). An embedding array of even length 2d is a
    complex d-vector stored real-parts-first: [re_0..re_{d-1},
    im_0..im_{d-1}]; the score is Re(<e_s, e_p, conj(e_o)>) =

        Σ_i  sr·pr·or + si·pr·oi + sr·pi·oi − si·pi·or

    DistMult is the Im=0 special case — its blind spot is symmetry
    (score(s,p,o) = score(o,p,s) always); ComplEx's imaginary relation
    parts break that, so antisymmetric predicates (part_of, before,
    capital_of) get direction-aware scores. The reference has no
    KG-completion surface at all (ref /root/reference/
    knowledge_graph_builder.py:675-738).

    Same contract as :func:`distmult_score`: (entity, emb)/(rel, emb)
    inputs, inner joins drop uncovered triples, exact longs for integer
    embeddings. Odd-length arrays use d = len div 2 (the last coordinate
    is ignored). Scale shape identical: three hash joins (small embedding
    tables broadcast) + map-only slice/zip_with/aggregate arithmetic.
    """
    def half(c, first):
        d = (F.size(c) / 2).cast("int")
        return F.slice(c, F.lit(1) if first else d + 1, d)

    def term(a, b, c):
        return F.aggregate(
            F.zip_with(
                F.zip_with(a, b, lambda x, y: x * y), c, lambda x, y: x * y
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        )

    sr, si = half(F.col("_se"), True), half(F.col("_se"), False)
    pr, pi = half(F.col("_pe"), True), half(F.col("_pe"), False)
    orr, oi = half(F.col("_oe"), True), half(F.col("_oe"), False)
    score = (
        term(sr, pr, orr) + term(si, pr, oi)
        + term(sr, pi, oi) - term(si, pi, orr)
    )
    out = (
        triples.select("subj", "pred", "obj")
        .join(
            ent_emb.select(
                F.col("entity").alias("subj"), F.col("emb").alias("_se")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("rel").alias("pred"), F.col("emb").alias("_pe")
            ),
            "pred",
        )
        .join(
            ent_emb.select(
                F.col("entity").alias("obj"), F.col("emb").alias("_oe")
            ),
            "obj",
        )
    )
    return out.select("subj", "pred", "obj", score.alias("cx_score"))


def rotate_score(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """Score every (subj, pred, obj) triple with RotatE (Sun et al., ICLR
    2019, "RotatE: Knowledge Graph Embedding by Relational Rotation in
    Complex Space"; LOWER = more plausible): the L1 distance
    || e_s ∘ e_p − e_o ||_1 where ∘ is the elementwise complex product.
    Arrays of even length 2d are complex d-vectors stored
    real-parts-first (same layout as :func:`complex_score`):

        Σ_i  |sr·pr − si·pi − or|  +  |sr·pi + si·pr − oi|

    RotatE's rotation geometry models COMPOSITION (r3 = r1 ∘ r2) and
    inversion, which neither TransE (composition but not symmetry) nor
    ComplEx (no composition) capture — the fourth member of the scoring
    family. The unit-modulus constraint on relations is a TRAINING-side
    projection; this scorer accepts any complex relation vector, so the
    deterministic integer embeddings stay exact longs (trained unit
    rotations slot in unchanged). The reference has no KG-completion
    surface (ref /root/reference/knowledge_graph_builder.py:675-738).

    Same contract as :func:`complex_score`: (entity, emb)/(rel, emb)
    inputs, inner joins drop uncovered triples, odd lengths use
    d = len div 2. Scale shape identical: three hash joins (embedding
    tables broadcast when dimension-sized) + map-only slice/zip_with
    arithmetic — no extra shuffle.
    """
    def half(c, first):
        d = (F.size(c) / 2).cast("int")
        return F.slice(c, F.lit(1) if first else d + 1, d)

    def l1term(a, b, c, d, t, sign):
        # sum_i |a_i*b_i + sign*c_i*d_i - t_i| as a long
        prod = F.zip_with(
            F.zip_with(a, b, lambda x, y: x * y),
            F.zip_with(c, d, lambda x, y: x * y),
            (lambda x, y: x + y) if sign > 0 else (lambda x, y: x - y),
        )
        diff = F.zip_with(prod, t, lambda x, y: F.abs(x - y))
        return F.aggregate(
            diff, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        )

    sr, si = half(F.col("_se"), True), half(F.col("_se"), False)
    pr, pi = half(F.col("_pe"), True), half(F.col("_pe"), False)
    orr, oi = half(F.col("_oe"), True), half(F.col("_oe"), False)
    score = (
        l1term(sr, pr, si, pi, orr, -1)   # |sr·pr − si·pi − or|
        + l1term(sr, pi, si, pr, oi, +1)  # |sr·pi + si·pr − oi|
    )
    out = (
        triples.select("subj", "pred", "obj")
        .join(
            ent_emb.select(
                F.col("entity").alias("subj"), F.col("emb").alias("_se")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("rel").alias("pred"), F.col("emb").alias("_pe")
            ),
            "pred",
        )
        .join(
            ent_emb.select(
                F.col("entity").alias("obj"), F.col("emb").alias("_oe")
            ),
            "obj",
        )
    )
    return out.select("subj", "pred", "obj", score.alias("ro_score"))


def lp_ranks(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    filtered: bool = True,
) -> DataFrame:
    """Filtered link-prediction ranks (the standard KG-completion eval):
    for each distinct (subj, pred, obj) triple, rank the true object among
    the predicate-range candidates by TransE L1 energy.

    rank = 1 + #candidates strictly better + #equal-energy candidates that
    sort before the true object (total deterministic order: energy asc,
    candidate asc — no cross-engine tie ambiguity). ``filtered=True`` drops
    candidates c != obj where (subj, pred, c) is itself a true triple
    (Bordes et al. 2013's "filtered" protocol, so other correct answers
    don't count as errors). Returns (subj, pred, obj, rank, n_cand).

    Plan: candidates = distinct (pred, obj) pairs — a predicate-range
    dimension table; the pair table is triples x range(pred), scored with
    map-only array arithmetic; rank is one window over the (subj, pred,
    obj) candidate groups. No all-entity cross join anywhere.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    cand = t.select("pred", F.col("obj").alias("cand")).distinct()
    pairs = t.join(cand, "pred")
    if filtered:
        truth = t.select(
            "subj", "pred", F.col("obj").alias("cand"),
            F.lit(1).alias("_is_true"),
        ).distinct()
        pairs = pairs.join(truth, ["subj", "pred", "cand"], "left").where(
            F.col("_is_true").isNull() | (F.col("cand") == F.col("obj"))
        ).drop("_is_true")
    scored = (
        pairs.join(
            ent_emb.select(
                F.col("entity").alias("subj"), F.col("emb").alias("_se")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("rel").alias("pred"), F.col("emb").alias("_pe")
            ),
            "pred",
        )
        .join(
            ent_emb.select(
                F.col("entity").alias("cand"), F.col("emb").alias("_oe")
            ),
            "cand",
        )
        .select(
            "subj", "pred", "obj", "cand",
            _l1_spo(F.col("_se"), F.col("_pe"), F.col("_oe")).alias("_e"),
        )
    )
    w = Window.partitionBy("subj", "pred", "obj")
    true_e = F.max(
        F.when(F.col("cand") == F.col("obj"), F.col("_e"))
    ).over(w)
    better = F.when(
        (F.col("_e") < true_e)
        | ((F.col("_e") == true_e) & (F.col("cand") < F.col("obj"))),
        1,
    ).otherwise(0)
    return (
        scored.select("subj", "pred", "obj", better.alias("_b"))
        .groupBy("subj", "pred", "obj")
        .agg(
            (F.sum("_b") + F.lit(1)).cast("long").alias("rank"),
            F.count(F.lit(1)).cast("long").alias("n_cand"),
        )
    )


def energy_outliers(
    scored: DataFrame, permille: int = 900, min_group: int = 20
) -> DataFrame:
    """Embedding-based error candidates (KG refinement, Paulheim 2017
    survey §4: outlier plausibility scores flag wrong assertions): the
    triples whose TransE energy falls in the top (1000 - permille)
    per-mille of their PREDICATE group — relation-specific thresholds,
    since energies are not comparable across predicates.

    Input: transe_score output (subj, pred, obj, l1_score). Output adds
    (rank, n, thr_rank): rows with rank > thr_rank where
    thr_rank = (n * permille) div 1000 under the total deterministic
    order (l1_score asc, subj asc, obj asc) — the repo's integer-rank
    quantile pattern, no floating percentiles. Groups smaller than
    ``min_group`` are skipped (a permille threshold over a handful of
    rows flags noise, not anomalies).

    Plan: one window over the pred key (rank + count share the
    partitioning), one filter — a single shuffle.
    """
    if not 0 < permille < 1000:
        raise ValueError(f"energy_outliers: permille in 1..999, got {permille}")
    w = Window.partitionBy("pred").orderBy("l1_score", "subj", "obj")
    wn = Window.partitionBy("pred")
    ranked = scored.select(
        "subj", "pred", "obj", "l1_score",
        F.row_number().over(w).cast("long").alias("rank"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    ).withColumn(
        "thr_rank", F.expr(f"(n * {permille}) div 1000").cast("long")
    )
    return ranked.where(
        (F.col("n") >= min_group) & (F.col("rank") > F.col("thr_rank"))
    )
