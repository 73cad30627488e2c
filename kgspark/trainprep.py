"""Training-data preparation operators: deterministic split, greedy sequence
packing, domain-mixing resampling.

The reference stops at KG construction; an LLM-training pipeline additionally
needs the corpus -> training-set steps. All three operators here are
deterministic functions of md5 over stable ids — replayable on retry, no RNG
state, no global ordering — and every one is expressible in ANSI SQL, so each
has a full DuckDB oracle in `__spark_entry__` (corpus_split / corpus_pack /
corpus_mix).

Scale posture (100 TB):
  - `hash_split` is a pure projection — no shuffle, no state.
  - `pack_greedy` shuffles once on a deterministic hash group and packs each
    group independently in an Arrow-batched pandas stage; `n_groups` is the
    parallelism/memory knob (set it so one group's (id, n_tokens) pairs fit
    an executor; 10^5 groups at 10^9 docs -> 10^4 docs/group). Sequential
    greedy packing is inherently order-dependent, so a single global stream
    would serialize — per-group streams keep the same bin quality (fill loss
    only at each group's final sequence) while scaling linearly.
  - `mix_sources` aggregates one per-source count (source cardinality is
    dimension-sized), broadcasts the acceptance ratios, and filters by each
    doc's md5 fraction — no per-source sort/rank (a rank-based top-n_s would
    funnel each source through one task: the skew trap `kgtrain.ranked_
    entities` avoids for the same reason).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the DuckDB oracles mirror this expression byte-for-byte — one shared
# definition, not a second copy that could silently diverge
from kgspark.kgtrain import _hex6_to_int as _hex6_int


def _doc_hash(id_col: str, salt: str):
    return F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))


def _doc_frac(id_col: str, salt: str):
    """Deterministic uniform in [0, 1) per (salt, id)."""
    return _hex6_int(_doc_hash(id_col, salt)).cast("double") / F.lit(
        float(16 ** 6)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row a split label by hash — train/val/test membership is a
    pure function of (salt, id): stable across runs, machines and row order,
    and rows never leak between splits when the corpus is re-filtered or
    re-partitioned. Weights must sum to 1; label boundaries are the running
    cumulative sums (IEEE fp64 left-to-right, mirrored by the oracle)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        # the last label is the otherwise-branch, so a short total would
        # silently hand it the whole residual hash space
        raise ValueError(f"split weights must sum to 1, got {weights}")
    frac = _doc_frac(id_col, salt)
    names = list(weights)
    col = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = frac < F.lit(cum)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    col = col.otherwise(names[-1]) if col is not None else F.lit(names[-1])
    return df.withColumn("split", col)


def split_cuts(weights: dict[str, float]) -> list[tuple[float, str]]:
    """(cumulative upper bound, label) pairs exactly as `hash_split` computes
    them — the oracle generator uses this so both engines share literals."""
    out: list[tuple[float, str]] = []
    cum = 0.0
    for name, w in weights.items():
        cum += w
        out.append((cum, name))
    return out


def pack_greedy(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Greedy sequential sequence packing: hash-route docs into `n_groups`
    independent streams, pack each stream in id order — a doc opens a new
    sequence when adding it would overflow `max_tokens`; docs longer than
    `max_tokens` occupy a sequence alone. Output: one row per doc with its
    (group_id, seq_id) bin assignment. Ids keep their input type (string
    uids pack in lexicographic order)."""
    group = (_hex6_int(_doc_hash(id_col, salt)) % n_groups).cast("long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        # null token counts (e.g. null text upstream) pack as 0-length —
        # a NaN would poison the pandas cumulative loop for the whole group
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("n_tokens"),
        group.alias("group_id"),
    )
    id_type = base.schema["doc_id"].dataType.simpleString()
    schema = f"group_id long, seq_id long, doc_id {id_type}, n_tokens long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, cum = 0, 0
        for n in pdf["n_tokens"]:
            if cum > 0 and cum + n > max_tokens:
                seq += 1
                cum = 0
            seq_ids.append(seq)
            cum += n
        pdf["seq_id"] = seq_ids
        return pdf[["group_id", "seq_id", "doc_id", "n_tokens"]]

    return base.groupBy("group_id").applyInPandas(pack, schema=schema)


def mix_sources(
    df: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Resample the corpus toward a target domain mix. Given target
    proportions p_s, the largest total consistent with availability is
    T = min_s(n_s / p_s); each source keeps docs with acceptance ratio
    (p_s * T) / n_s (= 1 for the binding source), selected by the doc's md5
    fraction. Sources absent from `target` are dropped. Counts land within
    binomial noise of exact — the price of having no per-source rank."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(p)) for s, p in target.items()], f"{source_col} string, p double"
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .join(tgt, source_col)
    )
    t_row = counts.agg(F.min(F.col("n") / F.col("p")).alias("t"))
    ratios = counts.crossJoin(F.broadcast(t_row)).select(
        source_col, ((F.col("p") * F.col("t")) / F.col("n")).alias("ratio")
    )
    frac = _doc_frac(id_col, salt)
    return (
        df.join(F.broadcast(ratios), source_col)
        .where(frac < F.col("ratio"))
        .drop("ratio")
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
    include_unchanged: bool = False,
) -> DataFrame:
    """Incremental corpus diff between two snapshots: one row per id that
    was `added`, `removed` or `changed` (content hash differs), with both
    content hashes for audit. Feeds incremental reprocessing — rerun the
    expensive extraction/embedding stages only on added+changed ids
    instead of the whole corpus (the batch analogue of
    `streaming.start_incremental_kg`'s anti-join resume).

    The content fingerprint is md5 over the content columns joined with a
    unit separator, nulls as NUL — a pure projection on each side. The
    only shuffle is the full-outer hash join on id; at 10^9 rows that is
    one key-partitioned exchange per side, no window, no global order.
    With `include_unchanged` the unchanged rows ride along labeled (full
    audit mode) instead of being filtered before the exchange.
    """
    sep, nul = "\x1f", "\x00"

    def fingerprint(df: DataFrame) -> F.Column:
        return F.md5(F.concat_ws(
            sep, *[F.coalesce(F.col(c).cast("string"), F.lit(nul))
                   for c in content_cols],
        ))

    o = old.select(F.col(id_col).alias("id"), fingerprint(old).alias("old_hash"))
    n = new.select(F.col(id_col).alias("id"), fingerprint(new).alias("new_hash"))
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
    )
    out = joined.select(
        F.col("id").alias(id_col),
        status.alias("status"),
        "old_hash",
        "new_hash",
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def stratified_sample(df: DataFrame, n_per: int,
                      strata_col: str = "source", id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Deterministic n-per-stratum sample (eval-set carving, per-source
    audits): rank rows within each stratum by (md5(salt:id), id) ascending
    and keep the first n_per. A pure function of the data — re-runs,
    repartitions and corpus re-filters reproduce the same sample, and the
    salt gives independent draws (the hash_split convention, same shared
    hash expression the DuckDB oracles mirror).

    Scale: the window partitions by stratum and rank<=k compiles to
    WindowGroupLimit, so each map partition pre-prunes to its local top-k
    before the one shuffle on strata_col (same shape as web.domain_cap).
    Strata with fewer than n_per rows keep everything."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _doc_hash(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per)
    )


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    cluster_col: str | None = None,
    salt: str = "split",
) -> DataFrame:
    """hash_split keyed on the DUPLICATE-CLUSTER key instead of the row id,
    so duplicated documents can never straddle a split boundary — the
    train/test contamination channel Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", public) showed inflates
    eval scores.

    Pass `cluster_col` (e.g. a canon.connected-components cluster id from
    the MinHash near-dup pipeline) to protect near-duplicates; by default
    the key is the exact-content md5, which already pins byte-identical
    copies — the split stays a pure function of (salt, cluster key), so
    re-runs, re-partitions and re-filters of the corpus never move a
    cluster between splits. Adds `split`; same weights semantics as
    hash_split.
    """
    key = (
        F.col(cluster_col).cast("string")
        if cluster_col
        else F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )
    out = hash_split(
        df.withColumn("__skey", key), weights, id_col="__skey", salt=salt
    )
    return out.drop("__skey")


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, public): each row gets priority ln(u) / w with u the
    row's md5 hash fraction; the n highest priorities are a
    weight-proportional sample — the standard importance-sampling step
    when upweighting high-quality documents in a training mix.

    Replayability: u is a pure function of (salt, id) (the hash_split
    convention), so the sample is identical across runs, partitionings
    and engines — no RNG state. Rows with NULL or non-positive weight are
    excluded. u is an exact dyadic rational (hex6/2^24, exactly
    representable in fp64), so ln(u)/w is the same fp64 value everywhere
    the expression tree matches; the top-n is a TakeOrdered (priority
    desc, id asc), never a global sort. Returns (id, weight,
    priority_unats) with the priority quantized to micro-units for
    hash-contract output; ordering happens on the raw fp64.
    """
    w = F.col(weight_col).cast("double")
    u = _doc_frac(id_col, salt)
    pri = F.log(u) / w
    return (
        # u == 0 (1-in-2^24 hash) would make ln(u) = -inf: deterministic
        # but it poisons the quantized output column — exclude it, the
        # row had sampling probability ~0 anyway
        df.where(w.isNotNull() & (w > 0) & (u > 0))
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            pri.alias("__pri"),
        )
        .orderBy(F.col("__pri").desc(), F.col(id_col).asc())
        .limit(n)
        .select(
            F.col(id_col),
            "weight",
            F.round(F.col("__pri") * F.lit(1e6), 0).cast("long")
            .alias("priority_unats"),
        )
    )


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha_permille: int = 500,
) -> DataFrame:
    """Temperature-scaled source-mixing weights (the T5/mT5 recipe,
    Raffel et al. 2020 §3.4.3): sampling weight ∝ n_s^α with α ∈ (0, 1]
    flattening the source distribution so low-resource sources are not
    drowned out. α is passed in permille (500 = the classic α = 0.5).

    Returns one dimension-sized row per source:
      (source, n_docs, w_scaled, weight_ppm, boost_ppm) where
      w_scaled    = round(n_docs^α · 1e6)  — quantized ONCE per source
      weight_ppm  = w_scaled · 1e6 div Σ w_scaled   (integer floor div)
      boost_ppm   = weight_ppm · total_docs div n_docs — how many ppm of
                    the mixed corpus each ORIGINAL doc of that source
                    represents (>1e6 ⇒ upsampled)

    Parity: α = 0.5 (the default and the contract value) computes via
    sqrt(), which IEEE 754 REQUIRES to be correctly rounded — so the
    quantized w_scaled is bit-identical on any engine. Other α use
    pow(), which libms only round to ~1 ulp; a round() boundary hit is
    then possible cross-engine (documented, not contract-exercised).
    Either way the value is quantized to a long BEFORE the normalizing
    sum, so the division is pure integer arithmetic (the repo rule).

    Shape: one map-side-combined groupBy on source; everything after
    runs on the dimension-sized source table. The output feeds
    mix_sources-style acceptance sampling.
    """
    if not (0 < alpha_permille <= 1000):
        raise ValueError(
            "temperature_weights: alpha_permille must be in (0, 1000]"
        )
    cnt = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    if alpha_permille == 500:
        raw = F.sqrt(F.col("n_docs").cast("double"))
    else:
        raw = F.pow(
            F.col("n_docs").cast("double"), F.lit(alpha_permille / 1000.0)
        )
    w = F.round(raw * 1000000.0, 0).cast("long")
    scored = cnt.select("source", "n_docs", w.alias("w_scaled"))
    tot = scored.agg(
        F.sum("w_scaled").cast("long").alias("__tw"),
        F.sum("n_docs").cast("long").alias("__tn"),
    )
    return scored.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w_scaled",
        F.expr("w_scaled * 1000000 div __tw").cast("long")
        .alias("weight_ppm"),
        F.expr("(w_scaled * 1000000 div __tw) * __tn div n_docs")
        .cast("long").alias("boost_ppm"),
    )


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Packing-efficiency census over pack_greedy output: ONE exact-integer
    row — (n_docs, n_seqs, total_tokens, capacity, fill_ppm,
    n_overflow_docs). fill_ppm = total·1e6 div capacity is THE number a
    training pipeline watches (padding waste = 1e6 − fill_ppm);
    n_overflow_docs counts documents longer than max_tokens (each
    occupying a sequence alone — truncation candidates).

    Shape: one groupBy on (group, seq) then a global fold of a
    seq-count-sized table; no joins.
    """
    seqs = packed.groupBy("group_id", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("fill"),
    )
    return seqs.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum("fill").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) * F.lit(max_tokens)).cast("long").alias(
            "capacity"
        ),
        F.expr(
            f"CASE WHEN count(1) = 0 THEN -1"
            f" ELSE sum(fill) * 1000000 div (count(1) * {int(max_tokens)})"
            f" END"
        ).cast("long").alias("fill_ppm"),
        F.sum(
            F.when(
                (F.col("n_docs") == 1) & (F.col("fill") > max_tokens), 1
            ).otherwise(0)
        ).cast("long").alias("n_overflow_docs"),
    )


def densify_calendar(
    cells: DataFrame,
    key_col: str = "event_type",
    day_col: str = "window_start",
    count_col: str = "cnt",
) -> DataFrame:
    """Calendar densification: fill every (key, day) cell between the
    GLOBAL min and max day with an explicit 0 — the upstream step
    burst_windows documents as the caller's job (all-empty windows are
    absent from event logs, and z-stats over observed-only windows
    understate variance). Returns (key, day, cnt) with zeros present.

    Shape: the day spine is one sequence() explode of a 1-row global
    aggregate crossJoined with the dimension-sized key set; the fill is
    one left join of spine against observed cells — the observed table
    shuffles once on (key, day). Never a per-key min/max window.
    """
    span = cells.agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    keys = cells.select(F.col(key_col)).distinct()
    spine = keys.crossJoin(F.broadcast(span)).select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias(day_col),
    )
    return spine.join(cells, [key_col, day_col], "left").select(
        key_col,
        day_col,
        F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias(
            count_col
        ),
    )


def budget_allocation(
    df: DataFrame,
    budget_docs: int,
    source_col: str = "source",
    alpha_permille: int = 500,
) -> DataFrame:
    """Training-budget planner: split a doc budget across sources in
    proportion to their temperature weights, capped by availability, with
    ONE integer redistribution round for the capped sources' shortfall —
    (source, n_docs, weight_ppm, alloc_docs, saturated). All arithmetic
    is integer floor division on top of temperature_weights' exact
    w_scaled, so the plan is bit-identical anywhere; the single
    redistribution round means tiny floor-residues may remain unspent
    (≤ |sources| docs — a planner, not a packer).

    Shape: everything after the one groupBy in temperature_weights runs
    on the dimension-sized source table (two 1-row aggregates broadcast
    back).
    """
    if budget_docs < 0:
        raise ValueError("budget_allocation: budget_docs must be >= 0")
    w = temperature_weights(df, source_col, alpha_permille)
    a1 = F.least(
        F.col("n_docs"),
        F.expr(f"weight_ppm * {int(budget_docs)} div 1000000"),
    )
    staged = w.select(
        "source", "n_docs", "weight_ppm", a1.alias("__a1")
    )
    tot = staged.agg(
        F.coalesce(F.sum("__a1"), F.lit(0)).alias("__spent"),
        F.coalesce(
            F.sum(F.when(F.col("__a1") < F.col("n_docs"),
                         F.col("weight_ppm"))),
            F.lit(0),
        ).alias("__unsat_w"),
    )
    j = staged.crossJoin(F.broadcast(tot))
    bonus = F.when(
        (F.col("__a1") < F.col("n_docs")) & (F.col("__unsat_w") > 0),
        F.expr(
            f"weight_ppm * ({int(budget_docs)} - __spent) div __unsat_w"
        ),
    ).otherwise(F.lit(0))
    alloc = F.least(F.col("n_docs"), F.col("__a1") + bonus)
    return j.select(
        "source",
        "n_docs",
        "weight_ppm",
        alloc.cast("long").alias("alloc_docs"),
        F.when(alloc >= F.col("n_docs"), 1).otherwise(0).cast("long")
        .alias("saturated"),
    )


def contrastive_triplets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_threshold_ppm: int = 500_000,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Mine (anchor, positive, hard negative) supervision triplets for
    contrastive embedding training from the corpus's own duplicate
    structure (the SimCSE/E5 recipe: near-dups are positives; lexically
    similar non-dups are the HARD negatives worth training on).

    Candidates come from the same banded-MinHash blocking as
    minhash_dedup; each candidate pair gets its exact shingle-Jaccard in
    integer ppm (1e6 * |A∩B| // |A∪B|). Viewed symmetrically per anchor:
    the best positive is the max-ppm pair with ppm >= pos_threshold_ppm
    (tie -> smallest partner id), the hardest negative is the max-ppm
    IN-BAND pair below the threshold — it collided in an LSH band, so it
    is lexically close but not a duplicate. Anchors appear iff they have
    a positive; a missing negative yields the (-1, -1) sentinel (NULL
    breaks downstream canonical sorts).

    Returns (anchor, pos_id, pos_ppm, neg_id, neg_ppm).

    Plan: one banded self-join (identical shape to the dedup path), two
    rank-1 windows over the per-anchor candidate lists.
    """
    from pyspark.sql import Window

    from kgspark.dedup import minhash_sig, word_shingles_from
    from kgspark.session import materialize

    rows = num_hashes // bands
    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .where(F.col("t").isNotNull())
        .withColumn("__toks", F.split(F.col("t"), r"\s+"))
        .withColumn("sh", word_shingles_from(F.col("__toks"), shingle_n))
        .withColumn("sig", minhash_sig(F.col("sh"), num_hashes))
        .drop("t", "__toks")
    )
    base = materialize(base)
    banded = base.select(
        "id", "sh",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(b)),
                        *[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ])).alias("band_key"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band_key") == F.col("r.band_key"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.sh").alias("sha"), F.col("r.sh").alias("shb"))
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sha", "shb")).cast("long")
    uni = F.size(F.array_union("sha", "shb")).cast("long")
    pairs = cand.select(
        "a", "b",
        F.when(uni > 0, (F.lit(1_000_000) * inter))
        .otherwise(F.lit(0)).alias("_num"),
        uni.alias("_den"),
    ).select(
        "a", "b",
        F.when(F.col("_den") > 0,
               F.expr("_num div _den")).otherwise(F.lit(0))
        .cast("long").alias("ppm"),
    )
    sym = pairs.select(F.col("a").alias("anchor"),
                       F.col("b").alias("other"), "ppm").unionByName(
        pairs.select(F.col("b").alias("anchor"),
                     F.col("a").alias("other"), "ppm")
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("ppm"), F.asc("other"))
    pos = (
        sym.where(F.col("ppm") >= pos_threshold_ppm)
        .withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        .select("anchor", F.col("other").alias("pos_id"),
                F.col("ppm").alias("pos_ppm"))
    )
    neg = (
        sym.where(F.col("ppm") < pos_threshold_ppm)
        .withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        .select("anchor", F.col("other").alias("neg_id"),
                F.col("ppm").alias("neg_ppm"))
    )
    return pos.join(neg, "anchor", "left").select(
        "anchor", "pos_id", "pos_ppm",
        F.coalesce("neg_id", F.lit(-1)).cast("long").alias("neg_id"),
        F.coalesce("neg_ppm", F.lit(-1)).cast("long").alias("neg_ppm"),
    )


def rater_agreement(
    df: DataFrame, a_col: str, b_col: str
) -> tuple[DataFrame, DataFrame]:
    """Label-quality QA for weak supervision (Cohen, 1960): the
    confusion matrix and Cohen's kappa between two label columns — two
    annotators, a heuristic vs a classifier, or two model versions.

    Returns (confusion, summary):
      confusion — (label_a, label_b, n) counts;
      summary — ONE row (n, n_agree, agree_ppm, chance_ppm, kappa_ppm),
      all exact integers:

        kappa_ppm = 1e6 * (n * n_agree - S) div (n * n - S),
        S = sum over labels of count_a(l) * count_b(l)

    which is algebraically (po - pe) / (1 - pe) scaled to ppm with a
    single truncating division (no intermediate float). Rows with a NULL
    on either side are excluded (unlabeled, not disagreement). A
    degenerate pair (pe = 1: both raters constant with the same label)
    returns kappa_ppm = 1000000 when in full agreement, else 0, by the
    CASE guard.

    Plan: one aggregation for the matrix; the summary folds the matrix
    (label-cardinality-sized) — driver-safe at any corpus size.
    """
    base = df.select(
        F.col(a_col).cast("string").alias("label_a"),
        F.col(b_col).cast("string").alias("label_b"),
    ).where(F.col("label_a").isNotNull() & F.col("label_b").isNotNull())
    confusion = base.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ca = confusion.groupBy(F.col("label_a").alias("l")).agg(
        F.sum("n").alias("na")
    )
    cb = confusion.groupBy(F.col("label_b").alias("l")).agg(
        F.sum("n").alias("nb")
    )
    s = ca.join(cb, "l").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .cast("long").alias("s")
    )
    tot = confusion.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("label_a") == F.col("label_b"),
                         F.col("n")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("long").alias("n_agree"),
    )
    summary = tot.crossJoin(s).select(
        "n", "n_agree",
        F.expr("CASE WHEN n > 0 THEN (1000000 * n_agree) div n "
               "ELSE 0 END").cast("long").alias("agree_ppm"),
        F.expr("CASE WHEN n > 0 THEN (1000000 * s) div (n * n) "
               "ELSE 0 END").cast("long").alias("chance_ppm"),
        F.expr(
            "CASE WHEN n * n = s THEN "
            "  CASE WHEN n_agree = n THEN 1000000 ELSE 0 END "
            "ELSE (1000000 * (n * n_agree - s)) div (n * n - s) END"
        ).cast("long").alias("kappa_ppm"),
    )
    return confusion, summary


def fim_splits(
    df: DataFrame,
    rate_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022, the
    PSM format): a hash-selected `rate_pct`% of documents are split at
    two hash-derived cut points into prefix/middle/suffix and re-emitted
    as  prefix <FIM_SUF> suffix <FIM_MID> middle  so an autoregressive
    model learns infilling; unselected docs pass through (cut1 = cut2 =
    -1). The "randomness" is md5 of the doc id (the kgtrain posture):
    replayable across re-runs and retried tasks, SQL-replicable.

    Map-only column expressions — substr arithmetic on code points, no
    Python, no shuffle; cut points are uniform over [0, len] via
    hex6 % (len + 1).
    """
    from kgspark.kgtrain import _hex6_to_int

    t = F.col(text_col)
    ln = F.length(t)
    did = F.col(id_col).cast("string")
    sel = (
        _hex6_to_int(F.md5(F.concat(F.lit("fim:"), did))) % 100
        < F.lit(rate_pct)
    ) & (ln >= 2)
    c_a = _hex6_to_int(F.md5(F.concat(F.lit("a:"), did))) % (ln + 1)
    c_b = _hex6_to_int(F.md5(F.concat(F.lit("b:"), did))) % (ln + 1)
    cut1 = F.least(c_a, c_b)
    cut2 = F.greatest(c_a, c_b)
    prefix = F.substring(t, 1, cut1)
    middle = F.substring(t, cut1 + 1, cut2 - cut1)
    suffix = F.substring(t, cut2 + 1, ln)
    fim = F.concat(prefix, F.lit("<FIM_SUF>"), suffix,
                   F.lit("<FIM_MID>"), middle)
    return df.select(
        F.col(id_col),
        F.when(sel, cut1).otherwise(F.lit(-1)).cast("long").alias("cut1"),
        F.when(sel, cut2).otherwise(F.lit(-1)).cast("long").alias("cut2"),
        F.when(sel, fim).otherwise(t).alias("fim_text"),
    )
