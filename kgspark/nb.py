"""Distributed multinomial Naive Bayes: corpus-trained source/quality
classifier in pure DataFrame aggregations — no MLlib fit, no model artifact.

A training-data pipeline constantly needs cheap document classifiers
(which crawl source does this look like? wiki-like vs boilerplate?); the
classic fastText/CCNet filtering step is a linear text classifier. The
reference has no classifier surface at all (it ingests one uploaded file,
/root/reference/knowledgeGraph.py:85-97); this module is part of the
beyond-reference curation surface (SURVEY.md §8), in the spirit of
`kgspark.lm` (corpus-trained bigram LM) but supervised by an existing
label column.

Train = three bounded aggregations over ONE materialized token table:
  - class priors:        groupBy(label)        -> n_docs, tot_tokens
  - token likelihoods:   groupBy(label, token) -> cnt
  - vocabulary size:     distinct token count (1-row aggregate)
Count tables are bounded by |vocab| x |classes|, not corpus size.

Score = the (id, token) occurrence stream replicated per class (classes
are dimension-sized, broadcast), left-joined against the count table on
(label, token) — one key-partitioned shuffle; stop-word keys are exactly
the token-frequency skew AQE's skew-join handles.

Determinism contract: every per-token log-likelihood is quantized to
INTEGER micro-nats (round(ln(p) * 1e6) as long) BEFORE summation. Long
addition is associative, so document scores are bit-identical across
partitionings, AQE re-plans, retries — and across engines, which is what
lets the DuckDB oracle reproduce them exactly (fp64 sum order is the one
thing a cross-engine hash check cannot pin down; see CLAUDE.md). The
~1e-6-nat quantization error is orders of magnitude below any decision
margin a bag-of-words classifier produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["train_nb", "score_nb", "classify_nb", "roc_auc",
           "calibration_bins"]

_QUANT = 1e6  # micro-nats


def _unats(log_col: F.Column) -> F.Column:
    return F.round(log_col * F.lit(_QUANT), 0).cast("long")


def _token_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = materialize(
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("t"))
    )
    return toks.select(F.col(id_col), F.explode("t").alias("token"))


def train_nb(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fit the model; returns (classes, token_counts).

    classes: (label, prior_unats, tot_tokens, v) — one row per class,
    carrying the quantized log prior ln(n_docs_c / n_docs) and the
    add-1-smoothing denominator ingredients. token_counts: (label, token,
    cnt) — observed occurrence counts only (absent pairs take cnt=0 at
    score time; the smoothed value needs no |V| x |C| materialization).
    Rows with a NULL label are excluded from the fit.
    """
    labeled = df.where(F.col(label_col).isNotNull())
    stream = _token_stream(labeled, text_col, id_col).join(
        labeled.select(F.col(id_col), F.col(label_col).alias("label")), id_col
    )
    token_counts = (
        stream.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok_per_class = (
        stream.groupBy("label").agg(F.count(F.lit(1)).alias("tot_tokens"))
    )
    docs_per_class = (
        labeled.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n_total = labeled.agg(F.count(F.lit(1)).alias("__n"))
    vocab = token_counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("__v")
    )
    classes = (
        docs_per_class
        # classes with zero tokens (all-empty docs) still get a prior
        .join(tok_per_class, "label", "left")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            _unats(
                F.log(F.col("n_docs").cast("double")
                      / F.col("__n").cast("double"))
            ).alias("prior_unats"),
            F.coalesce("tot_tokens", F.lit(0)).cast("long")
            .alias("tot_tokens"),
            F.col("__v").cast("long").alias("v"),
        )
    )
    # |classes| rows, but its lineage is three full-corpus aggregations and
    # score_nb references it several times (two broadcasts per scoring
    # pass) — materialize so the corpus is aggregated once, not per
    # reference
    return materialize(classes), token_counts


def score_nb(
    df: DataFrame,
    classes: DataFrame,
    token_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, class) log-posterior scores in micro-nats: prior +
    Σ_occurrences ln((cnt + 1) / (tot_tokens_c + v)). Every document gets
    a row for every class (empty/NULL-text docs score on priors alone);
    out-of-vocabulary tokens take the smoothed cnt=0 likelihood, so
    scoring a corpus the model never saw stays finite."""
    stream = _token_stream(df, text_col, id_col)
    per_class = stream.crossJoin(
        F.broadcast(classes.select("label", "tot_tokens", "v"))
    )
    ll = per_class.join(token_counts, ["label", "token"], "left").select(
        F.col(id_col),
        "label",
        _unats(
            F.log(
                (F.coalesce("cnt", F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("tot_tokens") + F.col("v")).cast("double")
            )
        ).alias("__ll"),
    )
    sums = ll.groupBy(id_col, "label").agg(F.sum("__ll").alias("__sum"))
    return (
        df.select(F.col(id_col))
        .crossJoin(F.broadcast(classes.select("label", "prior_unats")))
        .join(sums, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (F.col("prior_unats") + F.coalesce("__sum", F.lit(0)))
            .cast("long")
            .alias("score_unats"),
        )
    )


def classify_nb(scores: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Argmax over score_nb() output: (id, pred, score_unats, margin_unats)
    with margin = best - runner-up (LONG arithmetic end-to-end, so the
    decision is exactly reproducible). Ties break on label ascending. The
    window partitions by document — thousands of rows per partition key
    at most |classes|, never a global window."""
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_unats").desc(), F.col("label").asc()
    )
    return (
        scores.select(
            F.col(id_col),
            F.col("label").alias("pred"),
            "score_unats",
            F.row_number().over(w).alias("__rn"),
            # runner-up rides the same window pass; single-class margin = 0
            F.coalesce(
                F.col("score_unats") - F.lead("score_unats").over(w),
                F.lit(0),
            ).cast("long").alias("margin_unats"),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def roc_auc(
    scores: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC of a binary scorer, tie-adjusted (the Mann-Whitney U
    identity): ONE row (n_pos, n_neg, auc_num_x2, auc_ppm) where

        auc_num_x2 = Σ over distinct scores s of p_s·(2·neg_below(s) + n_s)
        auc_ppm    = auc_num_x2 · 1e6  div  (2 · n_pos · n_neg)

    p_s/n_s = positives/negatives AT score s, neg_below = negatives with a
    strictly smaller score — ties contribute the standard ½ via the
    un-halved numerator, so everything stays exact integers and the row is
    hash-identical on any engine. Degenerate inputs (no positives or no
    negatives) emit the -1 sentinel in auc_ppm.

    Scale shape: one (score)-groupBy collapses the corpus to the distinct
    score values; the running negatives-below uses the range-partition +
    per-partition-offset pattern (kgtrain.ranked_entities rationale), NOT
    a single-partition global Window — the grouped table may still be
    corpus-sized when scores are fine-grained micro-nat sums.
    """
    spark = scores.sparkSession
    g = (
        scores.select(
            F.col(score_col).cast("long").alias("sc"),
            F.col(label_col).cast("int").alias("lb"),
        )
        .groupBy("sc")
        .agg(
            F.sum("lb").cast("long").alias("p"),
            F.sum(1 - F.col("lb")).cast("long").alias("n"),
        )
    )
    parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = materialize(
        g.repartitionByRange(parts, F.col("sc"))
        .withColumn("__pid", F.spark_partition_id())
    )
    sizes = {
        r["__pid"]: r["tn"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum("n").alias("tn")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid] or 0
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __off long",
    )
    w = (
        Window.partitionBy("__pid").orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        ranged.join(F.broadcast(off), "__pid")
        .select(
            "p", "n",
            (F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("__off"))
            .alias("cb"),
        )
    )
    return cum.agg(
        F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(
            F.sum(F.col("p") * (2 * F.col("cb") + F.col("n"))), F.lit(0)
        ).cast("long").alias("auc_num_x2"),
    ).select(
        "n_pos", "n_neg", "auc_num_x2",
        F.expr(
            "CASE WHEN n_pos * n_neg = 0 THEN -1 "
            "ELSE auc_num_x2 * 1000000 div (2 * n_pos * n_neg) END"
        ).cast("long").alias("auc_ppm"),
    )


def calibration_bins(
    scores: DataFrame,
    n_bins: int = 10,
    prob_col: str = "prob_ppm",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram census (the table behind ECE, Naeini et al.,
    AAAI 2015): bucket predicted probabilities (integer ppm, 0..1e6) into
    `n_bins` equal-width bins -> (bin, n, n_pos, mean_prob_ppm,
    frac_pos_ppm, gap_ppm) with gap_ppm = |mean_prob − frac_pos| — the
    per-bin calibration error; Σ n·gap div N downstream is ECE. Exact
    integer arithmetic (floor-div means) -> hash-deterministic. Empty bins
    are simply absent (the census reports evidence, not the grid).

    Scale shape: ONE map-side-combined groupBy on the bin id; no windows,
    no joins.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    binned = scores.select(
        F.col(prob_col).cast("long").alias("pp"),
        F.col(label_col).cast("long").alias("lb"),
    ).select(
        F.least(
            F.expr(f"pp * {n_bins} div 1000000"), F.lit(n_bins - 1)
        ).cast("long").alias("bin"),
        "pp", "lb",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lb").cast("long").alias("n_pos"),
        F.sum("pp").cast("long").alias("sum_pp"),
    )
    return agg.select(
        "bin", "n", "n_pos",
        F.expr("sum_pp div n").cast("long").alias("mean_prob_ppm"),
        F.expr("n_pos * 1000000 div n").cast("long").alias("frac_pos_ppm"),
        F.expr(
            "abs(sum_pp div n - n_pos * 1000000 div n)"
        ).cast("long").alias("gap_ppm"),
    )


def top_features(
    classes: DataFrame,
    token_counts: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Model explainability: per class, the top-k tokens by smoothed
    rate lift vs the rest of the corpus — the NB analogue of "what words
    make this classifier call a doc src7" (monotone in the log-odds the
    scorer actually adds, so the ranking IS the model's reasons, not a
    post-hoc correlate). Everything is exact-integer: in-class and
    rest-of-corpus add-1 rates in ppm, lift = in_ppm·1e6 div
    max(out_ppm, 1) — the same fixed-point posture as score_nb, so the
    ranking is bit-stable cross-engine (a float log-odds would tie-break
    differently per platform).

    Emits (label, token, cnt, lift_ppm, rank), rank 1..k per label,
    ordered by (lift_ppm desc, token asc) — a total order.

    Scale shape: one token-keyed rollup + a broadcast grand total + a
    WindowGroupLimit per-class top-k; never materializes |V| x |C|.
    """
    tot_all = token_counts.groupBy("token").agg(
        F.sum("cnt").cast("long").alias("cnt_all")
    )
    grand = classes.agg(
        F.sum("tot_tokens").cast("long").alias("__g")
    )
    per = (
        token_counts.join(tot_all, "token")
        .join(
            classes.select(
                "label",
                F.coalesce("tot_tokens", F.lit(0)).alias("tot_tokens"),
                "v",
            ),
            "label",
        )
        .crossJoin(F.broadcast(grand))
        .select(
            "label", "token", F.col("cnt").cast("long").alias("cnt"),
            F.expr(
                "((cnt + 1) * 1000000) div (tot_tokens + v)"
            ).alias("__in_ppm"),
            F.expr(
                "((cnt_all - cnt + 1) * 1000000) div (__g - tot_tokens + v)"
            ).alias("__out_ppm"),
        )
        .select(
            "label", "token", "cnt",
            F.expr("(__in_ppm * 1000000) div greatest(__out_ppm, 1)")
            .cast("long").alias("lift_ppm"),
        )
    )
    wdw = Window.partitionBy("label").orderBy(
        F.col("lift_ppm").desc(), F.col("token").asc()
    )
    return per.withColumn(
        "rank", F.row_number().over(wdw).cast("long")
    ).where(F.col("rank") <= k)
