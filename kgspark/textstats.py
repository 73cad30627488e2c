"""Text analysis for corpus curation: language-ID, quality scoring, token
counting, document fingerprinting.

All four are pure column expressions (whole-stage-codegen, no Python
crossing) built from ASCII-safe primitives that behave identically in Spark
and DuckDB — each operator has a SQL oracle. Regex classes are ASCII-literal
(`[a-z]`, explicit char sets) because Java and RE2 diverge on `\\w`/`\\s`
unicode semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Small high-frequency function-word lists; enough signal for n-gram-free
# language ID on web text. Deliberately tiny so the SQL oracle can inline them.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"],
}


def ws_tokens(col):
    """Whitespace tokens, lowercased, empties dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col):
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def subword_count(col):
    """BPE-ish unit count: alpha runs are ~4.2 chars/unit (GPT-family rule of
    thumb), digits and punctuation are one unit each. A deterministic,
    tokenizer-free budget estimator for LLM-training curation."""
    alpha_chars = F.length(F.regexp_replace(col, "[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(col, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(col, "[a-zA-Z0-9 \t\n\r]", ""))
    return (F.ceil(alpha_chars / F.lit(4.2)) + digits + punct).cast("long")


def stopword_hits(col, lang: str):
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(ws_tokens(col), lambda t: t.isin(*words)))


def lang_scores(col):
    """struct of per-language stopword-hit ratios."""
    n = token_count(col)
    return F.struct(
        *[
            (stopword_hits(col, lang) / F.greatest(n, F.lit(1))).alias(lang)
            for lang in sorted(LANG_STOPWORDS)
        ]
    )


def lang_id_exprs(t):
    """(detected_lang expr, lang_score expr) over a text column — the
    expression-level core of lang_id, so callers composing several per-doc
    signals (e.g. curate()) can evaluate everything in ONE map-side select
    instead of a join per signal."""
    langs = sorted(LANG_STOPWORDS)
    scores = [
        stopword_hits(t, lg) / F.greatest(token_count(t), F.lit(1))
        for lg in langs
    ]
    best = F.greatest(*scores)
    pick = F.coalesce(*[F.when(s == best, F.lit(lg)) for s, lg in zip(scores, langs)])
    return pick, F.round(best, 6)


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, detected_lang, lang_score): argmax stopword ratio, ties broken by
    language code ascending — fully deterministic."""
    pick, best = lang_id_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        pick.alias("detected_lang"),
        best.alias("lang_score"),
    )


def quality_score_expr(t):
    """The quality_features score as a single expression (see
    quality_features for the formula) — for one-select composition."""
    n_tok = token_count(t)
    n_chars = F.length(t)
    mean_tok_len = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = stopword_hits(t, "en") / F.greatest(n_tok, F.lit(1))
    stop_sig = F.least(stop_ratio, F.lit(0.5)) / F.lit(0.5)
    len_sig = F.least(n_tok, F.lit(100)) / F.lit(100.0)
    shape_sig = F.when(
        (mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score = F.lit(0.4) * stop_sig + F.lit(0.3) * len_sig + F.lit(0.3) * shape_sig
    return F.round(score, 6)


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc curation features + a single quality score in [0, 1].

    score = 0.4*stopword_signal + 0.3*length_signal + 0.3*word_shape_signal
      - stopword_signal: en stopword ratio clipped to [0, 0.5] / 0.5
      - length_signal:   min(n_tokens, 100) / 100
      - word_shape:      mean token length in [3, 12] -> 1 else decays
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    mean_tok_len = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = stopword_hits(t, "en") / F.greatest(n_tok, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(t, "[a-zA-Z0-9 ]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    digit_ratio = F.length(F.regexp_replace(t, "[^0-9]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop_sig = F.least(stop_ratio, F.lit(0.5)) / F.lit(0.5)
    len_sig = F.least(n_tok, F.lit(100)) / F.lit(100.0)
    shape_sig = F.when(
        (mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score = F.lit(0.4) * stop_sig + F.lit(0.3) * len_sig + F.lit(0.3) * shape_sig
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc readability: Flesch reading ease + Flesch-Kincaid grade.

    The classic curation signal for separating fluent prose from word-salad
    and legalese (Flesch 1948; Kincaid 1975) — a standard quality-filter
    column in web-corpus pipelines alongside the stopword/LM scores.

      syllables ~= count of vowel-group runs [aeiouy]+ per text — the
                   standard dictionary-free estimator
      sentences  = count of terminator runs [.!?]+, floored at 1
      ease       = 206.835 - 1.015*(words/sents) - 84.6*(syll/words)
      fk_grade   = 0.39*(words/sents) + 11.8*(syll/words) - 15.59

    Pure column expressions (regexp_count + arithmetic) — map-only, zero
    shuffles. Docs with no words get NULL scores (annotate-don't-drop).
    The integer inputs (n_words, n_sentences, n_syllables) are returned so
    exact cross-engine checks can clear the fp64 denominators (the
    contract oracle compares the integer combination
    206835*w*s - 1015*w*w - 84600*sy*s, which is ease*1000*w*s exactly)."""
    t = F.col(text_col)
    w = token_count(t)
    s = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    sy = F.regexp_count(F.lower(t), F.lit("[aeiouy]+"))
    wps = w.cast("double") / s.cast("double")
    spw = sy.cast("double") / w.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    has_words = w > 0
    return df.select(
        F.col(id_col),
        w.cast("long").alias("n_words"),
        s.cast("long").alias("n_sentences"),
        sy.cast("long").alias("n_syllables"),
        F.when(has_words, F.round(ease, 4)).alias("flesch_ease"),
        F.when(has_words, F.round(grade, 4)).alias("fk_grade"),
    )


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group corpus statistics for curation dashboards: doc/token
    volume, char-length distribution (exact interpolated percentiles — the
    same quantile_cont semantics every SQL engine exposes, so the numbers
    are portable across reporting stacks)."""
    t = F.col(text_col)
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(t)).cast("long").alias("total_tokens"),
            F.round(F.avg(F.length(t)), 4).alias("mean_chars"),
            F.round(F.expr(f"percentile(length({text_col}), 0.5)"), 4).alias("p50_chars"),
            F.round(F.expr(f"percentile(length({text_col}), 0.9)"), 4).alias("p90_chars"),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals for training-data curation:

      top_2gram_frac  occurrences of the most repeated word 2-gram over all
                      2-gram occurrences — boilerplate/spam pages spike here
      dup_token_frac  1 - distinct/total tokens — templated repetition

    The 2-gram mode is computed with explode + groupBy (shuffle-based, stays
    linear per doc at any page size) — a HOF count-per-distinct-gram would be
    O(tokens^2) per row. dup_token_frac is a pure column expression.

    The token table is MATERIALIZED before the n-gram HOF: Catalyst's
    projection collapse substitutes the tokenize expression into every slice
    access of the ngrams_of lambda otherwise — the O(tokens^2)-per-row
    re-evaluation trap (measured 13.4 s -> 1.5 s at sf0.1)."""
    from kgspark.session import materialize
    from kgspark.topics import ngrams_of

    toks = materialize(
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
    )
    base = toks.select(
        id_col,
        F.size("__toks").alias("n_tok"),
        F.size(F.array_distinct("__toks")).alias("n_dist"),
        ngrams_of(F.col("__toks"), 2).alias("__grams"),
    )
    gc = (
        base.select(id_col, F.explode("__grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ga = gc.groupBy(id_col).agg(
        F.sum("c").alias("total"), F.max("c").alias("top")
    )
    return (
        base.drop("__grams")
        .join(ga, id_col, "left")
        .select(
            id_col,
            F.coalesce("total", F.lit(0)).cast("long").alias("n_2grams"),
            F.coalesce("top", F.lit(0)).cast("long").alias("top_2gram_count"),
            F.round(
                F.when(F.coalesce("total", F.lit(0)) > 0,
                       F.col("top") / F.col("total")).otherwise(F.lit(0.0)),
                6,
            ).alias("top_2gram_frac"),
            F.round(
                F.lit(1.0) - F.col("n_dist") / F.greatest("n_tok", F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                shingle_n: int = 5, bottom_k: int = 4) -> DataFrame:
    """(id, fingerprint): bottom-k sketch — the k smallest md5s of word
    n-gram shingles, joined with '|'. Robust to small edits (winnowing-style);
    equal fingerprints => near-identical documents."""
    from kgspark.dedup import word_shingles_from

    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("__toks")
    )
    sh = word_shingles_from(F.col("__toks"), shingle_n)
    hashes = F.array_sort(F.transform(sh, lambda g: F.md5(g)))
    return toks.select(
        F.col(id_col),
        F.array_join(F.slice(hashes, 1, bottom_k), "|").alias("fingerprint"),
    )


def vocab_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source vocabulary profile: (source, n_tokens, n_types, n_hapax)
    — total token occurrences, distinct types, and hapax legomena (types
    occurring exactly once in that source). Type/token and hapax/type
    ratios are the standard lexical-diversity diagnostics for corpus
    drift: scraped boilerplate collapses TTR, OCR noise and spam inflate
    the hapax share (every garbled word is unique).

    Two stacked aggregations — (source, token) counts, then per-source
    rollup — both partial-aggregated map-side; intermediate cardinality
    is per-source vocabulary, not corpus size. NULL sources roll up into
    their own row (audit-everything posture; filter upstream to drop)."""
    per_tok = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(ws_tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_tok.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long").alias("n_hapax"),
    )


def char_entropy_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-distribution entropy ingredients, in exact
    integer arithmetic.

    Shannon entropy H = ln(n) - (Σ_c cnt_c·ln(cnt_c)) / n over the raw
    characters of the text. Garbled/binary-ish junk scores high, repeated
    filler scores low — a classic cheap quality signal. To keep the score
    bit-reproducible across engines and partitionings, the fp64 piece is
    quantized per distinct character BEFORE any summation:
    sum_clnc_unats = Σ_c cnt_c · round(ln(cnt_c)·1e6) — exact long
    arithmetic (the integer posture of kgspark.nb/lm/search). `entropy`
    (fp64 nats, derived from the integers) is for human use; contract
    queries compare the integer columns.

    Shape: one explode + a map-side-combined (doc, char) count, then a
    doc-keyed sum — two shuffles, both combiner-friendly; no UDFs.
    Returns (id, n_chars_counted, sum_clnc_unats, entropy); empty/NULL
    texts keep a row with zeros.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(
            # split('', '') yields [''] — drop empties so empty/NULL texts
            # contribute zero characters (the oracle's comprehension form
            # never emits '')
            F.filter(
                F.coalesce(
                    F.split(F.col(text_col), ""),
                    F.expr("cast(array() as array<string>)"),
                ),
                lambda c: c != "",
            )
        ).alias("c"),
    )
    per_char = chars.groupBy(id_col, "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_doc = per_char.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_chars_counted"),
        F.sum(
            F.col("cnt")
            * F.round(F.log(F.col("cnt").cast("double")) * F.lit(1e6), 0)
            .cast("long")
        ).cast("long").alias("sum_clnc_unats"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_chars_counted", F.lit(0)).cast("long")
            .alias("n_chars_counted"),
            F.coalesce("sum_clnc_unats", F.lit(0)).cast("long")
            .alias("sum_clnc_unats"),
            F.when(
                F.col("n_chars_counted") > 0,
                F.log(F.col("n_chars_counted").cast("double"))
                - F.col("sum_clnc_unats").cast("double")
                / (F.col("n_chars_counted").cast("double") * F.lit(1e6)),
            ).otherwise(F.lit(0.0)).alias("entropy"),
        )
    )


def novelty_stats(
    df: DataFrame,
    n: int = 3,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate-ness: how many of a doc's distinct word
    n-grams are CORPUS-COMMON (appear in >= min_df documents).

    The soft-dedup signal: a doc whose gram mass is mostly corpus-common
    is template/boilerplate even when no single near-duplicate exists
    (complements dedup's pairwise detectors and repetition_stats'
    within-doc view). Returns (id, n_grams, n_common) — exact integers.

    Shape: distinct grams per doc (one corpus-sized shuffle, map-side
    combined), gram document-frequencies (same stream re-aggregated), one
    gram-keyed join back. Stop-phrase grams are the hot keys; AQE
    skew-join splits them. Docs with < n tokens have no grams and report
    zeros.
    """
    from kgspark.decontam import _distinct_grams
    from kgspark.session import materialize

    grams = materialize(_distinct_grams(df, id_col, text_col, n))
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        grams.join(dfreq, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0))
            .cast("long").alias("n_common"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        )
    )


def stopword_discovery(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_ratio: float = 0.5,
) -> DataFrame:
    """Corpus-driven stopword table: (token, doc_freq, term_freq,
    is_stopword) where is_stopword marks tokens appearing in >= df_ratio of
    documents. The data-derived replacement for the fixed per-language
    stopword lists above — at web scale the corpus itself says which tokens
    carry no signal (and does so per-domain/per-language slice if grouped
    upstream).

    Scale: one tokenize+explode pass, one agg shuffle keyed by token, and
    the corpus doc count rides along as a broadcast 1-row aggregate. The
    token-keyed agg is the same footprint as any vocabulary build
    (kgspark.bpe.word_counts); skewed head tokens are exactly what partial
    (map-side) aggregation absorbs.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), ws_tokens(F.col(text_col)).alias("__t")
    )
    ex = toks.select("__id", F.explode("__t").alias("token"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    # doc frequency the scalable way: distinct (map-side combinable) then
    # count — never a collect_list of doc ids per token, which OOMs on a
    # 10^9-doc head token.
    docfreq = ex.distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    tf = ex.groupBy("token").agg(F.count(F.lit(1)).alias("term_freq"))
    return (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("term_freq").cast("long").alias("term_freq"),
            (F.col("doc_freq") >= F.lit(df_ratio) * F.col("__n"))
            .alias("is_stopword"),
        )
    )


def script_mix(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-class census per document: (id, n_chars, n_latin, n_digit,
    n_ws, n_other, latin_permille). The cheap script/encoding triage that
    runs BEFORE language ID in a multilingual crawl — mojibake, binary
    spill, and CJK/Cyrillic pages all surface as n_other spikes without
    any per-language model. All counts are regex-strip lengths in the
    Java∩RE2∩DuckDB subset ([ -~] printable-ASCII idiom, no \\p classes),
    so the op is one map-side JVM expression and the oracle is literal.

    latin_permille is exact integer arithmetic (1000*latin div chars) —
    no fp64 in the contract columns.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_latin = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_ws = F.length(F.regexp_replace(t, r"[^ \t\n\r]", ""))
    n_other = n_chars - n_latin - n_digit - n_ws
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_latin.cast("long").alias("n_latin"),
        n_digit.cast("long").alias("n_digit"),
        n_ws.cast("long").alias("n_ws"),
        n_other.cast("long").alias("n_other"),
        # floor((1000*latin)/chars): fp64 division of two small ints can't
        # land within an ulp of an integer unless the quotient IS that
        # integer (denominator <= ~1e6), so floor() == exact integer DIV
        # on both engines
        F.when(
            n_chars > 0,
            F.floor((F.lit(1000) * n_latin) / n_chars),
        ).otherwise(F.lit(0)).cast("long").alias("latin_permille"),
    )


def heaps_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative token count vs
    cumulative distinct type count at `buckets` corpus-prefix checkpoints
    (docs in id order). The curve V(n) ≈ K·n^β (Heaps 1978) is the
    standard corpus-health diagnostic — a near-linear curve means the
    corpus keeps injecting novel vocabulary (OCR noise, boilerplate IDs),
    a flat one means it's saturated/duplicated.

    Returns (bucket, cum_docs, cum_tokens, cum_types) — all exact longs,
    all cumulative over the id-ordered corpus prefix.

    Shape: tokens explode once; new-type attribution is min(id) per type
    (one groupBy); per-bucket sums reduce everything to `buckets` rows and
    ONLY THEN does a cumulative window run — the global order lives on a
    buckets-row table, never on the corpus. At 100 TB: two shuffles
    (type groupBy, bucket groupBy) and a trivially small window.
    """
    if buckets < 1:
        raise ValueError("heaps_curve: buckets must be >= 1")
    base = df.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    hi = base.agg(F.max("__id").alias("__max"))
    bucket = F.least(
        F.lit(buckets - 1),
        F.expr(f"__id * {buckets} div (__max + 1)"),
    ).cast("long")
    toks = base.crossJoin(F.broadcast(hi)).select(
        "__id",
        bucket.alias("bucket"),
        F.explode(ws_tokens(F.col("__t"))).alias("tok"),
    )
    per_bucket_tokens = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.countDistinct("__id").cast("long").alias("n_docs"),
    )
    new_types = (
        toks.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    folded = per_bucket_tokens.join(new_types, "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_tok",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return folded.select(
        "bucket",
        F.sum("n_docs").over(w).cast("long").alias("cum_docs"),
        F.sum("n_tok").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new").over(w).cast("long").alias("cum_types"),
    )


def source_divergence(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the corpus-drift / domain-shift matrix ("how unlike
    is src_a's language vs src_b's?") that mixing policies and
    contamination triage read first. Returns one row per unordered pair:

      (source_a, source_b, n_shared, jsd2_micro)

    where jsd2_micro = 2·JSD in integer micro-nats. JSD = ½Σ_t
    [P ln(2P/(P+Q)) + Q ln(2Q/(P+Q))] with absent-token terms collapsing
    to (missing-side mass)·ln 2; bounded in [0, ln 2].

    Determinism: every token's contribution is quantized to a micro-nat
    long BEFORE summation (the kgspark.nb posture), so the pair sums are
    exact integer arithmetic under any partitioning; the two one-sided
    mass terms are single quantized fp64 ops each.

    Shape: one corpus shuffle (token counts per source), then a
    token-keyed self-join of the per-source COUNT table (rows = Σ_t
    C(sources_with_t, 2) — source cardinality is dimension-like, so this
    is vocab-sized, never corpus-sized) and one pair groupBy.
    """
    toks = df.where(
        F.col(source_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(source_col).alias("src"),
        F.explode(ws_tokens(F.col(text_col))).alias("tok"),
    )
    cnt = toks.groupBy("src", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("src").agg(F.sum("c").cast("long").alias("n"))
    probs = cnt.join(tot, "src")
    a = probs.select(
        F.col("src").alias("source_a"), "tok",
        F.col("c").alias("ca"), F.col("n").alias("na"),
    )
    b = probs.select(
        F.col("src").alias("source_b"), "tok",
        F.col("c").alias("cb"), F.col("n").alias("nb"),
    )
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    term = F.round(
        (
            pa * F.log(F.lit(2.0) * pa / (pa + pb))
            + pb * F.log(F.lit(2.0) * pb / (pa + pb))
        )
        * 1000000.0,
        0,
    ).cast("long")
    both = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum(term).cast("long").alias("shared_micro"),
            F.sum("ca").cast("long").alias("ca_shared"),
            F.sum("cb").cast("long").alias("cb_shared"),
        )
    )
    # every unordered source pair appears, even fully disjoint ones
    # (JSD = ln 2) — the pair frame comes from the dimension-sized
    # totals table, so this is a tiny crossJoin, never corpus-sized
    frame = (
        tot.select(F.col("src").alias("source_a"), F.col("n").alias("na"))
        .crossJoin(
            tot.select(F.col("src").alias("source_b"),
                       F.col("n").alias("nb"))
        )
        .where(F.col("source_a") < F.col("source_b"))
    )
    filled = frame.join(both, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        F.coalesce("shared_micro", F.lit(0)).alias("shared_micro"),
        F.coalesce("ca_shared", F.lit(0)).alias("ca_shared"),
        F.coalesce("cb_shared", F.lit(0)).alias("cb_shared"),
        "na",
        "nb",
    )
    ln2 = F.log(F.lit(2.0))
    only_a = F.round(
        (F.lit(1.0) - F.col("ca_shared").cast("double")
         / F.col("na").cast("double")) * ln2 * 1000000.0, 0
    ).cast("long")
    only_b = F.round(
        (F.lit(1.0) - F.col("cb_shared").cast("double")
         / F.col("nb").cast("double")) * ln2 * 1000000.0, 0
    ).cast("long")
    return filled.select(
        "source_a",
        "source_b",
        "n_shared",
        (F.col("shared_micro") + only_a + only_b).cast("long").alias(
            "jsd2_micro"
        ),
    )


def code_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Code-vs-prose signals — the curation split every pretraining mix
    needs (route code to the code pipeline, keep prose filters from
    eating source files): per doc exact-integer counts of

      n_braces / n_semis / n_equals   {} ; = occurrences
      n_indent_lines                  lines starting with 2+ spaces or tab
      n_camel                         lowerUpper camelCase boundaries
      n_snake                         [a-z0-9]_[a-z] snake_case joints
      max_line_chars                  longest line
      is_codey                        1 when the integer rule fires:
                                      10·(braces+semis) ≥ n_lines AND
                                      n_indent_lines·3 ≥ n_lines

    Pure regexp_count/aggregate column expressions in the
    Java∩RE2∩DuckDB-common subset — map-only, codegen'd.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_braces = F.regexp_count(t, F.lit(r"[{}]"))
    n_semis = F.regexp_count(t, F.lit(";"))
    n_equals = F.regexp_count(t, F.lit("="))
    n_indent = F.size(
        F.filter(lines, lambda ln: ln.rlike("^(  |\t)"))
    )
    n_camel = F.regexp_count(t, F.lit("[a-z][A-Z]"))
    n_snake = F.regexp_count(t, F.lit("[a-z0-9]_[a-z]"))
    max_line = F.array_max(
        F.transform(lines, lambda ln: F.length(ln))
    )
    codey = (
        (F.lit(10) * (n_braces + n_semis) >= n_lines)
        & (n_indent * 3 >= n_lines)
    )
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_braces.cast("long").alias("n_braces"),
        n_semis.cast("long").alias("n_semis"),
        n_equals.cast("long").alias("n_equals"),
        n_indent.cast("long").alias("n_indent_lines"),
        n_camel.cast("long").alias("n_camel"),
        n_snake.cast("long").alias("n_snake"),
        max_line.cast("long").alias("max_line_chars"),
        F.when(codey, 1).otherwise(0).cast("long").alias("is_codey"),
    )


def rank_correlation(
    df: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
) -> DataFrame:
    """Spearman rank correlation between two per-row signals as ONE
    exact-integer row: (n, sum_d2, rho_ppm) with

      rho_ppm = ((n³−n) − 6·Σd²) · 1e6 div (n³−n)

    — the classic Spearman formula multiplied out so no fp division ever
    happens; ranks are row_number under the total (value, id) order (the
    deterministic tie policy every ranked contract in this repo uses;
    with ties this is a rank-ordering correlation, stated explicitly).
    The cross-signal diagnostic for curation scorers: "does my cheap
    signal order documents like my expensive one?"

    Shape: two global-ish window sorts — acceptable because the input is
    a per-document SIGNAL table (one row per doc, two longs), and at
    true corpus scale the caller samples first (the same calibration
    posture as lsh_recall_report). Rows with a NULL signal are dropped.
    """
    base = df.where(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(a_col).alias("__a"),
        F.col(b_col).alias("__b"),
    )
    ra = F.row_number().over(Window.orderBy("__a", "__id"))
    ranked_a = base.select("__id", "__b", ra.alias("__ra"))
    rb = F.row_number().over(Window.orderBy("__b", "__id"))
    ranked = ranked_a.select("__id", "__ra", rb.alias("__rb"))
    d = (F.col("__ra") - F.col("__rb")).cast("long")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(d * d), F.lit(0)).cast("long").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        F.expr(
            "CASE WHEN n < 2 THEN -1"
            " ELSE ((n*n*n - n) - 6 * sum_d2) * 1000000"
            " div (n*n*n - n) END"
        ).cast("long").alias("rho_ppm"),
    )


def mojibake_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Encoding-artifact census per source — the first health check a
    web-corpus curation pipeline runs after text extraction (ref's
    clean_text normalizes but cannot repair double-encoded text,
    knowledgeGraph.py:14-30): per source —

      n_docs
      n_mojibake     docs showing classic UTF-8-read-as-CP1252 artifacts
                     (literal 'Ã', 'â€', 'Â'): é -> Ã©, ' -> â€™, NBSP -> Â
      n_replacement  docs containing U+FFFD (lossy transcode happened)
      n_ctrl         docs with C0 control bytes other than \\t \\n \\r
      *_ppm          integer-ppm rates (exact, cross-engine stable)

    Sources with high rates get routed back through charset re-detection
    before any downstream op trusts their tokens.

    Shape: substring probes (JVM `contains`, no regex backtracking) + one
    source-keyed groupBy — map-side combinable, scan-dominated, safe at
    any corpus scale.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    is_moji = (
        t.contains("Ã") | t.contains("â€") | t.contains("Â")
    ).cast("long")
    is_repl = t.contains("�").cast("long")
    is_ctrl = t.rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]").cast("long")
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(is_moji).cast("long").alias("n_mojibake"),
            F.sum(is_repl).cast("long").alias("n_replacement"),
            F.sum(is_ctrl).cast("long").alias("n_ctrl"),
        )
        .select(
            "source",
            "n_docs",
            "n_mojibake",
            "n_replacement",
            "n_ctrl",
            F.expr("n_mojibake * 1000000 div n_docs").cast("long").alias(
                "mojibake_ppm"
            ),
            F.expr("n_replacement * 1000000 div n_docs").cast("long").alias(
                "replacement_ppm"
            ),
            F.expr("n_ctrl * 1000000 div n_docs").cast("long").alias(
                "ctrl_ppm"
            ),
        )
    )


def zipf_profile(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    ranks: tuple[int, ...] = (1, 10, 100, 1000),
) -> DataFrame:
    """Per-source Zipf decade profile: the term, its frequency, and the
    decade-to-decade frequency decay at fixed frequency ranks (1, 10,
    100, 1000 by default). ``decay_ppm`` = freq(rank) * 1e6 //
    freq(previous decade rank) — for an ideal Zipf law (freq ∝ 1/rank)
    every decade decays to ~100000 ppm; boilerplate-heavy scrapes decay
    much faster at the head, spam/OCR noise much slower at the tail.
    This is the slope diagnostic of a log-log rank/frequency plot with
    NO floating point: frequencies at fixed ranks are exact integers, so
    the profile hashes identically cross-engine (the repo-wide
    integer-parity posture; an OLS fit of ln f on ln r would ride on
    order-dependent float sums).

    Scale: token counts are two map-side partial aggregations over the
    per-source vocabulary (never corpus-row cardinality). The rank
    window filters ``rank <= max(ranks)`` immediately above the
    row_number, which Spark rewrites to WindowGroupLimit — each map task
    keeps only its local top-k per source before the shuffle, so a 100M-
    type source never sorts its full vocabulary in one task. The decade
    self-join runs on <= len(ranks) rows per source. Ranks are totally
    ordered by (freq desc, term asc) so every emitted row is
    deterministic. Sources with fewer types than a rank simply have no
    row at that rank.
    """
    ranks = tuple(sorted(set(int(r) for r in ranks)))
    if not ranks or ranks[0] < 1:
        raise ValueError("zipf_profile: ranks must be positive integers")
    per_tok = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(ws_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    ranked = (
        per_tok.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ranks[-1])
        .where(F.col("rank").isin(list(ranks)))
        .select("source", "rank", "term", F.col("freq").cast("long"))
    )
    prev_case = F.lit(None).cast("int")
    for prev_r, r in zip(ranks, ranks[1:]):
        prev_case = F.when(F.col("rank") == r, F.lit(prev_r)).otherwise(
            prev_case
        )
    prev = ranked.select(
        F.col("source").alias("source"),
        F.col("rank").alias("__prev_rank"),
        F.col("freq").alias("__prev_freq"),
    )
    out = (
        ranked.withColumn("__prev_rank", prev_case)
        .join(prev, ["source", "__prev_rank"], "left")
        .select(
            "source",
            F.col("rank").cast("long").alias("rank"),
            "term",
            "freq",
            F.when(
                F.col("__prev_freq").isNotNull(),
                F.expr("freq * 1000000 div __prev_freq"),
            )
            .otherwise(F.lit(1000000))
            .cast("long")
            .alias("decay_ppm"),
        )
    )
    return out


def wilson_bounds(
    df: DataFrame,
    key_col: str,
    flag_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-key Wilson score interval for a boolean rate — the right way
    to rank sources/domains by a defect rate when group sizes differ
    wildly (a 2/3 source must NOT outrank a 180/1000 one; the plain rate
    says it does, the Wilson lower bound never does). Classic corpus use:
    order sources by lower-bound duplicate/boilerplate/PII rate before
    applying per-source caps.

    Emits (key, n, k, rate_ppm, wilson_lo, wilson_hi); bounds are fp64
    with the identical expression tree on any engine — the only
    irrational step is sqrt, which IEEE 754 requires correctly rounded
    (the repo-wide alpha=0.5-through-sqrt parity rule) — rounded to 6
    places; rate_ppm is exact-integer truncation.

    Scale shape: one partial-aggregated groupBy(key) over (count, sum) —
    a map-side-combined single shuffle; the interval arithmetic is
    constant work per group.
    """
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("k"),
    )
    # p̂ and the Wilson terms, all in fp64 from the exact integers
    zz = float(z) * float(z)
    p = F.col("k").cast("double") / F.col("n").cast("double")
    nn = F.col("n").cast("double")
    center = p + F.lit(zz) / (2.0 * nn)
    half = F.lit(float(z)) * F.sqrt(
        p * (F.lit(1.0) - p) / nn + F.lit(zz) / (4.0 * nn * nn)
    )
    denom = F.lit(1.0) + F.lit(zz) / nn
    return g.select(
        "key", "n", "k",
        F.expr("(k * 1000000) div n").cast("long").alias("rate_ppm"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


def benford_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """First-significant-digit census per key with an exact-integer
    divergence from Benford's law — a standard numeric-column forensics
    signal (fabricated or unit-mangled telemetry rarely obeys Benford;
    organically-grown magnitudes usually do). Benford expectation uses
    micro-units of log10(1 + 1/d) pinned as integer constants, so the
    divergence stat is exact-integer and cross-engine stable: dev_micro
    = Σ_d |observed_share_micro(d) − benford_micro(d)|.

    Rows with value <= 0 or NULL are excluded (no first significant
    digit). Emits (key, n, d1..d9 counts, dev_micro).

    Scale shape: map-only digit extraction (string of the absolute
    value's first nonzero digit via JVM exprs), then one groupBy(key).
    """
    # digit of the largest power-of-ten bucket: first char of the
    # integer part when >= 1, else first nonzero char of the decimals —
    # uniformly: first char of printf('%e') scientific form
    digit = F.substring(F.format_string("%e", F.col(value_col).cast("double")), 1, 1)
    base = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(F.col(key_col).alias("key"), digit.cast("int").alias("d"))
    )
    # log10(1+1/d) in micro-units, d = 1..9 (exact pinned constants)
    benford = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757]
    counts = [
        F.sum(F.when(F.col("d") == i + 1, 1).otherwise(0))
        .cast("long").alias(f"d{i + 1}")
        for i in range(9)
    ]
    g = base.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"), *counts
    )
    dev = None
    for i in range(9):
        term = F.abs(
            F.expr(f"(d{i + 1} * 1000000) div n") - F.lit(benford[i])
        )
        dev = term if dev is None else dev + term
    return g.select(
        "key", "n", *[f"d{i + 1}" for i in range(9)],
        dev.cast("long").alias("dev_micro"),
    )


def skeleton_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """Template-spam detection by structural skeleton: lowercase the
    text, collapse every digit run to ``9``, every letter run to ``w``
    and every space run to one space — what survives is the document's
    punctuation/layout skeleton, which machine-generated boilerplate
    ("{name} scored {n} points in {city}") shares across thousands of
    docs while organic prose almost never repeats exactly. Docs whose
    skeleton occurs >= min_df times are flagged — the standard
    cheap-first templated-page filter run before any near-dup pass
    (it catches what MinHash misses: same-template pages with disjoint
    vocabulary).

    All three rewrites are ASCII-literal regexes (the Java∩RE2 parity
    subset). Emits (id, skel_hash, skel_df, is_template).

    Scale shape: map-only skeletonization (JVM regex), one
    skeleton-keyed partial-agg census, one hash join back — skew-safe
    because the census side is one row per distinct skeleton.
    """
    skel = F.md5(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    "[0-9]+", "9",
                ),
                "[a-z]+", "w",
            ),
            "[ \\t]+", " ",
        )
    )
    base = df.select(F.col(id_col).alias("id"), skel.alias("skel_hash"))
    census = base.groupBy("skel_hash").agg(
        F.count(F.lit(1)).cast("long").alias("skel_df")
    )
    return base.join(census, "skel_hash").select(
        "id", "skel_hash", "skel_df",
        (F.col("skel_df") >= min_df).alias("is_template"),
    )


def good_turing_spectrum(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Good-Turing frequency spectrum (Good 1953; the count-of-counts
    table behind Katz/SGT smoothing): for every observed unigram count
    r, N_r = number of word types seen exactly r times, and the Turing
    adjusted count r* = (r+1) * N_{r+1} / N_r in truncated ppm —
    r_star_ppm < r*1e6 is the leave-one-out discount the smoother
    redistributes to unseen events (total unseen mass = N_1 / N).

    N_{r+1} is the literal next count (0 at spectrum gaps — where the
    raw Turing estimate is undefined, r_star_ppm = 0 and a smoother
    would fall back to the fitted power law), joined as r+1, never
    "next observed r". All values exact longs.

    Scale shape: one corpus token groupBy (the vocabulary), one
    vocabulary-sized count-of-counts groupBy, one self-join on r+1
    over the tiny spectrum table. Returns (r, n_r, n_next,
    r_star_ppm) ordered by r.
    """
    words = df.select(
        F.explode(ws_tokens(F.col(text_col))).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    spec = vocab.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    nxt = spec.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next")
    )
    return (
        spec.join(nxt, "r", "left")
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.coalesce("n_next", F.lit(0)).cast("long").alias("n_next"),
            F.expr(
                "(r + 1) * coalesce(n_next, 0) * 1000000L div n_r"
            ).cast("long").alias("r_star_ppm"),
        )
        .orderBy("r")
    )


def lang_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
) -> DataFrame:
    """Language SPAN segmentation: the document sliced into fixed
    `window`-token pseudo-sentences, each window language-identified
    with the lang_id stopword-argmax, adjacent same-language windows
    collapsed into spans by gaps-and-islands. The per-segment upgrade
    of lang_id's one-label-per-doc: web documents are routinely
    multilingual (boilerplate in one language, body in another;
    CCNet/CLD-style pipelines emit per-RANGE language labels exactly so
    the curation gate can keep the majority-language body and drop the
    rest).

    Determinism: window boundaries are fixed token offsets, the
    argmax + tie order is lang_id's (score equal → language code
    ascending), and span collapse is pure integer arithmetic
    (win − row_number), so the output is engine-exact even though the
    scores themselves are fp64 ratios (the text_langid posture).

    Emits (id, lang, start_win, end_win, n_windows) — one row per
    maximal same-language run of windows.

    Scale shape: tokens materialized BEFORE the window HOF (the
    CollapseProject re-evaluation trap), then one posexplode + a
    per-(doc, lang) window function — doc-parallel, no corpus state.
    """
    from kgspark.session import materialize

    toks = ws_tokens(F.coalesce(F.col(text_col), F.lit("")))
    t0 = materialize(
        df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    )
    n = F.size("__toks")
    nw = F.expr(f"(size(__toks) + {window - 1}) div {window}")
    wins = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), (nw - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), i * window + 1, window), " "
        ),
    )).otherwise(F.array().cast("array<string>"))
    base = t0.select(
        "id", F.posexplode(wins).alias("win", "wtext")
    )
    pick, _score = lang_id_exprs(F.col("wtext"))
    per = base.select("id", "win", pick.alias("lang"))
    w = Window.partitionBy("id", "lang").orderBy("win")
    spans = (
        per.withColumn(
            "grp", F.col("win") - F.row_number().over(w)
        )
        .groupBy("id", "lang", "grp")
        .agg(
            F.min("win").cast("long").alias("start_win"),
            F.max("win").cast("long").alias("end_win"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .drop("grp")
    )
    return spans.select("id", "lang", "start_win", "end_win", "n_windows")
