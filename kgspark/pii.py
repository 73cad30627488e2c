"""PII detection + redaction as pure column expressions.

Standard pre-training curation step (the reference has no equivalent; C4 /
RefinedWeb-class pipelines all carry one): detect emails, IPv4 addresses,
SSN-shaped ids, card-shaped numbers and phone numbers, count them per
document, and emit a redacted text with typed placeholders.

Everything is JVM-side `regexp_extract_all` / `regexp_replace` — no Python
in the hot path, fully pushdown-friendly, and the patterns are written in
the regex subset Java and RE2 interpret identically (no lookaround, no
backreferences, `-` only at class end), so the DuckDB oracle (`text_pii`)
runs the byte-same patterns.

Redaction is a FIXED-ORDER chain (dict order below) and each type's count
is taken on the text as already redacted by the earlier types — so
overlapping matches (an SSN inside a longer digit run a phone pattern could
grab) resolve deterministically and identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered most-specific -> most-general; the phone pattern is last because
# it is the greediest digit-eater
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "card": r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
    # optional +CC prefix must carry its OWN separator: an optional-separator
    # prefix would eat the area code of a bare 3-3-4 number and kill the
    # match — '(555) 123-4567', '555-123-4567', '555.123.4567' and
    # '+1-555-123-4567' all match this form; fully-joined digit runs
    # ('+15551234567') are indistinguishable from ids and stay unmatched
    "phone": r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def _placeholder(name: str) -> str:
    return f"[{name.upper()}]"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Adds `n_<type>` count columns (long), `n_pii` total, and `out_col`
    with every match replaced by its typed placeholder. NULL text yields
    0 counts (not NULL — `where(n_pii > 0)` and `where(n_pii = 0)` must
    partition the corpus) and a NULL redaction."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat in PII_PATTERNS.items():
        n = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        counts.append(n.cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, _placeholder(name))
    redacted = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(cur)
    out = df.select("*", *counts, redacted.alias(out_col))
    total = sum((F.col(f"n_{name}") for name in PII_PATTERNS), F.lit(0))
    return out.withColumn("n_pii", total.cast("long"))


def kanon_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns
    (Sweeney 2002; Machanavajjhala 2007). Rows sharing a quasi-identifier
    tuple form an equivalence class; a class smaller than `k` re-identifies
    its members. Returns one row per distinct class SIZE:

      (class_size, n_classes, n_rows, below_k,
       [n_classes_low_div when sensitive_col])

    `below_k` is 1 when class_size < k. With `sensitive_col`,
    `n_classes_low_div` counts classes of that size holding fewer than
    `l_div` distinct sensitive values (homogeneity attack exposure).
    All counts are exact BIGINTs.

    The reference stores raw node text with no privacy surface (ref
    /root/reference/knowledge_graph_builder.py:137-168); this is
    beyond-reference curation-audit surface, standard before releasing
    quasi-structured web data.

    Scale shape: one map-side-combinable groupBy on the quasi tuple, then
    a class-size-domain-sized second agg (tiny). Hot classes are mere
    counters — no skew risk; nothing is collected.
    """
    aggs = [F.count(F.lit(1)).alias("__sz")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("__nd"))
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    outs = [
        F.count(F.lit(1)).alias("n_classes"),
    ]
    if sensitive_col is not None:
        outs.append(
            F.sum((F.col("__nd") < l_div).cast("long"))
            .alias("n_classes_low_div")
        )
    rep = sizes.groupBy("__sz").agg(*outs)
    cols = [
        F.col("__sz").cast("long").alias("class_size"),
        F.col("n_classes").cast("long").alias("n_classes"),
        (F.col("__sz") * F.col("n_classes")).cast("long").alias("n_rows"),
        (F.col("__sz") < k).cast("long").alias("below_k"),
    ]
    if sensitive_col is not None:
        cols.append(F.col("n_classes_low_div").cast("long"))
    return rep.select(*cols)


# 1-based char positions of the 16 digits inside the 4-4-4-4 layout
_CARD_DIGIT_POS = [1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14, 16, 17, 18, 19]


def _luhn_sum(cand):
    """Luhn mod-10 sum of a matched 4-4-4-4 card candidate as a pure
    JVM integer expression: digits at odd left positions (weight-2
    side for 16 digits) contribute 2d - 9*(d >= 5), the rest d."""
    total = F.lit(0)
    for i, pos in enumerate(_CARD_DIGIT_POS):
        d = F.substring(cand, pos, 1).cast("int")
        if i % 2 == 0:  # left positions 1,3,..,15 are doubled
            term = d * 2 - F.when(d >= 5, F.lit(9)).otherwise(F.lit(0))
        else:
            term = d
        total = total + term
    return total


def luhn_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_candidates, n_valid): card-SHAPED matches (the
    PII_PATTERNS 4-4-4-4 form) checked against the Luhn mod-10
    checksum (ISO/IEC 7812) — the standard false-positive filter on
    top of the shape regex: a random 16-digit string passes only 10%
    of the time, so `n_valid` is the census a DLP pass actually acts
    on. Pure JVM column arithmetic (fixed positions, 16 substring
    terms); NULL text counts as 0/0.
    """
    cands = df.select(
        F.col(id_col),
        F.explode_outer(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(PII_PATTERNS["card"]), F.lit(0),
            )
        ).alias("cand"),
    )
    valid = F.when(
        F.col("cand").isNotNull()
        & (_luhn_sum(F.col("cand")) % 10 == 0), 1
    ).otherwise(0)
    return cands.groupBy(id_col).agg(
        F.count("cand").cast("long").alias("n_candidates"),
        F.sum(valid).cast("long").alias("n_valid"),
    )


# Pinned IBAN registry slice (ISO 13616): country -> total length. A real
# deployment ships the full ~80-entry registry the same way; the census
# treats unknown countries as shape-only (length 15..34).
IBAN_COUNTRY_LEN: dict[str, int] = {
    "BE": 16, "NL": 18, "CH": 21, "DE": 22, "GB": 22, "ES": 24,
    "FR": 27, "IT": 27,
}

_IBAN_SHAPE = "^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$"


def iban_expand(col):
    """Replace every A-Z letter with its ISO 13616 two-digit code
    (A=10 .. Z=35) — a fixed 26-step replace chain (the ECHAR-chain
    posture from kgspark.rdf): replacements introduce only digits, so
    the chain cannot cascade. JVM-side `replace`, no regex."""
    out = col
    for i in range(26):
        out = F.replace(out, F.lit(chr(ord("A") + i)), F.lit(str(10 + i)))
    return out


def iban_mod97(col):
    """mod 97 of a decimal digit string (<= 70 digits) as a fixed
    10-chunk fold: lpad to 70 (leading zeros don't change the residue),
    then r <- (r * 10^7 + chunk) % 97 over 7-digit substrings — the
    whole big-integer reduction as one nested JVM integer expression
    (the 16-term Luhn posture, kgspark.pii._luhn_sum). try_cast keeps
    non-digit garbage NULL-propagating instead of ANSI-throwing."""
    s = F.lpad(col, 70, "0")
    r = F.substring(s, 1, 7).try_cast("long") % 97
    for i in range(1, 10):
        chunk = F.substring(s, 1 + 7 * i, 7).try_cast("long")
        r = (r * F.lit(10_000_000) + chunk) % 97
    return r


def iban_census(
    df: DataFrame,
    iban_col: str = "iban",
    id_col: str = "rec_id",
) -> DataFrame:
    """(id, iban, country, is_format, rem97, is_valid): IBAN (ISO
    13616) candidates checked against the MOD-97-10 checksum (ISO/IEC
    7064) — the canonical false-positive filter over account-shaped
    strings, the same role Luhn plays for cards: a random well-formed
    candidate passes ~1/97 of the time. Normalization (strip spaces,
    uppercase), the registry length gate, the rearrangement
    (body+country+check moved to the tail), letter expansion, and the
    chunked mod-97 fold are all pure JVM column arithmetic — map-only,
    no shuffle, no Python. rem97 is -1 for non-format rows (the NULL-
    sentinel posture); is_valid = is_format AND rem97 == 1.
    """
    c = F.upper(
        F.regexp_replace(F.coalesce(F.col(iban_col), F.lit("")), " ", "")
    )
    country = F.substring(c, 1, 2)
    known_len = F.lit(None).cast("int")
    for cc, ln in IBAN_COUNTRY_LEN.items():
        known_len = F.when(country == cc, F.lit(ln)).otherwise(known_len)
    len_ok = F.when(
        known_len.isNotNull(), F.length(c) == known_len
    ).otherwise((F.length(c) >= 15) & (F.length(c) <= 34))
    is_format = c.rlike(_IBAN_SHAPE) & len_ok
    rearr = F.concat(F.substring(c, 5, 64), F.substring(c, 1, 4))
    rem = iban_mod97(iban_expand(rearr))
    return df.select(
        F.col(id_col),
        c.alias("iban"),
        country.alias("country"),
        is_format.cast("int").alias("is_format"),
        F.when(is_format, rem).otherwise(F.lit(-1))
        .cast("long").alias("rem97"),
        (is_format & (rem == 1)).cast("int").alias("is_valid"),
    )


_GTIN_PATTERN = r"\b[0-9]{13}\b"


def gtin_weighted_sum(cand):
    """GS1 weighted sum over the first 12 digits of a 13-digit
    candidate: weight 1 at odd (1-based) positions, 3 at even — 12
    fixed substring terms, the Luhn posture (kgspark.pii._luhn_sum).
    The valid check digit is (10 − sum mod 10) mod 10."""
    total = None
    for i in range(12):
        d = F.substring(cand, i + 1, 1).cast("int")
        term = d * (1 if i % 2 == 0 else 3)
        total = term if total is None else total + term
    return total


def gtin_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_candidates, n_valid): GTIN-13/EAN-13 product-code
    candidates (13-digit runs) checked against the GS1 mod-10 check
    digit (ISO/IEC 15420 family) — the product-code sibling of
    luhn_census: a random 13-digit run passes 10% of the time, so
    n_valid is what a catalog-extraction pass actually keeps. Pure JVM
    column arithmetic (regex runs in the Java∩RE2 subset, 12 substring
    terms); NULL text counts as 0/0.
    """
    cands = df.select(
        F.col(id_col),
        F.explode_outer(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(_GTIN_PATTERN), F.lit(0),
            )
        ).alias("cand"),
    )
    valid = F.when(
        F.col("cand").isNotNull()
        & ((10 - gtin_weighted_sum(F.col("cand")) % 10) % 10
           == F.substring("cand", 13, 1).cast("int")),
        1,
    ).otherwise(0)
    return cands.groupBy(id_col).agg(
        F.count("cand").cast("long").alias("n_candidates"),
        F.sum(valid).cast("long").alias("n_valid"),
    )


_SECRET_PATTERN = r"\b[A-Za-z0-9+/_\-]{24,64}\b"


def secret_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_entropy_milli: int = 2900,
) -> DataFrame:
    """(id, cand, length, n_classes, entropy_milli, is_secret):
    high-entropy credential/token detection — the secret-scanning gate
    (truffleHog/gitleaks heuristic family) that checksum censuses
    (luhn/gtin/iban) cannot cover because API keys carry no check
    digit. Candidates are long base64/hex-ish runs; the signal is
    Shannon entropy over the candidate's own characters plus
    character-class diversity (lower/upper/digit/symbol), so prose
    words and repeated padding fail while real tokens pass.

    Entropy is computed from exact integer character counts c_i of the
    candidate (n = length): H = ln(n) − (Σ c_i·ln(c_i))/n nats,
    reported in milli-nats as round(1000·H) with the identical fp64
    expression tree in the oracle (the bm25/ln posture — counts are
    integers, the ln/round boundary is the only fp step).
    is_secret = entropy_milli ≥ min_entropy_milli AND n_classes ≥ 3.
    H is capped by ln(length) (3.18 nats at 24 chars, 4.16 at 64);
    random 62-alphabet tokens land within ~5% of that cap while
    English letter runs sit near 2.5-2.9 nats, so the 2900 default
    splits them; the ≥3-char-class gate kills the residual prose
    false positives (a \b-bounded word run rarely mixes case AND
    digits).

    Per-candidate work is a char explode + count aggregation — JVM
    split/explode, no Python; candidates per doc are regex-bounded.
    """
    cands = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(_SECRET_PATTERN), F.lit(0),
            )
        ).alias("cand"),
    )
    ch = cands.select(
        id_col, "cand",
        # empty-pattern split = per-char explode (RE2-safe: the
        # oracle mirrors with 1-based string slices, no lookarounds)
        F.explode(F.split("cand", "")).alias("c"),
    ).where(F.col("c") != "")
    per_char = ch.groupBy(id_col, "cand", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    ent = per_char.groupBy(id_col, "cand").agg(
        F.sum("cc").cast("long").alias("n"),
        F.sum(F.expr("cc * ln(CAST(cc AS DOUBLE))")).alias("clogc"),
    ).select(
        id_col, "cand", F.col("n").cast("long").alias("length"),
        F.expr(
            "CAST(round((ln(CAST(n AS DOUBLE)) - clogc / "
            "CAST(n AS DOUBLE)) * 1000.0D, 0) AS LONG)"
        ).alias("entropy_milli"),
    )
    classes = (
        F.when(F.col("cand").rlike("[a-z]"), 1).otherwise(0)
        + F.when(F.col("cand").rlike("[A-Z]"), 1).otherwise(0)
        + F.when(F.col("cand").rlike("[0-9]"), 1).otherwise(0)
        + F.when(F.col("cand").rlike("[+/_-]"), 1).otherwise(0)
    )
    out = ent.withColumn("n_classes", classes.cast("int"))
    return out.select(
        id_col, "cand", "length", "n_classes", "entropy_milli",
        (
            (F.col("entropy_milli") >= min_entropy_milli)
            & (F.col("n_classes") >= 3)
        ).cast("int").alias("is_secret"),
    )


# bracketed/parenthesized obfuscation forms only — bare ' at '/' dot '
# substitution would rewrite prose ("meet at noon"), so the census
# stays precision-first, the DLP convention
_DEOB_CHAIN: tuple[tuple[str, str], ...] = (
    (" [at] ", "@"), ("[at]", "@"), (" (at) ", "@"), ("(at)", "@"),
    (" [dot] ", "."), ("[dot]", "."), (" (dot) ", "."), ("(dot)", "."),
)


def deobfuscated_emails(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_raw, n_deob, n_recovered): email census before and after
    undoing the classic scraping-evasion obfuscations ('user [at]
    host [dot] com') — the recovery pass every contact-PII scrubber
    needs, because the raw email regex misses exactly the addresses
    their owners tried hardest to hide. The deobfuscation is a FIXED-
    ORDER literal replace chain (the clean_text/ECHAR posture: longest
    bracketed forms first, no regex, cannot cascade — replacements
    introduce only '@'/'.'), then the standard PII_PATTERNS email
    regex runs on both versions; n_recovered = n_deob − n_raw is the
    obfuscated-contact count. Pure JVM replace/regexp columns.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    deob = raw
    for pat, rep in _DEOB_CHAIN:
        deob = F.replace(deob, F.lit(pat), F.lit(rep))
    n_raw = F.size(
        F.regexp_extract_all(raw, F.lit(PII_PATTERNS["email"]), F.lit(0))
    )
    n_deob = F.size(
        F.regexp_extract_all(deob, F.lit(PII_PATTERNS["email"]), F.lit(0))
    )
    return df.select(
        F.col(id_col),
        n_raw.cast("long").alias("n_raw"),
        n_deob.cast("long").alias("n_deob"),
        (n_deob - n_raw).cast("long").alias("n_recovered"),
    )
