"""Text normalization — THE per-url byte-identity invariant.

Re-implements (from behavioral spec, not copied) the reference's whitespace
normalizer (ref /root/reference/knowledgeGraph.py:14-20) and JSON byte-cleaner
(ref /root/reference/json_validator.py:92-111). These MUST be byte-identical
per input string, so they run inside pandas UDFs using the Python `re` engine —
JVM `regexp_replace` is not equivalent (`\\s` in Java regex is ASCII-only by
default, while Python `\\s` matches U+00A0, U+2003, \\x0b, \\x0c, ...).

Everything here is Arrow-vectorized (Series -> Series) — no per-row Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Spec (ref knowledgeGraph.py:14-20): collapse [\n\r\t]+ runs to one space,
# then any \s+ run to one space, then strip. Non-str values pass through.
_NEWLINE_RUN = re.compile(r"[\n\r\t]+")
_WS_RUN = re.compile(r"\s+")


def clean_text(text):
    """Normalize whitespace exactly like the reference extractor.

    Fast path: `" ".join(text.split())` is byte-equivalent to the spec's
    sub([\\n\\r\\t]+) -> sub(\\s+) -> strip() pipeline — str.split() uses the
    same Unicode whitespace set as Python-re \\s (incl. \\xa0, \\x1c-\\x1f,
    \\x85, Zs/Zl/Zp) and the first sub's output is collapsed by the second
    anyway — but ~10x faster on space-dense text because \\s+ re-matches
    every single space (measured 122 us -> ~13 us per 12 KB page).
    Equivalence to the regex pipeline is fuzz-tested (test_textnorm).

    >>> clean_text("a\\n\\nb\\tc\\r\\nd")
    'a b c d'
    >>> clean_text("  x \\xa0 y  z  ")
    'x y z'
    """
    if isinstance(text, str):
        return " ".join(text.split())
    return text


def clean_text_spec(text):
    """The literal two-regex spec pipeline (ref knowledgeGraph.py:14-20) —
    kept as the equivalence oracle for clean_text's fast path."""
    if isinstance(text, str):
        text = _NEWLINE_RUN.sub(" ", text)
        text = _WS_RUN.sub(" ", text)
        text = text.strip()
    return text


def clean_content(content):
    """ref P2 (knowledgeGraph.py:22-28): one-level map over containers —
    strings inside lists/dicts are cleaned, other values pass through;
    scalars go straight to clean_text. Used by handlers whose payloads are
    record lists (csv/excel/docx/pdf)."""
    if isinstance(content, list):
        return [clean_text(v) if isinstance(v, str) else v for v in content]
    if isinstance(content, dict):
        return {
            k: clean_text(v) if isinstance(v, str) else v
            for k, v in content.items()
        }
    return clean_text(content)


def clean_value(value):
    """ref P3 (knowledgeGraph.py:30-41): JSON-compatibility coercion —
    NaN/None -> None, numbers pass, strings cleaned, everything else
    stringified. In the typed engine this applies at the codec boundary
    (pandas records -> JSON envelope); Spark columns are typed so the
    coercion is moot downstream (SURVEY.md §2.2)."""
    if value is None:
        return None
    if isinstance(value, float) and value != value:  # NaN without pandas
        return None
    if isinstance(value, (int, float)):
        return value
    if isinstance(value, str):
        return clean_text(value)
    try:  # pandas NaT / numpy nan wrapped types
        import pandas as _pd

        if _pd.isna(value):
            return None
    except (TypeError, ValueError):
        pass
    return str(value)


# Spec (ref json_validator.py:92-111): strip NUL bytes, drop control chars
# (ord < 32) except newline; recursion over containers happens at column level
# in Spark (typed schemas), so only the scalar case lives here.
_CTRL = re.compile(r"[\x00-\x09\x0b-\x1f]")


def clean_problematic_value(value):
    """Remove NUL/control characters the way the reference JSON cleaner does."""
    if isinstance(value, str):
        value = value.replace("\x00", "")
        value = _CTRL.sub("", value)
    return value


@pandas_udf(StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    """Vectorized clean_text. Null-safe: None stays None."""
    return s.map(lambda x: clean_text(x) if isinstance(x, str) else x)


@pandas_udf(StringType())
def clean_bytes_udf(s: pd.Series) -> pd.Series:
    """Vectorized control-character cleaning (ref json_validator.py:92-111)."""
    return s.map(lambda x: clean_problematic_value(x) if isinstance(x, str) else x)


@pandas_udf(StringType())
def nfc_udf(s: pd.Series) -> pd.Series:
    """Unicode NFC canonical composition (UAX #15), Arrow-batched.
    Python's unicodedata and DuckDB's utf8proc nfc_normalize agree
    (battery + 500-case fuzz in test_textnorm) — NFC is the stable,
    round-trip-safe normalization a dedup pipeline must apply BEFORE
    hashing, or the composed and decomposed spellings of the same
    string land in different buckets. Beyond-reference scope (the
    reference cleaner only strips control bytes,
    json_validator.py:92-111)."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x)
        if isinstance(x, str) else x
    )


def nfc_report(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, o_chars, n_chars, changed, nfc_md5): per-doc NFC census —
    how much of the corpus is non-canonical (changed=1 docs would
    hash-split from their canonical twins). Only the composition itself
    crosses into Python; lengths, the change flag, and the md5 stay
    JVM-side."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    n = nfc_udf(t)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("o_chars"),
        F.length(n).cast("long").alias("n_chars"),
        (t != n).cast("long").alias("changed"),
        F.md5(n).alias("nfc_md5"),
    )


# Unicode direction-control and zero-width codepoints — the Trojan-Source
# (Boucher & Anderson 2021, CVE-2021-42574) and invisible-text audit set.
# Explicit \u escapes ONLY (the nfc gotcha: raw invisibles in source are
# themselves a Trojan-Source hazard and vanish in diffs).
BIDI_CONTROLS = ("\u202a\u202b\u202c\u202d\u202e"
                 "\u2066\u2067\u2068\u2069")
ZERO_WIDTHS = "\u200b\u200c\u200d\ufeff"


def bidi_report(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_bidi, n_zw, suspicious): per-doc census of Unicode
    direction-control characters (RLO/LRI/PDF…, the Trojan-Source
    vector — text that RENDERS differently than it parses) and
    zero-width characters (invisible-watermark / homoglyph-spoof
    vector). A curation gate drops or renormalizes suspicious docs
    before they reach a code-trained model.

    Regex-free determinism: each codepoint is counted as
    length(t) - length(replace(t, cp, '')) — 13 pure JVM replace
    terms, no engine-specific regex unicode classes anywhere.
    NULL text counts 0/0. suspicious = any bidi control present.
    """
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_col), F.lit(""))

    def count_set(chars):
        total = F.lit(0).cast("long")
        for cp in chars:
            total = total + (
                F.length(t) - F.length(F.replace(t, F.lit(cp)))
            ).cast("long")
        return total

    n_bidi = count_set(BIDI_CONTROLS)
    n_zw = count_set(ZERO_WIDTHS)
    return df.select(
        F.col(id_col),
        n_bidi.alias("n_bidi"),
        n_zw.alias("n_zw"),
        F.when(n_bidi > 0, 1).otherwise(0).cast("int")
        .alias("suspicious"),
    )



# Pinned Unicode-confusables fold: the high-frequency Cyrillic/Greek
# letters whose glyphs are indistinguishable from Basic-Latin in most
# fonts (UTS #39 confusables.txt, the single-script Latin-target rows a
# crawl actually sees). Explicit escapes only (see BIDI_CONTROLS note).
CONFUSABLE_FOLD: dict[str, str] = {
    "\u0430": "a", "\u0435": "e", "\u043e": "o", "\u0440": "p",
    "\u0441": "c", "\u0443": "y", "\u0445": "x", "\u0456": "i",
    "\u0455": "s", "\u0458": "j",  # Cyrillic lowercase
    "\u03bf": "o", "\u03b1": "a",  # Greek omicron / alpha
}


def confusable_report(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_confusable, folded_md5, spoofed): per-doc census of
    Latin-lookalike Cyrillic/Greek letters — the homoglyph-spoofing
    vector UTS #39 calls mixed-script confusables (a '\u0440aypal'
    mention is NOT 'paypal' to any exact matcher, dedup hash, or
    blocklist). `n_confusable` counts fold-set characters,
    `folded_md5` hashes the text after folding them to their Latin
    twins (the skeleton a blocklist should match against), and
    `spoofed` flags docs whose fold changed the text.

    Pure JVM: one translate() for the fold, replace-delta counts for
    the census (the bidi_report posture) — no Python, no regex.
    """
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_col), F.lit(""))
    src = "".join(CONFUSABLE_FOLD)
    dst = "".join(CONFUSABLE_FOLD.values())
    folded = F.translate(t, src, dst)
    n = F.lit(0).cast("long")
    for cp in CONFUSABLE_FOLD:
        n = n + (F.length(t) - F.length(F.replace(t, F.lit(cp)))).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_confusable"),
        F.md5(folded).alias("folded_md5"),
        F.when(folded != t, 1).otherwise(0).cast("int").alias("spoofed"),
    )
