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

    >>> clean_text("a\\n\\nb\\tc\\r\\nd")
    'a b c d'
    >>> clean_text("  x \\xa0 y  z  ")
    'x y z'
    """
    if isinstance(text, str):
        text = _NEWLINE_RUN.sub(" ", text)
        text = _WS_RUN.sub(" ", text)
        text = text.strip()
    return text


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
