"""Deterministic HTML(binary) -> text extraction.

The reference parses uploaded files into text envelopes (ref
/root/reference/knowledgeGraph.py:80-135); for the Common-Crawl-style `pages`
input (BASELINE.json input_hint: `html binary` + ground-truth `text string`)
the 11-format dispatch collapses to one HTML extractor whose output must be
byte-identical per url to the reference normalizer `clean_text` applied to the
page's visible text.

Pure-Python, regex-based, zero-dependency (bs4/lxml are not guaranteed in
executors at scale) and fully deterministic. Runs as an Arrow-vectorized
pandas UDF over the binary column.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from kgspark.textnorm import clean_problematic_value, clean_text

# Drop non-visible containers wholesale, then tags, then decode entities.
_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_SCRIPT_STYLE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")


def extract_text(html_bytes) -> str | None:
    """bytes|str HTML -> normalized visible text (the per-url invariant)."""
    if html_bytes is None:
        return None
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = str(html_bytes)
    raw = _HEAD.sub(" ", raw)
    raw = _SCRIPT_STYLE.sub(" ", raw)
    raw = _COMMENT.sub(" ", raw)
    raw = _TAG.sub(" ", raw)
    raw = _htmllib.unescape(raw)
    # Reference order: clean_text runs at file processing time
    # (ref knowledgeGraph.py:43-46), the control-char strip later at JSON
    # validation (ref json_validator.py:92-111 via :113-140). Keeping that
    # order is part of the byte-identity contract.
    raw = clean_text(raw)
    return clean_problematic_value(raw)


@pandas_udf(StringType())
def extract_text_udf(s: pd.Series) -> pd.Series:
    """Vectorized html->text. Input: binary (bytes) or string column."""
    return s.map(extract_text)
