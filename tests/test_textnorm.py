"""Byte-identity tests for the text normalizers (SURVEY.md §5.2.1-2).

The oracle is the REFERENCE's own clean_text / clean_problematic_value,
imported read-only from /root/reference (never copied). When the reference
checkout is absent (e.g. CI elsewhere) those comparisons skip; the pinned
byte-vector expectations below always run.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

from kgspark.textnorm import clean_problematic_value, clean_text

REF_DIR = "/root/reference"

CASES = [
    "a\n\nb\tc\r\nd",
    "  x \xa0 y z  ",
    "",
    "   ",
    "plain",
    "nul\x00byte",
    "ctrl\x01\x02chars\x1f!",
    "CJK 北京 mixed\tline",
    "a\x0bb\x0cc",
    "trail  space  ",
    "&nbsp;-literal stays",
    "emoji 🚀\nnewline",
    "Ünïcode nbsp",
]


def _load_ref(modname: str, fname: str):
    """Import a reference module read-only; its binary-format deps (docx,
    PyPDF2, pytesseract, PIL) are absent here and irrelevant to the pure text
    functions under test, so stub them before exec."""
    path = os.path.join(REF_DIR, fname)
    if not os.path.exists(path):
        return None
    import types

    # Exact names the reference imports (knowledgeGraph.py:1-10,
    # json_validator.py:1-4); only the text functions are exercised.
    stubs = {
        "docx": {"Document": object},
        "PyPDF2": {"PdfReader": object},
        "pytesseract": {"image_to_string": lambda *a, **k: ""},
        "PIL": {"Image": types.SimpleNamespace(open=lambda *a, **k: None)},
        "jsonschema": {"validate": lambda *a, **k: None,
                       "ValidationError": type("ValidationError", (Exception,), {})},
    }
    for stub, attrs in stubs.items():
        if stub not in sys.modules:
            try:
                importlib.import_module(stub)
            except ImportError:
                m = types.ModuleType(stub)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[stub] = m
    if "json_validator" not in sys.modules and fname != "json_validator.py":
        jv = _load_ref("json_validator", "json_validator.py")
        if jv is not None:
            sys.modules["json_validator"] = jv
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


def test_clean_text_pinned_vectors():
    assert clean_text("a\n\nb\tc\r\nd") == "a b c d"
    assert clean_text("  x \xa0 y z  ") == "x y z"  # unicode \s collapses
    assert clean_text("") == ""
    assert clean_text("   ") == ""
    assert clean_text(None) is None  # non-str passthrough
    assert clean_text(42) == 42
    assert clean_text("a\x0bb") == "a b"  # \x0b is Python-\s


def test_clean_text_idempotent():
    for c in CASES:
        once = clean_text(c)
        assert clean_text(once) == once


def test_clean_problematic_value_pinned():
    assert clean_problematic_value("nul\x00byte") == "nulbyte"
    assert clean_problematic_value("a\x01b\x1fc") == "abc"
    assert clean_problematic_value("keep\nnewline") == "keep\nnewline"
    assert clean_problematic_value(7) == 7


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not present")
def test_byte_identity_vs_reference():
    ref = _load_ref("_ref_kg", "knowledgeGraph.py")
    if ref is None:
        pytest.skip("reference module not importable in sandbox")
    for c in CASES:
        ours = clean_text(c)
        theirs = ref.clean_text(c)
        assert ours.encode("utf-8") == theirs.encode("utf-8"), repr(c)


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not present")
def test_ctrl_strip_vs_reference():
    ref = _load_ref("_ref_jv", "json_validator.py")
    if ref is None:
        pytest.skip("reference module not importable in sandbox")
    for c in CASES:
        assert clean_problematic_value(c) == ref.clean_problematic_value(c), repr(c)


def test_clean_text_udf_roundtrip(spark):
    df = spark.createDataFrame([(c,) for c in CASES] + [(None,)], "s string")
    from pyspark.sql import functions as F

    from kgspark.textnorm import clean_text_udf

    got = [r["c"] for r in df.select(clean_text_udf(F.col("s")).alias("c")).collect()]
    want = [clean_text(c) for c in CASES] + [None]
    assert got == want


def test_clean_content_shapes():
    from kgspark.textnorm import clean_content

    assert clean_content(["a\n b", 3, "c\td"]) == ["a b", 3, "c d"]
    assert clean_content({"k": " x \n y ", "n": 1}) == {"k": "x y", "n": 1}
    assert clean_content("  z\r\nw ") == "z w"


def test_clean_value_coercions():
    from kgspark.textnorm import clean_value

    assert clean_value(None) is None
    assert clean_value(float("nan")) is None
    assert clean_value(3) == 3 and clean_value(2.5) == 2.5
    assert clean_value(" a\tb ") == "a b"
    assert clean_value({"x": 1}) == "{'x': 1}"


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not present")
def test_clean_content_value_vs_reference():
    from kgspark.textnorm import clean_content, clean_value

    ref = _load_ref("_ref_kg2", "knowledgeGraph.py")
    if ref is None:
        pytest.skip("reference module not importable in sandbox")
    payloads = [["a\n b", 5, "c\td"], {"k": " x\ny ", "n": 2}, "  s\r t "]
    for p in payloads:
        assert clean_content(p) == ref.clean_content(p), repr(p)
    for v in [None, float("nan"), 3, 2.5, " a\tb ", ("t",)]:
        assert clean_value(v) == ref.clean_value(v), repr(v)


def test_clean_text_fast_path_equals_spec_fuzz():
    """The join/split fast path must be byte-identical to the literal
    two-regex spec pipeline over adversarial unicode whitespace."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgspark.textnorm import clean_text, clean_text_spec

    ws = "\t\n\r\f\v\x1c\x1d\x1e\x1f\x85\xa0    "
    alphabet = st.sampled_from(list(ws) + list("abcXYZ.!?()&;#é中"))

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=80))
    def check(s):
        assert clean_text(s) == clean_text_spec(s), repr(s)

    check()


def test_nfc_udf_matches_duckdb_and_report(spark):
    import duckdb
    import random
    import unicodedata

    from kgspark.textnorm import nfc_report

    con = duckdb.connect()
    random.seed(3)
    comb = ["́", "̀", "̈", "̧", "̊", ""]
    cases = ["éclair", "café", "ﬁle", "Å", "", "x"]
    cases += ["".join(random.choice("aeiouc AEIOU") + random.choice(comb)
                      for _ in range(6)) for _ in range(500)]
    for s in cases:
        assert (con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
                == unicodedata.normalize("NFC", s))

    df = spark.createDataFrame(
        [(0, "café"), (1, "café"), (2, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in nfc_report(df).collect()}
    assert out[0].o_chars == 5 and out[0].n_chars == 4
    assert out[0].changed == 1 and out[1].changed == 0
    assert out[0].nfc_md5 == out[1].nfc_md5  # canonical twins unify
    assert out[2].nfc_md5 is None and out[2].changed is None


def test_bidi_report_counts_and_flags(spark):
    from kgspark.textnorm import bidi_report

    docs = spark.createDataFrame(
        [
            (1, "plain ascii"),
            (2, "evil \u202etxet\u202c here"),          # RLO + PDF
            (3, "zw\u200b\u200bjoin\u200d and bom\ufeff"),
            (4, "iso \u2066inline\u2069"),              # LRI/PDI pair
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_bidi, r.n_zw, r.suspicious)
           for r in bidi_report(docs).collect()}
    assert out[1] == (0, 0, 0)
    assert out[2] == (2, 0, 1)
    assert out[3] == (0, 4, 0)
    assert out[4] == (2, 0, 1)
    assert out[5] == (0, 0, 0)



def test_confusable_report_fold_and_census(spark):
    from kgspark.textnorm import confusable_report

    # '\u0440aypal' = Cyrillic er + 'aypal'; doc 3 all-clean
    docs = spark.createDataFrame(
        [
            (1, "pay \u0440aypal now"),
            (2, "mix \u043e\u0441 letters"),
            (3, "plain ascii"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in confusable_report(docs).collect()}
    assert (out[1].n_confusable, out[1].spoofed) == (1, 1)
    assert (out[2].n_confusable, out[2].spoofed) == (2, 1)
    assert (out[3].n_confusable, out[3].spoofed) == (0, 0)
    assert out[4].n_confusable == 0 and out[4].spoofed == 0
    # the folded hash of the spoofed text equals the hash of the
    # honest Latin spelling — the property a blocklist needs
    import hashlib
    want = hashlib.md5("pay paypal now".encode()).hexdigest()
    assert out[1].folded_md5 == want
