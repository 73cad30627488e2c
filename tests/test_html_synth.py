"""HTML extraction invariant: extract_text(html) == pages.text byte-identically
for every synthesized page (SURVEY.md §5.2.2), plus chunker unit behavior."""

from __future__ import annotations

from kgspark.chunk import split_into_chunks
from kgspark.html import extract_text
from kgspark.synth import generate_pages


def test_extract_text_equals_ground_truth_bytes():
    rows, _ = generate_pages(120, seed=7)
    for r in rows:
        got = extract_text(r["html"])
        assert got.encode("utf-8") == r["text"].encode("utf-8"), r["url"]


def test_extract_text_edge_cases():
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    assert extract_text(b"<p>a</p><p>b</p>") == "a b"
    assert extract_text(b"<script>x<y</script>hi") == "hi"
    assert extract_text("<b>bold</b> &amp; more") == "bold & more"


def test_chunker_packing():
    # 3 sentences of 10 chars each pack greedily under max_length=25:
    # [s1+s2] then [s3]  (10+10 fits, +10 would exceed 25)
    s = "aaaaaaaaa. bbbbbbbbb. ccccccccc."
    chunks = split_into_chunks(s, max_length=25)
    assert chunks == ["aaaaaaaaa. bbbbbbbbb.", "ccccccccc."]


def test_chunker_oversize_word_split():
    text = "word " * 30  # one "sentence" of 150 chars, no terminator
    chunks = split_into_chunks(text.strip(), max_length=40)
    assert all(len(c) <= 40 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_chunker_empty():
    assert split_into_chunks("", 100) == []
    assert split_into_chunks(None, 100) == []
    assert split_into_chunks("   ", 100) == []


def test_chunker_reassembly_property():
    rows, _ = generate_pages(30, seed=11)
    for r in rows:
        chunks = split_into_chunks(r["text"], 500)
        assert " ".join(chunks).split() == r["text"].split()
