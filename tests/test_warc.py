"""WARC reader: stdlib record parsing, gzip members, HTTP splitting,
per-record error capture."""

from __future__ import annotations

import gzip


def _record(uri, body, rtype="response", http=True, status=200):
    if http and rtype == "response":
        payload = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
        ).encode() + body
    else:
        payload = body
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def test_parse_warc_records_plain_and_http_split():
    from kgspark.warc import parse_warc_records

    data = (
        _record("https://a.com/", b"<html>A</html>")
        + _record("https://b.com/x", b"<html>B</html>", status=404)
        + _record("meta", b"not http", rtype="warcinfo", http=False)
    )
    recs = list(parse_warc_records(data))
    assert len(recs) == 3
    a, b, w = recs
    assert a["target_uri"] == "https://a.com/" and a["http_status"] == 200
    assert a["payload"] == b"<html>A</html>"
    assert a["content_type"] == "text/html"  # from the HTTP envelope
    assert b["http_status"] == 404
    assert w["warc_type"] == "warcinfo" and w["http_status"] is None
    assert w["payload"] == b"not http"
    assert all(r["error"] is None for r in recs)


def test_parse_warc_truncated_and_bad_version():
    from kgspark.warc import parse_warc_records

    good = _record("https://ok.com/", b"fine")
    torn = good[: len(good) - 8]  # cut inside the payload
    recs = list(parse_warc_records(torn))
    assert recs[0]["error"] == "truncated payload"
    recs2 = list(parse_warc_records(b"NOTWARC\r\nX: 1\r\n\r\nbody"))
    assert "bad version line" in recs2[0]["error"]


def test_split_warc_members_multi_gzip():
    from kgspark.warc import parse_warc_records, split_warc_members

    r1 = _record("https://a.com/", b"one")
    r2 = _record("https://b.com/", b"two")
    blob = gzip.compress(r1) + gzip.compress(r2)  # two gzip members
    chunks = split_warc_members(blob)
    assert len(chunks) == 2
    uris = [rec["target_uri"] for c in chunks for rec in parse_warc_records(c)]
    assert uris == ["https://a.com/", "https://b.com/"]
    # plain passthrough
    assert split_warc_members(r1) == [r1]


def test_warc_records_distributed_scan(spark, tmp_path):
    from kgspark.warc import warc_records

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(
        _record("https://a.com/", b"<html>A</html>")
        + _record("https://a.com/2", b"<html>A2</html>")
    )
    (d / "b.warc.gz").write_bytes(
        gzip.compress(_record("https://b.com/", b"<html>B</html>"))
    )
    (d / "junk.warc").write_bytes(b"NOTWARC\r\n\r\nxx")
    out = warc_records(spark, str(d)).collect()
    by_uri = {r["target_uri"]: r for r in out if r["target_uri"]}
    assert set(by_uri) == {"https://a.com/", "https://a.com/2",
                           "https://b.com/"}
    assert bytes(by_uri["https://b.com/"]["payload"]) == b"<html>B</html>"
    errs = [r for r in out if r["error"]]
    assert len(errs) == 1 and "bad version line" in errs[0]["error"]
    assert len(out) == 4


def test_build_kg_from_warc_end_to_end(spark, tmp_path):
    """WARC dump -> pages bridge -> full KG build: response records become
    documents, triples extract, non-html/non-200 records are dropped."""
    from kgspark.pipeline import build_kg_from_warc
    from kgspark.synth import pages_df

    pages = pages_df(spark, 6, seed=7).collect()
    members = []
    for i, p in enumerate(pages):
        members.append(_record(p["url"], bytes(p["html"])))
    # noise records the bridge must drop
    members.append(_record("http://x/404", b"<html>gone</html>", status=404))
    members.append(_record("http://x/bin", b"\x00\x01", rtype="resource",
                           http=False))
    (tmp_path / "crawl.warc").write_bytes(b"".join(members))

    out = build_kg_from_warc(
        spark, str(tmp_path), str(tmp_path / "run"), with_topics=False
    )
    docs = out["documents"].collect()
    assert len(docs) == 6  # 404 + non-response dropped
    assert {d["filename"] for d in docs} == {p["url"] for p in pages}
    assert out["triples"].count() > 0


def test_write_warc_roundtrip(spark, tmp_path):
    """pages -> write_warc -> warc_records reads back every record with
    urls, timestamps (second precision) and byte-identical html."""
    from kgspark.warc import warc_records, write_warc
    from kgspark.synth import pages_df

    pages = pages_df(spark, 8, seed=11)
    out = str(tmp_path / "export")
    write_warc(pages, out, records_per_file=3)
    import os
    files = [f for f in os.listdir(out) if f.endswith(".warc")]
    assert len(files) == 3  # ceil(8/3)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    back = warc_records(spark, out).collect()
    assert len(back) == 8
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    for r in back:
        assert r.warc_type == "response" and r.http_status == 200
        assert bytes(r.payload) == want[r.target_uri]
        assert r.warc_date and r.warc_date.endswith("Z")
