"""WARC (Web ARChive, ISO 28500) reader — the container format every
web-scale corpus actually arrives in (Common Crawl ships WARC; C4/CCNet
start from it). The reference ingests loose files by extension
(/root/reference/knowledgeGraph.py:85-97); WARC is the beyond-reference
source a crawl-fed pipeline needs first.

Pure-stdlib record parsing (the format is version line + CRLF headers +
Content-Length-delimited payload + CRLF CRLF), gzip member support via
zlib, HTTP response splitting — no external warc library exists in this
container, none is needed.

Scale shape: `warc_records` is a binaryFile scan + Arrow-batched
mapInPandas — one Python pass per WARC file, records stream out as rows;
per-record errors are captured in an `error` column (the sources.py
posture) so one torn record never kills a 100 TB job. WARC files are
independently splittable at the file level (Common Crawl shards are ~1 GB
gzip members), which is exactly the parallel unit this layout uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_FIELDS = (
    "path string, record_no long, warc_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, "
    "payload binary, error string"
)


def split_warc_members(data: bytes) -> list:
    """Split a (possibly multi-member gzip) WARC file into decompressed
    chunks. Plain (uncompressed) input returns [data]."""
    if data[:2] != b"\x1f\x8b":
        return [data]
    import zlib

    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out


def parse_warc_records(data: bytes):
    """Yield dicts for each WARC record in a decompressed chunk. Torn or
    malformed records yield a row with `error` set and parsing continues
    at the next well-formed record boundary."""
    pos = 0
    n = len(data)
    rec_no = 0
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            yield {"record_no": rec_no, "error": "truncated header block"}
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        row = {
            "record_no": rec_no,
            "warc_type": None,
            "target_uri": None,
            "warc_date": None,
            "http_status": None,
            "content_type": None,
            "payload": None,
            "error": None,
        }
        if not lines[0].startswith("WARC/"):
            yield {**row, "error": f"bad version line: {lines[0][:40]!r}"}
            return
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        row["warc_type"] = hdrs.get("warc-type")
        row["target_uri"] = hdrs.get("warc-target-uri")
        row["warc_date"] = hdrs.get("warc-date")
        row["content_type"] = hdrs.get("content-type")
        try:
            length = int(hdrs.get("content-length", ""))
        except ValueError:
            yield {**row, "error": "missing/invalid Content-Length"}
            return
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if len(body) < length:
            row["error"] = "truncated payload"
        if row["warc_type"] == "response" and body.startswith(b"HTTP/"):
            # split the HTTP envelope: status line + headers, then payload
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                status_line = body[: body.find(b"\r\n")].decode(
                    "latin-1", "replace"
                )
                parts = status_line.split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    row["http_status"] = int(parts[1])
                http_head = body[:split].decode("latin-1", "replace")
                for ln in http_head.split("\r\n")[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        row["content_type"] = v.strip()
                row["payload"] = body[split + 4 :]
            else:
                row["payload"] = body
        else:
            row["payload"] = body
        yield row
        rec_no += 1


def warc_records(
    spark: SparkSession, input_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """binaryFile scan over WARC files -> one row per WARC record:
    (path, record_no, warc_type, target_uri, warc_date, http_status,
    content_type, payload, error). Gzip members are detected per file."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select("path", "content")
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    chunks = split_warc_members(bytes(blob))
                except Exception as e:  # captured per file
                    rows.append({
                        "path": path, "record_no": -1, "warc_type": None,
                        "target_uri": None, "warc_date": None,
                        "http_status": None, "content_type": None,
                        "payload": None,
                        "error": f"{type(e).__name__}: {e}",
                    })
                    continue
                base = 0
                for chunk in chunks:
                    for rec in parse_warc_records(chunk):
                        rec_out = {
                            "path": path,
                            "record_no": base + rec.get("record_no", 0),
                            "warc_type": rec.get("warc_type"),
                            "target_uri": rec.get("target_uri"),
                            "warc_date": rec.get("warc_date"),
                            "http_status": rec.get("http_status"),
                            "content_type": rec.get("content_type"),
                            "payload": rec.get("payload"),
                            "error": rec.get("error"),
                        }
                        rows.append(rec_out)
                        base = rec_out["record_no"] + 1
            yield pd.DataFrame(
                rows,
                columns=["path", "record_no", "warc_type", "target_uri",
                         "warc_date", "http_status", "content_type",
                         "payload", "error"],
            )

    return raw.mapInPandas(parse, WARC_FIELDS)


def warc_pages(
    spark: SparkSession, input_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """WARC -> pages-table bridge: the Common-Crawl-style ingestion front
    door the north star names. Keeps only clean 200-status text/html
    response records and shapes them to kgspark.io_tables.PAGES_SCHEMA
    (url, warc_ts, html, text, lang) so the output feeds
    kgspark.pipeline.build_kg unchanged — text/lang stay NULL for the
    pipeline's own extractor/tagger to fill. Map-only over the record
    scan; the per-record error column never propagates (bad records are
    dropped here, visible upstream via warc_records)."""
    recs = warc_records(spark, input_dir, glob)
    return recs.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
        & F.col("error").isNull()
    ).select(
        F.col("target_uri").alias("url"),
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def write_warc(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    records_per_file: int | None = None,
) -> None:
    """WARC WRITER — export a pages table back to WARC/1.0 response
    records, closing the interchange loop with warc_pages/warc_records
    (read a crawl, curate it, hand the survivors back to any
    WARC-consuming tool). Each row becomes one response record with an
    HTTP/1.1 200 envelope and Content-Type text/html; WARC-Date is the
    row's timestamp in the spec's UTC second format. Pure stdlib
    formatting inside mapInPandas; one .warc file per partition written
    through the Hadoop FS API (file://, hdfs://, s3a:// alike) — call
    repartition(n) (or pass records_per_file) to choose file sizing, the
    same contract as any Spark file sink.
    """
    import math

    if records_per_file is not None:
        n = pages.count()
        pages = pages.repartition(
            max(1, math.ceil(n / records_per_file))
        )
    if "://" in out_dir and not out_dir.startswith("file:"):
        # Python workers carry no JVM, so the Hadoop FS API is driver-only;
        # tasks write through the OS path. Object-store export goes via a
        # shared mount or a post-hoc upload of the local output.
        raise NotImplementedError(
            "write_warc writes through task-visible filesystem paths "
            "(local/NFS/fuse mount); got a remote scheme"
        )

    cols = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("ts"),
        F.col(html_col).alias("html"),
    )

    def _write(it):
        import os
        import uuid

        rows = []
        for pdf in it:
            rows.extend(
                (u, t, bytes(h) if h is not None else b"")
                for u, t, h in zip(pdf["url"], pdf["ts"], pdf["html"])
            )
        if rows:
            out = []
            for url, ts, html in rows:
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html
                )
                head = (
                    "WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Target-URI: {url}\r\n"
                    f"WARC-Date: {ts or '1970-01-01T00:00:00Z'}\r\n"
                    f"Content-Length: {len(payload)}\r\n"
                    "Content-Type: application/http; "
                    "msgtype=response\r\n"
                ).encode()
                out.append(head + b"\r\n" + payload + b"\r\n\r\n")
            blob = b"".join(out)
            name = f"part-{uuid.uuid4().hex}.warc"
            d = out_dir.replace("file://", "").replace("file:", "")
            os.makedirs(d, exist_ok=True)
            # tmp + rename: a concurrent reader never sees a torn file
            tmp = os.path.join(d, "." + name + ".tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(d, name))
        import pandas as pd

        yield pd.DataFrame({"n": [len(rows)]})

    counts = cols.mapInPandas(_write, "n long")
    counts.agg(F.sum("n")).collect()  # drive the job
