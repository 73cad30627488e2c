"""ZIP container metadata — the pure-stdlib slice of archive handling.

Web corpora are full of ZIP-family containers (docx/xlsx/epub/jar and
plain .zip uploads); the curation gate wants the MEMBER LISTING — names,
sizes, compression method, per-member CRC — without inflating anything:
a listing is enough to drop installers, detect zip bombs (compression
ratio), and route members to the right codec.

Layout read (APPNOTE.TXT, the PKWARE spec): scan backwards from EOF for
the End-Of-Central-Directory signature PK\\x05\\x06 (it may be followed
by a comment up to 64 KiB), read the central-directory offset + entry
count, then walk the PK\\x01\\x02 central file headers — fixed 46-byte
layout plus three variable-length tails (name/extra/comment). The LOCAL
headers (PK\\x03\\x04) are never touched: the central directory is the
authoritative index, exactly how `unzip -l` works.

kgspark/sources.py already trusts zipfile for docx/xlsx DECODE; this
walker is the corpus-scale census layer above it (same posture as
imagemeta/audiometa/videometa: Arrow-batched mapInPandas over the binary
column, per-blob errors to an `error` column, exact-integer fields).
The reference has no archive path (knowledgeGraph.py:60-78).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

ZIP_MEMBER_FIELDS = (
    "member string, method long, comp_size long, uncomp_size long, "
    "crc32 long, is_dir int, error string"
)

_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"


def list_zip_members(data: bytes) -> list[dict]:
    """Central-directory member records for one blob; never raises.
    Malformed input yields a single record with the error set."""

    def err(msg):
        return [{"member": None, "method": None, "comp_size": None,
                 "uncomp_size": None, "crc32": None, "is_dir": None,
                 "error": msg}]

    try:
        n = len(data)
        # EOCD: fixed 22 bytes + comment (<= 64 KiB); scan backwards
        tail = data[max(0, n - 22 - 65536):]
        pos = tail.rfind(_EOCD_SIG)
        if pos < 0:
            return err("zip: no end-of-central-directory")
        eocd = tail[pos:pos + 22]
        if len(eocd) < 22:
            return err("zip: truncated EOCD")
        (n_entries, cd_size, cd_off) = struct.unpack(
            "<HI I", eocd[10:12] + eocd[12:20])
        if cd_off + cd_size > n:
            return err("zip: central directory out of range")
        out, p = [], cd_off
        for _ in range(n_entries):
            if data[p:p + 4] != _CDH_SIG:
                return err("zip: bad central header signature")
            (method, crc, csize, usize, nlen, elen, clen) = (
                struct.unpack("<H", data[p + 10:p + 12])[0],
                struct.unpack("<I", data[p + 16:p + 20])[0],
                struct.unpack("<I", data[p + 20:p + 24])[0],
                struct.unpack("<I", data[p + 24:p + 28])[0],
                struct.unpack("<H", data[p + 28:p + 30])[0],
                struct.unpack("<H", data[p + 30:p + 32])[0],
                struct.unpack("<H", data[p + 32:p + 34])[0],
            )
            name = data[p + 46:p + 46 + nlen].decode(
                "utf-8", errors="replace")
            out.append({
                "member": name, "method": method, "comp_size": csize,
                "uncomp_size": usize, "crc32": crc,
                "is_dir": 1 if name.endswith("/") else 0,
                "error": None,
            })
            p += 46 + nlen + elen + clen
        if not out:
            return err("zip: empty archive")
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        return err(f"{type(e).__name__}: {e}")


def zip_listing(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """One row per archive member: (id, member, method, comp_size,
    uncomp_size, crc32, is_dir, error) — Arrow-batched, central
    directory only, nothing inflated."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "member", "method", "comp_size", "uncomp_size",
                "crc32", "is_dir", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in list_zip_members(
                    bytes(blob) if blob is not None else b""
                ):
                    rec[id_col] = i
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {ZIP_MEMBER_FIELDS}"
    )
