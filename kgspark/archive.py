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


TAR_MEMBER_FIELDS = (
    "member string, size long, typeflag string, mtime long, mode long, "
    "is_dir int, error string"
)


def _tar_num(field: bytes) -> int:
    """POSIX octal numeric field (NUL/space padded), plus the GNU
    base-256 extension (top bit of the first byte set) for sizes that
    overflow 11 octal digits."""
    if not field:
        return 0
    if field[0] & 0x80:
        val = field[0] & 0x7F
        for b in field[1:]:
            val = (val << 8) | b
        return val
    s = field.strip(b"\x00 ")
    return int(s, 8) if s else 0


def list_tar_members(data: bytes) -> list[dict]:
    """Member records for one tar blob by walking the 512-byte header
    blocks (POSIX.1-1988 ustar layout + the ustar `prefix` field, GNU
    'L' longname records, PAX 'x'/'g' records skipped-but-tolerated);
    never raises. Each header's checksum is verified (unsigned sum with
    the chksum field read as 8 spaces — the rule every mainstream
    writer follows); a mismatch fails the ARCHIVE with an error record,
    because after a bad header the block walk has no reliable resync
    point. Nothing is inflated: sizes come from the header and the walk
    skips payload blocks, so a listing costs O(members), exactly like
    the ZIP central-directory walk above."""

    def err(msg):
        return [{"member": None, "size": None, "typeflag": None,
                 "mtime": None, "mode": None, "is_dir": None,
                 "error": msg}]

    try:
        out, p, n = [], 0, len(data)
        pending_longname = None
        while p + 512 <= n:
            block = data[p:p + 512]
            if block == b"\x00" * 512:
                break
            stored = _tar_num(block[148:156])
            calc = sum(block[0:148]) + 256 + sum(block[156:512])
            if calc != stored:
                return err(f"tar: bad checksum at offset {p}")
            size = _tar_num(block[124:136])
            blocks = (size + 511) // 512
            typeflag = chr(block[156]) if block[156] else "0"
            if typeflag == "L":
                pending_longname = (
                    data[p + 512:p + 512 + size]
                    .rstrip(b"\x00").decode("utf-8", errors="replace")
                )
                p += 512 + blocks * 512
                continue
            if typeflag in ("x", "g"):
                p += 512 + blocks * 512
                continue
            name = block[0:100].split(b"\x00")[0].decode(
                "utf-8", errors="replace")
            if block[257:262] == b"ustar":
                prefix = block[345:500].split(b"\x00")[0]
                if prefix:
                    name = prefix.decode(
                        "utf-8", errors="replace") + "/" + name
            if pending_longname is not None:
                name = pending_longname
                pending_longname = None
            out.append({
                "member": name,
                "size": size,
                "typeflag": typeflag,
                "mtime": _tar_num(block[136:148]),
                "mode": _tar_num(block[100:108]),
                "is_dir": 1 if (typeflag == "5" or name.endswith("/"))
                          else 0,
                "error": None,
            })
            p += 512 + blocks * 512
        if not out:
            return err("tar: empty archive")
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        return err(f"{type(e).__name__}: {e}")


def tar_listing(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """One row per tar member: (id, member, size, typeflag, mtime,
    mode, is_dir, error) — Arrow-batched header walk, nothing
    inflated."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "member", "size", "typeflag", "mtime", "mode",
                "is_dir", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in list_tar_members(
                    bytes(blob) if blob is not None else b""
                ):
                    rec[id_col] = i
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {TAR_MEMBER_FIELDS}"
    )


GZIP_META_FIELDS = (
    "name string, mtime long, os long, flg long, xfl long, isize long, "
    "crc32 long, has_extra int, has_comment int, error string"
)


def gzip_member_meta(data: bytes) -> dict:
    """Header + trailer metadata of one gzip blob (RFC 1952) without
    inflating: magic/CM gate, FLG-driven optional fields (FEXTRA,
    FNAME, FCOMMENT, FHCRC), MTIME/XFL/OS, and the 8-byte trailer
    (CRC32 + ISIZE mod 2³²). Single-member posture: the trailer is read
    from the blob's last 8 bytes, which is exact for the overwhelmingly
    common one-member file and documented-approximate for concatenated
    members (finding member boundaries would require walking the
    deflate stream — against the listing-without-inflating contract
    shared with the ZIP/tar walkers above). Never raises."""

    def err(msg):
        return {"name": None, "mtime": None, "os": None, "flg": None,
                "xfl": None, "isize": None, "crc32": None,
                "has_extra": None, "has_comment": None, "error": msg}

    try:
        import struct

        if len(data) < 20:
            return err("gzip: too short")
        if data[0:2] != b"\x1f\x8b":
            return err("gzip: bad magic")
        if data[2] != 8:
            return err(f"gzip: unknown method {data[2]}")
        flg = data[3]
        mtime = int.from_bytes(data[4:8], "little")
        xfl, osb = data[8], data[9]
        p = 10
        has_extra = 1 if flg & 4 else 0
        if flg & 4:
            xlen = int.from_bytes(data[p:p + 2], "little")
            p += 2 + xlen
        name = None
        if flg & 8:
            q = data.index(b"\x00", p)
            name = data[p:q].decode("latin-1")
            p = q + 1
        has_comment = 1 if flg & 16 else 0
        if flg & 16:
            p = data.index(b"\x00", p) + 1
        if flg & 2:
            p += 2
        if p + 8 > len(data):
            return err("gzip: truncated header")
        crc, isize = struct.unpack("<II", data[-8:])
        return {"name": name, "mtime": mtime, "os": osb, "flg": flg,
                "xfl": xfl, "isize": isize, "crc32": crc,
                "has_extra": has_extra, "has_comment": has_comment,
                "error": None}
    except Exception as e:  # captured, never fatal at corpus scale
        return err(f"{type(e).__name__}: {e}")


def gzip_listing(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per blob: (id, name, mtime, os, flg, xfl, isize, crc32,
    has_extra, has_comment, error) — Arrow-batched RFC 1952 header
    walk, nothing inflated."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "name", "mtime", "os", "flg", "xfl", "isize",
                "crc32", "has_extra", "has_comment", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = gzip_member_meta(
                    bytes(blob) if blob is not None else b"")
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {GZIP_META_FIELDS}"
    )


ZSTD_META_FIELDS = (
    "kind string, single_segment int, has_checksum int, dict_id long, "
    "window_size long, content_size long, error string"
)

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def zstd_frame_meta(data: bytes) -> dict:
    """First-frame header metadata of a zstd blob (RFC 8878 §3.1.1)
    without decompressing: magic gate, Frame_Header_Descriptor bit
    fields (FCS size flag, Single_Segment, Content_Checksum,
    Dictionary_ID flag), the Window_Descriptor exponent/mantissa
    expansion, optional Dictionary_ID, and Frame_Content_Size with the
    flag-1 +256 offset the spec mandates. Skippable frames
    (0x184D2A5x) report kind='skippable' with their declared size in
    content_size. content_size = -1 when the frame does not declare
    one (streaming mode), window_size = content_size under
    Single_Segment (the spec's rule). Never raises — the
    archive-walker error-column posture."""

    def err(msg):
        return {"kind": None, "single_segment": None,
                "has_checksum": None, "dict_id": None,
                "window_size": None, "content_size": None, "error": msg}

    try:
        if len(data) < 5:
            return err("zstd: too short")
        if (data[0] & 0xF0 == 0x50 and
                data[1:4] == b"\x2a\x4d\x18"):
            if len(data) < 8:
                return err("zstd: truncated skippable header")
            size = int.from_bytes(data[4:8], "little")
            return {"kind": "skippable", "single_segment": 0,
                    "has_checksum": 0, "dict_id": 0, "window_size": 0,
                    "content_size": size, "error": None}
        if data[0:4] != _ZSTD_MAGIC:
            return err("zstd: bad magic")
        fhd = data[4]
        if fhd & 0x08:
            return err("zstd: reserved descriptor bit set")
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        p = 5
        window = 0
        if not single:
            wd = data[p]
            p += 1
            exponent, mantissa = wd >> 3, wd & 7
            base = 1 << (10 + exponent)
            window = base + (base // 8) * mantissa
        did_len = (0, 1, 2, 4)[did_flag]
        dict_id = int.from_bytes(data[p:p + did_len], "little") \
            if did_len else 0
        p += did_len
        fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
        if p + fcs_len > len(data):
            return err("zstd: truncated header")
        if fcs_len == 0:
            content = -1
        else:
            content = int.from_bytes(data[p:p + fcs_len], "little")
            if fcs_flag == 1:
                content += 256
        if single:
            window = content if content >= 0 else 0
        return {"kind": "frame", "single_segment": single,
                "has_checksum": checksum, "dict_id": dict_id,
                "window_size": window, "content_size": content,
                "error": None}
    except Exception as e:  # captured, never fatal at corpus scale
        return err(f"{type(e).__name__}: {e}")


def zstd_listing(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per blob: (id, kind, single_segment, has_checksum,
    dict_id, window_size, content_size, error) — Arrow-batched RFC
    8878 frame-header walk, nothing decompressed."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "kind", "single_segment", "has_checksum",
                "dict_id", "window_size", "content_size", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = zstd_frame_meta(
                    bytes(blob) if blob is not None else b"")
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {ZSTD_META_FIELDS}"
    )


def tgz_members(data: bytes) -> list[dict]:
    """Member records of a .tar.gz blob: zlib-gunzip (wbits=47 accepts
    gzip and zlib wrappers alike) then the tar header walk. The one
    walker in this module that MUST inflate — a tarball's headers are
    inside the compressed stream by construction — so it documents the
    exception to the listing-without-inflating contract rather than
    silently breaking it. Decompression failures land in the error
    record like every other walker."""
    import zlib

    try:
        raw = zlib.decompress(data, 47)
    except Exception as e:
        return [{"member": None, "size": None, "typeflag": None,
                 "mtime": None, "mode": None, "is_dir": None,
                 "error": f"tgz: {type(e).__name__}: {e}"}]
    return list_tar_members(raw)


def tgz_listing(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """One row per .tar.gz member — gunzip + tar walk, Arrow-batched."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "member", "size", "typeflag", "mtime", "mode",
                "is_dir", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in tgz_members(
                    bytes(blob) if blob is not None else b""
                ):
                    rec[id_col] = i
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {TAR_MEMBER_FIELDS}"
    )
