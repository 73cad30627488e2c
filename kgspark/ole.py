"""Pure-stdlib OLE2 / Compound File Binary codecs for legacy .xls and .doc.

The reference reads legacy Office binaries through heavyweight codecs
(pd.read_excel's xlrd path and python-docx, /root/reference/knowledgeGraph.py
:48-55 and :62-65); neither library exists in this environment, so — as with
the round-2 docx/xlsx/pdf codecs (kgspark/sources.py) — the formats are
re-derived from their public specs with only `struct`/stdlib:

  - `cfb_streams`: the [MS-CFB] compound-file container (FAT / mini-FAT /
    directory) -> {stream name: bytes}. Both the regular-sector and the
    mini-stream (< 4096 B) paths are implemented and tested.
  - `xls_records`: BIFF8 Workbook stream -> header-row records, the shape
    pd.read_excel produces for simple sheets. Covers SST strings (incl.
    CONTINUE spill with per-continue flag bytes, compressed + UTF-16),
    LABELSST / NUMBER / RK / MULRK / LABEL cells on the first worksheet.
  - `doc_paragraphs`: [MS-DOC] WordDocument FIB -> Clx piece table in the
    0Table/1Table stream -> text pieces (CP1252-compressed and UTF-16LE),
    split on paragraph marks — what python-docx's `paragraph.text` loop
    yields for flat documents.

Everything here runs inside the Arrow-batched `read_documents` dispatcher
(kgspark/sources.py): per-file, driver-free, errors captured per row.
"""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def is_cfb(data: bytes) -> bool:
    return data[:8] == _CFB_MAGIC


def _chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT/mini-FAT chain; cycle- and bounds-guarded."""
    out: list[int] = []
    seen: set[int] = set()
    s = start
    while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen and s < len(fat):
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse an [MS-CFB] container into {stream name: bytes}."""
    if not is_cfb(data):
        raise ValueError("not an OLE2 compound file")
    if len(data) < 512:
        raise ValueError("truncated OLE2 header")
    ssz = 1 << struct.unpack_from("<H", data, 0x1E)[0]
    mssz = 1 << struct.unpack_from("<H", data, 0x20)[0]
    n_fat = struct.unpack_from("<I", data, 0x2C)[0]
    dir_start = struct.unpack_from("<I", data, 0x30)[0]
    cutoff = struct.unpack_from("<I", data, 0x38)[0]
    minifat_start = struct.unpack_from("<I", data, 0x3C)[0]
    difat_start = struct.unpack_from("<I", data, 0x44)[0]
    per = ssz // 4

    def sector(n: int) -> bytes:
        off = ssz * (n + 1)
        blk = data[off:off + ssz]
        if len(blk) < ssz:
            blk = blk + b"\x00" * (ssz - len(blk))
        return blk

    # DIFAT: 109 header entries + chained DIFAT sectors (last u32 = next)
    difat = list(struct.unpack_from("<109I", data, 0x4C))
    s = difat_start
    hops = 0
    while s not in (_ENDOFCHAIN, _FREESECT) and hops < 1 + len(data) // ssz:
        vals = struct.unpack(f"<{per}I", sector(s))
        difat.extend(vals[:-1])
        s = vals[-1]
        hops += 1

    fat: list[int] = []
    for fs in [x for x in difat if x != _FREESECT][:n_fat]:
        fat.extend(struct.unpack(f"<{per}I", sector(fs)))

    dir_data = b"".join(sector(s) for s in _chain(fat, dir_start))
    entries: list[tuple[str, int, int, int]] = []
    for off in range(0, len(dir_data) - 127, 128):
        e = dir_data[off:off + 128]
        nlen = struct.unpack_from("<H", e, 0x40)[0]
        typ = e[0x42]
        if typ not in (2, 5) or nlen < 2 or nlen > 64:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", e, 0x74)[0]
        size = struct.unpack_from("<Q", e, 0x78)[0]
        entries.append((name, typ, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_container = b""
    minifat: list[int] = []
    if root is not None:
        mini_container = b"".join(sector(s) for s in _chain(fat, root[2]))[: root[3]]
        for s in _chain(fat, minifat_start):
            minifat.extend(struct.unpack(f"<{per}I", sector(s)))

    out: dict[str, bytes] = {}
    for name, typ, start, size in entries:
        if typ != 2:
            continue
        if size < cutoff:
            blob = b"".join(
                mini_container[m * mssz:(m + 1) * mssz]
                for m in _chain(minifat, start)
            )
        else:
            blob = b"".join(sector(s) for s in _chain(fat, start))
        out[name] = blob[:size]
    return out


# ---------------------------------------------------------------------------
# BIFF8 (.xls)
# ---------------------------------------------------------------------------


def _records(stream: bytes):
    i = 0
    while i + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, i)
        yield rid, stream[i + 4:i + 4 + ln]
        i += 4 + ln


class _SSTCursor:
    """Reader over the SST record + its CONTINUE spills. Fixed-width fields
    (`take`) flow across record boundaries unchanged; character runs restart
    with a fresh compression-flag byte at each CONTINUE boundary (the BIFF8
    quirk that breaks naive concatenation)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _left(self) -> int:
        return len(self.chunks[self.ci]) - self.off

    def _bump(self) -> None:
        self.ci += 1
        self.off = 0

    def take(self, n: int) -> bytes:
        out = bytearray()
        while n:
            if self._left() == 0:
                self._bump()
                continue
            got = min(n, self._left())
            out += self.chunks[self.ci][self.off:self.off + got]
            self.off += got
            n -= got
        return bytes(out)

    def chars(self, cch: int, high: bool) -> str:
        s: list[str] = []
        while cch:
            if self._left() == 0:
                self._bump()
                high = bool(self.chunks[self.ci][0] & 1)
                self.off = 1
                continue
            width = 2 if high else 1
            got = min(cch, self._left() // width)
            if got == 0:  # boundary mid-character: spec forbids; skip ahead
                self._bump()
                high = bool(self.chunks[self.ci][0] & 1)
                self.off = 1
                continue
            raw = self.chunks[self.ci][self.off:self.off + got * width]
            s.append(raw.decode("utf-16-le" if high else "latin-1"))
            self.off += got * width
            cch -= got
        return "".join(s)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _SSTCursor(chunks)
    _total, unique = struct.unpack("<II", cur.take(8))
    out: list[str] = []
    for _ in range(unique):
        cch = struct.unpack("<H", cur.take(2))[0]
        flags = cur.take(1)[0]
        high = bool(flags & 0x01)
        has_ext = bool(flags & 0x04)
        has_rich = bool(flags & 0x08)
        crun = struct.unpack("<H", cur.take(2))[0] if has_rich else 0
        cbext = struct.unpack("<i", cur.take(4))[0] if has_ext else 0
        out.append(cur.chars(cch, high))
        if crun:
            cur.take(4 * crun)
        if cbext > 0:
            cur.take(cbext)
    return out


def _rk_value(rk: int) -> float | int:
    div100 = rk & 0x01
    if rk & 0x02:  # 30-bit signed integer
        v: float = rk >> 2 if rk < 0x80000000 else (rk >> 2) - (1 << 30)
    else:  # top 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if div100:
        v = v / 100
    return v


def _num(v: float) -> float | int:
    f = float(v)
    return int(f) if f.is_integer() else f


def xls_records(data: bytes) -> list[dict]:
    """BIFF8 Workbook -> header-row records (first worksheet), matching the
    shape of `_xlsx_records` (kgspark/sources.py) / ref pd.read_excel."""
    streams = cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream in OLE container")
    recs = list(_records(wb))
    sst: list[str] = []
    cells: dict[tuple[int, int], object] = {}
    sheet_no = -1
    in_globals = False
    i = 0
    while i < len(recs):
        rid, p = recs[i]
        if rid == 0x0809 and len(p) >= 4:  # BOF
            dt = struct.unpack_from("<H", p, 2)[0]
            in_globals = dt == 0x0005
            if dt == 0x0010:
                sheet_no += 1
        elif rid == 0x00FC and in_globals:  # SST (+ CONTINUE spills)
            chunks = [p]
            j = i + 1
            while j < len(recs) and recs[j][0] == 0x003C:
                chunks.append(recs[j][1])
                j += 1
            sst = _parse_sst(chunks)
            i = j - 1
        elif sheet_no == 0:
            if rid == 0x00FD:  # LABELSST
                r, c, _ixfe, isst = struct.unpack_from("<HHHI", p)
                cells[(r, c)] = sst[isst] if isst < len(sst) else ""
            elif rid == 0x0203:  # NUMBER
                r, c, _ixfe, d = struct.unpack_from("<HHHd", p)
                cells[(r, c)] = _num(d)
            elif rid == 0x027E:  # RK
                r, c, _ixfe, rk = struct.unpack_from("<HHHI", p)
                cells[(r, c)] = _num(_rk_value(rk))
            elif rid == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", p)
                n = (len(p) - 6) // 6
                for k in range(n):
                    rk = struct.unpack_from("<I", p, 4 + 6 * k + 2)[0]
                    cells[(r, c0 + k)] = _num(_rk_value(rk))
            elif rid == 0x0204:  # LABEL (inline string)
                r, c, _ixfe, cch = struct.unpack_from("<HHHH", p)
                high = bool(p[8] & 1)
                raw = p[9:9 + cch * (2 if high else 1)]
                cells[(r, c)] = raw.decode("utf-16-le" if high else "latin-1")
        i += 1

    if not cells:
        return []
    rows = sorted({r for r, _ in cells})
    cols = sorted({c for _, c in cells})
    header = {c: cells.get((rows[0], c)) for c in cols}
    return [
        {str(header[c]): cells.get((r, c)) for c in cols if header.get(c) is not None}
        for r in rows[1:]
    ]


# ---------------------------------------------------------------------------
# [MS-DOC] (.doc)
# ---------------------------------------------------------------------------

_FIB_MAGIC = 0xA5EC
_FC_CLX_OFF = 0x01A2  # FibBase(32)+csw(2)+fibRgW(28)+cslw(2)+fibRgLw(88)+cb(2)
#   = 154, + 33 (fc,lcb) pairs * 8 -> fcClx
_CCP_TEXT_OFF = 0x004C  # fibRgLw97: cbMac, lProductCreated, lProductRevised, ccpText


def doc_paragraphs(data: bytes) -> list[str]:
    """WordDocument FIB -> Clx piece table -> paragraph texts."""
    streams = cfb_streams(data)
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < 0x01AA:
        raise ValueError("no WordDocument stream in OLE container")
    if struct.unpack_from("<H", wd, 0)[0] != _FIB_MAGIC:
        raise ValueError("bad FIB magic")
    flags = struct.unpack_from("<H", wd, 0x000A)[0]
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    if table is None:  # tolerate a mis-set flag if exactly one table exists
        table = streams.get("1Table") or streams.get("0Table")
    if table is None:
        raise ValueError("no Table stream in OLE container")
    ccp_text = struct.unpack_from("<i", wd, _CCP_TEXT_OFF)[0]
    fc_clx = struct.unpack_from("<I", wd, _FC_CLX_OFF)[0]
    lcb_clx = struct.unpack_from("<I", wd, _FC_CLX_OFF + 4)[0]
    clx = table[fc_clx:fc_clx + lcb_clx]

    p = 0
    while p < len(clx) and clx[p] == 0x01:  # skip Prc property blobs
        p += 3 + struct.unpack_from("<H", clx, p + 1)[0]
    if p >= len(clx) or clx[p] != 0x02:
        raise ValueError("no Pcdt piece table in Clx")
    lcb = struct.unpack_from("<I", clx, p + 1)[0]
    plc = clx[p + 5:p + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}i", plc, 0)

    pieces: list[str] = []
    for k in range(n):
        fc_raw = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * k + 2)[0]
        cp_len = cps[k + 1] - cps[k]
        if fc_raw & 0x40000000:  # fCompressed: CP1252, fc counts half-bytes
            off = (fc_raw & 0x3FFFFFFF) // 2
            pieces.append(wd[off:off + cp_len].decode("cp1252", errors="replace"))
        else:
            off = fc_raw & 0x3FFFFFFF
            pieces.append(
                wd[off:off + 2 * cp_len].decode("utf-16-le", errors="replace")
            )
    full = "".join(pieces)[:ccp_text]
    # \r = paragraph mark; \x07 = table cell/row mark (also ends a run)
    paras = full.replace("\x07", "\r").split("\r")
    if paras and paras[-1] == "":
        paras.pop()
    return paras
