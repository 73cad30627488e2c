"""Test-only writers for OLE2 (CFB) containers, BIFF8 .xls and [MS-DOC] .doc.

No library in this environment can WRITE legacy Office binaries, so the codec
tests construct them from the public specs — the same strategy test_codecs.py
uses for docx/xlsx/pdf (hand-built zips/PDF objects). The writer emits
spec-conformant v3 containers: 512-byte sectors, FAT via header DIFAT,
directory tree flattened (readers that walk the red-black tree get valid
sibling terminators), and streams < 4096 B placed in the mini stream with a
mini-FAT — so both of the reader's chain paths are exercised.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
NOSTREAM = 0xFFFFFFFF


def _pad(b: bytes, size: int) -> bytes:
    return b + b"\x00" * (-len(b) % size)


def make_cfb(streams: dict[str, bytes]) -> bytes:
    """Build a v3 compound file holding the given name -> bytes streams."""
    names = list(streams)
    small = {n: b for n, b in streams.items() if len(b) < 4096}
    big = {n: b for n, b in streams.items() if len(b) >= 4096}

    # mini stream container + mini FAT
    mini_container = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for n, b in small.items():
        first = len(minifat)
        nsec = max(1, -(-len(b) // 64))
        mini_container += _pad(b, 64) if b else b"\x00" * 64
        minifat.extend(list(range(first + 1, first + nsec)) + [ENDOFCHAIN])
        mini_start[n] = first
    minifat_bytes = _pad(
        b"".join(struct.pack("<I", v) for v in minifat), 512
    ) if minifat else b""
    minifat_sectors = len(minifat_bytes) // 512

    # directory: root + one entry per stream, 4 entries/sector
    n_entries = 1 + len(names)
    dir_sectors = -(-n_entries // 4)
    mini_cont_sectors = -(-len(mini_container) // 512) if mini_container else 0
    big_sectors = {n: -(-len(b) // 512) for n, b in big.items()}
    data_sectors = (
        dir_sectors + minifat_sectors + mini_cont_sectors + sum(big_sectors.values())
    )
    n_fat = 1
    while -(-(data_sectors + n_fat) // 128) > n_fat:
        n_fat += 1

    # sector layout: [FAT]*n_fat [dir] [minifat] [mini container] [big...]
    dir_first = n_fat
    minifat_first = dir_first + dir_sectors if minifat_sectors else ENDOFCHAIN
    mini_cont_first = (
        dir_first + dir_sectors + minifat_sectors if mini_cont_sectors else ENDOFCHAIN
    )
    big_first: dict[str, int] = {}
    cursor = dir_first + dir_sectors + minifat_sectors + mini_cont_sectors
    for n in big:
        big_first[n] = cursor
        cursor += big_sectors[n]
    total_sectors = cursor

    fat = [FREESECT] * (128 * n_fat)
    for i in range(n_fat):
        fat[i] = FATSECT

    def chain(first: int, count: int) -> None:
        for k in range(count):
            fat[first + k] = first + k + 1 if k + 1 < count else ENDOFCHAIN

    chain(dir_first, dir_sectors)
    if minifat_sectors:
        chain(minifat_first, minifat_sectors)
    if mini_cont_sectors:
        chain(mini_cont_first, mini_cont_sectors)
    for n in big:
        chain(big_first[n], big_sectors[n])

    def dir_entry(name: str, typ: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 0x40, len(raw) + 2)
        e[0x42] = typ
        e[0x43] = 1  # black
        struct.pack_into("<III", e, 0x44, NOSTREAM, NOSTREAM, NOSTREAM)
        if typ == 5 and names:
            struct.pack_into("<I", e, 0x4C, 1)  # root's child = first entry
        struct.pack_into("<I", e, 0x74, start)
        struct.pack_into("<Q", e, 0x78, size)
        return bytes(e)

    entries = [
        dir_entry(
            "Root Entry", 5,
            mini_cont_first if mini_cont_sectors else ENDOFCHAIN,
            len(mini_container),
        )
    ]
    for n in names:
        if n in small:
            entries.append(dir_entry(n, 2, mini_start[n], len(small[n])))
        else:
            entries.append(dir_entry(n, 2, big_first[n], len(big[n])))
    dir_bytes = _pad(b"".join(entries), 512)

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 0x18, 0x003E)  # minor
    struct.pack_into("<H", header, 0x1A, 0x0003)  # major v3
    struct.pack_into("<H", header, 0x1C, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 0x1E, 9)  # 512 B sectors
    struct.pack_into("<H", header, 0x20, 6)  # 64 B mini sectors
    struct.pack_into("<I", header, 0x2C, n_fat)
    struct.pack_into("<I", header, 0x30, dir_first)
    struct.pack_into("<I", header, 0x38, 4096)  # mini cutoff
    struct.pack_into("<I", header, 0x3C,
                     minifat_first if minifat_sectors else ENDOFCHAIN)
    struct.pack_into("<I", header, 0x40, minifat_sectors)
    struct.pack_into("<I", header, 0x44, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 0x48, 0)
    for i in range(109):
        struct.pack_into("<I", header, 0x4C + 4 * i,
                         i if i < n_fat else FREESECT)

    body = bytearray(512 * total_sectors)

    def put(sector: int, blob: bytes) -> None:
        body[512 * sector:512 * sector + len(blob)] = blob

    for i in range(n_fat):
        put(i, b"".join(struct.pack("<I", v) for v in fat[128 * i:128 * (i + 1)]))
    put(dir_first, dir_bytes)
    if minifat_sectors:
        put(minifat_first, minifat_bytes)
    if mini_cont_sectors:
        put(mini_cont_first, _pad(bytes(mini_container), 512))
    for n, b in big.items():
        put(big_first[n], _pad(b, 512))
    return bytes(header) + bytes(body)


# ---------------------------------------------------------------------------
# BIFF8 .xls
# ---------------------------------------------------------------------------


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def make_xls(header: list, rows: list[list], continue_split: int | None = None,
             pad_to: int = 0) -> bytes:
    """Workbook stream with globals (BOF+SST+EOF) + one sheet substream.
    `continue_split` forces the SST to spill into a CONTINUE record after
    that many strings (fresh flag byte at the boundary, per spec)."""
    strings: list[str] = []
    for vals in [header] + rows:
        for v in vals:
            if isinstance(v, str) and v not in strings:
                strings.append(v)

    def sst_body(strs: list[str]) -> bytes:
        out = b""
        for s in strs:
            enc = s.encode("latin-1", errors="strict") if s.isascii() else None
            if enc is not None:
                out += struct.pack("<HB", len(s), 0x00) + enc
            else:
                out += struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")
        return out

    n = struct.pack("<II", len(strings), len(strings))
    if continue_split is not None and 0 < continue_split < len(strings):
        sst = _rec(0x00FC, n + sst_body(strings[:continue_split]))
        sst += _rec(0x003C, sst_body(strings[continue_split:]))
    else:
        sst = _rec(0x00FC, n + sst_body(strings))

    cells = b""
    for rix, vals in enumerate([header] + rows):
        for cix, v in enumerate(vals):
            if isinstance(v, str):
                cells += _rec(0x00FD, struct.pack("<HHHI", rix, cix, 0,
                                                  strings.index(v)))
            elif isinstance(v, int) and -(2 ** 29) <= v < 2 ** 29:
                cells += _rec(0x027E, struct.pack("<HHHI", rix, cix, 0,
                                                  ((v << 2) & 0xFFFFFFFF) | 0x02))
            else:
                cells += _rec(0x0203, struct.pack("<HHHd", rix, cix, 0, float(v)))

    bof_g = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_s = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    eof = _rec(0x000A, b"")
    wb = bof_g + sst + eof + bof_s + cells + eof
    if pad_to and len(wb) < pad_to:
        wb += b"\x00" * (pad_to - len(wb))  # trailing slack after final EOF
    return make_cfb({"Workbook": wb})


# ---------------------------------------------------------------------------
# [MS-DOC] .doc
# ---------------------------------------------------------------------------


def make_doc(paragraphs: list[str], utf16: bool = False,
             two_pieces: bool = False, pad_to: int = 0,
             table_name: str = "0Table") -> bytes:
    """WordDocument + Table streams: FIB -> Clx -> piece table. `two_pieces`
    splits the text into a CP1252 piece followed by a UTF-16 piece."""
    text = "\r".join(paragraphs) + "\r"
    ccp = len(text)
    text_off = 0x0800  # text area after the FIB zone

    pieces: list[tuple[str, bool]] = []
    if two_pieces and ccp >= 2:
        mid = ccp // 2
        pieces = [(text[:mid], False), (text[mid:], True)]
    else:
        pieces = [(text, utf16)]

    wd = bytearray(text_off)
    pcds = b""
    cps = [0]
    off = text_off
    for ptext, p16 in pieces:
        cps.append(cps[-1] + len(ptext))
        if p16:
            enc = ptext.encode("utf-16-le")
            fc_raw = off
        else:
            enc = ptext.encode("cp1252")
            fc_raw = (off * 2) | 0x40000000
        wd += enc
        pcds += struct.pack("<HIH", 0, fc_raw, 0)
        off += len(enc)

    plc = b"".join(struct.pack("<i", cp) for cp in cps) + pcds
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    struct.pack_into("<H", wd, 0x0000, 0xA5EC)  # wIdent
    flags = 0x0200 if table_name == "1Table" else 0
    struct.pack_into("<H", wd, 0x000A, flags)
    struct.pack_into("<i", wd, 0x004C, ccp)  # ccpText
    struct.pack_into("<I", wd, 0x01A2, 0)  # fcClx (Clx at Table offset 0)
    struct.pack_into("<I", wd, 0x01A6, len(clx))  # lcbClx
    if pad_to and len(wd) < pad_to:
        wd += b"\x00" * (pad_to - len(wd))
    return make_cfb({"WordDocument": bytes(wd), table_name: clx})
