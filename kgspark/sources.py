"""File-format sources + dispatcher (ref S1-S7,
/root/reference/knowledgeGraph.py:43-135).

The reference reads 11 upload formats into a normalized envelope. For the
web-corpus target the dispatch collapses to the HTML extractor
(kgspark.html), but the engine keeps the full surface: a binaryFile scan +
per-format handlers. docx, xlsx and simple (raw/Flate) PDFs parse with
pure-stdlib codecs (zipfile + ElementTree, zlib + operator scan), and legacy
binary .xls/.doc parse via the pure-stdlib OLE2/BIFF8/piece-table codecs in
kgspark.ole — no third-party codec anywhere. Encrypted PDFs (standard
security handler, empty user password) decrypt across the whole published
range — RC4 V=1/2 R=2/3 via the spec's MD5+RC4 key schedule, AES-128
/AESV2 V=4 R=4, and AES-256 /AESV3 V=5 R=6 via the ISO 32000-2 Algorithm
2.A/2.B hardened hash, on the pure-stdlib FIPS-197 AES in kgspark.aes —
and CID/Type0 fonts decode through their embedded ToUnicode CMaps. Only
image-OCR (no OCR engine exists in stdlib) remains gated behind a clearly
marked seam — the dispatch, schema and error-wrapping semantics are real
and tested either way.

Reference error semantics preserved: an unsupported extension raises
ValueError (ref knowledgeGraph.py:99-101); per-file handler errors are
captured, not fatal (ref :131-135) — here as an `error` column so one corrupt
file never kills a 10^12-doc job.
"""

from __future__ import annotations

import json as _json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from kgspark.html import extract_text
from kgspark.textnorm import clean_content, clean_text, clean_value

DOC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("file_type", StringType()),
        StructField("content", StringType()),
        StructField("error", StringType()),
    ]
)


def read_txt(data: bytes) -> str:
    """ref S1 (knowledgeGraph.py:43-46): utf-8 text + clean."""
    return clean_text(data.decode("utf-8", errors="replace"))


def read_html(data: bytes) -> str:
    """web-corpus path: html -> normalized visible text (kgspark.html)."""
    return extract_text(data)


def read_csv_text(data: bytes) -> str:
    """ref S3 (knowledgeGraph.py:57-60): records, cleaned per cell."""
    import io

    df = pd.read_csv(io.BytesIO(data))
    records = clean_content(df.to_dict(orient="records"))
    return _json.dumps(records, ensure_ascii=False, default=str)


def read_json_text(data: bytes) -> str:
    return _json.dumps(_json.loads(data.decode("utf-8")), ensure_ascii=False)


def _xlsx_records(data: bytes) -> list[dict]:
    """Minimal pure-stdlib xlsx reader: an .xlsx is a zip holding sheet XML
    plus an optional shared-strings table. Covers shared/inline strings and
    numbers on the first worksheet (header row -> records), which is the
    shape the reference's pd.read_excel produces for simple sheets."""
    import io
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{NS}t"))
                for si in root.iter(f"{NS}si")
            ]
        sheet = next(
            n for n in sorted(z.namelist()) if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
        )
        root = ET.fromstring(z.read(sheet))
    rows: list[dict[str, object]] = []
    for row in root.iter(f"{NS}row"):
        cells: dict[str, object] = {}
        for c in row.iter(f"{NS}c"):
            col = re.match(r"([A-Z]+)", c.get("r", "A")).group(1)
            t = c.get("t")
            if t == "inlineStr":
                v: object = "".join(x.text or "" for x in c.iter(f"{NS}t"))
            else:
                vn = c.find(f"{NS}v")
                raw = vn.text if vn is not None else None
                if raw is None:
                    continue
                if t == "s":
                    v = shared[int(raw)]
                elif t == "str":
                    v = raw
                else:
                    f = float(raw)
                    v = int(f) if f.is_integer() else f
            cells[col] = v
        rows.append(cells)
    if not rows:
        return []
    header = rows[0]
    cols = sorted(header, key=lambda c: (len(c), c))
    return [
        {str(header[c]): r.get(c) for c in cols if c in header}
        for r in rows[1:]
    ]


def read_excel(data: bytes) -> str:
    """ref S2 (knowledgeGraph.py:48-55): read_excel -> records. Prefers
    pandas+openpyxl when present; falls back to the pure-stdlib xlsx parser
    (zip + sheet XML) or, for legacy binary .xls, the pure-stdlib OLE2/BIFF8
    codec (kgspark.ole)."""
    import io

    from kgspark import ole

    try:
        df = pd.read_excel(io.BytesIO(data))
        records = df.to_dict(orient="records")
    except Exception:
        # pandas needs openpyxl/xlrd (absent here) — both container formats
        # parse with the stdlib codecs instead
        if data[:2] == b"PK":
            records = _xlsx_records(data)
        elif ole.is_cfb(data):
            records = ole.xls_records(data)
        else:
            raise ValueError(
                "unrecognized excel container (neither xlsx zip nor OLE2)"
            ) from None
    # ref :52-54: per-cell clean_value (NaN -> null, strings cleaned)
    records = [{k: clean_value(v) for k, v in r.items()} for r in records]
    return _json.dumps(records, ensure_ascii=False, default=str)


def _docx_paragraphs(data: bytes) -> list[str]:
    """Pure-stdlib docx paragraphs: a .docx is a zip; paragraph text is the
    concatenation of the <w:t> runs of each <w:p> in word/document.xml —
    exactly what python-docx's `paragraph.text` returns."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    return [
        "".join(t.text or "" for t in p.iter(f"{W}t"))
        for p in root.iter(f"{W}p")
    ]


def read_doc(data: bytes) -> str:
    """ref S4 (knowledgeGraph.py:62-65): per-paragraph texts, cleaned.
    docx parses pure-stdlib (zip + document.xml); legacy binary .doc parses
    via the pure-stdlib OLE2 piece-table codec (kgspark.ole)."""
    from kgspark import ole

    if data[:2] == b"PK":
        paras = _docx_paragraphs(data)
    elif ole.is_cfb(data):
        paras = ole.doc_paragraphs(data)
    else:
        raise ValueError(
            "unrecognized doc container (neither docx zip nor OLE2)"
        )
    return _json.dumps([clean_text(p) for p in paras], ensure_ascii=False)


def _pdf_literal(s: bytes) -> str:
    """Decode a PDF literal string body (backslash escapes + octal)."""
    out: list[str] = []
    esc = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
           "(": "(", ")": ")", "\\": "\\"}
    i = 0
    while i < len(s):
        c = s[i:i + 1]
        if c == b"\\" and i + 1 < len(s):
            n = s[i + 1:i + 2].decode("latin-1")
            if n.isdigit():
                j = i + 1
                while j < min(i + 4, len(s)) and s[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1:j], 8)))
                i = j
            else:
                out.append(esc.get(n, n))
                i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


_PDF_LIT = rb"\((?:\\.|[^()\\])*\)"
_PDF_HEX = rb"<[0-9A-Fa-f\s]*>"

# Standard security handler padding string (PDF 1.7 spec, 7.6.3.3 Algorithm 2)
_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public design, ~15 lines) — used ONLY to decrypt
    standard-security-handler PDFs for text extraction, mirroring the
    reference's PyPDF2 read path (ref knowledgeGraph.py:67-73)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pdf_objects(data: bytes) -> dict:
    """Map (objnum, gen) -> object body bytes via a light regex pass."""
    import re

    return {
        (int(m.group(1)), int(m.group(2))): m.group(3)
        for m in re.finditer(
            rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", data, re.S
        )
    }


def _pdf_str_value(body: bytes, name: bytes) -> bytes | None:
    """Extract /Name (literal) or /Name <hex> string value from a dict."""
    import re

    m = re.search(
        rb"/" + name + rb"\s*(" + _PDF_LIT + rb"|" + _PDF_HEX + rb")", body
    )
    if m is None:
        return None
    v = m.group(1)
    if v[:1] == b"(":
        return _pdf_literal(v[1:-1]).encode("latin-1")
    return bytes.fromhex(v[1:-1].decode("ascii").replace(" ", "").strip())


def _pdf_int_value(body: bytes, name: bytes) -> int | None:
    import re

    m = re.search(rb"/" + name + rb"\s+(-?\d+)", body)
    return int(m.group(1)) if m else None


def _pdf_hash_2b(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened R=6 password hash:
    iterated SHA-256/384/512 selected by an AES-128-CBC encryption of the
    running digest, minimum 64 rounds, data-dependent stop condition."""
    import hashlib

    from kgspark.aes import cbc_encrypt

    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _pdf_file_key(data: bytes, objs: dict) -> tuple[bytes, str] | None:
    """Derive the standard-security-handler file key (empty user password)
    and the stream cipher mode: PDF 1.7 spec 7.6.3.3 Algorithm 2 for
    V=1/2/4 (RC4 and /AESV2 crypt filters), ISO 32000-2 Algorithm 2.A/2.B
    for V=5 R=6 (/AESV3, AES-256). Returns None for unencrypted files,
    (key, mode) with mode in {'rc4', 'aesv2', 'aesv3'} otherwise; raises
    NotImplementedError for non-Standard handlers, unknown V/R combos and
    files that actually require a user password (U mismatch)."""
    import hashlib
    import re

    enc_ref = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data)
    if enc_ref is None:
        return None
    enc = objs.get((int(enc_ref.group(1)), int(enc_ref.group(2))))
    if enc is None:
        raise NotImplementedError("dangling /Encrypt reference")
    if b"/Standard" not in enc:
        raise NotImplementedError("non-standard PDF security handler")
    v = _pdf_int_value(enc, b"V") or 0
    r = _pdf_int_value(enc, b"R") or 2
    if v == 5 and r == 6:
        return _pdf_file_key_v5(enc)
    if (v, r) == (4, 4):
        if b"/AESV2" in enc:
            mode = "aesv2"
        elif b"/V2" in enc:
            mode = "rc4"  # V=4 crypt filter wrapping plain RC4
        else:
            raise NotImplementedError(
                "V=4 PDF without an /AESV2 or /V2 crypt filter"
            )
    elif v in (1, 2) and r in (2, 3):
        mode = "rc4"
    else:
        raise NotImplementedError(
            f"PDF encryption V={v} R={r} outside the supported set "
            "(RC4 V=1/2 R=2/3, AES-128 V=4 R=4, AES-256 V=5 R=6)"
        )
    o = _pdf_str_value(enc, b"O")
    u = _pdf_str_value(enc, b"U")
    p = _pdf_int_value(enc, b"P")
    if o is None or u is None or p is None:
        raise NotImplementedError("malformed /Encrypt dictionary")
    n = 16 if v == 4 else (_pdf_int_value(enc, b"Length") or 40) // 8
    idm = re.search(
        rb"/ID\s*\[\s*(" + _PDF_LIT + rb"|" + _PDF_HEX + rb")", data
    )
    id0 = b""
    if idm is not None:
        g = idm.group(1)
        id0 = (
            _pdf_literal(g[1:-1]).encode("latin-1")
            if g[:1] == b"("
            else bytes.fromhex(g[1:-1].decode("ascii").replace(" ", ""))
        )
    # Algorithm 2 with the EMPTY user password
    seed = _PDF_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", enc):
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    # verify vs /U (Algorithm 4 for R=2, Algorithm 5 for R>=3)
    if r == 2:
        ok = _rc4(key, _PDF_PAD) == u[:32]
    else:
        x = hashlib.md5(_PDF_PAD + id0).digest()
        x = _rc4(key, x)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == u[:16]
    if not ok:
        raise NotImplementedError(
            "password-protected PDF (empty user password rejected)"
        )
    return key, mode


def _pdf_file_key_v5(enc: bytes) -> tuple[bytes, str]:
    """ISO 32000-2 Algorithm 2.A with the empty user password: validate
    against /U's validation salt, then unwrap the 32-byte file key from
    /UE with the key-salt-derived intermediate key (AES-256-CBC, zero IV,
    no padding)."""
    from kgspark.aes import cbc_decrypt

    u = _pdf_str_value(enc, b"U")
    ue = _pdf_str_value(enc, b"UE")
    if u is None or len(u) < 48 or ue is None or len(ue) != 32:
        raise NotImplementedError("malformed V=5 /Encrypt dictionary")
    vsalt, ksalt = u[32:40], u[40:48]
    if _pdf_hash_2b(b"", vsalt, b"") != u[:32]:
        raise NotImplementedError(
            "password-protected PDF (empty user password rejected)"
        )
    inter = _pdf_hash_2b(b"", ksalt, b"")
    return cbc_decrypt(inter, b"\x00" * 16, ue, unpad=False), "aesv3"


def _pdf_decrypt_stream(
    file_key: bytes, mode: str, num: int, gen: int, blob: bytes
) -> bytes:
    """Per-object stream decryption dispatch: RC4 with the Algorithm 1
    object key; /AESV2 = AES-128-CBC with the Algorithm 1 key salted by
    b'sAlT' (PDF 1.7 spec 7.6.2 step b); /AESV3 = AES-256-CBC with the
    file key directly. AES streams carry their IV as the first 16 bytes
    and the always-present PKCS#7 padding."""
    import hashlib

    if mode == "rc4":
        return _rc4(_pdf_obj_key(file_key, num, gen), blob)
    from kgspark.aes import cbc_decrypt

    if mode == "aesv2":
        key = hashlib.md5(
            file_key + num.to_bytes(3, "little")
            + gen.to_bytes(2, "little") + b"sAlT"
        ).digest()[:16]
    else:
        key = file_key
    if len(blob) < 32 or len(blob) % 16:
        raise NotImplementedError("malformed AES stream (bad length)")
    return cbc_decrypt(key, blob[:16], blob[16:], unpad=True)


def _pdf_obj_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Per-object RC4 key (PDF 1.7 spec 7.6.2 Algorithm 1)."""
    import hashlib

    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _parse_tounicode(cmap: bytes) -> dict:
    """Parse a ToUnicode CMap stream: bfchar + bfrange sections map font
    character codes to UTF-16BE unicode strings (Adobe CMap spec)."""
    import re

    def _u16(hexs: str) -> str:
        b = bytes.fromhex(hexs)
        return b.decode("utf-16-be", errors="replace")

    out: dict[int, str] = {}
    hx = rb"<([0-9A-Fa-f]+)>"
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for m in re.finditer(hx + rb"\s*" + hx, sec.group(1)):
            out[int(m.group(1), 16)] = _u16(m.group(2).decode("ascii"))
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = sec.group(1)
        for m in re.finditer(hx + rb"\s*" + hx + rb"\s*" + hx, body):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dst = bytes.fromhex(m.group(3).decode("ascii"))
            base = int.from_bytes(dst, "big")
            width = len(dst)
            for c in range(lo, hi + 1):
                out[c] = (base + c - lo).to_bytes(width, "big").decode(
                    "utf-16-be", errors="replace"
                )
        for m in re.finditer(
            hx + rb"\s*" + hx + rb"\s*\[((?:\s*" + hx + rb")+)\s*\]", body
        ):
            lo = int(m.group(1), 16)
            for k, d in enumerate(re.findall(hx, m.group(3))):
                out[lo + k] = _u16(d.decode("ascii"))
    return out


def _pdf_hex_text(hexbody: bytes, cmap: dict) -> str:
    """Decode a hex string shown by Tj/TJ: with a ToUnicode CMap, treat as
    2-byte CID codes (1-byte fallback per code); without, as latin-1 bytes."""
    s = "".join(hexbody.decode("ascii").split())
    if len(s) % 2:
        s += "0"  # PDF spec: odd final digit is padded with 0
    b = bytes.fromhex(s)
    if not cmap:
        return b.decode("latin-1")
    out: list[str] = []
    i = 0
    while i < len(b):
        two = int.from_bytes(b[i : i + 2], "big") if i + 1 < len(b) else None
        if two is not None and two in cmap:
            out.append(cmap[two])
            i += 2
        elif b[i] in cmap:
            out.append(cmap[b[i]])
            i += 1
        else:
            i += 2 if two is not None else 1
    return "".join(out)


def _pdf_pages(data: bytes) -> list[str]:
    """Pure-stdlib PDF text extraction: per-object content streams (raw or
    FlateDecode via zlib) scanned for Tj / TJ text-showing operators, one
    output string per text-bearing stream (~page for simple PDFs). Handles
    the standard security handler end to end — RC4 (V=1/2, R=2/3),
    AES-128 /AESV2 (V=4, R=4) and AES-256 /AESV3 (V=5, R=6), all with the
    empty user password: the common "owner-locked" case PyPDF2 reads in
    the reference, knowledgeGraph.py:67-73 — and embedded ToUnicode CMaps
    for CID/Type0 fonts showing text as hex strings. Password-required
    files surface as the gated error column."""
    import re
    import zlib

    objs = _pdf_objects(data)
    keyed = _pdf_file_key(data, objs)  # None when unencrypted

    def _stream_of(num: int, gen: int, body: bytes) -> bytes | None:
        m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.S)
        if m is None:
            return None
        blob = m.group(1)
        if keyed is not None:
            blob = _pdf_decrypt_stream(keyed[0], keyed[1], num, gen, blob)
        try:
            blob = zlib.decompress(blob)
        except zlib.error:
            pass
        return blob

    # merge every embedded ToUnicode CMap (per-font maps collide only when
    # two fonts assign the same CID different glyphs — not a text-bearing
    # case worth per-Tf state tracking at this tier)
    cmap: dict[int, str] = {}
    for body in objs.values():
        for m in re.finditer(rb"/ToUnicode\s+(\d+)\s+(\d+)\s+R", body):
            ref = (int(m.group(1)), int(m.group(2)))
            if ref in objs:
                blob = _stream_of(ref[0], ref[1], objs[ref])
                if blob:
                    cmap.update(_parse_tounicode(blob))

    pages: list[str] = []
    for (num, gen), body in objs.items():
        blob = _stream_of(num, gen, body)
        if blob is None or b"BT" not in blob:
            continue
        parts: list[str] = []
        for op in re.finditer(
            rb"(?P<lit>" + _PDF_LIT + rb")\s*Tj"
            rb"|(?P<hex>" + _PDF_HEX + rb")\s*Tj"
            rb"|\[(?P<arr>(?:" + _PDF_LIT + rb"|[^\]])*)\]\s*TJ",
            blob,
        ):
            if op.group("lit") is not None:
                parts.append(_pdf_literal(op.group("lit")[1:-1]))
            elif op.group("hex") is not None:
                parts.append(_pdf_hex_text(op.group("hex")[1:-1], cmap))
            else:
                parts.append(
                    "".join(
                        _pdf_hex_text(x[1:-1], cmap)
                        if x[:1] == b"<"
                        else _pdf_literal(x[1:-1])
                        for x in re.findall(
                            _PDF_LIT + rb"|" + _PDF_HEX, op.group("arr")
                        )
                    )
                )
        pages.append("\n".join(parts))
    return pages


def read_pdf(data: bytes) -> str:
    """ref S5 (knowledgeGraph.py:67-73): per-page text list, cleaned."""
    pages = _pdf_pages(data)
    if not pages:
        raise NotImplementedError(
            "no extractable text streams (raw/Flate, RC4/AES-encrypted "
            "and ToUnicode-CID PDFs parse here)"
        )
    return _json.dumps([clean_text(p) for p in pages], ensure_ascii=False)


def read_image_ocr(data: bytes) -> str:
    """STUB — ref S6 needs pytesseract (absent here)."""
    raise NotImplementedError("OCR not available in this environment")


def read_epub(data: bytes) -> str:
    """EPUB e-book text, pure stdlib (IDPF OCF — a zip container:
    META-INF/container.xml names the OPF package; the OPF <spine>
    orders <manifest> items; chapters are (x)html extracted to visible
    text via kgspark.html). Returns the per-chapter cleaned-text JSON
    list, the read_doc shape. The reference has no epub path
    (knowledgeGraph.py:85-97); this extends the same dispatcher."""
    import io
    import posixpath
    import xml.etree.ElementTree as ET
    import zipfile

    CN = "{urn:oasis:names:tc:opendocument:xmlns:container}"
    OPF = "{http://www.idpf.org/2007/opf}"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        c = ET.fromstring(z.read("META-INF/container.xml"))
        rf = c.find(f"{CN}rootfiles/{CN}rootfile")
        if rf is None or not rf.get("full-path"):
            raise ValueError("epub: no rootfile in container.xml")
        opf_path = rf.get("full-path")
        opf = ET.fromstring(z.read(opf_path))
        base = posixpath.dirname(opf_path)
        items = {i.get("id"): i.get("href")
                 for i in opf.iter(f"{OPF}item")}
        hrefs = [items[r.get("idref")]
                 for r in opf.iter(f"{OPF}itemref")
                 if r.get("idref") in items]
        if not hrefs:
            raise ValueError("epub: empty spine")
        chapters = []
        for href in hrefs:
            p = posixpath.join(base, href) if base else href
            chapters.append(extract_text(z.read(p)) or "")
    return _json.dumps(chapters, ensure_ascii=False)


# ref knowledgeGraph.py:85-97 — extension -> handler map
HANDLERS = {
    "txt": read_txt,
    "rtf": read_txt,
    "html": read_html,
    "htm": read_html,
    "csv": read_csv_text,
    "json": read_json_text,
    "xls": read_excel,
    "xlsx": read_excel,
    "doc": read_doc,
    "docx": read_doc,
    "pdf": read_pdf,
    "epub": read_epub,
    "png": read_image_ocr,
    "jpg": read_image_ocr,
    "jpeg": read_image_ocr,
}


def dispatch(path: str, data: bytes) -> dict:
    """One file -> envelope row; per-file errors captured (ref :131-135),
    unknown extensions rejected (ref :99-101)."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    handler = HANDLERS.get(ext)
    if handler is None:
        return {"path": path, "file_type": ext, "content": None,
                "error": f"Unsupported file format: .{ext}"}
    try:
        return {"path": path, "file_type": ext,
                "content": handler(data), "error": None}
    except Exception as e:  # captured, never fatal at corpus scale
        return {"path": path, "file_type": ext, "content": None,
                "error": f"{type(e).__name__}: {e}"}


def read_documents(spark: SparkSession, input_dir: str, glob: str = "*") -> DataFrame:
    """binaryFile scan -> format dispatch in an Arrow-batched mapInPandas.

    documents(path, file_type, content, error) — the S7 dispatcher as a
    distributed scan; stubbed formats surface their NotImplementedError in
    `error` rather than failing the job."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                dispatch(p, bytes(c) if c is not None else b"")
                for p, c in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DOC_SCHEMA.fields])

    return raw.mapInPandas(run, schema=DOC_SCHEMA)
