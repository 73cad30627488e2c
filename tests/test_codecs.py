"""Pure-stdlib docx/xlsx/pdf codecs (S2/S4/S5) over generated fixtures."""

from __future__ import annotations

import json
import zipfile
import zlib

from kgspark.sources import dispatch, read_doc, read_excel, read_pdf


def make_docx(paragraphs) -> bytes:
    import io

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{W}">'
           f"<w:body>{body}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def make_xlsx(header, rows) -> bytes:
    import io

    S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    strings: list = []

    def cell(col, rix, v):
        ref = f"{col}{rix}"
        if isinstance(v, str):
            if v not in strings:
                strings.append(v)
            return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    cols = [chr(ord("A") + i) for i in range(len(header))]
    xml_rows = []
    for rix, vals in enumerate([header] + rows, start=1):
        cells = "".join(cell(c, rix, v) for c, v in zip(cols, vals))
        xml_rows.append(f'<row r="{rix}">{cells}</row>')
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
             f'{"".join(xml_rows)}</sheetData></worksheet>')
    sst = (f'<?xml version="1.0"?><sst xmlns="{S}">'
           + "".join(f"<si><t>{s}</t></si>" for s in strings) + "</sst>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def make_pdf(pages, compress=False) -> bytes:
    out = [b"%PDF-1.4\n"]
    objs = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    objs.append(
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> endobj\n".encode()
    )
    for i, text in enumerate(pages):
        pid, cid = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{pid} 0 obj << /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            f"/MediaBox [0 0 612 792] >> endobj\n".encode()
        )
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"{cid} 0 obj << {filt.decode()}/Length {len(stream)} >> stream\n".encode()
            + stream + b"\nendstream endobj\n"
        )
    return b"".join(out + objs + [b"trailer << /Root 1 0 R >>\n%%EOF\n"])


def test_docx_paragraphs_roundtrip():
    data = make_docx(["Hello world", "Second   paragraph", ""])
    got = json.loads(read_doc(data))
    assert got == ["Hello world", "Second paragraph", ""]  # clean_text applied


def test_unknown_container_is_rejected():
    import pytest

    with pytest.raises(ValueError, match="container"):
        read_doc(b"\x00\x01 not a doc")
    with pytest.raises(ValueError, match="container"):
        read_excel(b"\x00\x01 not a sheet")


def test_xlsx_records_roundtrip():
    data = make_xlsx(["name", "qty"], [["widget", 3], ["gadget", 2.5]])
    got = json.loads(read_excel(data))
    assert got == [{"name": "widget", "qty": 3}, {"name": "gadget", "qty": 2.5}]


def test_pdf_text_raw_and_flate():
    for compress in (False, True):
        data = make_pdf(["Hello (kg)spark", "Page two"], compress=compress)
        got = json.loads(read_pdf(data))
        assert got == ["Hello (kg)spark", "Page two"], (compress, got)


def test_pdf_without_text_is_gated():
    import pytest

    with pytest.raises(NotImplementedError):
        read_pdf(b"%PDF-1.4\nno streams here\n%%EOF")


def test_dispatch_routes_new_codecs(tmp_path):
    assert dispatch("a.docx", make_docx(["x"]))["content"] == '["x"]'
    assert dispatch("b.pdf", make_pdf(["y"]))["content"] == '["y"]'
    row = dispatch("c.xlsx", make_xlsx(["h"], [["v"]]))
    assert json.loads(row["content"]) == [{"h": "v"}]
    assert row["error"] is None


def test_read_documents_scan_with_codecs(spark, tmp_path):
    (tmp_path / "a.docx").write_bytes(make_docx(["alpha beta"]))
    (tmp_path / "b.pdf").write_bytes(make_pdf(["gamma"], compress=True))
    (tmp_path / "c.xlsx").write_bytes(make_xlsx(["k"], [["v1"], ["v2"]]))
    (tmp_path / "d.txt").write_text("plain text")
    from kgspark.sources import read_documents

    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in read_documents(spark, str(tmp_path)).collect()}
    assert json.loads(rows["a.docx"]["content"]) == ["alpha beta"]
    assert json.loads(rows["b.pdf"]["content"]) == ["gamma"]
    assert json.loads(rows["c.xlsx"]["content"]) == [{"k": "v1"}, {"k": "v2"}]
    assert rows["d.txt"]["content"] == "plain text"
    assert all(r["error"] is None for r in rows.values())


# ---------------------------------------------------------------------------
# legacy OLE2 codecs (.xls BIFF8, .doc piece table) — kgspark/ole.py
# ---------------------------------------------------------------------------

from tests.cfb_fixture import make_cfb, make_doc, make_xls  # noqa: E402

from kgspark.ole import cfb_streams, doc_paragraphs, xls_records  # noqa: E402


def test_cfb_container_roundtrip_mini_and_regular():
    streams = {
        "Small": b"tiny stream",  # < 4096 -> mini stream + mini FAT
        "Tiny2": b"x" * 200,
        "BigStream": bytes(range(256)) * 30,  # 7680 B -> regular FAT chain
    }
    got = cfb_streams(make_cfb(streams))
    assert got == streams


def test_cfb_rejects_non_ole():
    import pytest

    with pytest.raises(ValueError, match="OLE2"):
        cfb_streams(b"PK\x03\x04 this is a zip")


def test_xls_records_strings_and_numbers():
    data = make_xls(["name", "qty", "price"],
                    [["widget", 3, 2.5], ["gadget", -7, 10.0]])
    assert xls_records(data) == [
        {"name": "widget", "qty": 3, "price": 2.5},
        {"name": "gadget", "qty": -7, "price": 10},
    ]


def test_xls_sst_continue_and_utf16():
    rows = [[f"v{i}", i] for i in range(8)] + [["café ☃", 99]]
    data = make_xls(["k", "n"], rows, continue_split=4)
    got = xls_records(data)
    assert got[-1] == {"k": "café ☃", "n": 99}
    assert [r["k"] for r in got[:8]] == [f"v{i}" for i in range(8)]


def test_xls_big_workbook_regular_chain():
    data = make_xls(["a"], [["b"], ["c"]], pad_to=8192)
    assert xls_records(data) == [{"a": "b"}, {"a": "c"}]


def test_read_excel_routes_legacy_xls():
    data = make_xls(["h"], [["v", ], [3.25]])
    assert json.loads(read_excel(data)) == [{"h": "v"}, {"h": 3.25}]


def test_doc_paragraphs_cp1252():
    data = make_doc(["First paragraph", "Café notes", ""])
    assert doc_paragraphs(data) == ["First paragraph", "Café notes", ""]


def test_doc_paragraphs_utf16_and_two_pieces():
    paras = ["Unicode ☃ snowman", "second über paragraph"]
    assert doc_paragraphs(make_doc(paras, utf16=True)) == paras
    # mixed piece table: leading CP1252 piece + trailing UTF-16 piece
    # (the split lands mid-text, so the first half must stay CP1252-safe)
    mixed = ["plain ascii lead-in text", "tail with unicode ☃"]
    assert doc_paragraphs(make_doc(mixed, two_pieces=True)) == mixed


def test_doc_big_stream_and_1table():
    paras = [f"paragraph number {i}" for i in range(40)]
    data = make_doc(paras, pad_to=8192, table_name="1Table")
    assert doc_paragraphs(data) == paras


def test_read_doc_routes_legacy_doc():
    data = make_doc(["alpha   beta", "gamma"])
    assert json.loads(read_doc(data)) == ["alpha beta", "gamma"]  # clean_text


def test_dispatch_routes_legacy_ole_codecs():
    row = dispatch("old.xls", make_xls(["k"], [["v"]]))
    assert json.loads(row["content"]) == [{"k": "v"}] and row["error"] is None
    row = dispatch("old.doc", make_doc(["para one"]))
    assert json.loads(row["content"]) == ["para one"] and row["error"] is None
    # corrupt OLE surfaces in the error column, never fatal
    row = dispatch("bad.doc", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    assert row["content"] is None and row["error"]


# ---------------------------------------------------------------------------
# RC4-encrypted + ToUnicode-CID PDFs (verdict r3 item: close the PDF tail)
# ---------------------------------------------------------------------------

def _pad_pw(pw: bytes) -> bytes:
    from kgspark.sources import _PDF_PAD

    return (pw + _PDF_PAD)[:32]


def make_encrypted_pdf(pages, r=2, owner_pw=b"owner", user_pw=b"", p=-44,
                       aes=False):
    """Build an RC4- or AES-128-encrypted PDF per the PDF 1.7 spec's
    standard security handler (Algorithms 2/3/4/5; /AESV2 crypt filter for
    r=4) — the ENCRYPTION side, implemented from the spec here in the
    test, cross-checks the reader's decryption side."""
    import hashlib

    from kgspark.sources import _PDF_PAD, _pdf_obj_key, _rc4

    if aes:
        r = 4
    n = 5 if r == 2 else 16
    id0 = hashlib.md5(b"kgspark-pdf-fixture").digest()
    # Algorithm 3: /O
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    rc4key = h[:n]
    o = _rc4(rc4key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
    # Algorithm 2: file key (from the USER password)
    h = hashlib.md5(
        _pad_pw(user_pw) + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    # Algorithm 4/5: /U
    if r == 2:
        u = _rc4(key, _PDF_PAD)
    else:
        u = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u += b"\x00" * 16

    out = [b"%PDF-1.4\n"]
    objs = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    objs.append(
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> "
        f"endobj\n".encode()
    )
    for i, text in enumerate(pages):
        pid, cid = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{pid} 0 obj << /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            f"/MediaBox [0 0 612 792] >> endobj\n".encode()
        )
        esc = (
            text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        stream = zlib.compress(stream)
        if aes:
            from kgspark.aes import cbc_encrypt

            okey = hashlib.md5(
                key + cid.to_bytes(3, "little") + (0).to_bytes(2, "little")
                + b"sAlT"
            ).digest()[:16]
            iv = hashlib.md5(b"iv%d" % cid).digest()
            stream = iv + cbc_encrypt(okey, iv, stream)
        else:
            stream = _rc4(_pdf_obj_key(key, cid, 0), stream)
        objs.append(
            f"{cid} 0 obj << /Filter /FlateDecode /Length {len(stream)} >> "
            f"stream\n".encode()
            + stream + b"\nendstream endobj\n"
        )
    enc_num = 3 + 2 * n_pages
    v = 1 if r == 2 else (4 if r == 4 else 2)
    cf = (
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        "/StmF /StdCF /StrF /StdCF " if aes else ""
    )
    objs.append(
        f"{enc_num} 0 obj << /Filter /Standard /V {v} /R {r} "
        f"/Length {n * 8} {cf}/P {p} /O <{o.hex()}> /U <{u.hex()}> >> "
        f"endobj\n".encode()
    )
    trailer = (
        f"trailer << /Root 1 0 R /Encrypt {enc_num} 0 R "
        f"/ID [<{id0.hex()}> <{id0.hex()}>] >>\n%%EOF\n".encode()
    )
    return b"".join(out + objs + [trailer])


def make_cid_pdf(text, codes, compress=True) -> bytes:
    """PDF whose content shows TEXT as 2-byte CID hex strings through an
    embedded ToUnicode CMap (bfchar for odd codes, bfrange for a run)."""
    bfchars = "".join(
        f"<{c:04x}> <{ord(ch):04x}>\n" for ch, c in codes.items()
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        f"{len(codes)} beginbfchar\n{bfchars}endbfchar\n"
        "1 beginbfrange\n<0100> <0109> <0030>\nendbfrange\n"
        "endcmap\nend\n"
    ).encode("ascii")
    hexstr = "".join(f"{codes[ch]:04x}" for ch in text)
    stream = f"BT /F1 12 Tf 72 720 Td <{hexstr}> Tj ET".encode("ascii")
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b"/Filter /FlateDecode "
    return b"".join(
        [
            b"%PDF-1.4\n",
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
            f"4 0 obj << {filt.decode()}/Length {len(stream)} >> "
            f"stream\n".encode() + stream + b"\nendstream endobj\n",
            b"5 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >> "
            b"endobj\n",
            f"6 0 obj << /Length {len(cmap)} >> stream\n".encode()
            + cmap + b"\nendstream endobj\n",
            b"trailer << /Root 1 0 R >>\n%%EOF\n",
        ]
    )


def make_aes256_pdf(pages, user_pw=b"", owner_pw=b"owner"):
    """Build an AES-256 /AESV3 PDF per ISO 32000-2 (V=5 R=6, Algorithm
    2.A/2.B, /UE//OE key wrapping) — encryption side from the spec,
    cross-checking the reader."""
    import hashlib

    from kgspark.aes import cbc_encrypt
    from kgspark.sources import _pdf_hash_2b

    file_key = hashlib.sha256(b"kgspark-aes256-file-key").digest()
    vsalt, ksalt = b"VALSALT!", b"KEYSALT!"
    u = _pdf_hash_2b(user_pw, vsalt, b"") + vsalt + ksalt
    ue = cbc_encrypt(
        _pdf_hash_2b(user_pw, ksalt, b""), b"\x00" * 16, file_key, pad=False
    )
    ovs, oks = b"OVALSLT!", b"OKEYSLT!"
    o = _pdf_hash_2b(owner_pw, ovs, u) + ovs + oks
    oe = cbc_encrypt(
        _pdf_hash_2b(owner_pw, oks, u), b"\x00" * 16, file_key, pad=False
    )

    out = [b"%PDF-2.0\n"]
    objs = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    objs.append(
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> "
        f"endobj\n".encode()
    )
    for i, text in enumerate(pages):
        pid, cid = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{pid} 0 obj << /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            f"/MediaBox [0 0 612 792] >> endobj\n".encode()
        )
        esc = (
            text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        stream = zlib.compress(stream)
        iv = hashlib.md5(b"aes256iv%d" % cid).digest()
        stream = iv + cbc_encrypt(file_key, iv, stream)
        objs.append(
            f"{cid} 0 obj << /Filter /FlateDecode /Length {len(stream)} >> "
            f"stream\n".encode()
            + stream + b"\nendstream endobj\n"
        )
    enc_num = 3 + 2 * n_pages
    objs.append(
        f"{enc_num} 0 obj << /Filter /Standard /V 5 /R 6 /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P -44 "
        f"/O <{o.hex()}> /U <{u.hex()}> "
        f"/OE <{oe.hex()}> /UE <{ue.hex()}> >> endobj\n".encode()
    )
    trailer = (
        f"trailer << /Root 1 0 R /Encrypt {enc_num} 0 R >>\n%%EOF\n".encode()
    )
    return b"".join(out + objs + [trailer])


def test_aes_fips197_known_vectors():
    """FIPS-197 Appendix C known-answer vectors, all three key sizes,
    plus CBC mode roundtrip with PKCS#7 padding."""
    from kgspark.aes import (
        cbc_decrypt, cbc_encrypt, decrypt_block, encrypt_block,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vec = {
        16: "69c4e0d86a7b0430d8cdb78070b4c55a",
        24: "dda97ca4864cdfe06eaf70a0ec0d7191",
        32: "8ea2b7ca516745bfeafc49904b496089",
    }
    for klen, ct_hex in vec.items():
        key = bytes(range(klen))
        ct = encrypt_block(key, pt)
        assert ct.hex() == ct_hex, klen
        assert decrypt_block(key, ct) == pt
    iv = bytes(range(16))
    for msg in (b"", b"x", b"0123456789abcdef", b"a" * 33):
        ct = cbc_encrypt(bytes(range(32)), iv, msg)
        assert len(ct) % 16 == 0 and len(ct) > len(msg)
        assert cbc_decrypt(bytes(range(32)), iv, ct) == msg


def test_pdf_aesv2_encrypted_roundtrip():
    data = make_encrypted_pdf(["Locked (AES-128) page", "Page two"],
                              aes=True)
    got = json.loads(read_pdf(data))
    assert got == ["Locked (AES-128) page", "Page two"]


def test_pdf_aesv3_encrypted_roundtrip():
    data = make_aes256_pdf(["AES-256 (R6) page", "Second Über page"])
    got = json.loads(read_pdf(data))
    assert got == ["AES-256 (R6) page", "Second Über page"]


def test_pdf_aes_password_required_is_gated():
    import pytest

    for data in (
        make_encrypted_pdf(["hidden"], aes=True, user_pw=b"hunter2"),
        make_aes256_pdf(["hidden"], user_pw=b"hunter2"),
    ):
        with pytest.raises(NotImplementedError, match="password"):
            read_pdf(data)


def test_rc4_known_vector():
    """RC4 against the classic public test vector (key 'Key')."""
    from kgspark.sources import _rc4

    assert _rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert _rc4(b"Key", _rc4(b"Key", b"secret")) == b"secret"


def test_pdf_rc4_encrypted_roundtrip():
    for r in (2, 3):
        data = make_encrypted_pdf(["Locked (RC4) page", "Second page"], r=r)
        got = json.loads(read_pdf(data))
        assert got == ["Locked (RC4) page", "Second page"], (r, got)


def test_pdf_password_required_is_gated():
    import pytest

    data = make_encrypted_pdf(["hidden"], user_pw=b"hunter2")
    with pytest.raises(NotImplementedError, match="password"):
        read_pdf(data)


def test_pdf_aes_is_gated():
    import pytest

    data = make_encrypted_pdf(["x"]).replace(b"/V 1", b"/V 4")
    with pytest.raises(NotImplementedError, match="AES"):
        read_pdf(data)


def test_pdf_tounicode_cid_roundtrip():
    codes = {"H": 3, "e": 7, "l": 11, "o": 13, " ": 17, "w": 19, "r": 23,
             "d": 29, "Ü": 31, "✓": 37}
    text = "Hello world Ü ✓"
    got = json.loads(read_pdf(make_cid_pdf(text, codes)))
    assert got == [text]


def test_pdf_tounicode_bfrange_digits():
    # bfrange <0100>-<0109> -> '0'..'9', shown via a second hex Tj
    import re

    codes = {"#": 997}
    digits = "".join(f"{0x0100 + k:04x}" for k in range(10))
    data = make_cid_pdf("#", codes, compress=False)
    data = data.replace(b"> Tj ET", f"> Tj <{digits}> Tj ET".encode())
    data = re.sub(
        rb"/Length \d+ >> stream\n(BT[^\n]*ET)",
        lambda m: b"/Length %d >> stream\n%s" % (len(m.group(1)), m.group(1)),
        data,
    )
    # two Tj ops join with \n, which clean_text folds to a single space
    got = json.loads(read_pdf(data))
    assert got == ["# 0123456789"]


def _make_epub(chapters, nested=True, spine_order=None):
    """Spec-built EPUB fixture: OCF container + OPF spine, stdlib only."""
    import io
    import zipfile

    base = "OEBPS/" if nested else ""
    ids = [f"ch{i}" for i in range(len(chapters))]
    manifest = "".join(
        f'<item id="{i}" href="c_{i}.xhtml" '
        'media-type="application/xhtml+xml"/>' for i in ids
    )
    order = spine_order if spine_order is not None else ids
    spine = "".join(f'<itemref idref="{i}"/>' for i in order)
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        f'<rootfiles><rootfile full-path="{base}content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr("META-INF/container.xml", container)
        z.writestr(base + "content.opf", opf)
        for i, body in zip(ids, chapters):
            z.writestr(
                base + f"c_{i}.xhtml",
                f"<html><body><p>{body}</p></body></html>",
            )
    return buf.getvalue()


def test_epub_reader_spine_order_and_nesting():
    import json

    from kgspark.sources import dispatch, read_epub

    data = _make_epub(["First chapter.", "Second one."])
    out = json.loads(read_epub(data))
    assert out == ["First chapter.", "Second one."]
    # spine REVERSED -> chapter order follows the spine, not the zip
    rev = _make_epub(["First chapter.", "Second one."],
                     spine_order=["ch1", "ch0"])
    assert json.loads(read_epub(rev)) == ["Second one.", "First chapter."]
    # flat (non-OEBPS) layout resolves hrefs relative to the OPF
    flat = _make_epub(["Flat layout."], nested=False)
    assert json.loads(read_epub(flat)) == ["Flat layout."]
    # dispatcher wiring + error capture
    row = dispatch("book.epub", data)
    assert row["error"] is None and "First chapter." in row["content"]
    bad = dispatch("broken.epub", b"PK\x03\x04 garbage")
    assert bad["content"] is None and bad["error"]
