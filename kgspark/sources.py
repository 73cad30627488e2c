"""File-format sources + dispatcher (ref S1-S7,
/root/reference/knowledgeGraph.py:43-135).

The reference reads 11 upload formats into a normalized envelope. For the
web-corpus target the dispatch collapses to the HTML extractor
(kgspark.html), but the engine keeps the full surface: a binaryFile scan +
per-format handlers. docx, xlsx and simple (raw/Flate) PDFs parse with
pure-stdlib codecs (zipfile + ElementTree, zlib + operator scan), and legacy
binary .xls/.doc parse via the pure-stdlib OLE2/BIFF8/piece-table codecs in
kgspark.ole — no third-party codec anywhere. Only image-OCR (no OCR engine
exists in stdlib) and encrypted/CID-font PDFs remain gated behind a clearly
marked seam — the dispatch, schema and error-wrapping semantics are real and
tested either way.

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


def _pdf_pages(data: bytes) -> list[str]:
    """Minimal pure-stdlib PDF text extraction: content streams (raw or
    FlateDecode via zlib) scanned for Tj / TJ text-showing operators, one
    output string per text-bearing stream (~page for simple PDFs). Covers
    the uncompressed/Flate Type1-font PDFs the reference's PyPDF2 path reads
    in practice; exotic encodings/CID fonts are out of scope and surface as
    empty pages."""
    import re
    import zlib

    pages: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)\r?\nendstream", data, re.S):
        blob = m.group(1)
        try:
            blob = zlib.decompress(blob)
        except zlib.error:
            pass
        if b"BT" not in blob:
            continue
        parts: list[str] = []
        for op in re.finditer(
            rb"(?P<lit>" + _PDF_LIT + rb")\s*Tj"
            rb"|\[(?P<arr>(?:" + _PDF_LIT + rb"|[^\]])*)\]\s*TJ",
            blob,
        ):
            if op.group("lit") is not None:
                parts.append(_pdf_literal(op.group("lit")[1:-1]))
            else:
                parts.append(
                    "".join(
                        _pdf_literal(x[1:-1])
                        for x in re.findall(_PDF_LIT, op.group("arr"))
                    )
                )
        pages.append("\n".join(parts))
    return pages


def read_pdf(data: bytes) -> str:
    """ref S5 (knowledgeGraph.py:67-73): per-page text list, cleaned."""
    pages = _pdf_pages(data)
    if not pages:
        raise NotImplementedError(
            "no extractable text streams (encrypted/CID PDFs need a full "
            "codec; simple Flate/raw PDFs parse here)"
        )
    return _json.dumps([clean_text(p) for p in pages], ensure_ascii=False)


def read_image_ocr(data: bytes) -> str:
    """STUB — ref S6 needs pytesseract (absent here)."""
    raise NotImplementedError("OCR not available in this environment")


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
