"""File-format sources + dispatcher (ref S1-S7,
/root/reference/knowledgeGraph.py:43-135).

The reference reads 11 upload formats into a normalized envelope. For the
web-corpus target the dispatch collapses to the HTML extractor
(kgspark.html), but the engine keeps the full surface: a binaryFile scan +
per-format handlers, with formats whose codec libraries aren't in this
container (doc/docx, pdf, image-OCR) stubbed behind a clearly marked seam —
the dispatch, schema and error-wrapping semantics are real and tested.

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
from kgspark.textnorm import clean_text

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
    records = df.to_dict(orient="records")
    return _json.dumps(records, ensure_ascii=False, default=str)


def read_json_text(data: bytes) -> str:
    return _json.dumps(_json.loads(data.decode("utf-8")), ensure_ascii=False)


def read_excel(data: bytes) -> str:
    """ref S2 (knowledgeGraph.py:48-55): pandas read_excel -> records.
    Needs openpyxl/xlrd — gated, stubbed when absent."""
    import io

    try:
        df = pd.read_excel(io.BytesIO(data))
    except ImportError as e:
        raise NotImplementedError(f"excel codec not available: {e}") from e
    return _json.dumps(df.to_dict(orient="records"), ensure_ascii=False,
                       default=str)


def read_doc(data: bytes) -> str:
    """STUB — ref S4 needs python-docx (absent here). Seam: parse paragraphs
    via docx.Document(io.BytesIO(data))."""
    raise NotImplementedError("docx codec not available in this environment")


def read_pdf(data: bytes) -> str:
    """STUB — ref S5 needs PyPDF2 (absent here)."""
    raise NotImplementedError("pdf codec not available in this environment")


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
