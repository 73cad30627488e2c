"""Image HEADER metadata — the pure-stdlib slice of image decode.

Full pixel decode needs PIL/ffmpeg (absent in this container; the seam
stays in kgspark/multimodal.py decode_image). But the metadata a curation
pipeline filters on FIRST — dimensions, bit depth, color type, format
validity — lives in fixed-layout headers that plain byte arithmetic reads:

  PNG   8-byte signature, then the IHDR chunk: width/height as big-endian
        u32 at offsets 16/20, bit depth at 24, color type at 25
        (RFC 2083 / ISO 15948 §11.2.2).
  JPEG  FFD8 SOI, then marker segments; the first SOF0-SOF15 frame header
        (excluding DHT/DAC/RST markers that share the range) carries
        precision, height, width, n_components (ITU T.81 §B.2.2).
  GIF   'GIF87a'/'GIF89a' signature; width/height little-endian u16 at
        offsets 6/8.

Scale shape: an Arrow-batched mapInPandas over the binary column — one
Python pass per batch, bytes sliced not decoded; per-file errors go into
an `error` column (the sources.py posture). Filtering "images smaller
than 64px / absurd aspect ratios / truncated headers" before ANY decode
is the standard multimodal-curation first gate (LAION-style pipelines).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

META_FIELDS = (
    "format string, width long, height long, bit_depth long, "
    "n_channels long, error string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (ISO 15948 table 11.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers: C0-CF minus C4 (DHT), C8 (JPG ext), CC (DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_meta(data: bytes) -> dict:
    """Header metadata for one image blob; never raises — malformed input
    yields format=None plus an error message."""
    out = {"format": None, "width": None, "height": None,
           "bit_depth": None, "n_channels": None, "error": None}
    try:
        if data[:8] == _PNG_SIG:
            if len(data) < 26 or data[12:16] != b"IHDR":
                out["error"] = "png: truncated/missing IHDR"
                return out
            w, h = struct.unpack(">II", data[16:24])
            depth, color = data[24], data[25]
            out.update(format="png", width=w, height=h, bit_depth=depth,
                       n_channels=_PNG_CHANNELS.get(color))
            if out["n_channels"] is None:
                out["error"] = f"png: unknown color type {color}"
            return out
        if data[:2] == b"\xff\xd8":
            pos = 2
            n = len(data)
            while pos + 4 <= n:
                if data[pos] != 0xFF:
                    out["error"] = f"jpeg: bad marker byte at {pos}"
                    out["format"] = "jpeg"
                    return out
                marker = data[pos + 1]
                if marker in _JPEG_SOF:
                    if pos + 10 > n:
                        break
                    prec = data[pos + 4]
                    h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                    nc = data[pos + 9]
                    out.update(format="jpeg", width=w, height=h,
                               bit_depth=prec, n_channels=nc)
                    return out
                seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
                pos += 2 + seg_len
            out.update(format="jpeg", error="jpeg: no SOF frame header")
            return out
        if data[:6] in (b"GIF87a", b"GIF89a"):
            if len(data) < 10:
                out.update(format="gif", error="gif: truncated header")
                return out
            w, h = struct.unpack("<HH", data[6:10])
            out.update(format="gif", width=w, height=h, bit_depth=8,
                       n_channels=3)
            return out
        out["error"] = "unknown image format"
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        out["error"] = f"{type(e).__name__}: {e}"
        return out


def image_meta(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """(id, format, width, height, bit_depth, n_channels, error) for a
    binary image column — Arrow-batched, header bytes only."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = parse_image_meta(
                    bytes(blob) if blob is not None else b""
                )
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "width", "height",
                         "bit_depth", "n_channels", "error"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {META_FIELDS}"
    )


def make_png(width: int, height: int, bit_depth: int = 8,
             color_type: int = 2) -> bytes:
    """Minimal structurally-valid PNG header (signature + IHDR) — the
    deterministic fixture generator tests and the contract round-trip
    use. Payload chunks are omitted: header parsing must not need them."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (_PNG_SIG + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF))


def make_jpeg(width: int, height: int, precision: int = 8,
              n_components: int = 3) -> bytes:
    """Minimal structurally-valid JPEG prefix: SOI + JFIF APP0 + SOF0
    frame header with per-component specs (ITU T.81 §B.2.2). Entropy-coded
    data is omitted — header parsing must not need it."""
    app0_body = (b"JFIF\x00" + b"\x01\x02"  # version 1.2
                 + b"\x00"                   # density units
                 + struct.pack(">HH", 72, 72) + b"\x00\x00")
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(app0_body)) + app0_body
    comps = b"".join(
        struct.pack("BBB", i + 1, 0x22 if i == 0 else 0x11, 0)
        for i in range(n_components)
    )
    sof_body = (struct.pack("B", precision)
                + struct.pack(">HH", height, width)
                + struct.pack("B", n_components) + comps)
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + sof


def make_gif(width: int, height: int, version: bytes = b"89a") -> bytes:
    """Minimal structurally-valid GIF: signature + logical screen
    descriptor (width/height little-endian u16) + trailer."""
    return (b"GIF" + version + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b")
