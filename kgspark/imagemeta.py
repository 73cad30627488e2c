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
  BMP   'BM' signature; BITMAPINFOHEADER: width s32 / height s32 (negative
        = top-down) at 18/22, bits-per-pixel u16 at 28 (Windows GDI
        BITMAPINFOHEADER layout).
  WEBP  RIFF container ('RIFF' … 'WEBP'); first chunk fourcc selects the
        bitstream: 'VP8 ' lossy (start code 9D 01 2A, 14-bit LE dims),
        'VP8L' lossless (0x2F signature byte, dims-1 packed in a LE u32
        with an alpha bit), 'VP8X' extended (flag byte + 24-bit LE
        canvas dims-1) — RFC 9649 §2.
  TIFF  'II*\\0' / 'MM\\0*' byte-order header, u32 offset to the first
        IFD; 12-byte tag entries give ImageWidth(256) / ImageLength(257)
        / BitsPerSample(258) / SamplesPerPixel(277) (TIFF 6.0 §2).

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
# BMP bits-per-pixel -> (per-channel bit depth, channel count):
# 1/4/8 are palette-indexed single-channel; 16 is 5-5-5 RGB; 24/32 are
# 8-bit BGR(A) (Windows GDI BITMAPINFOHEADER semantics)
_BMP_DEPTH_CHANNELS = {1: (1, 1), 4: (4, 1), 8: (8, 1),
                       16: (5, 3), 24: (8, 3), 32: (8, 4)}


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
        if data[:2] == b"BM":
            if len(data) < 30:
                out.update(format="bmp", error="bmp: truncated header")
                return out
            w = struct.unpack("<i", data[18:22])[0]
            h = abs(struct.unpack("<i", data[22:26])[0])  # <0 = top-down
            bpp = struct.unpack("<H", data[28:30])[0]
            depth_ch = _BMP_DEPTH_CHANNELS.get(bpp)
            if depth_ch is None:
                out.update(format="bmp", error=f"bmp: unknown bpp {bpp}")
                return out
            out.update(format="bmp", width=w, height=h,
                       bit_depth=depth_ch[0], n_channels=depth_ch[1])
            return out
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            four = data[12:16]
            if four == b"VP8 ":
                if len(data) < 30 or data[23:26] != b"\x9d\x01\x2a":
                    out.update(format="webp",
                               error="webp: bad VP8 start code")
                    return out
                w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
                h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
                out.update(format="webp", width=w, height=h, bit_depth=8,
                           n_channels=3)
                return out
            if four == b"VP8L":
                if len(data) < 25 or data[20] != 0x2F:
                    out.update(format="webp",
                               error="webp: bad VP8L signature")
                    return out
                bits = struct.unpack("<I", data[21:25])[0]
                alpha = (bits >> 28) & 1
                out.update(format="webp", width=(bits & 0x3FFF) + 1,
                           height=((bits >> 14) & 0x3FFF) + 1, bit_depth=8,
                           n_channels=3 + alpha)
                return out
            if four == b"VP8X":
                if len(data) < 30:
                    out.update(format="webp", error="webp: truncated VP8X")
                    return out
                alpha = (data[20] >> 4) & 1
                w = int.from_bytes(data[24:27], "little") + 1
                h = int.from_bytes(data[27:30], "little") + 1
                out.update(format="webp", width=w, height=h, bit_depth=8,
                           n_channels=3 + alpha)
                return out
            out.update(format="webp",
                       error=f"webp: unknown chunk {four!r}")
            return out
        if data[:4] in (b"II*\x00", b"MM\x00*"):
            end = "<" if data[:2] == b"II" else ">"
            ifd = struct.unpack(end + "I", data[4:8])[0]
            if ifd + 2 > len(data):
                out.update(format="tiff", error="tiff: truncated IFD")
                return out
            n_ent = struct.unpack(end + "H", data[ifd:ifd + 2])[0]
            tags = {}
            for k in range(n_ent):
                e0 = ifd + 2 + 12 * k
                if e0 + 12 > len(data):
                    break
                tag, typ = struct.unpack(end + "HH", data[e0:e0 + 4])
                cnt = struct.unpack(end + "I", data[e0 + 4:e0 + 8])[0]
                if typ == 3 and cnt == 1:        # SHORT inline
                    val = struct.unpack(end + "H", data[e0 + 8:e0 + 10])[0]
                elif typ == 4 and cnt == 1:      # LONG inline
                    val = struct.unpack(end + "I", data[e0 + 8:e0 + 12])[0]
                elif typ == 3 and cnt > 1:       # SHORT array via offset
                    off = struct.unpack(end + "I", data[e0 + 8:e0 + 12])[0]
                    if off + 2 > len(data):
                        continue
                    val = struct.unpack(end + "H", data[off:off + 2])[0]
                else:
                    continue
                tags[tag] = val
            if 256 not in tags or 257 not in tags:
                out.update(format="tiff", error="tiff: missing dimensions")
                return out
            out.update(format="tiff", width=tags[256], height=tags[257],
                       bit_depth=tags.get(258, 1),
                       n_channels=tags.get(277, 1))
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


def make_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Minimal structurally-valid BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER (pixel array omitted — header parsing must not
    need it)."""
    info = struct.pack("<IiiHH", 40, width, height, 1, bpp) + b"\x00" * 24
    return (b"BM" + struct.pack("<I", 14 + len(info)) + b"\x00" * 4
            + struct.pack("<I", 14 + len(info)) + info)


def make_webp(width: int, height: int, kind: str = "vp8",
              alpha: int = 0) -> bytes:
    """Minimal structurally-valid WEBP header (RFC 9649): RIFF container
    + one of the three bitstream chunk prefixes ('vp8' lossy / 'vp8l'
    lossless / 'vp8x' extended). Compressed payload omitted."""
    if kind == "vp8":
        payload = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width, height))
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    elif kind == "vp8l":
        bits = (width - 1) | ((height - 1) << 14) | ((alpha & 1) << 28)
        payload = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif kind == "vp8x":
        payload = (bytes([0x10 if alpha else 0]) + b"\x00\x00\x00"
                   + (width - 1).to_bytes(3, "little")
                   + (height - 1).to_bytes(3, "little"))
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError(f"make_webp: kind must be vp8|vp8l|vp8x, got {kind}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_tiff(width: int, height: int, bits_per_sample: int = 8,
              samples_per_pixel: int = 1, big_endian: bool = False) -> bytes:
    """Minimal structurally-valid TIFF (6.0): byte-order header + one IFD
    with SHORT entries for ImageWidth / ImageLength / BitsPerSample /
    SamplesPerPixel (ascending tag order, as the spec requires)."""
    end = ">" if big_endian else "<"
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        end + "I", 8
    )

    def entry(tag: int, val: int) -> bytes:
        return (struct.pack(end + "HHI", tag, 3, 1)
                + struct.pack(end + "H", val) + b"\x00\x00")

    ents = (entry(256, width) + entry(257, height)
            + entry(258, bits_per_sample) + entry(277, samples_per_pixel))
    return hdr + struct.pack(end + "H", 4) + ents + struct.pack(end + "I", 0)


# ---------------------------------------------------------------------------
# EXIF (TIFF 6.0 IFD) metadata — pure stdlib, spec-built ([EXIF 2.32] §4.6,
# TIFF 6.0 §2). Beyond-reference scope: the reference's image path is an
# OCR call (knowledgeGraph.py:75-78); camera metadata never enters it.
# ---------------------------------------------------------------------------

_EXIF_TAGS = {271: "make", 272: "model", 274: "orientation",
              306: "datetime"}
_EXIF_SUB = {40962: "exif_width", 40963: "exif_height"}
_EXIF_PTR = 34665
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _read_ifd(tiff: bytes, off: int, end: str) -> dict[int, object]:
    """One IFD -> {tag: decoded first value}; ASCII values decode to
    NUL-stripped latin-1 strings, SHORT/LONG to ints. Bounds-checked."""
    out: dict[int, object] = {}
    if off + 2 > len(tiff):
        return out
    (n,) = struct.unpack(end + "H", tiff[off:off + 2])
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack(end + "HHI", tiff[e:e + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        if total <= 4:
            raw = tiff[e + 8:e + 8 + total]
        else:
            (voff,) = struct.unpack(end + "I", tiff[e + 8:e + 12])
            if voff + total > len(tiff):
                continue
            raw = tiff[voff:voff + total]
        if typ == 2:
            out[tag] = raw.split(b"\x00")[0].decode("latin-1")
        elif typ == 3 and cnt >= 1:
            out[tag] = struct.unpack(end + "H", raw[:2])[0]
        elif typ == 4 and cnt >= 1:
            out[tag] = struct.unpack(end + "I", raw[:4])[0]
    return out


def parse_exif(data: bytes) -> dict:
    """EXIF fields from a JPEG (APP1 Exif segment) or bare TIFF blob:
    (endian, make, model, orientation, datetime, exif_width,
    exif_height, error). Never raises; absent segment/fields are None
    with an error note, the corpus-scale codec posture."""
    out = {"endian": None, "make": None, "model": None,
           "orientation": None, "datetime": None, "exif_width": None,
           "exif_height": None, "error": None}
    try:
        tiff = None
        if data[:2] == b"\xff\xd8":
            pos, n = 2, len(data)
            while pos + 4 <= n and data[pos] == 0xFF:
                marker = data[pos + 1]
                seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
                if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                    tiff = data[pos + 10:pos + 2 + seg_len]
                    break
                if marker == 0xDA:  # start of scan: no more segments
                    break
                pos += 2 + seg_len
            if tiff is None:
                out["error"] = "jpeg: no Exif APP1 segment"
                return out
        elif data[:4] in (b"II*\x00", b"MM\x00*"):
            tiff = data
        else:
            out["error"] = "not jpeg/tiff"
            return out
        end = "<" if tiff[:2] == b"II" else ">"
        out["endian"] = "II" if end == "<" else "MM"
        (ifd0_off,) = struct.unpack(end + "I", tiff[4:8])
        ifd0 = _read_ifd(tiff, ifd0_off, end)
        for tag, name in _EXIF_TAGS.items():
            if tag in ifd0:
                out[name] = ifd0[tag]
        if _EXIF_PTR in ifd0:
            sub = _read_ifd(tiff, int(ifd0[_EXIF_PTR]), end)
            for tag, name in _EXIF_SUB.items():
                if tag in sub:
                    out[name] = sub[tag]
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        out["error"] = f"{type(e).__name__}: {e}"
        return out


def exif_meta(df: DataFrame, payload_col: str = "payload",
              id_col: str = "doc_id") -> DataFrame:
    """(id, endian, make, model, orientation, datetime, exif_width,
    exif_height, error) for a binary column — Arrow-batched, segment
    bytes only (the pixel stream is never touched)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = parse_exif(bytes(blob) if blob is not None else b"")
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "endian", "make", "model", "orientation",
                         "datetime", "exif_width", "exif_height", "error"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        parse,
        f"{id_col} {id_type}, endian string, make string, model string, "
        "orientation long, datetime string, exif_width long, "
        "exif_height long, error string",
    )


def make_jpeg_exif(orientation: int, datetime_s: str, make: str,
                   model: str, exif_w: int, exif_h: int,
                   big_endian: bool = False) -> bytes:
    """Structurally-valid JPEG carrying an APP1 Exif segment: IFD0 with
    Make/Model/Orientation/DateTime + ExifIFD pointer; the Exif sub-IFD
    carries PixelX/YDimension as LONGs. ASCII values > 4 bytes go to the
    post-IFD data area, <= 4 bytes inline (both layouts exercised)."""
    end = ">" if big_endian else "<"
    mk = make.encode("latin-1") + b"\x00"
    md = model.encode("latin-1") + b"\x00"
    dt = datetime_s.encode("latin-1") + b"\x00"
    ifd0_off = 8
    n0 = 5
    data_off = ifd0_off + 2 + 12 * n0 + 4

    area = b""

    def ascii_entry(tag: int, val: bytes) -> bytes:
        nonlocal area
        if len(val) <= 4:
            return (struct.pack(end + "HHI", tag, 2, len(val))
                    + val + b"\x00" * (4 - len(val)))
        off = data_off + len(area)
        area += val
        return struct.pack(end + "HHII", tag, 2, len(val), off)

    e_make = ascii_entry(271, mk)
    e_model = ascii_entry(272, md)
    e_orient = (struct.pack(end + "HHI", 274, 3, 1)
                + struct.pack(end + "H", orientation) + b"\x00\x00")
    e_dt = ascii_entry(306, dt)
    sub_off = data_off + len(area)
    e_ptr = struct.pack(end + "HHII", _EXIF_PTR, 4, 1, sub_off)
    sub = (struct.pack(end + "H", 2)
           + struct.pack(end + "HHII", 40962, 4, 1, exif_w)
           + struct.pack(end + "HHII", 40963, 4, 1, exif_h)
           + struct.pack(end + "I", 0))
    tiff = ((b"MM\x00*" if big_endian else b"II*\x00")
            + struct.pack(end + "I", ifd0_off)
            + struct.pack(end + "H", n0)
            + e_make + e_model + e_orient + e_dt + e_ptr
            + struct.pack(end + "I", 0)
            + area + sub)
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"
