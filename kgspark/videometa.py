"""Video HEADER metadata — the pure-stdlib slice of video decode.

Frame decode needs ffmpeg/PyAV (absent in this container; the seam stays
in kgspark/multimodal.py frame_samples / decode stubs). But the metadata
a curation pipeline filters on FIRST — duration, resolution, track
layout, brand — lives in the ISO Base Media File Format box tree
(ISO/IEC 14496-12, the MP4/QuickTime container family) and plain byte
arithmetic reads it:

  box      u32 BE size + 4-byte type; size==1 → u64 largesize follows;
           size==0 → box runs to end of enclosing container.
  ftyp     major_brand (4 chars) + minor_version + compatible brands —
           the sniffing anchor ('isom', 'mp42', 'qt  ', ...).
  moov     container: mvhd (v0: u32 timescale + u32 duration; v1: u32
           timescale + u64 duration) gives duration_ms =
           duration * 1000 // timescale, exact-integer.
  trak     per-track container: tkhd carries width/height as 16.16
           fixed-point at payload offset 76 (v0) / 88 (v1); mdia/hdlr's
           handler_type ('vide' / 'soun') tells the track kind.

The reference pipeline has no video path at all (its inputs are
text/PDF/image, knowledgeGraph.py:60-78); this is the video third of the
multimodal curation gate, same posture as kgspark/imagemeta.py and
kgspark/audiometa.py: drop "truncated / absurd-duration / 16x16-pixel
spam clips" before ANY decode is attempted.

Scale shape: Arrow-batched mapInPandas over the binary column — one
Python pass per batch, header bytes sliced not decoded (the box walk
never touches mdat payload bytes); per-file errors go to an `error`
column (the sources.py posture). All emitted fields are exact integers,
so contract oracles reconstruct them arithmetically.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

VIDEO_META_FIELDS = (
    "format string, brand string, timescale long, duration_ms long, "
    "n_tracks long, width long, height long, has_audio long, "
    "error string"
)


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    data[start:end]; raises on a box that overruns its container."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:  # box extends to end of container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: box overruns container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _parse_mvhd(data: bytes, s: int, e: int, out: dict) -> None:
    version = data[s]
    if version == 1:
        if s + 4 + 20 + 8 > e:
            raise ValueError("mp4: truncated mvhd v1")
        timescale = struct.unpack(">I", data[s + 20:s + 24])[0]
        duration = struct.unpack(">Q", data[s + 24:s + 32])[0]
    else:
        if s + 4 + 12 + 4 > e:
            raise ValueError("mp4: truncated mvhd v0")
        timescale, duration = struct.unpack(">II", data[s + 12:s + 20])
    if timescale == 0:
        out["error"] = "mp4: zero mvhd timescale"
        return
    out.update(timescale=timescale,
               duration_ms=duration * 1000 // timescale)


def _parse_trak(data: bytes, s: int, e: int, out: dict) -> None:
    dims = handler = None
    for t, bs, be in _boxes(data, s, e):
        if t == b"tkhd":
            off = bs + (88 if data[bs] == 1 else 76)
            if off + 8 <= be:
                w, h = struct.unpack(">II", data[off:off + 8])
                dims = (w >> 16, h >> 16)  # 16.16 fixed point
        elif t == b"mdia":
            hd = _find(data, bs, be, b"hdlr")
            if hd is not None and hd[0] + 12 <= hd[1]:
                handler = data[hd[0] + 8:hd[0] + 12]
    out["n_tracks"] += 1
    if handler == b"soun":
        out["has_audio"] = 1
    elif handler == b"vide" and dims is not None and out["width"] == 0:
        out["width"], out["height"] = dims


def _vint(data: bytes, p: int, keep_marker: bool = False):
    """EBML variable-length integer at offset p → (value, next offset).
    The leading-zero count of the first byte gives the width (RFC 8794
    §4); element IDs keep the marker bit (the spec's ID convention),
    sizes mask it out. A size whose value bits are ALL ones is the
    spec's "unknown size" sentinel (RFC 8794 §6.2 — streamed/live
    Segments use it) and is returned as None, never as a huge number:
    treating it numerically would mis-skip every following sibling."""
    b0 = data[p]
    if b0 == 0:
        raise ValueError("ebml: invalid all-zero VINT marker")
    n, mask = 1, 0x80
    while not (b0 & mask):
        n += 1
        mask >>= 1
    val = b0 if keep_marker else (b0 & (mask - 1))
    if p + n > len(data):
        raise ValueError("ebml: truncated VINT")
    for i in range(1, n):
        val = (val << 8) | data[p + i]
    if not keep_marker and val == (1 << (7 * n)) - 1:
        return None, p + n
    return val, p + n


def _ebml_children(data: bytes, p: int, end: int):
    """Yield (id, payload_start, payload_end) for the sibling elements
    of one master element's payload — bounded, never recursive."""
    while p < end:
        eid, p = _vint(data, p, keep_marker=True)
        esz, p = _vint(data, p)
        if esz is None:
            # unknown-size element: extends to the parent's end, so by
            # definition it has no following siblings at this level
            yield eid, p, end
            return
        yield eid, p, min(end, p + esz)
        p += esz


def _parse_webm(data: bytes, out: dict) -> dict:
    """Matroska/WebM EBML headers (RFC 8794 structure + the Matroska
    element registry): DocType from the EBML header; then inside
    Segment → Info: TimestampScale (ns/tick, default 1e6) and Duration
    (a FLOAT in ticks — fixtures pin integer-valued doubles so the
    millisecond conversion stays exact); Segment → Tracks →
    TrackEntry → Video: PixelWidth/PixelHeight; audio presence from
    any TrackEntry's Audio element. Only registered master elements
    are descended — unknown elements skip by their declared size, the
    property that makes EBML forward-compatible and this walk
    bounded."""
    out.update(format="webm", brand=None, timescale=1_000_000,
               duration_ms=0, n_tracks=0, width=0, height=0,
               has_audio=0)
    eid, p = _vint(data, 0, keep_marker=True)
    hsz, p = _vint(data, p)
    if hsz is None:  # unknown-size EBML header: clamp to blob end
        hsz = len(data) - p
    for cid, s, e in _ebml_children(data, p, p + hsz):
        if cid == 0x4282:
            out["brand"] = data[s:e].decode("latin-1")
    p += hsz
    eid, p = _vint(data, p, keep_marker=True)
    if eid != 0x18538067:
        out["error"] = "webm: missing Segment"
        return out
    ssz, p = _vint(data, p)
    seg_end = len(data) if ssz is None else min(len(data), p + ssz)
    duration_ticks = None
    for cid, s, e in _ebml_children(data, p, seg_end):
        if cid == 0x1549A966:  # Info
            for iid, is_, ie in _ebml_children(data, s, e):
                if iid == 0x2AD7B1:
                    out["timescale"] = int.from_bytes(
                        data[is_:ie], "big")
                elif iid == 0x4489:
                    raw = data[is_:ie]
                    duration_ticks = struct.unpack(
                        ">f" if len(raw) == 4 else ">d", raw)[0]
        elif cid == 0x1654AE6B:  # Tracks
            for tid, ts, te in _ebml_children(data, s, e):
                if tid != 0xAE:  # TrackEntry
                    continue
                out["n_tracks"] += 1
                for vid, vs, ve in _ebml_children(data, ts, te):
                    if vid == 0xE0:  # Video
                        for wid, ws, we in _ebml_children(
                                data, vs, ve):
                            if wid == 0xB0:
                                out["width"] = int.from_bytes(
                                    data[ws:we], "big")
                            elif wid == 0xBA:
                                out["height"] = int.from_bytes(
                                    data[ws:we], "big")
                    elif vid == 0xE1:  # Audio
                        out["has_audio"] = 1
    if duration_ticks is not None and out["timescale"]:
        out["duration_ms"] = int(
            duration_ticks * out["timescale"]) // 1_000_000
    return out


def parse_video_meta(data: bytes) -> dict:
    """Header metadata for one ISO-BMFF blob; never raises — malformed
    input yields format=None plus an error message."""
    out = {"format": None, "brand": None, "timescale": None,
           "duration_ms": None, "n_tracks": None, "width": None,
           "height": None, "has_audio": None, "error": None}
    try:
        if data[:4] == b"\x1a\x45\xdf\xa3":
            return _parse_webm(data, out)
        if len(data) < 12 or data[4:8] != b"ftyp":
            out["error"] = "unknown video format"
            return out
        out.update(format="mp4", brand=data[8:12].decode("latin-1"),
                   n_tracks=0, width=0, height=0, has_audio=0)
        moov = _find(data, 0, len(data), b"moov")
        if moov is None:
            out["error"] = "mp4: missing moov"
            return out
        mvhd_seen = False
        for t, s, e in _boxes(data, moov[0], moov[1]):
            if t == b"mvhd":
                _parse_mvhd(data, s, e, out)
                if out["error"]:
                    return out
                mvhd_seen = True
            elif t == b"trak":
                _parse_trak(data, s, e, out)
        if not mvhd_seen:
            out["error"] = "mp4: missing mvhd"
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        out["error"] = f"{type(e).__name__}: {e}"
        return out


def video_meta(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """(id, format, brand, timescale, duration_ms, n_tracks, width,
    height, has_audio, error) for a binary video column — Arrow-batched,
    header bytes only."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "format", "brand", "timescale", "duration_ms",
                "n_tracks", "width", "height", "has_audio", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = parse_video_meta(
                    bytes(blob) if blob is not None else b""
                )
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {VIDEO_META_FIELDS}"
    )


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def make_mp4(timescale: int, duration: int, width: int, height: int,
             with_audio: bool = False, v1: bool = False,
             brand: bytes = b"isom") -> bytes:
    """Minimal structurally-valid ISO-BMFF file (ftyp + moov with mvhd +
    one video trak [+ one audio trak] + empty mdat) — deterministic
    fixture generator for tests and the contract round-trip. ``v1``
    exercises the 64-bit mvhd/tkhd layouts."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isomiso2")
    if v1:
        mvhd = _box(b"mvhd", b"\x01\x00\x00\x00" + struct.pack(
            ">QQIQ", 0, 0, timescale, duration) + b"\x00" * 80)
    else:
        mvhd = _box(b"mvhd", b"\x00\x00\x00\x00" + struct.pack(
            ">IIII", 0, 0, timescale, duration) + b"\x00" * 80)

    def trak(handler: bytes, w: int, h: int, track_id: int) -> bytes:
        if v1:
            head = (b"\x01\x00\x00\x07" + struct.pack(
                ">QQI", 0, 0, track_id) + b"\x00" * 4
                + struct.pack(">Q", duration))
        else:
            head = (b"\x00\x00\x00\x07" + struct.pack(
                ">III", 0, 0, track_id) + b"\x00" * 4
                + struct.pack(">I", duration))
        tkhd = _box(b"tkhd", head + b"\x00" * 52
                    + struct.pack(">II", w << 16, h << 16))
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
        return _box(b"trak", tkhd + _box(b"mdia", hdlr))

    traks = trak(b"vide", width, height, 1)
    if with_audio:
        traks += trak(b"soun", 0, 0, 2)
    return ftyp + _box(b"moov", mvhd + traks) + _box(b"mdat", b"")
