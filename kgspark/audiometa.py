"""Audio HEADER metadata — the pure-stdlib slice of audio decode.

Full sample decode needs ffmpeg/soundfile (absent in this container; the
seam stays in kgspark/multimodal.py decode_audio). But the metadata a
curation pipeline filters on FIRST — duration, sample rate, channel
count, bitrate, format validity — lives in fixed-layout headers plain
byte arithmetic reads:

  WAV  RIFF container (Microsoft/IBM RIFF spec, 1991): 'RIFF' + u32 size
       + 'WAVE', then a chunk walk; the 'fmt ' chunk carries audio format
       tag, channels (u16 LE), sample rate (u32 LE), byte rate, block
       align, bits/sample; the 'data' chunk size over block align gives
       the sample-frame count.
  MP3  optional ID3v2 prefix ('ID3' + syncsafe u28 size, id3.org spec),
       then a sequence of MPEG audio frames (ISO 11172-3): 11-bit sync,
       version/layer bits, bitrate + sample-rate table indices, channel
       mode. Frame length for MPEG1 Layer III is
       144000*bitrate_kbps/sample_rate + padding, 1152 samples per
       frame — walking the frames yields the exact duration without
       decoding a single sample.

The reference pipeline has no audio path at all (its inputs are
text/PDF/image, knowledgeGraph.py:60-78); this is the audio half of the
multimodal curation gate, same posture as kgspark/imagemeta.py: filter
"silent/truncated/absurd-duration clips" before ANY decode.

Scale shape: Arrow-batched mapInPandas over the binary column — one
Python pass per batch, bytes sliced not decoded; per-file errors go to
an `error` column (the sources.py posture). All emitted fields are
exact integers (duration in ms via integer division), so contract
oracles reconstruct them arithmetically.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

AUDIO_META_FIELDS = (
    "format string, n_channels long, sample_rate long, "
    "bits_per_sample long, bitrate_kbps long, n_samples long, "
    "duration_ms long, error string"
)

# MPEG1 Layer III bitrate table, kbps (ISO 11172-3 table B.2; index 0 =
# "free" and 15 = forbidden — both rejected here)
_MP3_BITRATE = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 0]
_MP3_RATE = [44100, 48000, 32000, 0]
_MP3_SAMPLES_PER_FRAME = 1152


def _parse_wav(data: bytes, out: dict) -> dict:
    out["format"] = "wav"
    pos, n = 12, len(data)
    fmt_seen = data_size = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        csize = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"fmt " and csize >= 16 and pos + 8 + 16 <= n:
            (tag, ch, sr, br, ba, bps) = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24])
            if tag not in (1, 3):  # PCM / IEEE float only
                out["error"] = f"wav: unsupported format tag {tag}"
                return out
            fmt_seen = (ch, sr, ba, bps)
            out.update(n_channels=ch, sample_rate=sr, bits_per_sample=bps,
                       bitrate_kbps=br * 8 // 1000)
        elif cid == b"data":
            data_size = csize
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + csize + (csize & 1)
    if fmt_seen is None:
        out["error"] = "wav: missing fmt chunk"
        return out
    if data_size is None:
        out["error"] = "wav: missing data chunk"
        return out
    ch, sr, ba, bps = fmt_seen
    if ba == 0 or sr == 0:
        out["error"] = "wav: zero block align / sample rate"
        return out
    samples = data_size // ba
    out.update(n_samples=samples, duration_ms=samples * 1000 // sr)
    return out


def _parse_flac(data: bytes, out: dict) -> dict:
    """FLAC STREAMINFO (xiph.org FLAC format spec / RFC 9639): after
    the 'fLaC' magic, the first metadata block MUST be STREAMINFO
    (type 0, 34 bytes): 16+16-bit min/max blocksize, 24+24-bit min/max
    framesize, then a 64-bit field packing 20 bits sample rate, 3 bits
    channels−1, 5 bits bits-per-sample−1 and 36 bits total samples.
    Duration falls out exactly as samples·1000 div rate — no frame
    walk needed, the reason FLAC metadata is the cheapest of all."""
    out["format"] = "flac"
    if len(data) < 4 + 4 + 34:
        out["error"] = "flac: truncated STREAMINFO"
        return out
    btype = data[4] & 0x7F
    blen = int.from_bytes(data[5:8], "big")
    if btype != 0 or blen != 34:
        out["error"] = f"flac: first block type {btype} len {blen}"
        return out
    si = data[8:42]
    packed = int.from_bytes(si[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        out["error"] = "flac: zero sample rate"
        return out
    out.update(
        n_channels=channels, sample_rate=rate, bits_per_sample=bps,
        n_samples=total, duration_ms=(total * 1000) // rate,
        bitrate_kbps=None,
    )
    return out


def _parse_ogg(data: bytes, out: dict) -> dict:
    """Ogg container identification header (RFC 3533 page layout):
    version-0 'OggS' page, segment table skipped to the first packet,
    which must be an identification header — 'OpusHead' (RFC 7845:
    channels u8, pre-skip u16 LE, input rate u32 LE) or '\\x01vorbis'
    (Vorbis I spec: channels u8, rate u32 LE). Rate is the INPUT/
    nominal rate (Opus always decodes at 48 kHz — the field is still
    what curation filters on); duration would need the last page's
    granule position, deliberately out of header-walk scope."""
    out["format"] = "ogg"
    if len(data) < 28:
        out["error"] = "ogg: truncated page header"
        return out
    if data[4] != 0:
        out["error"] = f"ogg: unknown version {data[4]}"
        return out
    nsegs = data[26]
    p = 27 + nsegs
    if p >= len(data):
        out["error"] = "ogg: truncated segment table"
        return out
    pkt = data[p:]
    if pkt[:8] == b"OpusHead":
        if len(pkt) < 19:
            out["error"] = "ogg: truncated OpusHead"
            return out
        out.update(
            format="opus",
            n_channels=pkt[9],
            sample_rate=int.from_bytes(pkt[12:16], "little"),
            n_samples=None, bits_per_sample=None,
            bitrate_kbps=None, duration_ms=None,
        )
        return out
    if pkt[:7] == b"\x01vorbis":
        if len(pkt) < 16:
            out["error"] = "ogg: truncated vorbis id header"
            return out
        out.update(
            format="vorbis",
            n_channels=pkt[11],
            sample_rate=int.from_bytes(pkt[12:16], "little"),
        )
        return out
    out["error"] = "ogg: unknown codec id header"
    return out


def _parse_mp3(data: bytes, pos: int, out: dict) -> dict:
    out["format"] = "mp3"
    n = len(data)
    frames = 0
    first = None
    while pos + 4 <= n:
        hdr = struct.unpack(">I", data[pos:pos + 4])[0]
        if (hdr >> 21) != 0x7FF:
            break
        version = (hdr >> 19) & 3
        layer = (hdr >> 17) & 3
        if version != 3 or layer != 1:  # MPEG1 Layer III only
            out["error"] = "mp3: not MPEG1 Layer III"
            return out
        br = _MP3_BITRATE[(hdr >> 12) & 0xF]
        sr = _MP3_RATE[(hdr >> 10) & 3]
        if br == 0 or sr == 0:
            out["error"] = "mp3: bad bitrate/sample-rate index"
            return out
        padding = (hdr >> 9) & 1
        mode = (hdr >> 6) & 3
        if first is None:
            first = (br, sr, 1 if mode == 3 else 2)
        frames += 1
        pos += 144000 * br // sr + padding
    if first is None:
        out["error"] = "mp3: no frame sync"
        return out
    br, sr, ch = first
    samples = frames * _MP3_SAMPLES_PER_FRAME
    out.update(n_channels=ch, sample_rate=sr, bits_per_sample=0,
               bitrate_kbps=br, n_samples=samples,
               duration_ms=samples * 1000 // sr)
    return out


def parse_audio_meta(data: bytes) -> dict:
    """Header metadata for one audio blob; never raises — malformed input
    yields format=None plus an error message."""
    out = {"format": None, "n_channels": None, "sample_rate": None,
           "bits_per_sample": None, "bitrate_kbps": None,
           "n_samples": None, "duration_ms": None, "error": None}
    try:
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _parse_wav(data, out)
        if data[:4] == b"fLaC":
            return _parse_flac(data, out)
        if data[:4] == b"OggS":
            return _parse_ogg(data, out)
        pos = 0
        if data[:3] == b"ID3" and len(data) >= 10:
            size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                    | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
            pos = 10 + size
        if pos + 2 <= len(data) and data[pos] == 0xFF \
                and (data[pos + 1] & 0xE0) == 0xE0:
            return _parse_mp3(data, pos, out)
        out["error"] = "unknown audio format"
        return out
    except Exception as e:  # captured, never fatal at corpus scale
        out["error"] = f"{type(e).__name__}: {e}"
        return out


def audio_meta(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """(id, format, n_channels, sample_rate, bits_per_sample,
    bitrate_kbps, n_samples, duration_ms, error) for a binary audio
    column — Arrow-batched, header bytes only."""
    id_type = df.schema[id_col].dataType.simpleString()

    def parse(batches):
        import pandas as pd

        cols = [id_col, "format", "n_channels", "sample_rate",
                "bits_per_sample", "bitrate_kbps", "n_samples",
                "duration_ms", "error"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                rec = parse_audio_meta(
                    bytes(blob) if blob is not None else b""
                )
                rec[id_col] = i
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        parse, f"{id_col} {id_type}, {AUDIO_META_FIELDS}"
    )


def make_wav(n_channels: int, sample_rate: int, bits_per_sample: int,
             n_samples: int) -> bytes:
    """Minimal structurally-valid PCM WAV (RIFF + fmt + data, zeroed
    payload) — deterministic fixture generator for tests and the
    contract round-trip."""
    block_align = n_channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, bits_per_sample)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_size) + b"\x00" * data_size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp3(n_frames: int, bitrate_kbps: int, sample_rate: int,
             mono: bool = False, id3_size: int = 0) -> bytes:
    """Minimal structurally-valid MP3: optional zeroed ID3v2 tag, then
    n_frames MPEG1 Layer III frame headers with zeroed payloads."""
    br_idx = _MP3_BITRATE.index(bitrate_kbps)
    sr_idx = _MP3_RATE.index(sample_rate)
    mode = 3 if mono else 0
    hdr = (0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16  # sync/MPEG1/L3/CRC-off
           | br_idx << 12 | sr_idx << 10 | mode << 6)
    frame_len = 144000 * bitrate_kbps // sample_rate
    frame = struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
    tag = b""
    if id3_size:
        tag = (b"ID3\x04\x00\x00"
               + bytes([(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
                        (id3_size >> 7) & 0x7F, id3_size & 0x7F])
               + b"\x00" * id3_size)
    return tag + frame * n_frames
