"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schemas, partitioning, Arrow
batch shapes, mapInPandas signatures. The codec step is STUBBED (image/audio
libraries are not in this container): `decode_image`/`decode_audio` raise
NotImplementedError with a clearly marked seam where PIL/ffmpeg-backed
decoders drop in, and `byte_features`/`sample_frames` run a deterministic
byte-level path end-to-end so the distributed plumbing is exercised for real.

Design for 100 TB of media:
  - binary payloads stay opaque to the planner; metadata columns (kind, n_bytes,
    content md5) are first-class so pruning/filtering never touches payloads;
  - feature extraction is mapInPandas over Arrow record batches — payload bytes
    cross to Python once, batched, never row-at-a-time;
  - frame sampling explodes to (media_id, frame_no, frame_bytes) rows so
    downstream vision featurizers parallelize per frame, not per video.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", FloatType()),
        StructField("byte_hist", ArrayType(FloatType())),  # 16 buckets, L1-normed
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def decode_image(payload: bytes):
    """STUB — container has no image codec. Drop-in seam: replace the body
    with `PIL.Image.open(io.BytesIO(payload))` where pillow exists."""
    raise NotImplementedError(
        "image decode stubbed: no codec libraries in this environment; "
        "byte_features/sample_frames exercise the distributed plumbing instead"
    )


def decode_audio(payload: bytes):
    """STUB — see decode_image."""
    raise NotImplementedError("audio decode stubbed in this environment")


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from a text corpus: payload =
    utf-8 bytes of the text (stands in for encoded media), kind round-robins
    by id. Gives the plumbing realistic variable-length binaries."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def byte_features(media: DataFrame, hist_buckets: int = 16) -> DataFrame:
    """Arrow-batched byte-level featurization via mapInPandas: entropy + a
    normalized byte histogram. The real-codec featurizer swaps in at the
    marked line; everything around it (batching, schema, partitioning) is the
    production path."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "n_bytes": [],
                   "byte_entropy": [], "byte_hist": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                counts = [0] * hist_buckets
                for byte in b:
                    counts[byte * hist_buckets // 256] += 1
                n = len(b)
                hist = [c / n if n else 0.0 for c in counts]
                ent = -sum(p * math.log2(p) for p in hist if p > 0.0)
                # <-- codec seam: decode_image(b) / decode_audio(b) features here
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(n)
                out["byte_entropy"].append(float(ent))
                out["byte_hist"].append([float(x) for x in hist])
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, frame_size: int = 256, stride: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: slice the payload into fixed-size
    "frames" and keep every stride-th one, exploded to one row per frame.
    With a real codec the slicing becomes keyframe extraction; the schema,
    explode shape and per-frame parallelism are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fno in range(0, n_frames, stride):
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["frame_bytes"].append(b[fno * frame_size:(fno + 1) * frame_size])
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


def blob_near_dups(
    media: DataFrame,
    blob_col: str = "payload",
    id_col: str = "item_id",
    chunk_bytes: int = 16,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """Codec-free near-duplicate detection for opaque media blobs —
    image/audio/video columns deduped WITHOUT decoding them.

    Byte-level shingles: overlapping ``chunk_bytes``-byte windows at
    half-chunk stride over the hex encoding, then the same banded-MinHash
    + exact-Jaccard-verify pipeline as text dedup (kgspark.dedup). This
    catches the byte-reuse duplicate classes — identical payloads with
    different metadata tails, truncations, container-level copies — and
    deliberately NOT perceptual similarity (re-encodes change every
    byte; perceptual hashing needs the decoder, which is the documented
    environment seam in decode_image/decode_audio above). Fixed-stride
    chunking is insertion-alignment-fragile by design; see
    :func:`cdc_near_dups` for the content-defined-chunking variant that
    survives insertions.

    Returns (a, b, jaccard_ppm) pairs with a < b and exact integer
    jaccard_ppm >= threshold_ppm. Blobs shorter than one chunk form a
    single whole-blob shingle. Plan: map-only shingling + the banded
    self-join — identical shape (and cost) to minhash_dedup.
    """
    from kgspark.dedup import minhash_sig
    from kgspark.session import materialize

    step = chunk_bytes  # in hex chars: 2*chunk_bytes window, this stride
    win = 2 * chunk_bytes
    h = F.hex(F.col(blob_col))
    n_sh = F.greatest(
        (F.length(h) - win) / F.lit(step) + 1, F.lit(1)
    ).cast("int")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: h.substr(i * step + 1, F.lit(win)),
        )
    )
    base = (
        media.select(F.col(id_col).alias("id"), shingles.alias("sh"))
        .where(F.size("sh") > 0)
        .withColumn("sig", minhash_sig(F.col("sh"), num_hashes))
    )
    base = materialize(base)
    rows = num_hashes // bands
    banded = base.select(
        "id", "sh",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(b)),
                        *[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ])).alias("band_key"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band_key") == F.col("r.band_key"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.sh").alias("sha"), F.col("r.sh").alias("shb"))
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sha", "shb")).cast("long")
    uni = F.size(F.array_union("sha", "shb")).cast("long")
    return (
        cand.select(
            "a", "b",
            (F.lit(1_000_000) * inter).alias("_num"), uni.alias("_den"),
        )
        .select("a", "b",
                F.expr("_num div _den").cast("long").alias("jaccard_ppm"))
        .where(F.col("jaccard_ppm") >= threshold_ppm)
    )


def gear_table(window_bytes: int = 8) -> list[int]:
    """The 256-entry gear lookup table for :func:`cdc_near_dups`'s
    ``boundary='gear'`` mode — deterministic 48-bit integers derived
    from md5 of each byte value (public-derivation convention, no
    magic constants). 48 bits because the window hash is the EXACT
    integer Σ gear[b_j]·2^(w-1-j): with w ≤ 14 the sum stays < 2⁶²,
    so JVM longs, DuckDB BIGINTs and numpy int64 all evaluate the
    identical number with no wraparound to keep consistent — that is
    what makes the three implementations (HOF, SQL oracle, rolling
    numpy) provably boundary-identical."""
    import hashlib

    if window_bytes > 14:
        raise ValueError("gear window > 14 bytes would overflow int64")
    return [
        int(hashlib.md5(bytes([b])).hexdigest()[:12], 16)
        for b in range(256)
    ]


def cdc_chunks_gear(
    media: DataFrame,
    blob_col: str = "payload",
    id_col: str = "item_id",
    window_bytes: int = 8,
    boundary_mod: int = 32,
) -> DataFrame:
    """FAST chunking path for multi-MB blobs: (id, sh) with sh = the
    distinct chunk-md5 set under the GEAR boundary rule, computed by a
    rolling numpy evaluation inside one Arrow-batched pandas UDF — w
    vectorized shifted adds over the byte array instead of one md5 per
    offset, so a 10 MB blob costs ~8 numpy passes (~0.1 s), not 10⁷
    hash calls. Boundary semantics are BIT-IDENTICAL to the HOF gear
    path (same exact integer window hash, same cut offsets, same chunk
    md5 over the uppercase-hex text): test_multimodal proves chunk-set
    equality on random blobs including insert/delete edits."""
    import hashlib

    import numpy as np

    g = np.array(gear_table(window_bytes), dtype=np.int64)
    w = window_bytes
    mod = boundary_mod

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_md5s(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            if payload is None or len(payload) == 0:
                out.append([])
                continue
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = len(b)
            if n < w:
                cuts = [0, n]
            else:
                gv = g[b]
                hwin = np.zeros(n - w + 1, dtype=np.int64)
                for j in range(w):
                    hwin += gv[j : n - w + 1 + j] << (w - 1 - j)
                bounds = np.nonzero(hwin % mod == 0)[0] + 1
                cuts = sorted({0, n, *bounds.tolist()})
            hx = bytes(payload).hex().upper()
            seen = set()
            for a, z in zip(cuts, cuts[1:]):
                seen.add(
                    hashlib.md5(hx[a * 2 : z * 2].encode()).hexdigest()
                )
            out.append(sorted(seen))
        return pd.Series(out)

    return media.select(
        F.col(id_col).alias("id"),
        chunk_md5s(F.col(blob_col)).alias("sh"),
    )


def _gear_bounds_expr(
    blob_col: str, window_bytes: int, boundary_mod: int
):
    """Boundary offsets under the gear rule as a pure-column HOF: the
    byte array is looked up in the 256-literal gear table and the
    window hash is the exact integer Σ gear[b_{i+j}]·2^(w-1-j) —
    integer ops only, no per-offset md5, so this is itself ~an order
    of magnitude cheaper than the md5-window mode on the JVM."""
    gl = F.array(*[F.lit(v) for v in gear_table(window_bytes)])
    h = F.hex(F.col(blob_col))
    byte_arr = F.transform(
        F.when(
            F.expr(f"length(hex({blob_col})) div 2") >= 1,
            F.sequence(
                F.lit(1), F.expr(f"length(hex({blob_col})) div 2")
            ),
        ).otherwise(F.array().cast("array<int>")),
        lambda j: F.conv(h.substr((j - 1) * 2 + 1, F.lit(2)), 16, 10)
        .cast("int"),
    )
    n_pos = F.greatest(
        F.expr(f"length(hex({blob_col})) div 2") - window_bytes + 1,
        F.lit(0),
    )
    positions = F.when(
        n_pos >= 1, F.sequence(F.lit(1), n_pos)
    ).otherwise(F.array().cast("array<int>"))

    def window_hash(i):
        terms = [
            F.element_at(
                gl,
                F.element_at(
                    F.col("__bytes"), (i + F.lit(j)).cast("int")
                ) + 1,
            )
            * F.lit(1 << (window_bytes - 1 - j))
            for j in range(window_bytes)
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    bounds = F.filter(
        positions, lambda i: window_hash(i) % boundary_mod == 0
    )
    return byte_arr, bounds


def cdc_near_dups(
    media: DataFrame,
    blob_col: str = "payload",
    id_col: str = "item_id",
    window_bytes: int = 8,
    boundary_mod: int = 32,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_ppm: int = 500_000,
    boundary: str = "md5",
    fast: bool = False,
) -> DataFrame:
    """Content-defined-chunking near-dup for opaque blobs — the
    alignment-ROBUST upgrade to :func:`blob_near_dups` (rsync/LBFS
    lineage, Muthitacharoen et al. SOSP 2001): chunk boundaries are
    declared wherever the fingerprint of the local ``window_bytes``-byte
    context hashes to 0 mod ``boundary_mod``, so inserting or deleting
    bytes only disturbs the chunks touching the edit — every other
    chunk hash survives and the Jaccard stays high.

    Three boundary engines share one contract:
      - ``boundary='md5'`` (default): md5 of the byte window at every
        offset — stateless-per-position, expressible as pure column
        HOFs on BOTH engines, hence an exact DuckDB oracle. One md5
        per byte offset: fine for metadata-sized media records.
      - ``boundary='gear'``: the window hash is the exact integer
        Σ gear[b_j]·2^(w-1-j) over :func:`gear_table` — integer ops
        only (≈10× cheaper per offset on the JVM), still HOF- and
        SQL-expressible, so it keeps its own DuckDB oracle.
      - ``fast=True`` (gear mode only): chunking runs in
        :func:`cdc_chunks_gear`, a rolling numpy pandas UDF with
        BIT-IDENTICAL boundaries — the multi-MB-blob path, proven
        chunk-set-equal to the HOF gear path in pytest.

    Returns (a, b, jaccard_ppm) with a < b over chunk-md5 sets, exact
    integer ppm >= threshold_ppm; expected chunk length is
    ``boundary_mod`` bytes. Plan: map-only chunking (materialized once),
    then the banded-MinHash self-join shared with the rest of the dedup
    stack.
    """
    from kgspark.dedup import minhash_sig
    from kgspark.session import materialize

    if boundary not in ("md5", "gear"):
        raise ValueError(f"unknown boundary mode {boundary!r}")
    if fast and boundary != "gear":
        raise ValueError("fast=True requires boundary='gear'")

    h = F.hex(F.col(blob_col))
    if fast:
        chunked = cdc_chunks_gear(
            media, blob_col, id_col, window_bytes, boundary_mod
        )
    else:
        if boundary == "gear":
            byte_arr, bounds = _gear_bounds_expr(
                blob_col, window_bytes, boundary_mod
            )
            src = materialize(
                media.select(
                    F.col(id_col).alias("id"),
                    F.col(blob_col),
                    byte_arr.alias("__bytes"),
                )
            )
        else:
            wh = 2 * window_bytes
            n_pos = F.greatest(
                F.expr(f"length(hex({blob_col})) div 2")
                - window_bytes + 1,
                F.lit(0),
            )
            # sequence(1, 0) DESCENDS in Spark — guard the empty case
            positions = F.when(
                n_pos >= 1, F.sequence(F.lit(1), n_pos)
            ).otherwise(F.array().cast("array<int>"))
            bounds = F.filter(
                positions,
                lambda i: F.conv(
                    F.md5(
                        h.substr((i - 1) * 2 + 1, F.lit(wh))
                    ).substr(1, 4),
                    16, 10,
                ).cast("long") % boundary_mod == 0,
            )
            src = media.select(
                F.col(id_col).alias("id"), F.col(blob_col)
            )
        # cut points: 0, each boundary offset, blob length (in bytes)
        cuts = F.array_union(
            F.array_union(F.array(F.lit(0)), bounds),
            F.array(F.expr(f"length(hex({blob_col})) div 2")),
        )
        cuts = F.array_sort(F.array_distinct(cuts))
        chunk_ids = F.when(
            F.size(cuts) >= 2, F.sequence(F.lit(1), F.size(cuts) - 1)
        ).otherwise(F.array().cast("array<int>"))
        chunks = F.array_distinct(
            F.filter(
                F.transform(
                    chunk_ids,
                    lambda j: F.md5(
                        h.substr(
                            F.element_at(cuts, j) * 2 + 1,
                            (F.element_at(cuts, j + 1)
                             - F.element_at(cuts, j)) * 2,
                        )
                    ),
                ),
                lambda c: c.isNotNull(),
            )
        )
        chunked = src.select("id", chunks.alias("sh"))
    base = (
        chunked
        .where(F.size("sh") > 0)
        .withColumn("sig", minhash_sig(F.col("sh"), num_hashes))
    )
    base = materialize(base)
    rows = num_hashes // bands
    banded = base.select(
        "id", "sh",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(b)),
                        *[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ])).alias("band_key"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band_key") == F.col("r.band_key"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.sh").alias("sha"), F.col("r.sh").alias("shb"))
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sha", "shb")).cast("long")
    uni = F.size(F.array_union("sha", "shb")).cast("long")
    return (
        cand.select(
            "a", "b",
            (F.lit(1_000_000) * inter).alias("_num"), uni.alias("_den"),
        )
        .select("a", "b",
                F.expr("_num div _den").cast("long").alias("jaccard_ppm"))
        .where(F.col("jaccard_ppm") >= threshold_ppm)
    )
