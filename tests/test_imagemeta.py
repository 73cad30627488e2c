"""Pure-stdlib image header parsing (kgspark.imagemeta)."""

from __future__ import annotations

import struct


def test_parse_png_jpeg_gif_headers():
    from kgspark.imagemeta import make_png, parse_image_meta

    png = parse_image_meta(make_png(640, 480, bit_depth=8, color_type=6))
    assert (png["format"], png["width"], png["height"],
            png["bit_depth"], png["n_channels"], png["error"]) == (
        "png", 640, 480, 8, 4, None)
    # minimal JPEG: SOI + APP0 stub + SOF0 (prec 8, 100x200, 3 comps)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
           + struct.pack(">HH", 100, 200) + bytes([3, 0, 0, 0]))
    jpg = parse_image_meta(b"\xff\xd8" + app0 + sof)
    assert (jpg["format"], jpg["width"], jpg["height"],
            jpg["bit_depth"], jpg["n_channels"]) == ("jpeg", 200, 100, 8, 3)
    gif = parse_image_meta(b"GIF89a" + struct.pack("<HH", 32, 16) + b"\0\0")
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 32, 16)


def test_make_jpeg_gif_fixture_roundtrip():
    from kgspark.imagemeta import make_gif, make_jpeg, parse_image_meta

    for w, h, prec, nc in [(123, 45, 8, 3), (300, 200, 12, 1), (20, 20, 8, 4)]:
        m = parse_image_meta(make_jpeg(w, h, prec, nc))
        assert (m["format"], m["width"], m["height"], m["bit_depth"],
                m["n_channels"], m["error"]) == ("jpeg", w, h, prec, nc, None)
    for w, h, ver in [(77, 88, b"89a"), (1, 1, b"87a"), (65535, 2, b"89a")]:
        g = parse_image_meta(make_gif(w, h, ver))
        assert (g["format"], g["width"], g["height"], g["bit_depth"],
                g["n_channels"], g["error"]) == ("gif", w, h, 8, 3, None)


def test_parse_image_meta_errors_never_raise():
    from kgspark.imagemeta import make_png, parse_image_meta

    assert parse_image_meta(b"")["error"] == "unknown image format"
    assert "truncated" in parse_image_meta(
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)["error"]
    # JPEG with no SOF
    assert "no SOF" in parse_image_meta(
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 2))["error"]
    # PNG with an unknown color type still reports dimensions
    bad = parse_image_meta(make_png(10, 10, color_type=7))
    assert bad["width"] == 10 and "unknown color type" in bad["error"]


def test_parse_bmp_webp_tiff_round_trip():
    from kgspark.imagemeta import (
        make_bmp, make_tiff, make_webp, parse_image_meta,
    )

    for bpp, (depth, nch) in [(8, (8, 1)), (16, (5, 3)), (24, (8, 3)),
                              (32, (8, 4))]:
        m = parse_image_meta(make_bmp(77, 33, bpp))
        assert m["error"] is None
        assert (m["format"], m["width"], m["height"], m["bit_depth"],
                m["n_channels"]) == ("bmp", 77, 33, depth, nch)
    # top-down BMP: negative height -> abs
    import struct as _s
    td = bytearray(make_bmp(10, 20, 24))
    td[22:26] = _s.pack("<i", -20)
    assert parse_image_meta(bytes(td))["height"] == 20

    for kind, alpha, nch in [("vp8", 0, 3), ("vp8l", 0, 3), ("vp8l", 1, 4),
                             ("vp8x", 0, 3), ("vp8x", 1, 4)]:
        m = parse_image_meta(make_webp(321, 123, kind, alpha))
        assert m["error"] is None, (kind, m)
        assert (m["format"], m["width"], m["height"], m["n_channels"]) == (
            "webp", 321, 123, nch), kind

    for be in (False, True):
        m = parse_image_meta(make_tiff(640, 480, 16, 3, big_endian=be))
        assert m["error"] is None
        assert (m["format"], m["width"], m["height"], m["bit_depth"],
                m["n_channels"]) == ("tiff", 640, 480, 16, 3)


def test_parse_bmp_webp_tiff_errors_never_raise():
    from kgspark.imagemeta import parse_image_meta

    assert "truncated" in parse_image_meta(b"BM" + b"\x00" * 10)["error"]
    assert "start code" in parse_image_meta(
        b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 14)["error"]
    assert "unknown chunk" in parse_image_meta(
        b"RIFF\x00\x00\x00\x00WEBPXXXX" + b"\x00" * 14)["error"]
    assert "truncated IFD" in parse_image_meta(b"II*\x00\xff\x00\x00\x00")[
        "error"]
    # TIFF whose IFD lacks width/height
    import struct as _s
    t = (b"II*\x00" + _s.pack("<I", 8) + _s.pack("<H", 1)
         + _s.pack("<HHI", 277, 3, 1) + _s.pack("<H", 3) + b"\x00\x00"
         + _s.pack("<I", 0))
    assert "missing dimensions" in parse_image_meta(t)["error"]


def test_image_meta_distributed(spark):
    from kgspark.imagemeta import image_meta, make_png

    rows = [
        (1, bytearray(make_png(64, 64))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"]) == ("png", 64)
    assert got[2]["format"] is None and got[2]["error"]
    assert got[3]["error"] == "unknown image format"
    assert len(got) == 3


def test_parse_wav_round_trip():
    from kgspark.audiometa import make_wav, parse_audio_meta

    m = parse_audio_meta(make_wav(2, 44100, 16, 1000))
    assert m["error"] is None
    assert (m["format"], m["n_channels"], m["sample_rate"],
            m["bits_per_sample"]) == ("wav", 2, 44100, 16)
    assert m["bitrate_kbps"] == 44100 * 2 * 2 * 8 // 1000  # 1411
    assert m["n_samples"] == 1000
    assert m["duration_ms"] == 1000 * 1000 // 44100  # 22


def test_parse_mp3_frame_walk_and_id3():
    from kgspark.audiometa import make_mp3, parse_audio_meta

    m = parse_audio_meta(make_mp3(5, 128, 44100, mono=False, id3_size=17))
    assert m["error"] is None
    assert (m["format"], m["n_channels"], m["sample_rate"],
            m["bitrate_kbps"]) == ("mp3", 2, 44100, 128)
    assert m["n_samples"] == 5 * 1152
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100  # 130
    mono = parse_audio_meta(make_mp3(1, 320, 32000, mono=True))
    assert (mono["n_channels"], mono["sample_rate"],
            mono["n_samples"]) == (1, 32000, 1152)


def test_parse_audio_meta_errors_never_raise():
    from kgspark.audiometa import parse_audio_meta

    assert parse_audio_meta(b"")["error"] == "unknown audio format"
    assert parse_audio_meta(b"junkjunkjunk")["error"] \
        == "unknown audio format"
    assert "missing fmt" in parse_audio_meta(b"RIFF\x04\x00\x00\x00WAVE")["error"]
    # free-bitrate index is rejected, not decoded
    hdr = struct.pack(">I", 0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16)
    assert "bitrate" in parse_audio_meta(hdr)["error"]


def test_audio_meta_distributed(spark):
    from kgspark.audiometa import audio_meta, make_mp3, make_wav

    rows = [
        (1, bytearray(make_wav(1, 8000, 8, 400))),
        (2, bytearray(make_mp3(3, 64, 48000))),
        (3, bytearray(b"not audio")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert (got[1]["format"], got[1]["duration_ms"]) == ("wav", 50)
    assert (got[2]["format"], got[2]["n_samples"]) == ("mp3", 3456)
    assert got[3]["error"] == "unknown audio format"
    assert got[4]["error"] == "unknown audio format"
    assert len(got) == 4

def test_parse_mp4_box_walk_round_trip():
    from kgspark.videometa import make_mp4, parse_video_meta

    m = parse_video_meta(make_mp4(90000, 450000, 1280, 720,
                                  with_audio=True))
    assert m["error"] is None
    assert (m["format"], m["brand"], m["timescale"]) == ("mp4", "isom", 90000)
    assert m["duration_ms"] == 450000 * 1000 // 90000
    assert (m["width"], m["height"]) == (1280, 720)
    assert (m["n_tracks"], m["has_audio"]) == (2, 1)
    # 64-bit v1 mvhd/tkhd layout
    big = parse_video_meta(make_mp4(600, 6000, 320, 240, v1=True))
    assert (big["duration_ms"], big["width"], big["n_tracks"],
            big["has_audio"]) == (10000, 320, 1, 0)


def test_parse_video_meta_errors_never_raise():
    from kgspark.videometa import make_mp4, parse_video_meta

    assert parse_video_meta(b"")["error"] == "unknown video format"
    assert parse_video_meta(b"RIFF\x00\x00\x00\x00AVI ")["error"] \
        == "unknown video format"
    # ftyp but no moov
    assert "missing moov" in parse_video_meta(
        b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")["error"]
    # truncated: moov box claims more bytes than the file has
    blob = make_mp4(1000, 1000, 64, 64)
    cut = blob[: len(blob) - 20]
    assert "overruns" in parse_video_meta(cut)["error"]
    # zero timescale guarded, not a ZeroDivisionError
    zer = make_mp4(0, 1000, 64, 64)
    assert "zero mvhd timescale" in parse_video_meta(zer)["error"]


def test_video_meta_distributed(spark):
    from kgspark.videometa import make_mp4, video_meta

    rows = [
        (1, bytearray(make_mp4(1000, 2500, 640, 480))),
        (2, bytearray(make_mp4(600, 1200, 0, 0, with_audio=True, v1=True))),
        (3, bytearray(b"not video")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in video_meta(df).collect()}
    assert (got[1]["format"], got[1]["duration_ms"],
            got[1]["width"]) == ("mp4", 2500, 640)
    assert (got[2]["duration_ms"], got[2]["has_audio"]) == (2000, 1)
    assert got[3]["error"] == "unknown video format"
    assert got[4]["error"] == "unknown video format"
    assert len(got) == 4


def test_exif_roundtrip_and_wrapper(spark):
    from kgspark.imagemeta import exif_meta, make_jpeg_exif, parse_exif

    for be in (False, True):
        got = parse_exif(make_jpeg_exif(
            6, "2021:03:04 05:06:07", "MakerLong7", "M1", 640, 480,
            big_endian=be))
        assert got["error"] is None
        assert got["endian"] == ("MM" if be else "II")
        assert got["make"] == "MakerLong7" and got["model"] == "M1"
        assert got["orientation"] == 6
        assert got["datetime"] == "2021:03:04 05:06:07"
        assert (got["exif_width"], got["exif_height"]) == (640, 480)
    # inline (<= 4 byte) ASCII layout
    assert parse_exif(make_jpeg_exif(1, "x", "Mk", "ABC", 1, 2))["model"] == "ABC"
    # error paths never raise
    assert parse_exif(b"\xff\xd8\xff\xd9")["error"] == "jpeg: no Exif APP1 segment"
    assert parse_exif(b"junk")["error"] == "not jpeg/tiff"
    # bare TIFF accepted too
    from kgspark.imagemeta import make_tiff
    assert parse_exif(make_tiff(4, 5))["endian"] == "II"

    rows = [
        (0, make_jpeg_exif(3, "2020:01:02 03:04:05", "MakerX", "M2", 10, 20)),
        (1, b"\xff\xd8\xff\xd9"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in exif_meta(df).collect()}
    assert out[0].make == "MakerX" and out[0].orientation == 3
    assert out[1].error == "jpeg: no Exif APP1 segment"
    assert out[2].error == "not jpeg/tiff"
