

def test_blob_near_dups_byte_reuse(spark):
    from kgspark.multimodal import blob_near_dups

    body = bytes(range(200)) * 4
    rows = [
        (1, body),
        (2, body + b"EXIFTAIL" * 4),      # same payload, metadata tail
        (3, body[:400]),                   # truncation
        (4, bytes(reversed(body))),        # different bytes
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in blob_near_dups(df, threshold_ppm=300_000).collect()}
    assert (1, 2) in got and got[(1, 2)] > 700_000
    assert (1, 3) in got
    assert all(4 not in p for p in got)


def test_blob_near_dups_short_blob_whole_shingle(spark):
    from kgspark.multimodal import blob_near_dups

    df = spark.createDataFrame(
        [(1, b"tiny"), (2, b"tiny"), (3, b"other")],
        "item_id long, payload binary",
    )
    got = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in blob_near_dups(df).collect()}
    assert got == {(1, 2): 1_000_000}


def test_cdc_survives_insertion_where_fixed_stride_fails(spark):
    import hashlib

    from kgspark.multimodal import blob_near_dups, cdc_near_dups

    # long pseudo-random body (hash-derived, deterministic)
    body = b"".join(
        hashlib.md5(f"seg{i}".encode()).digest() for i in range(80)
    )  # 1280 bytes
    shifted = body[:37] + b"INSRT" + body[37:]  # 5-byte insertion (off-stride)
    df = spark.createDataFrame(
        [(1, body), (2, shifted)], "item_id long, payload binary"
    )
    cdc = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in cdc_near_dups(df, threshold_ppm=300_000).collect()}
    assert (1, 2) in cdc and cdc[(1, 2)] > 600_000
    fixed = {(r["a"], r["b"]): r["jaccard_ppm"]
             for r in blob_near_dups(df, threshold_ppm=1).collect()}
    # fixed-stride similarity collapses after the shift (or no candidate)
    assert fixed.get((1, 2), 0) < cdc[(1, 2)]


def test_cdc_identical_and_disjoint(spark):
    import hashlib

    from kgspark.multimodal import cdc_near_dups

    b1 = b"".join(hashlib.md5(f"a{i}".encode()).digest() for i in range(40))
    b2 = b"".join(hashlib.md5(f"b{i}".encode()).digest() for i in range(40))
    df = spark.createDataFrame(
        [(1, b1), (2, b1), (3, b2)], "item_id long, payload binary"
    )
    got = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in cdc_near_dups(df).collect()}
    assert got == {(1, 2): 1_000_000}


def test_cdc_empty_and_tiny_blobs(spark):
    from kgspark.multimodal import cdc_near_dups

    df = spark.createDataFrame(
        [(1, b""), (2, b"ab"), (3, b"ab")], "item_id long, payload binary"
    )
    got = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in cdc_near_dups(df).collect()}
    assert got == {(2, 3): 1_000_000}  # empty blob dropped, tiny = 1 chunk


def _make_zip(members, comment=b"", compress=False):
    import io
    import zipfile

    buf = io.BytesIO()
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", mode) as z:
        for name, content in members:
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zi.compress_type = mode
            z.writestr(zi, content)
        if comment:
            z.comment = comment
    return buf.getvalue()


def test_zip_listing_roundtrip_and_errors(spark):
    import zlib

    from kgspark.archive import zip_listing

    blobs = [
        (1, _make_zip([("a.txt", b"hello"), ("dir/", b""),
                       ("dir/b.bin", b"\x00" * 100)])),
        (2, _make_zip([("c.txt", b"x" * 1000)], comment=b"trailing",
                      compress=True)),
        (3, b"not a zip at all"),
        (4, None),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, payload binary")
    rows = zip_listing(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r)
    m1 = {r.member: r for r in by[1]}
    assert m1["a.txt"].method == 0          # stored
    assert m1["a.txt"].comp_size == 5 and m1["a.txt"].uncomp_size == 5
    assert m1["a.txt"].crc32 == zlib.crc32(b"hello")
    assert m1["dir/"].is_dir == 1
    assert m1["dir/b.bin"].uncomp_size == 100
    # deflated member behind an EOCD comment still parses
    c = by[2][0]
    assert c.member == "c.txt" and c.method == 8
    assert c.uncomp_size == 1000 and c.comp_size < 1000
    assert by[3][0].error.startswith("zip:")
    assert by[4][0].error is not None
