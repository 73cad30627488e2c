

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
