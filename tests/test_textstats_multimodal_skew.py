"""Tests: textstats (lang-id, quality, token counts, fingerprint),
multimodal plumbing, salted aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.multimodal import byte_features, decode_image, sample_frames, synth_media
from kgspark.skew import hot_keys, salted_agg
from kgspark.textstats import fingerprint, lang_id, quality_features, subword_count, token_count

DOCS = [
    (0, "the cat sat on the mat and it is a good day for the team"),
    (1, "der hund ist ein gutes tier und das ist nicht schlecht mit den anderen"),
    (2, "el perro es un animal que vive en la casa con la familia por siempre"),
    (3, "zzz qqq xxx"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lang_id(spark):
    out = {r["doc_id"]: r["detected_lang"] for r in lang_id(_docs(spark)).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"


def test_quality_features(spark):
    out = {r["doc_id"]: r for r in quality_features(_docs(spark)).collect()}
    assert out[0]["n_tokens"] == 15
    assert out[0]["stopword_ratio"] > out[3]["stopword_ratio"]
    assert 0.0 <= out[3]["quality_score"] < out[0]["quality_score"] <= 1.0
    assert out[0]["punct_ratio"] == 0.0


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, 42 times!",)], "t string")
    r = df.select(
        token_count(F.col("t")).alias("n"),
        subword_count(F.col("t")).alias("sw"),
    ).collect()[0]
    assert r["n"] == 4
    # alpha runs: helloworldtimes = 15 chars -> ceil(15/4.2)=4; digits 4,2 -> 2; punct , ! -> 2
    assert r["sw"] == 4 + 2 + 2


def test_fingerprint_stability(spark):
    df = _docs(spark)
    f1 = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    f2 = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df.repartition(7)).collect()}
    assert f1 == f2
    assert len(set(f1.values())) == len(f1)  # distinct docs -> distinct prints


def test_multimodal_plumbing(spark):
    media = synth_media(_docs(spark))
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio" and rows[2]["kind"] == "video"
    assert rows[0]["n_bytes"] == len(DOCS[0][1].encode())

    feats = {r["media_id"]: r for r in byte_features(media).collect()}
    assert len(feats[0]["byte_hist"]) == 16
    assert abs(sum(feats[0]["byte_hist"]) - 1.0) < 1e-6
    assert feats[0]["byte_entropy"] > 0

    frames = sample_frames(media, frame_size=8, stride=2).collect()
    assert all(len(fr["frame_bytes"]) <= 8 for fr in frames)
    vid_ids = {fr["media_id"] for fr in frames}
    assert vid_ids == {2}  # only the video row

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_salted_agg_equals_plain(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = salted_agg(
        ev, ["event_type"], {"n": ("count", "*"), "total": ("sum", "value"),
                             "vmax": ("max", "value")}
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"),
        F.max("value").alias("vmax"),
    )
    s = {r["event_type"]: (r["n"], round(r["total"], 6), r["vmax"]) for r in salted.collect()}
    p = {r["event_type"]: (r["n"], round(r["total"], 6), r["vmax"]) for r in plain.collect()}
    assert s == p


def test_hot_keys(spark):
    df = spark.createDataFrame(
        [("hot",)] * 100 + [(f"k{i}",) for i in range(50)], "k string"
    )
    out = hot_keys(df, "k", threshold_ratio=4.0).collect()
    assert [r["k"] for r in out] == ["hot"]


def test_repetition_stats(spark):
    from kgspark.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),          # one dominant 2-gram
            (1, "all tokens are fully distinct"),
            (2, "x"),                             # <2 tokens -> no 2-grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_2grams"] == 3 and got[0]["top_2gram_count"] == 3
    assert got[0]["top_2gram_frac"] == 1.0
    assert abs(got[0]["dup_token_frac"] - 0.75) < 1e-9
    assert got[1]["top_2gram_frac"] == 0.25  # 4 distinct 2-grams
    assert got[1]["dup_token_frac"] == 0.0
    assert got[2]["n_2grams"] == 0 and got[2]["top_2gram_frac"] == 0.0


def test_salted_join_equals_plain_join(spark):
    from kgspark.skew import salted_join
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(100)],
        "event_id long, k string, v double",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, attr int")
    plain = sorted(map(tuple, ev.join(dim, "k").select("event_id", "attr").collect()))
    salted = sorted(map(tuple,
        salted_join(ev, dim, ["k"], salt_buckets=4).select("event_id", "attr").collect()))
    assert salted == plain
    # left join preserves unmatched skewed rows
    dim_partial = dim.where(F.col("k") == "hot")
    left = salted_join(ev, dim_partial, ["k"], salt_buckets=4, how="left")
    assert left.count() == 100
    assert left.where(F.col("attr").isNull()).count() == 10


def test_corpus_report(spark):
    from kgspark.textstats import corpus_report

    docs = spark.createDataFrame(
        [(0, "a", "one two"), (1, "a", "three four five"), (2, "b", "six")],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in corpus_report(docs).collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["total_tokens"] == 5
    assert got["a"]["p50_chars"] == 11.0  # interpolated between 7 and 15
    assert got["b"]["n_docs"] == 1 and got["b"]["mean_chars"] == 3.0


def test_salted_join_rejects_unsafe_join_types(spark):
    """ADVICE r2: replicated dim rows would emit unmatched dim rows
    salt_buckets times under right/full joins — those types must raise."""
    import pytest

    from kgspark.skew import salted_join

    ev = spark.createDataFrame([(1, "a")], "event_id long, k string")
    dim = spark.createDataFrame([("a", 1)], "k string, attr int")
    for bad in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="not salt-safe"):
            salted_join(ev, dim, ["k"], salt_buckets=4, how=bad)


def test_readability_flesch_values(spark):
    from kgspark.textstats import readability

    df = spark.createDataFrame(
        [(0, "the cat sat. it ran fast!"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r0 = got[0]
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (6, 2, 6)
    # ease = 206.835 - 1.015*(6/2) - 84.6*(6/6); grade = 0.39*3 + 11.8 - 15.59
    assert abs(r0["flesch_ease"] - 119.19) < 1e-9
    assert abs(r0["fk_grade"] - (-2.62)) < 1e-9
    # no words -> NULL scores, sentence floor stays 1
    assert got[1]["n_words"] == 0 and got[1]["flesch_ease"] is None
    assert got[1]["n_sentences"] == 1
    assert got[2]["flesch_ease"] is None


def test_vocab_stats_per_source(spark):
    from kgspark.textstats import vocab_stats

    df = spark.createDataFrame(
        [
            (1, "a", "the cat the dog"),
            (2, "a", "the bird"),
            (3, "b", "one two three"),
            (4, "b", None),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in vocab_stats(df).collect()}
    # source a: tokens the,cat,the,dog,the,bird = 6; types {the,cat,dog,bird}=4
    # hapax in a: cat,dog,bird = 3 ('the' occurs 3x)
    assert (out["a"]["n_tokens"], out["a"]["n_types"],
            out["a"]["n_hapax"]) == (6, 4, 3)
    assert (out["b"]["n_tokens"], out["b"]["n_types"],
            out["b"]["n_hapax"]) == (3, 3, 3)
