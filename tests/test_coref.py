"""kgspark.coref: recency-heuristic pronoun resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.coref import resolve_pronouns


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_resolution_chain_and_skipping(spark):
    out = resolve_pronouns(_docs(spark, [
        (1, "Alice founded Rome. It grew fast. She left. Bob arrived. He smiled."),
    ])).orderBy("sent_no").collect()
    assert [r.resolved for r in out] == [
        "Alice founded Rome.",
        "Alice grew fast.",      # antecedent skips nothing
        "Alice left.",           # pronoun sentences never become antecedents
        "Bob arrived.",
        "Bob smiled.",           # nearest subject wins over older Alice
    ]
    assert [r.antecedent for r in out] == ["", "Alice", "Alice", "", "Bob"]
    assert [r.had_pronoun for r in out] == [0, 1, 1, 0, 1]


def test_no_antecedent_stays_unresolved(spark):
    out = resolve_pronouns(_docs(spark, [
        (1, "It is old. Alice came."),
    ])).orderBy("sent_no").collect()
    assert out[0].resolved == "It is old."
    assert out[0].antecedent == ""
    assert out[0].had_pronoun == 1


def test_mid_sentence_pronoun_untouched(spark):
    out = resolve_pronouns(_docs(spark, [
        (1, "Alice said. Then It broke."),
    ])).orderBy("sent_no").collect()
    # 'It' is not sentence-initial -> no rewrite
    assert out[1].resolved == "Then It broke."
    assert out[1].had_pronoun == 0


def test_recovers_triples_through_extractor(spark):
    # the payoff: resolved text re-extracted yields the pronoun-hidden fact
    from kgspark.openie import extract_concepts_udf

    docs = _docs(spark, [(1, "Alice is a doctor. She is a founder.")])
    txt = (
        resolve_pronouns(docs)
        .orderBy("sent_no")
        .agg(F.array_join(F.collect_list("resolved"), " ").alias("t"))
        .collect()[0].t
    )
    cons = spark.createDataFrame([(txt,)], "content string").select(
        F.explode(extract_concepts_udf(F.col("content"))).alias("c")
    ).select(F.col("c.name").alias("name"), F.col("c.parents").alias("parents"))
    got = {(r.name, p) for r in cons.collect() for p in (r.parents or [])}
    assert ("Alice", "doctor") in got
    assert ("Alice", "founder") in got  # recovered via resolution
