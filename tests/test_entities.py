

def test_acronym_pairs_initial_letter_rule(spark):
    from kgspark.entities import acronym_pairs

    df = spark.createDataFrame(
        [(1, "the World Health Organization (WHO) said so"),
         (2, "a Big Fat Mismatch (XYZ) here"),          # initials differ
         (3, "short (AB) ok and lone (Q) too short"),
         (4, "Knowledge Graph (kg) lowercase acronym"),
         (5, "(AB) at document start has no window"),
         (6, None)],
        "doc_id long, text string",
    )
    got = {(r.id, r.acronym, r.long_form, r.n_words)
           for r in acronym_pairs(df).collect()}
    assert (1, "WHO", "World Health Organization", 3) in got
    assert (4, "kg", "Knowledge Graph", 2) in got
    assert (3, "AB", "ok and", 2) not in got   # initials o,a != a,b
    ids = {t[0] for t in got}
    assert 2 not in ids and 5 not in ids and 6 not in ids
    # doc 3: window for (AB) is ['nothing'...]: 'short' -> s != a; none
    assert 3 not in ids


def test_aka_pairs_patterns(spark):
    from kgspark.entities import aka_pairs

    df = spark.createDataFrame(
        [(1, "New York City aka NYC is large"),
         (2, "Robert Smith also known as Bob Smith retired"),
         (3, "lowercase thing aka nothing here"),
         (4, "A aka B and C aka D twice"),
         (5, None)],
        "doc_id long, text string",
    )
    got = {(r.id, r.alias_a, r.alias_b)
           for r in aka_pairs(df).collect()}
    assert (1, "New York City", "NYC") in got
    assert (2, "Robert Smith", "Bob Smith") in got
    assert (4, "A", "B") in got and (4, "C", "D") in got
    assert all(t[0] != 3 and t[0] != 5 for t in got)
    assert len(got) == 4
