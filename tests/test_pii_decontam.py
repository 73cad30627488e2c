"""PII scrubbing (kgspark.pii) + benchmark decontamination (kgspark.decontam)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.decontam import flag_contaminated
from kgspark.pii import scrub_pii


def test_scrub_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail me at jane.doe+spam@corp.example.org today"),
        (2, "server 192.168.10.1 answered; card 4111 1111 1111 1234 on file"),
        (3, "ssn 123-45-6789 and phone +1 (555) 123-4567"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_pii"] == 1
    assert "jane" not in got[1]["redacted"] and "[EMAIL]" in got[1]["redacted"]
    assert got[2]["n_ipv4"] == 1 and got[2]["n_card"] == 1
    assert "[IPV4]" in got[2]["redacted"] and "[CARD]" in got[2]["redacted"]
    # fixed order: the SSN is consumed by the ssn rule, not the phone rule
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 1
    assert got[3]["redacted"] == "ssn [SSN] and phone [PHONE]"
    assert got[4]["n_pii"] == 0 and got[4]["redacted"] == rows[3][1]


def test_scrub_pii_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_flag_contaminated_known_overlap(spark):
    shared = " ".join(f"w{i}" for i in range(13))  # exactly one 13-gram
    corpus = spark.createDataFrame(
        [
            (1, "lead text " + shared + " trailing"),
            (2, "completely different content with many words " * 3),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "bench prefix " + shared)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in flag_contaminated(corpus, bench, n=13).collect()}
    assert len(got) == 3  # annotate-don't-drop: every corpus row present
    assert got[1]["contaminated"] and got[1]["n_hit_grams"] == 1
    assert not got[2]["contaminated"] and got[2]["n_hit_grams"] == 0
    assert not got[3]["contaminated"]  # < n tokens -> no grams, never flagged


def test_flag_contaminated_counts_distinct_grams(spark):
    text = "a b c d e a b c d e a b c d e"  # repeated -> distinct 5-grams only
    corpus = spark.createDataFrame([(1, text)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, text)], "doc_id long, text string")
    r = flag_contaminated(corpus, bench, n=5).collect()[0]
    # 11 positions but only 5 distinct 5-grams in the cyclic text
    assert r["n_hit_grams"] == 5 and r["contaminated"]


def test_scrub_pii_null_text_zero_counts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a@b.co")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    # NULL text -> 0 counts (so n_pii filters partition the corpus), NULL out
    assert got[1]["n_pii"] == 0 and got[1]["n_email"] == 0
    assert got[1]["redacted"] is None
    assert got[2]["n_email"] == 1


def test_scrub_pii_common_phone_formats(spark):
    rows = [
        (1, "call 555-123-4567 now"),
        (2, "call (555) 123-4567 now"),
        (3, "call 555.123.4567 now"),
        (4, "call +1-555-123-4567 now"),
        (5, "order id 12345678901 is not a phone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    for i in (1, 2, 3, 4):
        assert got[i]["n_phone"] == 1, (i, got[i])
        assert got[i]["redacted"] == "call [PHONE] now", got[i]["redacted"]
    assert got[5]["n_phone"] == 0  # fully-joined digit runs stay unmatched


def test_source_overlap_matrix(spark):
    from kgspark.decontam import source_overlap

    df = spark.createDataFrame(
        [
            (1, "wiki", "alpha beta gamma delta"),
            (2, "wiki", "epsilon zeta eta"),
            (3, "web", "alpha beta gamma theta"),       # shares 2 grams w/ wiki
            (4, "web", "iota kappa lambda"),
            (5, "books", "mu nu xi"),                   # disjoint
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap(df, n=3).collect()}
    # wiki grams: {abg, bgd, ezh(1 each doc: 'epsilon zeta eta')} = 3+... doc1: 2 grams, doc2: 1 -> 3
    # web: doc3: 2 grams, doc4: 1 -> 3 ; shared wiki&web = {'alpha beta gamma'} = 1
    r = out[("web", "wiki")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 3, 3)
    # disjoint pairs emit no row (sparse matrix)
    assert ("books", "wiki") not in out and ("books", "web") not in out


def test_source_overlap_counts_distinct_within_source(spark):
    from kgspark.decontam import source_overlap

    # duplicate grams inside one source count once
    df = spark.createDataFrame(
        [
            (1, "a", "x y z"),
            (2, "a", "x y z"),
            (3, "b", "x y z w"),
        ],
        "doc_id long, source string, text string",
    )
    [r] = source_overlap(df, n=3).collect()
    assert (r["src_a"], r["src_b"], r["n_shared"], r["n_a"], r["n_b"]) == (
        "a", "b", 1, 1, 2)


def test_source_overlap_short_and_null_docs(spark):
    from kgspark.decontam import source_overlap

    df = spark.createDataFrame(
        [(1, "a", "one two"), (2, "b", None), (3, "a", "p q r"),
         (4, "b", "p q r")],
        "doc_id long, source string, text string",
    )
    [r] = source_overlap(df, n=3).collect()
    # <3-token and null docs contribute nothing
    assert (r["src_a"], r["src_b"], r["n_shared"], r["n_a"], r["n_b"]) == (
        "a", "b", 1, 1, 1)


def test_kanon_report_class_census(spark):
    from kgspark.pii import kanon_report

    # 5 rows in class (a,1); 2 rows in (b,1); 1 row in (b,2)
    rows = (
        [("a", 1, 10)] * 3 + [("a", 1, 20)] * 2
        + [("b", 1, 30), ("b", 1, 30), ("b", 2, 40)]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, sv int")
    rep = {
        r["class_size"]: r
        for r in kanon_report(
            df, ["q1", "q2"], k=3, sensitive_col="sv", l_div=2
        ).collect()
    }
    assert set(rep) == {5, 2, 1}
    # size-5 class: 1 class, 5 rows, >= k, 2 distinct sv -> not low-div
    assert (rep[5]["n_classes"], rep[5]["n_rows"]) == (1, 5)
    assert rep[5]["below_k"] == 0 and rep[5]["n_classes_low_div"] == 0
    # size-2 class (b,1): below k, single sv value -> low diversity
    assert rep[2]["below_k"] == 1 and rep[2]["n_classes_low_div"] == 1
    # singleton (b,2): below k and trivially homogeneous
    assert rep[1]["below_k"] == 1 and rep[1]["n_classes_low_div"] == 1


def test_kanon_report_without_sensitive(spark):
    from kgspark.pii import kanon_report

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2)], "q1 string, q2 int"
    )
    out = kanon_report(df, ["q1", "q2"], k=2)
    assert "n_classes_low_div" not in out.columns
    got = {r["class_size"]: r["below_k"] for r in out.collect()}
    assert got == {2: 0, 1: 1}


def test_luhn_census_known_numbers(spark):
    from kgspark.pii import luhn_census

    docs = spark.createDataFrame(
        [
            # 4539 1488 0343 6467 is a canonical Luhn-valid test PAN
            (1, "pay 4539-1488-0343-6467 now"),
            (2, "bad 4539-1488-0343-6468 num"),       # off-by-one digit
            (3, "two 4539 1488 0343 6467 and 1234-5678-9012-3456"),
            (4, "no cards at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_candidates, r.n_valid)
           for r in luhn_census(docs).collect()}
    assert out[1] == (1, 1)
    assert out[2] == (1, 0)
    # 1234-5678-9012-3456 fails the checksum (sum % 10 == 4)
    assert out[3] == (2, 1)
    assert out[4] == (0, 0) and out[5] == (0, 0)


def test_iban_census_known_vectors(spark):
    from kgspark.pii import iban_census

    rows = [
        (1, "DE89 3704 0044 0532 0130 00"),  # canonical valid example
        (2, "GB82 WEST 1234 5698 7654 32"),  # valid, letters in BBAN
        (3, "GB82 WEST 1234 5698 7654 33"),  # one digit off
        (4, "DE89370400440532013"),          # wrong length for DE
        (5, "de89 3704 0044 0532 0130 00"),  # lowercase normalizes
        (6, None),
        (7, "XX661234567890123"),            # unknown country, shape ok
    ]
    df = spark.createDataFrame(rows, "rec_id long, iban string")
    out = {r.rec_id: (r.country, r.is_format, r.rem97, r.is_valid)
           for r in iban_census(df).collect()}
    assert out[1] == ("DE", 1, 1, 1)
    assert out[2] == ("GB", 1, 1, 1)
    assert out[3][3] == 0 and out[3][2] not in (1, -1)
    assert out[4] == ("DE", 0, -1, 0)
    assert out[5] == ("DE", 1, 1, 1)
    assert out[6] == ("", 0, -1, 0)
    # unknown-registry country: shape passes, checksum decides
    assert out[7][1] == 1 and out[7][3] == 0


def test_gtin_census_known_vectors(spark):
    from kgspark.pii import gtin_census

    rows = [
        # 4006381333931 is the canonical EAN-13 example (valid)
        (1, "buy 4006381333931 now"),
        # ISBN-13 of a real book (valid): 9780306406157
        (2, "isbn 9780306406157 ."),
        # one digit off -> invalid
        (3, "code 4006381333932 x"),
        # 12 digits: not a candidate at all
        (4, "short 400638133393 x"),
        # two codes, one valid one not
        (5, "a 4006381333931 b 1111111111111 c"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_candidates, r.n_valid)
           for r in gtin_census(df).collect()}
    assert out[1] == (1, 1)
    assert out[2] == (1, 1)
    assert out[3] == (1, 0)
    assert out[4] == (0, 0)
    assert out[5] == (2, 1)
    assert out[6] == (0, 0)


def test_secret_census_discrimination(spark):
    import math
    from collections import Counter

    from kgspark.pii import secret_census

    rows = [
        (1, "export KEY=AKIA9X7bQ2mPz4Lt8RvWn3Ed done"),   # real-shaped
        (2, "the internationalizationconfiguration layer"),  # prose run
        (3, "hex 3f7a9c2e8b1d4f6a0c5e7b9d2f4a6c8e only"),  # 2 classes
        (4, "pad aaaaaaaaaaaaaaaaaaaaaaaa1B end"),          # low entropy
        (5, "short Ab1+Cd2 run"),                            # < 24 chars
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in secret_census(df).collect()}
    assert out[1].is_secret == 1 and out[1].n_classes == 3
    # python mirror of the entropy pin for doc 1's candidate
    cand = "AKIA9X7bQ2mPz4Lt8RvWn3Ed"
    n = len(cand)
    clogc = sum(c * math.log(c) for c in Counter(cand).values())
    assert out[1].entropy_milli == round((math.log(n) - clogc / n) * 1000)
    # prose: single class -> never a secret even if long enough
    assert 2 not in out or out[2].is_secret == 0
    # hex: entropy fine but only 2 classes
    assert out[3].is_secret == 0 and out[3].n_classes == 2
    # repetition kills entropy
    assert out[4].is_secret == 0 and out[4].entropy_milli < 1000
    assert 5 not in out and 6 not in out


def test_deobfuscated_emails_recovery(spark):
    from kgspark.pii import deobfuscated_emails

    rows = [
        (1, "reach me: bob [at] example [dot] com thanks"),
        (2, "contact alice@real.org and carol (at) web (dot) net"),
        (3, "we will meet at noon and dot the i's"),  # prose untouched
        (4, "x [at] y"),                               # no TLD -> none
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_raw, r.n_deob, r.n_recovered)
           for r in deobfuscated_emails(df).collect()}
    assert out[1] == (0, 1, 1)
    assert out[2] == (1, 2, 1)
    assert out[3] == (0, 0, 0)
    assert out[4] == (0, 0, 0)
    assert out[5] == (0, 0, 0)


def test_scholarly_ids_extraction(spark):
    from kgspark.ids import scholarly_ids

    rows = [
        (1, "see doi:10.1038/NPHYS1170. and arXiv:1706.03762v5 today"),
        (2, "classic hep-th/9711200 plus 10.1145/3292500.3330919,"),
        # same DOI twice in different case -> one normalized row
        (3, "10.1000/XYZ and also 10.1000/xyz again"),
        (4, "no identifiers here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in scholarly_ids(df).collect():
        out.setdefault(r.doc_id, set()).add((r.kind, r.norm))
    assert ("doi", "10.1038/nphys1170") in out[1]
    assert ("arxiv", "1706.03762v5") in out[1]
    assert ("arxiv", "hep-th/9711200") in out[2]
    # trailing comma stripped from the DOI tail
    assert ("doi", "10.1145/3292500.3330919") in out[2]
    # case variants collapse to one row with the min raw form
    rows3 = [r for r in scholarly_ids(df).collect() if r.doc_id == 3]
    assert len(rows3) == 1 and rows3[0].norm == "10.1000/xyz"
    assert rows3[0].raw == "10.1000/XYZ"  # 'X' < 'x' in byte order
    assert 4 not in out and 5 not in out


def test_arxiv_month_gate(spark):
    """Round-5 advice regression: the YYMM prefix of a new-style arXiv
    id must carry a real month — '2024.1234'-style decimals in prose
    are no longer extracted."""
    from kgspark.ids import scholarly_ids

    rows = [
        (1, "released in 2024.1234 build"),      # MM=24 -> reject
        (2, "see arXiv:1706.03762 for details"), # MM=06 -> accept
        (3, "coords 4857.99881 here"),           # MM=57 -> reject
        (4, "paper 2112.10752v1 rocks"),         # MM=12 -> accept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.norm for r in scholarly_ids(df).collect()}
    assert out == {2: "1706.03762", 4: "2112.10752v1"}
