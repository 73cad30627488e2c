"""char_entropy_stats and novelty_stats (kgspark.textstats)."""

import math

from kgspark.textstats import char_entropy_stats, novelty_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_entropy_ingredients_match_hand_computation(spark):
    out = {r.doc_id: r for r in char_entropy_stats(
        _docs(spark, [(1, "aab"), (2, "aaaa"), (3, ""), (4, None)])
    ).collect()}
    # doc 1: counts a=2, b=1 -> sum = 2*round(ln2*1e6) + 1*0
    assert out[1].n_chars_counted == 3
    assert out[1].sum_clnc_unats == 2 * round(math.log(2) * 1e6)
    assert abs(out[1].entropy - (math.log(3) - 2 * math.log(2) / 3)) < 1e-5
    # uniform repetition: entropy 0
    assert out[2].sum_clnc_unats == 4 * round(math.log(4) * 1e6)
    assert abs(out[2].entropy) < 1e-5
    # empty / NULL keep zero rows
    assert out[3].n_chars_counted == 0 and out[3].entropy == 0.0
    assert out[4].n_chars_counted == 0 and out[4].sum_clnc_unats == 0


def test_entropy_diverse_beats_repetitive(spark):
    out = {r.doc_id: r.entropy for r in char_entropy_stats(
        _docs(spark, [(1, "abcdefgh"), (2, "abababab")])
    ).collect()}
    assert out[1] > out[2] > 0


def test_novelty_counts_common_grams(spark):
    boiler = "subscribe to our newsletter now"
    docs = _docs(
        spark,
        [
            (1, boiler + " unique alpha beta"),
            (2, boiler + " other gamma delta words"),
            (3, "totally fresh content nothing shared here"),
            (4, "ab"),  # < 3 tokens -> no grams
        ],
    )
    out = {r.doc_id: r for r in novelty_stats(docs, n=3, min_df=2).collect()}
    # the 3 boilerplate trigrams inside `boiler` appear in docs 1 and 2
    assert out[1].n_common == 3 and out[2].n_common == 3
    assert out[3].n_common == 0 and out[3].n_grams == 4
    assert out[4].n_grams == 0 and out[4].n_common == 0
    assert len(out) == 4


def test_novelty_determinism_across_partitionings(spark):
    rows = [(i, " ".join(f"w{(i + j) % 9}" for j in range(6))) for i in range(50)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, novelty_stats(docs.repartition(1)).collect()))
    b = sorted(map(tuple, novelty_stats(docs.repartition(13)).collect()))
    assert a == b


def test_script_mix_census(spark):
    from kgspark.textstats import script_mix

    docs = _docs(spark, [
        (1, "Ab1 \t x"),      # 3 latin, 1 digit, 3 ws, 0 other
        (2, "!!##"),           # all other
        (3, ""),               # empty -> permille 0 guard
        (4, "abcd"),           # pure latin -> 1000 permille
    ])
    out = {r.doc_id: r for r in script_mix(docs).collect()}
    assert (out[1].n_chars, out[1].n_latin, out[1].n_digit,
            out[1].n_ws, out[1].n_other) == (7, 3, 1, 3, 0)
    assert out[1].latin_permille == 3000 // 7
    assert (out[2].n_other, out[2].latin_permille) == (4, 0)
    assert out[3].n_chars == 0 and out[3].latin_permille == 0
    assert out[4].latin_permille == 1000


def test_source_divergence_identical_and_disjoint(spark):
    import math

    from kgspark.textstats import source_divergence

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "a b c", "s2"),      # identical distribution to s1
            (3, "x y z", "s3"),      # disjoint from both
        ],
        "doc_id long, text string, source string",
    )
    got = {(r["source_a"], r["source_b"]): r
           for r in source_divergence(df).collect()}
    # identical distributions -> JSD 0
    r12 = got[("s1", "s2")]
    assert r12["n_shared"] == 3 and r12["jsd2_micro"] == 0
    # fully disjoint pairs still appear, at maximal divergence 2 ln 2
    two_ln2 = 2 * round(math.log(2.0) * 1e6)
    for pair in [("s1", "s3"), ("s2", "s3")]:
        r = got[pair]
        assert r["n_shared"] == 0 and r["jsd2_micro"] == two_ln2
    assert len(got) == 3
    df2 = spark.createDataFrame(
        [(1, "a a b", "p"), (2, "a c c", "q")],
        "doc_id long, text string, source string",
    )
    r = source_divergence(df2).collect()[0]
    # manual: P(a)=2/3 P(b)=1/3; Q(a)=1/3 Q(c)=2/3; shared token = a
    pa, qa = 2 / 3, 1 / 3
    term_a = round((pa * math.log(2 * pa / (pa + qa))
                    + qa * math.log(2 * qa / (pa + qa))) * 1e6)
    only = round((1 - pa) * math.log(2.0) * 1e6)  # b mass
    only_q = round((1 - qa) * math.log(2.0) * 1e6)  # c mass
    assert r["n_shared"] == 1
    assert r["jsd2_micro"] == term_a + only + only_q


def test_code_signals_flags_code(spark):
    from kgspark.textstats import code_signals

    code = ("def f(x):\n  y_z = x;\n  return {x: y_z}\n"
            "  callFn(aB)\n  more;")
    prose = "This is ordinary prose. It has sentences and no braces."
    df = spark.createDataFrame(
        [(1, code), (2, prose), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in code_signals(df).collect()}
    c = got[1]
    assert c["n_braces"] == 2 and c["n_semis"] == 2
    assert c["n_indent_lines"] == 4 and c["n_snake"] == 2
    assert c["n_camel"] == 2  # llF in callFn + aB
    assert c["is_codey"] == 1
    p = got[2]
    assert p["n_braces"] == 0 and p["is_codey"] == 0
    assert p["max_line_chars"] == len(prose)
    assert 3 not in got  # null text dropped


def test_rank_correlation_extremes(spark):
    from kgspark.textstats import rank_correlation

    up = spark.createDataFrame(
        [(i, i, i * 10) for i in range(1, 6)], "id long, a long, b long"
    )
    r = rank_correlation(up, "a", "b", "id").collect()[0]
    assert (r["n"], r["sum_d2"], r["rho_ppm"]) == (5, 0, 1000000)
    down = spark.createDataFrame(
        [(i, i, -i) for i in range(1, 6)], "id long, a long, b long"
    )
    r2 = rank_correlation(down, "a", "b", "id").collect()[0]
    assert r2["rho_ppm"] == -1000000
    single = rank_correlation(up.limit(1), "a", "b", "id").collect()[0]
    assert single["rho_ppm"] == -1  # sentinel below n=2


def test_good_turing_spectrum_hand_case(spark):
    from kgspark.textstats import good_turing_spectrum

    # counts: a=3, b=2, c=2, d=1, e=1, f=1
    # spectrum: N_1=3, N_2=2, N_3=1
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "c d e f")],
        "doc_id long, text string",
    )
    out = {r.r: (r.n_r, r.n_next, r.r_star_ppm)
           for r in good_turing_spectrum(docs).collect()}
    # r=1: r* = 2*N_2/N_1 = 4/3 -> 1333333 ppm (truncated)
    # r=2: r* = 3*N_3/N_2 = 3/2 -> 1500000 ppm
    # r=3: N_4 = 0 -> gap, r_star_ppm = 0
    assert out == {1: (3, 2, 1_333_333), 2: (2, 1, 1_500_000),
                   3: (1, 0, 0)}


def test_good_turing_gap_join_is_literal_next(spark):
    from kgspark.textstats import good_turing_spectrum

    # counts: a=1, b=3 -> spectrum N_1=1, N_3=1 with a GAP at r=2:
    # r=1 must use N_2 = 0 (literal r+1), NOT the next observed N_3
    docs = spark.createDataFrame(
        [(1, "a b b b")], "doc_id long, text string"
    )
    out = {r.r: (r.n_next, r.r_star_ppm)
           for r in good_turing_spectrum(docs).collect()}
    assert out == {1: (0, 0), 3: (0, 0)}


def test_lang_spans_segmentation(spark):
    from kgspark.textstats import lang_spans

    en = "the of and is in it that for as with " * 4   # 40 en tokens
    de = "der die das ist nicht mit den ein der die " * 2  # 20 de tokens
    df = spark.createDataFrame(
        [(1, en + de), (2, en), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {}
    for r in lang_spans(df, window=20).collect():
        out.setdefault(r.id, []).append(
            (r.lang, r.start_win, r.end_win, r.n_windows))
    # doc 1: windows 0-1 en, window 2 de -> two spans
    assert sorted(out[1]) == [("de", 2, 2, 1), ("en", 0, 1, 2)]
    # doc 2: one en span over 2 windows
    assert out[2] == [("en", 0, 1, 2)]
    # empty / NULL docs emit nothing
    assert 3 not in out and 4 not in out
    # a doc alternating languages produces one span per run
    mix = de + en[:len("the of and is in it that for as with ") * 2] + de
    df2 = spark.createDataFrame([(9, mix)], "doc_id long, text string")
    spans = sorted(
        (r.start_win, r.lang) for r in lang_spans(df2, window=20).collect()
    )
    assert [lg for _w, lg in spans] == ["de", "en", "de"]
