

class TestZipfProfile:
    def test_hand_checked_decades(self, spark):
        from kgspark.textstats import zipf_profile

        # source A: token 't{i}' occurs (20-i) times for i in 0..14 —
        # rank 1 = t0 freq 20, rank 10 = t9 freq 11
        rows = []
        for i in range(15):
            rows.append(("A", " ".join([f"t{i}"] * (20 - i))))
        rows.append(("B", "x x x y"))  # rank 1 = x(3); no rank 10
        df = spark.createDataFrame(rows, "source string, text string")
        got = {
            (r["source"], r["rank"]): (r["term"], r["freq"], r["decay_ppm"])
            for r in zipf_profile(df).collect()
        }
        assert got[("A", 1)] == ("t0", 20, 1000000)
        assert got[("A", 10)] == ("t9", 11, 11 * 1000000 // 20)
        assert got[("B", 1)] == ("x", 3, 1000000)
        assert ("B", 10) not in got
        assert len(got) == 3

    def test_tie_break_is_term_asc(self, spark):
        from kgspark.textstats import zipf_profile

        df = spark.createDataFrame(
            [("S", "b a c a b c")], "source string, text string"
        )
        got = {r["rank"]: r["term"] for r in zipf_profile(df).collect()}
        assert got[1] == "a"  # all freq 2 -> term asc breaks the tie

    def test_validation_and_empty(self, spark):
        import pytest as _pytest

        from kgspark.textstats import zipf_profile

        df = spark.createDataFrame(
            [("S", "a")], "source string, text string"
        )
        with _pytest.raises(ValueError):
            zipf_profile(df, ranks=(0, 5))
        assert zipf_profile(df.limit(0)).count() == 0


def test_wilson_bounds_small_n_never_outranks(spark):
    from kgspark.textstats import wilson_bounds

    rows = [("tiny", True)] * 1 + [("tiny", False)] * 1 \
        + [("big", True)] * 400 + [("big", False)] * 600
    df = spark.createDataFrame(rows, "src string, bad boolean")
    got = {r.key: r for r in wilson_bounds(df, "src", "bad").collect()}
    # raw rate says tiny (1/2) >> big (400/1000); Wilson lower bound
    # must invert that ranking
    assert got["tiny"].rate_ppm > got["big"].rate_ppm
    assert got["tiny"].wilson_lo < got["big"].wilson_lo
    for r in got.values():
        assert 0.0 <= r.wilson_lo <= r.wilson_hi <= 1.0
    # hand-checked Wilson for k=1 n=2 z=1.96 (lo ~0.0945, hi ~0.9055)
    assert abs(got["tiny"].wilson_lo - 0.0945) < 1e-3
    assert abs(got["tiny"].wilson_hi - 0.9055) < 1e-3


def test_benford_profile_digits_and_dev(spark):
    from kgspark.textstats import benford_profile

    # powers-of-ten spread: every value's first digit is explicit
    rows = ([("a", 1.0), ("a", 0.023), ("a", 345.0), ("a", 9.1),
             ("a", 100.5)]
            + [("u", float(d)) for d in range(1, 10)])  # uniform digits
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r.key: r for r in benford_profile(df, "k", "v").collect()}
    a = got["a"]
    assert (a.d1, a.d2, a.d3, a.d9) == (2, 1, 1, 1) and a.n == 5
    u = got["u"]
    assert all(getattr(u, f"d{i}") == 1 for i in range(1, 10))
    # uniform digits diverge from Benford by a known exact amount:
    # sum |111111 - benford_micro(d)|
    ben = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
           45757]
    assert u.dev_micro == sum(abs(1000000 // 9 - b) for b in ben)
    # nonpositive and NULL excluded
    df2 = spark.createDataFrame(
        [("z", -5.0), ("z", 0.0), ("z", None), ("z", 7.0)],
        "k string, v double",
    )
    z = benford_profile(df2, "k", "v").collect()[0]
    assert z.n == 1 and z.d7 == 1


def test_skeleton_census_flags_templates(spark):
    from kgspark.textstats import skeleton_census

    df = spark.createDataFrame(
        [(1, "Alice scored 42 points in Oslo!"),
         (2, "Bob scored 7 points in Paris!"),
         (3, "carol SCORED 1234 points in nyc!"),
         (4, "a completely different sentence."),
         (5, None)],
        "doc_id long, text string",
    )
    got = {r.id: r for r in skeleton_census(df, min_df=3).collect()}
    # 1-3 share the 'w w 9 w w w!' skeleton despite disjoint casing,
    # names and numbers
    assert got[1].skel_hash == got[2].skel_hash == got[3].skel_hash
    assert got[1].skel_df == 3 and got[1].is_template
    assert not got[4].is_template and got[4].skel_df == 1
    assert not got[5].is_template  # NULL text -> its own '' skeleton
