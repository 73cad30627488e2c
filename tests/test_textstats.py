

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
