"""Tumbling-window burst detection (kgspark.relops.burst_windows)."""

from datetime import datetime

from kgspark.relops import burst_windows


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_burst_flags_the_spike_day(spark):
    rows = []
    # 10 quiet days at 5 events, one day at 50
    for d in range(1, 11):
        rows += [("click", datetime(2024, 1, d, h, 0)) for h in range(5)]
    rows += [("click", datetime(2024, 1, 15, h % 24, h % 60)) for h in range(50)]
    out = {r.window_start.day: r for r in burst_windows(_events(spark, rows)).collect()}
    assert out[15].is_burst and out[15].cnt == 50
    assert not any(out[d].is_burst for d in range(1, 11))


def test_burst_uniform_series_never_flags(spark):
    rows = [
        ("view", datetime(2024, 2, d, 12, 0)) for d in range(1, 20)
    ]
    out = burst_windows(_events(spark, rows)).collect()
    assert not any(r.is_burst for r in out)
    assert all(r.cnt == 1 for r in out)


def test_burst_single_window_type_and_nulls(spark):
    rows = [
        ("solo", datetime(2024, 3, 1, 1, 0)),
        ("solo", datetime(2024, 3, 1, 2, 0)),
        ("solo", None),
    ]
    out = burst_windows(_events(spark, rows)).collect()
    # one observed window: n-1 == 0 -> never a burst; null ts dropped
    assert len(out) == 1 and out[0].cnt == 2 and not out[0].is_burst


def test_burst_below_mean_never_flags_even_with_variance(spark):
    rows = []
    # alternating 1 / 9 events: low days are 2 sd-ish below, must not flag
    for d in range(1, 13):
        n = 1 if d % 2 else 9
        rows += [("err", datetime(2024, 4, d, i, 0)) for i in range(n)]
    out = burst_windows(_events(spark, rows)).collect()
    low = [r for r in out if r.cnt == 1]
    assert low and not any(r.is_burst for r in low)


def test_burst_determinism_across_partitionings(spark):
    rows = [
        ("t%d" % (i % 3), datetime(2024, 5, 1 + (i * 7) % 28, i % 24, 0))
        for i in range(300)
    ]
    df = _events(spark, rows)
    a = sorted(map(tuple, burst_windows(df.repartition(1)).collect()))
    b = sorted(map(tuple, burst_windows(df.repartition(13)).collect()))
    assert a == b


def test_touch_attribution_first_last_and_none(spark):
    from kgspark.relops import touch_attribution
    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [(1, 1, "ad", t(1)), (2, 1, "email", t(2)), (3, 1, "buy", t(3)),
         (4, 2, "email", t(1)), (5, 2, "buy", t(2)),
         (6, 3, "buy", t(1)),                  # no preceding touch
         (7, 1, "ad", t(4)), (8, 1, "buy", t(5))],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        r.channel: (r.n_first, r.n_last)
        for r in touch_attribution(ev, "buy", ["ad", "email"]).collect()
    }
    # user1 buy@3: first=ad, last=email; user1 buy@5: first=ad, last=ad;
    # user2: email/email; user3: none
    assert got == {
        "ad": (2, 1),
        "email": (1, 2),
        "(none)": (1, 1),
    }
