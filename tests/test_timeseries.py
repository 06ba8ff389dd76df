"""Time-series resample/gap-fill + range-rolling tests (operators/timeseries.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators.timeseries import resample_fill, rolling_range


def _stream(spark):
    # key "a": events at 00:00, 00:05(x2), 00:30 — minute buckets with a
    # 4-bucket gap then a 24-bucket gap; key "b": a single event.
    rows = [
        Row(k="a", ts="2024-01-01 00:00:10", v=1.0),
        Row(k="a", ts="2024-01-01 00:05:20", v=2.0),
        Row(k="a", ts="2024-01-01 00:05:40", v=4.0),
        Row(k="a", ts="2024-01-01 00:30:00", v=8.0),
        Row(k="b", ts="2024-01-01 12:00:00", v=100.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_resample_grid_zero_and_forward_fill(spark):
    out = resample_fill(
        _stream(spark), ["k"], "ts", 60,
        aggs={"n": F.count(F.lit(1)),
              "avg_v": F.avg("v")},
        zero_fill=["n"], forward_fill=["avg_v"],
    ).orderBy("k", "bucket_ts").collect()

    a = [r for r in out if r.k == "a"]
    b = [r for r in out if r.k == "b"]
    assert len(a) == 31  # 00:00 .. 00:30 inclusive at 1-min steps
    assert len(b) == 1
    # bucket 0: one event; buckets 1-4 empty; bucket 5: two events
    assert [r.n for r in a[:6]] == [1, 0, 0, 0, 0, 2]
    # zero-filled counts everywhere, never NULL
    assert all(r.n is not None for r in a)
    # forward-fill: gap buckets carry the last observed average
    assert a[0].avg_v == 1.0
    assert a[1].avg_v == 1.0 and a[4].avg_v == 1.0
    assert a[5].avg_v == 3.0
    assert a[6].avg_v == 3.0 and a[29].avg_v == 3.0
    assert a[30].avg_v == 8.0


def test_resample_bucket_guard_trips(spark):
    df = spark.createDataFrame(
        [Row(k="x", ts="1970-01-01 00:00:00", v=0.0),
         Row(k="x", ts="2024-01-01 00:00:00", v=1.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_fill(df, ["k"], "ts", 60, aggs={"n": F.count(F.lit(1))},
                        max_buckets_per_key=1000)
    with pytest.raises(Exception, match="max_buckets_per_key"):
        out.collect()


def test_rolling_range_window_and_ties(spark):
    # u=1: ts 0s, 30s, 30s (tie), 100s with a 60s trailing range:
    #  row@0   -> {0}            sum 1
    #  rows@30 -> {0,30,30}      sum 1+2+4=7 for BOTH tie rows (RANGE)
    #  row@100 -> {100} only     (30s rows are 70s earlier, outside 60s)
    rows = [
        Row(u=1, i=1, ts="2024-01-01 00:00:00", v=1.0),
        Row(u=1, i=2, ts="2024-01-01 00:00:30", v=2.0),
        Row(u=1, i=3, ts="2024-01-01 00:00:30", v=4.0),
        Row(u=1, i=4, ts="2024-01-01 00:01:40", v=8.0),
        Row(u=2, i=5, ts="2024-01-01 00:00:00", v=50.0),
    ]
    df = spark.createDataFrame(rows, "u int, i int, ts string, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.i: r for r in rolling_range(df, ["u"], "ts", "v", 60).collect()}
    assert out[1].rolling_sum == 1.0 and out[1].rolling_count == 1
    assert out[2].rolling_sum == 7.0 and out[3].rolling_sum == 7.0
    assert out[2].rolling_count == 3 and out[3].rolling_count == 3
    assert out[4].rolling_sum == 8.0 and out[4].rolling_count == 1
    assert out[5].rolling_sum == 50.0
    assert out[2].rolling_avg == pytest.approx(7.0 / 3.0)


def test_bucket_floors_negative_epochs(spark):
    # pre-1970 timestamps must floor toward -inf like date_trunc, not
    # round toward zero (r6 advisor): 1969-12-31 23:59:50 at a 60s step
    # buckets to 23:59:00, never to a start AFTER the event.
    df = spark.createDataFrame(
        [Row(k="x", ts="1969-12-31 23:59:50", v=1.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_fill(df, ["k"], "ts", 60,
                        aggs={"n": F.count(F.lit(1))}).collect()
    assert len(out) == 1
    assert str(out[0].bucket_ts) == "1969-12-31 23:59:00"
    trunc = df.select(F.date_trunc("minute", "ts").alias("t")).first().t
    assert out[0].bucket_ts == trunc


def test_rolling_avg_skips_null_values(spark):
    # ANSI AVG skips NULLs in numerator AND denominator; rolling_count
    # still counts all frame rows (r6 advisor).
    rows = [
        Row(u=1, i=1, ts="2024-01-01 00:00:00", v=3.0),
        Row(u=1, i=2, ts="2024-01-01 00:00:10", v=None),
        Row(u=1, i=3, ts="2024-01-01 00:00:20", v=6.0),
    ]
    df = spark.createDataFrame(rows, "u int, i int, ts string, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.i: r for r in rolling_range(df, ["u"], "ts", "v", 60).collect()}
    assert out[3].rolling_count == 3          # COUNT(*) over the frame
    assert out[3].rolling_sum == 9.0
    assert out[3].rolling_avg == pytest.approx(4.5)   # 9 / 2, not 9 / 3
    assert out[2].rolling_avg == pytest.approx(3.0)   # 3 / 1, not 3 / 2


# --- EWMA (timeseries.ewma) --------------------------------------------------

def test_ewma_hand_computed(spark):
    from goetl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None), ("a", 4, 40.0),
         ("b", 1, 100.0)],
        "k string, i int, x double")
    out = {(r["k"], r["i"]): r["ewma"]
           for r in ewma(df, "x", ["i"], ["k"], alpha=0.5).collect()}
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 0.5 * 20.0 + 0.5 * 10.0          # 15.0
    assert out[("a", 3)] is None                             # NULL emits NULL
    assert out[("a", 4)] == 0.5 * 40.0 + 0.5 * 15.0          # state survived
    assert out[("b", 1)] == 100.0                            # keys independent


def test_ewma_partitioning_invariance_and_guards(spark):
    """Result must not depend on input partitioning (the shuffle+sort
    owns the order), alpha=1 degenerates to the identity, bad args
    raise."""
    import pytest as _pytest

    from goetl_spark.operators.timeseries import ewma

    rows = [("k", i, float((i * 37) % 101)) for i in range(1, 101)]
    df1 = spark.createDataFrame(rows, "k string, i int, x double")
    df8 = df1.repartition(8)
    a = {r["i"]: r["ewma"]
         for r in ewma(df1, "x", ["i"], ["k"], 0.3).collect()}
    b = {r["i"]: r["ewma"]
         for r in ewma(df8, "x", ["i"], ["k"], 0.3).collect()}
    assert a == b
    ident = {r["i"]: r["ewma"]
             for r in ewma(df1, "x", ["i"], ["k"], 1.0).collect()}
    assert all(ident[i] == dict((i2, x) for _, i2, x in rows)[i]
               for i in ident)
    with _pytest.raises(ValueError):
        ewma(df1, "x", ["i"], ["k"], 0.0)
    with _pytest.raises(ValueError):
        ewma(df1, "x", [], ["k"], 0.5)


def test_holt_hand_computed(spark):
    from goetl_spark.operators.timeseries import holt_smooth

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None), ("a", 4, 40.0),
         ("b", 1, 7.0)],
        "k string, i int, x double")
    out = {(r["k"], r["i"]): (r["level"], r["trend"])
           for r in holt_smooth(df, "x", ["i"], ["k"],
                                alpha=0.5, beta=0.5).collect()}
    assert out[("a", 1)] == (10.0, 0.0)
    # l2 = .5*20 + .5*(10+0) = 15 ; b2 = .5*(15-10) + .5*0 = 2.5
    assert out[("a", 2)] == (15.0, 2.5)
    assert out[("a", 3)] == (None, None)
    # l4 = .5*40 + .5*(15+2.5) = 28.75 ; b4 = .5*(28.75-15) + .5*2.5 = 8.125
    assert out[("a", 4)] == (28.75, 8.125)
    assert out[("b", 1)] == (7.0, 0.0)


def test_holt_tracks_linear_trend(spark):
    """On an exactly linear series the forecast level+trend converges to
    the next point; with beta=1, trend locks onto the true slope."""
    from goetl_spark.operators.timeseries import holt_smooth

    rows = [("k", i, 3.0 * i + 2.0) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = sorted(
        holt_smooth(df, "x", ["i"], ["k"], alpha=0.5, beta=0.5).collect(),
        key=lambda r: r["i"])
    last = out[-1]
    # remaining error is the geometric mode |lambda|^39 * 3 ~ 4e-6
    assert abs(last["trend"] - 3.0) < 1e-5
    assert abs((last["level"] + last["trend"]) - (3.0 * 41 + 2.0)) < 1e-4


def test_holt_partitioning_invariance_and_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.timeseries import holt_smooth

    rows = [("k", i, float((i * 37) % 101)) for i in range(1, 101)]
    df1 = spark.createDataFrame(rows, "k string, i int, x double")
    a = {r["i"]: (r["level"], r["trend"])
         for r in holt_smooth(df1, "x", ["i"], ["k"], 0.3, 0.2).collect()}
    b = {r["i"]: (r["level"], r["trend"])
         for r in holt_smooth(df1.repartition(8), "x", ["i"], ["k"],
                              0.3, 0.2).collect()}
    assert a == b
    with _pytest.raises(ValueError):
        holt_smooth(df1, "x", ["i"], ["k"], 0.5, 0.0)
    with _pytest.raises(ValueError):
        holt_smooth(df1, "x", ["i"], [], 0.5, 0.5)


def test_cusum_detects_mean_shift(spark):
    from goetl_spark.operators.timeseries import cusum

    # 20 in-control points at ~10, then 20 shifted to ~13
    rows = [("k", i, 10.0 + (i % 3) - 1.0) for i in range(1, 21)]
    rows += [("k", i, 13.0 + (i % 3) - 1.0) for i in range(21, 41)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = sorted(cusum(df, "x", ["i"], ["k"], target=10.0, slack=0.5,
                       threshold=5.0).collect(), key=lambda r: r["i"])

    # replay the recurrence in pure Python
    sp = sn = 0.0
    for r in out:
        x = r["x"]
        sp = max(0.0, sp + ((x - 10.0) - 0.5))
        sn = max(0.0, sn + ((10.0 - x) - 0.5))
        assert r["cusum_pos"] == sp and r["cusum_neg"] == sn
        assert r["alarm"] == (sp > 5.0 or sn > 5.0)
    # in-control half never alarms; shifted half eventually does
    assert not any(r["alarm"] for r in out[:20])
    assert any(r["alarm"] for r in out[20:])


def test_cusum_null_handling_and_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [("k", 1, 12.0), ("k", 2, None), ("k", 3, 12.0)],
        "k string, i int, x double")
    out = {r["i"]: r for r in
           cusum(df, "x", ["i"], ["k"], target=10.0).collect()}
    assert out[2]["cusum_pos"] is None and out[2]["alarm"] is None
    # state carried across the NULL: 2.0 then 4.0
    assert out[1]["cusum_pos"] == 2.0 and out[3]["cusum_pos"] == 4.0
    # threshold=None -> alarm column all NULL
    assert out[1]["alarm"] is None
    with _pytest.raises(ValueError):
        cusum(df, "x", ["i"], ["k"], target=0.0, slack=-1.0)
    with _pytest.raises(ValueError):
        cusum(df, "x", [], ["k"], target=0.0)


def test_coalesce_intervals_numeric(spark):
    from goetl_spark.operators.timeseries import coalesce_intervals

    rows = [
        ("a", 0, 10), ("a", 5, 12), ("a", 12, 15),   # chain via overlap+touch
        ("a", 20, 25),                               # separate
        ("a", 26, 30),                               # joins 20-25 at gap>=1
        ("b", 0, 100), ("b", 40, 50),                # containment
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")

    out0 = {(r["k"], r["span_start"]): r for r in
            coalesce_intervals(df, ["k"], "s", "e").collect()}
    assert set(out0) == {("a", 0), ("a", 20), ("a", 26), ("b", 0)}
    assert out0[("a", 0)]["span_end"] == 15
    assert out0[("a", 0)]["n_merged"] == 3
    assert out0[("b", 0)]["span_end"] == 100
    assert out0[("b", 0)]["n_merged"] == 2

    out1 = {(r["k"], r["span_start"]): r for r in
            coalesce_intervals(df.repartition(7), ["k"], "s", "e",
                               gap=1).collect()}
    assert set(out1) == {("a", 0), ("a", 20), ("b", 0)}
    assert out1[("a", 20)]["span_end"] == 30


def test_coalesce_intervals_timestamps(spark):
    import datetime as dt

    from goetl_spark.operators.timeseries import coalesce_intervals

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = [("u", t0, t0 + 60 * sec), ("u", t0 + 30 * sec, t0 + 90 * sec),
            ("u", t0 + 200 * sec, t0 + 210 * sec)]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = sorted(coalesce_intervals(df, ["k"], "s", "e", gap=30).collect(),
                 key=lambda r: r["span_start"])
    assert len(out) == 2
    assert out[0]["span_end"] == t0 + 90 * sec and out[0]["n_merged"] == 2
    # gap=110 bridges the 110-second hole
    assert len(coalesce_intervals(df, ["k"], "s", "e", gap=110)
               .collect()) == 1


def test_linear_trend_exact_and_degenerate(spark):
    from goetl_spark.operators.timeseries import linear_trend

    # y = 2x + 1 exactly for key 'a'; key 'b' constant x -> NULL fit
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(10)]
    rows += [("b", 5.0, 1.0), ("b", 5.0, 9.0)]
    rows += [("c", None, 3.0), ("c", 1.0, None), ("c", 0.0, 0.0),
             ("c", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.k: r for r in linear_trend(df, ["k"], "x", "y").collect()}
    assert out["a"].n == 10
    assert abs(out["a"].slope - 2.0) < 1e-12
    assert abs(out["a"].intercept - 1.0) < 1e-12
    assert out["b"].slope is None and out["b"].intercept is None
    # NULL x or y rows skipped: key c fits through (0,0),(2,4)
    assert out["c"].n == 2 and abs(out["c"].slope - 2.0) < 1e-12
    assert abs(out["c"].intercept) < 1e-12


# ---------------------------------------------------------------------------
# seasonal_decompose


def _hourly_series(spark, days=14, keys=("a", "b")):
    """Gap-free hourly series: level 100 + hour-of-day effect (h - 11.5)
    + small linear drift, per key — known seasonality, known trend."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k in keys:
        bump = 10.0 if k == "a" else -5.0
        for i in range(24 * days):
            h = i % 24
            rows.append((k, t0 + dt.timedelta(hours=i),
                         100.0 + bump + (h - 11.5) + 0.01 * i))
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double")


def test_seasonal_decompose_identity_and_recovery(spark):
    from goetl_spark.operators.timeseries import seasonal_decompose

    df = _hourly_series(spark)
    out = seasonal_decompose(df, "ts", ["event_type"], "value",
                             grain="hour", phase="hour_of_day")
    rows = out.collect()
    assert len(rows) == 2 * 24 * 14
    for r in rows:
        if r["trend"] is not None:
            # the additive identity holds exactly (resid is defined as
            # the remainder of two exact-decimal-derived doubles)
            assert r["resid"] is not None
            assert abs(r["value"] - r["trend"] - r["seasonal"]
                       - r["resid"]) < 1e-12
    # centered MA of a linear+periodic series reproduces the linear part:
    # hour-of-day effects cancel inside a full 2x24 window, so seasonal
    # recovers (h - 11.5) up to the drift's tiny phase bias
    a = {(r["bucket"].hour): r["seasonal"] for r in rows
         if r["event_type"] == "a" and r["seasonal"] is not None}
    for h in range(24):
        assert abs(a[h] - (h - 11.5)) < 0.1, (h, a[h])
    # trend is NULL at exactly the first and last 12 buckets per key
    nulls = [r for r in rows if r["trend"] is None]
    assert len(nulls) == 2 * 24
    # residuals are near zero for this noiseless series
    resids = [abs(r["resid"]) for r in rows if r["resid"] is not None]
    assert max(resids) < 0.1


def test_seasonal_decompose_guards(spark):
    import pytest as _pt

    from goetl_spark.operators.timeseries import seasonal_decompose

    df = _hourly_series(spark, days=2)
    with _pt.raises(ValueError, match="phase"):
        seasonal_decompose(df, "ts", ["event_type"], "value",
                           phase="minute_of_hour")
    with _pt.raises(ValueError, match="key"):
        seasonal_decompose(df, "ts", [], "value")


def test_seasonal_decompose_partition_independence(spark):
    from goetl_spark.operators.timeseries import seasonal_decompose

    df = _hourly_series(spark, days=4)
    a = sorted(map(tuple, seasonal_decompose(
        df, "ts", ["event_type"], "value").collect()))
    b = sorted(map(tuple, seasonal_decompose(
        df.repartition(13), "ts", ["event_type"], "value").collect()))
    assert a == b  # bit-exact: every cross-row aggregate is decimal
