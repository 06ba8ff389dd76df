"""Funnel + cohort retention semantics tests (operators/behavior.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators.behavior import (
    cohort_retention, funnel_counts, funnel_user_times)


def _ev(spark, rows):
    df = spark.createDataFrame(
        [Row(u=u, ts=ts, t=t) for u, ts, t in rows],
        "u int, ts string, t string")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_strict_ordering_and_dropoffs(spark):
    rows = [
        # u1 completes in order
        (1, "2024-01-01 00:00:00", "A"),
        (1, "2024-01-02 00:00:00", "B"),
        (1, "2024-01-03 00:00:00", "C"),
        # u2: B BEFORE first A — that B must not count; no later B
        (2, "2024-01-01 00:00:00", "B"),
        (2, "2024-01-02 00:00:00", "A"),
        (2, "2024-01-03 00:00:00", "C"),
        # u3: A then B, never C
        (3, "2024-01-01 00:00:00", "A"),
        (3, "2024-01-05 00:00:00", "B"),
        # u4: never enters (C only)
        (4, "2024-01-01 00:00:00", "C"),
    ]
    out = {r.stage: r for r in funnel_counts(
        _ev(spark, rows), "u", "ts", "t", ["A", "B", "C"]).collect()}
    assert out["A"].users == 3          # u1, u2, u3
    assert out["B"].users == 2          # u1, u3 (u2's B predates its A)
    assert out["C"].users == 1          # u1 only (u3 dropped; u2 has no B)
    assert out["A"].conversion == 1.0
    assert out["C"].conversion == pytest.approx(1 / 3)


def test_funnel_within_bound_measured_from_stage1(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "A"),
        (1, "2024-01-01 01:00:00", "B"),   # inside 2h of t1
        (2, "2024-01-01 00:00:00", "A"),
        (2, "2024-01-01 03:00:00", "B"),   # outside 2h of t1
    ]
    t = {r.u: r for r in funnel_user_times(
        _ev(spark, rows), "u", "ts", "t", ["A", "B"],
        within_seconds=7200).collect()}
    assert t[1].t2 is not None
    assert t[2].t2 is None


def test_funnel_tie_timestamp_not_counted(spark):
    # strictly-after: a stage-2 event at exactly t1 does not convert
    rows = [(1, "2024-01-01 00:00:00", "A"), (1, "2024-01-01 00:00:00", "B")]
    t = funnel_user_times(_ev(spark, rows), "u", "ts", "t", ["A", "B"]).collect()
    assert t[0].t2 is None


def test_cohort_retention_matrix(spark):
    rows = [
        # cohort of Mon 2024-01-01 week: u1 active weeks 0,1,2; u2 weeks 0,2
        (1, "2024-01-02 10:00:00", "x"),
        (1, "2024-01-09 10:00:00", "x"),
        (1, "2024-01-16 10:00:00", "x"),
        (2, "2024-01-03 10:00:00", "x"),
        (2, "2024-01-17 10:00:00", "x"),
        # later cohort: u3 first seen the following week
        (3, "2024-01-10 10:00:00", "x"),
    ]
    out = cohort_retention(_ev(spark, rows), "u", "ts").collect()
    cell = {(str(r.cohort)[:10], r.period_offset): r for r in out}
    assert cell[("2024-01-01", 0)].n_users == 2
    assert cell[("2024-01-01", 1)].n_users == 1
    assert cell[("2024-01-01", 2)].n_users == 2
    assert cell[("2024-01-01", 1)].retention == 0.5
    assert cell[("2024-01-08", 0)].n_users == 1
    assert all(r.cohort_size in (1, 2) for r in out)


def test_funnel_requires_two_stages(spark):
    with pytest.raises(ValueError):
        funnel_user_times(_ev(spark, []), "u", "ts", "t", ["A"])


def test_cohort_period_days_derived_and_validated(spark):
    # (period='day', period_days=7) would map 7 daily periods onto one
    # offset and count users twice per cell (r6 advisor) — must raise.
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-03 00:00:00")],
        "user string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="period_days"):
        cohort_retention(df, "user", "ts", period="day", period_days=7)
    # derived default: period='day' → period_days=1
    out = {(str(r.cohort), r.period_offset): r.n_users
           for r in cohort_retention(df, "user", "ts", period="day").collect()}
    assert out[("2024-01-01 00:00:00", 0)] == 1
    assert out[("2024-01-01 00:00:00", 2)] == 1


def _attr_events(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: two touches -> purchase, one touch -> purchase, trailing touch
        (1, t0 + 1 * s, "view", 101),
        (1, t0 + 2 * s, "click", 102),
        (1, t0 + 3 * s, "purchase", 103),
        (1, t0 + 4 * s, "view", 104),
        (1, t0 + 6 * s, "purchase", 105),
        (1, t0 + 10 * s, "view", 106),       # after last conversion
        # user 2: conversion with no touches
        (2, t0, "purchase", 201),
        # user 3: touch far before conversion (lookback test)
        (3, t0, "view", 301),
        (3, t0 + 100 * s, "purchase", 302),
        # user 4: four touches then one purchase (position model)
        (4, t0 + 1 * s, "view", 401),
        (4, t0 + 2 * s, "click", 402),
        (4, t0 + 3 * s, "view", 403),
        (4, t0 + 4 * s, "click", 404),
        (4, t0 + 5 * s, "purchase", 405),
        # noise type never in the model
        (1, t0 + 2 * s, "error", 999),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int")


def test_attribution_linear_and_lookback(spark):
    from goetl_spark.operators.behavior import attribution_credit

    ev = _attr_events(spark)
    out = attribution_credit(ev, "user_id", "ts", "event_type",
                             "purchase", ["view", "click"],
                             model="linear")
    got = {(r["user_id"], r["conv_id"], r["touch_id"]): r["credit"]
           for r in out.collect()}
    assert got[(1, 103, 101)] == 0.5 and got[(1, 103, 102)] == 0.5
    assert got[(1, 105, 104)] == 1.0
    assert (1, None, 106) not in got          # trailing touch dropped
    assert not any(u == 2 for u, _, _ in got)  # touchless conversion
    assert got[(3, 302, 301)] == 1.0           # no lookback -> credited
    # per-conversion credits sum to 1.0
    import collections
    sums = collections.Counter()
    for (_, conv, _), c in got.items():
        sums[conv] += c
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())

    within = attribution_credit(ev, "user_id", "ts", "event_type",
                                "purchase", ["view", "click"],
                                model="linear", lookback_seconds=50)
    got2 = {(r["user_id"], r["touch_id"]) for r in within.collect()}
    assert (3, 301) not in got2 and (1, 101) in got2


def test_attribution_first_last_position(spark):
    from goetl_spark.operators.behavior import attribution_credit

    ev = _attr_events(spark)
    first = {(r["conv_id"], r["touch_id"]): r["credit"]
             for r in attribution_credit(
                 ev, "user_id", "ts", "event_type", "purchase",
                 ["view", "click"], model="first").collect()}
    assert first[(103, 101)] == 1.0 and (103, 102) not in first
    last = {(r["conv_id"], r["touch_id"]): r["credit"]
            for r in attribution_credit(
                ev, "user_id", "ts", "event_type", "purchase",
                ["view", "click"], model="last").collect()}
    assert last[(103, 102)] == 1.0 and (103, 101) not in last

    pos = {r["touch_id"]: r["credit"]
           for r in attribution_credit(
               ev, "user_id", "ts", "event_type", "purchase",
               ["view", "click"], model="position").collect()
           if r["user_id"] == 4}
    assert pos[401] == 0.4 and pos[404] == 0.4
    assert abs(pos[402] - 0.1) < 1e-12 and abs(pos[403] - 0.1) < 1e-12
    # two-touch conversion -> 0.5/0.5; one-touch -> 1.0
    pos1 = {r["touch_id"]: r["credit"]
            for r in attribution_credit(
                ev, "user_id", "ts", "event_type", "purchase",
                ["view", "click"], model="position").collect()
            if r["user_id"] == 1}
    assert pos1[101] == 0.5 and pos1[102] == 0.5 and pos1[104] == 1.0


def test_attribution_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.behavior import attribution_credit

    ev = _attr_events(spark)
    with _pytest.raises(ValueError):
        attribution_credit(ev, "user_id", "ts", "event_type",
                           "purchase", [], model="linear")
    with _pytest.raises(ValueError):
        attribution_credit(ev, "user_id", "ts", "event_type",
                           "purchase", ["view"], model="bogus")
    with _pytest.raises(ValueError):
        attribution_credit(ev, "user_id", "ts", "event_type",
                           "purchase", ["purchase", "view"])


def test_transition_matrix_hand_computed(spark):
    import datetime as dt

    from goetl_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a -> c ; user 2: a -> b ; user 3: lone event
        (1, t0, 1, "a"), (1, t0.replace(hour=1), 2, "b"),
        (1, t0.replace(hour=2), 3, "a"), (1, t0.replace(hour=3), 4, "c"),
        (2, t0, 5, "a"), (2, t0.replace(hour=1), 6, "b"),
        (3, t0, 7, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r["src"], r["dst"]): r for r in
           transition_matrix(df, "user_id", "ts", "event_type",
                             order_cols=["event_id"]).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert got[("a", "b")]["n"] == 2 and got[("a", "b")]["n_src_total"] == 3
    assert got[("a", "b")]["p"] == 2 / 3
    assert got[("a", "c")]["p"] == 1 / 3
    assert got[("b", "a")]["p"] == 1.0  # user 2's final b emits nothing
    # a user's last event never appears as a src; lone users contribute 0
    assert not any(s == "c" for s, _ in got)


def test_transition_matrix_null_state_vs_stream_end(spark):
    import datetime as dt

    from goetl_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "a"), (1, t0.replace(hour=1), 2, None),
            (1, t0.replace(hour=2), 3, "b")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r["src"], r["dst"]): r["p"] for r in
           transition_matrix(df, "user_id", "ts", "event_type",
                             order_cols=["event_id"]).collect()}
    # NULL is a real state on both sides, distinct from end-of-stream
    assert got == {("a", None): 1.0, (None, "b"): 1.0}


def test_transition_matrix_partition_independence(spark):
    import datetime as dt

    from goetl_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(minutes=i), u * 100 + i,
             "abcd"[(u + i) % 4])
            for u in range(20) for i in range(15)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    one = sorted(map(tuple, transition_matrix(
        df, "user_id", "ts", "event_type", ["event_id"]).collect()))
    two = sorted(map(tuple, transition_matrix(
        df.repartition(17), "user_id", "ts", "event_type",
        ["event_id"]).collect()))
    assert one == two


# --------------------------------------------------- two-proportion test

def test_two_proportion_textbook_and_sign(spark):
    import math

    import pytest

    from goetl_spark.operators.behavior import two_proportion_test

    rows = ([("a", 1.0)] * 30 + [("a", 0.0)] * 70
            + [("b", 1.0)] * 45 + [("b", 0.0)] * 55)
    df = spark.createDataFrame(rows, "g string, s double")
    r = two_proportion_test(df, "g", "s").collect()[0]
    p = 75 / 200
    want = (0.30 - 0.45) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert (r["group_a"], r["group_b"], r["n_a"], r["n_b"]) == \
        ("a", "b", 100, 100)
    assert r["rate_a"] == 0.3 and r["rate_b"] == 0.45
    assert r["z"] == pytest.approx(want, abs=1e-12)
    assert r["z"] < -1.96  # a is significantly WORSE, sign carries it


def test_two_proportion_degenerate_null_success_and_group_count(spark):
    import pytest

    from goetl_spark.operators.behavior import two_proportion_test

    # all-success: zero pooled variance -> z NULL
    d = spark.createDataFrame([("a", 1.0), ("b", 1.0)],
                              "g string, s double")
    assert two_proportion_test(d, "g", "s").collect()[0]["z"] is None
    # NULL success rows are excluded, not failures
    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 0.0)], "g string, s double")
    r = two_proportion_test(d2, "g", "s").collect()[0]
    assert (r["n_a"], r["rate_a"]) == (1, 1.0)
    # group count != 2 raises; NULL group is a real (first) group
    with pytest.raises(ValueError, match="exactly 2 groups"):
        two_proportion_test(
            spark.createDataFrame([("a", 1.0)], "g string, s double"),
            "g", "s")
    with pytest.raises(ValueError, match="exactly 2 groups"):
        two_proportion_test(
            spark.createDataFrame(
                [("a", 1.0), ("b", 1.0), ("c", 0.0)],
                "g string, s double"), "g", "s")
    d3 = spark.createDataFrame([(None, 1.0), ("b", 0.0)],
                               "g string, s double")
    r3 = two_proportion_test(d3, "g", "s").collect()[0]
    assert r3["group_a"] is None and r3["group_b"] == "b"
    # empty
    e = spark.createDataFrame([], "g string, s double")
    assert two_proportion_test(e, "g", "s").collect() == []
    # NaN success raises loudly (family convention) rather than being
    # silently counted as a failure (passes isNotNull, fails s > 0)
    d4 = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("b", 0.0)],
        "g string, s double")
    with pytest.raises(ValueError, match="NaN"):
        two_proportion_test(d4, "g", "s")
