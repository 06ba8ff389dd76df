"""trimmed_mean (operators/groupby.py) — robust location via the
cumsum take-overlap: sorted-slice reference parity across trim levels,
boundary-tie uniqueness, negative means (the sign-split grid), outlier
robustness vs the plain average, guards."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.groupby import trimmed_mean

GRID = 2e-9


def ref(xs, a):
    s = sorted(xs)
    n = len(s)
    k = int(n * a)
    kept = s[k:n - k]
    return sum(kept) / len(kept), len(kept)


def _tm(spark, xs, a):
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    return trimmed_mean(df, "v", trim=a).collect()[0]


def test_matches_sorted_slice_reference_across_levels(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 100.0, -50.0, 5.0, 2.5, 3.5]
    for a in (0.0, 0.1, 0.2, 0.49):
        r = _tm(spark, xs, a)
        want, n_used = ref(xs, a)
        assert r["n_used"] == n_used, a
        assert r["trimmed_mean"] == pytest.approx(want, abs=GRID), a


def test_boundary_ties_and_negative_means(spark):
    # a 4-way tie crosses the trim boundary: interchangeable rows
    ties = [1.0, 1.0, 1.0, 1.0, 9.0]
    r = _tm(spark, ties, 0.2)
    assert (r["n_used"], r["trimmed_mean"]) == (3, 1.0)
    # all-negative values exercise the sign-split DIV path
    neg = [-5.0, -3.0, -100.0, -4.0]
    r2 = _tm(spark, neg, 0.25)
    assert r2["trimmed_mean"] == pytest.approx(-4.5, abs=GRID)


def test_outlier_robustness_vs_plain_average(spark):
    xs = [float(i) for i in range(1, 20)] + [1.0e6]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    tm = trimmed_mean(df, "v", trim=0.1).collect()[0]["trimmed_mean"]
    avg = df.agg(F.avg("v")).collect()[0][0]
    assert abs(tm - 10.5) < 1.0       # near the clean center
    assert avg > 50000                 # the average is gone


def test_grouped_and_null_exclusion(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 300.0), ("a", None),
            ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           trimmed_mean(df, "v", ["g"], trim=0.34).collect()}
    # a: n=3, k=1 -> keeps the middle value only
    assert (got["a"]["n"], got["a"]["n_used"]) == (3, 1)
    assert got["a"]["trimmed_mean"] == pytest.approx(2.0, abs=GRID)
    assert got["b"]["trimmed_mean"] == pytest.approx(5.0, abs=GRID)


def test_guards_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    with pytest.raises(Exception, match="trimmed_mean"):
        trimmed_mean(df, "v").collect()
    with pytest.raises(ValueError, match="trim must be"):
        trimmed_mean(spark.createDataFrame([(1.0,)], "v double"),
                     "v", trim=0.5)
    e = spark.createDataFrame([], "v double")
    assert trimmed_mean(e, "v").collect() == []
