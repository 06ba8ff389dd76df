"""wasserstein_distance (quality.py) — exact 1D earth-mover drift:
values pinned against a pure-Python ECDF-integral reference, the shift
and scaling laws W1(a, a+c) = |c| and W1(k·a, k·b) = k·W1(a, b), NULL
exclusion, NaN loud failure, empty-side NULL, and the grouped path."""
from __future__ import annotations

import bisect

import pytest
from pyspark.sql import functions as F

from goetl_spark.quality import wasserstein_distance

GRID = 1e-6  # assertions allow the documented <= k*1e-9*range floor slack


def ref_w1(a, b):
    vals = sorted(set(a) | set(b))
    sa, sb = sorted(a), sorted(b)
    w = 0.0
    for i in range(len(vals) - 1):
        fa = bisect.bisect_right(sa, vals[i]) / len(a)
        fb = bisect.bisect_right(sb, vals[i]) / len(b)
        w += abs(fa - fb) * (vals[i + 1] - vals[i])
    return w


def _w1(spark, a, b, typ="long"):
    da = spark.createDataFrame([(x,) for x in a], f"v {typ}")
    db = spark.createDataFrame([(x,) for x in b], f"v {typ}")
    return wasserstein_distance(da, db, "v").collect()[0]


def test_matches_reference_unequal_sizes(spark):
    a = [1, 2, 2, 5, 9, 14]
    b = [2, 3, 3, 7, 9]
    row = _w1(spark, a, b)
    assert row["n_a"] == 6 and row["n_b"] == 5
    assert row["w1"] == pytest.approx(ref_w1(a, b), abs=GRID)


def test_shift_law(spark):
    a = [1, 4, 4, 9, 20]
    for c in (3, 17):
        row = _w1(spark, a, [x + c for x in a])
        assert row["w1"] == pytest.approx(float(c), abs=GRID)


def test_scaling_law(spark):
    a, b = [1, 2, 6, 7], [2, 2, 5, 11, 13]
    base = _w1(spark, a, b)["w1"]
    scaled = _w1(spark, [5 * x for x in a], [5 * x for x in b])["w1"]
    assert scaled == pytest.approx(5 * base, abs=GRID)


def test_identical_zero_and_double_axis(spark):
    a = [0.25, 1.5, 1.5, 3.75]
    assert _w1(spark, a, a, "double")["w1"] == 0.0
    got = _w1(spark, a, [x + 0.5 for x in a], "double")["w1"]
    assert got == pytest.approx(0.5, abs=GRID)


def test_nulls_excluded_nan_raises(spark):
    da = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    db = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    row = wasserstein_distance(da, db, "v").collect()[0]
    assert row["n_a"] == 2 and row["w1"] == 0.0
    dn = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    with pytest.raises(Exception, match="wasserstein_distance"):
        wasserstein_distance(dn, db, "v").collect()


def test_grouped_empty_side_null_and_per_group_match(spark):
    # g3 is one-sided with a SINGLE value (NULL-lead masks the div);
    # g4 is one-sided with TWO distinct values — its non-NULL lead row
    # evaluates the grid term inside the aggregate, so the term's own
    # (__na > 0) AND (__nb > 0) guard must keep the decimal DIV's
    # denominator nonzero (ANSI DIVIDE_BY_ZERO regression, r15 ADVICE)
    a = [("g1", 1), ("g1", 5), ("g2", 2), ("g2", 2), ("g3", 7),
         ("g4", 1), ("g4", 4)]
    b = [("g1", 3), ("g1", 5), ("g2", 2), ("g2", 9)]
    da = spark.createDataFrame(a, "g string, v long")
    db = spark.createDataFrame(b, "g string, v long")
    got = {r["g"]: r for r in
           wasserstein_distance(da, db, "v", ["g"]).collect()}
    assert got["g3"]["w1"] is None and got["g3"]["n_b"] == 0
    assert got["g4"]["w1"] is None and got["g4"]["n_b"] == 0
    assert got["g4"]["n_a"] == 2
    for g in ("g1", "g2"):
        ra = [v for gg, v in a if gg == g]
        rb = [v for gg, v in b if gg == g]
        assert got[g]["w1"] == pytest.approx(ref_w1(ra, rb), abs=GRID), g


def test_empty_both_sides_empty_output(spark):
    e = spark.createDataFrame([], "v long")
    assert wasserstein_distance(e, e, "v").collect() == []
