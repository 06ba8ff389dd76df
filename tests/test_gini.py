"""gini_coefficient (quality.py) — tie-correct concentration: pinned
against the pairwise |xi−xj|/(2n²μ) definition, the classic identities
(equal -> 0, one-holds-all -> (n−1)/n, scale invariance), and the house
NULL/NaN/negative contracts."""
from __future__ import annotations

import pytest

from goetl_spark.quality import gini_coefficient

GRID = 2e-9  # documented <= 1e-9 floor understatement per group


def ref_gini(xs):
    n = len(xs)
    mu = sum(xs) / n
    if mu == 0:
        return None
    return sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * mu)


def _gini(spark, xs, typ="double"):
    df = spark.createDataFrame([(x,) for x in xs], f"v {typ}")
    return gini_coefficient(df, "v").collect()[0]


def test_matches_pairwise_reference_with_ties_and_zero(spark):
    xs = [1.0, 1.0, 3.0, 5.0, 10.0, 0.0, 2.5]
    row = _gini(spark, xs)
    assert row["n"] == 7
    assert row["gini"] == pytest.approx(ref_gini(xs), abs=GRID)


def test_equal_zero_and_one_holds_all(spark):
    assert _gini(spark, [4.0] * 6)["gini"] == 0.0
    # one positive among n: G = (n-1)/n
    assert _gini(spark, [0.0] * 4 + [9.0])["gini"] == \
        pytest.approx(0.8, abs=GRID)


def test_scale_invariance(spark):
    xs = [1.0, 2.0, 2.0, 7.0, 11.0]
    assert _gini(spark, xs)["gini"] == pytest.approx(
        _gini(spark, [8 * x for x in xs])["gini"], abs=GRID)


def test_grouped_allzero_null_and_null_excluded(spark):
    rows = ([("a", 1.0), ("a", 3.0), ("a", None),
             ("z", 0.0), ("z", 0.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           gini_coefficient(df, "v", ["g"]).collect()}
    assert got["a"]["n"] == 2
    assert got["a"]["gini"] == pytest.approx(ref_gini([1.0, 3.0]), abs=GRID)
    assert got["z"]["gini"] is None


def test_negative_and_nan_raise_empty_ok(spark):
    for bad in (-1.0, float("nan")):
        df = spark.createDataFrame([(1.0,), (bad,)], "v double")
        with pytest.raises(Exception, match="gini_coefficient"):
            gini_coefficient(df, "v").collect()
    e = spark.createDataFrame([], "v double")
    assert gini_coefficient(e, "v").collect() == []


def test_integer_axis_exact(spark):
    xs = [10, 20, 20, 50]
    row = _gini(spark, xs, "long")
    assert row["gini"] == pytest.approx(ref_gini(xs), abs=GRID)
