"""regression_metrics (operators/classifier.py) — the continuous-target
eval leg: values pinned against a pure-Python reference, the house NULL
/NaN loud-failure contract, grouped/whole-frame parity, and the
degenerate conventions (constant label -> r2 NULL, empty in -> empty
out)."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.classifier import regression_metrics


def _py_metrics(pairs):
    """Pure-Python reference (exact fractions are overkill here: the
    fixture values are small binary-exact doubles, so plain float math
    IS the exact answer)."""
    n = len(pairs)
    errs = [f - y for y, f in pairs]
    mae = sum(abs(e) for e in errs) / n
    bias = sum(errs) / n
    rmse = math.sqrt(sum(e * e for e in errs) / n)
    sy = sum(y for y, _ in pairs)
    syy = sum(y * y for y, _ in pairs)
    ss_tot = n * syy - sy * sy
    r2 = None if ss_tot <= 0 else 1.0 - n * sum(e * e for e in errs) / ss_tot
    return mae, bias, rmse, r2


def test_values_match_reference(spark):
    pairs = [(1.0, 1.5), (2.0, 1.75), (4.0, 3.0), (0.5, 1.0), (3.0, 3.0)]
    df = spark.createDataFrame(pairs, "y double, f double")
    # moment_scale=6: the default scale-1 shrink is a deliberate
    # coarsening that only vanishes at scale (sums >> 0.05); at n=5 it
    # would round the tiny moment sums visibly
    row = regression_metrics(df, "y", "f", moment_scale=6).collect()[0]
    mae, bias, rmse, r2 = _py_metrics(pairs)
    assert row["n"] == 5
    assert row["mae"] == pytest.approx(mae, abs=1e-9)
    assert row["bias"] == pytest.approx(bias, abs=1e-9)
    assert row["rmse"] == pytest.approx(rmse, abs=1e-9)
    assert row["r2"] == pytest.approx(r2, abs=1e-9)


def test_grouped_matches_per_group_wholeframe(spark):
    rows = [("a", 1.0, 2.0), ("a", 2.0, 2.5), ("a", 5.0, 4.0),
            ("b", 10.0, 9.0), ("b", 12.0, 13.5), ("b", 11.0, 11.0),
            (None, 3.0, 4.0), (None, 6.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, y double, f double")
    got = {r["g"]: r for r in
           regression_metrics(df, "y", "f", ["g"]).collect()}
    assert set(got) == {"a", "b", None}
    for g in ("a", "b", None):
        sub = regression_metrics(
            df.filter(F.col("g").eqNullSafe(F.lit(g))), "y", "f"
        ).collect()[0]
        for m in ("n", "mae", "bias", "rmse", "r2"):
            assert got[g][m] == pytest.approx(sub[m], abs=1e-9), (g, m)


def test_constant_label_r2_null_other_metrics_live(spark):
    df = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 3.0), (2.0, 2.0)], "y double, f double")
    row = regression_metrics(df, "y", "f").collect()[0]
    assert row["r2"] is None
    assert row["mae"] == pytest.approx(2.0 / 3.0)
    assert row["bias"] == pytest.approx(0.0)


def test_null_and_nan_raise(spark):
    for bad in [(None, 1.0), (1.0, None), (float("nan"), 1.0),
                (1.0, float("nan"))]:
        df = spark.createDataFrame(
            [(1.0, 1.0), bad], "y double, f double")
        with pytest.raises(Exception, match="regression_metrics"):
            regression_metrics(df, "y", "f").collect()


def test_grouped_bad_rows_raise_even_if_other_groups_clean(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", None, 2.0)], "g string, y double, f double")
    with pytest.raises(Exception, match="regression_metrics"):
        regression_metrics(df, "y", "f", ["g"]).collect()


def test_empty_input_empty_output(spark):
    df = spark.createDataFrame([], "y double, f double")
    assert regression_metrics(df, "y", "f").collect() == []
    df2 = spark.createDataFrame([], "g string, y double, f double")
    assert regression_metrics(df2, "y", "f", ["g"]).collect() == []


def test_perfect_prediction(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (7.5, 7.5)], "y double, f double")
    row = regression_metrics(df, "y", "f").collect()[0]
    assert row["mae"] == 0.0 and row["rmse"] == 0.0 and row["bias"] == 0.0
    assert row["r2"] == pytest.approx(1.0)


def test_moment_scale_dial_for_tiny_errors(spark):
    # errors ~1e-4: scale-1 sums collapse to 0 -> mae 0; scale 6 resolves
    pairs = [(0.0001 * i, 0.0001 * i + 0.0002) for i in range(10)]
    df = spark.createDataFrame(pairs, "y double, f double")
    coarse = regression_metrics(df, "y", "f").collect()[0]
    fine = regression_metrics(df, "y", "f", moment_scale=6).collect()[0]
    assert coarse["mae"] == 0.0
    assert fine["mae"] == pytest.approx(0.0002, rel=1e-6)
