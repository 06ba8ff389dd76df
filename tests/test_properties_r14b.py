"""Property-based tests for the second r14 session's family
(hypothesis, Spark-backed with capped examples — the
test_properties_r14.py convention): W1 metric laws (identity,
symmetry, triangle inequality, shift equivariance), Spearman
monotone-transform invariance + bounds + anti-symmetry under
negation, regression-metric inequalities (|bias| <= MAE <= RMSE,
R² <= 1), ANOVA η² bounds + group-relabeling invariance, and Gini
bounds + replication invariance."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_vals = st.lists(st.integers(min_value=-40, max_value=40),
                 min_size=2, max_size=40)
_pos = st.lists(st.integers(min_value=0, max_value=40),
                min_size=2, max_size=40)
GRID = 1e-6


def _df(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


@settings(**_SETTINGS)
@given(_vals, _vals, _vals)
def test_w1_metric_laws(spark, a, b, c):
    from goetl_spark.quality import wasserstein_distance as w1

    A, B, C = _df(spark, a), _df(spark, b), _df(spark, c)
    assert w1(A, A, "v").collect()[0]["w1"] == 0.0          # identity
    ab = w1(A, B, "v").collect()[0]["w1"]
    ba = w1(B, A, "v").collect()[0]["w1"]
    assert abs(ab - ba) <= GRID                              # symmetry
    ac = w1(A, C, "v").collect()[0]["w1"]
    cb = w1(C, B, "v").collect()[0]["w1"]
    assert ab <= ac + cb + GRID                              # triangle
    # shift equivariance: translating BOTH sides leaves W1 unchanged
    A7 = _df(spark, [x + 7 for x in a])
    B7 = _df(spark, [x + 7 for x in b])
    assert abs(w1(A7, B7, "v").collect()[0]["w1"] - ab) <= GRID


_pairs = st.lists(
    st.tuples(st.integers(min_value=-20, max_value=20),
              st.integers(min_value=-20, max_value=20)),
    min_size=3, max_size=40)


@settings(**_SETTINGS)
@given(_pairs)
def test_spearman_invariance_bounds_antisymmetry(spark, pairs):
    from pyspark.sql import functions as F

    from goetl_spark.stats import spearman_corr

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double")
    rho = spearman_corr(df, "x", "y").collect()[0]["rho"]
    if rho is None:          # a constant column — nothing further to law
        return
    assert -1.0 - 1e-12 <= rho <= 1.0 + 1e-12
    # rank-based: strictly increasing transform of x is a no-op
    tx = df.withColumn("x", F.col("x") * 3 + 1)
    assert spearman_corr(tx, "x", "y").collect()[0]["rho"] == rho
    # negating y exactly negates rho (rank reversal)
    ny = df.withColumn("y", -F.col("y"))
    assert spearman_corr(ny, "x", "y").collect()[0]["rho"] == \
        __import__("pytest").approx(-rho, abs=1e-12)


@settings(**_SETTINGS)
@given(_pairs)
def test_regression_metric_inequalities(spark, pairs):
    import math

    from goetl_spark.operators.classifier import regression_metrics

    df = spark.createDataFrame(
        [(float(y), float(f)) for y, f in pairs], "y double, f double")
    r = regression_metrics(df, "y", "f", moment_scale=6).collect()[0]
    slack = 1e-6
    assert abs(r["bias"]) <= r["mae"] + slack        # |mean e| <= mean |e|
    assert r["mae"] <= r["rmse"] + slack             # Jensen
    if r["r2"] is not None:
        assert r["r2"] <= 1.0 + 1e-12
        # R² == 1 - SS_res/SS_tot: cross-check against rmse & label var
        ys = [y for y, _ in pairs]
        n = len(ys)
        var = sum(y * y for y in ys) - sum(ys) ** 2 / n
        if var > 1e-9:
            want = 1.0 - (r["rmse"] ** 2 * n) / var
            assert r["r2"] == __import__("pytest").approx(want, abs=1e-3)


_grows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-20, max_value=20)),
    min_size=4, max_size=40)


@settings(**_SETTINGS)
@given(_grows)
def test_anova_eta_bounds_and_relabel_invariance(spark, rows):
    from goetl_spark.quality import anova_oneway

    data = [(f"g{g}", float(v)) for g, v in rows]
    df = spark.createDataFrame(data, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    if r["eta2"] is not None:
        assert -1e-12 <= r["eta2"] <= 1.0 + 1e-12
        # class labels are nominal: any bijective relabeling is a no-op
        df2 = spark.createDataFrame(
            [("L" + g[::-1], v) for g, v in data], "g string, v double")
        r2 = anova_oneway(df2, "v", "g").collect()[0]
        assert (r2["n"], r2["k"], r2["eta2"], r2["f_stat"]) == \
            (r["n"], r["k"], r["eta2"], r["f_stat"])
    if r["f_stat"] is not None:
        assert r["f_stat"] >= 0.0


@settings(**_SETTINGS)
@given(_pos)
def test_gini_bounds_and_replication_invariance(spark, xs):
    from goetl_spark.quality import gini_coefficient

    r = gini_coefficient(_df(spark, xs), "v").collect()[0]
    if r["gini"] is None:    # all-zero sample
        return
    n = len(xs)
    assert -1e-12 <= r["gini"] <= (n - 1) / n + 1e-12
    # population Gini is replication-invariant: doubling every row
    # (2n rows, same shares) leaves it unchanged on the exact grid
    r2 = gini_coefficient(_df(spark, xs + xs), "v").collect()[0]
    assert abs(r2["gini"] - r["gini"]) <= GRID
