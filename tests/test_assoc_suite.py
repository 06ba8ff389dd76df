"""spearman_corr (stats.py) + anova_oneway (quality.py) — the monotone
num×num and cat×num legs of the association suite: pinned against
pure-Python references, house NULL/NaN contracts, degenerate
conventions, grouped paths."""
from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from goetl_spark.quality import anova_oneway
from goetl_spark.stats import spearman_corr


def ref_spearman(xs, ys):
    def ranks(v):
        s = sorted(v)
        import bisect
        return [(bisect.bisect_left(s, t) + 1
                 + bisect.bisect_right(s, t)) / 2 for t in v]
    rx, ry = ranks(xs), ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    da, db = n * sxx - sx * sx, n * syy - sy * sy
    if da <= 0 or db <= 0:
        return None
    return (n * sxy - sx * sy) / (math.sqrt(da) * math.sqrt(db))


def ref_anova(rows):
    by = defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    n = sum(len(v) for v in by.values())
    k = len(by)
    mean = sum(sum(v) for v in by.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2 for v in by.values())
    sst = sum((x - mean) ** 2 for v in by.values() for x in v)
    eta2 = ssb / sst if sst > 0 else None
    f = ((ssb / (k - 1)) / ((sst - ssb) / (n - k))
         if k >= 2 and n > k and sst > ssb else None)
    return n, k, eta2, f


# ---------------------------------------------------------------- spearman

def test_spearman_matches_reference_with_ties(spark):
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    ys = [2.0, 7.0, 1.0, 8.0, 2.0, 0.1, 8.0, 2.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = spearman_corr(df, "x", "y").collect()[0]
    assert row["n"] == 8
    assert row["rho"] == pytest.approx(ref_spearman(xs, ys), abs=1e-12)


def test_spearman_monotone_nonlinear_is_one(spark):
    df = spark.createDataFrame(
        [(float(i), float(i ** 3)) for i in range(1, 10)],
        "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == \
        pytest.approx(1.0, abs=1e-12)


def test_spearman_outlier_robust_vs_pearson_shape(spark):
    # an extreme pair saturates Pearson but moves rho only one rank step
    base = [(float(i), float(i)) for i in range(1, 20)]
    df = spark.createDataFrame(base + [(1000.0, -1000.0)],
                               "x double, y double")
    rho = spearman_corr(df, "x", "y").collect()[0]["rho"]
    xs = [x for x, _ in base] + [1000.0]
    ys = [y for _, y in base] + [-1000.0]
    assert rho == pytest.approx(ref_spearman(xs, ys), abs=1e-12)
    assert rho > 0.4  # one bad pair does not flip a monotone relation


def test_spearman_grouped_constant_null_and_null_group(spark):
    rows = ([("a", float(i), float(10 - i)) for i in range(5)]
            + [("b", float(i), 7.0) for i in range(4)]
            + [(None, float(i), float(i * 2)) for i in range(3)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in spearman_corr(df, "x", "y", ["g"]).collect()}
    assert got["a"]["rho"] == pytest.approx(-1.0, abs=1e-12)
    assert got["b"]["rho"] is None          # constant y: undefined
    assert got[None]["rho"] == pytest.approx(1.0, abs=1e-12)


def test_spearman_null_pair_excluded_nan_raises(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (3.0, 2.0)],
        "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["n"] == 2
    dn = spark.createDataFrame(
        [(1.0, 1.0), (float("nan"), 2.0)], "x double, y double")
    with pytest.raises(Exception, match="spearman_corr"):
        spearman_corr(dn, "x", "y").collect()


def test_spearman_empty(spark):
    e = spark.createDataFrame([], "x double, y double")
    assert spearman_corr(e, "x", "y").collect() == []


# ------------------------------------------------------------------ anova

def test_anova_matches_reference(spark):
    rows = [("a", 1.25), ("a", 2.5), ("a", 2.0), ("b", 5.0), ("b", 6.25),
            ("b", 4.75), ("c", 2.0), ("c", 3.5), ("c", 3.0), ("c", 2.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    row = anova_oneway(df, "v", "g").collect()[0]
    n, k, eta2, f = ref_anova(rows)
    assert (row["n"], row["k"]) == (n, k)
    # documented 1e-9 eta grid; F inherits the floored eta9
    assert row["eta2"] == pytest.approx(eta2, abs=2e-9)
    assert row["f_stat"] == pytest.approx(f, rel=1e-7)


def test_anova_null_group_is_class_null_value_excluded(spark):
    rows = [(None, 1.0), (None, 2.0), ("x", 3.0), ("x", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    row = anova_oneway(df, "v", "g").collect()[0]
    assert (row["n"], row["k"]) == (3, 2)
    assert row["eta2"] == pytest.approx(0.75, abs=2e-9)


def test_anova_degenerates(spark):
    # constant values: zero total variance -> NULLs
    df = spark.createDataFrame([("a", 2.0), ("b", 2.0)], "g string, v double")
    row = anova_oneway(df, "v", "g").collect()[0]
    assert row["eta2"] is None and row["f_stat"] is None
    # single class -> NULLs
    df1 = spark.createDataFrame([("a", 1.0), ("a", 5.0)], "g string, v double")
    row1 = anova_oneway(df1, "v", "g").collect()[0]
    assert row1["k"] == 1 and row1["eta2"] is None
    # perfect separation with n == k (one row per class) -> F NULL
    df2 = spark.createDataFrame([("a", 1.0), ("b", 5.0)], "g string, v double")
    row2 = anova_oneway(df2, "v", "g").collect()[0]
    assert row2["f_stat"] is None
    # empty
    e = spark.createDataFrame([], "g string, v double")
    assert anova_oneway(e, "v", "g").collect() == []


def test_anova_nan_raises(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan"))], "g string, v double")
    with pytest.raises(ValueError, match="anova_oneway"):
        anova_oneway(df, "v", "g")


def test_anova_eta_bounds_and_strong_effect(spark):
    # far-separated tight clusters: eta2 near 1, F large
    rows = ([("lo", 1.0 + 0.01 * i) for i in range(10)]
            + [("hi", 100.0 + 0.01 * i) for i in range(10)])
    df = spark.createDataFrame(rows, "g string, v double")
    row = anova_oneway(df, "v", "g").collect()[0]
    assert 0.999 < row["eta2"] <= 1.0
    assert row["f_stat"] > 1000


# --------------------------------------------------------- kruskal-wallis

def test_kw_matches_scipy_form_reference(spark):
    from goetl_spark.quality import kruskal_wallis

    # hand data with ties across groups
    rows = [("a", 1.0), ("a", 3.0), ("a", 3.0), ("b", 2.0), ("b", 5.0),
            ("b", 5.0), ("c", 4.0), ("c", 6.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]

    # pure-python tie-corrected KW via ANOVA-on-midranks identity
    import bisect
    vals = [v for _, v in rows]
    s = sorted(vals)
    ranks = [(bisect.bisect_left(s, v) + 1 + bisect.bisect_right(s, v)) / 2
             for v in vals]
    groups = {}
    for (g, _), rk in zip(rows, ranks):
        groups.setdefault(g, []).append(rk)
    n = len(rows)
    mean = sum(ranks) / n
    ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2
              for v in groups.values())
    sst = sum((x - mean) ** 2 for x in ranks)
    want_eta = ssb / sst
    assert (r["n"], r["k"]) == (9, 3)
    assert r["eta2_rank"] == pytest.approx(want_eta, abs=2e-9)
    assert r["h_stat"] == pytest.approx((n - 1) * want_eta, rel=1e-6)


def test_kw_outlier_robust_vs_anova(spark):
    from goetl_spark.quality import anova_oneway, kruskal_wallis

    # clear group shift + one absurd outlier in group a
    rows = ([("a", float(i)) for i in range(10)]
            + [("b", float(i + 5)) for i in range(10)]
            + [("a", 1.0e6)])
    df = spark.createDataFrame(rows, "g string, v double")
    kw = kruskal_wallis(df, "v", "g").collect()[0]
    an = anova_oneway(df, "v", "g").collect()[0]
    # the outlier floods ANOVA's SST (eta2 collapses toward 0) but
    # shifts KW by a single rank step
    assert kw["eta2_rank"] > 5 * an["eta2"]


def test_kw_degenerates_and_guards(spark):
    from goetl_spark.quality import kruskal_wallis

    # all-tied values: zero rank variance -> NULLs
    df = spark.createDataFrame(
        [("a", 2.0), ("b", 2.0), ("b", 2.0)], "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["eta2_rank"] is None and r["h_stat"] is None
    # NaN raises; NULL values excluded
    dn = spark.createDataFrame(
        [("a", 1.0), ("b", float("nan"))], "g string, v double")
    with pytest.raises(ValueError, match="kruskal_wallis"):
        kruskal_wallis(dn, "v", "g")
    dnull = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)], "g string, v double")
    assert kruskal_wallis(dnull, "v", "g").collect()[0]["n"] == 2
    e = spark.createDataFrame([], "g string, v double")
    assert kruskal_wallis(e, "v", "g").collect() == []
