"""cohens_kappa + top_share (quality.py) — chance-corrected agreement
and tie-safe head concentration: textbook fixtures, identities, and
the house NULL/NaN/negative contracts."""
from __future__ import annotations

import pytest

from goetl_spark.quality import cohens_kappa, top_share

GRID = 2e-9


# ------------------------------------------------------------------ kappa

def test_kappa_textbook_2x2(spark):
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # po = 35/50, pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    assert (r["n"], r["po"], r["pe"]) == (50, 0.7, 0.5)
    assert r["kappa"] == pytest.approx(0.4, abs=GRID)


def test_kappa_perfect_including_null_class(spark):
    rows = [("x", "x")] * 3 + [(None, None)] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 1.0 and r["kappa"] == 1.0


def test_kappa_null_vs_value_disagrees(spark):
    df = spark.createDataFrame(
        [("x", None), (None, "x")], "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["po"] == 0.0


def test_kappa_degenerate_and_bounds(spark):
    # both raters constant: pe = 1 -> undefined
    df = spark.createDataFrame([("k", "k")] * 4, "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] is None
    # systematic disagreement: kappa = -1 (truncation-vs-floor guard:
    # the negative branch must land exactly, not one grid step off)
    anti = [("y", "n")] * 10 + [("n", "y")] * 10
    df2 = spark.createDataFrame(anti, "a string, b string")
    assert cohens_kappa(df2, "a", "b").collect()[0]["kappa"] == -1.0
    # independent raters: kappa ~ 0
    ind = [(a, b) for a in ("y", "n") for b in ("y", "n") for _ in range(5)]
    df3 = spark.createDataFrame(ind, "a string, b string")
    assert cohens_kappa(df3, "a", "b").collect()[0]["kappa"] == \
        pytest.approx(0.0, abs=GRID)


def test_kappa_empty(spark):
    e = spark.createDataFrame([], "a string, b string")
    assert cohens_kappa(e, "a", "b").collect() == []


# -------------------------------------------------------------- top_share

def ref_share(xs, k):
    s = sorted(xs, reverse=True)
    return sum(s[:k]) / sum(xs) if sum(xs) else None


def test_top_share_matches_reference_across_k(spark):
    xs = [10.0, 5.0, 5.0, 5.0, 1.0, 0.5, 0.0]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    for k in (1, 2, 3, 5, 10):
        r = top_share(df, "v", k=k).collect()[0]
        assert r["share"] == pytest.approx(ref_share(xs, k), abs=GRID), k
        assert r["k_eff"] == min(k, len(xs))


def test_top_share_tie_at_boundary_is_unique(spark):
    # k=2 cuts through a 3-way tie: any pick sums the same
    xs = [7.0, 3.0, 3.0, 3.0, 1.0]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    assert top_share(df, "v", k=2).collect()[0]["share"] == \
        pytest.approx(10.0 / 17.0, abs=GRID)


def test_top_share_grouped_allzero_and_saturation(spark):
    rows = [("a", 8.0), ("a", 1.0), ("a", 1.0), ("z", 0.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           top_share(df, "v", ["g"], k=2).collect()}
    assert got["a"]["share"] == pytest.approx(0.9, abs=GRID)
    assert got["z"]["share"] is None
    assert got["z"]["k_eff"] == 1     # saturated: k > n


def test_top_share_guards(spark):
    for bad in (-1.0, float("nan")):
        df = spark.createDataFrame([(1.0,), (bad,)], "v double")
        with pytest.raises(Exception, match="top_share"):
            top_share(df, "v").collect()
    with pytest.raises(ValueError, match="k must be"):
        top_share(spark.createDataFrame([(1.0,)], "v double"), "v", k=0)
    e = spark.createDataFrame([], "v double")
    assert top_share(e, "v").collect() == []


# ----------------------------------------------------------------- mcc

def test_mcc_textbook_binary(spark):
    from goetl_spark.operators.classifier import matthews_corr
    import math
    # tp=20 fn=5 fp=10 tn=15 -> mcc = (20*15-10*5)/sqrt(30*25*25*20)
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = matthews_corr(df, "a", "b").collect()[0]
    want = (20 * 15 - 10 * 5) / math.sqrt(30 * 25) / math.sqrt(25 * 20)
    assert r["mcc"] == pytest.approx(want, abs=1e-12)


def test_mcc_perfect_inverted_constant_empty(spark):
    from goetl_spark.operators.classifier import matthews_corr
    perf = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 2, "a string, b string")
    assert matthews_corr(perf, "a", "b").collect()[0]["mcc"] == \
        pytest.approx(1.0, abs=1e-12)
    inv = spark.createDataFrame(
        [("x", "y")] * 3 + [("y", "x")] * 3, "a string, b string")
    assert matthews_corr(inv, "a", "b").collect()[0]["mcc"] == \
        pytest.approx(-1.0, abs=1e-12)
    const = spark.createDataFrame([("x", "y")] * 4, "a string, b string")
    assert matthews_corr(const, "a", "b").collect()[0]["mcc"] is None
    e = spark.createDataFrame([], "a string, b string")
    assert matthews_corr(e, "a", "b").collect() == []


def test_mcc_null_class_and_kappa_numerator_kinship(spark):
    from goetl_spark.operators.classifier import matthews_corr
    from goetl_spark.quality import cohens_kappa
    rows = ([("x", "x")] * 5 + [(None, None)] * 3 + [("x", None)] * 2)
    df = spark.createDataFrame(rows, "a string, b string")
    mcc = matthews_corr(df, "a", "b").collect()[0]["mcc"]
    kap = cohens_kappa(df, "a", "b").collect()[0]["kappa"]
    # same numerator, different normalizers: signs must agree
    assert (mcc > 0) == (kap > 0)
