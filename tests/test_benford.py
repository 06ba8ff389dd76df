"""benford_profile (quality.py) — leading-digit screen: hand-counted
fixtures across magnitudes/signs/sub-unit values, the shares-sum-to-1
and all-nine-rows invariants, Benford-conforming synthetic data scoring
near-zero MAD, and the exclusion/guard contracts."""
from __future__ import annotations

import pytest

from goetl_spark.quality import BENFORD_EXPECTED, benford_profile


def test_hand_counts_signs_and_subunit_magnitudes(spark):
    xs = [1.0, 1.5, 19.0, 2.5, 0.034, 900.0, 0.0, -45.0, None]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    rows = benford_profile(df, "v").orderBy("digit").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    # 1->{1.0,1.5,19.0}, 2->{2.5}, 3->{0.034}, 4->{|-45|}, 9->{900}; N=7
    assert [r["n_d"] for r in rows] == [3, 1, 1, 1, 0, 0, 0, 0, 1]
    assert rows[0]["share"] == pytest.approx(3 / 7, abs=1e-15)
    assert rows[0]["expected"] == BENFORD_EXPECTED[1]
    assert rows[0]["dev"] == pytest.approx(3 / 7 - BENFORD_EXPECTED[1],
                                           abs=1e-15)
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-12)


def test_benford_conforming_data_scores_near_zero_mad(spark):
    # 2^k magnitudes are a classic Benford-conforming sequence; k < 47
    # keeps |v| inside the documented DECIMAL(19,4) grid bound (past it
    # ANSI raises loudly — pinned below)
    xs = [float(2 ** k) for k in range(47)]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    rows = benford_profile(df, "v").collect()
    mad = sum(abs(r["dev"]) for r in rows) / 9
    assert mad < 0.03  # 47 samples of an equidistributing sequence
    # uniform [100, 200) data: every value leads with 1 — maximal tell
    u = spark.createDataFrame([(100.0 + i,) for i in range(100)], "v double")
    urows = {r["digit"]: r for r in benford_profile(u, "v").collect()}
    assert urows[1]["share"] == 1.0 and urows[2]["n_d"] == 0


def test_grouped_null_group_zero_only_group_and_scaffold(spark):
    rows = [("a", 1.0), ("a", 25.0), ("zero", 0.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = benford_profile(df, "v", ["g"]).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    # the all-zero group emits nothing; NULL group is a real group
    assert set(by_g) == {"a", None}
    assert len(by_g["a"]) == 9 and len(by_g[None]) == 9


def test_nan_raises_even_when_all_rows_bad(spark):
    for fixture in ([(float("nan"),)], [(1.0,), (float("nan"),)]):
        df = spark.createDataFrame(fixture, "v double")
        with pytest.raises(Exception, match="benford_profile"):
            benford_profile(df, "v").collect()


def test_empty_and_all_excluded(spark):
    e = spark.createDataFrame([], "v double")
    assert benford_profile(e, "v").collect() == []
    z = spark.createDataFrame([(0.0,), (None,)], "v double")
    assert benford_profile(z, "v").collect() == []


def test_magnitude_bound_raises_loudly(spark):
    # past the DECIMAL(19,4) grid the quantizing cast overflows and
    # ANSI raises — loud, never a silent NULL digit
    df = spark.createDataFrame([(1e16,)], "v double")
    with pytest.raises(Exception):
        benford_profile(df, "v").collect()


def test_value_scale_dial(spark):
    # 0.00005 vanishes on the scale-4 grid (rounds to fewer than one
    # grid step above zero? no: rounds to 0.0001 -> digit 1) but the
    # scale-6 grid resolves its true leading digit 5
    df = spark.createDataFrame([(0.00005,)], "v double")
    d4 = benford_profile(df, "v").filter("n_d > 0").collect()[0]["digit"]
    d6 = benford_profile(df, "v", value_scale=6) \
        .filter("n_d > 0").collect()[0]["digit"]
    assert d6 == 5 and d4 in (1, 5)
