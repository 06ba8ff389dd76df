"""gains_at_k (operators/classifier.py) — targeting gains/lift with
expectation tie handling: hand-computed boundary-tie fixture, perfect
ranking, all-tied = base rate, zero-positive conventions, guards."""
from __future__ import annotations

import pytest

from goetl_spark.operators.classifier import gains_at_k

GRID = 2e-9


def test_hand_fixture_with_boundary_tie(spark):
    rows = [(9.0, 1.0), (7.0, 1.0), (7.0, 1.0), (7.0, 0.0),
            (4.0, 1.0), (1.0, 0.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    got = {r["k"]: r for r in
           gains_at_k(df, "p", "y", ks=(1, 3, 4, 100)).collect()}
    assert got[1]["expected_pos"] == 1.0
    assert got[1]["lift"] == pytest.approx(1.5, abs=GRID)
    # k=3 cuts the 3-row tie (2 pos): E = 1 + 2*(2/3)
    assert got[3]["expected_pos"] == pytest.approx(1 + 4 / 3, abs=GRID)
    assert got[3]["precision"] == pytest.approx(7 / 9, abs=GRID)
    assert got[3]["recall"] == pytest.approx(7 / 12, abs=GRID)
    assert got[4]["expected_pos"] == pytest.approx(3.0, abs=GRID)
    # saturation: k_eff = n, recall = 1, lift = 1
    assert got[100]["k_eff"] == 6
    assert got[100]["recall"] == pytest.approx(1.0, abs=GRID)
    assert got[100]["lift"] == pytest.approx(1.0, abs=GRID)


def test_perfect_ranking_and_lift_ceiling(spark):
    # 3 positives scored above 7 negatives: at k=3 everything is right
    rows = [(float(10 + i), 1.0) for i in range(3)] + \
           [(float(i), 0.0) for i in range(7)]
    df = spark.createDataFrame(rows, "p double, y double")
    r3 = {r["k"]: r for r in gains_at_k(df, "p", "y", ks=(3,)).collect()}[3]
    assert r3["precision"] == pytest.approx(1.0, abs=GRID)
    assert r3["recall"] == pytest.approx(1.0, abs=GRID)
    assert r3["lift"] == pytest.approx(10 / 3, abs=GRID)  # = N/Pos


def test_all_tied_scores_give_base_rate(spark):
    rows = [(5.0, 1.0)] * 3 + [(5.0, 0.0)] * 7
    df = spark.createDataFrame(rows, "p double, y double")
    r = gains_at_k(df, "p", "y", ks=(4,)).collect()[0]
    assert r["expected_pos"] == pytest.approx(4 * 0.3, abs=GRID)
    assert r["lift"] == pytest.approx(1.0, abs=GRID)


def test_zero_positives_and_integer_scores(spark):
    df = spark.createDataFrame([(3, 0.0), (1, 0.0)], "p long, y double")
    r = gains_at_k(df, "p", "y", ks=(1,)).collect()[0]
    assert r["expected_pos"] == 0.0 and r["precision"] == 0.0
    assert r["recall"] is None and r["lift"] is None


def test_guards_and_empty(spark):
    base = [(1.0, 1.0)]
    for bad in [(None, 1.0), (float("nan"), 1.0), (2.0, None)]:
        df = spark.createDataFrame(base + [bad], "p double, y double")
        with pytest.raises(Exception, match="gains_at_k"):
            gains_at_k(df, "p", "y", ks=(1,)).collect()
    with pytest.raises(ValueError, match="depths"):
        gains_at_k(spark.createDataFrame(base, "p double, y double"),
                   "p", "y", ks=(0,))
    e = spark.createDataFrame([], "p double, y double")
    assert gains_at_k(e, "p", "y", ks=(5,)).collect() == []
