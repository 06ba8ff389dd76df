"""Keyless interval joins (operators/asof.py::interval_lookup_join /
interval_overlap_join): bucket-blocked equi-join plans must return
EXACTLY what the naive cross-join-filter returns, including closed
endpoints, negative coordinates, multi-bucket intervals (pair dedup),
NULL points/bounds, and the left-join null-padding contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.asof import (
    interval_lookup_join,
    interval_overlap_join,
)


def _points(spark):
    vals = [-21.0, -20.0, -1.5, 0.0, 0.5, 7.0, 9.99, 10.0, 10.01,
            25.0, 39.9, 40.0, 77.7, None]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "pid int, p double")


def _intervals(spark):
    rows = [
        (100, -25.0, -20.0),   # negative, closed end hits -20
        (101, -2.0, 1.0),      # crosses zero
        (102, 0.0, 40.0),      # long: spans many width-5 buckets
        (103, 10.0, 10.0),     # degenerate single point
        (104, 35.0, 45.0),
        (105, 50.0, 60.0),     # matches nothing
        (106, None, 5.0),      # NULL bound: never matches
    ]
    return spark.createDataFrame(rows, "iid int, s double, e double")


def _naive_lookup(pt, iv):
    return {(r["pid"], r["iid"]) for r in
            pt.crossJoin(iv)
            .filter((F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
            .collect()}


@pytest.mark.parametrize("width", [0.5, 5.0, 100.0])
def test_lookup_matches_naive(spark, width):
    pt, iv = _points(spark), _intervals(spark)
    got = {(r["pid"], r["iid"]) for r in
           interval_lookup_join(pt, iv, "p", "s", "e", width).collect()}
    assert got == _naive_lookup(pt, iv)


def test_lookup_left_keeps_unmatched(spark):
    pt, iv = _points(spark), _intervals(spark)
    out = interval_lookup_join(pt, iv, "p", "s", "e", 5.0, how="left")
    matched = _naive_lookup(pt, iv)
    rows = out.collect()
    # every point appears; unmatched ones exactly once with NULL interval
    for pid in range(14):
        mine = [r for r in rows if r["pid"] == pid]
        want = [m for m in matched if m[0] == pid]
        if want:
            assert sorted(r["iid"] for r in mine) == sorted(i for _, i in want)
        else:
            assert len(mine) == 1 and mine[0]["iid"] is None


def _naive_overlap(a, b):
    return {(r["aid"], r["bid"]) for r in
            a.crossJoin(b)
            .filter((F.col("as_") <= F.col("be"))
                    & (F.col("bs") <= F.col("ae"))).collect()}


@pytest.mark.parametrize("width", [1.0, 7.0, 1000.0])
def test_overlap_matches_naive_no_duplicates(spark, width):
    a = spark.createDataFrame(
        [(1, -10.0, 30.0), (2, 0.0, 0.0), (3, 5.0, 6.0), (4, 29.0, 99.0),
         (5, 200.0, 210.0)],
        "aid int, as_ double, ae double")
    b = spark.createDataFrame(
        [(10, -50.0, -10.0), (11, 0.0, 100.0), (12, 6.0, 6.0),
         (13, 150.0, 160.0)],
        "bid int, bs double, be double")
    rows = interval_overlap_join(a, b, "as_", "ae", "bs", "be",
                                 width).collect()
    pairs = [(r["aid"], r["bid"]) for r in rows]
    assert len(pairs) == len(set(pairs)), "multi-bucket pair duplicated"
    assert set(pairs) == _naive_overlap(a, b)


def test_guards(spark):
    pt, iv = _points(spark), _intervals(spark)
    with pytest.raises(ValueError):
        interval_lookup_join(pt, iv, "p", "s", "e", 0.0)
    with pytest.raises(ValueError):
        interval_lookup_join(pt, iv, "p", "s", "e", 5.0, how="full")
    with pytest.raises(Exception):  # raise_error inside the plan
        interval_lookup_join(pt, iv, "p", "s", "e", 5.0,
                             max_buckets_per_interval=2).collect()


# --- fuzzed equivalence vs the naive plan (Spark-backed, capped) -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_coord = st.integers(min_value=-50, max_value=50)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_coord, min_size=1, max_size=12),
       st.lists(st.tuples(_coord, st.integers(min_value=0, max_value=25)),
                min_size=1, max_size=10),
       st.sampled_from([0.5, 3.0, 17.0]))
def test_lookup_fuzz_vs_naive(spark, pts, ivs, width):
    pt = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(pts)], "pid int, p double")
    iv = spark.createDataFrame(
        [(i, float(s), float(s + ln)) for i, (s, ln) in enumerate(ivs)],
        "iid int, s double, e double")
    got = {(r["pid"], r["iid"]) for r in
           interval_lookup_join(pt, iv, "p", "s", "e", width).collect()}
    assert got == _naive_lookup(pt, iv)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_coord, st.integers(min_value=0, max_value=30)),
                min_size=1, max_size=8),
       st.lists(st.tuples(_coord, st.integers(min_value=0, max_value=30)),
                min_size=1, max_size=8),
       st.sampled_from([1.0, 9.0, 200.0]))
def test_overlap_fuzz_vs_naive(spark, lft, rgt, width):
    a = spark.createDataFrame(
        [(i, float(s), float(s + ln)) for i, (s, ln) in enumerate(lft)],
        "aid int, as_ double, ae double")
    b = spark.createDataFrame(
        [(i, float(s), float(s + ln)) for i, (s, ln) in enumerate(rgt)],
        "bid int, bs double, be double")
    rows = interval_overlap_join(a, b, "as_", "ae", "bs", "be",
                                 width).collect()
    pairs = [(r["aid"], r["bid"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_overlap(a, b)
