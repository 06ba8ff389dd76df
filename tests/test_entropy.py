"""categorical_entropy (quality.py) — Shannon diversity + Pielou
evenness: reference parity, the uniform/monoculture extremes,
merge-invariance of the NULL class, grouped path, conventions."""
from __future__ import annotations

import math

import pytest

from goetl_spark.quality import categorical_entropy

GRID = 5e-9


def test_matches_reference_with_null_class(spark):
    rows = ["a"] * 4 + ["b"] * 4 + ["c"] * 2 + [None] * 2
    df = spark.createDataFrame([(x,) for x in rows], "v string")
    r = categorical_entropy(df, "v").collect()[0]
    ps = [4 / 12, 4 / 12, 2 / 12, 2 / 12]
    H = sum(-p * math.log(p) for p in ps)
    assert (r["n"], r["k"]) == (12, 4)     # NULL is the 4th class
    assert r["entropy_nats"] == pytest.approx(H, abs=GRID)
    assert r["balance"] == pytest.approx(H / math.log(4), abs=1e-7)


def test_uniform_and_monoculture_extremes(spark):
    u = spark.createDataFrame([(c,) for c in "abcde"], "v string")
    r = categorical_entropy(u, "v").collect()[0]
    assert r["balance"] == pytest.approx(1.0, abs=1e-7)
    m = spark.createDataFrame([("only",)] * 9, "v string")
    r1 = categorical_entropy(m, "v").collect()[0]
    assert r1["entropy_nats"] == 0.0 and r1["balance"] is None


def test_entropy_bounds_and_skew_ordering(spark):
    even = ["a", "b"] * 5
    skew = ["a"] * 9 + ["b"]
    he = categorical_entropy(
        spark.createDataFrame([(x,) for x in even], "v string"),
        "v").collect()[0]["entropy_nats"]
    hs = categorical_entropy(
        spark.createDataFrame([(x,) for x in skew], "v string"),
        "v").collect()[0]["entropy_nats"]
    assert 0.0 <= hs < he <= math.log(2) + 1e-9


def test_grouped_and_empty(spark):
    rows = [("en", "s1"), ("en", "s1"), ("en", "s2"), ("de", "s1")]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in
           categorical_entropy(df, "v", ["g"]).collect()}
    assert got["en"]["k"] == 2 and got["de"]["k"] == 1
    assert got["de"]["balance"] is None
    e = spark.createDataFrame([], "v string")
    assert categorical_entropy(e, "v").collect() == []
