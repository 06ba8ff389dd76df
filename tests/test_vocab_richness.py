"""vocabulary_richness (operators/text.py) — Chao1 + Good-Turing
coverage: hand-counted fixture, the chao1 >= distinct identity,
saturation behavior under replication, and the empty conventions."""
from __future__ import annotations

import pytest

from goetl_spark.operators.text import vocabulary_richness


def test_hand_counts(spark):
    docs = [("a b b c c c d e",), ("f f g a",), (None,), ("",)]
    df = spark.createDataFrame(docs, "text string")
    r = vocabulary_richness(df, "text").collect()[0]
    # a:2 b:2 c:3 d:1 e:1 f:2 g:1 -> n=12 D=7 f1=3 f2=3
    assert (r["n_tokens"], r["distinct_tokens"], r["f1"], r["f2"]) == \
        (12, 7, 3, 3)
    assert r["chao1"] == pytest.approx(7 + 3 * 2 / (2 * 4), abs=2e-9)
    assert r["coverage"] == 0.75


def test_chao1_floor_and_coverage_bounds(spark):
    docs = [("one two three four five six seven",)]  # all singletons
    df = spark.createDataFrame(docs, "text string")
    r = vocabulary_richness(df, "text").collect()[0]
    assert r["chao1"] >= r["distinct_tokens"]
    assert r["coverage"] == 0.0       # every token is a singleton
    # fully-saturated sample: no singletons -> coverage 1, chao1 == D
    df2 = spark.createDataFrame([("x x y y",)], "text string")
    r2 = vocabulary_richness(df2, "text").collect()[0]
    assert r2["coverage"] == 1.0 and r2["chao1"] == r2["distinct_tokens"]


def test_replication_saturates_coverage(spark):
    base = ["alpha beta beta gamma delta"]
    df1 = spark.createDataFrame([(t,) for t in base], "text string")
    df8 = spark.createDataFrame([(t,) for t in base * 8], "text string")
    r1 = vocabulary_richness(df1, "text").collect()[0]
    r8 = vocabulary_richness(df8, "text").collect()[0]
    assert r8["distinct_tokens"] == r1["distinct_tokens"]
    assert r8["coverage"] > r1["coverage"]     # singleton share collapses
    assert r8["coverage"] == 1.0               # every count now >= 8


def test_grouped_and_all_empty(spark):
    rows = [("en", "x y"), ("zz", None), ("zz", "")]
    df = spark.createDataFrame(rows, "g string, text string")
    out = vocabulary_richness(df, "text", ["g"]).collect()
    assert len(out) == 1 and out[0]["g"] == "en"
    e = spark.createDataFrame([], "text string")
    assert vocabulary_richness(e, "text").collect() == []
