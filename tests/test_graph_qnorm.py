"""PageRank + quantile normalization tests (graph.py, ranking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.graph import pagerank
from goetl_spark.operators.ranking import quantile_normalize


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_cycle_is_uniform(spark):
    out = {r.node: r.rank for r in pagerank(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]),
        iterations=5).collect()}
    for v in out.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_sink_accumulates_and_mass_conserved(spark):
    # a -> b: b must outrank a; dangling b's mass recycles, total = 1
    out = {r.node: r.rank for r in pagerank(
        _edges(spark, [("a", "b")]), iterations=20).collect()}
    assert out["b"] > out["a"] > 0
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_beats_leaf(spark):
    # star into "hub": hub collects rank from 3 leaves
    out = {r.node: r.rank for r in pagerank(
        _edges(spark, [("x", "hub"), ("y", "hub"), ("z", "hub")]),
        iterations=10).collect()}
    assert out["hub"] > max(out["x"], out["y"], out["z"])


def test_pagerank_null_and_duplicate_edges(spark):
    out = pagerank(_edges(spark, [("a", "b"), ("a", "b"), (None, "b"),
                                  ("a", None)]), iterations=3).collect()
    assert {r.node for r in out} == {"a", "b"}


def test_quantile_normalize_aligns_shifted_groups(spark):
    # group a: 0..99 ; group b: 1000..1099 — same shape, shifted.
    # After normalization onto the global distribution, equal
    # within-group ranks must map to the SAME value.
    rows = [("a", float(v), i) for i, v in enumerate(range(100))] + \
           [("b", float(v), i) for i, v in enumerate(range(1000, 1100))]
    df = spark.createDataFrame(rows, "g string, x double, i int")
    out = quantile_normalize(df, "x", ["g"], tie_cols=["i"],
                             n_quantiles=11)
    a = {r.i: r.x_qnorm for r in out.where(F.col("g") == "a").collect()}
    b = {r.i: r.x_qnorm for r in out.where(F.col("g") == "b").collect()}
    for i in range(100):
        assert a[i] == pytest.approx(b[i], abs=1e-9)
    # monotone within group
    vals = [a[i] for i in range(100)]
    assert vals == sorted(vals)
    # endpoints hit the global min/max
    assert a[0] == pytest.approx(0.0)
    assert a[99] == pytest.approx(1099.0)


def test_quantile_normalize_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, x double")
    with pytest.raises(ValueError):
        quantile_normalize(df, "x", ["g"], n_quantiles=1)


def test_triangle_count_known_graph(spark):
    from goetl_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant
    # 4-5 and an isolated edge 6-7; duplicates/reverses/self-loops
    # must not change anything
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (6, 7),
             (2, 1), (1, 2), (3, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"]
           for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}
    assert sum(got.values()) // 3 == 4


def test_triangle_count_matches_bruteforce(spark):
    import itertools

    from goetl_spark.operators.graph import triangle_count

    # deterministic pseudo-random graph on 30 nodes
    nodes = range(30)
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
             if (a * 31 + b * 17) % 5 == 0]
    eset = set(edges)
    expect = {n: 0 for n in nodes}
    n_tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            n_tri += 1
            for v in (a, b, c):
                expect[v] += 1
    expect = {n: c for n, c in expect.items()
              if any(n in e for e in eset)}

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"]
           for r in triangle_count(df, out_col="triangles").collect()}
    assert got == expect
    assert sum(got.values()) == 3 * n_tri


def test_kcore_fixpoint_and_rounds(spark):
    import pytest
    from goetl_spark.operators.graph import kcore

    # triangle (1,2,3) + chain 3-4-5 + isolated-ish pendant 5-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)],
        "src long, dst long")
    core = {r.node: r.degree for r in kcore(edges, 2).collect()}
    assert core == {1: 2, 2: 2, 3: 2}  # 2-core = the triangle
    # k=1 keeps everything (no isolated vertices in input)
    assert len(kcore(edges, 1).collect()) == 6
    # one peel round with k=2: only degree-1 leaves (6) drop; 5 survives
    one = {r.node for r in kcore(edges, 2, rounds=1).collect()}
    assert one == {1, 2, 3, 4, 5}
    # orientation/self-loop/dup robustness
    messy = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (1, 3), (7, 7)], "src long, dst long")
    assert {r.node: r.degree for r in kcore(messy, 2).collect()} == \
        {1: 2, 2: 2, 3: 2}
    with pytest.raises(ValueError):
        kcore(edges, 0)
    # fixpoint landing EXACTLY on peel #max_rounds converges (r10 fix:
    # the final edge set is re-checked before raising) — path 1-2-3
    # empties in one peel, and empty IS the 2-core
    assert kcore(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        2, max_rounds=1).count() == 0
    # ...but a peel depth beyond max_rounds still raises: the 5-path
    # needs two rounds (drop 1,5 then 2,4) and gets one
    with pytest.raises(RuntimeError):
        kcore(spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"),
            2, max_rounds=1)
