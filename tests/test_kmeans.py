"""Distributed Lloyd's k-means (similarity.py::kmeans_fit/kmeans_assign)
— separation, centroid means, empty-cluster drop, guards."""
from __future__ import annotations

import pytest

from goetl_spark.operators.similarity import kmeans_assign, kmeans_fit

LOW = {0: [0.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 1.0]}
HIGH = {3: [10.0, 10.0], 4: [11.0, 10.0], 5: [10.0, 11.0]}


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, v) for i, v in {**LOW, **HIGH}.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_two_well_separated_clusters(spark, points):
    cents = kmeans_fit(points, k=2, iterations=3)
    assert len(cents) == 2
    out = kmeans_assign(points, cents).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert set(LOW) in by_cluster.values()
    assert set(HIGH) in by_cluster.values()
    got = sorted(sorted(v) for v in cents.values())
    assert got[0] == pytest.approx([1 / 3, 1 / 3], abs=1e-6)
    assert got[1] == pytest.approx([31 / 3, 31 / 3], abs=1e-6)


def test_assign_new_points(spark, points):
    cents = kmeans_fit(points, k=2, iterations=3)
    low_cluster = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(points, cents).collect()}[0]
    probe = spark.createDataFrame(
        [(99, [0.4, 0.4])], "vec_id long, embedding array<double>")
    assert kmeans_assign(probe, cents).collect()[0]["cluster"] == low_cluster


def test_empty_cluster_drops(spark):
    rows = [(i, [1.0, 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=2, iterations=1)
    # identical seeds tie every row to cluster 0; cluster 1 empties out
    assert list(cents) == [0]
    assert cents[0] == pytest.approx([1.0, 1.0])


def test_zero_iterations_returns_seeds(spark, points):
    cents = kmeans_fit(points, k=2, iterations=0)
    vecs = {tuple(v) for v in cents.values()}
    assert vecs <= {tuple(v) for v in {**LOW, **HIGH}.values()}


def test_guards(spark, points):
    empty = points.filter("vec_id < 0")
    with pytest.raises(ValueError):
        kmeans_fit(points, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(points, iterations=-1)
    with pytest.raises(ValueError):
        kmeans_fit(empty, k=2)
    with pytest.raises(ValueError):
        kmeans_assign(points, {})
