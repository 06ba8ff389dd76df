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


def test_kernel_and_sql_assignment_forms_agree_bit_exact(spark, sf_dir):
    """The Arrow argmin/probe kernels (chosen above goetl.similarity.
    kernelCells centroids) must reproduce the in-row SQL argmin
    BIT-EXACTLY — same exact-int64 grid distances, same lowest-id
    tie-break — on real embeddings, for the fit, the assignment, and
    the probe sets (r18)."""
    from pyspark.sql import functions as F

    from goetl_spark.operators.similarity import (
        _cluster_probes, _cluster_probes_arrow, _quantize_centroids,
        _qvec)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = spark.conf.get("goetl.similarity.kernelCells", "64")
    try:
        spark.conf.set("goetl.similarity.kernelCells", str(10**9))
        cents_sql = kmeans_fit(e, k=7, iterations=2)
        spark.conf.set("goetl.similarity.kernelCells", "1")
        cents_kern = kmeans_fit(e, k=7, iterations=2)
        assert cents_sql == cents_kern  # exact float equality

        spark.conf.set("goetl.similarity.kernelCells", str(10**9))
        a_sql = kmeans_assign(e, cents_sql).select("vec_id", "cluster")
        spark.conf.set("goetl.similarity.kernelCells", "1")
        a_kern = kmeans_assign(e, cents_sql).select("vec_id", "cluster")
        sql_rows = sorted(map(tuple, a_sql.collect()))
        kern_rows = sorted(map(tuple, a_kern.collect()))
        assert sql_rows == kern_rows

        # probe sets: same cells in the same (distance, id) order
        vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = e.select("vec_id", _qvec(vec).alias("__vq"))
        p_sql = {r["vec_id"]: [s["j"] for s in r["p"]] for r in base.select(
            "vec_id", _cluster_probes("__vq", cents_sql, 3).alias("p")
        ).collect()}
        kern = _cluster_probes_arrow(
            _quantize_centroids(spark, cents_sql), 3)
        p_kern = {r["vec_id"]: list(r["p"]) for r in base.select(
            "vec_id", kern(F.col("__vq")).alias("p")).collect()}
        assert p_sql == p_kern
    finally:
        spark.conf.set("goetl.similarity.kernelCells", old)
