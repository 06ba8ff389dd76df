"""Distributed power-iteration PCA (operators/similarity.py::
power_iteration_pca/pca_project): convergence to numpy's top
eigenvector on an anisotropic cloud, deterministic replay, projection
semantics, and the input guards."""
from __future__ import annotations

import math

import numpy as np
import pytest

from goetl_spark.operators.similarity import pca_project, power_iteration_pca


def _cloud(seed: int = 7, n: int = 400, dim: int = 6):
    """Anisotropic gaussian: variance 25 along a fixed direction, 1
    elsewhere — a dominant PC far above the rest of the spectrum."""
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=dim)
    axis /= np.linalg.norm(axis)
    coords = rng.normal(size=(n, dim))
    x = coords + np.outer(rng.normal(scale=5.0, size=n), axis)
    x += rng.normal(size=dim)  # nonzero mean exercises centering
    return x, axis


def _df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_converges_to_numpy_top_eigenvector(spark):
    x, _ = _cloud()
    mu, v = power_iteration_pca(_df(spark, x), iterations=8)
    assert np.allclose(mu, x.mean(axis=0), atol=1e-6)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    cos = abs(float(np.dot(v, top)))
    assert cos > 0.999, cos
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-9)


def test_projection_matches_centered_dot(spark):
    x, _ = _cloud(seed=11, n=80, dim=4)
    df = _df(spark, x)
    mu, v = power_iteration_pca(df, iterations=4)
    got = {r["vec_id"]: r["pc1"]
           for r in pca_project(df, mu, v).select("vec_id", "pc1").collect()}
    want = (x - np.asarray(mu)) @ np.asarray(v)
    for i in range(len(x)):
        assert math.isclose(got[i], float(want[i]), rel_tol=1e-9, abs_tol=1e-9)


def test_deterministic_across_runs(spark):
    x, _ = _cloud(seed=3, n=60, dim=5)
    df = _df(spark, x)
    a = power_iteration_pca(df, iterations=3)
    b = power_iteration_pca(df.repartition(7), iterations=3)
    assert a[0] == b[0] and a[1] == b[1]  # bit-exact, partition-independent


def test_guards(spark):
    x, _ = _cloud(seed=5, n=20, dim=3)
    df = _df(spark, x)
    with pytest.raises(ValueError, match="iterations"):
        power_iteration_pca(df, iterations=0)
    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        power_iteration_pca(empty)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="ragged"):
        power_iteration_pca(ragged)
    withnull = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="NULL"):
        power_iteration_pca(withnull)
    with pytest.raises(ValueError, match="dim"):
        pca_project(df, [0.0, 0.0], [1.0, 0.0, 0.0])


def test_constant_input_collapses_with_message(spark):
    const = spark.createDataFrame(
        [(i, [2.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero vector"):
        power_iteration_pca(const, iterations=1)
