"""silhouette_simplified (operators/similarity.py) — the cluster-
quality eval leg: pure-Python centroid-silhouette reference parity,
the separated-vs-overlapping ordering, single-cluster NULL, NULL-label
cluster, and the point-on-centroid zero convention."""
from __future__ import annotations

import math
from collections import defaultdict

import pytest

from goetl_spark.operators.similarity import silhouette_simplified


def ref_sil(rows):
    by = defaultdict(list)
    for _, lab, v in rows:
        by[lab].append(v)
    cents = {lab: [sum(v[d] for v in vs) / len(vs)
                   for d in range(len(vs[0]))] for lab, vs in by.items()}
    out = defaultdict(list)
    for _, lab, v in rows:
        d = {lc: math.sqrt(sum((a - b) ** 2 for a, b in zip(v, c)))
             for lc, c in cents.items()}
        a = d[lab]
        others = [x for lc, x in d.items() if lc != lab]
        if not others:
            out[lab].append(None)
            continue
        b = min(others)
        out[lab].append((b - a) / max(a, b) if max(a, b) > 0 else 0.0)
    return {lab: (sum(v) / len(v) if v[0] is not None else None)
            for lab, v in out.items()}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")


def test_separated_clusters_score_high_and_match_reference(spark):
    rows = [(1, 0, [0.0, 0.0]), (2, 0, [0.25, 0.0]), (3, 0, [0.0, 0.25]),
            (4, 1, [10.0, 10.0]), (5, 1, [10.25, 10.0]),
            (6, 2, [-8.0, 5.0]), (7, 2, [-8.5, 5.5])]
    got = {r["label"]: r["mean_silhouette"]
           for r in silhouette_simplified(_df(spark, rows)).collect()}
    want = ref_sil(rows)
    for lab in want:
        # float32 storage + the scale-6 centroid grid bound the delta
        assert got[lab] == pytest.approx(want[lab], abs=1e-5), lab
        assert got[lab] > 0.9


def test_overlapping_clusters_score_lower_than_separated(spark):
    sep = [(i, i % 2, [float(10 * (i % 2)) + 0.1 * i, 0.0])
           for i in range(8)]
    ovl = [(i, i % 2, [0.1 * i, 0.0]) for i in range(8)]
    m_sep = min(r["mean_silhouette"] for r in
                silhouette_simplified(_df(spark, sep)).collect())
    m_ovl = max(r["mean_silhouette"] for r in
                silhouette_simplified(_df(spark, ovl)).collect())
    assert m_sep > m_ovl


def test_single_cluster_null_and_point_on_centroid_zero(spark):
    one = [(1, 0, [1.0, 2.0]), (2, 0, [3.0, 4.0])]
    r = silhouette_simplified(_df(spark, one)).collect()[0]
    assert r["mean_silhouette"] is None
    # two identical centroids: every a == b -> s == 0 everywhere
    same = [(1, 0, [1.0, 1.0]), (2, 1, [1.0, 1.0])]
    for r in silhouette_simplified(_df(spark, same)).collect():
        assert r["mean_silhouette"] == 0.0


def test_null_label_is_its_own_cluster(spark):
    rows = [(1, None, [0.0, 0.0]), (2, None, [0.25, 0.0]),
            (3, 5, [9.0, 9.0]), (4, 5, [9.25, 9.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    got = {r["label"]: r for r in silhouette_simplified(df).collect()}
    assert set(got) == {None, 5}
    assert got[None]["n_vectors"] == 2
    assert got[None]["mean_silhouette"] > 0.9


def test_null_vectors_excluded_and_empty(spark):
    rows = [(1, 0, [0.0, 0.0]), (2, 0, None), (3, 1, [5.0, 5.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    got = {r["label"]: r["n_vectors"]
           for r in silhouette_simplified(df).collect()}
    assert got == {0: 1, 1: 1}
    e = spark.createDataFrame([], "vec_id long, label int, embedding array<float>")
    assert silhouette_simplified(e).collect() == []
