"""Cell-partitioned ANN join (operators/similarity.py::ann_join):
recall floor vs brute force, rank-1 sanity on separated clusters,
partition-independence (exact-decimal determinism), and guards."""
from __future__ import annotations

import numpy as np
import pytest

from goetl_spark.operators.similarity import ann_join


def _corpora(spark, seed=19, n=120, dim=8, centers=4):
    """Two corpora drawn around shared cluster centers, even/odd ids."""
    rng = np.random.default_rng(seed)
    mus = rng.normal(scale=8.0, size=(centers, dim))
    rows = []
    for i in range(2 * n):
        mu = mus[i % centers]
        rows.append((i, [float(v) for v in mu + rng.normal(size=dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return (df.filter("vec_id % 2 = 0"), df.filter("vec_id % 2 = 1"),
            {i: np.asarray(v) for i, v in rows})


def _brute_topk(vecs, left_ids, right_ids, k):
    out = {}
    for q in left_ids:
        d = sorted((float(np.sum((vecs[q] - vecs[r]) ** 2)), r)
                   for r in right_ids)
        out[q] = [r for _, r in d[:k]]
    return out


def test_recall_floor_vs_brute_force(spark):
    left, right, vecs = _corpora(spark)
    got = ann_join(left, right, k=3, n_cells=4, iterations=2, nprobe=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = _brute_topk(vecs, [i for i in vecs if i % 2 == 0],
                       [i for i in vecs if i % 2 == 1], 3)
    hits = total = 0
    for q, w in want.items():
        g = set(by_q.get(q, []))
        hits += len(g & set(w))
        total += len(w)
    recall = hits / total
    # clustered data, nprobe=2 of 4 cells: the true neighbors share the
    # query's cluster, so recall should be near-perfect
    assert recall > 0.9, recall


def test_rank_and_dist_are_consistent(spark):
    left, right, _ = _corpora(spark, seed=5, n=40)
    rows = ann_join(left, right, k=4, n_cells=4, nprobe=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["dist"],
                                                   r["neighbor_id"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _, _ in rs] == list(range(1, len(rs) + 1))
        dists = [d for _, d, _ in rs]
        assert dists == sorted(dists)
        assert all(d >= 0.0 for d in dists)


def test_partition_independence(spark):
    left, right, _ = _corpora(spark, seed=23, n=50)
    a = sorted(map(tuple, ann_join(left, right, k=2).collect()))
    b = sorted(map(tuple, ann_join(left.repartition(11),
                                   right.repartition(5), k=2).collect()))
    assert a == b  # exact-decimal distances + id tie-breaks everywhere


def test_guards(spark):
    left, right, _ = _corpora(spark, seed=2, n=10)
    with pytest.raises(ValueError, match=">= 1"):
        ann_join(left, right, k=0)
    with pytest.raises(ValueError, match="nprobe"):
        ann_join(left, right, nprobe=9, n_cells=4)
