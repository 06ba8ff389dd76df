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


def test_auto_n_cells_sqrt_rule(spark):
    """n_cells=None sizes the index as ~sqrt(N+M) clamped to
    [nprobe, 4096] — deterministic, and the result keeps the operator
    contract (ranked, consistent, within-cell only)."""
    left, right, _ = _corpora(spark, seed=7, n=60)  # N+M = 240 -> 15 cells
    got = ann_join(left, right, k=2, nprobe=2)
    rows = got.collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["dist"]))
    for rs in by_q.values():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
    # determinism of the auto size: same inputs -> identical result
    again = sorted(map(tuple, ann_join(left, right, k=2, nprobe=2).collect()))
    assert sorted(map(tuple, rows)) == again


def test_skewed_cell_is_split_by_aqe(spark):
    """SCALING.md's documented ann_join hazard: skewed DATA overfills
    one cell no matter what n_cells says. The mitigation is runtime,
    not planning — AQE's skew-join splits the straggler partition. Pin
    it: a 95/5 two-cluster corpus joined on the cell id under
    test-sized skew thresholds must execute with the cell join marked
    skew=true (the straggler was split), and the result must still be
    rank-consistent."""
    import numpy as np

    rng = np.random.default_rng(41)
    dim = 32
    hot = rng.normal(scale=0.5, size=dim)
    cold = hot + 60.0  # far-separated second cluster
    rows = []
    for i in range(2400):
        mu = hot if i % 20 else cold  # 95% of rows in the hot cluster
        rows.append((i, [float(v) for v in mu + rng.normal(size=dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    left, right = df.filter("vec_id % 2 = 0"), df.filter("vec_id % 2 = 1")

    conf = spark.conf
    keys = {
        # force the cell join onto the shuffle path and make the test's
        # ~0.5 MB hot partition cross AQE's skew thresholds
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "12KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        got = ann_join(left, right, k=3, n_cells=2, nprobe=1)
        rows_out = got.collect()
        plan = got._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            (conf.set(k, v) if v is not None else conf.unset(k))

    assert "skew=true" in plan, plan[:2000]
    by_q = {}
    for r in rows_out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["dist"]))
    for rs in by_q.values():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        assert [d for _, d in rs] == sorted(d for _, d in rs)
