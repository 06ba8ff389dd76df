"""ann_index_write / ann_index_search — the IVF standing index. The
load-bearing claims: (1) at nprobe = n_cells the search is EXACTLY
brute-force top-k (the knn_ivf_trained contract, now through the
persisted layout); (2) append under frozen centroids is lossless at
full probe; (3) the corpus read is genuinely partition-pruned to the
probed cells (the plan's PartitionFilters is the receipt); (4) recall
at partial probe is high on separable data."""
from __future__ import annotations

import math

import pytest

from goetl_spark.operators.similarity import (
    ann_index_search,
    ann_index_write,
    knn_bruteforce,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _clustered(n_per=12, dim=6):
    # 3 well-separated clusters on coordinate axes + small deterministic jitter
    rows = []
    vid = 0
    for c in range(3):
        for i in range(n_per):
            base = [0.0] * dim
            base[c] = 10.0
            base[(c + 1) % dim] += math.sin(vid) * 0.5
            base[(c + 2) % dim] += math.cos(vid) * 0.5
            rows.append((vid, [float(x) for x in base]))
            vid += 1
    return rows


def _brute(spark, corpus_rows, query_rows, k):
    c = _vecs(spark, corpus_rows)
    q = _vecs(spark, query_rows)
    return {(r["query_id"], r["rank"]): (r["neighbor_id"],
                                         round(r["cos_sim"], 9))
            for r in knn_bruteforce(c, q, k=k).collect()}


def _searched(spark, path, query_rows, k, nprobe):
    return {(r["query_id"], r["rank"]): (r["neighbor_id"],
                                         round(r["cos_sim"], 9))
            for r in ann_index_search(_vecs(spark, query_rows), path,
                                      k=k, nprobe=nprobe).collect()}


def test_full_probe_equals_bruteforce(spark, tmp_path):
    rows = _clustered()
    path = str(tmp_path / "aidx")
    ann_index_write(_vecs(spark, rows), path, k_cells=4, iterations=2)
    queries = rows[:5]
    assert _searched(spark, path, queries, k=5, nprobe=4) == \
        _brute(spark, rows, queries, k=5)


def test_append_frozen_centroids_lossless_at_full_probe(spark, tmp_path):
    rows = _clustered()
    path = str(tmp_path / "aidx")
    ann_index_write(_vecs(spark, rows[:20]), path, k_cells=3,
                    iterations=2)
    ann_index_write(_vecs(spark, rows[20:]), path, mode="append")
    queries = rows[::7]
    assert _searched(spark, path, queries, k=4, nprobe=3) == \
        _brute(spark, rows, queries, k=4)


def test_partial_probe_recall_on_separable_data(spark, tmp_path):
    rows = _clustered()
    path = str(tmp_path / "aidx")
    ann_index_write(_vecs(spark, rows), path, k_cells=3, iterations=3)
    queries = rows[::5]
    got = _searched(spark, path, queries, k=3, nprobe=1)
    want = _brute(spark, rows, queries, k=3)
    hits = sum(1 for key, v in want.items()
               if key in got and got[key][0] == v[0])
    # clusters are axis-separated; nprobe=1 must recover nearly all
    assert hits / len(want) >= 0.8


def test_partition_pruning_receipt(spark, tmp_path):
    rows = _clustered()
    path = str(tmp_path / "aidx")
    ann_index_write(_vecs(spark, rows), path, k_cells=3, iterations=2)
    plan = (ann_index_search(_vecs(spark, rows[:2]), path, k=3,
                             nprobe=1)
            ._jdf.queryExecution().executedPlan().toString())
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]


def test_validation(spark, tmp_path):
    rows = _clustered()
    path = str(tmp_path / "aidx")
    with pytest.raises(ValueError, match="no readable manifest"):
        ann_index_write(_vecs(spark, rows), path, mode="append")
    with pytest.raises(ValueError, match="mode"):
        ann_index_write(_vecs(spark, rows), path, mode="nope")
    ann_index_write(_vecs(spark, rows), path, k_cells=3, iterations=1)
    with pytest.raises(ValueError, match="no readable manifest"):
        ann_index_search(_vecs(spark, rows), str(tmp_path / "missing"))
    ragged = spark.createDataFrame([(1, [1.0, 2.0]), (2, [1.0])],
                                   "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="ragged"):
        ann_index_search(ragged, path)
    with pytest.raises(ValueError, match="ragged"):
        ann_index_write(ragged, path, mode="append")
    with pytest.raises(ValueError, match="k must be"):
        ann_index_search(_vecs(spark, rows), path, k=0)
    with pytest.raises(ValueError, match="nprobe"):
        ann_index_search(_vecs(spark, rows), path, nprobe=0)


def test_empty_query_batch(spark, tmp_path):
    path = str(tmp_path / "aempty")
    ann_index_write(_vecs(spark, _clustered()), path, k_cells=3,
                    iterations=1)
    empty = spark.createDataFrame([], "vec_id long, "
                                      "embedding array<float>")
    assert ann_index_search(empty, path, k=3).collect() == []


def test_recall_report_monitor(spark, tmp_path):
    """ann_index_recall_report: the re-fit trigger. Full-probe ground
    truth makes recall computable without any external oracle; a
    deliberately starved nprobe=1 on spread clusters must read < 1
    on SOME fixture while a healthy probe reads high; the threshold
    flag and the degenerate guards fire correctly."""
    from goetl_spark.operators.similarity import ann_index_recall_report

    rows = _clustered()
    path = str(tmp_path / "arr")
    ann_index_write(_vecs(spark, rows), path, k_cells=3, iterations=2)
    probe = _vecs(spark, rows[::3])
    r = ann_index_recall_report(probe, path, k=5, nprobe=2,
                                min_recall=0.9).collect()[0]
    assert r["n_queries"] == len(rows[::3])
    assert r["n_cells"] == 3 and r["nprobe"] == 2
    assert 0.0 < r["recall"] <= 1.0
    assert r["needs_refit"] == (r["recall"] < 0.9)
    # no threshold -> NULL flag
    r2 = ann_index_recall_report(probe, path, k=5, nprobe=1).collect()[0]
    assert r2["needs_refit"] is None
    assert r2["recall"] <= r["recall"] + 1e-12  # more probes never hurt
    # full-probe monitoring is vacuous -> loud
    import pytest as _pt
    with _pt.raises(ValueError, match="probes every cell"):
        ann_index_recall_report(probe, path, k=5, nprobe=3)
    with _pt.raises(ValueError, match="no readable manifest"):
        ann_index_recall_report(probe, str(tmp_path / "nope"), nprobe=1)


def test_recall_report_against_numpy_reference(spark, tmp_path):
    """Adjudication-style probe: recompute recall-at-nprobe entirely
    outside Spark (numpy cosine + the same argmin-probe assignment
    read from the index manifest) and demand the report's number to
    1e-12 — guards the hit-join/grouping arithmetic, not just its
    shape."""
    import numpy as np

    from goetl_spark.operators.index_meta import meta_read
    from goetl_spark.operators.similarity import ann_index_recall_report

    rows = _clustered()
    path = str(tmp_path / "aref")
    ann_index_write(_vecs(spark, rows), path, k_cells=3, iterations=2)
    probe_rows = rows[::2]
    got = ann_index_recall_report(_vecs(spark, probe_rows), path,
                                  k=4, nprobe=1).collect()[0]

    cents = np.array(meta_read(spark, path)["centroids"])
    corpus = {i: np.array(v, dtype=np.float64) for i, v in rows}

    def topk(qid, qv, cells):
        scored = []
        for nid, nv in corpus.items():
            if nid == qid:
                continue
            cell = int(np.argmin(((cents - nv) ** 2).sum(axis=1)))
            if cells is not None and cell not in cells:
                continue
            cos = float(nv @ qv / (np.linalg.norm(nv)
                                   * np.linalg.norm(qv)))
            scored.append((-cos, nid))
        return [nid for _, nid in sorted(scored)[:4]]

    recalls = []
    for qid, qv in probe_rows:
        qv = np.array(qv, dtype=np.float64)
        probe_cell = int(np.argmin(((cents - qv) ** 2).sum(axis=1)))
        exact = topk(qid, qv, None)
        approx = set(topk(qid, qv, {probe_cell}))
        if exact:
            recalls.append(len([n for n in exact if n in approx])
                           / len(exact))
    want = sum(recalls) / len(recalls)
    assert got["n_queries"] == len(probe_rows)
    assert abs(got["recall"] - want) < 1e-12
