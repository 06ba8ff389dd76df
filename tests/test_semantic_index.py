"""Standing SemDeDup index (similarity.py::semantic_index_write /
semantic_index_candidates, r17 — the r16 verdict's depth candidate
(a): the one LLM-ops dedup family without a day-2 leg).

Laws:

1. EXHAUSTIVE EXACTNESS — at nprobe = n_cells the cross candidates
   equal the brute-force cosine-threshold pairs against the corpus
   (the index only accelerates; the ann_index full-probe contract
   applied to threshold search), including after a frozen-centroid
   append.
2. THRESHOLD PIN — an ann_index_write-only index (or a build that
   crashed before the threshold pin) refuses loudly; the pinned tau
   is the default and any query tau overrides exactly (no stored
   structure depends on it — unlike the Jaccard prefix index there
   is no direction hazard).
3. WITHIN-BATCH SCOPE — within-batch pairs block on the primary
   cell (the semantic_dedup bucket contract): at k_cells=1 they are
   exactly the batch's all-pairs threshold graph.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.similarity import (
    ann_index_write,
    semantic_index_candidates,
    semantic_index_write,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_pairs(qrows, crows, tau):
    out = set()
    for qid, qv in qrows:
        for cid, cv in crows:
            if qid == cid:
                continue
            d = sum(float(a) * float(b) for a, b in zip(qv, cv))
            na = math.sqrt(sum(float(a) * float(a) for a in qv))
            nb = math.sqrt(sum(float(b) * float(b) for b in cv))
            if d / (na * nb) >= tau:
                out.add((qid, cid))
    return out


CORPUS = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.14, 0.0]),
          (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.0, 1.0]),
          (5, [0.7, 0.7, 0.14])]
DAY2 = [(11, [1.0, 0.02, 0.0]), (12, [0.0, 0.98, 0.2])]
BATCH = [(21, [1.0, 0.05, 0.0]), (22, [0.0, 1.0, 0.05]),
         (23, [0.05, 0.03, 1.0]), (24, [1.0, 0.06, 0.01])]


def test_full_probe_equals_brute_force_incl_append(spark, tmp_path):
    path = str(tmp_path / "semidx")
    semantic_index_write(_vecs(spark, CORPUS), path, threshold=0.95,
                         k_cells=3, iterations=1)
    semantic_index_write(_vecs(spark, DAY2), path, mode="append")
    got = {(r["query_id"], r["match_id"])
           for r in semantic_index_candidates(
               _vecs(spark, BATCH), path, nprobe=3,
               include_new_pairs=False).collect()}
    want = _brute_pairs(BATCH, CORPUS + DAY2, 0.95)
    assert got == want and got  # non-vacuous
    # every emitted cosine is exact (spot check one known pair)
    rows = {(r["query_id"], r["match_id"]): r["cos_sim"]
            for r in semantic_index_candidates(
                _vecs(spark, BATCH), path, nprobe=3,
                include_new_pairs=False).collect()}
    for (qid, mid), cs in rows.items():
        assert cs >= 0.95 - 1e-12


def test_threshold_pin_and_override(spark, tmp_path):
    path = str(tmp_path / "sempin")
    semantic_index_write(_vecs(spark, CORPUS), path, threshold=0.999,
                         k_cells=2, iterations=1)
    # pinned tau is the default: 0.999 keeps only the tightest pairs
    strict = {(r["query_id"], r["match_id"])
              for r in semantic_index_candidates(
                  _vecs(spark, BATCH), path, nprobe=2,
                  include_new_pairs=False).collect()}
    assert strict == _brute_pairs(BATCH, CORPUS, 0.999)
    # looser override is exact too — no stored structure depends on tau
    loose = {(r["query_id"], r["match_id"])
             for r in semantic_index_candidates(
                 _vecs(spark, BATCH), path, threshold=0.9, nprobe=2,
                 include_new_pairs=False).collect()}
    assert loose == _brute_pairs(BATCH, CORPUS, 0.9)
    assert strict <= loose

    # an ANN-only index (= a semantic build that died before the pin)
    # refuses loudly instead of guessing a threshold
    ann_only = str(tmp_path / "annonly")
    ann_index_write(_vecs(spark, CORPUS), ann_only, k_cells=2,
                    iterations=1)
    with pytest.raises(ValueError, match="no pinned semantic"):
        semantic_index_candidates(_vecs(spark, BATCH), ann_only)
    with pytest.raises(ValueError, match="no readable manifest"):
        semantic_index_candidates(_vecs(spark, BATCH),
                                  str(tmp_path / "missing"))


def test_within_batch_pairs_primary_cell_scope(spark, tmp_path):
    path = str(tmp_path / "semwithin")
    # k_cells=1: a single cell, so the primary-cell blocking is the
    # whole batch — within pairs must equal the all-pairs graph
    semantic_index_write(_vecs(spark, CORPUS), path, threshold=0.95,
                         k_cells=1, iterations=1)
    allp = semantic_index_candidates(_vecs(spark, BATCH), path,
                                     nprobe=1)
    within = {(r["query_id"], r["match_id"])
              for r in allp.collect()
              if r["query_id"] >= 21 and r["match_id"] >= 21}
    want = {(a, b) for (a, b) in _brute_pairs(BATCH, BATCH, 0.95)
            if a < b}
    assert within == want and (21, 24) in within
    # and cross pairs are ordered (query from batch, match from index)
    cross = {(r["query_id"], r["match_id"])
             for r in allp.collect() if r["match_id"] < 21}
    assert cross == _brute_pairs(BATCH, CORPUS, 0.95)


def test_compose_with_dedup_clusters_keep_rule(spark, tmp_path):
    """The day-2 keep decision the docstring prescribes: candidates →
    dedup_clusters → min-id keep, the semantic_dedup composition over
    corpus ∪ batch restricted to edges the batch can see."""
    from goetl_spark.operators.dedup import dedup_clusters

    path = str(tmp_path / "semkeep")
    semantic_index_write(_vecs(spark, CORPUS), path, threshold=0.95,
                         k_cells=1, iterations=1)
    cand = semantic_index_candidates(_vecs(spark, BATCH), path,
                                     nprobe=1)
    clusters = dedup_clusters(cand, "query_id", "match_id")
    keep = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    # 21 ~ 1/2/11-ish corpus vectors and ~24 within batch: dominated
    assert keep.get(21) is not None and keep[21] < 21
    assert keep.get(24) is not None and keep[24] < 24
    # 23 ([0.05,0.03,1]) is a paraphrase-dup of corpus 4 ([0,0,1]) —
    # cosine ≈ 0.998 — so the min-id rule hands it to cluster 4
    assert keep[23] == 4


def test_append_threshold_gate(spark, tmp_path):
    """r17 self-review: an EXPLICIT append threshold that contradicts
    the pinned one must raise (silently discarding it would let a
    user believe they tightened the dedup); a matching explicit value
    and an omitted one both pass."""
    path = str(tmp_path / "semgate")
    semantic_index_write(_vecs(spark, CORPUS), path, threshold=0.25,
                         k_cells=2, iterations=1)
    with pytest.raises(ValueError, match="pinned index threshold"):
        semantic_index_write(_vecs(spark, DAY2), path, threshold=0.9,
                             mode="append")
    semantic_index_write(_vecs(spark, DAY2), path, threshold=0.25,
                         mode="append")  # matching explicit: fine
    semantic_index_write(
        _vecs(spark, [(13, [0.5, 0.5, 0.0])]), path, mode="append")
    got = {(r["query_id"], r["match_id"])
           for r in semantic_index_candidates(
               _vecs(spark, BATCH), path, nprobe=2,
               include_new_pairs=False).collect()}
    assert got == _brute_pairs(
        BATCH, CORPUS + DAY2 + [(13, [0.5, 0.5, 0.0])], 0.25)
