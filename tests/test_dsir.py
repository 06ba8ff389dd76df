"""DSIR importance resampling (sampling.py::dsir_log_weights /
dsir_select) — pure-Python reference replication, ordering, guards."""
from __future__ import annotations

import hashlib
import math
import re

import pytest

from goetl_spark.operators.sampling import dsir_log_weights, dsir_select

B = 64
K = 1.0


def _ngrams(text: str) -> list[str]:
    words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
    return words + [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _ref_weights(cands: dict[int, str], targets: list[str]) -> dict[int, float]:
    ct_t: dict[int, int] = {}
    for t in targets:
        for g in _ngrams(t):
            ct_t[_bucket(g)] = ct_t.get(_bucket(g), 0) + 1
    ct_r: dict[int, int] = {}
    for t in cands.values():
        for g in _ngrams(t):
            ct_r[_bucket(g)] = ct_r.get(_bucket(g), 0) + 1
    n_t, n_r = sum(ct_t.values()), sum(ct_r.values())
    out = {}
    for i, t in cands.items():
        per_bucket: dict[int, int] = {}
        for g in _ngrams(t):
            per_bucket[_bucket(g)] = per_bucket.get(_bucket(g), 0) + 1
        w = 0.0
        for b, cnt in per_bucket.items():
            r = (math.log((ct_t.get(b, 0) + K) / (n_t + K * B))
                 - math.log((ct_r.get(b, 0) + K) / (n_r + K * B)))
            w += round(cnt * r, 9)
        out[i] = w
    return out


CANDS = {1: "cat cat cat", 2: "dog dog dog", 3: "cat dog", 4: ""}
TARGETS = ["cat cat", "cat likes cat"]


@pytest.fixture(scope="module")
def weighted(spark):
    cand_df = spark.createDataFrame(
        list(CANDS.items()), "doc_id int, text string")
    tgt_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGETS)], "doc_id int, text string")
    rows = dsir_log_weights(cand_df, tgt_df, buckets=B).collect()
    return {r["doc_id"]: r["log_weight"] for r in rows}


def test_matches_pure_python_reference(weighted):
    ref = _ref_weights(CANDS, TARGETS)
    for i in CANDS:
        assert weighted[i] == pytest.approx(ref[i], abs=1e-9), i


def test_target_like_doc_wins(weighted):
    assert weighted[1] > weighted[3] > weighted[2]


def test_empty_doc_zero_weight(weighted):
    assert weighted[4] == 0.0


def test_select_topn_and_tiebreak(spark):
    cand_df = spark.createDataFrame(
        list(CANDS.items()), "doc_id int, text string")
    tgt_df = spark.createDataFrame([(0, TARGETS[0])],
                                   "doc_id int, text string")
    top = dsir_select(cand_df, tgt_df, 2, buckets=B).collect()
    # the empty doc is a NEUTRAL 0.0 (likelihood ratio 1) and the tiny
    # corpus makes every non-empty weight negative, so it ranks first
    assert [r["doc_id"] for r in top] == [4, 1]


def test_guards(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    empty = spark.createDataFrame([(1, "")], "doc_id int, text string")
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, buckets=1)
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, add_k=0)
    with pytest.raises(ValueError):
        dsir_log_weights(df, empty)
    with pytest.raises(ValueError):
        dsir_select(df, df, 0)
