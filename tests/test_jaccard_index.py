"""jaccard_index_write / jaccard_index_candidates — the standing-index
variant of jaccard_join (lsh_index_write precedent). The load-bearing
claim is LOSSLESSNESS: because the prefix pigeonhole holds under ANY
shared total token order, the frozen build-time rarity order must give
EXACTLY the pairs the one-shot jaccard_join finds — index acceleration
with zero recall trade. Every test pins set equality against
jaccard_join (itself pinned against naive all-pairs in its own suite).
"""
from __future__ import annotations

import pytest

from goetl_spark.operators.dedup import (
    jaccard_index_candidates,
    jaccard_index_write,
    jaccard_join,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


CORPUS = [
    (1, ["a", "b", "c", "d"]),
    (2, ["a", "b", "c", "e"]),
    (3, ["x", "y", "z", "w"]),
    (4, ["x", "y", "z", "q"]),
    (5, ["m", "n"]),
]
BATCH = [
    (10, ["a", "b", "c", "d"]),     # exact dup of 1, 0.6 vs 2
    (11, ["x", "y", "z", "w", "q"]),  # 0.8 vs 3 and 4
    (12, ["m", "n"]),               # exact dup of 5
    (13, ["u", "v"]),               # matches nothing
    (14, ["u", "v"]),               # within-batch dup of 13
]


def _expected(spark, tau, corpus=CORPUS, batch=BATCH):
    c, b = _docs(spark, corpus), _docs(spark, batch)
    cross = {(r["doc_id"], r["r_id"], r["jaccard"])
             for r in jaccard_join(b, c.selectExpr("doc_id AS r_id",
                                                   "tokens"),
                                   "doc_id", "tokens", "r_id", "tokens",
                                   tau).collect()}
    within = {(r["doc_id"], r["r_id"], r["jaccard"])
              for r in jaccard_join(b, b.selectExpr("doc_id AS r_id",
                                                    "tokens"),
                                    "doc_id", "tokens", "r_id", "tokens",
                                    tau).collect()
              if r["doc_id"] < r["r_id"]}
    return cross | within


def _got(spark, path, tau=None, batch=BATCH, **kw):
    return {(r["query_id"], r["match_id"], r["jaccard"])
            for r in jaccard_index_candidates(
                _docs(spark, batch), path, "doc_id", "tokens",
                threshold=tau, **kw).collect()}


def test_index_matches_oneshot_join(spark, tmp_path):
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.5)
    assert _got(spark, path) == _expected(spark, 0.5)
    # exact dups carry jaccard exactly 1.0
    assert (10, 1, 1.0) in _got(spark, path)
    assert (13, 14, 1.0) in _got(spark, path)


def test_higher_query_threshold_is_a_subset(spark, tmp_path):
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.5)
    got8 = _got(spark, path, tau=0.8)
    assert got8 == _expected(spark, 0.8)
    assert got8 < _got(spark, path)  # strictly fewer pairs at 0.8


def test_lower_query_threshold_raises(spark, tmp_path):
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.8)
    with pytest.raises(ValueError, match="rebuild"):
        jaccard_index_candidates(_docs(spark, BATCH), path,
                                 "doc_id", "tokens", threshold=0.5)


def test_append_grows_index_losslessly(spark, tmp_path):
    # build on the first 3 records, append the rest: queries must see
    # the union — including appended records whose tokens were UNSEEN
    # at build time (m/n/q rank cnt=0 under the frozen order)
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS[:3]), path, "doc_id",
                        "tokens", threshold=0.5)
    jaccard_index_write(_docs(spark, CORPUS[3:]), path, "doc_id",
                        "tokens", threshold=0.5, mode="append")
    assert _got(spark, path) == _expected(spark, 0.5)


def test_append_config_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.5)
    with pytest.raises(ValueError, match="incomparable"):
        jaccard_index_write(_docs(spark, CORPUS), path, "doc_id",
                            "tokens", threshold=0.8, mode="append")


def test_exclude_within_batch_and_set_contract(spark, tmp_path):
    path = str(tmp_path / "jidx")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.5)
    got = _got(spark, path, include_new_pairs=False)
    assert got == {p for p in _expected(spark, 0.5)
                   if p[1] <= 5}  # corpus ids only
    # NULL / empty sets dropped, duplicate tokens collapse
    weird = [(20, ["a", "a", "b", "c", "d"]), (21, None), (22, [])]
    got_w = _got(spark, path, batch=weird)
    assert got_w == {(20, 1, 1.0), (20, 2, 0.6)}


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="threshold"):
        jaccard_index_write(_docs(spark, CORPUS),
                            str(tmp_path / "x"), threshold=0.0)
    with pytest.raises(ValueError, match="mode"):
        jaccard_index_write(_docs(spark, CORPUS),
                            str(tmp_path / "x"), mode="error")


def test_degenerate_empty_shapes(spark, tmp_path):
    # an index leg written from an EMPTY frame (corpus whose token
    # sets all drop) must still round-trip: Spark writes schema-bearing
    # empty parquet, queries read it and return empty — probed r15
    path = str(tmp_path / "jempty")
    jaccard_index_write(_docs(spark, [(1, [])]), path, "doc_id",
                        "tokens", threshold=0.5)
    # cross side empty; within-batch pairs still work against the
    # empty index (records 1/2 share 3 of 5 tokens, J=0.6)
    assert _got(spark, path, batch=CORPUS[:2],
                include_new_pairs=False) == set()
    assert _got(spark, path, batch=CORPUS[:2]) == {(1, 2, 0.6)}
    # a batch whose sets all drop returns empty against a real index
    path2 = str(tmp_path / "jreal")
    jaccard_index_write(_docs(spark, CORPUS), path2, "doc_id",
                        "tokens", threshold=0.5)
    assert _got(spark, path2, batch=[(9, []), (10, None)]) == set()
