"""edit_distance_index_write / edit_distance_index_candidates — the
PassJoin standing index. Lossless claim: batch-vs-index candidates
must equal the one-shot edit_distance_join exactly (which is itself
pinned against naive all-pairs in its own suite). The novel leg vs the
one-shot is querying BELOW the build threshold: the stored d_idx+1-way
segmentation still pigeonholes d_q < d_idx edits when the batch
expansion enumerates the INDEX's slots with the query's tighter
tolerances — pinned here at (d_idx=2, d_q∈{0,1}).
"""
from __future__ import annotations

import pytest

from goetl_spark.operators.dedup import (
    edit_distance_index_candidates,
    edit_distance_index_write,
    edit_distance_join,
)

CORPUS = [
    (1, "kettle"), (2, "kettles"), (3, "battle"), (4, "rattle"),
    (5, "ox"), (6, ""), (7, "a"), (8, "completely-different"),
]
BATCH = [
    (10, "kettle"),   # 0 vs 1, 1 vs 2, 2 vs 3/4
    (11, "ax"),       # 1 vs 5, 2 vs 7
    (12, "b"),        # 1 vs 6/7, 2 vs 5
    (13, "nothing-like-these"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(spark, d, corpus=CORPUS, batch=BATCH):
    c = _df(spark, corpus).selectExpr("doc_id AS mid", "text")
    b = _df(spark, batch)
    return {(r["doc_id"], r["mid"], r["edit_dist"])
            for r in edit_distance_join(b, c, "doc_id", "text",
                                        "mid", "text", d).collect()}


def _got(spark, path, d=None, batch=BATCH):
    return {(r["query_id"], r["match_id"], r["edit_dist"])
            for r in edit_distance_index_candidates(
                _df(spark, batch), path, "doc_id", "text",
                max_dist=d).collect()}


def test_index_matches_oneshot(spark, tmp_path):
    path = str(tmp_path / "eidx")
    edit_distance_index_write(_df(spark, CORPUS), path, "doc_id",
                              "text", max_dist=2)
    got = _got(spark, path)
    assert got == _expected(spark, 2)
    assert (10, 1, 0) in got and (10, 2, 1) in got and (10, 3, 2) in got
    # short-string branch: "b" vs "" (1 edit) and vs "a" (1 edit)
    assert (12, 6, 1) in got and (12, 7, 1) in got


@pytest.mark.parametrize("dq", [0, 1])
def test_query_below_build_threshold(spark, tmp_path, dq):
    # the stored 3-way segmentation (d_idx=2) must pigeonhole dq<=1
    # edits losslessly when the batch enumerates it at +/-dq
    path = str(tmp_path / "eidx")
    edit_distance_index_write(_df(spark, CORPUS), path, "doc_id",
                              "text", max_dist=2)
    assert _got(spark, path, d=dq) == _expected(spark, dq)


def test_query_above_build_threshold_raises(spark, tmp_path):
    path = str(tmp_path / "eidx")
    edit_distance_index_write(_df(spark, CORPUS), path, "doc_id",
                              "text", max_dist=1)
    with pytest.raises(ValueError, match="rebuild"):
        edit_distance_index_candidates(_df(spark, BATCH), path,
                                       "doc_id", "text", max_dist=2)


def test_append_grows_losslessly(spark, tmp_path):
    path = str(tmp_path / "eidx")
    edit_distance_index_write(_df(spark, CORPUS[:4]), path, "doc_id",
                              "text", max_dist=2)
    edit_distance_index_write(_df(spark, CORPUS[4:]), path, "doc_id",
                              "text", max_dist=2, mode="append")
    assert _got(spark, path) == _expected(spark, 2)


def test_append_config_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "eidx")
    edit_distance_index_write(_df(spark, CORPUS), path, "doc_id",
                              "text", max_dist=2)
    with pytest.raises(ValueError, match="incomparable"):
        edit_distance_index_write(_df(spark, CORPUS), path, "doc_id",
                                  "text", max_dist=1, mode="append")


def test_validation(spark, tmp_path):
    d = _df(spark, CORPUS)
    with pytest.raises(ValueError, match=">= 0"):
        edit_distance_index_write(d, str(tmp_path / "x"), max_dist=-1)
    with pytest.raises(ValueError, match="wrong tool"):
        edit_distance_index_write(d, str(tmp_path / "x"), max_dist=9)
    with pytest.raises(ValueError, match="mode"):
        edit_distance_index_write(d, str(tmp_path / "x"), mode="nope")


def test_degenerate_leg_shapes(spark, tmp_path):
    # short/ or segments/ written from an EMPTY frame must still
    # round-trip (corpus all-long or all-short) — probed r15
    p1 = str(tmp_path / "elong")
    edit_distance_index_write(
        _df(spark, [(1, "abcdef"), (2, "abcdeg")]), p1, "doc_id",
        "text", max_dist=2)
    assert _got(spark, p1, batch=[(9, "abcdef")]) == {(9, 1, 0),
                                                      (9, 2, 1)}
    p2 = str(tmp_path / "eshort")
    edit_distance_index_write(_df(spark, [(1, "ab"), (2, "ac")]), p2,
                              "doc_id", "text", max_dist=2)
    assert _got(spark, p2, batch=[(9, "ab")]) == {(9, 1, 0), (9, 2, 1)}
