"""Streaming appends into the standing indexes
(streaming/indexes.py::stream_index_append / make_index_appender).

The load-bearing claims:

1. EQUIVALENCE — after the stream drains, the index state (and hence
   the candidates a later batch pulls) equals what one-shot batch
   appends of the same rows would have produced; for the jaccard
   family that transitively pins it to jaccard_join's exact answer
   (its own suite's law).
2. IDEMPOTENCE MARKER — a re-delivered batch_id is skipped (the
   stream_rollup discipline applied to appends), and a NEWER batch_id
   still appends.
3. LOUD BOOTSTRAP — a stream pointed at a missing index fails on the
   first trigger with the writers' missing-manifest error, never a
   silent mis-configured append.
"""
from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.dedup import (
    jaccard_index_candidates,
    jaccard_index_write,
    jaccard_join,
    lsh_index_candidates,
    lsh_index_write,
)
from goetl_spark.streaming.indexes import (
    _marker_read,
    make_index_appender,
    stream_index_append,
)
from goetl_spark.streaming.sources import replay_stream


def _scratch(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


CORPUS = [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "e"]),
          (3, ["x", "y", "z", "w"]), (4, ["m", "n"])]
DAY2 = [(11, ["a", "b", "c", "d"]), (12, ["x", "y", "z", "w", "q"]),
        (13, ["m", "n"]), (14, ["u", "v"])]
BATCH = [(21, ["a", "b", "c", "e"]), (22, ["u", "v"]), (23, ["m", "n"])]


def test_streamed_jaccard_appends_equal_batch_appends(spark):
    tau = 0.6
    streamed, batched = _scratch("goetl_t_sia_s"), _scratch("goetl_t_sia_b")
    for p in (streamed, batched):
        jaccard_index_write(_docs(spark, CORPUS), p, "doc_id", "tokens",
                            threshold=tau)
    # batch reference: one-shot append of all day-2 rows
    jaccard_index_write(_docs(spark, DAY2), batched, "doc_id", "tokens",
                        threshold=tau, mode="append")
    # streamed: same rows arriving over micro-batches
    stream = replay_stream(_docs(spark, DAY2), num_chunks=3,
                           dir=_scratch("goetl_t_sia_replay"))
    q = stream_index_append(stream, streamed,
                            _scratch("goetl_t_sia_ckpt"), "jaccard",
                            id_col="doc_id", tokens_col="tokens",
                            threshold=tau)
    q.awaitTermination()

    def pulls(path):
        return {(r["query_id"], r["match_id"], round(r["jaccard"], 9))
                for r in jaccard_index_candidates(
                    _docs(spark, BATCH), path, "doc_id", "tokens").collect()}

    got, want = pulls(streamed), pulls(batched)
    assert got == want and got  # non-vacuous
    # and transitively exact vs the one-shot join over corpus+day2
    full = _docs(spark, CORPUS + DAY2)
    cross = {(r["doc_id"], r["r_id"], round(r["jaccard"], 9))
             for r in jaccard_join(
                 _docs(spark, BATCH),
                 full.selectExpr("doc_id AS r_id", "tokens"),
                 "doc_id", "tokens", "r_id", "tokens", tau).collect()}
    within = {(a, b, j) for (a, b, j) in pulls(streamed)
              if a in {r[0] for r in BATCH} and b in {r[0] for r in BATCH}}
    assert got == cross | within


def test_marker_skips_replayed_batch_and_accepts_next(spark):
    path = _scratch("goetl_t_sia_marker")
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog {i}")
         for i in range(8)], "doc_id long, text string")
    lsh_index_write(docs.filter("doc_id < 4"), path)
    apply_ = make_index_appender(path, "lsh")
    day2 = docs.filter("doc_id >= 4")
    apply_(day2, batch_id=0)
    n_after_first = spark.read.parquet(path).count()
    assert _marker_read(spark, path) == 0
    # re-delivery of the same batch_id: the marker says applied
    apply_(day2, batch_id=0)
    assert spark.read.parquet(path).count() == n_after_first
    # a NEWER batch appends and advances the marker
    apply_(day2.withColumn("doc_id", F.col("doc_id") + 100), batch_id=1)
    assert spark.read.parquet(path).count() > n_after_first
    assert _marker_read(spark, path) == 1
    # candidates see the streamed rows (config gate passes via manifest)
    assert lsh_index_candidates(day2, path).count() > 0


def test_missing_index_fails_loudly(spark):
    apply_ = make_index_appender(_scratch("goetl_t_sia_missing"),
                                 "jaccard", threshold=0.8)
    with pytest.raises(ValueError, match="no readable manifest"):
        apply_(_docs(spark, CORPUS), batch_id=0)
    with pytest.raises(ValueError, match="kind must be"):
        make_index_appender("/tmp/x", "nope")


def test_appender_edit_and_ann_kinds(spark):
    """The dispatcher's other families: streamed appends into the
    PassJoin and IVF indexes equal one-shot batch appends (the
    jaccard law, spot-checked per kind — each writer's own suite
    pins the deeper exactness)."""
    from goetl_spark.operators.dedup import (
        edit_distance_index_candidates, edit_distance_index_write)
    from goetl_spark.operators.similarity import (
        ann_index_search, ann_index_write)

    # edit-distance index
    strs = spark.createDataFrame(
        [(1, "kitten"), (2, "mitten"), (3, "sitting")],
        "doc_id long, text string")
    day2 = spark.createDataFrame(
        [(11, "bitten"), (12, "sittin")], "doc_id long, text string")
    es, eb = _scratch("goetl_t_sia_es"), _scratch("goetl_t_sia_eb")
    for p in (es, eb):
        edit_distance_index_write(strs, p, max_dist=2)
    edit_distance_index_write(day2, eb, max_dist=2, mode="append")
    make_index_appender(es, "edit", max_dist=2)(day2, batch_id=0)
    batch = spark.createDataFrame([(21, "bitten")],
                                  "doc_id long, text string")

    def epull(p):
        return {(r["query_id"], r["match_id"], r["edit_dist"])
                for r in edit_distance_index_candidates(
                    batch, p, max_dist=1).collect()}

    assert epull(es) == epull(eb) and (21, 11, 0) in epull(es)

    # IVF index (frozen centroids: append assigns, never re-fits)
    vecs = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0])
         for i in range(20)], "vec_id long, embedding array<float>")
    vday2 = vecs.withColumn("vec_id", F.col("vec_id") + 100)
    as_, ab = _scratch("goetl_t_sia_as"), _scratch("goetl_t_sia_ab")
    for p in (as_, ab):
        ann_index_write(vecs, p, k_cells=3, iterations=1)
    ann_index_write(vday2, ab, mode="append")
    make_index_appender(as_, "ann")(vday2, batch_id=0)
    probe = vecs.limit(4)

    def apull(p):
        return {(r["query_id"], r["neighbor_id"], r["rank"])
                for r in ann_index_search(probe, p, k=5,
                                          nprobe=3).collect()}

    assert apull(as_) == apull(ab) and apull(as_)


def test_reset_marker_for_new_stream(spark):
    """Fresh-checkpoint footgun: batch ids restart at 0, so a stale
    marker would silently swallow the new stream's first batches —
    reset_index_marker is the documented re-pointing step."""
    from goetl_spark.streaming.indexes import reset_index_marker

    path = _scratch("goetl_t_sia_reset")
    jaccard_index_write(_docs(spark, CORPUS), path, "doc_id", "tokens",
                        threshold=0.8)
    apply_ = make_index_appender(path, "jaccard", id_col="doc_id",
                                 tokens_col="tokens", threshold=0.8)
    apply_(_docs(spark, DAY2), batch_id=5)
    n = spark.read.parquet(f"{path}/records").count()
    # a NEW stream restarts at 0: without the reset its batch is lost
    newday = [(31, ["p", "q"]), (32, ["p", "r"])]
    apply_(_docs(spark, newday), batch_id=0)
    assert spark.read.parquet(f"{path}/records").count() == n
    reset_index_marker(spark, path)
    assert _marker_read(spark, path) is None
    apply_(_docs(spark, newday), batch_id=0)
    assert spark.read.parquet(f"{path}/records").count() == n + 2
