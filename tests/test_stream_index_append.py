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
