"""Streaming appends into the standing indexes — the day-2 legs of
record_linkage/incremental_ingest made CONTINUOUS (r15 verdict slack
item (a)): a stream of accepted documents/strings/vectors flows into a
persisted :mod:`~goetl_spark.operators.dedup` /
:mod:`~goetl_spark.operators.similarity` standing index via
``foreachBatch`` → ``*_index_write(mode='append')``, so tomorrow's
batch pull (``*_index_candidates`` / ``ann_index_search``) sees
everything accepted up to the last trigger without any corpus-side
recompute (the indexes' whole point: the rarity sort / segmentation /
centroid fit stay frozen; each micro-batch pays only its own
expansion).

Exactly-once discipline — the :func:`~goetl_spark.streaming.warehouse.
stream_rollup` batch-marker applied to appends: the applied
``batch_id`` is persisted at ``{path}/_applied_batch_id`` through the
same scheme-agnostic Hadoop-FS channel as the index manifest
(operators/index_meta.py), and any batch with ``batch_id <= marker``
is skipped. That closes the checkpoint-replay window (restart after a
committed trigger re-delivers the batch; the marker says applied).
Honest residual window, narrower than at-least-once but wider than
stream_rollup's atomic swap: a crash BETWEEN a committed leg append
and the marker write replays that one batch and duplicates its rows —
appends cannot ride a directory swap without rewriting the whole leg.
The failure mode is benign for the match semantics (a duplicated
index row re-emits a TRUE pair; no wrong pair can appear and none can
be lost) but changes multiplicities: consumers that need exact pair
multiplicity should ``dropDuplicates()`` the candidate output or
rebuild the index after a crash inside the window. The config gate
still holds — every micro-batch append re-validates the manifest, so
a mis-configured stream fails on its FIRST trigger, loudly.

Bootstrap contract: the index must already exist (build once with
``mode='overwrite'``); a stream pointed at a missing index fails on
the first non-empty batch with the writers' missing-manifest error.
Batch ids are scoped to the CHECKPOINT: re-pointing a new stream
(fresh checkpoint) at an existing index requires
:func:`reset_index_marker` first, or the restarted ids collide with
the stale marker and the new stream's first batches are skipped as
replays.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from goetl_spark.operators.index_meta import (
    _MARKER,
    file_delete,
    file_read_bytes,
    file_write_bytes,
)


def _marker_read(spark, path: str) -> int | None:
    """None means THE MARKER DOES NOT EXIST (fresh index/stream) and
    nothing else: a transient store error or a corrupt marker RAISES
    (file_read_bytes' contract) — treating "unreadable" as "never
    applied" would silently re-append a batch, the exact duplicate
    the marker exists to prevent."""
    data = file_read_bytes(spark, f"{path}/{_MARKER}")
    if data is None:
        return None
    return int(data.decode("utf-8").strip())


def _marker_write(spark, path: str, batch_id: int) -> None:
    file_write_bytes(spark, f"{path}/{_MARKER}",
                     str(int(batch_id)).encode("utf-8"))


def reset_index_marker(spark, index_path: str) -> None:
    """Delete the applied-batch marker — REQUIRED when pointing a NEW
    stream (fresh checkpoint) at an existing index: Spark's batch ids
    are scoped to the checkpoint, so a fresh stream restarts at
    batch_id 0 and a stale marker would make the idempotence skip
    silently swallow the new stream's first batches. One stream, one
    checkpoint, one marker — re-pointing means resetting (the same
    rule stream_rollup's checkpoint-scoped marker lives by). An
    overwrite REBUILD of the index resets automatically
    (index_meta.meta_invalidate removes the marker with the
    manifest)."""
    file_delete(spark, f"{index_path}/{_MARKER}")


def _index_writer(kind: str) -> Callable[..., None]:
    from goetl_spark.operators import dedup, similarity

    writers = {
        "lsh": dedup.lsh_index_write,
        "simhash": dedup.simhash_index_write,
        "jaccard": dedup.jaccard_index_write,
        "edit": dedup.edit_distance_index_write,
        "ann": similarity.ann_index_write,
    }
    if kind not in writers:
        raise ValueError(
            f"kind must be one of {sorted(writers)}, got {kind!r}")
    return writers[kind]


def make_index_appender(
    index_path: str, kind: str, **index_kwargs,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` applier, exposed for direct testing of the
    marker discipline (the stream_rollup test pattern): skip if
    ``batch_id <= marker``, append through the index's own writer
    (manifest re-validated every batch), then advance the marker."""
    writer = _index_writer(kind)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        last = _marker_read(spark, index_path)
        if last is not None and batch_id <= last:
            return
        writer(batch_df, index_path, mode="append", **index_kwargs)
        _marker_write(spark, index_path, batch_id)

    return _apply


def stream_index_append(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    kind: str,
    trigger_available_now: bool = True,
    **index_kwargs,
) -> StreamingQuery:
    """Continuously append a stream of accepted records into a
    standing index. ``kind`` selects the index family (``'lsh'`` /
    ``'simhash'`` / ``'jaccard'`` / ``'edit'`` / ``'ann'``);
    ``index_kwargs`` are passed to the family's ``*_index_write``
    (column names and the config the manifest gate validates — e.g.
    ``threshold=`` for jaccard, ``max_dist=`` for edit). Scale shape
    per trigger: exactly the batch append's (the micro-batch pays its
    own sort/expansion/assign against the frozen corpus state; the
    standing legs are never rewritten)."""
    applier = make_index_appender(index_path, kind, **index_kwargs)
    w = (doc_stream.writeStream.foreachBatch(applier)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
