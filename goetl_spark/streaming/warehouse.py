"""Streaming warehouse maintenance: incremental SCD2 over a live stream.

Combines the reference's SCD machinery (dag/tasks/scd.go:97-161, batch
only) with Structured Streaming: each micro-batch of source changes is
merged into a parquet dimension table with :func:`~goetl_spark.operators
.scd.scd_type2` semantics — close changed current rows, insert new
versions, keep history.

Delivery contract: foreachBatch is at-least-once, and the SCD2 merge is
IDEMPOTENT — re-applying a batch whose changes are already in the
dimension finds every tracked field unchanged and rewrites the identical
table — so replays converge (same reasoning as the upsert sink in
streaming/sinks.py).

Scale notes: each trigger rewrites the dimension (read + broadcast-join
against the batch + write). That is the right trade for DIMENSION tables
— even at 100 TB of facts, dimensions are orders of magnitude smaller,
and the rewrite is one columnar scan. Fact-scale targets would need a
merge-on-read table format (Iceberg/Delta) instead of raw parquet; the
swap protocol here is the same two-rename trick as
operators/maintenance.py so concurrent readers never see a half-written
dimension.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from goetl_spark import fs
from goetl_spark.operators.scd import scd_type2
from goetl_spark.operators.timeseries import hypertable_rollup, rollup_merge


def stream_scd2(
    change_stream: DataFrame,
    dimension_path: str,
    key_fields: Sequence[str],
    tracked_fields: Sequence[str],
    checkpoint_dir: str,
    effective_date: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain a parquet SCD2 dimension from a stream of change records.

    The dimension at ``dimension_path`` must already exist with the SCD
    columns (effective_from / effective_to / is_current) — seed it with
    one batch ``scd_type2`` write. Each micro-batch applies the standard
    merge and atomically swaps the rewritten table in.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        backup = dimension_path.rstrip("/") + ".__scd2_old__"
        _restore_if_interrupted(dimension_path, backup)
        dim = spark.read.parquet(dimension_path)
        merged = scd_type2(
            batch_df, dim, key_fields, tracked_fields,
            effective_date=effective_date,
        )
        staging = dimension_path.rstrip("/") + ".__scd2_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        fs.two_rename_swap(dimension_path, staging, backup)

    w = (change_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


_BATCH_MARKER = "_applied_batch_id"
_PART_COL = "__part"

# the swap primitives (and THE local-FS portability caveat) live in
# goetl_spark/fs.py — one documented location for the whole family
# (stream_scd2, stream_rollup, compact_parquet); aliased here because
# the r12/r13 fixes landed under these names
_restore_if_interrupted = fs.restore_if_interrupted
_link_or_copy_tree = fs.link_or_copy_tree


def stream_rollup(
    event_stream: DataFrame,
    rollup_path: str,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    checkpoint_dir: str,
    grains: Sequence[str] = ("hour", "day", "week"),
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming continuous aggregate: maintain a persisted
    :func:`~goetl_spark.operators.timeseries.hypertable_rollup` table
    from a live event stream — the TimescaleDB continuous-aggregate /
    Druid ingestion shape. Each micro-batch is rolled up to partials
    (one batch-sized shuffle at the finest grain) and
    :func:`~goetl_spark.operators.timeseries.rollup_merge`-d into the
    standing table; history is NEVER rescanned, which is the whole
    point at 100 TB — a day's refresh touches a day's events plus a
    rollup-sized (buckets x keys) table.

    Delivery contract: foreachBatch is at-least-once, and unlike
    ``stream_scd2``'s merge, merging PARTIALS is NOT idempotent — a
    replayed batch would double its counts and sums. Replay safety
    therefore comes from a transactional batch marker: the applied
    ``batch_id`` is written INSIDE the new table root before the
    atomic rename, so the marker and the data it describes swap in as
    one unit, and any batch with ``batch_id <= marker`` is skipped. A
    crash between checkpoint-commit and swap replays the batch (marker
    says unapplied -> applied exactly once); a crash after the swap
    skips it (marker says applied); a crash BETWEEN the two renames is
    repaired on the next trigger by restoring the backup (the live
    root is only ever absent while the backup exists). Exactly-once
    at every crash point.

    Incremental-rewrite shape (the growth bound): the standing table
    is partitioned by ``(grain, date(bucket))``, and each trigger
    READS + REWRITES only the partitions its batch touches — bytes
    written per trigger are proportional to the batch's time range,
    not the table's. Untouched partitions enter the new table root as
    hard links (no data bytes moved), so the whole-root rename stays
    the single atomic commit point; without this, a years-deep hourly
    rollup would be fully rewritten every trigger even though a
    trigger touches one day. Swap-scratch directories live next to
    ``rollup_path`` on the same filesystem; atomic rename + hard links
    are local-FS/HDFS semantics — an object-store deployment needs a
    table format (Iceberg/Delta) for the same commit, the
    operators/maintenance.py caveat.

    The first batch bootstraps the table if ``rollup_path`` does not
    exist yet — no separate seeding step.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # no empty-batch pre-probe (r17, the change-4 discipline): the
        # probe cost a full Spark job EVERY trigger to guard a path
        # that file-source replays never take, and an empty batch's
        # merge is bounded anyway (zero touched partitions -> pure
        # hard-link cycle, no data bytes). stream_scd2 keeps its probe
        # because its empty path would rewrite the whole dimension.
        spark = batch_df.sparkSession
        backup = rollup_path.rstrip("/") + ".__rollup_old__"
        _restore_if_interrupted(rollup_path, backup)
        marker = os.path.join(rollup_path, _BATCH_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # at-least-once replay of an applied batch

        part = F.date_format(F.col("bucket"), "yyyy-MM-dd")
        # rollup-sized (batch buckets x keys) — pin it so the touched-
        # partition probe and the merge don't re-aggregate the batch.
        # The touched-partition set rides the SAME materialization as an
        # Observation (r18, the dedup_clusters change-16 pattern): the
        # old separate distinct().collect() was one extra Spark job on
        # EVERY trigger of a path where jobs-per-trigger is the runtime.
        # collect_set is bounded by grains x the batch's days (the same
        # bound the collect had); grain/part are never NULL.
        from pyspark.sql import Observation

        obs = Observation()
        delta = (hypertable_rollup(batch_df, ts_col, keys, value_col, grains)
                 .withColumn(_PART_COL, part)
                 .observe(obs, F.collect_set(
                     F.struct("grain", F.col(_PART_COL))).alias("touched"))
                 .localCheckpoint(eager=True))
        exists = os.path.exists(rollup_path)
        if exists:
            # touched partitions: bounded by grains x the batch's days
            touched = sorted((r["grain"], r[_PART_COL])
                             for r in (obs.get["touched"] or []))
            pred = None
            for g, p in touched:
                c = (F.col("grain") == g) & (F.col(_PART_COL) == p)
                pred = c if pred is None else pred | c
            # partition-pruned scan: only the touched directories read
            existing = (spark.read.parquet(rollup_path)
                        .filter(pred).drop(_PART_COL))
            merged = rollup_merge(existing, delta.drop(_PART_COL), keys)
        else:
            touched = None  # bootstrap: everything is new
            merged = rollup_merge(delta.limit(0).drop(_PART_COL),
                                  delta.drop(_PART_COL), keys)

        staging = rollup_path.rstrip("/") + ".__rollup_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        (merged.withColumn(_PART_COL, part)
         .write.mode("overwrite").partitionBy("grain", _PART_COL)
         .parquet(staging))

        if exists:
            # assemble the new root: hard-link every untouched
            # partition dir from the live table, then move the
            # rewritten (touched) ones in from staging
            newroot = rollup_path.rstrip("/") + ".__rollup_next__"
            shutil.rmtree(newroot, ignore_errors=True)
            os.makedirs(newroot)
            touched_set = {f"grain={g}/{_PART_COL}={p}" for g, p in touched}
            for gdir in os.listdir(rollup_path):
                gpath = os.path.join(rollup_path, gdir)
                if not (os.path.isdir(gpath) and gdir.startswith("grain=")):
                    continue
                for pdir in os.listdir(gpath):
                    if f"{gdir}/{pdir}" in touched_set:
                        continue
                    _link_or_copy_tree(os.path.join(gpath, pdir),
                                       os.path.join(newroot, gdir, pdir))
            for g, p in touched:
                rel = os.path.join(f"grain={g}", f"{_PART_COL}={p}")
                src = os.path.join(staging, rel)
                if os.path.isdir(src):  # a merge never deletes a bucket
                    os.renames(src, os.path.join(newroot, rel))
            shutil.rmtree(staging, ignore_errors=True)
            staging = newroot

        with open(os.path.join(staging, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
        fs.two_rename_swap(rollup_path, staging, backup,
                           path_exists=exists)

    w = (event_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
