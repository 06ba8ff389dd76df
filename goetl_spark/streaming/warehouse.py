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
from pyspark.sql.streaming import StreamingQuery

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
        dim = spark.read.parquet(dimension_path)
        merged = scd_type2(
            batch_df, dim, key_fields, tracked_fields,
            effective_date=effective_date,
        )
        staging = dimension_path.rstrip("/") + ".__scd2_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        backup = dimension_path.rstrip("/") + ".__scd2_old__"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(dimension_path, backup)
        os.rename(staging, dimension_path)
        shutil.rmtree(backup)

    w = (change_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


_BATCH_MARKER = "_applied_batch_id"


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
    ``batch_id`` is written INSIDE the staging directory before the
    atomic rename, so the marker and the data it describes swap in as
    one unit, and any batch with ``batch_id <= marker`` is skipped. A
    crash between checkpoint-commit and swap replays the batch (marker
    says unapplied -> applied exactly once); a crash after the swap
    skips it (marker says applied). Exactly-once either way.

    The first batch bootstraps the table if ``rollup_path`` does not
    exist yet — no separate seeding step.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        marker = os.path.join(rollup_path, _BATCH_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # at-least-once replay of an applied batch
        delta = hypertable_rollup(batch_df, ts_col, keys, value_col, grains)
        if os.path.exists(rollup_path):
            existing = spark.read.parquet(rollup_path)
            merged = rollup_merge(existing, delta, keys)
        else:
            merged = rollup_merge(delta.limit(0), delta, keys)
        staging = rollup_path.rstrip("/") + ".__rollup_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
        backup = rollup_path.rstrip("/") + ".__rollup_old__"
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(rollup_path):
            os.rename(rollup_path, backup)
        os.rename(staging, rollup_path)
        shutil.rmtree(backup, ignore_errors=True)

    w = (event_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
