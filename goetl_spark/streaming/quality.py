"""Streaming drift monitoring — the streaming twin of the PSI surface
(goetl_spark/quality.py::population_stability_index), same discipline
as the other twins (streaming/warehouse.py, streaming/sinks.py): the
batch operator defines the semantics, the stream accumulates state
incrementally, and the accumulated result is BIT-EXACT to the batch
operator over the same data — verified by oracle, not argued.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from goetl_spark import fs
from goetl_spark.quality import _bin_case_sql, _psi_edges
from goetl_spark.streaming.warehouse import (
    _BATCH_MARKER, _restore_if_interrupted)


def stream_psi_monitor(
    event_stream: DataFrame,
    counts_path: str,
    value_col: str,
    breaks: Sequence[float],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Accumulate a streaming column's PSI bin counts into a persisted
    ``(bin_id, n)`` table — the incremental half of continuous drift
    monitoring: the standing table always equals
    ``bin_counts(everything_seen_so_far)``, so at ANY point
    ``psi_from_counts(read(counts_path), reference)`` is the exact PSI
    of the accumulated stream against the fitted reference (fit once
    with quality.py::bin_counts, persist, reuse — the fixed-edges PSI
    discipline). Split-invariant by construction: merged counts are
    independent of how history was chopped into micro-batches, which
    is also exactly what makes the contract oracle-checkable.

    Replay safety is the stream_rollup recipe, same reasoning: count
    accumulation is NOT idempotent, so exactly-once comes from the
    transactional batch-id marker swapped atomically WITH the table,
    and a crash between the two renames is repaired on entry. Unlike
    the rollup, the standing table here is BINS-BOUNDED (≤ edges + 2
    rows, it never grows with time range), so the whole-table
    read+rewrite per trigger is the correct plan, not a scale hazard —
    no partition assembly needed.

    Per trigger: ONE job — batch-sized map + bins-sized shuffle,
    bins-sized merge, tiny table swap (r17: the old ``head(1)``
    empty-batch pre-probe was its own job per trigger; an empty
    batch's merge is a no-op rewrite, so the probe bought nothing —
    guide §1.2). NULL values land in the −1
    bin (a null-rate shift IS drift, the batch operator's contract)."""
    edges = _psi_edges(breaks)
    case = _bin_case_sql(value_col, edges)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        backup = counts_path.rstrip("/") + ".__psi_old__"
        _restore_if_interrupted(counts_path, backup)
        marker = os.path.join(counts_path, _BATCH_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # at-least-once replay of an applied batch
        delta = (batch_df.select(F.expr(case).alias("bin_id"))
                 .groupBy("bin_id")
                 .agg(F.count(F.lit(1)).alias("n")))
        if os.path.exists(counts_path):
            existing = spark.read.parquet(counts_path)
            merged = (existing.unionByName(delta)
                      .groupBy("bin_id").agg(F.sum("n").alias("n")))
        else:
            merged = delta
        staging = counts_path.rstrip("/") + ".__psi_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        (merged.select("bin_id", F.col("n").cast("long").alias("n"))
         .coalesce(1).write.mode("overwrite").parquet(staging))
        with open(os.path.join(staging, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
        fs.two_rename_swap(counts_path, staging, backup,
                           path_exists=os.path.exists(counts_path))

    w = (event_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_benford_monitor(
    event_stream: DataFrame,
    counts_path: str,
    value_col: str,
    checkpoint_dir: str,
    group_cols: Sequence[str] = (),
    value_scale: int = 4,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Accumulate a streaming column's sentinel leading-digit counts
    into a persisted ``(group..., __d, __nd)`` table — the streaming
    twin of :func:`goetl_spark.quality.benford_profile`, same
    contract shape as :func:`stream_psi_monitor`: the standing table
    always equals the batch digit collapse of everything seen, so at
    ANY point ``benford_from_counts(read(counts_path), group_cols)``
    is bit-exact to ``benford_profile(everything_so_far)`` — the
    drift canary runs continuously without ever re-scanning history.
    Digits come from the SAME :func:`~goetl_spark.quality.
    _benford_digit` expression the batch operator compiles (identical
    digits are WHAT makes the twin bit-exact); NaN rows accumulate in
    the −1 sentinel and fail loudly at READ time exactly as the batch
    profile does.

    Replay safety is the stream_rollup recipe (transactional batch-id
    marker swapped atomically with the table, crash-window repaired
    on entry — count accumulation is not idempotent). The standing
    table is (groups × 11)-BOUNDED, so whole-table read+rewrite per
    trigger is the correct plan (the stream_psi_monitor reasoning);
    group columns must be class-valued — the classes bound is the
    contract.

    Per trigger: ONE job — batch-sized map + classes-sized shuffle,
    classes-sized merge, tiny table swap (r17: the ``head(1)``
    empty-batch pre-probe was a whole extra job per trigger for a
    case whose merge is a no-op — removed, guide §1.2)."""
    from goetl_spark.quality import _benford_digit

    groups = list(group_cols)
    digit = _benford_digit(value_col, int(value_scale))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        backup = counts_path.rstrip("/") + ".__benford_old__"
        _restore_if_interrupted(counts_path, backup)
        marker = os.path.join(counts_path, _BATCH_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # at-least-once replay of an applied batch
        delta = (batch_df.filter(F.col(value_col).isNotNull())
                 .groupBy(*groups, digit.alias("__d"))
                 .agg(F.count(F.lit(1)).alias("__nd")))
        if os.path.exists(counts_path):
            existing = spark.read.parquet(counts_path)
            merged = (existing.unionByName(delta)
                      .groupBy(*groups, "__d")
                      .agg(F.sum("__nd").alias("__nd")))
        else:
            merged = delta
        staging = counts_path.rstrip("/") + ".__benford_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        (merged.select(*groups, "__d",
                       F.col("__nd").cast("long").alias("__nd"))
         .coalesce(1).write.mode("overwrite").parquet(staging))
        with open(os.path.join(staging, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
        fs.two_rename_swap(counts_path, staging, backup,
                           path_exists=os.path.exists(counts_path))

    w = (event_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_c2st_monitor(
    event_stream: DataFrame,
    counts_path: str,
    cat_cols: Sequence[str],
    fold_col: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Accumulate a stream's C2ST cell/fold counts into a persisted
    ``(cat_cols..., __f, n)`` table — the streaming twin of
    :func:`goetl_spark.quality.classifier_two_sample_test`, same
    contract shape as :func:`stream_psi_monitor`: the standing table
    always equals ``cell_fold_counts(everything_seen_so_far)``, so at
    ANY point ``c2st_from_counts(reference, read(counts_path))`` is
    the exact multivariate drift readout of the accumulated stream
    against a once-fitted reference (fit with quality.py::
    cell_fold_counts, persist, reuse). Continuous MULTIVARIATE drift
    monitoring without re-scanning history — the per-column monitors
    (:func:`stream_psi_monitor` numeric, :func:`stream_benford_monitor`
    authenticity) cannot see a joint-only shift; this one can, and
    the z readout gives the act threshold as the sample grows.

    Split-invariant by construction (merged counts are independent of
    how history was chopped into micro-batches — what makes the twin
    oracle-checkable bit-exactly). Replay safety is the stream_rollup
    recipe (transactional batch-id marker swapped atomically with the
    table, crash-window repaired on entry — count accumulation is not
    idempotent). The standing table is (cells × 2)-BOUNDED (the
    class-valued-columns contract), so whole-table read+rewrite per
    trigger is the correct plan, not a scale hazard. Fold validation
    happens at COMPARE time (c2st_from_counts raises on a non-0/1 or
    one-sided fold — a count table has no row to blame mid-stream).

    Per trigger: ONE job — batch-sized map + cells-sized shuffle,
    cells-sized merge, tiny table swap (r17: the ``head(1)``
    empty-batch pre-probe was a whole extra job per trigger for a
    case whose merge is a no-op — removed, guide §1.2)."""
    cats = list(cat_cols)
    if not cats:
        raise ValueError("cat_cols must be non-empty")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        backup = counts_path.rstrip("/") + ".__c2st_old__"
        _restore_if_interrupted(counts_path, backup)
        marker = os.path.join(counts_path, _BATCH_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # at-least-once replay of an applied batch
        delta = (batch_df
                 .groupBy(*cats, F.col(fold_col).alias("__f"))
                 .agg(F.count(F.lit(1)).alias("n")))
        if os.path.exists(counts_path):
            existing = spark.read.parquet(counts_path)
            merged = (existing.unionByName(delta)
                      .groupBy(*cats, "__f")
                      .agg(F.sum("n").alias("n")))
        else:
            merged = delta
        staging = counts_path.rstrip("/") + ".__c2st_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        (merged.select(*cats, "__f", F.col("n").cast("long").alias("n"))
         .coalesce(1).write.mode("overwrite").parquet(staging))
        with open(os.path.join(staging, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
        fs.two_rename_swap(counts_path, staging, backup,
                           path_exists=os.path.exists(counts_path))

    w = (event_stream.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
