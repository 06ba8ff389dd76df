"""Distributed global ranking and exact equi-depth (NTILE) binning —
without the single-partition window trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to
ONE task in Spark — the classic scale killer. This module computes the
same total-order rank in three scale-safe steps (the pattern
sampling.py::pack_sequences uses for its distributed cumsum):

1. ``repartitionByRange`` on the order key (range exchange — each
   partition holds a contiguous key range),
2. per-partition ``row_number`` over a PARTITIONED window,
3. add per-partition offsets — the cumsum of partition COUNTS, a
   ≤ #partitions-row driver array joined back as a broadcast map.

The order key must be made unique via tie columns (a non-total order
would make ranks nondeterministic in any engine). Exact NTILE bins
then follow from the rank arithmetically — bin sizes differ by at most
one, first ``N % B`` bins larger, matching ANSI NTILE exactly; the
row total comes from the already-collected partition sizes, not a
second pass."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _ranked(df: DataFrame, order_cols: Sequence[str], out: str,
            num_partitions: int | None) -> tuple[DataFrame, int]:
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # persisted for the same reason as sampling.pack_sequences: the
    # size-collection pass and the final plan must observe IDENTICAL
    # range boundaries (repartitionByRange re-samples on recompute);
    # the eager localCheckpoint below lets us release the cache before
    # returning.
    ranged = (df.repartitionByRange(n, *cols)
                .withColumn("__pid", F.spark_partition_id())
                .persist())
    try:
        sizes = sorted(
            ranged.groupBy("__pid")
                  .agg(F.count(F.lit(1)).alias("c")).collect())
        offsets, total = {}, 0
        for pid, c in sizes:
            offsets[pid] = total
            total += c
        if not offsets:  # empty input
            empty = ranged.withColumn(out, F.lit(1).cast("int")).drop("__pid")
            return empty, 0
        off = F.create_map(*[x for pid, o in offsets.items()
                             for x in (F.lit(pid), F.lit(o))])
        w = Window.partitionBy("__pid").orderBy(*cols)
        ranked = (ranged
                  .withColumn(out,
                              F.row_number().over(w) + off[F.col("__pid")])
                  .drop("__pid")
                  .localCheckpoint(eager=True))
        return ranked, total
    finally:
        ranged.unpersist()


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order 1-based rank over ``order_cols`` (must be a unique
    key combination for determinism) — distributed, never a global
    single-partition sort. The result is materialized eagerly
    (localCheckpoint) so the internal range-partition cache can be
    released before returning."""
    ranked, _ = _ranked(df, order_cols, out, num_partitions)
    return ranked


def ntile_bins(
    df: DataFrame,
    order_cols: Sequence[str],
    n_bins: int,
    out: str = "bin",
) -> DataFrame:
    """Exact ANSI ``NTILE(n_bins) OVER (ORDER BY order_cols)`` at
    scale: first ``N % n_bins`` bins hold ``ceil(N/n_bins)`` rows, the
    rest ``floor(N/n_bins)`` — identical to Spark's and DuckDB's
    single-window ntile, computed arithmetically from the distributed
    global rank."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    ranked, n_rows = _ranked(df, order_cols, "__r", None)
    size = n_rows // n_bins
    rem = n_rows % n_bins
    r0 = F.col("__r") - 1  # 0-based
    boundary = rem * (size + 1)
    bin_col = F.when(
        r0 < boundary, F.floor(r0 / (size + 1)) + 1
    ).otherwise(
        rem + F.floor((r0 - boundary) / F.greatest(F.lit(size), F.lit(1)))
        + 1
    ).cast("int")
    return ranked.withColumn(out, bin_col).drop("__r")
