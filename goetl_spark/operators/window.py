"""Window-function helpers: ranking, analytic, frames, sessionization.

Beyond the reference surface — goetl has no window functions (README
roadmap, SURVEY.md §2.6) — but first-class here because every warehouse
pipeline needs them. All are native Catalyst Window operators: one shuffle
on partition keys, sort within partitions, whole-stage codegen.

Scale note: a Window without ``partitionBy`` collapses to a single
partition — never do that at 100 TB. Every helper requires partition keys.
Sessionization is the gaps-and-islands pattern: two window passes over the
same partitioning (Catalyst reuses the exchange, so it's one shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win(partition_by: Sequence[str], order_by: Sequence[str | Column]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_row_number(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str | Column], out: str = "row_number") -> DataFrame:
    return df.withColumn(out, F.row_number().over(_win(partition_by, order_by)))


def with_rank(df: DataFrame, partition_by: Sequence[str],
              order_by: Sequence[str | Column], out: str = "rank",
              dense: bool = False) -> DataFrame:
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(out, fn.over(_win(partition_by, order_by)))


def with_lag(df: DataFrame, col: str, partition_by: Sequence[str],
             order_by: Sequence[str | Column], offset: int = 1,
             out: str | None = None) -> DataFrame:
    return df.withColumn(out or f"{col}_lag", F.lag(col, offset).over(_win(partition_by, order_by)))


def with_lead(df: DataFrame, col: str, partition_by: Sequence[str],
              order_by: Sequence[str | Column], offset: int = 1,
              out: str | None = None) -> DataFrame:
    return df.withColumn(out or f"{col}_lead", F.lead(col, offset).over(_win(partition_by, order_by)))


def with_running(df: DataFrame, agg: Column, partition_by: Sequence[str],
                 order_by: Sequence[str | Column], out: str) -> DataFrame:
    """Running aggregate over rows UNBOUNDED PRECEDING..CURRENT ROW."""
    w = _win(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, agg.over(w))


def top_n_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str | Column], n: int) -> DataFrame:
    """Keep the top-n rows of each group (row_number filter)."""
    tmp = "__rn"
    out = with_row_number(df, partition_by, order_by, tmp)
    return out.filter(F.col(tmp) <= n).drop(tmp)


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap since the
    previous event in the partition exceeds ``gap_seconds``.

    Gaps-and-islands: lag(ts) → new-session flag → running sum of flags.
    Both window passes share one partitioning/sort, so Catalyst plans a
    single exchange. (Streaming equivalent: F.session_window in
    goetl_spark.streaming.)
    """
    w = _win(partition_by, [ts_col])
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col(ts_col).cast("double") - prev_ts.cast("double") > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, running)
