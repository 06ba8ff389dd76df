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


def topk_per_group_partial(
    df: DataFrame, group_cols: Sequence[str], order_col: str, k: int,
    ascending: bool = False, tie_cols: Sequence[str] = (),
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-k per group via PARTIAL pre-aggregation — the 100 TB
    formulation of :func:`top_n_per_group`.

    The plain window shuffles EVERY row to its group's sort; since the
    global top-k of a group is contained in the union of its
    per-partition top-k's, phase 1 takes each input partition's local
    top-k per group with one vectorized pandas pass (zero shuffle), and
    only those ≤ k × groups-per-partition survivors reach phase 2's
    exact window. Shuffled rows drop from N to ~k · groups · partitions
    — the same map-side-combine idea partial SUM/MIN aggregation uses,
    applied to a ranking.

    ``tie_cols`` must make (order_col, \\*tie_cols) a total order within
    each group for a deterministic result (same contract the window
    version has). Null/NaN order and tie values sort LAST in both
    phases (pandas ``na_position='last'`` ↔ Spark ``asc_nulls_last``/
    ``desc``), so a null can never be pruned in phase 1 yet rank
    ahead in phase 2. Output = input columns + ``rank_col`` (1-based)."""
    import pandas as pd

    gcols = list(group_cols)
    ties = list(tie_cols)
    schema = df.schema

    def local_topk(batches):
        for pdf in batches:
            by = [order_col] + ties
            asc = [ascending] + [True] * len(ties)
            yield (pdf.sort_values(by=by, ascending=asc, kind="mergesort",
                                   na_position="last")
                   .groupby(gcols, dropna=False, sort=False)
                   .head(k))

    survivors = df.mapInPandas(local_topk, schema=schema)
    order = (F.col(order_col).asc_nulls_last() if ascending
             else F.col(order_col).desc())
    w = Window.partitionBy(*gcols).orderBy(
        order, *[F.col(c).asc_nulls_last() for c in ties])
    return (survivors.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


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
