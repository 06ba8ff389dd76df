"""Fan-in UNION ALL and set operations.

Reference: a DAG task with multiple dependencies receives all dependency
outputs concatenated — an implicit by-name UNION ALL over heterogeneous
records (dag/dag_executor.go:352-376). With typed DataFrames this is
``unionByName(allowMissingColumns=True)``: columns are matched by name and
missing ones become NULL, reproducing the map-of-fields behavior.

Set ops beyond the reference (SURVEY §2.6 'not present'): distinct,
intersect, except.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame


def fan_in(dfs: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL by column name; missing columns → NULL.

    Mirrors prepareTaskInput's concatenation of predecessor outputs
    (dag/dag_executor.go:358-369). Union is a no-shuffle operator in Spark
    — partitions of the inputs are simply concatenated.
    """
    if not dfs:
        raise ValueError("fan_in requires at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Distinct rows (optionally by a column subset). One hash-agg shuffle."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def intersect(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
