"""Change-data-capture by snapshot diff.

Reference: ``dag/tasks/cdc.go`` (SURVEY.md §2.7). The reference hash-indexes
the previous snapshot in memory and probes with the current one. Here the
same diff is ONE full-outer join on the key columns — distributed, one
shuffle, AQE-skew-safe — followed by a change-type classification:

- key only in current                → INSERT
- key only in previous              → DELETE
- key in both, any compare col diff → UPDATE
- key in both, all equal            → (dropped)

Parity points (dag/tasks/cdc.go:33-202):
- records with missing/NULL key fields are silently skipped (cdc.go:125-128)
  — NULL keys never match in a SQL join, and we filter NULL-key rows from
  both sides first so they can't surface as spurious INSERT/DELETE.
- UPDATE detection compares stringified values (cdc.go:176-186); we compare
  with null-safe equality on the native types (documented deviation — typed
  compare is strictly more correct).
- output rows carry ``change_type`` and ``change_timestamp`` (RFC3339 now,
  cdc.go:189-202). Pass ``timestamp=`` for a deterministic stamp (tests /
  oracle); default is ``F.current_timestamp()``.

Scale note: both sides shuffle on the key once. For a 100 TB current
snapshot vs small delta, put the small side second and let AQE broadcast;
for repeated daily diffs, bucket both snapshots by key on write so the
join is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INSERT = "INSERT"
UPDATE = "UPDATE"
DELETE = "DELETE"


def _non_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def capture_changes(
    current: DataFrame,
    previous: DataFrame,
    key_fields: Sequence[str],
    compare_fields: Sequence[str] | None = None,
    timestamp: str | Column | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff ``current`` against ``previous`` → change rows.

    Output schema: all columns of ``current`` (values from current for
    INSERT/UPDATE, from previous for DELETE) + ``change_type`` +
    ``change_timestamp``.

    ``compare_fields`` defaults to all non-key columns shared by both sides
    (the reference requires an explicit list, cdc.go:42-44; the default is a
    convenience).
    """
    keys = list(key_fields)
    cur = _non_null_keys(current, keys).alias("cur")
    prev = _non_null_keys(previous, keys).alias("prev")

    if compare_fields is None:
        compare_fields = [
            c for c in current.columns if c not in keys and c in previous.columns
        ]

    cond = None
    for k in keys:
        c = F.col(f"cur.{k}") == F.col(f"prev.{k}")
        cond = c if cond is None else (cond & c)

    joined = cur.join(prev, on=cond, how="full_outer")

    in_cur = F.col(f"cur.{keys[0]}").isNotNull()
    in_prev = F.col(f"prev.{keys[0]}").isNotNull()

    differs = F.lit(False)
    for c in compare_fields:
        # null-safe inequality: NULL vs value counts as a change
        differs = differs | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"prev.{c}"))

    change_type = (
        F.when(in_cur & ~in_prev, F.lit(INSERT))
        .when(~in_cur & in_prev, F.lit(DELETE))
        .when(differs, F.lit(UPDATE))
        .otherwise(F.lit(None))
    )

    # DELETE rows have no current side — surface the previous values so the
    # output record is populated (cdc.go emits the previous record for
    # deletes, cdc.go:161-171).
    out_cols = [
        F.coalesce(F.col(f"cur.{c}"), F.col(f"prev.{c}")).alias(c)
        if c in previous.columns
        else F.col(f"cur.{c}").alias(c)
        for c in current.columns
    ]

    if timestamp is None:
        ts: Column = F.current_timestamp()
    elif isinstance(timestamp, str):
        ts = F.to_timestamp(F.lit(timestamp))
    else:
        ts = timestamp

    out = joined.select(*out_cols, change_type.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type").isNotNull())
    return out.withColumn("change_timestamp", ts)
