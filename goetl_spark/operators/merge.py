"""General MERGE (upsert + delete) between two snapshots.

The warehouse-ops family member the reference implies but never ships:
goetl has CDC diffing (dag/tasks/cdc.go) and SCD variants
(dag/tasks/scd.go) but no SQL-MERGE-shaped "apply this changeset to that
table" operator; its postgres writer upserts row-at-a-time instead
(writers/postgresql.go:544-567). This is the DataFrame-level equivalent:

- matched + ``delete_condition`` (on source values)  → row deleted
- matched otherwise                                  → source values win
- target-only                                        → kept as-is
- source-only                                        → inserted (optional)

Result is the complete post-merge table — pair with an atomic-swap write
(operators/maintenance.py) or a table format for the commit.

Scale: one full-outer shuffle join on the merge keys — the minimal plan
for a snapshot merge; broadcast the source side automatically when the
changeset is small (Catalyst/AQE decide, or force with F.broadcast).
Like SQL MERGE, the source must have at most one row per key (duplicate
source keys would make the result nondeterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    delete_condition: Column | None = None,
    insert_unmatched: bool = True,
) -> DataFrame:
    """Apply ``source`` to ``target`` with MERGE semantics; both sides
    must share the target's schema (CDC-style full rows)."""
    keys = list(on)
    value_cols = [c for c in target.columns if c not in keys]

    t = target.withColumn("__in_t", F.lit(True)).alias("t")
    # delete flag evaluated on the SOURCE frame so callers reference its
    # columns naturally (F.col("acctbal") < 0), not through a join alias
    s = source.withColumn(
        "__del",
        delete_condition if delete_condition is not None else F.lit(False),
    ).withColumn("__in_s", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = eq if cond is None else cond & eq
    j = t.join(s, cond, "full_outer")

    in_t = F.col("t.__in_t").isNotNull()
    in_s = F.col("s.__in_s").isNotNull()

    # delete applies to MATCHED rows only (SQL MERGE WHEN MATCHED AND
    # cond THEN DELETE); source-only rows still insert
    j = j.filter(~(in_t & in_s & F.coalesce(F.col("s.__del"), F.lit(False))))
    if not insert_unmatched:
        j = j.filter(in_t)

    out = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ] + [
        F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    return j.select(*out)
