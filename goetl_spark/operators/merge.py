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

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
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


def merge_partitioned(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: Sequence[str],
    partition_col: str,
    delete_condition: Column | None = None,
    insert_unmatched: bool = True,
    compression: str = "snappy",
) -> dict:
    """Merge-on-read for a parquet table partitioned by ``partition_col``:
    rewrite ONLY the partitions the changeset touches.

    :func:`merge` produces the complete post-merge table — at 100 TB that
    rewrites everything to apply a 1 GB changeset. Here the write (and the
    full-outer shuffle) is proportional to the TOUCHED data instead:

    1. the touched-partition set is the changeset's distinct
       ``partition_col`` values (driver-side list — partition counts are
       bounded by design, e.g. dates, not data size);
    2. the target is read WITH a ``partition_col IN touched`` filter, so
       Catalyst partition-prunes the scan to those directories;
    3. :func:`merge` runs on that subset (full-outer join sized by the
       touched partitions, broadcast when the changeset is small);
    4. the result is written per-partition to a staging dir and the
       touched directories are swapped in one at a time (backup kept
       until the new listing is verified — same local-FS demo scope and
       crash-recovery notes as operators/maintenance.py; a table format
       gives true multi-partition atomicity).

    CONSTRAINT (standard for partitioned merges): a source row's
    ``partition_col`` must name the partition its key lives in — i.e. the
    merge must not MOVE a key between partitions, or the old copy in the
    unlisted partition survives. Make ``partition_col`` part of the key
    or immutable under updates.

    Untouched partition directories are not read, written, or renamed —
    their files stay byte-identical (tests prove this).

    Returns stats: touched/total partition dirs.
    """
    touched = sorted(
        r[0] for r in source.select(partition_col).distinct().collect()
    )
    target = spark.read.parquet(path)
    tgt_sub = target.filter(F.col(partition_col).isin(touched))
    merged = merge(tgt_sub, source, on, delete_condition, insert_unmatched)

    staging = path.rstrip("/") + ".__merge_tmp__"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.repartition(F.col(partition_col))
     .write.mode("overwrite").option("compression", compression)
     .partitionBy(partition_col).parquet(staging))

    swapped, backups = [], []
    try:
        for v in touched:
            dname = f"{partition_col}={v}"
            src_dir, dst_dir = os.path.join(staging, dname), os.path.join(path, dname)
            bak_dir = dst_dir + ".__merge_old__"
            shutil.rmtree(bak_dir, ignore_errors=True)
            if os.path.exists(dst_dir):
                os.rename(dst_dir, bak_dir)
                backups.append((bak_dir, dst_dir))
            if os.path.isdir(src_dir):  # absent = every row of v deleted
                os.rename(src_dir, dst_dir)
            swapped.append(dname)
    except OSError:
        for bak_dir, dst_dir in backups:  # restore what we displaced
            shutil.rmtree(dst_dir, ignore_errors=True)
            os.rename(bak_dir, dst_dir)
        raise
    for bak_dir, _ in backups:
        shutil.rmtree(bak_dir, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)

    total_parts = sum(
        1 for d in os.listdir(path)
        if d.startswith(f"{partition_col}=") and os.path.isdir(os.path.join(path, d))
    )
    return {
        "touched_partitions": len(swapped),
        "total_partitions": total_parts,
    }
