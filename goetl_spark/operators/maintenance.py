"""Table maintenance: small-file compaction for parquet directories.

Beyond the reference surface (goetl writes a single local file per sink,
writers/csv.go:202-208, so it cannot have a small-files problem; any
distributed writer does). Streaming sinks, frequent incremental appends,
and high-cardinality ``partitionBy`` all accumulate files far smaller
than an HDFS/S3 block, and at 100 TB the resulting per-file open/seek
overhead dominates scan time — the canonical lakehouse maintenance task.

:func:`compact_parquet` rewrites a directory to ~``target_file_mb``
files. File count is derived from the ACTUAL byte size on disk (one
driver-side listing, no data job), then a single distributed
read→repartition→write pass does the rewrite.

Swap semantics (READ THIS before production use): the rewrite lands in a
sibling staging directory and is swapped in with two ``os.rename`` calls
— the shared primitive (and the full local-FS/object-store portability
caveat for the whole swap family) lives in :mod:`goetl_spark.fs`. A
crash between the renames leaves the data intact in
``<path>.__compact_old__`` and is REPAIRED automatically on the next
compaction entry (``fs.restore_if_interrupted``); the backup is only
deleted AFTER the new listing is verified, so no crash point loses
data. True atomic commits need a table format (Iceberg/Delta snapshot
swap) — out of scope here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from goetl_spark import fs


def _count_and_checksum(df) -> tuple[int, int]:
    """(row_count, order-independent content checksum) in ONE scan.

    The checksum is the exact SUM of per-row xxhash64 over every column,
    widened to decimal(38,0) — commutative (file/partition order never
    matters) and overflow-free under ANSI mode (2^63 × 10^10 rows ≪
    10^38). Columns are hashed in NAME order over string casts so the
    same logical content checksums identically across a partitionBy
    round-trip (read-back moves partition columns last and may narrow
    their types)."""
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree.

    Driver-local listing (os.walk): correct for file:// paths only —
    the demo scope of this module; see the swap note in the module doc.
    """
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("."):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> dict:
    """Rewrite ``path`` into ~target-sized parquet files.

    Without ``partition_by``: plain ``repartition(n_files)`` where
    ``n_files = total_bytes / target``.

    With ``partition_by``: rows are routed on (partition columns + a
    bounded salt). A plain ``repartition(n)`` would scatter every
    directory-partition's rows across all n tasks, emitting up to
    n × n_partition_values files — compaction would INCREASE file count
    for high-cardinality partitions. Instead each partition value v gets
    ``ceil(bytes_v / target)`` salt values (bytes_v estimated from the
    value's row share of the on-disk total — one small count aggregation),
    so every directory ends up with ~target-sized files and hot partitions
    still fan out across tasks. Returns before/after stats.
    """
    fs.restore_if_interrupted(path, path.rstrip("/") + ".__compact_old__")
    files_before, bytes_before = dir_stats(path)
    df = spark.read.parquet(path)
    # one pre-pass: row count + an order-independent content checksum
    # (sum of per-row xxhash64 in decimal — exact, commutative), so the
    # pre-swap gate catches duplicate-one-row/drop-another routing bugs
    # that a bare count comparison would miss, at no extra scan
    src_rows, src_sum = _count_and_checksum(df)

    staging = path.rstrip("/") + ".__compact_tmp__"
    shutil.rmtree(staging, ignore_errors=True)

    target_bytes = target_file_mb * 1024 * 1024
    if partition_by:
        # per-value file budget from row share: bytes_v ≈ rows_v/rows * total
        counts = df.groupBy(*partition_by).agg(F.count(F.lit(1)).alias("__rows"))
        total_rows = src_rows or 1
        bpr = bytes_before / total_rows  # bytes per row (compressed estimate)
        budgets = counts.withColumn(
            "__n_files",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("__rows") * F.lit(bpr) / F.lit(target_bytes)),
            ).cast("int"),
        ).drop("__rows")
        # Null-SAFE join: a NULL partition value (written by Spark as
        # __HIVE_DEFAULT_PARTITION__, read back as NULL) forms its own
        # groupBy budget row, but a plain equi-join would drop those rows
        # on NULL != NULL — silently losing them from the rewrite. Budget
        # keys are renamed first: budgets shares lineage with df, so
        # df[c] vs budgets[c] would resolve to a trivially-true self-compare.
        budgets = budgets.select(
            *[F.col(c).alias(f"__pb_{c}") for c in partition_by], "__n_files")
        bb = F.broadcast(budgets)
        cond = None
        for c in partition_by:
            eq = F.col(c).eqNullSafe(F.col(f"__pb_{c}"))
            cond = eq if cond is None else cond & eq
        joined = df.join(bb, cond).drop(*[f"__pb_{c}" for c in partition_by])
        salted = (
            joined
            .withColumn(
                "__salt",
                # F.col, not df[c]: joined derives from a df-with-df join,
                # where lineage-based attribute refs only resolve because
                # the __pb_* aliases took fresh expression IDs — plain
                # names are unambiguous here and robust across versions
                F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                       F.col("__n_files")),
            )
            .drop("__n_files")
        )
        out = salted.repartition(*(partition_by + ["__salt"])).drop("__salt")
        w = out.write.mode("overwrite").option("compression", compression)
        w = w.partitionBy(*partition_by)
    else:
        n_files = max(1, round(bytes_before / target_bytes))
        w = (df.repartition(n_files)
             .write.mode("overwrite").option("compression", compression))
    w.parquet(staging)

    # Content gate BEFORE the swap: any routing bug (or future edit that
    # reintroduces one) aborts with the original directory untouched.
    # Count AND checksum: equal counts with different content (duplicate
    # one row, drop another) also abort.
    staged_rows, staged_sum = _count_and_checksum(spark.read.parquet(staging))
    if staged_rows != src_rows or staged_sum != src_sum:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction aborted: staging has {staged_rows} rows "
            f"(checksum {staged_sum}), source has {src_rows} "
            f"(checksum {src_sum}); original {path} untouched")

    _swap_verified(path, staging)

    files_after, bytes_after = dir_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }


def _swap_verified(path: str, staging: str) -> None:
    """Two-rename swap of ``staging`` into ``path``; the backup is only
    deleted after the swapped-in listing matches what was staged, so no
    crash point loses data. A crash BETWEEN the renames is repaired on
    the next run: both compaction entries call
    ``fs.restore_if_interrupted`` before reading the live table (the
    same r12-class hardening stream_scd2/stream_rollup carry). The
    local-FS portability caveat for the whole swap family lives in
    goetl_spark/fs.py."""
    staged_files, staged_bytes = dir_stats(staging)
    backup = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    files_after, bytes_after = dir_stats(path)
    if files_after != staged_files or bytes_after != staged_bytes:
        os.rename(path, staging)
        os.rename(backup, path)
        raise RuntimeError(
            f"compaction swap verification failed ({files_after} files / "
            f"{bytes_after} B at {path}, staged {staged_files} / "
            f"{staged_bytes} B); original restored, rewrite left in {staging}")
    shutil.rmtree(backup)


def compact_incremental(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    small_file_mb: int = 16,
    min_small_files: int = 4,
    compression: str = "snappy",
) -> dict:
    """Compact ONLY the partition directories that need it.

    The streaming-sink companion job at scale: a table receiving
    continuous appends accumulates small files in the HOT partitions
    (today's date, active tenants) while cold directories are already
    healthy — rewriting the whole table per maintenance cycle
    (:func:`compact_parquet`) would make compaction cost proportional to
    table size instead of ingest rate. A directory qualifies when it
    holds ≥ ``min_small_files`` files under ``small_file_mb``; each
    qualifying directory is rewritten and swapped independently
    (per-directory verified swap), so untouched directories keep
    byte-identical files and a failure affects at most one directory.

    Partition-column preservation: each leaf directory is read and
    written standalone — its files never contain the partition columns
    (they live in the dirname), so the rewritten files keep the exact
    original schema.

    Returns {compacted: [relative dirs], skipped: n, files_before/after}.
    """
    # repair any crash-between-renames leftovers BEFORE collecting
    # leaves: a backup dir holds parquet files and would otherwise be
    # walked as a leaf while its missing original went unseen
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.endswith(".__compact_old__"):
                fs.restore_if_interrupted(
                    os.path.join(root, d[: -len(".__compact_old__")]),
                    os.path.join(root, d))
                dirs.remove(d)

    leaves = []
    for root, _dirs, files in os.walk(path):
        if root.endswith(".__compact_old__") \
                or root.endswith(".__compact_tmp__"):
            continue
        if any(f.endswith(".parquet") and not f.startswith(".") for f in files):
            leaves.append(root)

    compacted, skipped = [], 0
    files_before_total, files_after_total = 0, 0
    for leaf in leaves:
        n_files, n_bytes = dir_stats(leaf)
        files_before_total += n_files
        small = sum(
            1 for f in os.listdir(leaf)
            if f.endswith(".parquet") and not f.startswith(".")
            and os.path.getsize(os.path.join(leaf, f))
            < small_file_mb * 1024 * 1024
        )
        if small < min_small_files:
            skipped += 1
            files_after_total += n_files
            continue
        n_target = max(1, round(n_bytes / (target_file_mb * 1024 * 1024)))
        staging = leaf.rstrip("/") + ".__compact_tmp__"
        shutil.rmtree(staging, ignore_errors=True)
        (spark.read.parquet(leaf).repartition(n_target)
         .write.mode("overwrite").option("compression", compression)
         .parquet(staging))
        _swap_verified(leaf, staging)
        files_after_total += dir_stats(leaf)[0]
        compacted.append(os.path.relpath(leaf, path))

    return {
        "compacted": sorted(compacted),
        "skipped": skipped,
        "files_before": files_before_total,
        "files_after": files_after_total,
    }
