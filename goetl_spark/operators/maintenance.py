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
read→repartition→write pass does the rewrite. The write lands in a
sibling staging directory and is swapped in with two renames, so a
concurrent reader sees either the old layout or the new one, never a
half-written mix. (Atomic swap of the whole directory — per-partition
transactionality would need a table format like Iceberg/Delta, out of
scope here.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
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

    With ``partition_by`` the data is hash-distributed WITHIN each
    directory partition (``repartition(n, *partition_by)`` would put each
    partition's rows in one task → one giant file per partition value and
    skew on hot partitions; plain ``repartition(n)`` spreads evenly and
    the writer splits by directory). Returns before/after stats.
    """
    files_before, bytes_before = dir_stats(path)
    n_files = max(1, round(bytes_before / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)

    staging = path.rstrip("/") + ".__compact_tmp__"
    shutil.rmtree(staging, ignore_errors=True)
    w = (df.repartition(n_files)
         .write.mode("overwrite").option("compression", compression))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)

    backup = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)

    files_after, bytes_after = dir_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }
