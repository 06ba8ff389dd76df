"""Streaming sources: rate, file-drop, and batch-table replay.

The reference's only unbounded source is a Mongo change stream
(readers/mongo.go:703-730; wired as stream_mongo in sources/mongo.py).
For tests and local development these helpers provide:

- :func:`rate_stream` — Spark's synthetic rate source
- :func:`file_stream` — directory-watching file source (the standard way
  a CDC drop-folder feeds a streaming job)
- :func:`replay_stream` — replays a batch table (e.g. the `events`
  fixture) through a file stream so streaming operators can be exercised
  deterministically without external infrastructure (SURVEY §7.3's
  change-stream parity strategy)
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def state_partitions(spark: SparkSession, n: int | None = None):
    """Temporarily adjust ``spark.sql.shuffle.partitions`` while a
    streaming query runs. Stateful operators keep one state store per
    shuffle partition and touch every store every micro-batch, so at
    demo data volumes the per-store fixed cost dominates wall time —
    but the per-KEY Python work of ``applyInPandasWithState`` also
    parallelizes only across these partitions, so too FEW starves the
    Python side. ``n=None`` (r17 optimization round) sizes it from the
    machine: ``max(4, defaultParallelism // 2)`` — measured on the
    funnel stream at sf0.1: 16 partitions on 32 cores ran the stream
    3.7 s vs 5.8 s at the old fixed 4, and the rule degrades to the
    old 4 at 8 cores, so the driver's lower-core scaling run keeps its
    tuning. The value is latched at ``.start()``, so enter this
    context before starting the query. On a real cluster you would
    size this to state volume instead."""
    if n is None:
        n = max(4, spark.sparkContext.defaultParallelism // 2)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())


def file_stream(
    spark: SparkSession, path: str, format: str = "parquet",
    schema: str | None = None, max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(format)
    if schema:
        reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def replay_stream_ordered(
    batch_df: DataFrame, ts_col: str, num_chunks: int = 3,
    dir: str | None = None, max_files_per_trigger: int | None = 1,
) -> tuple[DataFrame, str]:
    """Replay a batch table as a file stream whose micro-batches arrive in
    EVENT-TIME ORDER: rows are range-partitioned on ``ts_col`` into
    chronological chunk files with strictly increasing modification times
    (Spark's file source processes files oldest-mtime-first).

    This is the realistic shape for watermark semantics — data arrives
    roughly in time order, so small watermark delays don't drop rows at
    chunk boundaries. Returns ``(stream_df, dir)`` so callers can append
    more files later (e.g. a far-future sentinel that advances the
    watermark to flush stateful-join results).
    """
    import shutil

    spark = batch_df.sparkSession
    path = dir or tempfile.mkdtemp(prefix="goetl_replay_ord_")
    os.makedirs(path, exist_ok=True)
    # chronological ranges from approximate ts quantiles — no global sort
    # (an ntile window would single-partition the whole table)
    from pyspark.sql import functions as F

    fracs = [i / num_chunks for i in range(1, num_chunks)]
    bounds = batch_df.select(
        F.percentile_approx(F.col(ts_col).cast("double"), fracs).alias("b")
    ).collect()[0]["b"] if fracs else []
    ts_d = F.col(ts_col).cast("double")
    stage = tempfile.mkdtemp(prefix="goetl_replay_stage_")
    if num_chunks <= 1:
        # single-chunk replay (the stream-stream-join shape): no chunk
        # column, no shuffle — coalesce is a narrow read-all-in-one-task
        # write, where repartition(1, chunk) paid a full exchange of the
        # batch for nothing (r18; NULL-ts rows keep flowing, matching
        # the no-bounds contract below)
        shutil.rmtree(stage, ignore_errors=True)
        dst = os.path.join(path, "chunk001.parquet")
        batch_df.coalesce(1).write.mode("overwrite").parquet(stage)
        src = next((os.path.join(stage, f) for f in os.listdir(stage)
                    if f.startswith("part-") and f.endswith(".parquet")),
                   None)
        if src is not None:
            shutil.copy(src, dst)
            os.utime(dst, (1000, 1000))
        shutil.rmtree(stage, ignore_errors=True)
        reader = spark.readStream.format("parquet").schema(batch_df.schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   max_files_per_trigger)
        return reader.load(path), path
    # ONE partitioned write instead of num_chunks filtered scans (r17
    # optimization, guide §2.4): chunk i = 1 + #bounds at or below ts —
    # identical membership to the old per-chunk range filters, which
    # also dropped NULL-ts rows (every range predicate is null there).
    # repartition(num_chunks, chunk) puts each chunk value in exactly
    # one task, so partitionBy yields ONE file per non-empty chunk —
    # the same file-per-chunk layout, num_chunks+1 jobs -> 2.
    chunk = F.lit(1)
    for b in bounds:
        chunk = chunk + F.when(ts_d >= b, 1).otherwise(0)
    staged = batch_df.withColumn("__chunk", chunk)
    if bounds:
        # the old range predicates were all NULL on a NULL ts, so
        # multi-chunk replays dropped those rows; keep that contract
        staged = staged.filter(ts_d.isNotNull())
    (staged.repartition(max(num_chunks, 1), "__chunk")
     .write.partitionBy("__chunk").mode("overwrite").parquet(stage))
    for i in range(1, num_chunks + 1):
        part_dir = os.path.join(stage, f"__chunk={i}")
        src = next(
            (os.path.join(part_dir, f) for f in os.listdir(part_dir)
             if f.startswith("part-") and f.endswith(".parquet")),
            None,
        ) if os.path.isdir(part_dir) else None
        if src is None:  # empty time slice (tiny inputs)
            continue
        dst = os.path.join(path, f"chunk{i:03d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (i * 1000, i * 1000))  # strictly increasing mtimes
    shutil.rmtree(stage, ignore_errors=True)
    reader = spark.readStream.format("parquet").schema(batch_df.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path), path


def append_replay_file(
    template_df: DataFrame, rows, dir: str, name: str = "zzz_sentinel.parquet"
) -> None:
    """Append one more file to an ordered-replay directory (picked up by
    the running stream on its next trigger). Used for watermark-advancing
    sentinels.

    Written with pyarrow DIRECTLY, not a Spark job: the stream is already
    running when sentinels land, so a Spark write here queues behind (and
    triggers) concurrent micro-batches — measured 10 s of a 15 s
    stream-stream-join demo. An in-process arrow write is milliseconds,
    and dropping both sides' sentinels within the same poll interval lets
    one micro-batch flush everything.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(template_df.schema)
    arrays = [
        pa.array([row[i] for row in rows], type=schema.field(i).type)
        for i in range(len(schema))
    ]
    dst = os.path.join(dir, name)
    pq.write_table(pa.Table.from_arrays(arrays, schema=schema), dst)
    os.utime(dst, (10_000_000, 10_000_000))


def replay_stream(
    batch_df: DataFrame, num_chunks: int = 4,
    max_files_per_trigger: int = 1, dir: str | None = None,
) -> DataFrame:
    """Write a batch DataFrame as ``num_chunks`` parquet files and read
    them back as a throttled file stream — a deterministic change-stream
    stand-in for tests."""
    spark = batch_df.sparkSession
    path = dir or tempfile.mkdtemp(prefix="goetl_replay_")
    batch_df.repartition(num_chunks).write.mode("overwrite").parquet(path)
    reader = (spark.readStream.format("parquet")
              .schema(batch_df.schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    return reader.load(path)
