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

from pyspark.sql import DataFrame, SparkSession


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
