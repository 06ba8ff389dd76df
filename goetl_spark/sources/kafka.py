"""Kafka source/sink wiring (beyond the reference surface).

The reference has no message-bus connectivity at all; its one unbounded
source is a Mongo change stream (readers/mongo.go:703-730, SURVEY §2.8).
Kafka is the industrial event backbone the streaming operators in
:mod:`goetl_spark.streaming` would consume from in production, so the
wiring lives here: option assembly (tested) plus readers that raise a
clear error when the Kafka connector JAR is absent from the environment.

At scale: one Spark input partition per Kafka topic-partition; use
``minPartitions`` to fan out hotter topics, ``maxOffsetsPerTrigger`` to
bound micro-batch size (the backpressure knob), and ``startingOffsets``
for replay position.
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(
    bootstrap_servers: str,
    topics: str | Sequence[str] | None = None,
    pattern: str | None = None,
    starting_offsets: str | Mapping = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Assemble Kafka reader options. Exactly one of ``topics`` /
    ``pattern`` must be given."""
    if bool(topics) == bool(pattern):
        raise ValueError("exactly one of topics or pattern is required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics:
        opts["subscribe"] = (
            topics if isinstance(topics, str) else ",".join(topics)
        )
    else:
        opts["subscribePattern"] = pattern  # type: ignore[assignment]
    opts["startingOffsets"] = (
        starting_offsets if isinstance(starting_offsets, str)
        else json.dumps(dict(starting_offsets))
    )
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    return opts


def _load(reader, opts: Mapping[str, str]):
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # connector JAR not bundled in this environment
        raise RuntimeError(
            "Kafka connector not available: add the spark-sql-kafka package "
            "to spark.jars.packages"
        ) from e


def stream_kafka(spark: SparkSession, value_schema: str | None = None,
                 **kwargs) -> DataFrame:
    """Unbounded Kafka read. With ``value_schema``, the JSON payload in
    ``value`` is parsed into typed columns alongside the Kafka metadata
    (key/topic/partition/offset/timestamp)."""
    df = _load(spark.readStream.format("kafka"), kafka_options(**kwargs))
    return _decode(df, value_schema)


def read_kafka(spark: SparkSession, value_schema: str | None = None,
               **kwargs) -> DataFrame:
    """Bounded (batch) Kafka read over an offset range."""
    kwargs.setdefault("starting_offsets", "earliest")
    df = _load(spark.read.format("kafka"), kafka_options(**kwargs))
    return _decode(df, value_schema)


def _decode(df: DataFrame, value_schema: str | None) -> DataFrame:
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic", "partition", "offset", "timestamp",
    )
    if value_schema:
        out = out.withColumn(
            "data", F.from_json("value", value_schema)
        ).select("key", "topic", "partition", "offset", "timestamp", "data.*")
    return out
