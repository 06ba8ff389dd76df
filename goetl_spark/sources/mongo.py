"""MongoDB source wiring: find / aggregate / watch / bulk modes.

Reference: ``readers/mongo.go`` (SURVEY.md §2.1) — four read modes
(mongo.go:78-83). The Spark MongoDB connector covers all of them:

- ``find``      → ``spark.read.format("mongodb")`` with a filter pipeline
  (server-side pushdown of the reference's filter/projection/sort/limit,
  mongo.go:617-662)
- ``aggregate`` → ``aggregation.pipeline`` option (mongo.go:665-700)
- ``watch``     → ``spark.readStream.format("mongodb")`` change stream
  (mongo.go:703-730)
- ``bulk``      → plain batch read; the connector partitions by
  ``partitioner`` options instead of client-side pagination
  (mongo.go:733-736)

The connector JAR is not bundled in this environment, so this module only
assembles the reader configuration (tested), and ``read_mongo`` raises a
clear error when the connector is absent.
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def mongo_options(
    uri: str,
    database: str,
    collection: str,
    mode: str = "find",
    filter: Mapping | None = None,
    projection: Sequence[str] | None = None,
    sort: Mapping | None = None,
    limit: int | None = None,
    pipeline: Sequence[Mapping] | None = None,
) -> dict[str, str]:
    """Assemble Mongo connector options for the given read mode."""
    if mode not in ("find", "aggregate", "watch", "bulk"):
        raise ValueError(f"unknown mongo mode: {mode}")
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }
    stages: list[Mapping] = []
    if mode == "aggregate":
        stages = list(pipeline or [])
    else:
        # translate find options into an aggregation pipeline, which is what
        # the server executes anyway (mongo.go:617-662)
        if filter:
            stages.append({"$match": dict(filter)})
        if sort:
            stages.append({"$sort": dict(sort)})
        if limit:
            stages.append({"$limit": int(limit)})
        if projection:
            stages.append({"$project": {p: 1 for p in projection}})
    if stages:
        opts["aggregation.pipeline"] = json.dumps(stages)
    return opts


def read_mongo(spark: SparkSession, **kwargs) -> DataFrame:
    """Batch read (find/aggregate/bulk). ``mode='watch'`` must go through
    :func:`stream_mongo`."""
    mode = kwargs.get("mode", "find")
    if mode == "watch":
        raise ValueError("use stream_mongo() for change streams")
    opts = mongo_options(**kwargs)
    reader = spark.read.format("mongodb")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # connector JAR not on classpath
        raise RuntimeError(
            "MongoDB Spark connector not available on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages"
        ) from e


def stream_mongo(spark: SparkSession, **kwargs):
    """Change-stream read (ModeWatch, mongo.go:703-730) → readStream."""
    kwargs["mode"] = "aggregate"  # change-stream pipeline handled by connector
    opts = mongo_options(**kwargs)
    reader = spark.readStream.format("mongodb")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(
            "MongoDB Spark connector not available on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages"
        ) from e
