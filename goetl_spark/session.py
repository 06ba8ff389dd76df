"""SparkSession factory with scale-oriented defaults.

The reference engine is single-process and has no equivalent knob surface
(SURVEY.md §4.1); on Spark the performance story is configuration +
letting Catalyst/AQE plan. Defaults here are chosen for the 100 TB design
point while remaining correct on local[N]:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy demotion to broadcast).
- Arrow on for any pandas-UDF path (vectorized Python interchange).
- Broadcast threshold left at default (10 MB) — dimension tables (region,
  nation, supplier, part at most scale factors) broadcast automatically;
  callers can force with F.broadcast.
- `spark.sql.shuffle.partitions` is only the pre-AQE upper bound; AQE
  coalesces down, so a high value is safe on a big cluster and a moderate
  one is right for local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for local[N] testing; on a real cluster the same builder is used with
# master/partitions supplied by the environment.
_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet vectorized reader + pushdown are on by default; pin them so a
    # misconfigured environment can't silently fall back to row-at-a-time.
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Session timezone pinned to UTC so timestamp semantics match the DuckDB
    # oracle regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "goetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
    """Load the star-schema parquet tables from ``sf_dir`` as a dict of DataFrames."""
    from pyspark.sql import functions as F

    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        if name == "events":
            # ts has shipped as TIMESTAMP(NANOS) (nanos-as-long) and as
            # TIMESTAMP(MICROS)-without-UTC (read as NTZ); normalize both
            # to a session-TZ TIMESTAMP
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
            ts_type = dict(df.dtypes)["ts"]
            if ts_type == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type != "timestamp":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        out[name] = df
    return out
