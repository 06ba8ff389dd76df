"""goetl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference Go ETL library (aaronlmathis/goetl), re-expressed Spark-first:
every operator is a lazy DataFrame composition that Catalyst optimizes
(predicate pushdown, column pruning, join selection, AQE), not a
record-at-a-time loop.

Layout
------
- :mod:`goetl_spark.session`    — tuned SparkSession factory
- :mod:`goetl_spark.functions`  — transforms & filters as Column factories
                                  (reference: transform/transforms.go, filter/filters.go)
- :mod:`goetl_spark.operators`  — joins, groupby, CDC, SCD, dedup,
                                  similarity search, text analysis, windows
- :mod:`goetl_spark.sources`    — readers (csv/jsonl/parquet/jdbc/http/s3/mongo)
- :mod:`goetl_spark.sinks`      — writers incl. JDBC upsert
- :mod:`goetl_spark.plans`      — linear Pipeline and DAG builder/executor
                                  (reference: pipeline/pipeline.go, dag/)
- :mod:`goetl_spark.streaming`  — Structured Streaming helpers (windows,
                                  watermarks, stateful ops)
- :mod:`goetl_spark.quality`    — data-quality validators
                                  (reference: validators/validators.go)
"""

__version__ = "0.1.0"
