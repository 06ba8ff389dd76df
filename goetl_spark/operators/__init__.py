"""Relational + warehouse + data-pipeline operators.

- :mod:`goetl_spark.operators.groupby`   — aggregation façade (aggregate/groupby.go)
- :mod:`goetl_spark.operators.join`      — configurable join (dag/tasks/join.go)
- :mod:`goetl_spark.operators.union`     — fan-in UNION ALL (dag/dag_executor.go:352-376)
- :mod:`goetl_spark.operators.cdc`       — snapshot-diff change capture (dag/tasks/cdc.go)
- :mod:`goetl_spark.operators.scd`       — SCD type 1/2/3 (dag/tasks/scd.go)
- :mod:`goetl_spark.operators.window`    — ranking/analytic window helpers (beyond reference)
- :mod:`goetl_spark.operators.dedup`     — exact + near-duplicate detection (beyond reference)
- :mod:`goetl_spark.operators.similarity`— vector similarity search (beyond reference)
- :mod:`goetl_spark.operators.text`      — text analysis for training-data pipelines
- :mod:`goetl_spark.operators.multimodal`— binary media columns + decode kernels
- :mod:`goetl_spark.operators.merge`     — SQL MERGE + partition-pruned merge-on-read
- :mod:`goetl_spark.operators.bloom`     — bloom-filter join pruning
- :mod:`goetl_spark.operators.maintenance` — full + incremental compaction
- :mod:`goetl_spark.operators.sketch`    — mergeable t-digest quantile sketch
- :mod:`goetl_spark.operators.sampling`  — splits, mixing, packing
"""
