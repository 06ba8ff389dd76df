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
- :mod:`goetl_spark.operators.multimodal`— binary media columns + decode kernels,
  perceptual image dedup (dHash + banded pairs)
- :mod:`goetl_spark.operators.merge`     — SQL MERGE + partition-pruned merge-on-read
- :mod:`goetl_spark.operators.bloom`     — bloom-filter join pruning, standing
  bloom index, exact bloom semi-/anti-joins
- :mod:`goetl_spark.operators.web`       — URL parsing / canonicalization
- :mod:`goetl_spark.operators.maintenance` — full + incremental compaction
- :mod:`goetl_spark.operators.sketch`    — mergeable t-digest + Count-Min sketches
- :mod:`goetl_spark.operators.sampling`  — splits, mixing, packing, weighted PPS
- :mod:`goetl_spark.operators.timeseries`— resample/gap-fill, range rolling stats
- :mod:`goetl_spark.operators.behavior`  — ordered funnel, cohort retention
- :mod:`goetl_spark.operators.lm`        — bigram LM, KL divergence, char entropy,
  CCNet perplexity tiers
- :mod:`goetl_spark.operators.mining`    — basket co-occurrence pairs
- :mod:`goetl_spark.operators.ranking`   — distributed rank/NTILE/exact quantiles,
  quantile normalization
- :mod:`goetl_spark.operators.graph`     — PageRank over edge frames
- :mod:`goetl_spark.operators.tokenizer` — WordPiece subword tokenization
- :mod:`goetl_spark.operators.classifier`— model-based quality scoring (LR
  over deterministic text features)
"""
