"""Dataset splitting / sampling for training-data pipelines.

Beyond the reference surface (BASELINE.json north star). The key design
constraint at 100 TB is REPRODUCIBILITY without coordination: every
operator here derives its decision from a hash of the row's stable id,
so membership is a pure per-row function — no global sort, no sampling
state, no shuffle, stable under retries/re-partitioning, and portable
to any engine (md5-based, like the dedup family; see
goetl_spark.operators.text.md5_int).

- :func:`hash_split` — train/val/test assignment by hash bucket. The
  industry-standard reproducible split (vs ``randomSplit``, which is
  partition-order dependent).
- :func:`hash_sample` — deterministic p-fraction sample, same mechanism.
- :func:`stratified_sample` — per-stratum fractions via ``sampleBy``
  (seeded Bernoulli; NOT hash-stable across engines — use for local
  experimentation, hash_sample for pipeline splits).
- :func:`length_buckets` — token-length bucketing for batch packing
  (sequence-length curricula); pure expression over the text column.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from goetl_spark.operators.text import md5_int, token_count


def _hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): md5 of the key string, mod buckets."""
    return md5_int(key.cast("string")) % buckets


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket of ``key_col``.

    ``splits`` maps name -> percent (must sum to 100); default
    80/10/10 train/val/test. Assignment is a pure function of the key:
    adding data, re-partitioning, or re-running never moves a row between
    splits — the property that matters when the corpus is rebuilt
    incrementally.
    """
    splits = dict(splits or {"train": 80, "val": 10, "test": 10})
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100, got {splits}")
    b = _hash_bucket(F.col(key_col))
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                buckets: int = 10_000) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below ``fraction * buckets``. Same row set on every run and
    every engine."""
    return df.filter(
        _hash_bucket(F.col(key_col), buckets) < int(round(fraction * buckets))
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): seeded and
    reproducible within Spark, but partition-dependent — prefer
    :func:`hash_sample` for cross-engine-checkable pipelines."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def mix_sources(
    sources: Sequence[tuple[DataFrame, float]],
    key_col: str,
    source_col: str | None = "source",
) -> DataFrame:
    """Weighted corpus mixture: hash-sample each source at its weight and
    union by name (missing columns → NULL). Weights are FRACTIONS KEPT of
    each source (e.g. [(web, 0.3), (books, 1.0)]), the standard way
    training mixtures are specified over corpora of different sizes.

    Deterministic end to end: membership is the per-row hash rule of
    :func:`hash_sample`, so the mixture is reproducible and incremental
    rebuilds keep prior rows. Union is shuffle-free; sampling is a scan
    filter.
    """
    from goetl_spark.operators.union import fan_in

    parts = []
    for i, (df, weight) in enumerate(sources):
        part = df if weight >= 1.0 else hash_sample(df, key_col, weight)
        if source_col:
            part = part.withColumn(source_col, F.lit(i))
        parts.append(part)
    return fan_in(parts)


def length_buckets(
    df: DataFrame,
    text_col: str = "text",
    bounds: Sequence[int] = (64, 128, 256, 512, 1024),
    out_col: str = "length_bucket",
) -> DataFrame:
    """Token-length bucket id per document for batch packing: bucket i
    holds docs with token_count in (bounds[i-1], bounds[i]]; bucket
    len(bounds) is the overflow. Downstream, group or repartition by the
    bucket so fixed-shape training batches pack without padding waste."""
    n = token_count(text_col)
    expr = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(n <= bounds[i], i).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))
