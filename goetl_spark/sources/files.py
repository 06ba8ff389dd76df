"""File readers: CSV, JSONL, Parquet with the reference's option surface.

Reference: readers/csv.go, readers/json.go, readers/parquet.go
(SURVEY.md §2.1). Everything delegates to Spark's native, vectorized,
pushdown-capable readers — the options below translate the reference's
config knobs:

- CSV: header/synthetic col names (csv.go:160-180), delimiter + comment
  (csv.go:63-70), per-value type inference (csv.go:204-218 →
  ``inferSchema``), empty string → NULL (csv.go:163-165 → ``nullValue``).
- JSONL: line-delimited JSON is Spark's native JSON format
  (json.go:77-162).
- Parquet: column projection (parquet.go:199-219 → ``columns`` →
  Catalyst prunes into the scan); batch size / memory limits
  (parquet.go:83-91) are superseded by the vectorized reader + Spark
  memory manager.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from goetl_spark.stats import IOStats


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    comment: str | None = None,
    infer_schema: bool = True,
    null_value: str = "",
    schema: str | None = None,
    columns: Sequence[str] | None = None,
    stats: IOStats | None = None,
) -> DataFrame:
    """CSV → DataFrame (NewCSVReader parity, readers/csv.go:92-218).

    With ``header=False`` columns are renamed to the reference's
    synthesized ``col_0..col_N`` (csv.go:171-176) in place of Spark's
    ``_c0.._cN`` (skipped when an explicit ``schema`` names them).

    Pass an :class:`IOStats` to get the reference's per-reader record
    count + per-field null counts (csv.go:54-60) from the same pass.

    Type-inference deviation (documented, tested in test_io): the
    reference infers per-VALUE — one CSV column can yield int in one
    record and string in the next (csv.go:204-218, records are
    ``map[string]any``). Spark's ``inferSchema`` is per-COLUMN: the
    whole column gets the narrowest type covering every value, so a
    mixed ``[1, "x"]`` column reads as string for ALL rows. Columnar
    engines need a single column type; the per-value behavior cannot
    exist in any SQL engine, and the column-level result is what the
    reference's own downstream type filters effectively see after a
    ConvertType.
    """
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("nullValue", null_value)
        .option("emptyValue", None)  # "" → NULL like the reference
    )
    if comment:
        reader = reader.option("comment", comment)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    df = reader.csv(path)
    if not header and not schema:
        df = df.toDF(*[f"col_{i}" for i in range(len(df.columns))])
    if columns:
        df = df.select(*columns)
    return stats.attach(df) if stats else df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    columns: Sequence[str] | None = None,
    stats: IOStats | None = None,
) -> DataFrame:
    """Line-delimited JSON → DataFrame (NewJSONReader parity,
    readers/json.go:77-162). Spark's JSON source IS JSONL."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path)
    if columns:
        df = df.select(*columns)
    return stats.attach(df) if stats else df


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    stats: IOStats | None = None,
) -> DataFrame:
    """Parquet → DataFrame (NewParquetReader parity,
    readers/parquet.go:52-458). ``columns`` mirrors the reference's
    projection pushdown — Catalyst prunes the scan to exactly these
    columns (check ReadSchema in .explain)."""
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return stats.attach(df) if stats else df


def read_orc(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    stats: IOStats | None = None,
) -> DataFrame:
    """ORC → DataFrame (beyond the reference's format list — the other
    columnar warehouse format, common in Hive/Trino estates). Same
    contract as :func:`read_parquet`: ``columns`` prunes the scan
    (ORC carries column statistics and predicate pushdown like
    parquet), ``stats`` rides the same pass."""
    df = spark.read.orc(path)
    if columns:
        df = df.select(*columns)
    return stats.attach(df) if stats else df
