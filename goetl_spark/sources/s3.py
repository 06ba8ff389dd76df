"""S3 source: prefix/suffix listing, format dispatch, metadata columns.

Reference: ``readers/s3.go`` (SURVEY.md §2.1). To Spark, S3 is a
filesystem (``s3a://``) — listing, globbing, and parallel reads are
native. The reference's features map to:

- prefix/suffix/recursive filters (s3.go:373-440) → path glob +
  ``pathGlobFilter`` / ``recursiveFileLookup`` options
- per-object format dispatch by extension (s3.go:498-513) → caller picks
  format (mixing formats in one load is an anti-pattern at scale; read
  each format group separately and union)
- ``_s3_key/_s3_size/_s3_last_modified`` injected columns (s3.go:303-312)
  → the hidden ``_metadata`` struct (file_path, file_size,
  file_modification_time) + ``input_file_name()``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT_READERS = {"csv", "json", "parquet"}


def read_s3(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    suffix: str | None = None,
    recursive: bool = False,
    with_metadata: bool = False,
    **options,
) -> DataFrame:
    """Read objects under an S3 (or any Hadoop-FS) path.

    ``suffix`` filters object keys (WithS3Suffix, s3.go:80-84);
    ``with_metadata`` adds the reference's ``_s3_*`` analog columns from
    Spark's ``_metadata`` (s3.go:303-312).
    """
    if format not in _FORMAT_READERS:
        raise ValueError(f"unsupported format: {format}")
    reader = spark.read
    if suffix:
        reader = reader.option("pathGlobFilter", f"*{suffix}")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(format).load(path)
    if with_metadata:
        df = df.select(
            "*",
            F.col("_metadata.file_path").alias("_s3_key"),
            F.col("_metadata.file_size").alias("_s3_size"),
            F.col("_metadata.file_modification_time").alias("_s3_last_modified"),
        )
    return df
