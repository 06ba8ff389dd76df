"""Sinks: file writers and the JDBC upsert writer.

Reference: ``writers/`` (SURVEY.md §2.2).
"""

from goetl_spark.sinks.files import write_csv, write_jsonl, write_parquet
from goetl_spark.sinks.jdbc import JdbcUpsertWriter, write_jdbc

__all__ = ["write_csv", "write_jsonl", "write_parquet",
           "JdbcUpsertWriter", "write_jdbc"]
