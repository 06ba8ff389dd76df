"""Sources: file readers, JDBC, HTTP, S3, Mongo wiring.

Reference: ``readers/`` (SURVEY.md §2.1). File formats map to native
Spark readers with option translation; HTTP is a driver-side fetcher (no
native Spark HTTP source); JDBC/Mongo are thin wrappers over the stock
connectors with the reference's option surface.
"""

from goetl_spark.sources.files import read_csv, read_jsonl, read_parquet
from goetl_spark.sources.http import HTTPReader, PaginationMode
from goetl_spark.sources.jdbc import read_jdbc
from goetl_spark.sources.s3 import read_s3
from goetl_spark.sources.mongo import read_mongo

__all__ = [
    "read_csv", "read_jsonl", "read_parquet",
    "HTTPReader", "PaginationMode", "read_jdbc", "read_s3", "read_mongo",
]
