"""JDBC reader: query/table reads with partitioning and fetchsize.

Reference: ``readers/postgresql.go`` (SURVEY.md §2.1). The reference's
server-side cursor + batch fetch (postgresql.go:480-518) maps to the JDBC
source's ``fetchsize``; its single-connection read becomes a partitioned
parallel read when ``partition_column`` bounds are given — the actual
scale mechanism (N executors each reading a key range).

No database ships in the test environment, so tests cover option
assembly; the reader builds a standard ``spark.read.format("jdbc")`` plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    query: str | None = None,
    table: str | None = None,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 1000,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    driver: str | None = None,
) -> dict[str, str]:
    """Assemble JDBC source options (NewPostgresReader parity,
    readers/postgresql.go:187; fetchsize ≙ cursor FETCH batch,
    postgresql.go:503-517)."""
    if (query is None) == (table is None):
        raise ValueError("exactly one of query/table is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if query:
        opts["query"] = query
    else:
        opts["dbtable"] = table
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    if driver:
        opts["driver"] = driver
    if partition_column:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions")
        if query:
            raise ValueError("partitioned reads require table=, not query=")
        opts.update({
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        })
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """Build the JDBC read. Keyword args per :func:`jdbc_options`."""
    opts = jdbc_options(**kwargs)
    reader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def read_jdbc_predicates(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str],
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 1000,
    driver: str | None = None,
) -> DataFrame:
    """Partitioned read where each partition is an arbitrary WHERE clause.

    The numeric-bounds form (``read_jdbc`` with partition_column) only
    splits evenly-distributed numeric keys; ``predicates`` handles the
    rest — date ranges, hash buckets (``"abs(hashtext(id)) % 8 = 3"``),
    skew-aware custom splits. One executor connection per predicate, the
    same parallel-read contract (reference reads one cursor stream,
    postgresql.go:480-518 — this is its distributed generalization).

    Predicates must partition the table (disjoint + covering) or rows are
    dropped/duplicated — same contract as Spark's own jdbc(predicates=).
    """
    props = {"fetchsize": str(fetchsize)}
    if user:
        props["user"] = user
    if password:
        props["password"] = password
    if driver:
        props["driver"] = driver
    return spark.read.jdbc(
        url=url, table=table, predicates=list(predicates), properties=props
    )
