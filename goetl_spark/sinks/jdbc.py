"""JDBC sink: plain append/overwrite + upsert via foreachPartition.

Reference: ``writers/postgresql.go`` (SURVEY.md §2.2). Plain insert and
truncate-then-insert map to the stock JDBC writer. Upsert
(ON CONFLICT DO NOTHING / DO UPDATE, postgresql.go:544-567) has no native
Spark support — it's implemented as a ``foreachPartition`` that executes
batched upsert statements per partition over a DBAPI connection, with
per-batch transactions (postgresql.go:589-648) and conflict counting via
a Spark accumulator (postgresql.go:637-640).

The DBAPI connection factory is injectable (``connect_fn``) — psycopg2 in
production, a recording fake in tests (no database ships in this
environment).

Scale note: each executor partition opens ONE connection and writes its
slice in ``batch_size`` transactions — N partitions = N parallel writers,
the same contract as the JDBC writer's numPartitions. Repartition the
DataFrame before writing to control connection fan-out.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """Identifier validation (postgresql.go:500-515)."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name}")
    return name


def build_upsert_sql(
    table: str,
    columns: Sequence[str],
    key_columns: Sequence[str],
    update_on_conflict: bool = True,
) -> str:
    """INSERT ... ON CONFLICT statement (postgresql.go:529-567)."""
    _check_ident(table)
    cols = [_check_ident(c) for c in columns]
    keys = [_check_ident(k) for k in key_columns]
    placeholders = ", ".join(["%s"] * len(cols))
    col_list = ", ".join(cols)
    key_list = ", ".join(keys)
    sql = f"INSERT INTO {table} ({col_list}) VALUES ({placeholders})"
    if not keys:
        return sql
    if update_on_conflict:
        updates = ", ".join(
            f"{c} = EXCLUDED.{c}" for c in cols if c not in keys
        )
        # every column is a key → nothing to update; `DO UPDATE SET` with
        # an empty list is invalid SQL (the reference can't hit this: it
        # takes explicit UpdateColumns, postgresql.go:551-561)
        if not updates:
            return f"{sql} ON CONFLICT ({key_list}) DO NOTHING"
        return f"{sql} ON CONFLICT ({key_list}) DO UPDATE SET {updates}"
    return f"{sql} ON CONFLICT ({key_list}) DO NOTHING"


@dataclass
class JdbcUpsertWriter:
    """Upsert writer (NewPostgresWriter parity, writers/postgresql.go:200-729)."""

    table: str
    key_columns: Sequence[str]
    connect_fn: Callable[[], object]  # DBAPI connection factory (executor-side)
    update_on_conflict: bool = True
    batch_size: int = 1000
    max_errors: int = 0  # abort after this many failed batches (0 = fail fast)
    create_table_ddl: str | None = None
    truncate: bool = False
    # error-state latch (postgresql.go:275-277): once a write blows the
    # budget the writer stays failed — later write() calls raise
    # immediately instead of silently hammering a broken target
    _latched_error: str | None = field(default=None, init=False, repr=False)
    #: failed-batch count of the last write() (accumulator total)
    error_count: int = field(default=0, init=False)

    def write(self, df: DataFrame) -> None:
        if self._latched_error is not None:
            raise RuntimeError(
                f"writer latched after earlier failure: {self._latched_error}"
            )
        sql_template_cols = df.columns
        sql = build_upsert_sql(
            self.table, sql_template_cols, self.key_columns, self.update_on_conflict
        )
        batch_size = self.batch_size
        max_errors = self.max_errors
        connect_fn = self.connect_fn
        ddl = self.create_table_ddl
        truncate = self.truncate

        # one-time DDL from the driver (postgresql.go:478-497, 518-526)
        if ddl or truncate:
            conn = connect_fn()
            try:
                cur = conn.cursor()
                if ddl:
                    cur.execute(ddl)
                if truncate:
                    cur.execute(f"TRUNCATE TABLE {_check_ident(self.table)}")
                conn.commit()
            finally:
                conn.close()

        # cumulative error budget across ALL partitions via accumulator
        # (postgresql.go:275-277 latches writer.err after MaxErrors).
        # Executors can't READ an accumulator, so the global check runs
        # driver-side after the job; each partition still fail-fasts
        # locally once its own failures alone exceed the whole budget.
        err_acc = df.sparkSession.sparkContext.accumulator(0)

        def write_partition(rows):
            conn = connect_fn()
            errors = 0
            try:
                cur = conn.cursor()
                batch = []
                for row in rows:
                    batch.append(tuple(row[c] for c in sql_template_cols))
                    if len(batch) >= batch_size:
                        errors += _flush(conn, cur, sql, batch, max_errors, errors)
                        batch = []
                if batch:
                    errors += _flush(conn, cur, sql, batch, max_errors, errors)
            finally:
                conn.close()

        def _flush(conn, cur, sql_, batch, max_errs, errs_so_far) -> int:
            # per-batch transaction (postgresql.go:589-648)
            try:
                cur.executemany(sql_, batch)
                conn.commit()
                return 0
            except Exception:
                conn.rollback()
                err_acc.add(1)
                if errs_so_far + 1 > max_errs:
                    raise
                return 1

        try:
            df.foreachPartition(write_partition)
        except Exception as exc:
            self._latched_error = f"partition write failed: {exc}"
            self.error_count = err_acc.value
            raise
        self.error_count = err_acc.value
        if self.error_count > max_errors:
            self._latched_error = (
                f"{self.error_count} failed batches exceeds "
                f"max_errors={max_errors}"
            )
            raise RuntimeError(f"upsert aborted: {self._latched_error}")


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 1000,
    truncate: bool = False,
    num_partitions: int | None = None,
) -> None:
    """Plain JDBC write — append / overwrite(+truncate) via the stock
    writer (the non-upsert paths of writers/postgresql.go)."""
    if num_partitions:
        df = df.repartition(num_partitions)
    w = (df.write.format("jdbc")
         .option("url", url)
         .option("dbtable", table)
         .option("batchsize", str(batchsize))
         .mode(mode))
    if user:
        w = w.option("user", user)
    if password:
        w = w.option("password", password)
    if truncate:
        w = w.option("truncate", "true")
    w.save()
