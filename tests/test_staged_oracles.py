"""Staged registrations (queries.py::_STAGED) — verified with the
driver's own compare at sf0.001 BEFORE they take window seats, so each
rotation is a pure window edit with no correctness risk. Also pins the
staging contract: staged names must NOT leak into the live registry
(an unseated registration with no driver row would trip
test_registry's coverage invariant). The staged queue may legitimately
be empty right after a rotation seats everything."""
from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(REPO, "scripts", "check_oracle.py"))
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)


def test_staged_names_not_in_live_registry():
    from goetl_spark.queries import _REGISTRY, staged_queries

    leaked = set(staged_queries()) & set(_REGISTRY)
    assert not leaked, f"staged queries leaked into live registry: {leaked}"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in check_oracle.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _staged_cases():
    from goetl_spark.queries import staged_oracle_sql, staged_queries

    qs, sqls = staged_queries(), staged_oracle_sql()
    return [(n, qs[n], sqls[n]) for n in qs if n in sqls]


@pytest.mark.parametrize("name,fn,sql",
                         _staged_cases(),
                         ids=[n for n, _, _ in _staged_cases()])
def test_staged_query_matches_oracle(spark, sf_dir, duck, name, fn, sql):
    spark_pd = fn(spark, sf_dir).toPandas()
    duck_pd = duck.execute(sql).df()
    assert len(spark_pd) > 0, f"{name}: empty result"
    problems = check_oracle.compare(name, spark_pd, duck_pd)
    assert not problems, f"{name}: {problems}"
