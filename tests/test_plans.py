"""Pipeline + DAG runner tests (SURVEY §2.10, §3 semantics)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.plans import (
    DAGBuilder,
    DAGExecutor,
    ErrorStrategy,
    Pipeline,
    RetryConfig,
    TaskStatus,
    TriggerRule,
)


def _src(spark):
    return spark.createDataFrame(
        [Row(id=1, v=10), Row(id=2, v=-5), Row(id=3, v=7)]
    )


# --- Pipeline ---------------------------------------------------------------

def test_pipeline_requires_source_and_sink(spark):
    with pytest.raises(ValueError, match="source"):
        Pipeline().build()
    with pytest.raises(ValueError, match="sink"):
        Pipeline().from_(_src(spark)).build()


def test_pipeline_filters_after_transforms(spark):
    # reference quirk: filters always run after all transforms
    # (pipeline/pipeline.go:258-286) — even when declared first
    captured = {}
    p = (
        Pipeline()
        .from_(_src(spark))
        .where(F.col("doubled") > 0)          # refers to a transform's column
        .map(lambda df: df.withColumn("doubled", F.col("v") * 2))
        .to(lambda df: captured.update(rows=df.collect()))
    )
    p.execute()
    assert {r.id for r in captured["rows"]} == {1, 3}


def test_pipeline_error_strategies(spark):
    ok = F.col("v") > 0
    # FAIL_FAST raises
    with pytest.raises(ValueError, match="failed validation"):
        (Pipeline().from_(_src(spark)).validate(ok)
         .with_error_strategy(ErrorStrategy.FAIL_FAST)
         .to(lambda df: None).execute())
    # SKIP drops silently
    got = {}
    m = (Pipeline().from_(_src(spark)).validate(ok)
         .with_error_strategy(ErrorStrategy.SKIP_ERRORS)
         .to(lambda df: got.update(n=df.count())).execute())
    assert got["n"] == 2 and m.records_in == 3 and m.records_out == 2
    # COLLECT keeps rejects on the side
    p = (Pipeline().from_(_src(spark)).validate(ok)
         .with_error_strategy(ErrorStrategy.COLLECT_ERRORS)
         .to(lambda df: None))
    m = p.execute()
    assert m.records_errored == 1
    assert p.errors_df.collect()[0].id == 2


# --- DAG builder validation -------------------------------------------------

def test_dag_missing_dep_rejected():
    b = DAGBuilder().add_task("a", lambda ctx: None, dependencies=["nope"])
    with pytest.raises(ValueError, match="missing task"):
        b.build()


def test_dag_cycle_rejected():
    b = (DAGBuilder()
         .add_task("a", lambda ctx: None, dependencies=["b"])
         .add_task("b", lambda ctx: None, dependencies=["a"]))
    with pytest.raises(ValueError, match="cycle"):
        b.build()


def test_dag_duplicate_task_rejected():
    b = DAGBuilder().add_task("a", lambda ctx: None)
    with pytest.raises(ValueError, match="duplicate"):
        b.add_task("a", lambda ctx: None)


def test_dag_levels():
    dag = (DAGBuilder()
           .add_task("s1", lambda ctx: None)
           .add_task("s2", lambda ctx: None)
           .add_task("t", lambda ctx: None, dependencies=["s1", "s2"])
           .add_task("w", lambda ctx: None, dependencies=["t"])
           .build())
    assert dag.execution_levels() == [["s1", "s2"], ["t"], ["w"]]
    assert dag.max_depth() == 3


# --- DAG execution ----------------------------------------------------------

def test_dag_fan_in_union(spark):
    dag = (DAGBuilder()
           .add_source("a", lambda: spark.createDataFrame([Row(x=1)]))
           .add_source("b", lambda: spark.createDataFrame([Row(x=2, y="z")]))
           .add_task("union", lambda ctx: ctx.input, dependencies=["a", "b"])
           .build())
    res = DAGExecutor().execute(dag)
    rows = res["union"].output.orderBy("x").collect()
    assert [r.x for r in rows] == [1, 2]
    assert rows[0].y is None  # by-name union with missing columns


def test_dag_source_map_join(spark):
    left = spark.createDataFrame([Row(k=1, a="l")])
    right = spark.createDataFrame([Row(k=1, b="r")])
    dag = (DAGBuilder()
           .add_source("left", lambda: left)
           .add_source("right", lambda: right)
           .add_task("join",
                     lambda ctx: ctx.source_map["left"].join(
                         ctx.source_map["right"], "k"),
                     dependencies=["left", "right"])
           .build())
    res = DAGExecutor().execute(dag)
    assert res["join"].output.collect()[0].b == "r"


def test_dag_retry_with_backoff():
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient glitch")
        return None

    dag = (DAGBuilder()
           .add_task("t", flaky,
                     retry=RetryConfig(max_retries=3, backoff_seconds=0.01,
                                       retry_on=["transient"]))
           .build())
    res = DAGExecutor().execute(dag)
    assert res["t"].status == TaskStatus.SUCCESS
    assert res["t"].metrics.attempts == 3


def test_dag_retry_on_filter():
    def fail(ctx):
        raise RuntimeError("fatal problem")

    dag = (DAGBuilder()
           .add_task("t", fail,
                     retry=RetryConfig(max_retries=5, backoff_seconds=0.01,
                                       retry_on=["transient"]))
           .build())
    res = DAGExecutor().execute(dag)
    assert res["t"].status == TaskStatus.FAILED
    assert res["t"].metrics.attempts == 1  # 'fatal' not retryable


def test_dag_timeout():
    def slow(ctx):
        time.sleep(2)

    dag = DAGBuilder().add_task("t", slow, timeout_seconds=0.2).build()
    res = DAGExecutor().execute(dag)
    assert res["t"].status == TaskStatus.FAILED


def test_dag_timeout_does_not_block_executor():
    """Timeout must preempt the WAIT, not just raise: shutdown(wait=True)
    would park the executor until the hung task returns (ADVICE r01)."""
    def hung(ctx):
        time.sleep(8)

    def quick(ctx):
        return None

    dag = (DAGBuilder()
           .add_task("hung", hung, timeout_seconds=0.2)
           .add_task("after", quick, dependencies=["hung"],
                     trigger_rule=TriggerRule.ALL_COMPLETE)
           .build())
    t0 = time.time()
    res = DAGExecutor().execute(dag)
    elapsed = time.time() - t0
    assert res["hung"].status == TaskStatus.FAILED
    assert res["after"].status == TaskStatus.SUCCESS
    assert elapsed < 4, f"executor blocked on hung task ({elapsed:.1f}s)"


def test_trigger_rules():
    def fail(ctx):
        raise RuntimeError("boom")

    dag = (DAGBuilder()
           .add_task("bad", fail)
           .add_task("ok", lambda ctx: None)
           .add_task("cleanup", lambda ctx: None, dependencies=["bad", "ok"],
                     trigger_rule=TriggerRule.ONE_FAILED)
           .add_task("strict", lambda ctx: None, dependencies=["bad", "ok"],
                     trigger_rule=TriggerRule.ALL_SUCCESS)
           .add_task("lenient", lambda ctx: None, dependencies=["ok"],
                     trigger_rule=TriggerRule.NONE_FAILED)
           .build())
    res = DAGExecutor().execute(dag)
    assert res["cleanup"].status == TaskStatus.SUCCESS   # fires on failure
    assert res["strict"].status == TaskStatus.SKIPPED    # dep failed
    assert res["lenient"].status == TaskStatus.SUCCESS


def test_conditional_branch_routing(spark):
    # the OnTrue/OnFalse routing the reference never implemented
    # (dag/tasks/conditional.go:58-60)
    ran = []
    dag = (DAGBuilder()
           .add_source("src", lambda: _src(spark))
           .add_conditional("check", lambda ctx: ctx.input.count() >= 2,
                            dependencies=["src"])
           .add_task("on_true", lambda ctx: ran.append("true"),
                     dependencies=["check"], condition=("check", True))
           .add_task("on_false", lambda ctx: ran.append("false"),
                     dependencies=["check"], condition=("check", False))
           .build())
    res = DAGExecutor().execute(dag)
    assert ran == ["true"]
    assert res["on_false"].status == TaskStatus.SKIPPED
    # conditional passes records through unchanged (conditional.go:62-78)
    assert res["check"].output.count() == 3


def test_dag_parallel_level(spark):
    # independent sink actions can overlap via the opt-in thread pool
    order = []

    def mk(name):
        def fn(ctx):
            order.append(name)
            return None
        return fn

    dag = (DAGBuilder().add_task("a", mk("a")).add_task("b", mk("b")).build())
    res = DAGExecutor(max_workers=2).execute(dag)
    assert {res["a"].status, res["b"].status} == {TaskStatus.SUCCESS}
    assert sorted(order) == ["a", "b"]


def test_pipeline_metrics_ride_sink_pass(spark, tmp_path):
    """records_in/out + per-field null stats come from the sink's own
    action (Observation), not extra count jobs; non-materializing sinks
    fall back to explicit counts."""
    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id int, name string")

    out = str(tmp_path / "sink")
    p = (Pipeline().from_(df)
         .where(SF.col("id") > 1)
         .to(lambda d: d.write.mode("overwrite").parquet(out)))
    before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    m = p.execute()
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []) - before
    assert m.records_in == 4 and m.records_out == 3
    assert m.in_null_counts == {"id": 0, "name": 2}
    assert m.out_null_counts == {"id": 0, "name": 2}
    assert jobs <= 2, f"metrics must ride the sink pass, ran {jobs} jobs"

    # non-materializing sink → fallback counts, no hang
    held = []
    p2 = Pipeline().from_(df).to(held.append)
    m2 = p2.execute()
    assert m2.records_in == 4 and m2.records_out == 4
    assert m2.in_null_counts is None
