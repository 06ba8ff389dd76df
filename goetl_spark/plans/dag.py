"""DAG builder + executor: named tasks, dependencies, retry, trigger rules.

Reference: ``dag/`` (SURVEY.md §2.10, §3.2) — DAGBuilder validation
(cycle + missing-dep at build, dag_builder.go:153-215), Kahn topological
sort with level grouping (dag.go:339-385, dag_executor.go:150-183),
per-task retry/backoff (base.go:64-144), trigger rules
(dag_executor.go:309-349), shared context (dag.go:124-144), per-task
metrics (base.go:195-204).

Execution model difference (deliberate, SURVEY §3.2): tasks produce lazy
DataFrames — nothing materializes until a task performs an action (sinks,
counts). Level-parallelism exists in the reference to overlap task CPU;
here levels run tasks sequentially by default (Catalyst parallelizes
inside each action across all cores) with an opt-in thread pool for
overlapping independent sink actions — the one case where driver-side
concurrency still helps on a cluster.

A task is ``fn(ctx: TaskContext) -> DataFrame | None``. Fan-in inputs:
``ctx.input`` is the implicit UNION ALL of dependency outputs
(dag_executor.go:352-376), ``ctx.source_map[dep_id]`` the per-dependency
DataFrames (used by join/CDC/SCD tasks, dag/tasks/join.go:62-63).
"""

from __future__ import annotations

import enum
import random
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame


class TaskStatus(enum.Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"


class TriggerRule(enum.Enum):
    """dag/types.go:29-35 (duplicated in dag/tasks/base.go:50-57)."""

    ALL_SUCCESS = "all_success"
    ALL_COMPLETE = "all_complete"
    ONE_FAILED = "one_failed"
    ONE_SUCCESS = "one_success"
    NONE_FAILED = "none_failed"


@dataclass
class RetryConfig:
    """dag/tasks/base.go:64-144."""

    max_retries: int = 0
    backoff_seconds: float = 0.1
    strategy: str = "exponential"  # exponential | linear | fixed | jittered | none
    retry_on: Sequence[str] = ()   # substrings matched against the error text

    def delay(self, attempt: int) -> float:
        base = self.backoff_seconds
        if self.strategy == "exponential":
            return base * (2 ** attempt)
        if self.strategy == "linear":
            return base * (attempt + 1)
        if self.strategy == "jittered":
            return base * (2 ** attempt) * (0.5 + random.random() / 2)
        if self.strategy == "none":
            return 0.0
        return base  # fixed

    def should_retry(self, err: Exception, attempt: int) -> bool:
        if attempt >= self.max_retries:
            return False
        if not self.retry_on:
            return True
        text = str(err)
        return any(s in text for s in self.retry_on)


@dataclass
class TaskMetrics:
    """base.go:195-204."""

    status: TaskStatus = TaskStatus.PENDING
    attempts: int = 0
    started_at: float = 0.0
    finished_at: float = 0.0
    error: str | None = None

    @property
    def duration(self) -> float:
        return (self.finished_at - self.started_at) if self.finished_at else 0.0


@dataclass
class TaskResult:
    task_id: str
    status: TaskStatus
    output: DataFrame | None
    metrics: TaskMetrics


@dataclass
class TaskContext:
    """What a task sees: fan-in input, per-dependency outputs, shared ctx."""

    dag_context: dict
    source_map: dict[str, DataFrame]
    dependencies: Sequence[str]

    @property
    def input(self) -> DataFrame | None:
        """Implicit by-name UNION ALL of all dependency outputs
        (dag_executor.go:358-369)."""
        from goetl_spark.operators.union import fan_in

        dfs = [self.source_map[d] for d in self.dependencies
               if self.source_map.get(d) is not None]
        return fan_in(dfs) if dfs else None


@dataclass
class Task:
    task_id: str
    fn: Callable[[TaskContext], DataFrame | None]
    dependencies: Sequence[str] = ()
    retry: RetryConfig = field(default_factory=RetryConfig)
    timeout_seconds: float | None = None
    trigger_rule: TriggerRule = TriggerRule.ALL_SUCCESS
    # OnTrue/OnFalse branch routing: run only when the named conditional
    # task evaluated to the given boolean. The reference declared this but
    # never implemented executor routing (dag/tasks/conditional.go:58-60);
    # here it is implemented (SURVEY §7.1 item 7).
    condition: tuple[str, bool] | None = None
    is_conditional: bool = False


@dataclass
class DAG:
    dag_id: str
    tasks: dict[str, Task]

    def execution_levels(self) -> list[list[str]]:
        """Kahn's algorithm grouped into dependency levels
        (dag.go:339-385, dag_executor.go:150-183)."""
        level: dict[str, int] = {}
        remaining = dict(self.tasks)
        while remaining:
            progressed = False
            for tid, t in list(remaining.items()):
                if all(d in level for d in t.dependencies):
                    level[tid] = 1 + max((level[d] for d in t.dependencies), default=-1)
                    del remaining[tid]
                    progressed = True
            if not progressed:  # pragma: no cover — build() rejects cycles
                raise ValueError(f"cycle among: {sorted(remaining)}")
        out: dict[int, list[str]] = {}
        for tid, lv in level.items():
            out.setdefault(lv, []).append(tid)
        return [sorted(out[lv]) for lv in sorted(out)]

    def max_depth(self) -> int:
        return len(self.execution_levels())


class DAGBuilder:
    """Fluent builder with build-time validation (dag_builder.go:33-215)."""

    def __init__(self, dag_id: str = "dag"):
        self.dag_id = dag_id
        self._tasks: dict[str, Task] = {}

    def add_task(
        self,
        task_id: str,
        fn: Callable[[TaskContext], DataFrame | None],
        dependencies: Sequence[str] = (),
        retry: RetryConfig | None = None,
        timeout_seconds: float | None = None,
        trigger_rule: TriggerRule = TriggerRule.ALL_SUCCESS,
        condition: tuple[str, bool] | None = None,
    ) -> "DAGBuilder":
        if task_id in self._tasks:
            raise ValueError(f"duplicate task id: {task_id}")
        self._tasks[task_id] = Task(
            task_id, fn, tuple(dependencies), retry or RetryConfig(),
            timeout_seconds, trigger_rule, condition,
        )
        return self

    def add_source(self, task_id: str, df_fn: Callable[[], DataFrame]) -> "DAGBuilder":
        return self.add_task(task_id, lambda ctx: df_fn())

    def add_conditional(
        self,
        task_id: str,
        predicate: Callable[[TaskContext], bool],
        dependencies: Sequence[str] = (),
    ) -> "DAGBuilder":
        """Conditional task (dag/tasks/conditional.go:31-120): evaluates a
        driver-side predicate over its input, passes records through
        unchanged, and stores ``<id>_condition_result`` in the shared
        context. Downstream tasks opt into a branch with
        ``condition=(task_id, True/False)``."""

        def fn(ctx: TaskContext):
            result = bool(predicate(ctx))
            ctx.dag_context[f"{task_id}_condition_result"] = result
            return ctx.input  # records pass through (conditional.go:62-78)

        self.add_task(task_id, fn, dependencies)
        self._tasks[task_id].is_conditional = True
        return self

    def build(self) -> DAG:
        # missing-dependency check (dag_builder.go:190-198)
        for t in self._tasks.values():
            for d in t.dependencies:
                if d not in self._tasks:
                    raise ValueError(f"task {t.task_id} depends on missing task {d}")
        # DFS cycle detection (dag_builder.go:153-188)
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {tid: WHITE for tid in self._tasks}

        def visit(tid: str, stack: list[str]):
            color[tid] = GRAY
            for d in self._tasks[tid].dependencies:
                if color[d] == GRAY:
                    raise ValueError(f"cycle detected: {' -> '.join(stack + [tid, d])}")
                if color[d] == WHITE:
                    visit(d, stack + [tid])
            color[tid] = BLACK

        for tid in self._tasks:
            if color[tid] == WHITE:
                visit(tid, [])
        return DAG(self.dag_id, dict(self._tasks))


class DAGExecutor:
    """Level-ordered executor with retry, timeout, trigger rules, metrics
    (dag_executor.go:83-349)."""

    def __init__(self, max_workers: int = 1):
        self.max_workers = max_workers

    def execute(self, dag: DAG, context: dict | None = None) -> dict[str, TaskResult]:
        results: dict[str, TaskResult] = {}
        shared: dict = dict(context or {})
        outputs: dict[str, DataFrame] = {}

        for level in dag.execution_levels():
            if self.max_workers > 1 and len(level) > 1:
                with ThreadPoolExecutor(self.max_workers) as pool:
                    futs = {
                        tid: pool.submit(
                            self._run_task, dag.tasks[tid], results, outputs, shared)
                        for tid in level
                    }
                    for tid, fut in futs.items():
                        results[tid] = fut.result()
            else:
                for tid in level:
                    results[tid] = self._run_task(
                        dag.tasks[tid], results, outputs, shared)
            for tid in level:
                if results[tid].output is not None:
                    outputs[tid] = results[tid].output
        return results

    # -- internals ---------------------------------------------------------

    def _trigger_ok(self, task: Task, results: Mapping[str, TaskResult]) -> bool:
        """dag_executor.go:309-349."""
        deps = [results[d] for d in task.dependencies if d in results]
        statuses = [d.status for d in deps]
        rule = task.trigger_rule
        if not deps:
            return True
        if rule == TriggerRule.ALL_SUCCESS:
            return all(s == TaskStatus.SUCCESS for s in statuses)
        if rule == TriggerRule.ALL_COMPLETE:
            return all(s in (TaskStatus.SUCCESS, TaskStatus.FAILED, TaskStatus.SKIPPED)
                       for s in statuses)
        if rule == TriggerRule.ONE_FAILED:
            return any(s == TaskStatus.FAILED for s in statuses)
        if rule == TriggerRule.ONE_SUCCESS:
            return any(s == TaskStatus.SUCCESS for s in statuses)
        if rule == TriggerRule.NONE_FAILED:
            return all(s != TaskStatus.FAILED for s in statuses)
        return False

    def _run_task(
        self,
        task: Task,
        results: Mapping[str, TaskResult],
        outputs: Mapping[str, DataFrame],
        shared: dict,
    ) -> TaskResult:
        metrics = TaskMetrics(started_at=time.time())
        if not self._trigger_ok(task, results):
            metrics.status = TaskStatus.SKIPPED
            metrics.finished_at = time.time()
            return TaskResult(task.task_id, TaskStatus.SKIPPED, None, metrics)
        if task.condition is not None:
            cond_id, wanted = task.condition
            actual = shared.get(f"{cond_id}_condition_result")
            if actual is not wanted:
                metrics.status = TaskStatus.SKIPPED
                metrics.finished_at = time.time()
                return TaskResult(task.task_id, TaskStatus.SKIPPED, None, metrics)

        ctx = TaskContext(
            dag_context=shared,
            source_map={d: outputs.get(d) for d in task.dependencies},
            dependencies=task.dependencies,
        )
        attempt = 0
        while True:
            metrics.attempts = attempt + 1
            try:
                out = self._with_timeout(task, ctx)
                metrics.status = TaskStatus.SUCCESS
                metrics.finished_at = time.time()
                return TaskResult(task.task_id, TaskStatus.SUCCESS, out, metrics)
            except Exception as e:  # noqa: BLE001 — task errors are data
                if task.retry.should_retry(e, attempt):
                    time.sleep(task.retry.delay(attempt))
                    attempt += 1
                    continue
                metrics.status = TaskStatus.FAILED
                metrics.error = str(e)
                metrics.finished_at = time.time()
                return TaskResult(task.task_id, TaskStatus.FAILED, None, metrics)

    def _with_timeout(self, task: Task, ctx: TaskContext):
        if task.timeout_seconds is None:
            return task.fn(ctx)
        # non-blocking shutdown: `with ThreadPoolExecutor` would call
        # shutdown(wait=True) and hang until the stuck task returns.
        # Python can't preempt a running thread, so a timed-out task may
        # keep running in the abandoned worker (and will still be joined
        # at interpreter exit) — but the DAG proceeds immediately, and a
        # retry runs on a FRESH pool, never queued behind the hung
        # attempt. Callers mutating ctx from a timed-out task must make
        # those writes idempotent.
        pool = ThreadPoolExecutor(
            1, thread_name_prefix=f"goetl-task-{task.task_id}")
        fut = pool.submit(task.fn, ctx)
        try:
            return fut.result(timeout=task.timeout_seconds)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
