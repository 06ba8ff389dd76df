"""Orchestration: linear Pipeline and DAG builder/executor.

Reference: ``pipeline/pipeline.go`` and ``dag/`` (SURVEY.md §2.10, §3).
The reference materializes every intermediate dataset in memory and
schedules tasks itself; here tasks compose lazy DataFrames and only sink
tasks trigger actions — Catalyst owns the execution plan, the runner owns
retry/timeout/trigger-rule/metrics semantics.
"""

from goetl_spark.plans.pipeline import ErrorStrategy, Pipeline
from goetl_spark.plans.dag import (
    DAG,
    DAGBuilder,
    DAGExecutor,
    RetryConfig,
    TaskResult,
    TaskStatus,
    TriggerRule,
)

__all__ = [
    "Pipeline", "ErrorStrategy",
    "DAG", "DAGBuilder", "DAGExecutor", "RetryConfig",
    "TaskResult", "TaskStatus", "TriggerRule",
]
