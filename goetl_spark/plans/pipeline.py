"""Linear pipeline: From → Transform* → Filter* → To.

Reference: ``pipeline/pipeline.go`` (SURVEY.md §3.1). The reference pulls
one record at a time through transform and filter lists; here the builder
accumulates lazy DataFrame operations and ``execute()`` runs the single
sink action. Two reference quirks are preserved deliberately:

- **filters run after all transforms**, regardless of interleaving order
  in the builder (pipeline.go:258-286 keeps separate lists);
- ``build()`` validates only that source and sink exist
  (pipeline.go:151-159).

Error strategies (core/error.go:38-47): FAIL_FAST raises on the first
error; SKIP_ERRORS and COLLECT_ERRORS can't skip individual records
mid-expression the way a record-at-a-time loop can (SURVEY §7.3) — they
map to quarantine semantics: transforms are applied permissively
(try_cast-style), and ``errors_df`` captures rows a validation predicate
rejects, so COLLECT keeps the rejects and SKIP drops them silently.
"""

from __future__ import annotations

import enum
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame


class ErrorStrategy(enum.Enum):
    FAIL_FAST = "fail_fast"
    SKIP_ERRORS = "skip_errors"
    COLLECT_ERRORS = "collect_errors"


@dataclass
class PipelineMetrics:
    records_in: int = 0
    records_out: int = 0
    records_errored: int = 0
    started_at: float = 0.0
    finished_at: float = 0.0
    #: per-field null counts at source / sink (the reference's per-run
    #: reader/writer stats, readers/csv.go:54-60) — None when the sink
    #: didn't materialize the observed plan
    in_null_counts: dict | None = None
    out_null_counts: dict | None = None

    @property
    def duration(self) -> float:
        return self.finished_at - self.started_at


@dataclass
class Pipeline:
    """Fluent linear pipeline. ``Pipeline().from_(df).map(...).where(...)
    .to(writer).execute()``.

    ``map`` takes DataFrame→DataFrame callables (TransformFunc analog,
    core/types.go:38-43); ``where`` takes Column predicates or
    DataFrame→Column callables (FilterFunc, core/types.go:47-52).
    """

    _source: DataFrame | None = None
    _transforms: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    _filters: list = field(default_factory=list)
    _sink: Callable[[DataFrame], None] | None = None
    _validate: Column | None = None
    error_strategy: ErrorStrategy = ErrorStrategy.FAIL_FAST
    collect_metrics: bool = True

    def from_(self, df: DataFrame) -> "Pipeline":
        self._source = df
        return self

    def map(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        self._transforms.append(fn)
        return self

    def where(self, pred) -> "Pipeline":
        self._filters.append(pred)
        return self

    def validate(self, pred: Column) -> "Pipeline":
        """Rows failing ``pred`` are routed per the error strategy
        (the quarantine analog of goetl's per-record error handling)."""
        self._validate = pred
        return self

    def to(self, sink: Callable[[DataFrame], None]) -> "Pipeline":
        self._sink = sink
        return self

    def with_error_strategy(self, s: ErrorStrategy) -> "Pipeline":
        self.error_strategy = s
        return self

    def build(self) -> "Pipeline":
        # only source+sink checked, like the reference (pipeline.go:151-159)
        if self._source is None:
            raise ValueError("pipeline requires a source")
        if self._sink is None:
            raise ValueError("pipeline requires a sink")
        return self

    def dataframe(self) -> DataFrame:
        """The composed lazy DataFrame (transforms first, then filters —
        the reference's fixed stage order, pipeline.go:191-248)."""
        if self._source is None:
            raise ValueError("pipeline requires a source")
        return self._compose(self._source)

    def _compose(self, df: DataFrame) -> DataFrame:
        for t in self._transforms:
            df = t(df)
        for p in self._filters:
            pred = p(df) if callable(p) else p
            df = df.filter(pred)
        return df

    def execute(self) -> PipelineMetrics:
        """Run the pipeline: compose lazily, apply error strategy, sink.

        Metrics ride the SINK'S OWN pass via the Observation API (the
        reference tracks reader/writer record+null counts as a side
        effect of the record loop, readers/csv.go:54-60) — no extra
        count jobs when the sink materializes the plan; if it doesn't,
        execute() falls back to explicit counts.
        """
        from goetl_spark.stats import IOStats

        self.build()
        m = PipelineMetrics(started_at=time.time())
        src = self._source
        in_stats = out_stats = None
        if self.collect_metrics:
            in_stats = IOStats()
            src = in_stats.attach(src)

        df = self._compose(src)
        self.errors_df: DataFrame | None = None
        if self._validate is not None:
            if self.error_strategy == ErrorStrategy.FAIL_FAST:
                bad = df.filter(~self._validate).count()
                if bad:
                    raise ValueError(f"{bad} records failed validation")
            elif self.error_strategy == ErrorStrategy.COLLECT_ERRORS:
                self.errors_df = df.filter(~self._validate)
                m.records_errored = self.errors_df.count()
                df = df.filter(self._validate)
            else:  # SKIP_ERRORS
                df = df.filter(self._validate)

        if self.collect_metrics:
            out_stats = IOStats()
            df = out_stats.attach(df)
        self._sink(df)
        if self.collect_metrics:
            if in_stats.ready:
                m.records_in = in_stats.record_count
                m.in_null_counts = in_stats.null_counts
            else:  # sink didn't materialize (e.g. stored the df) — pay a count
                m.records_in = self._source.count()
            if out_stats.ready:
                m.records_out = out_stats.record_count
                m.out_null_counts = out_stats.null_counts
            else:
                m.records_out = df.count()
        m.finished_at = time.time()
        return m
