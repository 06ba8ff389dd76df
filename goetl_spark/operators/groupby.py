"""GroupBy façade: declarative aggregation specs.

Reference: ``aggregate/groupby.go`` + ``aggregate/aggregator.go``
(SURVEY.md §2.5). The reference maintains one Aggregator instance per
(group, output) pair in a single-process hash map and string-ifies group
keys (NULL → ``"__NULL__"``, values joined by ``"|"``). Here the same
contract is expressed as ``df.groupBy().agg()`` — Spark's partial+final
hash aggregation gives map-side combine (one shuffle of partial states,
not rows), native NULL grouping, and preserved key types.

Deterministic output order: the reference sorts results by group key
(aggregate/groupby.go:196-199); ``GroupBy.apply(ordered=True)`` appends
``orderBy(group_cols)`` for the same contract.

Semantics parity:
- count counts ALL records in the group, not non-null (groupby.go:253-269)
  → ``F.count(F.lit(1))``.
- sum skips non-numeric/missing/nil silently (groupby.go:279-286)
  → ``F.sum`` ignores NULLs; typed columns make non-numeric impossible.
- avg of an empty (all-NULL) group is NULL (groupby.go:314-319) → native.
- min/max mixed-type lexicographic fallback (groupby.go:405-428) is a
  map-model artifact; typed columns use typed compare (documented deviation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AggSpec:
    """One output aggregate: (function, input column, output name)."""

    fn: str
    col: str | None
    out: str

    def to_column(self) -> Column:
        f = self.fn.lower()
        if f == "count":
            # counts all records in the group (aggregate/groupby.go:253-269)
            c = F.count(F.lit(1))
        elif f == "count_distinct":
            c = F.count_distinct(F.col(self.col))
        elif f == "approx_count_distinct":
            c = F.approx_count_distinct(F.col(self.col))
        elif f in ("sum", "avg", "min", "max", "first", "last", "stddev", "variance",
                   "median", "mode", "collect_set", "collect_list"):
            c = getattr(F, f)(F.col(self.col))
        elif f.startswith("percentile:"):
            pct = float(f.split(":", 1)[1])
            c = F.percentile_approx(F.col(self.col), pct)
        else:
            raise ValueError(f"unknown aggregate function: {self.fn}")
        return c.alias(self.out)


def count(out: str = "count") -> AggSpec:
    """All-records count (aggregate/groupby.go:56-59)."""
    return AggSpec("count", None, out)


def sum_(col: str, out: str | None = None) -> AggSpec:
    """Float sum, NULLs skipped (aggregate/groupby.go:62-65)."""
    return AggSpec("sum", col, out or f"{col}_sum")


def avg(col: str, out: str | None = None) -> AggSpec:
    """Mean over non-null; empty group → NULL (aggregate/groupby.go:68-71)."""
    return AggSpec("avg", col, out or f"{col}_avg")


def min_(col: str, out: str | None = None) -> AggSpec:
    """Typed minimum (aggregate/groupby.go:74-78)."""
    return AggSpec("min", col, out or f"{col}_min")


def max_(col: str, out: str | None = None) -> AggSpec:
    """Typed maximum (aggregate/groupby.go:80-83)."""
    return AggSpec("max", col, out or f"{col}_max")


@dataclass
class GroupBy:
    """Declarative group-by: ``GroupBy(['k'], [count(), sum_('v')]).apply(df)``.

    Mirrors ``aggregate.NewGroupBy(fields...).WithAggregator(out, agg)``
    (aggregate/groupby.go:40-83) with native types and one shuffle.
    An empty ``keys`` list gives the reference's global AggregateTask
    (dag/tasks/transform.go:163-200): a single result row.
    """

    keys: Sequence[str]
    aggs: Sequence[AggSpec] = field(default_factory=list)

    def with_agg(self, spec: AggSpec) -> "GroupBy":
        return GroupBy(self.keys, [*self.aggs, spec])

    def apply(self, df: DataFrame, ordered: bool = True) -> DataFrame:
        cols = [a.to_column() for a in self.aggs]
        if not self.keys:
            return df.agg(*cols)  # global aggregate → single row
        out = df.groupBy(*self.keys).agg(*cols)
        if ordered:
            # deterministic-output contract (aggregate/groupby.go:196-199)
            out = out.orderBy(*self.keys)
        return out


def group_by(df: DataFrame, keys: Sequence[str], *aggs: AggSpec,
             ordered: bool = True) -> DataFrame:
    """Functional shorthand for :class:`GroupBy`."""
    return GroupBy(keys, list(aggs)).apply(df, ordered=ordered)


def histogram(df, col: str, lo: float, hi: float, bins: int):
    """Fixed-range equi-width histogram — the profiling primitive for a
    column at corpus scale (one partially-aggregated scan; the result is
    ``bins`` rows regardless of input size).

    Values clamp into edge bins (bin 0 and bins−1 absorb outliers), so
    the counts always sum to the non-null row count. Bin edges are
    derived as lo + bin·w with w = (hi−lo)/bins — plain IEEE arithmetic,
    reproducible in any engine. Returns (bin, bin_lo, bin_hi, n)."""
    from pyspark.sql import functions as F

    if bins < 1 or not lo < hi:
        raise ValueError(f"need bins >= 1 and lo < hi, got {bins}, [{lo}, {hi})")
    w = (hi - lo) / bins
    c = F.col(col).cast("double")
    b = F.least(F.greatest(F.floor((c - lo) / w), F.lit(0)),
                F.lit(bins - 1)).cast("int")
    return (
        df.where(c.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "n",
        )
    )


def mode_by_group(df: DataFrame, keys: Sequence[str], col: str,
                  out: str = "mode", tie: str = "min") -> DataFrame:
    """Most frequent value of ``col`` per group, with a DETERMINISTIC
    tie-break (``'min'``/``'max'`` value among equally frequent —
    Spark's built-in ``mode()`` picks an arbitrary winner, which can
    never be oracle-checked). NULL values are excluded (they are the
    absence of a value, not a candidate mode).

    Plan: one (keys, col) count agg (map-side combined), then a
    per-group window over the ≤ distinct-values rows — both shuffles
    carry counts, never raw rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ks = list(keys)
    counts = (df.where(F.col(col).isNotNull())
              .groupBy(*ks, col)
              .agg(F.count(F.lit(1)).alias("__n")))
    order = [F.desc("__n"),
             F.asc(col) if tie == "min" else F.desc(col)]
    w = Window.partitionBy(*ks).orderBy(*order)
    return (counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(*ks, F.col(col).alias(out),
                    F.col("__n").alias("mode_count")))


def trimmed_mean(
    df: DataFrame,
    col: str,
    group_cols=(),
    trim: float = 0.1,
    value_scale: int = 4,
) -> DataFrame:
    """α-trimmed mean — the ROBUST location estimate (a plain average
    inherits every outlier; the α-trimmed mean drops the ⌊n·α⌋
    smallest and largest observations first, the robust-stats
    counterpart this family pairs with :func:`~goetl_spark.quality.
    kruskal_wallis` and Spearman). One row per group (one row total
    with no ``group_cols``): ``n / n_used / trimmed_mean``.

    Exact and tie-safe, never a sort-and-slice: over the
    (group, value)-collapsed table, each distinct value contributes
    the OVERLAP of its row span [before, before+cnt) with the kept
    window [k, n−k) — ``take = min(before+cnt, n−k) − max(before, k)``
    clamped at 0, with ``before`` from ONE ascending-value cumsum
    (the range-partitioned machinery, never a per-group window) and
    ``k = ⌊n·α⌋`` (the scipy trim_mean convention). Rows tied across
    the trim boundary are interchangeable, so the kept SUM is unique
    without any tie-break. Values quantize once onto the
    scale-``value_scale`` decimal grid; the mean is ONE exact
    rational floored onto the 1e-9 grid (the q236 discipline) —
    hash-exact in oracle SQL, ≤1e-9·grid-step understatement toward
    −∞ (signed values floor consistently in both engines only when
    non-negative — negative sums take the sign-split path).

    NULL values are EXCLUDED; NaN raises loudly via the folded
    sentinel counts (the :func:`~goetl_spark.quality.gini_coefficient`
    contract). ``trim`` must sit in [0, 0.5) — trimming half or more
    leaves nothing (the median is :func:`exact_percentiles`' job).
    Empty input returns an empty frame.

    Scale shape: one (group, value) collapse shuffle, ONE cumsum
    range exchange over the collapsed table, a groups-bounded totals
    broadcast — the ks_distance exchange budget."""
    from goetl_spark.operators.classifier import _group_offset_join
    from goetl_spark.operators.sampling import _with_exclusive_cumsum

    if not (0.0 <= trim < 0.5):
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    groups = list(group_cols)
    scale = int(value_scale)
    v = F.col(col)
    g = (df.filter(v.isNotNull())
         .groupBy(*groups, v.alias("__v"))
         .agg(F.count(F.lit(1)).alias("__cnt")))
    c = _with_exclusive_cumsum(g, "__cnt", [*groups, "__v"], "__cb")
    vd = F.col("__v").cast("double")
    bad_nan = F.isnan(vd)
    v4 = F.when(~bad_nan,
                (F.col("__v").cast(f"decimal({15 + scale},{scale})")
                 * F.lit(10 ** scale)).cast(f"decimal({16 + scale},0)"))
    c = c.select(*groups, "__cnt", "__cb", v4.alias("__v4"),
                 F.when(bad_nan, F.col("__cnt")).otherwise(0).alias("__bn"))
    off_aggs = [F.min("__cb").alias("__g0"),
                F.sum("__cnt").alias("__n"),
                F.sum("__bn").alias("__nbad")]
    if groups:
        c = _group_offset_join(c, groups, c.groupBy(*groups).agg(*off_aggs))
    else:
        c = c.crossJoin(F.broadcast(c.agg(*off_aggs)))

    k = F.floor(F.col("__n").cast("double") * F.lit(float(trim))) \
        .cast("long")
    before = F.col("__cb") - F.col("__g0")
    take = F.greatest(
        F.lit(0).cast("long"),
        F.least(before + F.col("__cnt"), F.col("__n") - k)
        - F.greatest(before, k))
    agg = (c.withColumn("__take", take)
           .groupBy(*groups)
           .agg(F.sum(F.col("__v4") * F.col("__take")).alias("__num"),
                F.sum("__take").alias("__den"),
                F.first("__n").alias("__fn"),
                F.first("__nbad").alias("__fbad")))
    ok = F.assert_true(
        F.col("__fbad") == 0,
        F.lit(f"trimmed_mean: NaN values in {col!r} — NaN has no place "
              f"in an order statistic; filter or impute upstream"))
    # sign-split grid: DIV truncates in Spark but floors in DuckDB —
    # they agree only on non-negative numerators (the cohens_kappa
    # lesson)
    m9 = F.expr("""
        CASE WHEN __num >= 0 THEN
            (CAST(__num * 1000000000 AS DECIMAL(38,0))) DIV __den
        ELSE
            -((CAST((-__num) * 1000000000 AS DECIMAL(38,0))) DIV __den)
        END""")
    mean = F.when(ok.isNull() & (F.col("__den") > 0),
                  m9.cast("double") / F.lit(1.0e9 * 10 ** scale))
    return (agg.filter(F.col("__fn").isNotNull())
            .select(*groups,
                    F.col("__fn").cast("long").alias("n"),
                    F.col("__den").cast("long").alias("n_used"),
                    mean.alias("trimmed_mean")))
