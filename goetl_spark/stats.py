"""Per-pass I/O statistics via the Spark Observation API.

Every reference reader and writer tracks record count and per-field null
counts as a side effect of the data pass (readers/csv.go:54-60,163-165;
writers/json.go:169-172) and prints them per pipeline run. The Spark-
native equivalent is ``DataFrame.observe``: metric expressions evaluated
by the SAME job that materializes the data — no second scan, no extra
job, and the aggregation happens executor-side with only the final
scalar row returned to the driver (scale-safe at 100 TB: the observation
adds one tiny partial-agg to the existing pass).

Usage (reader side, out-param keeps the DataFrame return type)::

    stats = IOStats()
    df = read_csv(spark, path, stats=stats)
    df.write.parquet(out)          # any action materializes the metrics
    stats.record_count             # filled by that pass
    stats.null_counts["price"]

Writer side, the write IS the action, so stats are ready on return::

    stats = write_parquet(df, out)
    stats.null_counts

Session-level caveat (Spark 4.1): once Observations exist, executing a
pyspark.ml TRANSFORM plan can fail with ``NotSerializableException:
ObservationManager`` — see the dedup_clusters docstring; this engine's
classifier scores via Column expressions (classifier.score_quality),
which is immune.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_names = itertools.count()


class IOStats:
    """Record count + per-field null counts from one data pass.

    Properties block until an action has run on the observed DataFrame
    (``Observation.get`` semantics) — mirroring the reference where the
    stats maps are only meaningful after ``Read``/``Write`` loops finish
    (readers/csv.go:54-60).

    Null counting matches the reference: a CSV empty string arrives as
    NULL (readers read with ``nullValue=""``), so ``null_counts`` covers
    the reference's "null or empty" bookkeeping (csv.go:163-165).
    """

    def __init__(self) -> None:
        self._obs: Observation | None = None
        self._fields: list[str] = []

    def attach(self, df: DataFrame) -> DataFrame:
        """Instrument ``df``; returns the observed DataFrame to hand on."""
        if self._obs is not None:
            raise ValueError("IOStats is single-use: one stats object per pass")
        self._obs = Observation(f"goetl_io_stats_{next(_names)}")
        self._fields = list(df.columns)
        metrics = [F.count(F.lit(1)).alias("_records")]
        metrics += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{i}")
            for i, c in enumerate(self._fields)
        ]
        return df.observe(self._obs, *metrics)

    @property
    def ready(self) -> bool:
        """True once an action has materialized the observed DataFrame.

        Non-blocking (vs ``record_count``/``null_counts``, which wait):
        probes the JVM observation's ``getRowOrEmpty`` — note
        ``getOrEmpty`` NPEs on this Spark build when no action ran.
        """
        jo = getattr(self._obs, "_jo", None) if self._obs else None
        if jo is None:
            return False
        try:
            return not jo.getRowOrEmpty().isEmpty()
        except Exception:
            # private JVM surface: absent/renamed on another Spark build →
            # report not-ready so callers fall back to explicit counts
            # rather than crashing metrics collection
            return False

    @property
    def _values(self) -> dict:
        if self._obs is None:
            raise ValueError("IOStats not attached to any DataFrame")
        return self._obs.get

    @property
    def record_count(self) -> int:
        return int(self._values["_records"])

    @property
    def null_counts(self) -> dict[str, int]:
        vals = self._values
        return {
            c: int(vals[f"_nulls_{i}"] or 0)
            for i, c in enumerate(self._fields)
        }


def pearson_corr_exact(df: DataFrame, x: str, y: str,
                       moment_scale: int = 1) -> DataFrame:
    """Pearson correlation from EXACT decimal sums — the deterministic,
    cross-engine-reproducible formulation of ``corr()``.

    Naive float aggregation of Σx, Σx², Σxy is order-dependent in the
    last ulps, so two engines (or two runs with different partitioning)
    disagree. Here every sum accumulates in exact decimal — partial
    aggregation and shuffle order cannot change a bit — and only the
    FINAL five-term formula runs in IEEE doubles. Two measured
    cross-engine hazards shape the details (see transforms.standardize):
    the second-moment products are squared IN DECIMAL (a double-product
    cast to scale 6 is ambiguous once the product's ulp exceeds 1e-6),
    and each moment sum is rounded down to scale 1 before its double
    cast (decimal→double is only correctly rounded in both engines
    while the scaled integer fits 2⁵³; the explicit round() matters —
    a bare scale cast truncates in DuckDB but rounds in Spark).
    One partial-aggregated scan, one scalar row out.

    ``moment_scale`` sets that pre-cast rounding scale: the default 1
    is right for unit-and-above magnitudes (prices, quantities); RAISE
    it for |x| ≪ 1 columns (normalized scores), where scale-1 sums
    would collapse to 0 and poison the formula — same dial as
    transforms.standardize's second_moment_scale. Degenerate inputs
    (zero variance after rounding) yield corr = NULL, never NaN.

    Returns a 1-row DataFrame (n, corr)."""
    xd = F.col(x).cast("double")
    yd = F.col(y).cast("double")
    xq = xd.cast("decimal(19,6)")
    yq = yd.cast("decimal(19,6)")

    def shrink(c):  # exact decimal -> double, safely inside 2^53
        return (F.round(c, moment_scale)
                .cast(f"decimal(38,{moment_scale})").cast("double"))

    agg = df.where(F.col(x).isNotNull() & F.col(y).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        shrink(F.sum(xd.cast("decimal(38,6)"))).alias("sx"),
        shrink(F.sum(yd.cast("decimal(38,6)"))).alias("sy"),
        shrink(F.sum(xq * xq)).alias("sxx"),
        shrink(F.sum(yq * yq)).alias("syy"),
        shrink(F.sum(xq * yq)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy = F.col("sxx"), F.col("syy")
    sxy = F.col("sxy")
    # greatest(·, 0) guards rounding-induced tiny negatives (sqrt(neg)
    # would be NaN); nullif turns a zero-variance denominator into NULL.
    # Both are value-neutral on non-degenerate inputs (x > 0 ⇒
    # greatest(x, 0) ≡ x bit-for-bit), so oracle parity is unaffected.
    denom = (F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
             * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0))))
    corr = (n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0))
    return agg.select(F.col("n"), corr.alias("corr"))


def spearman_corr(df: DataFrame, x: str, y: str,
                  group_cols=()) -> DataFrame:
    """Spearman rank correlation with midrank ties — the MONOTONE
    association companion to :func:`pearson_corr_exact` (Pearson asks
    "linear?", Spearman asks "monotone?" — outlier-robust and
    scale-free, the feature-screening question a curation pipeline
    asks of heavy-tailed columns where one extreme pair can saturate
    Pearson). One row per group (one row total with no
    ``group_cols``): ``n / rho``.

    Exact ranks, not approximations: each column's midranks come from
    the (group, value)-collapsed table — an exclusive cumulative
    count via the range-partitioned two-phase cumsum (the roc_auc
    machinery, never a per-group window over fact rows) gives
    ``rank2 = 2·cum_before + cnt + 1``, the midrank on the ×2 integer
    grid (ties share it; the grid keeps .5 midranks integral) —
    joined back to fact rows (null-safe on group keys). rho is then
    Pearson over the two integer rank columns with every moment
    accumulated in EXACT decimal; only the final five-term IEEE chain
    runs in doubles.

    NULL on either side excludes the PAIR (both rankings must cover
    the same rows — the pearson_corr_exact contract); NaN raises
    loudly via a count folded into the moment aggregate (NaN would
    take an arbitrary rank and silently distort rho). A group whose
    surviving x (or y) is CONSTANT yields rho NULL (monotone
    association with a constant is undefined, not 0). Empty input
    returns an empty frame.

    Determinism: within Spark, unconditional (exact integer moments;
    the final double chain is a fixed function of them). Cross-engine
    ORACLE parity additionally needs the moment values inside 2⁵³
    (decimal→double casts are only correctly rounded there in both
    engines — the pearson_corr_exact caveat): moments grow as ~4n³
    per group, so bit-exact parity holds for per-group n ≲ 6e4;
    beyond that results are correct to the last ulp but not
    contractually hash-identical. Exactness (decimal-38) bound:
    n ≲ 1e9 per group.

    Scale shape: two (group, value) collapse shuffles + two cumsum
    exchanges over the collapsed tables, two equi-joins back to fact
    rows on (group, value), ONE moment aggregate — no window over
    fact rows, no collect beyond the cumsum's per-partition totals."""
    from goetl_spark.operators.classifier import _group_offset_join
    from goetl_spark.operators.sampling import _with_exclusive_cumsum

    groups = list(group_cols)
    fact = (df.select(*groups, F.col(x).alias("__x"), F.col(y).alias("__y"))
            .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull()))

    def rank2_table(col_name: str, out: str) -> DataFrame:
        gt = (fact.groupBy(*groups, F.col(col_name).alias("__v"))
              .agg(F.count(F.lit(1)).alias("__cnt")))
        ct = _with_exclusive_cumsum(gt, "__cnt", [*groups, "__v"], "__cb")
        if groups:
            ct = _group_offset_join(
                ct, groups,
                ct.groupBy(*groups).agg(F.min("__cb").alias("__g0")))
        else:
            ct = ct.crossJoin(
                F.broadcast(ct.agg(F.min("__cb").alias("__g0"))))
        return ct.select(
            *[F.col(g).alias(f"__rg_{i}") for i, g in enumerate(groups)],
            F.col("__v").alias(f"__v_{out}"),
            (2 * (F.col("__cb") - F.col("__g0")) + F.col("__cnt") + 1)
            .cast("long").alias(out))

    def back(joined: DataFrame, rt: DataFrame, col_name: str,
             out: str) -> DataFrame:
        cond = F.col(col_name) == F.col(f"__v_{out}")
        for i, g in enumerate(groups):
            cond = cond & F.col(g).eqNullSafe(F.col(f"__rg_{i}"))
        return (joined.join(rt, on=cond, how="inner")
                .drop(f"__v_{out}",
                      *[f"__rg_{i}" for i in range(len(groups))]))

    ranked = back(back(fact, rank2_table("__x", "__rx"), "__x", "__rx"),
                  rank2_table("__y", "__ry"), "__y", "__ry")

    xr = F.col("__rx").cast("decimal(19,0)")
    yr = F.col("__ry").cast("decimal(19,0)")
    nan_pair = (F.isnan(F.col("__x").cast("double"))
                | F.isnan(F.col("__y").cast("double")))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(nan_pair, 1).otherwise(0)).alias("__nbad"),
        F.sum(xr).alias("__sx"), F.sum(yr).alias("__sy"),
        F.sum(xr * xr).alias("__sxx"), F.sum(yr * yr).alias("__syy"),
        F.sum(xr * yr).alias("__sxy"),
    ]
    m = (ranked.groupBy(*groups).agg(*aggs) if groups
         else ranked.agg(*aggs))
    ok = F.assert_true(
        F.col("__nbad") == 0,
        F.lit(f"spearman_corr: NaN values in {x!r}/{y!r} — NaN has no "
              f"rank; filter or impute upstream"))
    nd = F.col("n").cast("decimal(19,0)")
    num = nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    da = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    db = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    rho = F.when(
        ok.isNull() & (da > 0) & (db > 0),
        num.cast("double")
        / (F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))))
    return (m.filter((F.col("n") > 0) | (F.col("__nbad") > 0))
            .select(*groups, F.col("n").cast("long").alias("n"),
                    rho.alias("rho")))
