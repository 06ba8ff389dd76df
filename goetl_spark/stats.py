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
