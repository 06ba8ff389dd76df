"""Time-series resampling and range-window rolling aggregates.

Beyond the reference surface (goetl has no time-series operators —
SURVEY.md §2.6 roadmap) but core to any event-analytics warehouse:
regularize an irregular event stream onto a fixed grid (gap-filled so
downstream models see every bucket) and compute time-range rolling
statistics (the "last hour" kind, not "last N rows").

Scale design:

- ``resample_fill`` aggregates FIRST (one shuffle on (key, bucket) —
  the raw stream collapses to ≤ buckets·keys rows before anything
  else), then builds each key's grid with ``sequence()`` + ``explode``
  — map-side, no driver loop — and left-joins the aggregates back on
  the same key partitioning. Forward-fill is one window pass per key
  ordered by bucket (``last(ignorenulls)``), reusing the join's
  exchange. A ``max_buckets_per_key`` guard fails fast when a rogue
  timestamp range would explode the grid (a single bad epoch-0 row at
  100 TB would otherwise materialize decades of buckets per key).
- ``rolling_range`` is a native RANGE window on epoch seconds — one
  shuffle on the partition keys, sort within, whole-stage codegen; no
  self-join, no UDF. Sums accumulate in DECIMAL(38,6) so the result is
  shuffle-order-independent (same trick as queries.dsum).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(ts_col: str, step_seconds: int) -> Column:
    """Floor a timestamp column to its step-aligned bucket start.

    ``pmod`` (not ``%``) so pre-1970 epochs floor toward -inf like
    ``date_trunc`` does: Spark's ``%`` keeps the dividend's sign, which
    would round a negative epoch toward zero and put the bucket start
    AFTER the event (round-6 advisor finding).
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    return F.timestamp_seconds((epoch - F.pmod(epoch, F.lit(step_seconds))))


def resample_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, Column],
    zero_fill: Sequence[str] = (),
    forward_fill: Sequence[str] = (),
    bucket_col: str = "bucket_ts",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Aggregate an event stream onto a regular per-key time grid.

    Buckets span each key's own [min, max] event range at
    ``step_seconds`` resolution; buckets with no events appear with
    NULL aggregates, then ``zero_fill`` columns become 0 and
    ``forward_fill`` columns take the last non-null earlier value
    (classic gap-fill semantics).

    ``aggs`` maps output column name -> aggregate Column over the raw
    events (evaluated per (key, bucket)).
    """
    keys = list(key_cols)
    b = _bucket(ts_col, step_seconds)

    per_bucket = (
        df.withColumn(bucket_col, b)
        .groupBy(*keys, bucket_col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )

    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    spans = (
        df.groupBy(*keys)
        .agg(F.min(b).alias("__lo"), F.max(b).alias("__hi"))
    )
    # fail fast on grids no cluster should materialize
    spans = spans.withColumn(
        "__n",
        (F.unix_timestamp("__hi") - F.unix_timestamp("__lo"))
        / F.lit(int(step_seconds)) + 1,
    )
    # the guard lives in a FILTER (a projected guard column would be
    # pruned away by Catalyst as dead code and never evaluate)
    guard = F.when(
        F.col("__n") > max_buckets_per_key,
        F.raise_error(F.concat(
            F.lit(f"resample_fill: key exceeds max_buckets_per_key="
                  f"{max_buckets_per_key}: "),
            F.col("__n").cast("string"))),
    ).otherwise(F.lit(True))
    grid = (
        spans.filter(guard)
        .select(*keys,
                F.explode(F.sequence("__lo", "__hi", step)).alias(bucket_col))
    )

    out = grid.join(per_bucket, on=keys + [bucket_col], how="left")
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if forward_fill:
        w = (Window.partitionBy(*keys).orderBy(bucket_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        for c in forward_fill:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling_range(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    range_seconds: int,
    sum_col: str = "rolling_sum",
    count_col: str = "rolling_count",
    avg_col: str | None = "rolling_avg",
) -> DataFrame:
    """Time-range rolling sum/count/avg: for each row, aggregate over
    all rows of the same key within the trailing ``range_seconds``
    (inclusive of the current row and of epoch-second ties — RANGE
    frame semantics, identical in Spark and ANSI SQL).

    The sum is exact-decimal so engines agree bit-for-bit; avg is the
    decimal sum divided by the bigint count in doubles (same IEEE op
    both sides of the oracle). ``count_col`` counts all frame rows
    (COUNT(*)); the avg denominator counts only non-NULL ``value_col``
    rows, matching ANSI ``AVG(value) OVER`` which skips NULLs in both
    numerator and denominator (round-6 advisor finding).
    """
    # rows without an event time cannot be placed in any range frame —
    # and Spark (NULLS FIRST) and ANSI engines (NULLS LAST) disagree on
    # where a NULL sorts in a window ORDER BY, so dropping them is the
    # only deterministic contract
    df = df.where(F.col(ts_col).isNotNull())
    epoch = F.unix_timestamp(F.col(ts_col))
    out = df.withColumn("__epoch", epoch)
    w = (Window.partitionBy(*key_cols).orderBy("__epoch")
         .rangeBetween(-int(range_seconds), 0))
    dec = F.col(value_col).cast("decimal(38,6)")
    out = out.withColumn(sum_col, F.sum(dec).over(w).cast("double"))
    out = out.withColumn(count_col, F.count(F.lit(1)).over(w))
    if avg_col:
        out = out.withColumn(
            avg_col,
            F.sum(dec).over(w).cast("double")
            / F.count(F.col(value_col)).over(w))
    return out.drop("__epoch")


def ewma(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    key_cols: Sequence[str],
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key — the classic
    trend/anomaly smoother: ``y_i = alpha * x_i + (1 - alpha) * y_{i-1}``
    with ``y_1 = x_1``, rows ordered by ``order_cols`` within each
    ``key_cols`` group (make the order a TOTAL order — ties would make
    the recurrence nondeterministic). NULL values emit NULL and leave
    the running state untouched.

    Scale shape: the recurrence is inherently serial PER KEY, so this
    runs as one ``applyInPandas`` pass — one shuffle on the keys, each
    series smoothed sequentially in its executor (the standard
    assumption: a single key's series fits one task). A segmented-scan
    reformulation (cumsum of ``x_i / (1-alpha)^i``) exists but
    overflows for series longer than a few thousand rows, so the
    explicit loop is the correct 100 TB form. The loop applies exactly
    ``alpha * x + (1 - alpha) * y`` per step — an order a SQL recursive
    CTE replays bit-for-bit (q168's oracle does)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    keys = list(key_cols)
    order = list(order_cols)
    if not keys or not order:
        raise ValueError("key_cols and order_cols must be non-empty")
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, which would
    # corrupt df's own schema object
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.DoubleType())])

    def smooth(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        out, y = [], None
        for x in pdf[value_col]:
            if x is None or x != x:  # NULL / NaN: emit NULL, keep state
                out.append(None)
                continue
            y = float(x) if y is None else alpha * float(x) + (1 - alpha) * y
            out.append(y)
        pdf[out_col] = out
        return pdf

    return df.groupBy(*keys).applyInPandas(smooth, schema=schema)


def holt_smooth(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    key_cols: Sequence[str],
    alpha: float,
    beta: float,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt's double exponential smoothing per key — :func:`ewma` plus a
    trend term, the standard forecaster for drifting series (capacity,
    throughput, cost curves):

    ``l_i = alpha * x_i + (1 - alpha) * (l_{i-1} + b_{i-1})``
    ``b_i = beta * (l_i - l_{i-1}) + (1 - beta) * b_{i-1}``

    initialized ``l_1 = x_1, b_1 = 0``; the one-step-ahead forecast is
    ``level + trend``. NULL values emit NULL for both outputs and leave
    the running state untouched (same contract as :func:`ewma`).

    Scale shape is identical to :func:`ewma`: the recurrence is serial
    PER KEY, so one ``applyInPandas`` pass — a single shuffle on the
    keys, each series smoothed sequentially in its executor. The loop
    body applies the two update expressions in a fixed left-to-right
    float64 order, so a SQL recursive CTE carrying (level, trend)
    replays them bit-for-bit at dyadic alpha/beta (q180's oracle).
    """
    for name, v in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name} must be in (0, 1], got {v}")
    keys = list(key_cols)
    order = list(order_cols)
    if not keys or not order:
        raise ValueError("key_cols and order_cols must be non-empty")
    from pyspark.sql import types as T

    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(level_col, T.DoubleType()),
                             T.StructField(trend_col, T.DoubleType())])

    def smooth(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        levels, trends = [], []
        l = b = None
        for x in pdf[value_col]:
            if x is None or x != x:  # NULL / NaN: emit NULL, keep state
                levels.append(None)
                trends.append(None)
                continue
            if l is None:
                l, b = float(x), 0.0
            else:
                lp = alpha * float(x) + (1 - alpha) * (l + b)
                b = beta * (lp - l) + (1 - beta) * b
                l = lp
            levels.append(l)
            trends.append(b)
        pdf[level_col] = levels
        pdf[trend_col] = trends
        return pdf

    return df.groupBy(*keys).applyInPandas(smooth, schema=schema)


def cusum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    key_cols: Sequence[str],
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    pos_col: str = "cusum_pos",
    neg_col: str = "cusum_neg",
    alarm_col: str = "alarm",
) -> DataFrame:
    """Tabular CUSUM change-point detection per key (Page 1954) — the
    standard drift detector for data-quality monitoring (a feed whose
    mean shifts, a sensor that sticks, a crawler whose doc-length
    distribution moves):

    ``s+_i = max(0, s+_{i-1} + (x_i - target - slack))``
    ``s-_i = max(0, s-_{i-1} + (target - x_i - slack))``

    with ``s+_0 = s-_0 = 0``; ``alarm`` is true whenever either side
    exceeds ``threshold`` (NULL alarms when ``threshold`` is None).
    ``slack`` (the "k" allowance, typically half the shift you want to
    detect) absorbs in-control noise so the statistic only grows on a
    sustained shift. NULL values emit NULL and leave the running state
    untouched (the :func:`ewma`/:func:`holt_smooth` family contract).

    Scale shape is identical to :func:`ewma`: the recurrence is serial
    PER KEY, so one ``applyInPandas`` pass — a single shuffle on the
    keys, each series scanned sequentially in its executor. Each step
    is ``max(0, s + ((x - target) - slack))`` evaluated left-to-right
    in float64, so a SQL recursive CTE carrying (s+, s-) replays it
    bit-for-bit (q186's oracle) — GREATEST against an exact 0.0 is
    order-insensitive, unlike a sum re-association would be.
    """
    keys = list(key_cols)
    order = list(order_cols)
    if not keys or not order:
        raise ValueError("key_cols and order_cols must be non-empty")
    if slack < 0.0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    from pyspark.sql import types as T

    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(pos_col, T.DoubleType()),
                             T.StructField(neg_col, T.DoubleType()),
                             T.StructField(alarm_col, T.BooleanType())])

    def scan(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        pos, neg, alarms = [], [], []
        sp = sn = 0.0
        for x in pdf[value_col]:
            if x is None or x != x:  # NULL / NaN: emit NULL, keep state
                pos.append(None)
                neg.append(None)
                alarms.append(None)
                continue
            sp = max(0.0, sp + ((float(x) - target) - slack))
            sn = max(0.0, sn + ((target - float(x)) - slack))
            pos.append(sp)
            neg.append(sn)
            alarms.append(None if threshold is None
                          else bool(sp > threshold or sn > threshold))
        pdf[pos_col] = pos
        pdf[neg_col] = neg
        pdf[alarm_col] = alarms
        return pdf

    return df.groupBy(*keys).applyInPandas(scan, schema=schema)


def coalesce_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    gap: int = 0,
    out_start: str = "span_start",
    out_end: str = "span_end",
    count_col: str = "n_merged",
) -> DataFrame:
    """Merge overlapping (or within-``gap``) intervals per key into
    maximal disjoint spans — the classic interval-union: sessions from
    lease windows, incident windows from alert intervals, covered
    playback time from watch segments. Two intervals belong to the
    same span when the later one starts at or before (running max end
    so far) + ``gap``; the output is one row per span with its extent
    and the number of source intervals merged into it.

    Works on numeric columns directly and on timestamps (``gap`` is
    then seconds). Intervals with ``end < start`` participate as-is
    (their ``end`` simply never extends the running max) — filter
    upstream if they are data errors.

    Scale shape: pure window algebra, zero UDF, one shuffle. A single
    sort per key orders intervals by (start, end); the running
    ``max(end)`` over *preceding* rows finds chain breaks
    (``start > running_max + gap`` opens a new span), a running sum
    over the break flags numbers the spans, and one aggregation on the
    SAME (key) partitioning collapses them — Catalyst reuses the
    window's exchange for the groupBy, so the whole operator is one
    exchange + one sort at any scale. This is the textbook
    segmented-scan formulation: no self-join, no per-key collect, and
    span count per key is bounded by interval count, so skew follows
    the input's own key skew.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    from pyspark.sql import types as T

    is_ts = isinstance(df.schema[end_col].dataType, T.TimestampType)
    gap_shift = (F.expr(f"INTERVAL {int(gap)} SECONDS") if is_ts
                 else F.lit(gap))

    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = (F.max(end_col)
                .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    new_span = F.when(prev_max.isNull(), F.lit(1)).otherwise(
        (F.col(start_col) > prev_max + gap_shift).cast("int"))
    span_id = F.sum(new_span).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    return (df.select(*keys, start_col, end_col)
            .withColumn("__span", span_id)
            .groupBy(*keys, "__span")
            .agg(F.min(start_col).alias(out_start),
                 F.max(end_col).alias(out_end),
                 F.count(F.lit(1)).alias(count_col))
            .drop("__span"))


def _dec2dbl(c: Column) -> Column:
    """Decimal → double via a string round-trip. Spark's direct
    DECIMAL(38,12)→DOUBLE cast (BigDecimal.doubleValue) and DuckDB's
    disagree by 1 ulp on round-to-nearest halfway cases once the
    decimal carries >17 significant digits (measured on q198's Σx²);
    decimal→string is exact and string→double is correctly rounded in
    BOTH engines (Double.parseDouble / fast_float), so the round-trip
    is the deterministic conversion. Mirror as
    CAST(CAST(v AS VARCHAR) AS DOUBLE) in oracle SQL."""
    return c.cast("string").cast("double")


def linear_trend(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key least-squares line fit (closed form): one aggregation
    pass computing n, Σx, Σy, Σxy, Σx² and from them

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    The metric-trending primitive — per-series drift slopes at fleet
    scale without any iterative fitting. Rows with a NULL x or y are
    skipped; a key whose x is constant (zero denominator) gets NULL
    slope/intercept rather than an ANSI error.

    Determinism: x and y are quantized to 1e-6 decimals at the scan
    (the only double→decimal conversion — on raw column values, where
    Spark's and DuckDB's conversions agree; converting double PRODUCTS
    diverges between engines in the last decimal, measured on this
    exact query), every product is then EXACT decimal(18,6)×(19,6)
    arithmetic, and the sums are exact and shuffle-order independent.
    The closed form is one fixed double expression over the summed
    moments — hash-exact across engines. Numerical caveats: values are
    rounded at 1e-6 before the fit, and x far from 0 (raw epochs)
    should be offset first — x must stay under ~1e11 so x² fits the
    24 integer digits of the product scale. Scale shape: ONE map-side
    combined aggregate, keys-sized output."""
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    # asymmetric (18,6)x(19,6) casts: Spark's product type is then
    # (38,12) — EXACT (a symmetric (19,6) pair hits the precision cap
    # and silently rounds products to scale 11); DuckDB's is (37,12) on
    # its hugeint path (a symmetric (18,6) pair overflows its int64
    # path). Both engines therefore sum bit-identical exact products.
    xa, xb = x.cast("decimal(18,6)"), x.cast("decimal(19,6)")
    ya, yb = y.cast("decimal(18,6)"), y.cast("decimal(19,6)")
    agg = (df.filter(x.isNotNull() & y.isNotNull())
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                _dec2dbl(F.sum(xb)).alias("sx"),
                _dec2dbl(F.sum(yb)).alias("sy"),
                _dec2dbl(F.sum(xa * yb)).alias("sxy"),
                _dec2dbl(F.sum(xa * xb)).alias("sxx")))
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0.0,
        (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / denom)
    intercept = F.when(
        denom != 0.0,
        (F.col("sy") - slope * F.col("sx")) / nd)
    return agg.select(*keys, "n", slope.alias("slope"),
                      intercept.alias("intercept"))


# grain pairs where truncating the finer BUCKET equals truncating the
# raw timestamp — the condition that lets a coarser rollup be derived
# from the finer rollup instead of rescanning raw data. week->month is
# deliberately absent (ISO weeks straddle month boundaries).
_NESTS: dict[str, tuple[str, ...]] = {
    "second": ("minute",),
    "minute": ("hour",),
    "hour": ("day",),
    "day": ("week", "month"),
    "week": (),
    "month": ("quarter", "year"),
    "quarter": ("year",),
    "year": (),
}


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    grains: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-granularity continuous-aggregate rollup (the
    TimescaleDB-hypertable / Druid-rollup shape): one table holding
    per-(grain, bucket, keys) partials — ``n``, ``sum_dec``
    (DECIMAL(38,6), the mergeable exact sum), ``vmin``/``vmax`` —
    for every grain in ``grains``, finest first.

    The raw stream is scanned and shuffled ONCE, at the finest grain;
    every coarser grain re-aggregates the FINER ROLLUP (bucket counts,
    not events), so at 100 TB the hour→day→week chain costs one
    events-sized shuffle plus two rollup-sized ones (~hours·keys
    rows). That derivation is exact only when each coarser grain nests
    the previous one's buckets — validated against ``_NESTS`` at plan
    time (week→month raises: ISO weeks straddle months).

    Partials are mergeable by construction: counts add, DECIMAL sums
    add exactly (shuffle-order independent, the queries.dsum trick),
    min/max combine — which is what makes ``rollup_merge`` an EXACT
    incremental refresh rather than an approximation. Rows with NULL
    timestamp or value are excluded (they belong to no bucket).
    """
    grains = list(grains)
    for finer, coarser in zip(grains, grains[1:]):
        if coarser not in _NESTS.get(finer, ()):
            raise ValueError(
                f"grain {coarser!r} does not nest {finer!r} buckets — "
                f"allowed next grains: {_NESTS.get(finer, ())}")
    ts, val = F.col(ts_col), F.col(value_col).cast("double")
    keys = list(keys)

    # All grains in ONE grouping-sets aggregate (one Expand + one
    # exchange) instead of the old chained groupBy-per-grain (one
    # exchange per grain, each materialized as its own AQE job — on a
    # micro-batch trigger, jobs per trigger IS the runtime). Bit-equal
    # to the chained re-aggregation: counts and DECIMAL sums are exact
    # and associative, min/max regroup freely, and the _NESTS check
    # above guarantees date_trunc(coarser, ts) equals the old
    # date_trunc(coarser, date_trunc(finer, ts)) derivation. Map-side
    # partial aggregation collapses the Expand's per-grain copies
    # before the exchange, so shuffled bytes stay rollup-sized.
    base = (df.filter(ts.isNotNull() & val.isNotNull())
            .select(*[F.col(k) for k in keys], val.alias("__val"),
                    *[F.date_trunc(g, ts).alias(f"__b{i}")
                      for i, g in enumerate(grains)]))
    bcols = [f"__b{i}" for i in range(len(grains))]
    gd = base.groupingSets(
        [[*keys, b] for b in bcols],
        *[F.col(k) for k in keys], *[F.col(b) for b in bcols])
    # grouping-set id: grouping columns are (keys..., __b0, __b1, ...)
    # left-to-right MSB-first; set i leaves every bucket col but __bi
    # ungrouped
    nb = len(bcols)
    gid_of = [sum(2 ** (nb - 1 - j) for j in range(nb) if j != i)
              for i in range(nb)]
    grain_c = F.lit(None).cast("string")
    bucket_c = F.lit(None).cast("timestamp")
    for i, g in enumerate(grains):
        m = F.grouping_id() == gid_of[i]
        grain_c = F.when(m, F.lit(g)).otherwise(grain_c)
        bucket_c = F.when(m, F.col(f"__b{i}")).otherwise(bucket_c)
    # per-row cast is DECIMAL(32,6), not (18,6): under non-ANSI Spark
    # an overflowing cast yields NULL, so (18,6) would silently DROP
    # |value| >= 1e12 from the sum while n still counts them. (32,6)
    # holds |value| < 1e26 — beyond double's 2^53-exact integer range —
    # and Spark's sum widens it to the same DECIMAL(38,6) partial.
    out = gd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__val").cast("decimal(32,6)"))
        .cast("decimal(38,6)").alias("sum_dec"),
        F.min("__val").alias("vmin"), F.max("__val").alias("vmax"),
        grain_c.alias("grain"), bucket_c.alias("bucket"))
    return out.select("grain", "bucket", *keys, "n", "sum_dec",
                      "vmin", "vmax")


def rollup_merge(existing: DataFrame, delta: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """Exact incremental refresh of a ``hypertable_rollup`` table:
    union the standing rollup with the rollup of an APPEND-ONLY delta
    and re-combine partials per (grain, bucket, keys) — counts add,
    exact decimal sums add, min/max combine. ``merge(rollup(a),
    rollup(b)) == rollup(a ∪ b)`` bit-for-bit, which is the whole
    contract: a scheduled pipeline rolls up only the new partition and
    merges, never rescanning history.

    Scale shape: both sides are rollup-sized (buckets·keys, not
    events); the groupBy shuffles only touched buckets. When the
    standing rollup is stored partitioned by (grain, date(bucket)),
    the read side partition-prunes to the delta's date range — the
    same pruned-merge discipline as operators/merge.py.
    """
    u = existing.unionByName(delta)
    return (u.groupBy("grain", "bucket", *keys)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_dec").cast("decimal(38,6)").alias("sum_dec"),
                 F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")))


_PHASES: dict[str, tuple[str, int]] = {
    # phase expression name -> (Spark/DuckDB-portable extractor, period)
    "hour_of_day": ("hour", 24),
    "month_of_year": ("month", 12),
}


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    grain: str = "hour",
    phase: str = "hour_of_day",
) -> DataFrame:
    """Classical additive seasonal decomposition per key series —
    ``value = trend + seasonal + resid`` (the statsmodels
    ``seasonal_decompose`` shape, distributed): bucket the stream at
    ``grain`` into per-bucket TOTALS, estimate trend with the standard
    centered moving average (the 2×p MA with half-weight endpoints for
    even periods), average the detrended series per calendar phase
    (hour-of-day / month-of-year) into a seasonal profile centered on
    the row-weighted detrended mean, and leave the rest as residual.
    The anomaly/seasonality primitive behind "is this hour's traffic
    unusual FOR this hour".

    Returns one row per (keys, bucket): ``value`` (bucket total),
    ``trend`` (NULL at series edges where the MA window is
    incomplete), ``seasonal``, ``resid`` (NULL where trend is NULL);
    ``value == trend + seasonal + resid`` holds exactly wherever trend
    exists.

    Determinism (the q212 lesson — stronger than the kmeans recipe):
    rounding COMPUTED doubles at a fixed scale is engine-fragile at
    tie boundaries (Spark BigDecimal HALF_UP vs DuckDB's scaled-double
    rounding flipped one term in ~4k at sf0.01), so NOTHING computed
    is ever re-rounded here. Raw inputs are quantized once
    (round(x, 9), the shared convention for parquet-identical source
    values); every cross-row aggregate after that — frame sums,
    endpoint lags, the detrended series, phase sums — is EXACT
    DECIMAL(38,9) arithmetic on those quantized values (the detrended
    term is ``D·value − T``, all integers at scale 9, never a rounded
    ratio), and division/casting to double happens only in final
    per-row expressions. Identical inputs ⇒ identical IEEE outputs,
    no order or tie sensitivity anywhere.

    Two documented deviations from statsmodels: the bucket statistic
    is the total (decomposing totals is what keeps the pipeline
    exact; feed pre-averaged series only if they are themselves
    exactly quantized), and the profile centering subtracts the
    row-weighted detrended mean rather than the mean of the phase
    averages (equal when phases are balanced, which a gap-free series
    is up to edge effects). The input should be gap-free at ``grain``
    (run :func:`resample_fill` first if not): ROWS frames treat
    adjacent rows as adjacent buckets, the classical assumption.

    Scale shape: one (keys, bucket) shuffle collapses events to
    buckets·keys rows; ONE window exchange per key series carries the
    frame sum and both endpoint lags; the phase profile is a
    p-rows-per-key aggregate joined back broadcast-sized. No global
    window — every window partitions by the series keys.
    """
    if phase not in _PHASES:
        raise ValueError(
            f"phase must be one of {sorted(_PHASES)}, got {phase!r}")
    extractor, period = _PHASES[phase]
    keys = list(keys)
    if not keys:
        raise ValueError(
            "seasonal_decompose requires at least one series key — a "
            "keyless series would sort in one task; add a constant "
            "key column only if the series is genuinely bucket-sized")
    ts, val = F.col(ts_col), F.col(value_col).cast("double")
    # DECIMAL(30,9), not (38,9): at precision 38 a multiply would hit
    # Spark's precision-loss path (scale reduction = silent re-rounding,
    # exactly the fragility this pipeline exists to avoid); 30,9 leaves
    # every +,-,x-small-int under 38 with scale preserved, with 1e21 of
    # integer headroom
    DEC = "decimal(30,9)"

    def d(c: Column) -> Column:
        return c.cast(DEC)

    # 1) bucket totals: ONE rounding, of raw source values only
    b = (df.filter(ts.isNotNull() & val.isNotNull())
         .groupBy(*keys, F.date_trunc(grain, ts).alias("bucket"))
         .agg(d(F.sum(F.round(val, 9).cast(DEC))).alias("__vs")))

    # 2) centered-MA trend, kept exact: for even p the 2×p MA is
    # (2·S − first − last) / 2p with S the symmetric frame sum; for odd
    # p it is S / p. T (the numerator) and the detrended numerator
    # dD = D·value − T stay DECIMAL(38,9) end to end.
    half = period // 2
    w = Window.partitionBy(*keys).orderBy("bucket")
    frame = w.rowsBetween(-half, half)
    s = d(F.sum("__vs").over(frame))
    nrows = F.count(F.lit(1)).over(frame)
    if period % 2 == 0:
        divisor = 2 * period
        # 2S as S+S: decimal ADDITION grows precision by one and stays
        # exact; multiplying by an int literal would promote the int to
        # DECIMAL(10,0) and push the product past precision 38 into
        # Spark's scale-reducing loss path
        t_num = d(d(s + s) - d(F.lag("__vs", half).over(w))
                  - d(F.lead("__vs", half).over(w)))
        full = nrows == (period + 1)
    else:
        divisor = period
        t_num = s
        full = nrows == period
    dlit = F.lit(divisor).cast("decimal(3,0)")  # 30+3+1 = 34 < 38: exact
    t = (b.withColumn("__t", F.when(full, t_num))
         .withColumn("__dd", d(d(F.col("__vs") * dlit) - F.col("__t"))))

    # 3) phase profile: exact decimal sums of the detrended numerators;
    # centering subtracts the row-weighted detrended mean
    ph = F.expr(f"{extractor}(bucket)")
    prof = (t.filter(F.col("__dd").isNotNull())
            .groupBy(*keys, ph.alias("__phase"))
            .agg(d(F.sum("__dd")).alias("__ds"),
                 F.count(F.lit(1)).alias("__dn")))
    wk = Window.partitionBy(*keys)
    centered = prof.withColumn(
        "seasonal",
        F.col("__ds").cast("double") / (F.lit(float(divisor)) * F.col("__dn"))
        - d(F.sum("__ds").over(wk)).cast("double")
        / (F.lit(float(divisor)) * F.sum("__dn").over(wk)))

    # 4) final per-row fixed expressions: division + casts only here
    out = (t.withColumn("__phase", ph)
           .join(centered.select(*keys, "__phase", "seasonal"),
                 keys + ["__phase"], "left")
           .withColumn("value", F.col("__vs").cast("double"))
           .withColumn("trend",
                       F.col("__t").cast("double") / F.lit(float(divisor)))
           .withColumn("resid",
                       F.col("value") - F.col("trend") - F.col("seasonal")))
    return out.select(*keys, "bucket", "value", "trend", "seasonal", "resid")


def acf(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    grain: str = "hour",
    lags: Sequence[int] = (1, 2, 3),
    moment_scale: int = 1,
) -> DataFrame:
    """Autocorrelation function per key series: Pearson correlation
    between the bucketed series and its ``lag``-shifted self, one row
    per (keys, lag) — the seasonality/memory diagnostic (a daily cycle
    shows as a spike at lag 24 on hourly buckets) and the standard
    pre-flight before ARIMA-ish modeling.

    Pairs are (x_t, x_{t+lag}) over the bucket-ordered series, so each
    lag's correlation uses n_buckets − lag pairs (the "non-circular"
    convention; gap-free input is the caller's contract, as in
    :func:`seasonal_decompose`).

    Determinism (stats.pearson_corr_exact's recipe, grouped): bucket
    totals stay EXACT DECIMAL from aggregation through the lag/lead
    window and all five moment sums — products squared in decimal,
    each moment rounded to ``moment_scale`` before its double cast —
    so nothing computed is ever re-rounded and the only IEEE work is
    the final five-term formula per (key, lag). Degenerate series
    (zero variance after rounding) yield NULL, never NaN.

    Scale shape: one (keys, bucket) shuffle collapses events; ONE
    window exchange per key serves every lag's lead(); the moment
    aggregate is keys×lags rows. No global window, no driver state.
    """
    lags = sorted(set(int(x) for x in lags))
    if not lags or lags[0] < 1:
        raise ValueError(f"lags must be positive ints, got {lags}")
    keys = list(keys)
    if not keys:
        raise ValueError("acf requires at least one series key (the "
                         "seasonal_decompose single-task-sort rule)")
    ts, val = F.col(ts_col), F.col(value_col).cast("double")

    # the bucket sum stays WIDE (Spark sums decimal(19,6) at (29,6)):
    # a downcast back to (19,6) would overflow to NULL (non-ANSI) or
    # raise (ANSI) once a bucket total passes ~1e13 — the same
    # (18,6)-cast bug class hypertable_rollup fixed in r12
    b = (df.filter(ts.isNotNull() & val.isNotNull())
         .groupBy(*keys, F.date_trunc(grain, ts).alias("bucket"))
         .agg(F.sum(F.round(val, 6).cast("decimal(19,6)")).alias("__v")))

    w = Window.partitionBy(*keys).orderBy("bucket")
    lagged = b.select(
        *keys, "__v",
        *[F.lead("__v", k).over(w).alias(f"__w{k}") for k in lags])
    stacked = lagged.select(
        *keys,
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag"), F.col("__v").alias("x"),
                     F.col(f"__w{k}").alias("y")) for k in lags]))
        .alias("p")
    ).select(*keys, F.col("p.lag").alias("lag"),
             F.col("p.x").alias("x"), F.col("p.y").alias("y")) \
     .filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def shrink(c: Column) -> Column:
        return (F.round(c, moment_scale)
                .cast(f"decimal(38,{moment_scale})").cast("double"))

    # square on the (18,6) grid: 18+18+1 = 37 <= 38 keeps the product
    # EXACT at scale 12 — squaring the wider totals directly would
    # request precision > 38 and hit Spark's precision-loss path, which
    # silently HALF_UP-rounds each product to scale 11 (re-rounding a
    # computed value, the contract this function documents against).
    # The downcast is guarded EXPLICITLY (assert_true rides the cast):
    # under Spark's default non-ANSI config an overflowing cast yields
    # NULL and the (key, lag) row would silently vanish — the guard
    # raises at execution time regardless of spark.sql.ansi.enabled
    # (r13 advisor item; nothing in this repo sets ANSI mode).
    def _grid(name: str) -> Column:
        c = F.col(name)
        ok = F.assert_true(
            F.abs(c) < F.lit(10) ** 12,
            F.concat(F.lit(f"acf: bucket total {name}="),
                     c.cast("string"),
                     F.lit(" exceeds the exact (18,6) moment grid "
                           "(|total| must stay < 1e12) — rescale "
                           "value_col or coarsen the grain")))
        return F.when(ok.isNull(), c.cast("decimal(18,6)"))

    xd, yd = _grid("x"), _grid("y")
    agg = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        shrink(F.sum(F.col("x").cast("decimal(38,6)"))).alias("sx"),
        shrink(F.sum(F.col("y").cast("decimal(38,6)"))).alias("sy"),
        shrink(F.sum(xd * xd)).alias("sxx"),
        shrink(F.sum(yd * yd)).alias("syy"),
        shrink(F.sum(xd * yd)).alias("sxy"))
    n = F.col("n").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    # clamp to the Pearson range: moment_scale rounds each moment sum
    # independently, so a series whose magnitudes are small relative to
    # the scale can distort the five-term formula past ±1 (hypothesis
    # found acf = -1.81 on an n=2, |x|<1 series at the default scale) —
    # the same dial pearson_corr_exact documents; the clamp makes the
    # invariant unconditional and well-scaled inputs are unaffected
    corr = F.when(
        (varx > 0) & (vary > 0),
        F.greatest(F.lit(-1.0), F.least(F.lit(1.0),
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(varx) * F.sqrt(vary)))))
    return agg.select(*keys, "lag", F.col("n").cast("long").alias("n"),
                      corr.alias("acf"))


def ccf(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    grain: str = "hour",
    lags: Sequence[int] = (0, 1, 2),
    moment_scale: int = 1,
) -> DataFrame:
    """Cross-correlation function per key series — :func:`acf`'s
    two-signal sibling and the lead/lag diagnostic a metrics pipeline
    runs between RELATED series ("do errors lead purchases dropping?
    by how many buckets?"): Pearson correlation between the bucketed
    ``x`` series and the ``y`` series shifted ``lag`` buckets FORWARD,
    one row per (keys, lag). ``ccf(x, x)`` at lag k equals
    ``acf(x)`` at lag k; lag 0 (allowed here, unlike acf where it is
    identically 1) is the plain same-bucket correlation.

    Rows whose x or y is NULL are excluded from that side's bucket
    total BEFORE bucketing (each series keeps its own observations —
    an event contributing to x need not carry y); buckets missing
    either side contribute no pair (gap-free input is the caller's
    contract, the :func:`acf` convention).

    Determinism: identical to :func:`acf` — exact DECIMAL bucket
    totals through the lead() window, five moment sums squared on the
    (18,6) grid (the overflow guard raises loudly past |total| ~1e12
    regardless of ANSI config), each moment rounded once at
    ``moment_scale``, one five-term IEEE formula per (key, lag),
    result clamped to the Pearson range. Hash-exact in oracle SQL.

    Scale shape: one (keys, bucket) shuffle collapses events (both
    sums in the SAME aggregate — one pass); ONE window exchange per
    key serves every lag's lead(); the moment aggregate is keys×lags
    rows. No global window, no driver state."""
    lags = sorted(set(int(x) for x in lags))
    if not lags or lags[0] < 0:
        raise ValueError(f"lags must be ints >= 0, got {lags}")
    keys = list(keys)
    if not keys:
        raise ValueError("ccf requires at least one series key (the "
                         "seasonal_decompose single-task-sort rule)")
    ts = F.col(ts_col)
    xv = F.col(x_col).cast("double")
    yv = F.col(y_col).cast("double")

    b = (df.filter(ts.isNotNull())
         .groupBy(*keys, F.date_trunc(grain, ts).alias("bucket"))
         .agg(F.sum(F.round(xv, 6).cast("decimal(19,6)")).alias("__vx"),
              F.sum(F.round(yv, 6).cast("decimal(19,6)")).alias("__vy"))
         .filter(F.col("__vx").isNotNull() | F.col("__vy").isNotNull()))

    w = Window.partitionBy(*keys).orderBy("bucket")
    lagged = b.select(
        *keys, "__vx",
        *[(F.col("__vy") if k == 0 else F.lead("__vy", k).over(w))
          .alias(f"__w{k}") for k in lags])
    stacked = lagged.select(
        *keys,
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag"), F.col("__vx").alias("x"),
                     F.col(f"__w{k}").alias("y")) for k in lags]))
        .alias("p")
    ).select(*keys, F.col("p.lag").alias("lag"),
             F.col("p.x").alias("x"), F.col("p.y").alias("y")) \
     .filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def shrink(c: Column) -> Column:
        return (F.round(c, moment_scale)
                .cast(f"decimal(38,{moment_scale})").cast("double"))

    def _grid(name: str) -> Column:
        c = F.col(name)
        ok = F.assert_true(
            F.abs(c) < F.lit(10) ** 12,
            F.concat(F.lit(f"ccf: bucket total {name}="),
                     c.cast("string"),
                     F.lit(" exceeds the exact (18,6) moment grid "
                           "(|total| must stay < 1e12) — rescale the "
                           "value columns or coarsen the grain")))
        return F.when(ok.isNull(), c.cast("decimal(18,6)"))

    xd, yd = _grid("x"), _grid("y")
    agg = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        shrink(F.sum(F.col("x").cast("decimal(38,6)"))).alias("sx"),
        shrink(F.sum(F.col("y").cast("decimal(38,6)"))).alias("sy"),
        shrink(F.sum(xd * xd)).alias("sxx"),
        shrink(F.sum(yd * yd)).alias("syy"),
        shrink(F.sum(xd * yd)).alias("sxy"))
    n = F.col("n").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (varx > 0) & (vary > 0),
        F.greatest(F.lit(-1.0), F.least(F.lit(1.0),
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(varx) * F.sqrt(vary)))))
    return agg.select(*keys, "lag", F.col("n").cast("long").alias("n"),
                      corr.alias("ccf"))
