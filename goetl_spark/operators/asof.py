"""As-of and range joins for time-series enrichment.

Beyond the reference surface (SURVEY §2.4 'Not present': theta/range/
as-of joins) — first-class here because event-time enrichment is core to
both warehouse and training-data pipelines.

:func:`asof_join` uses the union + window trick, NOT a pair join: tag
both sides, sort each key partition by time, and carry the most recent
right-side row forward with ``last(ignorenulls)``. One shuffle on the
key, zero row explosion, state bounded by partition — this is THE
scalable as-of pattern (a naive ``t1 >= t2`` theta join explodes to
O(n·m) pairs before aggregation at 100 TB).

:func:`range_join` is an equi-join on keys with a bounded time predicate.
With keys it stays an equi-join (the range is a post-join filter, so
Catalyst still plans a hash/sort-merge join); KEYLESS shapes get the
promised time-bucket blocking in :func:`interval_lookup_join`
(point-in-range: GeoIP/CIDR/tariff enrichment) and
:func:`interval_overlap_join` (interval x interval overlap) — an
in-row bucket explode turns both into plain equi-joins, with a
left-edge bucket predicate deduplicating multi-bucket pairs exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same key (backward as-of, inclusive —
    DuckDB/pandas ``merge_asof`` semantics).

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts). ``tolerance_seconds`` voids matches older than the
    given horizon (merge_asof tolerance).
    """
    keys = list(on)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    # one struct column carries the right payload through the union
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in rcols],
        ).alias("__r"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )

    matched = F.col("__last_r")
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("double")
            - matched["__matched_ts"].cast("double")
        ) <= tolerance_seconds
        matched = F.when(matched.isNotNull() & fresh, matched)

    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols.append(matched["__matched_ts"].alias(f"{right_ts}{suffix}"))
    for c in rcols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(matched[c].alias(name))
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
) -> DataFrame:
    """Join rows where ``right_ts ∈ [left_ts - upper, left_ts - lower]``
    for the same key (e.g. 'events in the hour before') — equi-join on
    keys, time predicate as join condition so unmatched pairs never
    materialize."""
    keys = list(on)
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    dt = F.col(f"l.{left_ts}").cast("double") - F.col(f"r.{right_ts}").cast("double")
    cond = cond & (dt >= lower_seconds) & (dt <= upper_seconds)
    return l.join(r, cond)


def _bucket_of(col: Column, width: float) -> Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def interval_lookup_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """KEYLESS point-in-interval lookup: every (point, interval) pair
    with ``start <= point <= end`` — the GeoIP / CIDR-range / tariff-
    table enrichment shape, where a naive formulation is a cross join.

    Bucket blocking (the docstring's promised keyless plan): each
    interval explodes into the ``ceil(len/width)+1`` buckets it covers
    (one in-row ``sequence``, map-only), each point computes its single
    bucket, and the join is a plain EQUI-join on the bucket with the
    containment predicate as a post-join filter — Catalyst plans a
    hash/sort-merge join, pairs never materialize outside a shared
    bucket. Candidate work per point = intervals overlapping its
    bucket, so pick ``bucket_width`` near the median interval length
    (every interval then spans ~2 buckets while buckets stay narrow).

    MEASURED (local[8], sf0.1: 600k points × 21.4k width-20 intervals,
    both plans returning the same 1.8M pairs): bucketized 0.6-0.95 s vs
    66 s for the naive theta join — Spark plans the inequality-only
    condition as a broadcast nested loop over 12.9G candidate pairs,
    so unlike bloom_prune's shuffle-vs-memory tradeoff this blocking
    wins locally too (it removes compute, not just network).

    A pathological interval (length ≫ width) would fan out into
    thousands of bucket rows; ``max_buckets_per_interval`` fails fast
    instead (raise_error inside the plan — same guard philosophy as
    ngram's max_df). Points are emitted once per MATCHING interval
    (buckets cannot duplicate a pair: a point lives in exactly one
    bucket). NULL points / NULL bounds never match; ``how='left'``
    keeps unmatched points with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    lo = _bucket_of(F.col(start_col), bucket_width)
    hi = _bucket_of(F.col(end_col), bucket_width)
    n_buckets = hi - lo + 1
    guarded = F.when(
        n_buckets > max_buckets_per_interval,
        F.raise_error(F.concat(
            F.lit(f"interval_lookup_join: an interval spans more than "
                  f"{max_buckets_per_interval} buckets of width "
                  f"{bucket_width}; raise bucket_width or the cap "
                  f"(interval start="), F.col(start_col).cast("string"),
            F.lit(")"))),
    ).otherwise(F.sequence(lo, hi))
    iv = intervals.withColumn("__bucket", F.explode(guarded))
    pt = points.withColumn("__bucket", _bucket_of(F.col(point_col),
                                                  bucket_width))
    cond = ((pt["__bucket"] == iv["__bucket"])
            & (pt[point_col] >= iv[start_col])
            & (pt[point_col] <= iv[end_col]))
    out = pt.join(iv, cond, how)
    return out.drop(pt["__bucket"]).drop(iv["__bucket"])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """KEYLESS interval-overlap join: every (left, right) pair with
    ``l_start <= r_end AND r_start <= l_end`` (closed intervals) —
    sessions × incidents, stay × outage, any two interval sets.

    Same bucket blocking as :func:`interval_lookup_join`, both sides
    exploded. A pair sharing k buckets would surface k times, so each
    pair is emitted ONLY in the bucket containing the overlap's left
    edge (``floor(greatest(l_start, r_start)/w)``) — an exact, shuffle-
    free dedup predicate instead of a DISTINCT over the pair set.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def burst(df: DataFrame, s: str, e: str) -> DataFrame:
        lo, hi = _bucket_of(F.col(s), bucket_width), _bucket_of(F.col(e),
                                                                bucket_width)
        guarded = F.when(
            hi - lo + 1 > max_buckets_per_interval,
            F.raise_error(F.lit(
                f"interval_overlap_join: an interval spans more than "
                f"{max_buckets_per_interval} buckets of width "
                f"{bucket_width}; raise bucket_width or the cap")),
        ).otherwise(F.sequence(lo, hi))
        return df.withColumn("__bucket", F.explode(guarded))

    l = burst(left, left_start, left_end)
    r = burst(right, right_start, right_end)
    edge = _bucket_of(F.greatest(l[left_start], r[right_start]),
                      bucket_width)
    cond = ((l["__bucket"] == r["__bucket"])
            & (l[left_start] <= r[right_end])
            & (r[right_start] <= l[left_end])
            & (l["__bucket"] == edge))
    out = l.join(r, cond, "inner")
    return out.drop(l["__bucket"]).drop(r["__bucket"])
