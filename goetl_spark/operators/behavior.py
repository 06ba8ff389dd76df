"""Behavioral / product analytics: ordered funnels and cohort retention.

Beyond the reference surface (goetl has no sequence analytics) but a
standard ask of any event warehouse, and both shapes are pure
DataFrame compositions — no UDF, no per-user Python.

Funnel semantics (strict ordering): a user converts to stage *i* at the
FIRST stage-*i* event strictly after their stage-*i-1* conversion time
(stage 1 at their first stage-1 event), optionally bounded to
``within_seconds`` of the stage-1 time. This is the "minimal completion
time" funnel — deterministic, replayable, no sessionization dependence.

Scale design: one conditional-min aggregation per stage, every pass
hash-partitioned on the user key (Catalyst reuses the exchange across
passes); events are pre-filtered to funnel stages and pruned to three
columns before the first shuffle. S stages = S small aggs over the
SAME partitioning, never a per-user sort or collect. Cohort retention
is two aggs (first-activity, distinct activity periods) co-partitioned
on the user key, then a tiny (cohort × offset) rollup; the offset-0
base joins back by broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_user_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user stage conversion times: one row per user who entered the
    funnel, columns ``t1..tS`` (NULL from the first unreached stage on).
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    ev = (df.filter(F.col(type_col).isin(list(stages)))
            .select(user_col, ts_col, type_col))

    cur = (ev.filter(F.col(type_col) == stages[0])
             .groupBy(user_col).agg(F.min(ts_col).alias("t1")))
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"t{i - 1}"
        cand = (ev.filter(F.col(type_col) == stage)
                  .join(cur, on=user_col)
                  .filter(F.col(ts_col) > F.col(prev)))
        if within_seconds is not None:
            cand = cand.filter(
                F.col(ts_col) <= F.col("t1")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS"))
        reached = cand.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        # keep drop-offs: left join the new stage time onto the old frame
        # (cur already carries t1..t_{i-1})
        cur = cur.join(reached, on=user_col, how="left")
    return cur


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Funnel rollup: one row per stage with the number of users who
    reached it and the conversion rate vs stage 1."""
    times = funnel_user_times(
        df, user_col, ts_col, type_col, stages, within_seconds)
    per_stage = times.agg(*[
        F.count(f"t{i}").alias(f"u{i}") for i in range(1, len(stages) + 1)
    ])
    rows = [
        F.struct(F.lit(i).alias("stage_idx"),
                 F.lit(stage).alias("stage"),
                 F.col(f"u{i}").alias("users"),
                 # guard: ANSI mode raises on 0/0 for an empty funnel
                 F.when(F.col("u1") > 0,
                        F.col(f"u{i}") / F.col("u1"))
                  .alias("conversion"))
        for i, stage in enumerate(stages, start=1)
    ]
    return (per_stage
            .select(F.explode(F.array(*rows)).alias("s"))
            .select("s.stage_idx", "s.stage", "s.users", "s.conversion"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    period_days: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: cohort = the user's first-activity
    period (``date_trunc(period)``); for each period offset *k*, the
    distinct users of that cohort active in cohort+*k* periods and the
    retention share vs the cohort size (offset 0).

    The offset is CALENDAR-aware for ``period='month'``
    (``months_between`` on truncated months — fixed ``period_days``
    would mis-bin 59-day gaps into offset 1 and double-count users);
    day-multiple periods (week/day) use exact day division, which is
    lossless because both endpoints are period-truncated.

    Plan: ONE user-key shuffle collects each user's cohort AND distinct
    active periods in the same aggregate (collect_set is bounded by
    periods-per-user, e.g. weeks of history — small by construction),
    the offsets explode in-row, and the (cohort × offset) rollup plus a
    broadcast offset-0 base are the only other exchanges. The first
    audit of the two-agg + join formulation showed 7 exchanges; this
    shape has 3.

    ``period_days`` is DERIVED from ``period`` ('day'→1, 'week'→7);
    passing it explicitly must agree or we raise — an independent pair
    like (period='day', period_days=7) would silently map 7 daily
    periods onto one offset and count a user multiple times per cell,
    pushing retention above 1 (round-6 advisor finding)."""
    derived = {"day": 1, "week": 7}.get(period)
    if period_days is None:
        period_days = derived
    elif derived is not None and period_days != derived:
        raise ValueError(
            f"cohort_retention: period={period!r} implies "
            f"period_days={derived}, got {period_days}")
    if period != "month" and period_days is None:
        raise ValueError(
            f"cohort_retention: period_days required for period={period!r}")
    per_user = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort"),
        F.collect_set(F.date_trunc(period, ts_col)).alias("__periods"))
    if period == "month":
        offset = F.round(F.months_between(F.col("p"),
                                          F.col("cohort"))).cast("int")
    else:
        offset = (F.datediff(F.col("p"), F.col("cohort"))
                  / period_days).cast("int")
    counts = (
        per_user.select(
            "cohort",
            F.explode("__periods").alias("p"))
        .withColumn("period_offset", offset)
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # materialize the tiny (#cohorts × #offsets) matrix once — the
    # offset-0 base otherwise replays the whole user aggregation
    counts = counts.localCheckpoint(eager=True)
    base = (counts.filter(F.col("period_offset") == 0)
                  .select("cohort", F.col("n_users").alias("cohort_size")))
    return (counts.join(F.broadcast(base), on="cohort")
            .withColumn("retention",
                        F.col("n_users") / F.col("cohort_size"))
            .select("cohort", "period_offset", "n_users",
                    "cohort_size", "retention"))


def attribution_credit(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    model: str = "linear",
    lookback_seconds: int | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution — the standard marketing /
    growth question ("which touchpoints get credit for this
    purchase?") over a raw event stream. Each touch event credits the
    NEXT conversion of the same user that follows it in the
    (``ts_col``, ``id_col``) total order (ties break on the id, so
    same-timestamp rows are deterministic), optionally only when the
    conversion lands within ``lookback_seconds``. Touches after a
    user's last conversion credit nothing; conversions with no
    eligible touch produce no rows (report them via an anti-join if
    needed).

    Models: ``linear`` splits 1.0 evenly across the conversion's
    touches; ``first`` / ``last`` give the whole 1.0 to the earliest /
    latest touch (other touches are omitted); ``position`` is the
    U-shaped 40/20/40: 0.4 to first and last, the middle 0.2 split
    evenly (single touch → 1.0, two touches → 0.5 each).

    Output: one row per credited touch — (user, conversion id + ts,
    touch id + ts + type, ``credit``), with per-conversion credits
    summing to 1.0.

    Scale shape: zero UDF, pure window algebra. Pass 1 partitions by
    the user key (one shuffle) and propagates each row's next
    conversion with ``first(ignorenulls)`` over the strictly-following
    frame — a single sort handles every user's full history without
    self-joining events to events (the naive touches×conversions join
    is quadratic in events per user). Pass 2 partitions by (user,
    conversion) — a subsumed, finer key — for the per-conversion
    counts/ranks that turn membership into credit. Both states are
    fixed-width per row; skew follows the event stream's own user
    skew (a bot user with 1e6 events costs one fat sort task, the
    same cost sessionization pays — salt upstream if that matters).
    """
    if model not in ("linear", "first", "last", "position"):
        raise ValueError(f"unknown attribution model: {model!r}")
    touches = list(touch_types)
    if not touches:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touches:
        raise ValueError("conversion_type cannot also be a touch type")

    ev = (df.filter(F.col(type_col).isin(touches + [conversion_type]))
            .select(user_col, ts_col, type_col, id_col))

    is_conv = F.col(type_col) == conversion_type
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(1, Window.unboundedFollowing))
    ev = ev.withColumn(
        "conv_id",
        F.first(F.when(is_conv, F.col(id_col)), ignorenulls=True).over(w),
    ).withColumn(
        "conv_ts",
        F.first(F.when(is_conv, F.col(ts_col)), ignorenulls=True).over(w),
    )

    t = ev.filter(~is_conv & F.col("conv_id").isNotNull())
    if lookback_seconds is not None:
        t = t.filter(
            F.unix_timestamp("conv_ts") - F.unix_timestamp(ts_col)
            <= int(lookback_seconds))

    wc = Window.partitionBy(user_col, "conv_id")
    t = (t.withColumn("__n", F.count(F.lit(1)).over(wc))
          .withColumn("__asc", F.row_number().over(
              wc.orderBy(ts_col, id_col)))
          .withColumn("__desc", F.row_number().over(
              wc.orderBy(F.desc(ts_col), F.desc(id_col)))))

    if model == "linear":
        t = t.withColumn("credit", F.lit(1.0) / F.col("__n"))
    elif model == "first":
        t = t.filter(F.col("__asc") == 1).withColumn("credit", F.lit(1.0))
    elif model == "last":
        t = t.filter(F.col("__desc") == 1).withColumn("credit", F.lit(1.0))
    else:  # position (U-shaped 40/20/40)
        t = t.withColumn(
            "credit",
            F.when(F.col("__n") == 1, F.lit(1.0))
             .when(F.col("__n") == 2, F.lit(0.5))
             .when(F.col("__asc") == 1, F.lit(0.4))
             .when(F.col("__desc") == 1, F.lit(0.4))
             .otherwise(F.lit(0.2) / (F.col("__n") - 2)))

    return t.select(
        user_col, "conv_id", "conv_ts",
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
        "credit")


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams — the structural companion to the funnel family (funnels
    test ONE hypothesized path; the transition matrix reports every
    observed (state → next state) edge with its probability): one row
    per observed (src, dst) pair with the count, the source's total
    outgoing transitions, and ``p = n / n_src_total``.

    Ordering must be TOTAL per user or "next" is not well-defined in
    ANY engine — pass ``order_cols`` tie-breakers (an event id) when
    ``ts_col`` can tie. End-of-stream is detected by a constant lead
    (NULL past the last row), so a NULL ``type_col`` still works as a
    real state (house NULL semantics: an untyped event is itself a
    category) and is never confused with "no next event"; a user's
    final event simply emits no transition.

    Determinism: counts are exact; ``p`` is one long/long IEEE
    division — hash-exact in oracle SQL given total order.

    Scale shape: ONE per-user window exchange (partitioned by user —
    never a global window) into a states²-bounded pair count; the
    source totals re-derive from that bounded table (null-safe join on
    the src state). States are categorical by definition — the
    states² bound is the diagnostic, as with classification_metrics."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    nxt_exists = F.lead(F.lit(1)).over(w)
    nxt = F.lead(F.col(type_col)).over(w)
    pairs = (df.withColumn("__has_next", nxt_exists)
             .withColumn("__dst", nxt)
             .filter(F.col("__has_next").isNotNull())
             .groupBy(F.col(type_col).alias("src"),
                      F.col("__dst").alias("dst"))
             .agg(F.count(F.lit(1)).alias("n"))
             .localCheckpoint(eager=True))
    totals = (pairs.groupBy(F.col("src").alias("__s"))
              .agg(F.sum("n").alias("n_src_total")))
    return (pairs.join(F.broadcast(totals),
                       on=F.col("src").eqNullSafe(F.col("__s")))
            .drop("__s")
            .select("src", "dst",
                    F.col("n").cast("long").alias("n"),
                    F.col("n_src_total").cast("long").alias("n_src_total"),
                    (F.col("n") / F.col("n_src_total")).alias("p")))


def two_proportion_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test — the A/B significance readout the
    funnel/retention family stops short of (funnel_counts says WHAT
    converted; this says whether the difference between two variants
    is bigger than chance). Expects EXACTLY two groups (anything else
    raises — a silently-picked pair would be a wrong answer); one
    row: ``group_a / group_b / n_a / n_b / rate_a / rate_b / diff /
    z`` with groups assigned by ascending key (NULL first — the house
    NULL-is-a-class rule, deterministic, documented) and
    ``z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))`` under the pooled
    null. The caller compares |z| to 1.96/2.58 — no p-value column on
    purpose (Φ is a transcendental the oracle cannot replay exactly;
    the z threshold is the decision anyway).

    Success semantics: ``success_col`` is truthy per row (cast >
    0); NULL success counts as failure only if you say so — NULL
    success rows are EXCLUDED and reported via n (an unobserved
    outcome is not a failure), the regression_metrics exclusion
    stance; NaN raises loudly (it is neither success nor failure nor
    unobserved — the regression_metrics/gini/trimmed_mean family
    convention). Degenerate pooled rates (p̂ = 0 or 1 → zero
    variance) yield NULL z.

    Determinism: counts are exact longs off ONE fact aggregate; every
    output is a fixed IEEE chain on them (long/long divisions, one
    sqrt) mirrored expression-for-expression in the oracle —
    hash-exact.

    Scale shape: one partial-aggregated fact pass into a 2-row
    table; a 2-row collect; nothing else."""
    g = F.col(group_col)
    s = F.col(success_col).cast("double")
    # NaN passes isNotNull and fails s > 0 — without the folded count it
    # would silently land in the failure bucket, against the family's
    # raise-loudly-on-NaN convention (r15 ADVICE)
    per = (df.filter(s.isNotNull())
           .groupBy(g.alias("__g"))
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum(F.when(s > 0, 1).otherwise(0)).alias("__s"),
                F.sum(F.when(F.isnan(s), 1).otherwise(0)).alias("__bad"))
           .collect())
    spark = df.sparkSession
    schema = ("group_a string, group_b string, n_a long, n_b long, "
              "rate_a double, rate_b double, diff double, z double")
    if not per:
        return spark.createDataFrame([], schema)
    n_nan = sum(int(r["__bad"]) for r in per)
    if n_nan:
        raise ValueError(
            f"two_proportion_test: {n_nan} NaN value(s) in "
            f"{success_col!r} — NaN is neither success nor failure; "
            f"filter or impute upstream")
    if len(per) != 2:
        raise ValueError(
            f"two_proportion_test: need exactly 2 groups in "
            f"{group_col!r}, got {len(per)} "
            f"({sorted(str(r['__g']) for r in per)[:5]}) — filter or "
            f"bucket upstream")
    rows = sorted(per, key=lambda r: (r["__g"] is not None, r["__g"]))
    (ga, na, sa), (gb, nb, sb) = \
        [(r["__g"], int(r["__n"]), int(r["__s"])) for r in rows]
    pa, pb = sa / na, sb / nb
    pooled = (sa + sb) / (na + nb)
    import math
    se2 = pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb)
    z = None if se2 <= 0.0 else (pa - pb) / math.sqrt(se2)
    return spark.createDataFrame(
        [(None if ga is None else str(ga),
          None if gb is None else str(gb),
          na, nb, pa, pb, pa - pb, z)], schema)
