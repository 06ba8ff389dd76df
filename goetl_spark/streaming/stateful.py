"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming at all (its only unbounded source
is a Mongo change stream, readers/mongo.go:703-730, consumed statelessly;
windowed aggregation is an unshipped roadmap item, README.md:654-658).
This module supplies the Spark-native building block the roadmap implies:
arbitrary per-key state maintained across micro-batches, Arrow-batched.

Scale notes: state lives in the executor state store partitioned by the
grouping key, so memory is O(distinct keys / partition), not O(events).
Each micro-batch shuffles only that batch's rows to their key partition.
At 100 TB of events the operator is bounded by per-key state size — keep
state to fixed-width scalars (as here) and use watermark-based timeouts
for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_stats_stream(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, min, max) maintained across micro-batches.

    Emits one row per key per micro-batch in which the key appears, with
    the cumulative stats so far — i.e., an incrementally-updated
    aggregation, the streaming analog of ``groupBy(key).agg(...)``.
    Count is exact-integer and min/max are comparison-only, so the final
    emitted row per key equals the batch aggregate regardless of
    micro-batch boundaries (this is what makes the op oracle-checkable).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, mn, mx))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    # key field keeps the stream's own type (a hardcoded `string` would
    # make e.g. a bigint user_id key fail schema validation at runtime)
    key_type = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n_events long, "
                         "min_value double, max_value double",
        stateStructType="n long, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_tws(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Same running (count, min, max) contract as
    :func:`running_stats_stream`, on Spark 4's ``transformWithState``
    API (StatefulProcessor + typed state handles) instead of the legacy
    ``applyInPandasWithState`` callback.

    Why both exist: transformWithState is the successor surface — state
    is declared through a handle (value/list/map state, TTL, timers), so
    operators compose multiple state variables instead of packing one
    tuple, and the same processor class works for batch backfills. The
    emitted rows are identical to the legacy operator's (a test pins
    cross-API equality), so either can serve the q48 oracle.

    RUNTIME REQUIREMENT: the transformWithState Python worker speaks
    protobuf to the state server — environments without
    ``google.protobuf`` (like this container) crash the stream at start;
    the test gates on the import, and :func:`running_stats_stream` is the
    dependency-free fallback with identical semantics.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (f"{key_col} {key_type}, n_events long, "
                  "min_value double, max_value double")

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n long, mn double, mx double")

        def handleInputRows(self, key, rows, timerValues):
            n, mn, mx = (self._stats.get() if self._stats.exists()
                         else (0, None, None))
            for pdf in rows:
                vals = pdf[value_col].dropna()
                if len(vals) == 0:
                    continue
                n += int(len(vals))
                bmn, bmx = float(vals.min()), float(vals.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
            self._stats.update((n, mn, mx))
            yield pd.DataFrame({
                key_col: [key[0]], "n_events": [n],
                "min_value": [mn], "max_value": [mx],
            })

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def funnel_stream(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming strict-order funnel — the live counterpart of
    ``operators/behavior.py::funnel_counts``: per-user state tracks the
    next expected stage, the stage-1 time, and the previous conversion
    time; a row is emitted each time a user ADVANCES a stage
    (update mode), so max(stage_idx) per user equals the batch
    funnel's reach.

    Semantics match the batch operator when events arrive per-user in
    event-time order across micro-batches (rows are sorted by event
    time WITHIN each batch; a cross-batch straggler older than the
    user's current conversion time is ignored, like any
    already-consumed position — use replay_stream_ordered-style
    chronological feeding, which is also what a watermarked production
    topology provides).

    State per user is three fixed-width scalars — O(users) state, no
    event retention."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            next_idx, t1, tprev = state.get
        else:
            next_idx, t1, tprev = 0, None, None
        hits: list[tuple[int, object]] = []
        for pdf in pdfs:
            # NULL event times cannot be ordered: a NaT would poison t1
            # (NaN comparisons always False) — same drop contract as the
            # batch funnel / rolling_range
            pdf = pdf.dropna(subset=[ts_col]).sort_values(ts_col)
            for ts, typ in zip(pdf[ts_col], pdf[type_col]):
                if next_idx >= len(stages):
                    break
                if typ != stages[next_idx]:
                    continue
                t = ts.timestamp()
                if next_idx == 0:
                    t1 = tprev = t
                    next_idx = 1
                    hits.append((1, ts))
                else:
                    if t <= tprev:
                        continue
                    if within_seconds is not None \
                            and t > t1 + within_seconds:
                        continue
                    tprev = t
                    next_idx += 1
                    hits.append((next_idx, ts))
        state.update((next_idx, t1, tprev))
        if hits:
            yield pd.DataFrame({
                user_col: [key[0]] * len(hits),
                "stage_idx": [h[0] for h in hits],
                "stage": [stages[h[0] - 1] for h in hits],
                "converted_at": [h[1] for h in hits],
            })

    key_type = stream_df.schema[user_col].dataType.simpleString()
    return stream_df.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"{user_col} {key_type}, stage_idx int, "
                         "stage string, converted_at timestamp",
        stateStructType="next_idx int, t1 double, tprev double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_zscore_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
    min_count: int = 10,
    ts_col: str | None = None,
) -> DataFrame:
    """Live anomaly scoring: per-key RUNNING mean/variance via Welford's
    algorithm (numerically stable single-pass moments — naive Σx²−mean²
    cancels catastrophically on long streams), emitting each event with
    its z-score against the state BEFORE the event and an
    ``is_anomaly`` flag once ``min_count`` events have seeded the key.

    The streaming counterpart of transforms.standardize: same
    population-variance definition, but incremental — state per key is
    three scalars (n, mean, M2), so memory is O(keys), and scoring uses
    the pre-event state so an outlier cannot mask itself by inflating
    the variance it is judged against.

    ``ts_col`` (optional) sorts each micro-batch's rows by event time
    before scoring — the same in-batch ordering contract as
    :func:`funnel_stream`. Without it, rows are scored in arrival
    order within the batch, which is nondeterministic after the
    group-key shuffle; pass it whenever per-event scores (not just the
    converged state) must be reproducible."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out: list[tuple] = []
        for pdf in pdfs:
            if ts_col is not None:
                pdf = pdf.sort_values(ts_col, kind="mergesort")
            for v in pdf[value_col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                v = float(v)
                var = (m2 / n) if n > 0 else 0.0
                std = math.sqrt(var)
                z = (v - mean) / std if (n >= min_count and std > 0) \
                    else None
                out.append((v, z, z is not None
                            and abs(z) >= threshold))
                # Welford update AFTER scoring (pre-event state judges)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        if out:
            yield pd.DataFrame({
                key_col: [key[0]] * len(out),
                value_col: [o[0] for o in out],
                "zscore": [o[1] for o in out],
                "is_anomaly": [bool(o[2]) for o in out],
            })

    key_type = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, {value_col} double, "
                         "zscore double, is_anomaly boolean",
        stateStructType="n long, mean double, m2 double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stream(
    stream_df: DataFrame,
    item_col: str,
    group_col: str,
    k: int = 100,
) -> DataFrame:
    """Streaming top-item tracking with BOUNDED state: a Misra–Gries
    summary of at most ``k`` counters per ``group_col`` key, updated
    each micro-batch, emitting the summary rows (update mode). The
    classic frequent-items guarantee holds across batches: any item
    whose true count exceeds n/(k+1) is present, and each stored count
    undercounts its true count by at most n/(k+1) (``n_total`` rides
    along so consumers can compute the bound). The streaming
    counterpart of sketch.py's Count-Min heavy hitters, but
    deterministic: no hashing, no collisions — merge order inside a
    batch is pandas ``value_counts`` + (count desc, item asc)
    tie-break, so replays reproduce byte-identical summaries.

    State per key is two aligned arrays (≤ k items + counts) + one
    scalar — O(k · keys) memory total, independent of stream length.
    A group with < k distinct items is tracked EXACTLY (every count
    precise, no evictions) — size k to the expected distinct-item tail,
    not the hot set."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(list(items), list(counts)))
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            vals = pdf[item_col].dropna()
            n += len(vals)
            # merge the batch's exact counts into the MG summary:
            # add matching counters, admit new items while room,
            # then apply the standard overflow decrement (subtract the
            # (k+1)-th largest count from all, drop non-positive)
            for item, c in vals.value_counts().sort_index().items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > k:
                ordered = sorted(summary.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
                cut = ordered[k][1]
                summary = {i: c - cut for i, c in ordered if c - cut > 0}
        state.update((list(summary.keys()),
                      [int(c) for c in summary.values()], n))
        if summary:
            ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            yield pd.DataFrame({
                group_col: [key[0]] * len(ordered),
                item_col: [i for i, _ in ordered],
                "est_count": [c for _, c in ordered],
                "n_total": [n] * len(ordered),
            })

    g_type = stream_df.schema[group_col].dataType.simpleString()
    i_type = stream_df.schema[item_col].dataType.simpleString()
    return stream_df.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=f"{group_col} {g_type}, {item_col} {i_type}, "
                         "est_count long, n_total long",
        stateStructType=f"items array<{i_type}>, counts array<long>, "
                        "n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    order_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """STREAMING Holt double exponential smoothing — the live twin of
    ``operators/timeseries.py::holt_smooth``: per-key (level, trend)
    state carried across micro-batches, each event emitted with the
    post-update level and trend.

    The update is the identical float64 expression sequence as the batch
    operator (``l' = alpha*x + (1-alpha)*(l+b)`` then ``b' =
    beta*(l'-l) + (1-beta)*b``), and ``order_cols`` sorts each
    micro-batch's rows before applying it — so when the replayed stream
    presents events in the same total order as the batch sort, every
    emitted (level, trend) matches the batch output BIT-EXACTLY,
    regardless of where micro-batch boundaries fall (state is just the
    last (l, b)). That is what gives q183 a per-event float-exact
    driver row instead of q140's count-level compare.

    Deviation from the batch twin, documented: NULL values are dropped
    (batch emits NULL rows) — append-mode streams have no place for
    score-less rows. ``carry_cols`` pass through event identity (e.g.
    event_id) so emitted rows join back to their inputs.

    At scale: two-scalar state per key (O(keys) memory), one shuffle of
    each micro-batch to its key partition — the same shape as every
    operator in this module."""
    for name, v in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name} must be in (0, 1], got {v}")
    carry = list(carry_cols or [])
    order = list(order_cols or [])

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            l, b = state.get
        else:
            l = b = None
        frames = [pdf for pdf in pdfs]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if order:
            pdf = pdf.sort_values(order, kind="mergesort")
        rows: list[tuple] = []
        for tup in pdf.itertuples(index=False):
            x = getattr(tup, value_col)
            if x is None or (isinstance(x, float) and pd.isna(x)):
                continue
            if l is None:
                l, b = float(x), 0.0
            else:
                lp = alpha * float(x) + (1 - alpha) * (l + b)
                b = beta * (lp - l) + (1 - beta) * b
                l = lp
            rows.append(tuple(getattr(tup, c) for c in carry)
                        + (float(x), l, b))
        if l is not None:
            state.update((l, b))
        if rows:
            yield pd.DataFrame(
                [(key[0],) + r for r in rows],
                columns=[key_col] + carry + [value_col, "level", "trend"])

    fields = [f"{key_col} {stream_df.schema[key_col].dataType.simpleString()}"]
    for c in carry:
        fields.append(f"{c} {stream_df.schema[c].dataType.simpleString()}")
    fields += [f"{value_col} double", "level double", "trend double"]
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=", ".join(fields),
        stateStructType="l double, b double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    order_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """STREAMING CUSUM drift detection — the live twin of
    ``operators/timeseries.py::cusum``: per-key (s+, s-) state carried
    across micro-batches, each event emitted with its post-update
    statistics and alarm flag. This is the monitor you attach to a
    feed: a sustained mean shift raises ``alarm`` within
    ~threshold/shift events of the change, while a plain threshold
    alert never fires on a small drift.

    The update is the identical float64 expression sequence as the
    batch operator (``s+ = max(0, s+ + ((x - target) - slack))`` and
    the mirrored ``s-``), and ``order_cols`` sorts each micro-batch
    before applying it — so a replayed stream presenting events in the
    batch sort's total order matches ``cusum`` BIT-EXACTLY per event
    regardless of micro-batch boundaries (state is just the last two
    scalars). Same deviation as ``holt_stream``, documented: NULL
    values are dropped (batch emits NULL rows) — append-mode streams
    have no place for score-less rows.

    At scale: two-scalar state per key (O(keys) memory), one shuffle
    of each micro-batch to its key partition."""
    if slack < 0.0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    carry = list(carry_cols or [])
    order = list(order_cols or [])

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            sp, sn = state.get
        else:
            sp = sn = 0.0
        frames = [pdf for pdf in pdfs]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if order:
            pdf = pdf.sort_values(order, kind="mergesort")
        rows: list[tuple] = []
        for tup in pdf.itertuples(index=False):
            x = getattr(tup, value_col)
            if x is None or (isinstance(x, float) and pd.isna(x)):
                continue
            sp = max(0.0, sp + ((float(x) - target) - slack))
            sn = max(0.0, sn + ((target - float(x)) - slack))
            alarm = (None if threshold is None
                     else bool(sp > threshold or sn > threshold))
            rows.append(tuple(getattr(tup, c) for c in carry)
                        + (float(x), sp, sn, alarm))
        state.update((sp, sn))
        if rows:
            yield pd.DataFrame(
                [(key[0],) + r for r in rows],
                columns=([key_col] + carry
                         + [value_col, "cusum_pos", "cusum_neg", "alarm"]))

    fields = [f"{key_col} {stream_df.schema[key_col].dataType.simpleString()}"]
    for c in carry:
        fields.append(f"{c} {stream_df.schema[c].dataType.simpleString()}")
    fields += [f"{value_col} double", "cusum_pos double",
               "cusum_neg double", "alarm boolean"]
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=", ".join(fields),
        stateStructType="sp double, sn double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
