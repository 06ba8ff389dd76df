"""Event-time windowed aggregation with watermarks.

Beyond-reference (SURVEY §2.8): tumbling / sliding / session windows over
an event-time column, with a watermark bounding state for late data.
Works identically on batch DataFrames (windows become plain groupBy keys)
and streaming DataFrames (incremental state + late-data eviction) — the
same code path serves the `events` batch fixture and a live stream.

Scale note: windowed agg state is partitioned by (window, keys); the
watermark is what keeps state bounded — always set one on unbounded
inputs. Session windows use Spark's native session_window (merging state
machine), not the gaps-and-islands batch trick.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows, e.g. ``window='1 hour'``."""
    df = _with_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, window).alias("window"), *keys).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets."""
    df = _with_watermark(df, ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window, slide).alias("window"), *keys
    ).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic sessions closing after ``gap`` of inactivity (native
    session_window — the streaming analog of operators/window.sessionize)."""
    df = _with_watermark(df, ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("session"), *keys
    ).agg(*aggs)


def sliding_distinct_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window: str,
    slide: str,
    watermark: str | None = None,
    exact: bool | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct active users per sliding window — the live-audience /
    rolling-MAU metric (the last unchecked streaming-roadmap box).

    ``exact`` defaults to the mode that is actually computable: batch
    inputs use exact ``count_distinct``; STREAMING inputs use
    ``approx_count_distinct`` (HLL partials merge incrementally per
    window in bounded state — exact distinct over an unbounded stream
    would require per-window user sets, O(users) state per window).
    Forcing ``exact=True`` on a stream raises rather than silently
    building unbounded state.

    Scale: one shuffle keyed by the window bucket; each event expands
    into window/slide buckets before the partial aggregate, and the
    watermark evicts finished windows."""
    if exact is None:
        exact = not df.isStreaming
    if exact and df.isStreaming:
        raise ValueError(
            "exact distinct over an unbounded stream needs O(users) "
            "state per window; use exact=False (HLL) or aggregate a "
            "bounded batch")
    df = _with_watermark(df, ts_col, watermark)
    agg = (F.count_distinct(F.col(user_col)) if exact
           else F.approx_count_distinct(F.col(user_col), rsd))
    return (df.groupBy(F.window(ts_col, window, slide).alias("window"))
            .agg(agg.alias("n_users"),
                 F.count(F.lit(1)).alias("n_events")))
