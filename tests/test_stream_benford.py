"""Streaming Benford monitor (streaming/quality.py::
stream_benford_monitor): the accumulated standing digit-count table
must equal the batch digit collapse over everything streamed,
bit-for-bit and split-invariant; the profile composed from it must
equal benford_profile; replay is marker-safe and a crash between the
renames recovers."""
from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from goetl_spark.quality import (_benford_digit, benford_from_counts,
                                 benford_profile)
from goetl_spark.streaming.quality import stream_benford_monitor
from goetl_spark.streaming.sources import replay_stream_ordered


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=7 * i),
             None if i % 13 == 0 else
             (0.0 if i % 17 == 0 else float((i % 97) + 1) * (1 + i % 3)))
            for i in range(400)]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                       "value double")


def _scratch(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _run(stream, out, ckpt):
    q = stream_benford_monitor(stream, out, "value", ckpt)
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_accumulated_equals_direct_and_profile_composes(spark):
    e = _events(spark)
    replay = _scratch("goetl_t_bf_replay")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=3, dir=replay)
    out = _scratch("goetl_t_bf_out")
    _run(stream, out, _scratch("goetl_t_bf_ckpt"))

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple,
                      e.filter(F.col("value").isNotNull())
                      .groupBy(_benford_digit("value", 4).alias("__d"))
                      .agg(F.count(F.lit(1)).alias("__nd")).collect()))
    assert got == want          # split-invariant, zero sentinel included
    assert any(r[0] == 0 for r in got)   # the zero-magnitude sentinel

    via_stream = sorted(map(tuple, benford_from_counts(
        spark.read.parquet(out)).collect()))
    direct = sorted(map(tuple, benford_profile(e, "value").collect()))
    assert via_stream == direct  # the twin contract, bit-for-bit


def test_replay_marker_and_crash_recovery(spark):
    e = _events(spark)
    replay = _scratch("goetl_t_bf_replay2")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    out = _scratch("goetl_t_bf_out2")
    _run(stream, out, _scratch("goetl_t_bf_ckpt2a"))
    once = sorted(map(tuple, spark.read.parquet(out).collect()))

    # fresh checkpoint replays every batch; markers must skip them all
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    _run(stream2, out, _scratch("goetl_t_bf_ckpt2b"))
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == once

    # crash between the two renames: repaired on next entry
    os.rename(out, out + ".__benford_old__")
    stream3, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    _run(stream3, out, _scratch("goetl_t_bf_ckpt2c"))
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == once
    assert not os.path.exists(out + ".__benford_old__")


def test_nan_accumulates_and_fails_loudly_at_read(spark):
    import pytest

    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, t0, 5.0), (1, t0 + dt.timedelta(minutes=1), float("nan"))]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                    "value double")
    replay = _scratch("goetl_t_bf_replay3")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=1, dir=replay)
    out = _scratch("goetl_t_bf_out3")
    _run(stream, out, _scratch("goetl_t_bf_ckpt3"))
    # the -1 sentinel accumulated silently; the READ is the loud gate
    assert any(r["__d"] == -1 for r in spark.read.parquet(out).collect())
    with pytest.raises(Exception, match="benford_profile"):
        benford_from_counts(spark.read.parquet(out)).collect()
