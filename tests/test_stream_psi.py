"""Streaming PSI monitor (streaming/quality.py::stream_psi_monitor):
the accumulated standing bin-count table must equal quality.py::
bin_counts over everything streamed, bit-for-bit and split-invariant;
PSI composed from it must equal the batch operator; replay is
marker-safe and a crash between the renames recovers."""
from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from goetl_spark.quality import (bin_counts, population_stability_index,
                                 psi_from_counts)
from goetl_spark.streaming.sources import replay_stream_ordered
from goetl_spark.streaming.quality import stream_psi_monitor

BREAKS = [-1.0, 0.5, 2.0]


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=11 * i),
             None if i % 13 == 0 else float(i % 9) - 3.0)
            for i in range(300)]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                       "value double")


def _scratch(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _run(stream, out, ckpt):
    q = stream_psi_monitor(stream, out, "value", BREAKS, ckpt)
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_accumulated_counts_equal_direct_and_psi_composes(spark):
    e = _events(spark)
    replay = _scratch("goetl_t_psi_replay")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=3, dir=replay)
    out = _scratch("goetl_t_psi_out")
    _run(stream, out, _scratch("goetl_t_psi_ckpt"))

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, bin_counts(e, "value", BREAKS).collect()))
    assert got == want  # split-invariant accumulation, NULL bin included
    assert any(r[0] == -1 for r in got)

    # PSI composed from the standing table == the batch operator against
    # the same reference, bit-for-bit
    ref = e.filter(F.col("event_id") % 2 == 0)
    via_stream = psi_from_counts(
        spark.read.parquet(out), bin_counts(ref, "value", BREAKS),
        n_bins=len(BREAKS) + 2)
    direct = population_stability_index(e, ref, "value", BREAKS)
    a = sorted(map(tuple, via_stream.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_replay_marker_skips_applied_batches(spark):
    e = _events(spark)
    replay = _scratch("goetl_t_psi_replay2")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    out = _scratch("goetl_t_psi_out2")
    _run(stream, out, _scratch("goetl_t_psi_ckpt2a"))
    once = sorted(map(tuple, spark.read.parquet(out).collect()))

    # a fresh checkpoint replays every batch; markers must skip them all
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    _run(stream2, out, _scratch("goetl_t_psi_ckpt2b"))
    again = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert again == once  # counts did not double


def test_crash_between_renames_recovers(spark):
    e = _events(spark)
    replay = _scratch("goetl_t_psi_replay3")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    out = _scratch("goetl_t_psi_out3")
    _run(stream, out, _scratch("goetl_t_psi_ckpt3a"))
    healthy = sorted(map(tuple, spark.read.parquet(out).collect()))

    os.rename(out, out + ".__psi_old__")  # the crash window
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    _run(stream2, out, _scratch("goetl_t_psi_ckpt3b"))
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == healthy
    assert not os.path.exists(out + ".__psi_old__")
