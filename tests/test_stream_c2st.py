"""Streaming C2ST monitor (streaming/quality.py::stream_c2st_monitor):
the accumulated standing (cells, fold) count table must equal
cell_fold_counts over everything streamed, bit-for-bit and
split-invariant; the drift readout composed from it must equal the
batch classifier_two_sample_test; replay is marker-safe."""
from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from goetl_spark.quality import (
    c2st_from_counts,
    cell_fold_counts,
    classifier_two_sample_test,
)
from goetl_spark.streaming.quality import stream_c2st_monitor
from goetl_spark.streaming.sources import replay_stream_ordered


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=3 * i),
             ("web", "api", "batch")[i % 3],
             None if i % 11 == 0 else f"seg{i % 4}",
             (i // 2) % 2)
            for i in range(300)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, src string, seg string, "
              "fold int")


def _scratch(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _run(stream, out, ckpt):
    q = stream_c2st_monitor(stream, out, ["src", "seg"], "fold", ckpt)
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_accumulated_equals_direct_and_c2st_composes(spark):
    e = _events(spark)
    cur = e.filter("event_id % 3 != 0")
    ref = e.filter("event_id % 3 = 0")
    replay = _scratch("goetl_t_c2st_replay")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(cur, "ts", num_chunks=3, dir=replay)
    out = _scratch("goetl_t_c2st_out")
    _run(stream, out, _scratch("goetl_t_c2st_ckpt"))

    got = sorted(map(tuple, spark.read.parquet(out).collect()),
                 key=str)
    want = sorted(map(tuple,
                      cell_fold_counts(cur, ["src", "seg"],
                                       "fold").collect()),
                  key=str)
    assert got == want  # split-invariant, NULL seg class included
    assert any(r[1] is None for r in got)  # NULL category is a class

    via_stream = c2st_from_counts(
        cell_fold_counts(ref, ["src", "seg"], "fold"),
        spark.read.parquet(out), ["src", "seg"]).collect()
    direct = classifier_two_sample_test(
        ref, cur.select("src", "seg", "fold"),
        ["src", "seg"], "fold").collect()
    assert [tuple(r) for r in via_stream] == [tuple(r) for r in direct]


def test_replay_marker_safe(spark):
    e = _events(spark).filter("event_id % 3 != 0")
    replay = _scratch("goetl_t_c2st_replay2")
    os.makedirs(replay)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    out = _scratch("goetl_t_c2st_out2")
    _run(stream, out, _scratch("goetl_t_c2st_ckpt2a"))
    once = sorted(map(tuple, spark.read.parquet(out).collect()), key=str)

    # fresh checkpoint replays every batch; markers must skip them all
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay)
    _run(stream2, out, _scratch("goetl_t_c2st_ckpt2b"))
    assert sorted(map(tuple, spark.read.parquet(out).collect()),
                  key=str) == once


def test_two_monitor_topology_composes(spark):
    # BOTH snapshots accumulated by independent monitors (reference
    # stream + current stream, different chunkings) — the full
    # continuous-monitoring topology: compose the two standing tables
    # at any point and the readout equals the batch test
    e = _events(spark)
    cur = e.filter("event_id % 3 != 0")
    ref = e.filter("event_id % 3 = 0")
    r1 = _scratch("goetl_t_c2st2_replay_a")
    r2 = _scratch("goetl_t_c2st2_replay_b")
    os.makedirs(r1), os.makedirs(r2)
    s_ref, _ = replay_stream_ordered(ref, "ts", num_chunks=1, dir=r1)
    s_cur, _ = replay_stream_ordered(cur, "ts", num_chunks=4, dir=r2)
    out_ref = _scratch("goetl_t_c2st2_out_a")
    out_cur = _scratch("goetl_t_c2st2_out_b")
    _run(s_ref, out_ref, _scratch("goetl_t_c2st2_ck_a"))
    _run(s_cur, out_cur, _scratch("goetl_t_c2st2_ck_b"))
    via_streams = c2st_from_counts(
        spark.read.parquet(out_ref), spark.read.parquet(out_cur),
        ["src", "seg"]).collect()
    direct = classifier_two_sample_test(
        ref.select("src", "seg", "fold"),
        cur.select("src", "seg", "fold"),
        ["src", "seg"], "fold").collect()
    assert [tuple(r) for r in via_streams] == [tuple(r) for r in direct]


def test_grouped_compose_from_two_monitors(spark):
    """The grouped leg of the two-monitor topology: run both monitors
    with cat_cols = [group] + cats (src as the segment), compose the
    standing tables with c2st_from_counts_by, and the per-segment
    readout equals the batch classifier_two_sample_test_by
    bit-for-bit — WHICH segment drifted, from standing tables alone."""
    from goetl_spark.quality import (
        c2st_from_counts_by, classifier_two_sample_test_by)

    e = _events(spark)
    cur = e.filter("event_id % 3 != 0")
    ref = e.filter("event_id % 3 = 0")
    outs = {}
    for name, chunks, df in (("ref", 2, ref), ("cur", 3, cur)):
        d = _scratch(f"goetl_t_c2stg_replay_{name}")
        os.makedirs(d)
        stream, _ = replay_stream_ordered(df, "ts", num_chunks=chunks,
                                          dir=d)
        out = _scratch(f"goetl_t_c2stg_out_{name}")
        q = stream_c2st_monitor(stream, out, ["src", "seg"], "fold",
                                _scratch(f"goetl_t_c2stg_ck_{name}"))
        try:
            q.awaitTermination()
        finally:
            q.stop()
        outs[name] = out
    composed = {r["src"]: tuple(r) for r in c2st_from_counts_by(
        spark.read.parquet(outs["ref"]),
        spark.read.parquet(outs["cur"]),
        ["src"], ["seg"]).collect()}
    direct = {r["src"]: tuple(r) for r in classifier_two_sample_test_by(
        ref.select("src", "seg", "fold"),
        cur.select("src", "seg", "fold"),
        ["src"], ["seg"], "fold").collect()}
    assert composed == direct and len(direct) == 3
