"""Streaming continuous aggregate (streaming/warehouse.py::stream_rollup):
incremental micro-batch refresh of a persisted hypertable rollup must
equal the direct batch rollup bit-for-bit, bootstrap from nothing, and
survive at-least-once replay via the transactional batch-id marker
(merging partials is NOT idempotent, so the marker is the safety)."""
from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from goetl_spark.operators.timeseries import hypertable_rollup
from goetl_spark.streaming.sources import replay_stream_ordered
from goetl_spark.streaming.warehouse import _BATCH_MARKER, stream_rollup


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, "a" if i % 3 else "b",
         t0 + dt.timedelta(minutes=37 * i), float(i % 7) - 2.5)
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")


def _scratch(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _run(stream, out, ckpt):
    q = stream_rollup(stream, out, "ts", ["event_type"], "value", ckpt,
                      grains=("hour", "day"))
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_incremental_equals_direct_and_bootstrap(spark):
    e = _events(spark)
    replay_dir = _scratch("goetl_t_sr_replay")
    os.makedirs(replay_dir)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=3, dir=replay_dir)
    out = _scratch("goetl_t_sr_out")  # does not exist -> bootstrap path
    _run(stream, out, _scratch("goetl_t_sr_ckpt"))

    got = spark.read.parquet(out)
    want = hypertable_rollup(e, "ts", ["event_type"], "value",
                             grains=("hour", "day"))
    cols = ["grain", "bucket", "event_type", "n", "sum_dec", "vmin", "vmax"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w  # bit-exact: counts add, exact decimal sums, min/max
    assert os.path.exists(os.path.join(out, _BATCH_MARKER))


def test_replayed_batches_skip_via_marker(spark):
    e = _events(spark)
    replay_dir = _scratch("goetl_t_sr_replay2")
    os.makedirs(replay_dir)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=3, dir=replay_dir)
    out = _scratch("goetl_t_sr_out2")
    _run(stream, out, _scratch("goetl_t_sr_ckpt2a"))
    first = sorted(map(tuple, spark.read.parquet(out).collect()))

    # Fresh checkpoint over the SAME files = every batch replays with
    # batch ids <= the stored marker; all must skip, nothing doubles.
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=3, dir=replay_dir)
    _run(stream2, out, _scratch("goetl_t_sr_ckpt2b"))
    second = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert first == second


def test_null_rows_excluded(spark):
    e = _events(spark).withColumn(
        "value", F.when(F.col("event_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("value")))
    replay_dir = _scratch("goetl_t_sr_replay3")
    os.makedirs(replay_dir)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay_dir)
    out = _scratch("goetl_t_sr_out3")
    _run(stream, out, _scratch("goetl_t_sr_ckpt3"))
    got = spark.read.parquet(out)
    n_hour = (got.filter(F.col("grain") == "hour")
              .agg(F.sum("n")).collect()[0][0])
    assert n_hour == e.filter(F.col("value").isNotNull()).count()


def _day_files(out: str, day: str) -> dict[str, int]:
    """{relative parquet path: size} under every grain's <day> partition."""
    got = {}
    for root, _dirs, files in os.walk(out):
        if f"__part={day}" not in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                got[os.path.relpath(p, out)] = os.path.getsize(p)
    return got


def test_incremental_rewrite_touches_only_batch_partitions(spark):
    """The r12 verdict's growth-bound ask: a trigger must rewrite only
    the partitions its batch touches. Day-1's files must survive the
    day-2 trigger byte-identical UNDER THE SAME NAMES (a rewrite would
    emit fresh part-file UUIDs), while the merged table still equals
    the direct rollup bit-exactly."""
    e = _events(spark)  # 400 rows x 37 min ~ 10.3 days from 2024-01-01
    day1 = e.filter(F.to_date("ts") == "2024-01-01")
    rest = e.filter(F.to_date("ts") > "2024-01-01")

    replay_dir = _scratch("goetl_t_sr_replay4")
    os.makedirs(replay_dir)
    out = _scratch("goetl_t_sr_out4")
    ckpt = _scratch("goetl_t_sr_ckpt4")

    stream, _ = replay_stream_ordered(day1, "ts", num_chunks=1,
                                      dir=replay_dir)
    _run(stream, out, ckpt)
    before = _day_files(out, "2024-01-01")
    assert before  # day-1 partitions exist

    # append day 2+ as a later file; SAME checkpoint -> batch_id advances
    rest.coalesce(1).write.mode("overwrite").parquet(replay_dir + "_stage")
    src = next(f for f in os.listdir(replay_dir + "_stage")
               if f.endswith(".parquet"))
    shutil.copy(os.path.join(replay_dir + "_stage", src),
                os.path.join(replay_dir, "chunk999.parquet"))
    stream2, _ = replay_stream_ordered(
        e.limit(0), "ts", num_chunks=0, dir=replay_dir)
    _run(stream2, out, ckpt)

    after = _day_files(out, "2024-01-01")
    assert after == before  # untouched day: same file names, same bytes

    got = spark.read.parquet(out)
    want = hypertable_rollup(e, "ts", ["event_type"], "value",
                             grains=("hour", "day"))
    cols = ["grain", "bucket", "event_type", "n", "sum_dec", "vmin", "vmax"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w


def test_crash_between_renames_recovers_history(spark):
    """r12 advisor finding: a crash between rename(live, backup) and
    rename(staging, live) used to strand the table — the next trigger
    found no marker and no table, took the bootstrap path, and rebuilt
    from that single batch, silently losing all history. The repair:
    restore the backup on entry."""
    e = _events(spark)
    replay_dir = _scratch("goetl_t_sr_replay5")
    os.makedirs(replay_dir)
    out = _scratch("goetl_t_sr_out5")
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay_dir)
    _run(stream, out, _scratch("goetl_t_sr_ckpt5a"))
    healthy = sorted(map(tuple, spark.read.parquet(out).collect()))

    # simulate the crash window: live table renamed away, swap never run
    os.rename(out, out + ".__rollup_old__")
    assert not os.path.exists(out)

    # any later trigger repairs first; replayed batches then marker-skip
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2, dir=replay_dir)
    _run(stream2, out, _scratch("goetl_t_sr_ckpt5b"))
    recovered = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert recovered == healthy
    assert not os.path.exists(out + ".__rollup_old__")
