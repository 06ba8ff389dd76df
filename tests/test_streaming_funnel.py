"""Streaming funnel tests (streaming/stateful.py::funnel_stream) —
cross-batch state must reproduce the batch funnel semantics."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from goetl_spark.streaming.stateful import funnel_stream


def _feed(spark, tmp_path, chunks, schema):
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i, chunk in enumerate(chunks):
        staged = tmp_path / f"stage{i}"
        (spark.createDataFrame(chunk, schema)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.parquet(str(staged)))
        part = next(staged.glob("part-*.parquet"))
        dst = stream_dir / f"chunk{i:03d}.parquet"
        shutil.copy(part, dst)
        import os
        os.utime(dst, ((i + 1) * 1000, (i + 1) * 1000))
    return (spark.readStream.format("parquet")
            .schema("u long, ts timestamp, t string")
            .option("maxFilesPerTrigger", 1).load(str(stream_dir)))


def test_streaming_funnel_matches_batch_semantics(spark, tmp_path):
    schema = "u long, ts string, t string"
    # u=1 converts A->B across the BATCH BOUNDARY (cross-batch state);
    # u=2's B predates its A (must not count; no later B);
    # u=3 has B outside the within bound.
    chunk1 = [(1, "2024-01-01 00:00:00", "A"),
              (2, "2024-01-01 00:00:00", "B"),
              (2, "2024-01-01 01:00:00", "A"),
              (3, "2024-01-01 00:00:00", "A")]
    chunk2 = [(1, "2024-01-02 00:00:00", "B"),
              (3, "2024-01-09 00:00:00", "B")]
    stream = _feed(spark, tmp_path, [chunk1, chunk2], schema)
    out = funnel_stream(stream, "u", "ts", "t", ["A", "B"],
                        within_seconds=7 * 86400)
    q = (out.writeStream.format("memory").queryName("funnel_t")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_t").collect()
    finally:
        q.stop()
    reach = {}
    for r in rows:
        reach[r.u] = max(reach.get(r.u, 0), r.stage_idx)
    assert reach[1] == 2          # converted across the batch boundary
    assert reach[2] == 1          # pre-stage B never counts
    assert reach[3] == 1          # outside the 7-day bound
    # emitted conversion event carries the right stage labels
    stages = {(r.u, r.stage_idx): r.stage for r in rows}
    assert stages[(1, 2)] == "B" and stages[(1, 1)] == "A"


def test_streaming_funnel_single_batch_full_conversion(spark, tmp_path):
    schema = "u long, ts string, t string"
    chunk = [(7, "2024-01-01 00:00:00", "A"),
             (7, "2024-01-01 00:00:01", "B"),
             (7, "2024-01-01 00:00:02", "C"),
             # out-of-order inside the batch: sorted before matching
             (8, "2024-01-01 00:00:02", "B"),
             (8, "2024-01-01 00:00:01", "A")]
    stream = _feed(spark, tmp_path, [chunk], schema)
    out = funnel_stream(stream, "u", "ts", "t", ["A", "B", "C"])
    q = (out.writeStream.format("memory").queryName("funnel_t2")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_t2").collect()
    finally:
        q.stop()
    reach = {}
    for r in rows:
        reach[r.u] = max(reach.get(r.u, 0), r.stage_idx)
    assert reach[7] == 3
    assert reach[8] == 2  # in-batch sort recovers A-then-B


def test_sliding_distinct_users_batch_exact_and_stream_hll(spark, tmp_path):
    from goetl_spark.streaming.windows import sliding_distinct_users

    rows = [(u, f"2024-01-01 0{h}:30:00") for u in (1, 2, 3)
            for h in (0, 1)] + [(1, "2024-01-01 00:45:00")]
    batch = (spark.createDataFrame(rows, "u long, ts string")
             .withColumn("ts", F.col("ts").cast("timestamp")))

    # batch: exact distinct; window 2h/slide 1h -> hour 00 lands in
    # windows [23-01] and [00-02]
    out = {str(r["window"]["start"]): r["n_users"] for r in
           sliding_distinct_users(batch, "ts", "u", "2 hours",
                                  "1 hour").collect()}
    assert out["2024-01-01 00:00:00"] == 3   # both hours, all users
    assert out["2023-12-31 23:00:00"] == 3   # hour-00 events only

    # stream: exact must refuse; HLL path runs and lands near-exact
    stream = _feed(spark, tmp_path,
                   [[(u, ts, "x") for (u, ts) in rows]],
                   "u long, ts string, t string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unbounded"):
        sliding_distinct_users(stream, "ts", "u", "2 hours", "1 hour",
                               watermark="1 hour", exact=True)
    q = (sliding_distinct_users(stream, "ts", "u", "2 hours", "1 hour",
                                watermark="1 hour")
         .writeStream.format("memory").queryName("mau_t")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {str(r["window"]["start"]): r["n_users"] for r in
               spark.sql("SELECT * FROM mau_t").collect()}
    finally:
        q.stop()
    assert got["2024-01-01 00:00:00"] == 3  # HLL exact at tiny cardinality


def test_running_zscore_stream_welford_and_anomaly(spark, tmp_path):
    from goetl_spark.streaming.stateful import running_zscore_stream

    # key "a": 12 calm values seed the state across two batches, then an
    # outlier arrives in batch 3 — it must be judged by PRE-event state
    calm = [("a", f"2024-01-01 00:00:{s:02d}", 10.0 + (s % 3))
            for s in range(12)]
    chunks = [calm[:6], calm[6:], [("a", "2024-01-01 00:01:00", 1000.0),
                                   ("a", "2024-01-01 00:01:01", 10.5)]]
    import shutil as _sh
    stream_dir = tmp_path / "zs"
    stream_dir.mkdir()
    for i, c in enumerate(chunks):
        staged = tmp_path / f"zstage{i}"
        (spark.createDataFrame([(k, v) for (k, _, v) in c],
                               "k string, v double")
         .coalesce(1).write.parquet(str(staged)))
        part = next(staged.glob("part-*.parquet"))
        dst = stream_dir / f"chunk{i:03d}.parquet"
        _sh.copy(part, dst)
        import os as _os
        _os.utime(dst, ((i + 1) * 1000, (i + 1) * 1000))
    zstream = (spark.readStream.format("parquet")
               .schema("k string, v double")
               .option("maxFilesPerTrigger", 1).load(str(stream_dir)))
    out = running_zscore_stream(zstream, "k", "v", threshold=3.0,
                                min_count=10)
    q = (out.writeStream.format("memory").queryName("zs_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM zs_t").collect()
    finally:
        q.stop()
    assert len(rows) == 14
    by_val = {r.v: r for r in rows}
    # warmup rows carry no score
    assert by_val[10.0].zscore is None
    # the outlier is flagged against the calm pre-event distribution
    assert by_val[1000.0].is_anomaly is True and by_val[1000.0].zscore > 100
    # the next normal value is NOT flagged even though the outlier
    # inflated the running variance (still within threshold)
    assert by_val[10.5].is_anomaly is False


def test_holt_stream_matches_batch_bit_exact(spark, tmp_path):
    """Replayed in batch order, the streaming smoother's every emitted
    (level, trend) equals the batch operator exactly — micro-batch
    boundaries only checkpoint the (l, b) scalars."""
    from goetl_spark.operators.timeseries import holt_smooth
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.stateful import holt_stream

    rows = [(f"k{i % 3}", i, float((i * 37) % 101)) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "k string, i long, x double")
    stream, _ = replay_stream_ordered(df, "i", num_chunks=4,
                                      dir=str(tmp_path / "holt_replay"))
    out = holt_stream(stream, "k", "x", 0.5, 0.5,
                      order_cols=["i"], carry_cols=["i"])
    q = (out.writeStream.format("memory").queryName("holt_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r["k"], r["i"]): (r["level"], r["trend"])
               for r in spark.sql("SELECT * FROM holt_t").collect()}
    finally:
        q.stop()
    want = {(r["k"], r["i"]): (r["level"], r["trend"])
            for r in holt_smooth(df, "x", ["i"], ["k"], 0.5, 0.5).collect()}
    assert got == want                       # bit-exact, all 60 events
    assert len(got) == 60


def test_holt_stream_drops_nulls_and_guards(spark, tmp_path):
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.stateful import holt_stream

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 20.0)],
        "k string, i long, x double")
    stream, _ = replay_stream_ordered(df, "i", num_chunks=1,
                                      dir=str(tmp_path / "holt_null"))
    out = holt_stream(stream, "k", "x", 0.5, 0.5,
                      order_cols=["i"], carry_cols=["i"])
    q = (out.writeStream.format("memory").queryName("holt_n")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM holt_n").collect()
    finally:
        q.stop()
    assert sorted(r["i"] for r in rows) == [1, 3]   # null row dropped
    by_i = {r["i"]: r for r in rows}
    assert by_i[3]["level"] == 0.5 * 20.0 + 0.5 * 10.0  # state skipped null

    import pytest as _pytest
    with _pytest.raises(ValueError):
        holt_stream(stream, "k", "x", 0.0, 0.5)


def test_cusum_stream_matches_batch_bit_exact(spark, tmp_path):
    """Replayed in batch order, every emitted (s+, s-, alarm) equals the
    batch CUSUM exactly — micro-batch boundaries only checkpoint the
    two scalars."""
    from goetl_spark.operators.timeseries import cusum
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.stateful import cusum_stream

    rows = [(f"k{i % 3}", i, float((i * 37) % 101)) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "k string, i long, x double")
    stream, _ = replay_stream_ordered(df, "i", num_chunks=4,
                                      dir=str(tmp_path / "cusum_replay"))
    out = cusum_stream(stream, "k", "x", target=50.0, slack=0.5,
                       threshold=100.0, order_cols=["i"],
                       carry_cols=["i"])
    q = (out.writeStream.format("memory").queryName("cusum_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r["k"], r["i"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
               for r in spark.sql("SELECT * FROM cusum_t").collect()}
    finally:
        q.stop()
    want = {(r["k"], r["i"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
            for r in cusum(df, "x", ["i"], ["k"], target=50.0, slack=0.5,
                           threshold=100.0).collect()}
    assert got == want
    assert len(got) == 60
    assert any(a for _, _, a in got.values())   # the drift fires somewhere


def test_cusum_stream_drops_nulls_and_guards(spark, tmp_path):
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.stateful import cusum_stream

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 10.0)],
        "k string, i long, x double")
    stream, _ = replay_stream_ordered(df, "i", num_chunks=1,
                                      dir=str(tmp_path / "cusum_null"))
    out = cusum_stream(stream, "k", "x", target=5.0, order_cols=["i"],
                       carry_cols=["i"])
    q = (out.writeStream.format("memory").queryName("cusum_n")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cusum_n").collect()
    finally:
        q.stop()
    assert sorted(r["i"] for r in rows) == [1, 3]
    by_i = {r["i"]: r for r in rows}
    assert by_i[1]["cusum_pos"] == 5.0 and by_i[3]["cusum_pos"] == 10.0
    assert by_i[1]["alarm"] is None     # threshold=None -> NULL alarm

    import pytest as _pytest
    with _pytest.raises(ValueError):
        cusum_stream(stream, "k", "x", target=0.0, slack=-0.1)
