"""Streaming windowed aggs (via deterministic replay) + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators.multimodal import (
    attach_media_column,
    extract_features,
    repartition_for_payload,
    sample_frames,
)
from goetl_spark.streaming import (
    replay_stream,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def _events(spark):
    rows = [
        Row(user_id=1, ts="2024-01-01 10:00:30", value=1.0),
        Row(user_id=1, ts="2024-01-01 10:20:00", value=2.0),
        Row(user_id=1, ts="2024-01-01 11:05:00", value=4.0),
        Row(user_id=2, ts="2024-01-01 10:40:00", value=8.0),
    ]
    return spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))


def test_tumbling_window_batch(spark):
    out = tumbling_window_agg(
        _events(spark), "ts", "1 hour",
        [F.sum("value").alias("total")], keys=["user_id"],
    ).collect()
    got = {(r.user_id, r.window.start.hour): r.total for r in out}
    assert got == {(1, 10): 3.0, (1, 11): 4.0, (2, 10): 8.0}


def test_sliding_window_batch(spark):
    out = sliding_window_agg(
        _events(spark), "ts", "1 hour", "30 minutes",
        [F.count(F.lit(1)).alias("n")],
    ).collect()
    # event at 10:20 lands in windows [9:30,10:30) and [10:00,11:00)
    n_windows = sum(1 for r in out)
    assert n_windows >= 4


def test_session_window_batch(spark):
    out = session_window_agg(
        _events(spark), "ts", "30 minutes",
        [F.count(F.lit(1)).alias("n")], keys=["user_id"],
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.n)
    # user 1: events at 10:00:30 and 10:20 merge (gap < 30m); 11:05 separate
    assert sorted(by_user[1]) == [1, 2]
    assert by_user[2] == [1]


def test_streaming_tumbling_with_watermark(spark, tmp_path):
    stream = replay_stream(_events(spark), num_chunks=2, dir=str(tmp_path / "replay"))
    assert stream.isStreaming
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", [F.sum("value").alias("total")],
        keys=["user_id"], watermark="10 minutes",
    )
    q = (agg.writeStream.format("memory").queryName("win_agg")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_agg").collect()
    finally:
        q.stop()
    got = {(r.user_id, r.window.start.hour): r.total for r in rows}
    assert got == {(1, 10): 3.0, (1, 11): 4.0, (2, 10): 8.0}


def test_streaming_session_window(spark, tmp_path):
    stream = replay_stream(_events(spark), num_chunks=1, dir=str(tmp_path / "replay2"))
    agg = session_window_agg(
        stream, "ts", "30 minutes", [F.count(F.lit(1)).alias("n")],
        keys=["user_id"], watermark="1 minute",
    )
    q = (agg.writeStream.format("memory").queryName("sess_agg")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT user_id, n FROM sess_agg").collect()
    finally:
        q.stop()
    assert sorted(r.n for r in rows if r.user_id == 1) == [1, 2]


# --- multimodal -------------------------------------------------------------

def _media_df(spark, mime="application/octet-stream"):
    df = spark.createDataFrame(
        [Row(payload=bytearray(b"\x00\x01\x02\x03" * 10)),
         Row(payload=bytearray(b"\xff" * 5))],
        "payload binary",
    )
    return attach_media_column(df, "payload", mime)


def test_attach_media_schema(spark):
    df = _media_df(spark)
    f = df.schema["media"].dataType
    assert {x.name for x in f.fields} == {"media_id", "mime_type", "payload", "meta"}


def test_extract_features_stub(spark):
    out = extract_features(_media_df(spark), feature_dim=4).collect()
    assert len(out) == 2
    by_bytes = {r.n_bytes: r for r in out}
    r40 = by_bytes[40]
    assert r40.decode_ok and len(r40.feature) == 4 and r40.decoder == "stub"
    # byte histogram of repeating 0,1,2,3 mod 4 is uniform
    assert all(abs(x - 0.25) < 1e-6 for x in r40.feature)
    assert by_bytes[5].feature[3] == 1.0  # 0xff % 4 == 3


def _ppm_bytes(w=4, h=2):
    """Binary P6: w*h RGB pixels with value (x+y) % 8, plus a header comment."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x + y) % 8
            px += bytes([v, v, v])
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(px)


def test_extract_features_decodes_netpbm(spark):
    """image/* with a P6 magic goes through the REAL zero-dependency
    decoder: width/height from the header, feature from decoded pixels."""
    df = spark.createDataFrame([Row(payload=bytearray(_ppm_bytes()))],
                               "payload binary")
    media = attach_media_column(df, "payload", "image/x-portable-pixmap")
    r = extract_features(media, feature_dim=8).collect()[0]
    assert r.decode_ok and r.decoder == "netpbm"
    assert (r.width, r.height) == (4, 2)
    # pixels are (x+y)%8 over a 4x2 grid → values 0..4 with counts 1,2,2,2,1
    # (x3 channels), normalized over 24 samples
    import numpy as np
    expect = np.array([3, 6, 6, 6, 3, 0, 0, 0]) / 24.0
    assert np.allclose(r.feature, expect)


def test_extract_features_missing_codec_quarantines(spark):
    """image/* without a netpbm magic needs Pillow; when absent the row is
    flagged missing-codec (not crashed). When Pillow IS present the same
    payload decodes for real — both paths asserted, whichever applies."""
    # 1x1 black PNG, hand-assembled (valid file)
    import base64
    png = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAAAAAA6fptVAAAACklEQVR4nGNgAAAAAgAB"
        b"SK+kcQAAAABJRU5ErkJggg==")
    df = spark.createDataFrame([Row(payload=bytearray(png))], "payload binary")
    media = attach_media_column(df, "payload", "image/png")
    r = extract_features(media, feature_dim=4).collect()[0]
    try:
        import PIL  # noqa: F401
        assert r.decode_ok and r.decoder == "pil" and (r.width, r.height) == (1, 1)
    except ImportError:
        assert not r.decode_ok and r.decoder == "missing-codec"
        assert r.feature is None


def test_decode_netpbm_corrupt_and_p5():
    from goetl_spark.operators.multimodal import _decode_netpbm

    feat, ok, w, h, dec = _decode_netpbm(b"P6\n4 2\n255\nshort", 4)
    assert not ok and dec == "netpbm-truncated"
    # P5 grayscale: 2x2, values 0..3
    p5 = b"P5\n2 2\n255\n" + bytes([0, 1, 2, 3])
    feat, ok, w, h, dec = _decode_netpbm(p5, 4)
    assert ok and (w, h) == (2, 2) and feat == [0.25, 0.25, 0.25, 0.25]


def test_repartition_for_payload(spark):
    df = _media_df(spark)
    out = repartition_for_payload(df, "payload", target_bytes_per_partition=16)
    assert out.rdd.getNumPartitions() >= 2


def test_sample_frames_stub(spark):
    df = spark.createDataFrame([Row(payload=bytearray(b"vid"))], "payload binary")
    media = attach_media_column(df, "payload", "video/mp4").withColumn(
        "media",
        F.col("media").withField("meta.duration_ms", F.lit(3500).cast("bigint")),
    )
    out = sample_frames(media, every_ms=1000).collect()
    assert [r.frame_ms for r in sorted(out, key=lambda r: r.frame_ms)] == [0, 1000, 2000, 3000]


# --- custom stateful streaming (applyInPandasWithState) ---------------------

def test_stateful_running_stats(spark, tmp_path):
    from goetl_spark.streaming.stateful import running_stats_stream

    import shutil

    # two deterministic chunks, each containing both keys, so cross-batch
    # state accumulation is guaranteed observable
    chunk1 = [("a", 1.0), ("b", 2.0)]
    chunk2 = [("a", 5.0), ("a", 3.0), ("b", 7.0)]
    stream_dir = tmp_path / "st"
    stream_dir.mkdir()
    for i, chunk in enumerate([chunk1, chunk2]):
        staged = tmp_path / f"stage{i}"
        (spark.createDataFrame(chunk, "event_type string, value double")
         .coalesce(1).write.parquet(str(staged)))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"chunk{i}.parquet")
    stream = (spark.readStream.format("parquet")
              .schema("event_type string, value double")
              .option("maxFilesPerTrigger", 1).load(str(stream_dir)))
    updates = running_stats_stream(stream, "event_type", "value")
    q = (updates.writeStream.format("memory").queryName("stateful_t")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM stateful_t").collect()
    finally:
        q.stop()
    # final update per key (max running count) equals the batch aggregate
    final = {}
    for r in got:
        if r.event_type not in final or r.n_events > final[r.event_type].n_events:
            final[r.event_type] = r
    assert final["a"].n_events == 3
    assert final["a"].min_value == 1.0 and final["a"].max_value == 5.0
    assert final["b"].n_events == 2
    assert final["b"].min_value == 2.0 and final["b"].max_value == 7.0
    # state carried ACROSS batches: with 2 chunks some key must have been
    # updated twice (two cumulative rows), proving cross-batch state
    assert len(got) > len(final)


def test_replay_stream_ordered_chronological(spark, tmp_path):
    from goetl_spark.streaming import replay_stream_ordered

    e = _events(spark)
    stream, d = replay_stream_ordered(e, "ts", num_chunks=2,
                                      dir=str(tmp_path / "ord"))
    assert stream.isStreaming
    import os
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert len(files) == 2
    # chronological split: every ts in chunk1 <= every ts in chunk2
    c1 = spark.read.parquet(os.path.join(d, files[0])).agg(
        F.max("ts").alias("m")).collect()[0].m
    c2 = spark.read.parquet(os.path.join(d, files[1])).agg(
        F.min("ts").alias("m")).collect()[0].m
    assert c1 <= c2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from goetl_spark.streaming import replay_stream_ordered

    base = _events(spark).withColumn("eid", F.monotonically_increasing_id())
    withdup = base.unionAll(base.limit(2))
    stream, _ = replay_stream_ordered(withdup, "ts", num_chunks=2,
                                      dir=str(tmp_path / "dd"))
    dedup = (stream.withWatermark("ts", "1 hour")
             .dropDuplicatesWithinWatermark(["eid"]))
    q = (dedup.writeStream.format("memory").queryName("dd_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT COUNT(*) AS n FROM dd_t").collect()[0].n
    finally:
        q.stop()
    assert n == base.count()  # duplicates removed, originals intact


def test_stream_parquet_sink_exactly_once(spark, tmp_path):
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.sinks import stream_parquet_sink

    e = _events(spark)
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2,
                                      dir=str(tmp_path / "src"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_parquet_sink(stream, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 4
    # restart from the same checkpoint: nothing new → no duplicates
    stream2, _ = replay_stream_ordered(e, "ts", num_chunks=2,
                                       dir=str(tmp_path / "src"))
    q2 = stream_parquet_sink(stream2, out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == 4


def test_stream_upsert_jdbc_foreachbatch(spark, tmp_path):
    import json as j
    import os

    from test_io import _FileConn

    from goetl_spark.sinks.jdbc import JdbcUpsertWriter
    from goetl_spark.streaming import replay_stream_ordered
    from goetl_spark.streaming.sinks import stream_upsert_jdbc

    commits = str(tmp_path / "commits")
    os.makedirs(commits)
    e = _events(spark).select("user_id", "value", "ts")
    stream, _ = replay_stream_ordered(e, "ts", num_chunks=2,
                                      dir=str(tmp_path / "src2"))
    # running per-user totals, upserted per micro-batch (update mode emits
    # only changed keys) — the streaming materialized-view pattern
    agg = stream.groupBy("user_id").agg(F.sum("value").alias("total"))
    w = JdbcUpsertWriter(table="totals", key_columns=["user_id"],
                         connect_fn=lambda: _FileConn(commits))
    q = stream_upsert_jdbc(agg, w, str(tmp_path / "ckpt2"))
    q.awaitTermination()
    upserts = []
    for fn in os.listdir(commits):
        upserts.extend(j.load(open(os.path.join(commits, fn))))
    assert all("ON CONFLICT (user_id) DO UPDATE" in s for s, b in upserts if b)
    # last upsert per key must equal the batch aggregate
    final = {}
    for _, batch in upserts:
        for uid, total in batch or []:
            final[uid] = max(total, final.get(uid, float("-inf")))
    assert final == {1: 7.0, 2: 8.0}


def test_compact_parquet(spark, tmp_path):
    from goetl_spark.operators.maintenance import compact_parquet, dir_stats

    p = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.range(0, 4000).selectExpr("id", "id % 7 AS k")\
        .repartition(40).write.parquet(p)
    n0, _ = dir_stats(p)
    assert n0 == 40
    stats = compact_parquet(spark, p, target_file_mb=128)
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    back = spark.read.parquet(p)
    assert back.count() == 4000
    assert back.agg(F.sum("id")).collect()[0][0] == 4000 * 3999 // 2


def test_compact_parquet_partitioned(spark, tmp_path):
    """partition_by compaction must DECREASE file count per directory:
    rows are routed on (partition cols + bounded salt), so each directory
    value collapses to ~bytes_v/target files — not n_files x n_values."""
    from goetl_spark.operators.maintenance import compact_parquet, dir_stats

    p = str(tmp_path / "fragp")
    # 5 partition values x 20 fragments = 100 tiny files
    spark.range(0, 5000).selectExpr("id", "id % 5 AS k")\
        .repartition(20).write.partitionBy("k").parquet(p)
    n0, _ = dir_stats(p)
    assert n0 == 100
    stats = compact_parquet(spark, p, target_file_mb=128, partition_by=["k"])
    # every value's bytes fit one target file -> exactly 1 file per directory
    assert stats["files_after"] == 5
    import os
    for k in range(5):
        files = [f for f in os.listdir(os.path.join(p, f"k={k}"))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(p)
    assert back.count() == 5000
    assert back.agg(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2


def test_compact_parquet_partitioned_null_values(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__ on disk) must
    survive compaction: the budget join is null-SAFE, and the pre-swap
    row-count gate would abort rather than lose them silently."""
    from goetl_spark.operators.maintenance import compact_parquet

    p = str(tmp_path / "fragnull")
    spark.range(0, 300).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id % 3 AS STRING) END AS k"
    ).repartition(10).write.partitionBy("k").parquet(p)
    before = spark.read.parquet(p)
    assert before.where("k IS NULL").count() == 100
    compact_parquet(spark, p, target_file_mb=128, partition_by=["k"])
    back = spark.read.parquet(p)
    assert back.count() == 300
    assert back.where("k IS NULL").count() == 100
    assert back.agg(F.sum("id")).collect()[0][0] == 300 * 299 // 2


def test_dedup_clusters_rejects_bad_max_iter(spark):
    from goetl_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    import pytest as _pt
    with _pt.raises(ValueError, match="max_iter"):
        dedup_clusters(pairs, max_iter=0)


def test_stream_scd2_maintains_dimension(spark, tmp_path):
    from goetl_spark.operators.scd import scd_type2
    from goetl_spark.streaming.warehouse import stream_scd2

    dim_path = str(tmp_path / "dim")
    empty = spark.createDataFrame(
        [], "id int, city string, effective_from string, "
            "effective_to string, is_current boolean")
    seed = spark.createDataFrame([(1, "paris"), (2, "rome")], "id int, city string")
    scd_type2(seed, empty, ["id"], ["city"], effective_date="2024-01-01")\
        .write.parquet(dim_path)

    # two chronological change batches: move customer 1, add customer 3
    src = tmp_path / "changes"
    src.mkdir()
    import shutil
    for i, batch in enumerate([[(1, "berlin"), (2, "rome")], [(3, "oslo")]]):
        staged = tmp_path / f"cs{i}"
        (spark.createDataFrame(batch, "id int, city string")
         .coalesce(1).write.parquet(str(staged)))
        dst = src / f"b{i}.parquet"
        shutil.copy(next(staged.glob("part-*.parquet")), dst)
        import os
        os.utime(dst, ((i + 1) * 1000, (i + 1) * 1000))

    stream = (spark.readStream.format("parquet")
              .schema("id int, city string")
              .option("maxFilesPerTrigger", 1).load(str(src)))
    q = stream_scd2(stream, dim_path, ["id"], ["city"],
                    checkpoint_dir=str(tmp_path / "ck"),
                    effective_date="2024-06-01")
    q.awaitTermination()

    dim = spark.read.parquet(dim_path)
    cur = {r.id: r.city for r in dim.filter("is_current").collect()}
    assert cur == {1: "berlin", 2: "rome", 3: "oslo"}
    hist = dim.filter("NOT is_current").collect()
    assert len(hist) == 1 and hist[0].id == 1 and hist[0].city == "paris"
    assert hist[0].effective_to == "2024-06-01"


def test_compact_incremental_only_hot_dirs(spark, tmp_path):
    """Only directories with enough small files are rewritten; healthy
    dirs keep byte-identical files (mtime included)."""
    import os

    from goetl_spark.operators.maintenance import compact_incremental

    p = str(tmp_path / "tbl")
    # k=0: fragmented (20 files); k=1: healthy (1 file); k=2: fragmented
    spark.range(0, 1000).selectExpr("id", "0 AS k")\
        .repartition(20).write.parquet(p + "/k=0")
    spark.range(1000, 2000).selectExpr("id", "1 AS k")\
        .coalesce(1).write.parquet(p + "/k=1")
    spark.range(2000, 3000).selectExpr("id", "2 AS k")\
        .repartition(10).write.parquet(p + "/k=2")

    def snap(d):
        return {f: os.stat(os.path.join(p, d, f)).st_mtime_ns
                for f in os.listdir(os.path.join(p, d))
                if f.endswith(".parquet")}

    healthy_before = snap("k=1")
    stats = compact_incremental(spark, p, target_file_mb=128,
                                small_file_mb=16, min_small_files=4)
    assert stats["compacted"] == ["k=0", "k=2"]
    assert stats["skipped"] == 1
    assert snap("k=1") == healthy_before          # untouched
    assert len(snap("k=0")) == 1 and len(snap("k=2")) == 1
    back = spark.read.parquet(p)                  # partition col intact
    assert back.count() == 3000
    assert back.agg(F.sum("id")).collect()[0][0] == 3000 * 2999 // 2
    assert back.select("k").distinct().count() == 3


def test_transform_with_state_matches_legacy(spark, tmp_path):
    """Spark 4 transformWithState variant emits the same final per-key
    stats as the applyInPandasWithState operator. Requires protobuf
    (the transformWithState worker's state-server protocol) — skipped
    where absent, same gating pattern as Mongo/Kafka."""
    import shutil

    import pytest as _pt
    _pt.importorskip("google.protobuf.descriptor")

    from goetl_spark.streaming.stateful import running_stats_tws

    chunk1 = [("a", 1.0), ("b", 2.0)]
    chunk2 = [("a", 5.0), ("a", 3.0), ("b", 7.0)]
    stream_dir = tmp_path / "tws"
    stream_dir.mkdir()
    for i, chunk in enumerate([chunk1, chunk2]):
        staged = tmp_path / f"twstage{i}"
        (spark.createDataFrame(chunk, "event_type string, value double")
         .coalesce(1).write.parquet(str(staged)))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"chunk{i}.parquet")
    stream = (spark.readStream.format("parquet")
              .schema("event_type string, value double")
              .option("maxFilesPerTrigger", 1).load(str(stream_dir)))
    updates = running_stats_tws(stream, "event_type", "value")
    q = (updates.writeStream.format("memory").queryName("tws_t")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM tws_t").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:
        if r.event_type not in final or r.n_events > final[r.event_type][0]:
            final[r.event_type] = (r.n_events, r.min_value, r.max_value)
    assert final == {"a": (3, 1.0, 5.0), "b": (2, 2.0, 7.0)}


def test_stream_dedup_ingest_and_idempotence(spark, tmp_path):
    """Cross-batch streaming dedup: later batches drop content already
    ingested, and a REPLAYED batch appends nothing (the exactly-once-on-
    content argument: the write is idempotent because each batch dedups
    against the output it may already have written)."""
    from pyspark.sql import Row

    from goetl_spark.streaming.sinks import stream_dedup_ingest
    from goetl_spark.streaming.sources import replay_stream_ordered

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"content {i % 4}") for i in range(8)])
    stream, _ = replay_stream_ordered(
        docs, "doc_id", num_chunks=2, dir=str(tmp_path / "replay"))
    out = str(tmp_path / "out")
    q = stream_dedup_ingest(stream, out, str(tmp_path / "ckpt"))
    try:
        q.awaitTermination()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    # 4 distinct contents, first occurrence (lowest id) kept
    assert {r.doc_id for r in got.collect()} == {0, 1, 2, 3}

    # replay a batch manually: everything already present -> no growth
    import goetl_spark.streaming.sinks as S
    before = got.count()
    from goetl_spark.operators.dedup import dedup_against
    replay = dedup_against(docs.limit(8), spark.read.parquet(out))
    assert replay.count() == 0
    replay.write.mode("append").parquet(out)
    assert spark.read.parquet(out).count() == before


def _wav_bytes(samples_16, rate=8000, n_ch=1, extra_chunk=True):
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples_16)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # real encoders add LIST/INFO chunks; parser must skip
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_extract_features_decodes_wav(spark):
    """audio/* with a RIFF magic goes through the REAL zero-dependency
    PCM parser: channels/rate from the fmt chunk (surfaced in the
    width/height slots), feature from widened amplitude bytes."""
    wav = _wav_bytes([-32768, 0, 32767, 0], rate=16000)
    df = spark.createDataFrame([Row(payload=bytearray(wav))],
                               "payload binary")
    media = attach_media_column(df, "payload", "audio/wav")
    r = extract_features(media, feature_dim=8).collect()[0]
    assert r.decode_ok and r.decoder == "wav"
    assert (r.width, r.height) == (1, 16000)   # (channels, sample_rate)
    import numpy as np
    # amplitudes widen to bytes 0, 128, 255, 128 → %8 buckets 0,0,7,0
    expect = np.array([3, 0, 0, 0, 0, 0, 0, 1]) / 4.0
    assert np.allclose(r.feature, expect)


def test_decode_wav_quarantines_bad_payloads():
    import struct

    from goetl_spark.operators.multimodal import _decode_wav

    # truncated: no data chunk survives
    wav = _wav_bytes([1, 2, 3])
    *_, dec = _decode_wav(wav[:20], 8)
    assert dec in ("wav-truncated", "wav-corrupt")
    # non-PCM (format tag 3 = float) quarantines as unsupported
    bad = wav.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    *_, dec = _decode_wav(bad, 8)
    assert dec == "wav-unsupported"
    # RIFF but not WAVE
    *_, dec = _decode_wav(b"RIFF\x04\x00\x00\x00AVI ", 8)
    assert dec == "wav-not-wave"


def test_resize_images_netpbm_roundtrip(spark):
    """Resize decodes, resamples, re-encodes: the output payload is valid
    netpbm at the target size, and downsampling by 2 keeps every other
    pixel (nearest-neighbor index map)."""
    from goetl_spark.operators.multimodal import (
        _parse_netpbm, resize_images)

    df = spark.createDataFrame([Row(payload=bytearray(_ppm_bytes()))],
                               "payload binary")
    media = attach_media_column(df, "payload", "image/x-portable-pixmap")
    r = resize_images(media, target_w=2, target_h=1).collect()[0]
    assert r.resize_ok and r.decoder == "netpbm"
    assert (r.width, r.height) == (2, 1)
    pixels, w, h, ch, err = _parse_netpbm(bytes(r.payload))
    assert err is None and (w, h, ch) == (2, 1, 3)
    # source is 4x2 with value (x+y)%8 per channel; NN picks row 0,
    # cols 0 and 2 → values 0 and 2
    assert list(pixels) == [0, 0, 0, 2, 2, 2]
    # corrupt payloads quarantine instead of raising
    bad = spark.createDataFrame([Row(payload=bytearray(b"P6\n4 2\n255\nxx"))],
                                "payload binary")
    r2 = resize_images(attach_media_column(bad, "payload", "image/x-p"),
                       2, 1).collect()[0]
    assert not r2.resize_ok and r2.decoder == "netpbm-truncated"


def test_checksum_catches_duplicate_plus_drop(spark):
    """The pre-swap gate's checksum half: duplicate one row, drop another
    — counts stay equal, content differs, checksums must differ."""
    from goetl_spark.operators.maintenance import _count_and_checksum

    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id long, v string")
    b = spark.createDataFrame([(1, "x"), (1, "x"), (3, "z")], "id long, v string")
    na, sa = _count_and_checksum(a)
    nb, sb = _count_and_checksum(b)
    assert na == nb == 3
    assert sa != sb


def test_compact_gate_aborts_on_routing_bug(spark, tmp_path, monkeypatch):
    """Inject a duplicate+drop routing bug into the staged write (k=1's
    file replaced by a copy of k=0's — equal row counts, different
    content). The bare count gate would pass; the checksum gate must
    abort with the original directory untouched (round-5 verdict #4)."""
    import os
    import shutil

    import pyspark.sql.readwriter as rw
    from goetl_spark.operators.maintenance import compact_parquet

    p = str(tmp_path / "fraggate")
    spark.range(0, 300).selectExpr("id", "id % 3 AS k") \
        .repartition(10).write.partitionBy("k").parquet(p)
    orig_sum = spark.read.parquet(p).agg(F.sum("id")).collect()[0][0]

    orig_parquet = rw.DataFrameWriter.parquet

    def corrupting(self, path, **kw):
        orig_parquet(self, path, **kw)
        if path.endswith(".__compact_tmp__"):
            d0, d1 = os.path.join(path, "k=0"), os.path.join(path, "k=1")
            f0 = [f for f in os.listdir(d0) if f.endswith(".parquet")][0]
            f1 = [f for f in os.listdir(d1) if f.endswith(".parquet")][0]
            os.remove(os.path.join(d1, f1))
            shutil.copy(os.path.join(d0, f0),
                        os.path.join(d1, "part-corrupt.parquet"))

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", corrupting)
    import pytest as _pt
    with _pt.raises(RuntimeError, match="checksum"):
        compact_parquet(spark, p, target_file_mb=128, partition_by=["k"])
    monkeypatch.setattr(rw.DataFrameWriter, "parquet", orig_parquet)
    back = spark.read.parquet(p)
    assert back.count() == 300
    assert back.agg(F.sum("id")).collect()[0][0] == orig_sum


def test_audio_frame_energy_rms_and_quarantine(spark):
    from goetl_spark.operators.multimodal import (
        attach_media_column, audio_frame_energy)

    # 8000 Hz mono: 400 samples at half amplitude then 400 at silence
    # -> 50 ms frames of 400 samples: rms [0.5, 0.0]
    loud = [16384, -16384] * 200
    samples = loud + [0] * 400
    wav = _wav_bytes(samples, rate=8000)
    rows = [Row(doc_id=1, payload=bytearray(wav), mime="audio/wav"),
            Row(doc_id=2, payload=bytearray(b"RIFFxxxxJUNK"),
                mime="audio/wav"),
            Row(doc_id=3, payload=bytearray(b"not audio"),
                mime="image/png")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, mime string")
    media = attach_media_column(df, "payload", F.col("mime"),
                                id_col="doc_id")
    out = audio_frame_energy(media, frame_ms=50).collect()
    frames = sorted([r for r in out if r.media_id == 1],
                    key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in frames] == [0, 1]
    assert frames[0].rms == pytest.approx(0.5, abs=1e-3)
    assert frames[1].rms == pytest.approx(0.0, abs=1e-9)
    assert frames[0].n_samples == 400 and frames[0].start_ms == 0
    assert frames[1].start_ms == 50
    quarantined = [r for r in out if r.media_id == 2]
    assert len(quarantined) == 1 and quarantined[0].status == "quarantined"
    assert all(r.media_id != 3 for r in out)  # non-audio skipped


def test_audio_frame_energy_ragged_tail_and_stereo(spark):
    from goetl_spark.operators.multimodal import (
        attach_media_column, audio_frame_energy)

    # stereo: L = +0.5, R = -0.5 -> mono mixdown 0 -> rms 0;
    # 300 samples/channel at 8000 Hz with 50 ms frames (400): one ragged
    # 300-sample frame
    inter = [16384, -16384] * 300  # L R L R ...
    wav = _wav_bytes(inter, rate=8000, n_ch=2)
    df = spark.createDataFrame(
        [Row(doc_id=7, payload=bytearray(wav), mime="audio/wav")],
        "doc_id long, payload binary, mime string")
    media = attach_media_column(df, "payload", F.col("mime"),
                                id_col="doc_id")
    out = audio_frame_energy(media, frame_ms=50).collect()
    assert len(out) == 1
    assert out[0].n_samples == 300          # ragged tail frame
    assert out[0].rms == pytest.approx(0.0, abs=1e-9)


def test_compact_crash_between_renames_repaired(spark, tmp_path):
    # r14 (fs.py consolidation): a crash between the two swap renames
    # leaves the live dir absent and .__compact_old__ present; both
    # compaction entries must self-repair instead of reading a missing
    # table or walking the backup as data
    import os

    from goetl_spark.operators.maintenance import (compact_incremental,
                                                   compact_parquet)

    # compact_parquet path-level repair
    p = str(tmp_path / "t1")
    spark.range(0, 100, 1, 4).write.parquet(p)
    rows_before = spark.read.parquet(p).count()
    os.rename(p, p + ".__compact_old__")  # simulated crash window
    stats = compact_parquet(spark, p, target_file_mb=1)
    assert spark.read.parquet(p).count() == rows_before
    assert stats["files_before"] > 0

    # compact_incremental leaf-level repair: the backup must be
    # restored, not compacted as its own leaf
    root = str(tmp_path / "t2")
    spark.range(0, 50, 1, 2).selectExpr("id", "id % 2 AS part") \
        .write.partitionBy("part").parquet(root)
    leaf = os.path.join(root, "part=0")
    os.rename(leaf, leaf + ".__compact_old__")
    out = compact_incremental(spark, root, small_file_mb=1,
                              min_small_files=999)  # no rewrites, repair only
    assert os.path.isdir(leaf)
    assert not os.path.isdir(leaf + ".__compact_old__")
    assert spark.read.parquet(root).count() == 50
    assert out["compacted"] == []
