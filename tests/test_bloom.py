"""Round-7 bloom additions (operators/bloom.py): standing index +
exact semi-/anti-join compositions over the round-3 JVM primitives.
(bloom_prune / bloom_build / bloom_might_contain keep their original
coverage in test_operators.py — untouched.)

Contracts under test:
* composite-key build has no false negatives; measured FPP is within a
  small multiple of the sized rate;
* bloom_semi_join == plain left-semi join EXACTLY on real sf0.001
  tables, and on composite/NULL-bearing keys;
* bloom_anti_join == plain left-anti join EXACTLY, including under a
  forced-high-FP config (fpp=0.5) and with materialize on;
* build is partitioning-invariant (bit_or is order-insensitive);
* index write/read round-trips; mismatched key_cols or corrupt bytes
  raise instead of mis-probing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.bloom import (
    _with_bloom_flag,
    bloom_anti_join,
    bloom_build_keys,
    bloom_index_read,
    bloom_index_write,
    bloom_params,
    bloom_semi_join,
)


def test_no_false_negatives_and_fpp_composite(spark):
    members = (spark.range(0, 2000)
               .select(F.col("id").alias("k1"),
                       (F.col("id") % 7).cast("string").alias("k2"))
               .repartition(7))
    bits, k = bloom_params(2000, 0.01)
    packed = bloom_build_keys(members, ["k1", "k2"], bits, k)
    assert len(packed) == bits // 64

    probe = (spark.range(0, 10000)
             .select(F.col("id").alias("k1"),
                     (F.col("id") % 7).cast("string").alias("k2")))
    flagged = _with_bloom_flag(probe, packed, k, ["k1", "k2"], "hit")
    hits = {r["k1"] for r in flagged.filter("hit").collect()}
    assert set(range(2000)) <= hits  # zero false negatives
    fp = len(hits - set(range(2000))) / 8000
    assert fp < 0.05  # sized for 1%; generous bound keeps this unflaky


def test_build_partitioning_invariant(spark):
    rows = spark.range(0, 500).withColumnRenamed("id", "k")
    a = bloom_build_keys(rows.repartition(1), ["k"], 1 << 14, 4)
    b = bloom_build_keys(rows.repartition(13), ["k"], 1 << 14, 4)
    assert a == b


def test_bloom_semi_join_exact_tpch(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT") \
        .withColumn("l_orderkey", F.col("o_orderkey"))
    got = bloom_semi_join(li, od, ["l_orderkey"]) \
        .select("l_orderkey", "l_linenumber").collect()
    want = li.join(od.select("l_orderkey").distinct(), "l_orderkey", "left_semi") \
        .select("l_orderkey", "l_linenumber").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_semi_join_composite_and_null_keys(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "a", 12), (None, "a", 13),
         (3, None, 14), (2, "b", 15)],
        "k1 int, k2 string, v int")
    ref = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "a"), (3, None)], "k1 int, k2 string")
    got = {r["v"] for r in bloom_semi_join(big, ref, ["k1", "k2"]).collect()}
    want = {r["v"] for r in
            big.join(ref, ["k1", "k2"], "left_semi").collect()}
    assert got == want  # ANSI NULL-key semantics preserved by the exact stage
    assert 13 not in got and 14 not in got


def test_bloom_anti_join_exact_tpch(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT") \
        .withColumn("l_orderkey", F.col("o_orderkey"))
    # fpp=0.5 forces plenty of false positives through the hit branch —
    # equivalence must hold regardless
    got = bloom_anti_join(li, od, ["l_orderkey"], fpp=0.5) \
        .select("l_orderkey", "l_linenumber").collect()
    want = li.join(od.select("l_orderkey").distinct(), "l_orderkey", "left_anti") \
        .select("l_orderkey", "l_linenumber").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_anti_join_null_keys_kept_and_materialize(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11), (None, "a", 12), (3, None, 13),
         (4, "c", 14)],
        "k1 int, k2 string, v int")
    ref = spark.createDataFrame(
        [(1, "a"), (None, "a"), (3, None)], "k1 int, k2 string")
    want = {r["v"] for r in big.join(ref, ["k1", "k2"], "left_anti").collect()}
    for mat in (False, True):
        got = {r["v"] for r in
               bloom_anti_join(big, ref, ["k1", "k2"],
                               materialize=mat).collect()}
        assert got == want
    assert {12, 13} <= want  # ANSI: NULL-keyed big rows survive anti-join


def test_bloom_adversarial_string_keys(spark):
    keys = ["", " ", "\x1f", "a\x1fb", "a|b", "héllo", "🙂🙂",
            "line\nbreak", "tab\there", "0", "00", "NULL", "None"]
    big = spark.createDataFrame([(k, i) for i, k in enumerate(keys)]
                                + [(k + "x", 100 + i) for i, k in enumerate(keys)],
                                "k string, v int")
    ref = spark.createDataFrame([(k,) for k in keys[::2]], "k string")
    got = {r["v"] for r in bloom_semi_join(big, ref, ["k"]).collect()}
    want = {r["v"] for r in big.join(ref, ["k"], "left_semi").collect()}
    assert got == want


def test_bloom_index_roundtrip_and_guards(spark, tmp_path):
    members = spark.range(0, 300).withColumnRenamed("id", "k")
    packed = bloom_build_keys(members, ["k"], 1 << 13, 4)
    path = str(tmp_path / "bloom_idx")
    bloom_index_write(packed, path, ["k"], 4)

    loaded, cols, k = bloom_index_read(path, ["k"])
    assert loaded == packed and cols == ["k"] and k == 4
    flagged = _with_bloom_flag(members, loaded, k, cols, "hit")
    assert flagged.filter("NOT hit").count() == 0

    with pytest.raises(ValueError):
        bloom_index_read(path, ["other_col"])
    # corrupt bytes on disk must raise, not mis-probe
    with open(f"{path}/bloom.bin", "ab") as f:
        f.write(b"\x00" * 8)
    with pytest.raises(ValueError):
        bloom_index_read(path)


def test_build_keys_rejects_unaligned_bits(spark):
    rows = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        bloom_build_keys(rows, ["k"], 1000, 3)  # not a multiple of 64


# --- fuzzed equivalence vs plain semi/anti joins (Spark-backed, capped) ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.one_of(st.none(), st.integers(min_value=-5, max_value=15))
_tag = st.one_of(st.none(), st.sampled_from(["a", "b", ""]))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_key, _tag), min_size=1, max_size=15),
       st.lists(st.tuples(_key, _tag), min_size=1, max_size=10),
       st.sampled_from([0.01, 0.5]))
def test_bloom_joins_fuzz_vs_plain(spark, big_rows, ref_rows, fpp):
    from goetl_spark.operators.bloom import bloom_anti_join

    big = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(big_rows)],
        "v int, k1 int, k2 string")
    ref = spark.createDataFrame(ref_rows, "k1 int, k2 string")
    semi = {r["v"] for r in
            bloom_semi_join(big, ref, ["k1", "k2"], fpp=fpp).collect()}
    anti = {r["v"] for r in
            bloom_anti_join(big, ref, ["k1", "k2"], fpp=fpp).collect()}
    want_semi = {r["v"] for r in big.join(ref, ["k1", "k2"],
                                          "left_semi").collect()}
    assert semi == want_semi
    assert anti == set(range(len(big_rows))) - want_semi  # exact partition


def test_bloom_probe_in_structured_streaming(spark, tmp_path):
    """SCALING's claim that the bloom probe is a pure Column expression
    usable inside readStream: a file stream of keys filtered by
    bloom_might_contain (inline-words probe — the right variant for a
    streaming micro-batch: no join in the plan) keeps every true
    member across micro-batches, with FPP-bounded overshoot."""
    import os
    import shutil

    from goetl_spark.operators.bloom import bloom_build, bloom_might_contain

    members = spark.range(0, 300).withColumnRenamed("id", "k")
    packed = bloom_build(members, "k", 1 << 13, 4)

    stream_dir = tmp_path / "instream"
    stream_dir.mkdir()
    for i, lo in enumerate((0, 400)):  # batch1 members, batch2 mixed
        staged = tmp_path / f"st{i}"
        rows = list(range(lo, lo + 200)) if lo else list(range(0, 200))
        spark.createDataFrame([(v,) for v in rows], "k long") \
            .coalesce(1).write.parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        dst = stream_dir / f"c{i:03d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, ((i + 1) * 1000, (i + 1) * 1000))

    stream = (spark.readStream.format("parquet").schema("k long")
              .option("maxFilesPerTrigger", 1).load(str(stream_dir)))
    flagged = stream.filter(
        bloom_might_contain(packed, 1 << 13, 4, F.col("k")))
    q = (flagged.writeStream.format("memory").queryName("bloom_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["k"] for r in spark.sql("SELECT k FROM bloom_stream").collect()}
    assert set(range(0, 200)) <= got          # no false negatives
    fp = len(got - set(range(0, 300)))
    assert fp <= 20                            # 200 non-members probed


def test_stream_bloom_cut_exact_and_idempotent(spark, tmp_path):
    """streaming/sinks.py::stream_bloom_cut — the streaming twin of
    bloom_anti_join: result == stream minus blocklist EXACTLY even
    under a forced-high-FP config (the exact anti-join on the hit
    sliver owns correctness; the bloom only routes), NULL-keyed rows
    are kept, and re-running a batch overwrites its own batch=<id>
    directory instead of appending duplicates."""
    from goetl_spark.streaming.sinks import stream_bloom_cut
    from goetl_spark.streaming.sources import replay_stream_ordered

    feed = (spark.range(0, 600)
            .select(F.col("id").alias("k"),
                    (F.col("id") * 2).alias("v")))
    feed = feed.unionByName(
        spark.createDataFrame([(None, -1), (None, -2)], "k long, v long"))
    blocklist = (spark.range(0, 600).filter(F.col("id") % 3 == 0)
                 .select(F.col("id").alias("k")))

    stream, _ = replay_stream_ordered(
        feed.filter(F.col("k").isNotNull()), "k", num_chunks=3,
        dir=str(tmp_path / "replay"))
    # NULL keys can't ride the ordered replay (range-chunked on k);
    # prove NULL retention on a single-file stream instead
    out1 = str(tmp_path / "out1")
    q = stream_bloom_cut(stream, blocklist, ["k"], out1,
                         str(tmp_path / "ck1"), fpp=0.5)
    q.awaitTermination(120)
    got = spark.read.parquet(out1)
    expect = {(i, 2 * i) for i in range(600) if i % 3 != 0}
    assert {(r["k"], r["v"]) for r in got.collect()} == expect
    # 3 chunks -> batch dirs 0..2, each written exactly once
    assert got.select("batch").distinct().count() == 3

    # NULL-keyed rows kept (ANSI left-anti semantics)
    null_dir = tmp_path / "nullstream"
    null_dir.mkdir()
    feed.filter(F.col("k").isNull()).coalesce(1).write.mode(
        "overwrite").parquet(str(tmp_path / "nullstage"))
    import shutil
    src = next((tmp_path / "nullstage").glob("part-*.parquet"))
    shutil.copy(src, null_dir / "c0.parquet")
    nstream = (spark.readStream.format("parquet")
               .schema("k long, v long").load(str(null_dir)))
    out2 = str(tmp_path / "out2")
    q2 = stream_bloom_cut(nstream, blocklist, ["k"], out2,
                          str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    kept = spark.read.parquet(out2)
    assert sorted(r["v"] for r in kept.collect()) == [-2, -1]
    assert all(r["k"] is None for r in kept.collect())

    # idempotence: replaying batch 0's write converges byte-identically
    from goetl_spark.operators.bloom import (
        _with_bloom_flag, bloom_build_keys, bloom_params)
    before = {(r["k"], r["v"])
              for r in spark.read.parquet(out1 + "/batch=0").collect()}
    ref_keys = blocklist.select("k").distinct().localCheckpoint(eager=True)
    bits, h = bloom_params(ref_keys.count(), 0.5)
    packed = bloom_build_keys(ref_keys, ["k"], bits, h)
    # localCheckpoint: the re-write targets the path being read, so the
    # batch must be materialized first (the real replay reads from the
    # stream source, not the output)
    batch0 = (spark.read.parquet(out1 + "/batch=0").select("k", "v")
              .localCheckpoint(eager=True))
    flagged = _with_bloom_flag(batch0, packed, h, ["k"], "__bloom_hit")
    redo = (flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
            .unionByName(flagged.filter(F.col("__bloom_hit"))
                         .drop("__bloom_hit")
                         .join(ref_keys, "k", "left_anti")))
    redo.write.mode("overwrite").parquet(out1 + "/batch=0")
    after = {(r["k"], r["v"])
             for r in spark.read.parquet(out1 + "/batch=0").collect()}
    assert after == before


def test_bloom_rebuild_no_stale_manifest_and_sessionless_read(
        spark, tmp_path, monkeypatch):
    """r17 self-review pair: (a) a rebuild with a session active must
    not leave a stale pre-r17 local manifest behind (the sessionless
    fallback reader would trust it — with matching num_bits it passes
    every check and probes the new words under the old keys); (b) a
    session-written index must be readable by the documented
    sessionless branch; (c) the rebuild is invalidate-first /
    commit-last: a crash between the words and the manifest leaves a
    LOUDLY manifest-less index, never a readable old config over new
    words."""
    import json as _json
    import os

    from pyspark.sql import SparkSession

    from goetl_spark.operators.bloom import (
        bloom_build_keys, bloom_index_read, bloom_index_write,
        bloom_params)

    path = str(tmp_path / "bidx")
    bits, hashes = bloom_params(100, fpp=0.01)
    packed_a = bloom_build_keys(
        spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string"),
        ["k"], bits, hashes)
    # plant a pre-r17 legacy manifest describing DIFFERENT keys with
    # the same geometry, then rebuild with the session active
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_bloom_meta.json", "w") as f:
        _json.dump({"num_bits": bits, "num_hashes": hashes,
                    "key_cols": ["old_col"], "h2_salt": 0}, f)
    bloom_index_write(packed_a, path, ["k"], hashes)
    assert not os.path.exists(f"{path}/_bloom_meta.json")  # (a)

    # (b) sessionless read of the session-written index
    monkeypatch.setattr(SparkSession, "getActiveSession",
                        staticmethod(lambda: None))
    loaded, cols, k = bloom_index_read(path, ["k"])
    monkeypatch.undo()
    assert loaded == packed_a and cols == ["k"] and k == hashes

    # (c) crash the rebuild between words and manifest
    import goetl_spark.operators.index_meta as im

    def boom(*a, **kw):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(im, "meta_write", boom)
    with pytest.raises(RuntimeError, match="injected"):
        bloom_index_write(packed_a, path, ["k"], hashes)
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError, match="manifest"):
        bloom_index_read(path, ["k"])
    # a completed rebuild recovers
    bloom_index_write(packed_a, path, ["k"], hashes)
    assert bloom_index_read(path, ["k"])[0] == packed_a
