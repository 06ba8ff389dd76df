"""Streaming Misra–Gries heavy hitters (streaming/stateful.py::
heavy_hitters_stream): exact when k covers the distinct items, the
classic frequency guarantee when it doesn't, deterministic across
replays."""
from __future__ import annotations

import shutil

from goetl_spark.streaming.stateful import heavy_hitters_stream


def _feed(spark, tmp_path, chunks, schema):
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i, chunk in enumerate(chunks):
        staged = tmp_path / f"stage{i}"
        (spark.createDataFrame(chunk, schema)
         .coalesce(1).write.parquet(str(staged)))
        part = next(staged.glob("part-*.parquet"))
        dst = stream_dir / f"chunk{i:03d}.parquet"
        shutil.copy(part, dst)
        import os
        os.utime(dst, ((i + 1) * 1000, (i + 1) * 1000))
    return (spark.readStream.format("parquet")
            .schema(schema).option("maxFilesPerTrigger", 1)
            .load(str(stream_dir)))


def _run(spark, stream, name, **kw):
    out = heavy_hitters_stream(stream, "item", "grp", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        return spark.sql(
            f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def _final_summary(rows):
    """update-mode emits one summary per (group, batch); keep the rows
    of the LAST batch per group = max n_total."""
    latest = {}
    for r in rows:
        latest.setdefault(r.grp, []).append(r)
    out = {}
    for g, rs in latest.items():
        n_max = max(r.n_total for r in rs)
        out[g] = {r.item: r.est_count for r in rs if r.n_total == n_max}
    return out


def test_exact_when_k_covers_distinct_items(spark, tmp_path):
    schema = "grp string, item string"
    chunk1 = [("a", "x")] * 5 + [("a", "y")] * 3 + [("b", "q")] * 2
    chunk2 = [("a", "x")] * 2 + [("a", "z")] * 1 + [("b", "q")] * 4
    stream = _feed(spark, tmp_path, [chunk1, chunk2], schema)
    rows = _run(spark, stream, "hh_exact", k=10)
    s = _final_summary(rows)
    # cross-batch accumulation, exact counts (k=10 > 3 distinct)
    assert s["a"] == {"x": 7, "y": 3, "z": 1}
    assert s["b"] == {"q": 6}


def test_guarantee_with_tiny_k(spark, tmp_path):
    schema = "grp string, item string"
    # 40 'hot' + 30 tail singletons-ish: true freq of hot = 40/76 > n/(k+1)
    chunk = ([("g", "hot")] * 40
             + [("g", f"t{i % 6}") for i in range(30)]
             + [("g", "warm")] * 6)
    stream = _feed(spark, tmp_path, [chunk], schema)
    rows = _run(spark, stream, "hh_tiny", k=3)
    s = _final_summary(rows)["g"]
    n = 76
    assert "hot" in s                      # count 40 > 76/4 = 19 → kept
    assert s["hot"] <= 40                  # MG never overcounts
    assert 40 - s["hot"] <= n // 4 + 1     # undercount ≤ n/(k+1)
    assert len(s) <= 3                     # bounded state


def test_deterministic_across_replays(spark, tmp_path):
    schema = "grp string, item string"
    chunk1 = [("g", c) for c in "aabbccddeeffgghh"]
    chunk2 = [("g", c) for c in "aaabchzzz"]
    d1 = tmp_path / "r1"
    d1.mkdir()
    s1 = _feed(spark, d1, [chunk1, chunk2], schema)
    r1 = _final_summary(_run(spark, s1, "hh_r1", k=4))
    d2 = tmp_path / "r2"
    d2.mkdir()
    s2 = _feed(spark, d2, [chunk1, chunk2], schema)
    r2 = _final_summary(_run(spark, s2, "hh_r2", k=4))
    assert r1 == r2


def test_k_validation(spark):
    import pytest

    df = spark.readStream.format("rate").load() \
        .selectExpr("'g' AS grp", "CAST(value AS STRING) AS item")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters_stream(df, "item", "grp", k=0)
