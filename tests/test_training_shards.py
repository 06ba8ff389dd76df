"""write_training_shards (sinks/files.py): the webdataset-style
final-mile contract — equal(±1) contiguous shards of an
epoch-deterministic permutation, one file per shard, in-file rank
order."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from goetl_spark.sinks.files import write_training_shards


def _read_assignments(spark, path):
    return {
        (r["doc_id"]): (r["shard"], r["rank"])
        for r in spark.read.parquet(path).select("doc_id", "shard", "rank")
        .collect()
    }


def test_shard_sizes_and_determinism(spark, tmp_path):
    df = spark.range(0, 1003).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("d"), F.col("doc_id")))
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")

    meta = write_training_shards(df, p1, n_shards=7, key_col="doc_id")
    assert meta == {"total_rows": 1003, "n_shards": 7, "epoch": 0}

    out = spark.read.parquet(p1)
    sizes = {r["shard"]: r["c"] for r in
             out.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 1003

    # contiguous blocks: shard of a rank is a non-decreasing step fn
    pairs = out.select("rank", "shard").collect()
    assert all(r["shard"] == (r["rank"] - 1) * 7 // 1003 for r in pairs)

    # byte-for-byte deterministic across runs
    write_training_shards(df, p2, n_shards=7, key_col="doc_id")
    assert _read_assignments(spark, p1) == _read_assignments(spark, p2)


def test_one_file_per_shard_in_rank_order(spark, tmp_path):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=4, key_col="doc_id")
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
        assert len(files) == 1, f"{d}: expected one file"
        ranks = pq.read_table(files[0], columns=["rank"])["rank"].to_pylist()
        assert ranks == sorted(ranks), f"{d}: not in rank order"


def test_epochs_permute_differently_but_reproducibly(spark, tmp_path):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    p0, p1 = str(tmp_path / "e0"), str(tmp_path / "e1")
    write_training_shards(df, p0, n_shards=3, key_col="doc_id", epoch=0)
    write_training_shards(df, p1, n_shards=3, key_col="doc_id", epoch=1)
    a0, a1 = _read_assignments(spark, p0), _read_assignments(spark, p1)
    assert set(a0) == set(a1)            # same docs, every epoch
    assert a0 != a1                      # different permutation


def test_validation(spark, tmp_path):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        write_training_shards(df, str(tmp_path / "x"), 0, "doc_id")


def test_duplicate_keys_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,), (2,)], "doc_id int")
    with pytest.raises(ValueError, match="duplicate"):
        write_training_shards(df, str(tmp_path / "d"), 2, "doc_id")


def test_check_unique_opt_out(spark, tmp_path):
    """check_unique=False skips the guard; duplicate keys then co-locate
    (same md5 → adjacent ranks) and the write still succeeds."""
    df = spark.createDataFrame([(1,), (2,), (2,), (3,)], "doc_id int")
    meta = write_training_shards(df, str(tmp_path / "nu"), 2, "doc_id",
                                 check_unique=False)
    assert meta["total_rows"] == 4
