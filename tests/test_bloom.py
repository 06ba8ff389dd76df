"""Bloom prefilter / bloom semi-join (operators/bloom.py).

Contracts under test:
* no false negatives — every true member probes True (the superset
  guarantee the 100 TB pre-shuffle cut relies on);
* measured false-positive rate is within a small multiple of the sized
  FPP;
* bloom_semi_join == plain left-semi join EXACTLY (incl. composite and
  NULL-bearing keys) on real sf0.001 tables;
* build is per-partition OR-merge — result is independent of the
  input's partitioning;
* sizing/validation errors raise instead of mis-probing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_prefilter,
    bloom_semi_join,
)

SF = "/root/testdata/sf0.001"


def test_bloom_params_sizing():
    bits, k = bloom_params(1000, 0.01)
    assert bits >= 8 * 1000  # ~9.6 bits/key at 1%
    assert bits & (bits - 1) == 0
    assert 1 <= k <= 16
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_fpp(spark):
    members = spark.range(0, 2000).withColumnRenamed("id", "k").repartition(7)
    bits, k = bloom_params(2000, 0.01)
    filt = bloom_build(members, ["k"], bits, k)
    assert len(filt) == bits // 8

    flagged = bloom_might_contain(
        spark.range(0, 10000).withColumnRenamed("id", "k"), ["k"], filt, k)
    hits = {r["k"] for r in flagged.filter("might_contain").collect()}
    assert set(range(2000)) <= hits  # zero false negatives
    fp = len(hits - set(range(2000))) / 8000
    assert fp < 0.05  # sized for 1%; generous bound keeps this unflaky


def test_build_partitioning_invariant(spark):
    rows = spark.range(0, 500).withColumnRenamed("id", "k")
    a = bloom_build(rows.repartition(1), ["k"], 1 << 14, 4)
    b = bloom_build(rows.repartition(13), ["k"], 1 << 14, 4)
    assert a == b


def test_prefilter_superset_of_semi_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_orderkey").alias("l_orderkey"))
    exact = {r["l_orderkey"] for r in
             li.join(od, "l_orderkey", "left_semi").select("l_orderkey").collect()}
    filt = bloom_build(od, ["l_orderkey"], 1 << 16, 5)
    pre = {r["l_orderkey"] for r in
           bloom_prefilter(li, ["l_orderkey"], filt, 5)
           .select("l_orderkey").collect()}
    assert exact <= pre


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


def test_validation_errors(spark):
    rows = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        bloom_build(rows, ["k"], num_bits=100)  # not a power of two
    with pytest.raises(ValueError):
        bloom_build(rows, ["k"], num_bits=1 << 12, num_hashes=0)
    with pytest.raises(ValueError):
        bloom_might_contain(rows, ["k"], b"abc", 3)  # 24 bits: not 2^n


def test_bloom_anti_join_exact_tpch(spark, sf_dir):
    from goetl_spark.operators.bloom import bloom_anti_join

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
    from goetl_spark.operators.bloom import bloom_anti_join

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
    from goetl_spark.operators.bloom import bloom_semi_join

    keys = ["", " ", "\x1f", "a\x1fb", "a|b", "héllo", "🙂🙂",
            "line\nbreak", "tab\there", "0", "00", "NULL", "None"]
    big = spark.createDataFrame([(k, i) for i, k in enumerate(keys)]
                                + [(k + "x", 100 + i) for i, k in enumerate(keys)],
                                "k string, v int")
    ref = spark.createDataFrame([(k,) for k in keys[::2]], "k string")
    got = {r["v"] for r in bloom_semi_join(big, ref, ["k"]).collect()}
    want = {r["v"] for r in big.join(ref, ["k"], "left_semi").collect()}
    assert got == want
