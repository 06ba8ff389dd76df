"""Weighted systematic sampling, per-group winsorize, cluster inertia."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.functions.transforms import standardize, winsorize_by_group
from goetl_spark.operators.sampling import weighted_systematic_sample
from goetl_spark.operators.similarity import cluster_inertia


def test_weighted_sample_crossing_semantics(spark):
    # weights 5,3,4,10,2 step 7: intervals [0,5) [5,8) [8,12) [12,22) [22,24)
    # multiples of 7 at 7,14,21 -> rows 2 (covers 7), 4 (covers 14 and 21)
    rows = [(1, 5), (2, 3), (3, 4), (4, 10), (5, 2)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = sorted(r.id for r in
                 weighted_systematic_sample(df, "w", 7, ["id"]).collect())
    assert out == [2, 4]


def test_weighted_sample_partitioning_independent(spark):
    rows = [(i, (i * 13) % 50 + 1) for i in range(500)]
    a = spark.createDataFrame(rows, "id long, w long").repartition(1)
    b = spark.createDataFrame(rows, "id long, w long").repartition(17)
    sa = sorted(r.id for r in
                weighted_systematic_sample(a, "w", 100, ["id"],
                                           num_partitions=3).collect())
    sb = sorted(r.id for r in
                weighted_systematic_sample(b, "w", 100, ["id"],
                                           num_partitions=11).collect())
    assert sa == sb and len(sa) > 0
    # expected size ~ total/step
    total = sum(w for _, w in rows)
    assert abs(len(sa) - total / 100) <= 2


def test_weighted_sample_heavy_rows_always_kept(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 250), (3, 3), (4, 250)], "id long, w long")
    kept = {r.id for r in
            weighted_systematic_sample(df, "w", 100, ["id"]).collect()}
    assert {2, 4} <= kept  # weight >= step guarantees selection


def test_winsorize_by_group_uses_group_thresholds(spark):
    # group a: 1..100 ; group b: 1001..1100 — global clipping would
    # flatten all of a; per-group must clip within each range
    rows = [("a", float(v)) for v in range(1, 101)] + \
           [("b", float(v)) for v in range(1001, 1101)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorize_by_group(df, "x", ["g"], 0.05, 0.95, out_col="v")
    stats = {r.g: r for r in
             out.groupBy("g").agg(F.min("v").alias("lo"),
                                  F.max("v").alias("hi")).collect()}
    assert 5.0 <= stats["a"].lo <= 7.0 and 94.0 <= stats["a"].hi <= 96.0
    assert 1005.0 <= stats["b"].lo <= 1007.0
    assert 1094.0 <= stats["b"].hi <= 1096.0


def test_winsorize_by_group_tdigest_close_to_exact(spark):
    rows = [("a", float(v)) for v in range(1, 1001)]
    df = spark.createDataFrame(rows, "g string, x double")
    exact = winsorize_by_group(df, "x", ["g"], 0.1, 0.9, out_col="v")
    td = winsorize_by_group(df, "x", ["g"], 0.1, 0.9, out_col="v",
                            method="tdigest")
    e = exact.agg(F.min("v"), F.max("v")).collect()[0]
    t = td.agg(F.min("v"), F.max("v")).collect()[0]
    assert t[0] == pytest.approx(e[0], rel=0.05)
    assert t[1] == pytest.approx(e[1], rel=0.05)


def test_cluster_inertia_hand_computed(spark):
    # label 0: vectors (0,0) (2,0) (0,2) -> centroid (2/3, 2/3)
    # inertia = sum dims [sum x^2 - (sum x)^2/n] = (4 - 4/3) + (4 - 4/3)
    rows = [Row(label=0, embedding=[0.0, 0.0]),
            Row(label=0, embedding=[2.0, 0.0]),
            Row(label=0, embedding=[0.0, 2.0]),
            Row(label=1, embedding=[5.0, 5.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r.label: r for r in cluster_inertia(df).collect()}
    assert out[0].n_vectors == 3 and out[0].n_dims == 2
    assert out[0].inertia == pytest.approx(2 * (4 - 4 / 3), abs=1e-6)
    assert out[1].inertia == 0.0


def test_standardize_null_values_use_nonnull_count(spark):
    # mean/std must divide by the NON-NULL count: values 1,3 (+2 nulls)
    rows = [Row(x=1.0), Row(x=3.0), Row(x=None), Row(x=None)]
    df = spark.createDataFrame(rows, "x double")
    out = {r.x: r.x_z for r in
           standardize(df, ["x"], second_moment_scale=6).collect()}
    assert out[1.0] == pytest.approx(-1.0)  # mean 2, std 1 (NOT mean 1, n=4)
    assert out[3.0] == pytest.approx(1.0)
    assert out[None] is None


def test_cooccurrence_null_basket_dropped(spark):
    from goetl_spark.operators.mining import cooccurrence_pairs
    rows = [(None, "a"), (None, "b"), (1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = cooccurrence_pairs(df, "b", "i").collect()
    # NULL baskets must not form a pseudo-basket (SQL joins drop them)
    assert len(out) == 1 and out[0].n_baskets == 1


def test_token_kl_null_slice_counts_as_q(spark):
    from goetl_spark.operators.lm import token_kl_divergence
    rows = [Row(doc_id=0, text="x", lang="en"),
            Row(doc_id=1, text="x", lang=None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = token_kl_divergence(df, F.col("lang") == "en").collect()[0]
    # NULL lang falls to the ELSE (Q) side, like a SQL CASE
    assert r.n_tokens_p == 1 and r.n_tokens_q == 1


def test_standardize_null_group_rows_kept(spark):
    rows = [Row(g="a", x=1.0), Row(g="a", x=3.0),
            Row(g=None, x=10.0), Row(g=None, x=30.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = standardize(df, ["x"], group_cols=["g"],
                      second_moment_scale=6).collect()
    assert len(out) == 4  # NULL-group rows must NOT be dropped
    nulls = {r.x: r.x_z for r in out if r.g is None}
    assert nulls[10.0] == pytest.approx(-1.0)  # mean 20, std 10
    assert nulls[30.0] == pytest.approx(1.0)


def test_winsorize_by_group_null_group_rows_kept(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + \
           [(None, float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorize_by_group(df, "x", ["g"], 0.05, 0.95, out_col="v")
    assert out.count() == 200
    null_rows = out.filter(F.col("g").isNull())
    assert null_rows.count() == 100
    mn, mx = null_rows.agg(F.min("v"), F.max("v")).collect()[0]
    assert 5.0 <= mn <= 7.0 and 94.0 <= mx <= 96.0


def test_pearson_moment_scale_for_small_magnitudes(spark):
    from goetl_spark.stats import pearson_corr_exact
    rows = [Row(x=i / 1000.0, y=2 * i / 1000.0) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "x double, y double")
    # default scale-1 rounding distorts tiny-magnitude moments (the
    # documented hazard) but never yields NaN (greatest/nullif guards)
    r1 = pearson_corr_exact(df, "x", "y").collect()[0]
    assert r1["corr"] is None or (
        r1["corr"] == r1["corr"] and abs(r1["corr"] - 1.0) > 1e-3)
    # raised moment scale recovers the correlation
    r2 = pearson_corr_exact(df, "x", "y", moment_scale=9).collect()[0]
    assert r2["corr"] == pytest.approx(1.0, abs=1e-6)


def test_cohort_retention_monthly_calendar_aware(spark):
    from goetl_spark.operators.behavior import cohort_retention
    rows = [
        (1, "2024-01-05 00:00:00"),  # cohort Jan
        (1, "2024-02-10 00:00:00"),  # offset 1
        (1, "2024-03-02 00:00:00"),  # offset 2 (59 days — day math says 1!)
    ]
    df = (spark.createDataFrame(rows, "u int, ts string")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = {r.period_offset: r.n_users for r in
           cohort_retention(df, "u", "ts", period="month").collect()}
    assert out == {0: 1, 1: 1, 2: 1}  # three distinct months, no double-count


def test_tokenizer_string_id_column(spark):
    from goetl_spark.operators.tokenizer import wordpiece_tokenize
    df = spark.createDataFrame([Row(url="a://x", text="run")],
                               "url string, text string")
    out = wordpiece_tokenize(df, {"run"}, id_col="url").collect()
    assert out[0].url == "a://x" and out[0].tokens == ["run"]


def test_robust_scale_resists_outliers(spark):
    from goetl_spark.functions.transforms import robust_scale
    vals = [float(v) for v in range(1, 101)] + [1e9]  # one huge outlier
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.x: r.x_robust for r in robust_scale(df, "x").collect()}
    # median ~51, IQR ~50: ordinary points stay O(1) despite the outlier
    assert abs(out[51.0]) < 0.1
    assert abs(out[1.0] + 1.0) < 0.1
    assert out[1e9] > 1e6  # the outlier itself is off the scale


def test_robust_scale_grouped_and_constant_group(spark):
    from goetl_spark.functions.transforms import robust_scale
    rows = [("a", float(v)) for v in range(1, 101)] + \
           [("c", 5.0), ("c", 5.0), ("c", 5.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = robust_scale(df, "x", group_cols=["g"])
    a = {r.x: r.x_robust for r in out.filter(F.col("g") == "a").collect()}
    assert abs(a[51.0]) < 0.1
    # constant group: IQR 0 -> NULL, never inf
    assert all(r.x_robust is None for r in
               out.filter(F.col("g") == "c").collect())


def test_weighted_sample_rejects_nonpositive_weights(spark):
    import pytest
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 5)], "id int, w int")
    with pytest.raises(Exception, match="non-positive or NULL"):
        weighted_systematic_sample(df, "w", 7, ["id"]).collect()
    neg = spark.createDataFrame([(1, 10), (2, -3)], "id int, w int")
    with pytest.raises(Exception, match="non-positive or NULL"):
        weighted_systematic_sample(neg, "w", 7, ["id"]).collect()


# ---------------------------------------------------------------------------
# standing HLL sketch index
# ---------------------------------------------------------------------------


def test_hll_index_lifecycle_incremental(spark, tmp_path):
    """write -> append -> estimate: the union over per-batch sketches
    matches the exact distinct over the union of batches (within HLL
    error), overlapping keys across batches are not double-counted,
    and appends with a different layout refuse."""
    import pytest as _pytest

    from goetl_spark.operators.sketch import (
        hll_index_estimate, hll_index_write)

    path = str(tmp_path / "hll_idx")
    day1 = spark.range(0, 5000).selectExpr(
        "id % 2 AS grp", "CAST(id AS STRING) AS user")
    day2 = spark.range(2500, 7500).selectExpr(    # 50% overlap with day1
        "id % 2 AS grp", "CAST(id AS STRING) AS user")
    hll_index_write(day1, path, "user", ["grp"])
    hll_index_write(day2, path, "user", ["grp"], mode="append")

    est = {r["grp"]: r for r in hll_index_estimate(spark, path).collect()}
    for grp in (0, 1):
        assert est[grp]["n_batches"] == 2
        # exact distinct per grp over the union = 3750 each
        assert abs(est[grp]["approx_distinct"] - 3750) / 3750 < 0.05

    with _pytest.raises(ValueError):
        hll_index_write(day2, path, "user", None, mode="append")
    with _pytest.raises(ValueError):
        hll_index_write(day2, path, "other_key", ["grp"], mode="append")


def test_hll_sketch_build_global_and_nulls(spark):
    from goetl_spark.operators.sketch import hll_sketch_build

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "a")], "id long, k string")
    from pyspark.sql import functions as F
    row = (hll_sketch_build(df, "k")
           .select(F.hll_sketch_estimate("sketch").alias("est"),
                   "batch_rows").first())
    assert row["est"] == 2                     # exact at tiny cardinality
    assert row["batch_rows"] == 3              # NULL skipped
