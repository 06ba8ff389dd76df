"""As-of/range joins, salted join, custom pandas aggregator."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators.asof import asof_join, range_join
from goetl_spark.operators.skew import salted_join
from goetl_spark.operators.udaf import PandasAggregator, apply_grouped


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts"))


def test_asof_backward_inclusive(spark):
    trades = _ts(spark, [
        Row(sym="A", ts="2024-01-01 10:00:05", px=100.0),
        Row(sym="A", ts="2024-01-01 10:00:10", px=101.0),
        Row(sym="B", ts="2024-01-01 10:00:01", px=50.0),
    ], "sym string, ts string, px double")
    quotes = _ts(spark, [
        Row(sym="A", ts="2024-01-01 10:00:00", bid=99.0),
        Row(sym="A", ts="2024-01-01 10:00:10", bid=100.5),  # equal ts → matches
        Row(sym="B", ts="2024-01-01 10:00:02", bid=49.0),   # after trade → no match
    ], "sym string, ts string, bid double")
    out = {(r.sym, r.px): r for r in
           asof_join(trades, quotes, on=["sym"]).collect()}
    assert out[("A", 100.0)].bid == 99.0
    assert out[("A", 101.0)].bid == 100.5   # inclusive at equal ts
    assert out[("B", 50.0)].bid is None     # nothing at-or-before


def test_asof_tolerance(spark):
    left = _ts(spark, [Row(k="a", ts="2024-01-01 12:00:00", x=1)],
               "k string, ts string, x int")
    right = _ts(spark, [Row(k="a", ts="2024-01-01 10:00:00", y=7)],
                "k string, ts string, y int")
    fresh = asof_join(left, right, on=["k"], tolerance_seconds=3600).collect()[0]
    assert fresh.y is None  # match is 2h old, tolerance 1h
    loose = asof_join(left, right, on=["k"], tolerance_seconds=7200 + 1).collect()[0]
    assert loose.y == 7


def test_range_join_window(spark):
    purchases = _ts(spark, [Row(u=1, ts="2024-01-01 11:00:00")],
                    "u int, ts string")
    clicks = _ts(spark, [
        Row(u=1, ts="2024-01-01 10:30:00"),   # within hour before
        Row(u=1, ts="2024-01-01 09:00:00"),   # too old
        Row(u=1, ts="2024-01-01 11:30:00"),   # after
    ], "u int, ts string")
    out = range_join(purchases, clicks, on=["u"],
                     lower_seconds=0, upper_seconds=3600)
    assert out.count() == 1


def test_salted_join_matches_plain(spark):
    # hot key 1 dominates; salted results must equal the plain join
    skewed = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(50)] + [Row(k=2, v=99)])
    small = spark.createDataFrame([Row(k=1, name="hot"), Row(k=2, name="cold")])
    plain = {(r.k, r.v, r.name) for r in skewed.join(small, "k").collect()}
    salted = {(r.k, r.v, r.name)
              for r in salted_join(skewed, small, ["k"], salt_n=8).collect()}
    assert salted == plain


def test_apply_grouped(spark):
    import pandas as pd

    df = spark.createDataFrame([Row(g="a", v=1.0), Row(g="a", v=3.0),
                                Row(g="b", v=10.0)])

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "g": pdf["g"].iloc[0], "spread": pdf["v"].max() - pdf["v"].min(),
        }])

    out = {r.g: r.spread for r in
           apply_grouped(df, ["g"], spread, "g string, spread double").collect()}
    assert out == {"a": 2.0, "b": 0.0}


def test_pandas_aggregator_contract(spark):
    df = spark.createDataFrame([Row(g="a", v=2.0), Row(g="a", v=4.0),
                                Row(g="b", v=5.0)])
    agg = PandasAggregator(
        init=lambda: {"n": 0, "s": 0.0},
        add=lambda st, pdf: {"n": st["n"] + len(pdf),
                             "s": st["s"] + float(pdf["v"].sum())},
        result=lambda st: {"n": st["n"], "mean": st["s"] / st["n"]},
        schema="n long, mean double",
    )
    out = {r.g: (r.n, r.mean) for r in agg.aggregate(df, ["g"]).collect()}
    assert out == {"a": (2, 3.0), "b": (1, 5.0)}


def test_pandas_aggregator_global(spark):
    df = spark.createDataFrame([Row(v=1.0), Row(v=2.0)])
    agg = PandasAggregator(
        init=lambda: {"n": 0},
        add=lambda st, pdf: {"n": st["n"] + len(pdf)},
        result=lambda st: {"n": st["n"]},
        schema="n long",
    )
    assert agg.aggregate(df, []).collect()[0].n == 2


# --- t-digest quantile sketch (operators/sketch.py) -------------------------

def test_tdigest_accuracy_on_skewed_data(spark):
    """Quantile-RANK error <= 0.01 at compression=100 on 100k lognormal
    values across 16 partitions (rank error is the t-digest guarantee;
    value error is unbounded for skewed tails)."""
    import numpy as np

    from goetl_spark.operators.sketch import approx_quantiles

    rs = np.random.RandomState(11)
    vals = rs.lognormal(0.0, 1.5, 100_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")\
        .repartition(16)
    probs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = approx_quantiles(df, "v", probs, compression=100)
    svals = np.sort(vals)
    for p, g in zip(probs, got):
        rank = np.searchsorted(svals, g) / len(svals)
        assert abs(rank - p) <= 0.01, f"p={p}: est rank {rank}"


def test_tdigest_bounded_centroids_and_nulls(spark):
    from goetl_spark.operators.sketch import approx_quantiles, tdigest_sketch

    df = spark.range(0, 50_000).selectExpr(
        "CASE WHEN id % 100 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS v"
    ).repartition(8)
    rows = tdigest_sketch(df, "v", compression=50).collect()
    # bounded partial size: <= ~2*compression per partition
    assert len(rows) <= 8 * 2 * 50
    # uniform data → median ~ midpoint despite dropped NULLs
    [med] = approx_quantiles(df, "v", [0.5], compression=50)
    assert abs(med - 25_000) < 1000


def test_tdigest_by_group_rank_accuracy(spark):
    """Per-group two-level sketch: each group's estimates hit rank error
    <= 0.015 against that group's own exact distribution, across a
    multi-partition input where every partition sees every group."""
    import numpy as np

    from goetl_spark.operators.sketch import tdigest_quantiles_by_group

    rs = np.random.RandomState(7)
    data = []
    dists = {"a": rs.lognormal(0.0, 1.0, 30_000),
             "b": rs.normal(100.0, 5.0, 30_000)}
    for g, vals in dists.items():
        data.extend((g, float(v)) for v in vals)
    df = spark.createDataFrame(data, "g string, v double").repartition(16)
    probs = [0.25, 0.5, 0.9]
    out = tdigest_quantiles_by_group(df, ["g"], "v", probs).collect()
    assert len(out) == len(dists) * len(probs)
    for r in out:
        svals = np.sort(dists[r.g])
        rank = np.searchsorted(svals, r.quantile) / len(svals)
        assert abs(rank - r.prob) <= 0.015, f"{r.g} p={r.prob}: rank {rank}"


def test_tdigest_empty_input(spark):
    import math

    from goetl_spark.operators.sketch import approx_quantiles

    df = spark.createDataFrame([], "v double")
    [q] = approx_quantiles(df, "v", [0.5])
    assert math.isnan(q)


def test_countmin_one_sided_and_bounded(spark):
    """CM guarantees on a skewed key set: estimate >= exact for every
    key, and <= exact + (e/width)*N for the probed keys."""
    import math

    from goetl_spark.operators.sketch import countmin_build, countmin_estimate

    rows = [(k,) for k in range(50) for _ in range(k + 1)] + [(999,)] * 400
    df = spark.createDataFrame(rows, "key long").repartition(8)
    width, depth = 512, 4
    M = countmin_build(df, "key", width=width, depth=depth)
    n = len(rows)
    assert int(M[0].sum()) == n  # every row lands once per depth row
    exact = {k: k + 1 for k in range(50)} | {999: 400}
    for k, c in exact.items():
        est = countmin_estimate(M, k)
        assert est >= c
        assert est <= c + math.e / width * n


def test_countmin_skips_nulls(spark):
    from goetl_spark.operators.sketch import countmin_build

    df = spark.createDataFrame([(1,), (None,), (1,)], "key long")
    M = countmin_build(df, "key", width=64, depth=2)
    assert int(M[0].sum()) == 2


def test_bm25_ranks_term_frequency(spark):
    """A document repeating the query term scores above one mentioning it
    once, which scores above one without it; absent term -> score 0."""
    from goetl_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark spark spark fast"), (2, "spark is neat"),
         (3, "duck pond water fowl")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in bm25_scores(df, ["spark"]).collect()}
    assert out[1]["tf_spark"] == 3 and out[2]["tf_spark"] == 1
    assert out[1]["score"] > out[2]["score"] > 0.0
    assert out[3]["score"] == 0.0
    assert out[3]["dl"] == 4


def test_bm25_rejects_empty_query():
    import pytest as _pt

    from goetl_spark.operators.text import bm25_scores

    with _pt.raises(ValueError):
        bm25_scores(None, [])


def test_join_cardinality_predicts_exact_join_size(spark):
    from goetl_spark.operators.join import join_cardinality

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long")
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,)], "k long")
    card = join_cardinality(left, right, ["k"])
    predicted = card.agg(F.sum("pairs")).collect()[0][0]
    actual = left.join(right, "k").count()
    assert predicted == actual == 4  # 1x: 2*1, 2x: 1*2; NULLs never match


def test_histogram_clamps_and_sums(spark):
    from goetl_spark.operators.groupby import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (99.0,), (None,)], "v double")
    out = {r["bin"]: r for r in histogram(df, "v", 0.0, 10.0, 2).collect()}
    assert out[0]["n"] == 3  # -5 clamps in, 0, 4.9
    assert out[1]["n"] == 2  # 5.0, 99 clamps in
    assert out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 5.0
    assert out[1]["bin_lo"] == 5.0 and out[1]["bin_hi"] == 10.0
    import pytest as _pt
    with _pt.raises(ValueError):
        histogram(df, "v", 10.0, 0.0, 2)


def test_vocabulary_counts(spark):
    from goetl_spark.operators.text import vocabulary

    df = spark.createDataFrame(
        [(1, "Spark spark GO"), (2, "go go go")], "doc_id long, text string")
    out = {r["token"]: r for r in vocabulary(df).collect()}
    assert out["spark"]["n"] == 2 and out["spark"]["df_docs"] == 1
    assert out["go"]["n"] == 4 and out["go"]["df_docs"] == 2


def test_pearson_corr_exact_matches_known(spark):
    from goetl_spark.stats import pearson_corr_exact

    rows = [(float(i), 2.0 * i + 1.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = pearson_corr_exact(df, "x", "y").collect()[0]
    assert r["n"] == 10
    assert abs(r["corr"] - 1.0) < 1e-12
    anti = spark.createDataFrame(
        [(float(i), -3.0 * i) for i in range(1, 11)], "x double, y double")
    assert abs(pearson_corr_exact(anti, "x", "y").collect()[0]["corr"]
               + 1.0) < 1e-12
