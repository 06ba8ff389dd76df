"""Co-occurrence mining, distributed ranking/NTILE, standardize tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.functions.transforms import standardize
from goetl_spark.operators.mining import cooccurrence_pairs
from goetl_spark.operators.ranking import global_row_number, ntile_bins


def test_cooccurrence_dedup_and_pairs(spark):
    rows = [(1, "a"), (1, "b"), (1, "b"),  # duplicate line: counts once
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a")]                       # singleton basket: no pairs
    df = spark.createDataFrame(rows, "b int, i string")
    out = {(r.item_a, r.item_b): r.n_baskets
           for r in cooccurrence_pairs(df, "b", "i").collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_basket_cap_and_min_count(spark):
    rows = [(1, "a"), (1, "b"),
            (2, "a"), (2, "b"), (2, "c")]   # basket 2 dropped by cap=2
    df = spark.createDataFrame(rows, "b int, i string")
    out = cooccurrence_pairs(df, "b", "i", max_basket_size=2).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("a", "b")}
    assert cooccurrence_pairs(df, "b", "i", min_count=2).collect()[0] \
        .n_baskets == 2


def test_global_row_number_matches_single_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), "id").repartition(7)
    ranked = {r.k: r.rank for r in
              global_row_number(df, ["k", "id"], num_partitions=5).collect()}
    # k is a permutation of 0..999 -> rank must equal k+1
    assert all(ranked[k] == k + 1 for k in range(1000))


def test_ntile_bins_match_ansi_ntile(spark):
    # 103 rows, 10 bins: ANSI -> first 3 bins have 11 rows, rest 10
    df = spark.range(0, 103).select(F.col("id").alias("v")).repartition(6)
    out = ntile_bins(df, ["v"], 10)
    sizes = {r.bin: r.cnt for r in
             out.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sizes == {b: (11 if b <= 3 else 10) for b in range(1, 11)}
    # spot-check boundary rows: ANSI ntile assigns row r (1-based) of the
    # total order; v=32 is row 33 -> last row of bin 3, v=33 -> bin 4
    bins = {r.v: r.bin for r in out.collect()}
    assert bins[0] == 1 and bins[32] == 3 and bins[33] == 4 and bins[102] == 10


def test_ntile_more_bins_than_rows(spark):
    df = spark.range(0, 3).select(F.col("id").alias("v"))
    bins = sorted(r.bin for r in ntile_bins(df, ["v"], 10).collect())
    assert bins == [1, 2, 3]


def test_standardize_global_and_grouped(spark):
    rows = [Row(g="a", x=1.0), Row(g="a", x=3.0),
            Row(g="b", x=10.0), Row(g="b", x=10.0)]
    df = spark.createDataFrame(rows)
    out = standardize(df, ["x"], group_cols=["g"],
                      second_moment_scale=6).collect()
    for r in out:
        if r.g == "a":
            assert r.x_z == pytest.approx((r.x - 2.0) / 1.0)
        else:
            assert r.x_z is None  # zero variance -> NULL, not inf
    g = standardize(df, ["x"], second_moment_scale=6).collect()
    mean = 6.0
    std = math.sqrt(sum((v - mean) ** 2 for v in [1, 3, 10, 10]) / 4)
    for r in g:
        assert r.x_z == pytest.approx((r.x - mean) / std, rel=1e-9)


def test_exact_quantiles_match_buffered_percentile(spark):
    import random
    random.seed(7)
    vals = [random.lognormvariate(8, 2) for _ in range(5000)] + [None] * 50
    df = spark.createDataFrame([(v,) for v in vals], "v double") \
        .repartition(9)
    from goetl_spark.operators.ranking import exact_quantiles
    probs = [0.0, 0.05, 0.5, 0.95, 0.99, 1.0]
    got = exact_quantiles(df, "v", probs, num_partitions=5)
    want = df.agg(
        F.expr(f"percentile(v, array({','.join(map(str, probs))}))")
    ).collect()[0][0]
    assert got == list(want)  # bit-identical, not approx


def test_exact_quantiles_tiny_and_errors(spark):
    from goetl_spark.operators.ranking import exact_quantiles
    df = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    assert exact_quantiles(df, "v", [0.5]) == [2.0]
    with pytest.raises(ValueError, match="prob"):
        exact_quantiles(df, "v", [1.5])
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(empty, "v", [0.5])


def test_mode_by_group_deterministic_ties(spark):
    from goetl_spark.operators.groupby import mode_by_group
    rows = [("a", "x"), ("a", "x"), ("a", "y"),
            ("b", "p"), ("b", "q"),        # tie: min -> p, max -> q
            ("c", None), ("c", "z")]
    df = spark.createDataFrame(rows, "g string, v string")
    mn = {r.g: (r.mode, r.mode_count) for r in
          mode_by_group(df, ["g"], "v").collect()}
    assert mn == {"a": ("x", 2), "b": ("p", 1), "c": ("z", 1)}
    mx = {r.g: r.mode for r in
          mode_by_group(df, ["g"], "v", tie="max").collect()}
    assert mx["b"] == "q"


def test_median_abs_deviation(spark):
    from goetl_spark.operators.ranking import median_abs_deviation
    # 1..9 plus a wild outlier: median 5.5 -> med over 10 vals;
    # use 1..9 (odd) for clean hand numbers
    df = spark.createDataFrame([(float(v),) for v in range(1, 10)],
                               "x double")
    med, mad = median_abs_deviation(df, "x")
    assert med == 5.0 and mad == 2.0  # |x-5| = 4,3,2,1,0,1,2,3,4 -> med 2
    # outlier moves mean/std wildly but barely touches med/mad
    df2 = spark.createDataFrame([(float(v),) for v in range(1, 10)]
                                + [(1e9,)], "x double")
    med2, mad2 = median_abs_deviation(df2, "x")
    assert 5.0 <= med2 <= 5.5 and mad2 <= 3.0


def test_cooccurrence_null_items_excluded_before_cap(spark):
    # a basket at exactly the cap plus a NULL item must still be kept:
    # NULLs are filtered BEFORE the basket-size cap so the operator and
    # a SQL DISTINCT-frame oracle agree (r6 advisor).
    df = spark.createDataFrame(
        [("b1", "x"), ("b1", "y"), ("b1", None)],
        "b string, i string")
    out = {(r.item_a, r.item_b): r.n_baskets
           for r in cooccurrence_pairs(df, "b", "i",
                                       max_basket_size=2).collect()}
    assert out == {("x", "y"): 1}


def test_rrf_fuse_grouped(spark):
    from goetl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [("q1", "d1", 9.0), ("q1", "d2", 5.0), ("q1", "d3", 1.0),
         ("q2", "d1", 2.0)],
        "qid string, doc string, score double")
    b = spark.createDataFrame(
        [("q1", "d2", 0.9), ("q1", "d1", 0.5),
         ("q2", "d9", 0.1)],
        "qid string, doc string, score double")
    out = {(r.qid, r.doc): r for r in
           rrf_fuse([a, b], ["doc"], "score", k=60,
                    group_cols=["qid"]).collect()}
    # d1: rank 1 in a, rank 2 in b; d2: rank 2 in a, rank 1 in b
    exp = round(1 / 61, 12) + round(1 / 62, 12)
    assert abs(out[("q1", "d1")].rrf_score - exp) < 1e-15
    assert abs(out[("q1", "d2")].rrf_score - exp) < 1e-15
    assert out[("q1", "d1")].n_lists == 2
    # d3 only in list a (rank 3); q2/d9 only in b (rank 1 in its group)
    assert out[("q1", "d3")].n_lists == 1
    assert abs(out[("q1", "d3")].rrf_score - round(1 / 63, 12)) < 1e-15
    assert abs(out[("q2", "d9")].rrf_score - round(1 / 61, 12)) < 1e-15
    # deterministic tie-break: equal scores rank by id ascending
    t = spark.createDataFrame([("q1", "x", 1.0), ("q1", "a", 1.0)],
                              "qid string, doc string, score double")
    tied = {r.doc: r.rrf_score for r in
            rrf_fuse([t], ["doc"], "score",
                     group_cols=["qid"]).collect()}
    assert tied["a"] > tied["x"]


def test_rrf_fuse_ungrouped_and_guards(spark):
    import pytest
    from goetl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 10.0), (2, 30.0), (3, 20.0)],
                              "id long, score double")
    out = {r.id: r.rrf_score for r in
           rrf_fuse([a], ["id"], "score", k=10).collect()}
    assert out[2] > out[3] > out[1]
    assert abs(out[2] - round(1 / 11, 12)) < 1e-15
    # lower-is-better flips the order
    low = {r.id: r.rrf_score for r in
           rrf_fuse([a], ["id"], "score", k=10,
                    higher_better=False).collect()}
    assert low[1] > low[3] > low[2]
    with pytest.raises(ValueError):
        rrf_fuse([], ["id"], "score")
    with pytest.raises(ValueError):
        rrf_fuse([a], ["id"], "score", k=0)


def test_rrf_fuse_intra_list_duplicates(spark):
    """A duplicate candidate WITHIN one list collapses to its best
    score (r9 ADVICE): n_lists stays <= len(ranked_lists) and the
    candidate is credited once per list."""
    from goetl_spark.operators.ranking import rrf_fuse

    dup = spark.createDataFrame(
        [("q1", "d1", 9.0), ("q1", "d1", 3.0), ("q1", "d2", 5.0)],
        "qid string, doc string, score double")
    out = {r.doc: r for r in
           rrf_fuse([dup], ["doc"], "score", k=60,
                    group_cols=["qid"]).collect()}
    assert out["d1"].n_lists == 1 and out["d2"].n_lists == 1
    # d1 ranks once at its best score (rank 1), d2 at rank 2
    assert abs(out["d1"].rrf_score - round(1 / 61, 12)) < 1e-15
    assert abs(out["d2"].rrf_score - round(1 / 62, 12)) < 1e-15
    # lower-is-better keeps the MIN duplicate instead
    low = {r.doc: r.rrf_score for r in
           rrf_fuse([dup], ["doc"], "score", k=60, group_cols=["qid"],
                    higher_better=False).collect()}
    assert abs(low["d1"] - round(1 / 61, 12)) < 1e-15  # 3.0 beats 5.0


def test_rrf_fuse_null_scores_dropped(spark):
    """NULL-score rows contribute nothing (r10 ADVICE: an all-NULL
    candidate used to collapse to a NULL best score, which sorts FIRST
    under higher_better=False and stole rank 1)."""
    from goetl_spark.operators.ranking import rrf_fuse

    df = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d2", 5.0), ("q1", "dN", None)],
        "qid string, doc string, score double")
    low = {r.doc: r for r in
           rrf_fuse([df], ["doc"], "score", k=60, group_cols=["qid"],
                    higher_better=False).collect()}
    assert "dN" not in low  # unscored = unranked by this list
    assert abs(low["d1"].rrf_score - round(1 / 61, 12)) < 1e-15
    # a candidate NULL in one list but scored in another keeps the
    # scored list's contribution with n_lists == 1
    other = spark.createDataFrame([("q1", "dN", 1.0)],
                                  "qid string, doc string, score double")
    both = {r.doc: r for r in
            rrf_fuse([df, other], ["doc"], "score", k=60,
                     group_cols=["qid"]).collect()}
    assert both["dN"].n_lists == 1
    assert abs(both["dN"].rrf_score - round(1 / 61, 12)) < 1e-15


def test_rrf_fuse_assume_unique_fast_path(spark):
    """assume_unique=True skips the per-list dedup groupBy (r10 verdict
    #5): same fused result on already-unique lists, and the physical
    plan drops one hashaggregate exchange pair per list."""
    from goetl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [("q1", "d1", 9.0), ("q1", "d2", 5.0), ("q2", "d1", 2.0)],
        "qid string, doc string, score double")
    b = spark.createDataFrame(
        [("q1", "d2", 0.9), ("q1", "d1", 0.5)],
        "qid string, doc string, score double")
    slow = rrf_fuse([a, b], ["doc"], "score", k=60, group_cols=["qid"])
    fast = rrf_fuse([a, b], ["doc"], "score", k=60, group_cols=["qid"],
                    assume_unique=True)
    srows = {(r.qid, r.doc): (r.n_lists, r.rrf_score)
             for r in slow.collect()}
    frows = {(r.qid, r.doc): (r.n_lists, r.rrf_score)
             for r in fast.collect()}
    assert srows == frows
    # plan audit: the fast path has strictly fewer exchanges
    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange")
    assert n_exchanges(fast) < n_exchanges(slow)


def test_association_rules_hand_computed(spark):
    from goetl_spark.operators.mining import association_rules

    # baskets: {a,b,c}, {a,b}, {a}, {b,d}
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (2, "b"),
            (3, "a"), (4, "b"), (4, "d")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "basket", "item").collect()}
    # every surviving pair appears in BOTH directions
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
                        ("b", "c"), ("c", "b"), ("b", "d"), ("d", "b")}
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_ante"], ab["n_cons"],
            ab["n_baskets_total"]) == (2, 3, 3, 4)
    assert ab["support"] == 2 / 4
    assert ab["confidence"] == 2 / 3
    assert ab["lift"] == (2 / 3) / (3 / 4)
    ba = got[("b", "a")]  # direction flips confidence, lift is symmetric
    assert ba["confidence"] == 2 / 3 and ba["lift"] == ab["lift"]
    cb = got[("c", "b")]
    assert cb["confidence"] == 1.0  # every c-basket contains b
    assert cb["lift"] == 1.0 / (3 / 4)


def test_association_rules_cap_keeps_counts_consistent(spark):
    """Item counts must come from the SAME capped baskets as pair
    counts — an item living only in an over-cap basket must not
    inflate n_ante past what pairs can see."""
    from goetl_spark.operators.mining import association_rules

    rows = ([(1, "a"), (1, "b")] + [(2, "a")] +
            [(3, f"x{k}") for k in range(5)] + [(3, "a")])  # size-6 basket
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "basket", "item",
                             max_basket_size=3).collect()}
    ab = got[("a", "b")]
    # basket 3 (size 6 > cap) is invisible everywhere: a counts 2, not 3
    assert (ab["n_both"], ab["n_ante"], ab["n_baskets_total"]) == (1, 2, 2)
    assert all(k[0].startswith(("a", "b")) and k[1].startswith(("a", "b"))
               for k in got)


def test_association_rules_min_count(spark):
    from goetl_spark.operators.mining import association_rules

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = association_rules(df, "basket", "item", min_count=2)
    keys = {(r["antecedent"], r["consequent"]) for r in got.collect()}
    assert keys == {("a", "b"), ("b", "a")}  # (a,c) pruned at 1


def test_association_rules_pruning_knobs(spark):
    # r13 verdict slack (c): min_support / top_n prune the PAIR table
    # before rule doubling; metrics for surviving rules are unchanged
    from goetl_spark.operators.mining import association_rules

    rows = ([(b, it) for b in range(10) for it in ("x", "y")]  # x,y in 10
            + [(b, "z") for b in range(2)])                    # z in 2
    df = spark.createDataFrame(rows, "b int, it string")
    full = {(r["antecedent"], r["consequent"]): r
            for r in association_rules(df, "b", "it").collect()}
    assert ("x", "z") in full and ("x", "y") in full

    # min_support 0.5: only the x<->y pair (10/10 baskets) survives
    ms = {(r["antecedent"], r["consequent"]): r
          for r in association_rules(df, "b", "it",
                                     min_support=0.5).collect()}
    assert set(ms) == {("x", "y"), ("y", "x")}
    for k in ms:  # surviving metrics identical to the unpruned run
        assert tuple(ms[k]) == tuple(full[k])

    # top_n=1 keeps the most frequent pair, output bounded at 2 rules
    tn = {(r["antecedent"], r["consequent"]): r
          for r in association_rules(df, "b", "it", top_n=1).collect()}
    assert set(tn) == {("x", "y"), ("y", "x")}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_support"):
        association_rules(df, "b", "it", min_support=1.5)
    with _pytest.raises(ValueError, match="top_n"):
        association_rules(df, "b", "it", top_n=0)
