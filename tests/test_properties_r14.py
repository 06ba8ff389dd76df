"""Property-based tests for the round-14 operator family (hypothesis,
Spark-backed with capped examples — the test_properties_r13.py
convention): KS-distance laws (identity, bounds, monotone-transform
invariance), grouped-AUC monotone invariance and slice equality,
nDCG bounds (DCG <= IDCG by the rearrangement inequality), exact
Jaccard/edit-distance join completeness + symmetry, and per-segment
calibration mass conservation."""
from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_vals = st.lists(st.integers(min_value=-50, max_value=50),
                 min_size=1, max_size=60)


@settings(**_SETTINGS)
@given(_vals, _vals)
def test_ks_identity_bounds_and_monotone_invariance(spark, a, b):
    from goetl_spark.quality import ks_distance

    A = spark.createDataFrame([(float(x),) for x in a], "v double")
    B = spark.createDataFrame([(float(x),) for x in b], "v double")
    # identity: a sample against itself has KS 0
    assert ks_distance(A, A, "v").collect()[0]["ks"] == 0.0
    r = ks_distance(A, B, "v").collect()[0]
    assert 0.0 <= r["ks"] <= 1.0
    # ECDF-based: any strictly increasing transform leaves KS unchanged
    A2 = spark.createDataFrame([(float(x) * 3 + 7,) for x in a],
                               "v double")
    B2 = spark.createDataFrame([(float(x) * 3 + 7,) for x in b],
                               "v double")
    assert ks_distance(A2, B2, "v").collect()[0]["ks"] == r["ks"]


_scored = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),     # group
              st.integers(min_value=0, max_value=20),    # raw score
              st.booleans()),                            # label
    min_size=4, max_size=60)


@settings(**_SETTINGS)
@given(_scored)
def test_grouped_auc_monotone_invariance_and_slice_equality(spark, rows):
    from pyspark.sql import functions as F

    from goetl_spark.operators.classifier import roc_auc, roc_auc_by

    data = [(f"g{g}", float(s), float(y)) for g, s, y in rows]
    df = spark.createDataFrame(data, "g string, p double, y double")
    base = {r["g"]: r["auc"]
            for r in roc_auc_by(df, ["g"], "p", "y").collect()}
    # AUC is rank-based: a strictly increasing score transform is a
    # no-op (2^p is strictly increasing and stays finite on [0,20])
    tx = df.withColumn("p", F.pow(F.lit(2.0), F.col("p")))
    again = {r["g"]: r["auc"]
             for r in roc_auc_by(tx, ["g"], "p", "y").collect()}
    assert base == again
    # every group equals the whole-frame operator on its slice
    for gval, auc in base.items():
        sl = df.filter(F.col("g") == gval)
        n_pos = sl.filter(F.col("y") > 0).count()
        n_neg = sl.filter(F.col("y") <= 0).count()
        if n_pos == 0 or n_neg == 0:
            assert auc is None
        else:
            assert auc == roc_auc(sl, "p", "y").collect()[0]["auc"]


_qrels = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),    # query
              st.integers(min_value=0, max_value=15),   # doc
              st.integers(min_value=0, max_value=3)),   # grade
    min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_qrels, st.integers(min_value=1, max_value=6),
       st.randoms(use_true_random=False))
def test_ndcg_bounded_by_one(spark, rel_rows, k, rnd):
    # DCG of ANY ranking <= IDCG (rearrangement inequality: best gains
    # at smallest discounts), so nDCG in [0, 1] whatever the run order
    from collections import defaultdict

    from goetl_spark.operators.ranking import ndcg_at_k

    rels = {}
    for q, d, g in rel_rows:
        rels[(q, d)] = max(g, rels.get((q, d), 0))
    by_q = defaultdict(list)
    for (q, d), g in rels.items():
        by_q[q].append(d)
    run = []
    for q, docs in by_q.items():
        docs = list(docs)
        rnd.shuffle(docs)
        run += [(q, d, i + 1) for i, d in enumerate(docs[:k])]
    if not run:
        return
    res = spark.createDataFrame(
        run, "query_id int, neighbor_id int, rank long")
    qr = spark.createDataFrame(
        [(q, d, float(g)) for (q, d), g in rels.items()],
        "query_id int, neighbor_id int, grade double")
    for r in ndcg_at_k(res, qr, k=k).collect():
        assert r["dcg_at_k"] <= r["idcg_at_k"] + 1e-12
        if r["ndcg_at_k"] is not None:
            assert 0.0 <= r["ndcg_at_k"] <= 1.0 + 1e-12


_sets = st.lists(
    st.lists(st.integers(min_value=0, max_value=12), max_size=8),
    min_size=1, max_size=25)


@settings(**_SETTINGS)
@given(_sets, _sets,
       st.sampled_from([0.34, 0.5, 0.75, 1.0]))
def test_jaccard_join_complete_and_symmetric(spark, la, lb, tau):
    from goetl_spark.operators.dedup import jaccard_join

    lefts = [(i, [f"w{t}" for t in ts]) for i, ts in enumerate(la)]
    rights = [(i, [f"w{t}" for t in ts]) for i, ts in enumerate(lb)]
    L = spark.createDataFrame(lefts, "lid int, w array<string>")
    R = spark.createDataFrame(rights, "rid int, w array<string>")
    got = {(r["lid"], r["rid"]): r["jaccard"] for r in
           jaccard_join(L, R, "lid", "w", "rid", "w", tau).collect()}

    def jac(x, y):
        sx, sy = set(x), set(y)
        return len(sx & sy) / len(sx | sy)

    want = {(i, j): jac(x, y) for i, x in lefts for j, y in rights
            if x and y and jac(x, y) >= tau}
    assert set(got) == set(want)
    for kk in want:
        assert abs(got[kk] - want[kk]) < 1e-12
    # symmetry: the transposed join finds the transposed pairs
    # (output columns carry each side's own id name: rid is the "left"
    # of the reversed call)
    rev = {(r["rid"], r["lid"]) for r in
           jaccard_join(R, L, "rid", "w", "lid", "w", tau).collect()}
    assert rev == {(j, i) for i, j in got}


_strs = st.lists(st.text(alphabet="abc", max_size=8),
                 min_size=1, max_size=20)


@settings(**_SETTINGS)
@given(_strs, _strs, st.integers(min_value=0, max_value=3))
def test_edit_distance_join_complete_and_symmetric(spark, sa, sb, d):
    from goetl_spark.operators.dedup import edit_distance_join

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    lefts = list(enumerate(sa))
    rights = list(enumerate(sb))
    L = spark.createDataFrame(lefts, "lid int, s string")
    R = spark.createDataFrame(rights, "rid int, t string")
    got = {(r["lid"], r["rid"], r["edit_dist"]) for r in
           edit_distance_join(L, R, "lid", "s", "rid", "t",
                              max_dist=d).collect()}
    want = {(i, j, lev(a, b)) for i, a in lefts for j, b in rights
            if lev(a, b) <= d}
    assert got == want
    # output columns carry each side's own id name: rid is the "left"
    # of the reversed call
    rev = {(r["rid"], r["lid"], r["edit_dist"]) for r in
           edit_distance_join(R, L, "rid", "t", "lid", "s",
                              max_dist=d).collect()}
    assert rev == {(j, i, dist) for i, j, dist in got}


@settings(**_SETTINGS)
@given(_scored, st.integers(min_value=1, max_value=6))
def test_grouped_calibration_mass_conservation(spark, rows, n_bins):
    # per group: bin counts sum to the group's rows, positives to the
    # group's positives, and ece_terms sum to at most 1
    from collections import defaultdict

    from goetl_spark.operators.classifier import calibration_bins_by

    data = [(f"g{g}", s / 20.0, float(y)) for g, s, y in rows]
    df = spark.createDataFrame(data, "g string, p double, y double")
    out = calibration_bins_by(df, ["g"], "p", "y", n_bins=n_bins)
    per = defaultdict(lambda: [0, 0, 0.0])
    for r in out.collect():
        per[r["g"]][0] += r["n"]
        per[r["g"]][1] += r["n_pos"]
        per[r["g"]][2] += r["ece_term"]
        assert 0 <= r["bin_id"] < n_bins
    ref = defaultdict(lambda: [0, 0])
    for g, p, y in data:
        ref[g][0] += 1
        ref[g][1] += int(y > 0)
    for g, (n, npos, ece) in per.items():
        assert [n, npos] == ref[g]
        assert 0.0 <= ece <= 1.0 + 1e-12


def test_r14_family_off_type_and_unicode_edges(spark):
    # adversarial-probe regressions: integer score/grade/value columns
    # flow through the cast-guarded paths, and the PassJoin pigeonhole
    # stays lossless on multi-byte unicode (Spark length/substring/
    # levenshtein all count CHARACTERS, consistently)
    from goetl_spark.operators.classifier import roc_auc, roc_auc_by
    from goetl_spark.operators.dedup import edit_distance_join, jaccard_join
    from goetl_spark.operators.ranking import ndcg_at_k
    from goetl_spark.quality import ks_distance

    rows = [("g", i % 7, float(i % 3 == 0)) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, p int, y double")
    assert (roc_auc_by(df, ["g"], "p", "y").collect()[0]["auc"]
            == roc_auc(df, "p", "y").collect()[0]["auc"])

    r2 = spark.createDataFrame(
        [("A", "d1", 1), ("A", "d2", 2)],
        "query_id string, neighbor_id string, rank long")
    q2 = spark.createDataFrame(
        [("A", "d1", 2), ("A", "d2", 1)],
        "query_id string, neighbor_id string, grade int")
    assert ndcg_at_k(r2, q2, k=2).collect()[0]["ndcg_at_k"] == 1.0

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    lefts = [(0, "héllo"), (1, "naïve"), (2, "日本語です"), (3, "café")]
    rights = [(0, "hello"), (1, "naive"), (2, "日本語だよ"), (3, "cafe"),
              (4, "çafé")]
    L = spark.createDataFrame(lefts, "lid int, s string")
    R = spark.createDataFrame(rights, "rid int, t string")
    got = {(r["lid"], r["rid"], r["edit_dist"]) for r in
           edit_distance_join(L, R, "lid", "s", "rid", "t",
                              max_dist=2).collect()}
    want = {(i, j, lev(a, b)) for i, a in lefts for j, b in rights
            if lev(a, b) <= 2}
    assert got == want

    A = spark.createDataFrame([(i % 5,) for i in range(40)], "v int")
    B = spark.createDataFrame([(i % 7,) for i in range(40)], "v int")
    assert 0.0 <= ks_distance(A, B, "v").collect()[0]["ks"] <= 1.0

    # uniform token frequencies: the (count, token) tie-break still
    # yields a total order and the filter stays lossless
    LU = spark.createDataFrame([(1, ["a", "b"]), (2, ["b", "c"])],
                               "lid int, w array<string>")
    RU = spark.createDataFrame([(1, ["a", "b"]), (2, ["c", "d"])],
                               "rid int, w array<string>")
    g5 = {(r["lid"], r["rid"]): r["jaccard"] for r in
          jaccard_join(LU, RU, "lid", "w", "rid", "w", 0.5).collect()}
    assert g5 == {(1, 1): 1.0}
