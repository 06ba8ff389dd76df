"""classifier_two_sample_test — cross-fitted multivariate drift.

The three contract pillars, each pinned against a hand-computed or
structural reference:

1. H0 calibration: identical snapshots read AUC == 0.5 EXACTLY when
   cells are fold-balanced (every cross-fitted rate equals every
   other), and near 0.5 under realistic imbalance — the failure mode
   that rules out the cheaper recipes (plain same-fold rates leak to
   AUC -> 1; leave-one-out anti-separates to AUC -> 0 — both would
   scream on identical data).
2. Full separation reads separability ~ 1.
3. JOINT-ONLY drift (XOR cell pattern — both marginals identical
   across snapshots) is detected while the per-column categorical PSI
   legs read exactly 0: the reason this operator exists.
"""
from __future__ import annotations

import pytest

from goetl_spark.quality import (
    categorical_psi,
    classifier_two_sample_test,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "u string, v string, fold int")


def test_identical_snapshots_auc_exactly_half(spark):
    # 2x2 cells, each with both folds equally populated: every
    # opposite-fold rate is the same number -> one distinct score ->
    # midrank AUC is exactly 0.5, separability exactly 0
    rows = [(u, v, f)
            for u in ("a", "b") for v in ("x", "y")
            for f in (0, 1) for _ in range(5)]
    df = _frame(spark, rows)
    r = classifier_two_sample_test(df, df, ["u", "v"], "fold").collect()[0]
    assert (r["n_a"], r["n_b"]) == (40, 40)
    assert r["auc"] == 0.5
    assert r["separability"] == 0.0
    assert r["z"] == 0.0


def test_identical_snapshots_imbalanced_cells_near_half(spark):
    # uneven cell sizes and fold splits — still the same frame twice,
    # so every cell's opposite-fold rate is exactly 0.5 and AUC stays
    # exactly 0.5 (rates differ BETWEEN cells only via smoothing
    # weight, but s/n = 1/2 in every (cell, fold) here means all
    # scores equal); perturb one cell's fold balance to get genuinely
    # distinct scores and assert the noise floor instead
    rows = ([("a", "x", f) for f in (0, 1, 0, 1, 0)]
            + [("a", "y", f) for f in (0, 1, 1)]
            + [("b", "x", f) for f in (0, 0, 1, 1, 1, 0, 1)]
            + [("b", "y", f) for f in (1, 0)])
    df = _frame(spark, rows)
    r = classifier_two_sample_test(df, df, ["u", "v"], "fold").collect()[0]
    assert r["separability"] < 0.25  # noise floor, tiny n


def test_full_separation_detected(spark):
    a = _frame(spark, [("en", "web", i % 2) for i in range(24)])
    b = _frame(spark, [("fr", "web", i % 2) for i in range(24)])
    r = classifier_two_sample_test(a, b, ["u", "v"], "fold").collect()[0]
    assert r["auc"] == 1.0
    assert r["separability"] == 1.0
    # Mann-Whitney z at n=24+24: (1-0.5)/sqrt(49/(12*576)) ~ 5.9 —
    # far past the 1.96 act line
    assert r["z"] > 1.96


def test_joint_only_drift_detected_psi_blind(spark):
    # XOR pattern: a holds cells (0,0) and (1,1), b holds (0,1) and
    # (1,0), equal counts — u and v marginals are 50/50 in BOTH
    # snapshots, so every per-column drift leg reads zero, but the
    # joint distributions are disjoint
    a = _frame(spark, [(u, u, i % 2)
                       for u in ("0", "1") for i in range(20)])
    b = _frame(spark, [(u, "1" if u == "0" else "0", i % 2)
                       for u in ("0", "1") for i in range(20)])
    r = classifier_two_sample_test(a, b, ["u", "v"], "fold").collect()[0]
    assert r["auc"] == 1.0 and r["separability"] == 1.0
    # the marginal legs are blind to it: per-class PSI terms all 0
    for col in ("u", "v"):
        terms = categorical_psi(a.select(col), b.select(col), col).collect()
        assert all(t["psi_term"] == 0.0 for t in terms)


def test_null_category_is_a_class(spark):
    # NULL u in snapshot b only — a pure null-rate shift must move AUC
    a = _frame(spark, [("a", "x", i % 2) for i in range(20)])
    b = _frame(spark, [(None, "x", i % 2) for i in range(20)])
    r = classifier_two_sample_test(a, b, ["u", "v"], "fold").collect()[0]
    assert r["auc"] == 1.0


def test_validation_raises(spark):
    ok = _frame(spark, [("a", "x", 0), ("a", "x", 1)])
    with pytest.raises(ValueError, match="cat_cols"):
        classifier_two_sample_test(ok, ok, [], "fold")
    with pytest.raises(ValueError, match="smoothing"):
        classifier_two_sample_test(ok, ok, ["u"], "fold", smoothing=0)
    # bad fold value
    bad = _frame(spark, [("a", "x", 2), ("a", "x", 1)])
    with pytest.raises(ValueError, match="must be 0 or 1"):
        classifier_two_sample_test(bad, ok, ["u"], "fold")
    # NULL fold
    nl = spark.createDataFrame([("a", "x", None)],
                               "u string, v string, fold int")
    with pytest.raises(ValueError, match="must be 0 or 1"):
        classifier_two_sample_test(nl, ok, ["u"], "fold")
    # one fold empty
    f0 = _frame(spark, [("a", "x", 0), ("b", "x", 0)])
    with pytest.raises(ValueError, match="cross-fitting"):
        classifier_two_sample_test(f0, f0, ["u"], "fold")
    # empty snapshot
    empty = spark.createDataFrame([], "u string, v string, fold int")
    with pytest.raises(ValueError, match="two samples"):
        classifier_two_sample_test(ok, empty, ["u"], "fold")


def test_cross_fit_kills_label_leakage(spark):
    # a same-fold (leaky) rate would push AUC to 1 on ANY split; the
    # cross-fitted score on a same-population random-ish split must
    # not: u alternates independently of the snapshot tag
    rows_a = [(("a", "b")[i % 2], "x", (i // 2) % 2) for i in range(40)]
    rows_b = [(("a", "b")[(i + 1) % 2], "x", (i // 2) % 2)
              for i in range(40)]
    a, b = _frame(spark, rows_a), _frame(spark, rows_b)
    r = classifier_two_sample_test(a, b, ["u", "v"], "fold").collect()[0]
    assert r["separability"] < 0.25


def _ref_c2st(rows_a, rows_b, m=10.0):
    """Pure-Python reference: cross-fitted smoothed cell rates ->
    per-row scores -> midrank Mann-Whitney AUC. Independent of every
    Spark expression the operator compiles."""
    from collections import defaultdict

    ct = defaultdict(lambda: [0, 0])  # (cell, fold) -> [s, n]
    rows = [(tuple(r[:-1]), r[-1], 0) for r in rows_a] + \
           [(tuple(r[:-1]), r[-1], 1) for r in rows_b]
    for cell, f, y in rows:
        ct[(cell, f)][0] += y
        ct[(cell, f)][1] += 1
    tot = {f: [sum(v[0] for (c, ff), v in ct.items() if ff == f),
               sum(v[1] for (c, ff), v in ct.items() if ff == f)]
           for f in (0, 1)}
    g = {f: tot[1 - f][0] / tot[1 - f][1] for f in (0, 1)}
    scored = []
    for cell, f, y in rows:
        s, n = ct.get((cell, 1 - f), (0, 0))
        scored.append(((s + m * g[f]) / (n + m), y))
    pos = sorted(s for s, y in scored if y == 1)
    neg = sorted(s for s, y in scored if y == 0)
    wins = sum((1.0 if p > q else 0.5 if p == q else 0.0)
               for p in pos for q in neg)
    return wins / (len(pos) * len(neg))


def test_against_pure_python_reference(spark):
    # nontrivial fixture: shared cells with different rates, a
    # one-sided cell, NULL class, fold imbalance, score ties
    rows_a = [("en", "web", 0)] * 5 + [("en", "web", 1)] * 3 \
        + [("fr", "web", 0)] * 2 + [("fr", "book", 1)] * 4 \
        + [(None, "web", 0)] * 2 + [("de", "book", 1)]
    rows_b = [("en", "web", 0)] * 2 + [("en", "web", 1)] * 6 \
        + [("fr", "book", 0)] * 3 + [("fr", "book", 1)] \
        + [(None, "web", 1)] * 3 + [("es", "web", 0)] * 2
    da = spark.createDataFrame(rows_a, "u string, v string, fold int")
    db = spark.createDataFrame(rows_b, "u string, v string, fold int")
    got = classifier_two_sample_test(da, db, ["u", "v"],
                                     "fold").collect()[0]
    want = _ref_c2st(rows_a, rows_b)
    assert got["auc"] == pytest.approx(want, abs=1e-12)
    assert got["n_a"] == len(rows_a) and got["n_b"] == len(rows_b)
    import math
    sd = math.sqrt((got["n_a"] + got["n_b"] + 1)
                   / (12.0 * got["n_a"] * got["n_b"]))
    assert got["z"] == pytest.approx((want - 0.5) / sd, abs=1e-9)


def test_grouped_matches_wholeframe_and_is_independent(spark):
    from goetl_spark.quality import classifier_two_sample_test_by

    # segment g1: XOR joint drift; segment g2: identical balanced
    # snapshots (exact 0.5); per-group readouts must equal running the
    # whole-frame test on each segment alone — bit for bit
    g1_a = [("g1", u, u, i % 2) for u in ("0", "1") for i in range(10)]
    g1_b = [("g1", u, "1" if u == "0" else "0", i % 2)
            for u in ("0", "1") for i in range(10)]
    g2 = [("g2", u, v, f) for u in ("a", "b") for v in ("x", "y")
          for f in (0, 1) for _ in range(3)]
    schema = "g string, u string, v string, fold int"
    da = spark.createDataFrame(g1_a + g2, schema)
    db = spark.createDataFrame(g1_b + g2, schema)
    got = {r["g"]: r for r in classifier_two_sample_test_by(
        da, db, ["g"], ["u", "v"], "fold").collect()}
    assert set(got) == {"g1", "g2"}
    for g in ("g1", "g2"):
        whole = classifier_two_sample_test(
            da.filter(f"g = '{g}'").drop("g"),
            db.filter(f"g = '{g}'").drop("g"),
            ["u", "v"], "fold").collect()[0]
        r = got[g]
        assert (r["n_a"], r["n_b"]) == (whole["n_a"], whole["n_b"])
        assert r["auc"] == whole["auc"]
        assert r["separability"] == whole["separability"]
        assert r["z"] == whole["z"]
    assert got["g1"]["auc"] == 1.0 and got["g2"]["auc"] == 0.5


def test_grouped_degenerate_groups_null_not_raise(spark):
    from goetl_spark.quality import classifier_two_sample_test_by

    schema = "g string, u string, v string, fold int"
    # g_ok: healthy; g_oneside: only in snapshot a; g_onefold: both
    # snapshots but fold 1 never occurs in the segment
    a = ([("g_ok", "a", "x", f) for f in (0, 1, 0, 1)]
         + [("g_oneside", "a", "x", 0), ("g_oneside", "a", "x", 1)]
         + [("g_onefold", "a", "x", 0)])
    b = ([("g_ok", "b", "x", f) for f in (0, 1, 0, 1)]
         + [("g_onefold", "b", "x", 0)])
    da, db = (spark.createDataFrame(r, schema) for r in (a, b))
    got = {r["g"]: r for r in classifier_two_sample_test_by(
        da, db, ["g"], ["u", "v"], "fold").collect()}
    assert got["g_ok"]["auc"] == 1.0  # disjoint cells separate fully
    assert got["g_oneside"]["auc"] is None
    assert (got["g_oneside"]["n_a"], got["g_oneside"]["n_b"]) == (2, 0)
    assert got["g_onefold"]["auc"] is None
    assert got["g_onefold"]["z"] is None
    # fold-column bugs still raise loudly (caller bug, not degeneracy)
    import pytest as _pt
    badf = spark.createDataFrame([("g", "a", "x", 3)], schema)
    with _pt.raises(ValueError, match="must be 0 or 1"):
        classifier_two_sample_test_by(badf, db, ["g"], ["u"], "fold")
    with _pt.raises(ValueError, match="group_cols"):
        from goetl_spark.quality import classifier_two_sample_test_by \
            as f
        f(da, db, [], ["u"], "fold")


def test_grouped_against_pure_python_reference(spark):
    from goetl_spark.quality import classifier_two_sample_test_by

    # the whole-frame reference applied per segment, on an asymmetric
    # multi-segment fixture with NULL classes and fold imbalance
    rows_a = [("s1",) + r for r in
              [("en", "web", 0)] * 4 + [("en", "web", 1)] * 2
              + [(None, "web", 0)] * 2 + [("fr", "book", 1)] * 3] \
        + [("s2",) + r for r in
           [("de", "web", 0)] * 3 + [("de", "book", 1)] * 2]
    rows_b = [("s1",) + r for r in
              [("en", "web", 0)] * 1 + [("en", "web", 1)] * 5
              + [(None, "web", 1)] * 2 + [("fr", "book", 0)] * 2] \
        + [("s2",) + r for r in
           [("de", "book", 0)] * 2 + [("de", "web", 1)] * 4]
    schema = "g string, u string, v string, fold int"
    da = spark.createDataFrame(rows_a, schema)
    db = spark.createDataFrame(rows_b, schema)
    got = {r["g"]: r for r in classifier_two_sample_test_by(
        da, db, ["g"], ["u", "v"], "fold").collect()}
    for g in ("s1", "s2"):
        want = _ref_c2st([r[1:] for r in rows_a if r[0] == g],
                         [r[1:] for r in rows_b if r[0] == g])
        assert got[g]["auc"] == pytest.approx(want, abs=1e-12), g


def test_grouped_counts_compose_equals_direct(spark):
    """c2st_from_counts_by(cell_fold_counts(a), cell_fold_counts(b))
    == classifier_two_sample_test_by(a, b) bit-for-bit — the grouped
    counts-sufficiency law (rows in the same (group, cell, fold)
    share one score), on a fixture with healthy AND degenerate
    segments (one group entirely missing from side b, one missing a
    fold)."""
    from goetl_spark.quality import (
        c2st_from_counts_by, cell_fold_counts,
        classifier_two_sample_test_by)

    rows_a = ([("g0", f"c{i % 3}", i % 2) for i in range(40)]
              + [("g1", f"c{i % 2}", i % 2) for i in range(30)]
              + [("gb_dropped", "c0", 0), ("gb_dropped", "c1", 1)]
              + [("g_onefold", "c0", 0), ("g_onefold", "c1", 0)])
    rows_b = ([("g0", f"c{(i * 7) % 3}", i % 2) for i in range(35)]
              + [("g1", f"c{i % 2}", (i + 1) % 2) for i in range(25)]
              + [("g_onefold", "c0", 0)])
    a = spark.createDataFrame(rows_a, "g string, u string, fold int")
    b = spark.createDataFrame(rows_b, "g string, u string, fold int")
    direct = {r["g"]: tuple(r) for r in classifier_two_sample_test_by(
        a, b, ["g"], ["u"], "fold").collect()}
    composed = {r["g"]: tuple(r) for r in c2st_from_counts_by(
        cell_fold_counts(a, ["g", "u"], "fold"),
        cell_fold_counts(b, ["g", "u"], "fold"),
        ["g"], ["u"]).collect()}
    assert composed == direct
    # non-vacuous: the degenerate segments are present and NULL
    assert direct["gb_dropped"][3] is None
    assert direct["g_onefold"][3] is None
    assert direct["g0"][3] is not None


def test_grouped_counts_compose_validation(spark):
    from goetl_spark.quality import c2st_from_counts_by, cell_fold_counts

    a = spark.createDataFrame([("g", "c0", 0), ("g", "c1", 1)],
                              "g string, u string, fold int")
    ca = cell_fold_counts(a, ["g", "u"], "fold")
    import pytest as _pt
    with _pt.raises(ValueError, match="group_cols"):
        c2st_from_counts_by(ca, ca, [], ["u"])
    bad = spark.createDataFrame([("g", "c0", 2, 5)],
                                "g string, u string, __f int, n long")
    with _pt.raises(ValueError, match="must be 0 or"):
        c2st_from_counts_by(ca, bad, ["g"], ["u"])
