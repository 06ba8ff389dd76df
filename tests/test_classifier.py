"""Model-based quality classifier (operators/classifier.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

PROSE = ("The old lighthouse keeper walked along the shore and watched "
         "the boats come in with the evening tide, thinking of all the "
         "storms that he had seen across the years. ")
NOISE = "xK9$ 00%% @@## 77zz !!qq ~~vv 33JJ &&pp ^^dd 55hh "


def _labeled(spark, n=40):
    rows = [(i, PROSE * (1 + i % 3), 1.0) for i in range(n)] + \
           [(100 + i, NOISE * (1 + i % 3), 0.0) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label double")


def test_text_features_null_safe(spark):
    from goetl_spark.operators.classifier import (
        QUALITY_FEATURES, text_features)

    df = spark.createDataFrame(
        [(1, "The cat sat."), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in text_features(df).collect()}
    for fid in (1, 2, 3):
        for f in QUALITY_FEATURES:
            v = rows[fid][f]
            assert v is not None and v == v, (fid, f, v)  # no NULL/NaN
    assert rows[1].f_stopword_ratio > 0
    assert rows[2].f_log_chars == 0.0


def test_classifier_separates_prose_from_noise(spark):
    from goetl_spark.operators.classifier import (
        score_quality, train_quality_classifier)

    model = train_quality_classifier(_labeled(spark))
    test = spark.createDataFrame(
        [(1, PROSE * 2), (2, NOISE * 2)], "doc_id long, text string")
    out = {r.doc_id: r.quality_prob for r in
           score_quality(test, model).collect()}
    assert out[1] > 0.9 and out[2] < 0.1
    # scoring keeps original columns and appends exactly quality_prob
    cols = score_quality(test, model).columns
    assert cols == ["doc_id", "text", "quality_prob"]


def test_classifier_threshold_filters_corpus(spark):
    from goetl_spark.operators.classifier import (
        score_quality, train_quality_classifier)

    model = train_quality_classifier(_labeled(spark))
    mixed = spark.createDataFrame(
        [(i, PROSE) for i in range(10)] +
        [(50 + i, NOISE) for i in range(10)],
        "doc_id long, text string")
    kept = (score_quality(mixed, model)
            .filter(F.col("quality_prob") >= 0.5)
            .select("doc_id").collect())
    assert {r.doc_id for r in kept} == set(range(10))


def test_expression_scorer_matches_ml_transform(spark):
    """score_quality inlines the fitted coefficients as expressions; it
    must reproduce pyspark.ml's own transform probabilities."""
    from pyspark.ml.functions import vector_to_array
    from goetl_spark.operators.classifier import (
        score_quality, text_features, train_quality_classifier)

    model = train_quality_classifier(_labeled(spark))
    test = spark.createDataFrame(
        [(1, PROSE), (2, NOISE), (3, PROSE + NOISE), (4, "")],
        "doc_id long, text string")
    ours = {r.doc_id: r.quality_prob
            for r in score_quality(test, model).collect()}
    try:
        ml = {r.doc_id: r.p for r in
              model.transform(text_features(test))
              .select("doc_id", vector_to_array("probability")[1].alias("p"))
              .collect()}
    except Exception as e:  # pragma: no cover - session-order dependent
        if "ObservationManager" in str(e):
            # Spark 4.1: executing an ml.transform plan fails once any
            # Observation is registered in the session (the very bug
            # score_quality's expression scorer avoids); equivalence is
            # only checkable in an observation-free session
            import pytest
            pytest.skip("ml.transform unexecutable after Observations "
                        "(SPARK ObservationManager serialization bug)")
        raise
    for d in ours:
        assert abs(ours[d] - ml[d]) < 1e-9, (d, ours[d], ml[d])


def test_classification_metrics_hand_computed(spark):
    from goetl_spark.operators.classifier import classification_metrics

    rows = ([("a", "a")] * 3 + [("a", "b")] + [("b", "b")] * 2 +
            [("b", "a")] + [("c", "a")] + [(None, "a")] + [("a", None)])
    df = spark.createDataFrame(rows, "label string, pred string")
    got = {r["cls"]: r for r in
           classification_metrics(df, "label", "pred").collect()}
    assert set(got) == {"a", "b", "c", None}

    a = got["a"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (3, 3, 2, 5)
    assert a["precision"] == 0.5 and a["recall"] == 3 / 5
    assert a["f1"] == 6 / 11  # closed form 2tp/(2tp+fp+fn)

    b = got["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (2, 1, 1)
    assert b["precision"] == b["recall"] == b["f1"] == 2 / 3

    c = got["c"]  # never predicted: precision undefined, NOT 0
    assert c["precision"] is None
    assert c["recall"] == 0.0 and c["f1"] == 0.0

    n = got[None]  # NULL labels/preds are their own class
    assert (n["tp"], n["fp"], n["fn"], n["support"]) == (0, 1, 1, 1)
    assert n["precision"] == 0.0 and n["recall"] == 0.0


def test_classification_metrics_perfect_and_partition_independent(spark):
    from goetl_spark.operators.classifier import classification_metrics

    rows = [("x", "x")] * 4 + [("y", "y")] * 2
    df = spark.createDataFrame(rows, "label string, pred string")
    for r in classification_metrics(df, "label", "pred").collect():
        assert r["precision"] == r["recall"] == r["f1"] == 1.0
    big = spark.createDataFrame(
        [(f"c{i % 7}", f"c{(i * 3) % 7}") for i in range(200)],
        "label string, pred string")
    one = sorted(map(tuple,
                     classification_metrics(big, "label", "pred").collect()))
    two = sorted(map(tuple, classification_metrics(
        big.repartition(13), "label", "pred").collect()))
    assert one == two


def test_calibration_bins_hand_computed(spark):
    from goetl_spark.operators.classifier import calibration_bins

    rows = [(0.05, 0.0), (0.05, 1.0),          # bin 0: obs 1/2, mid 0.05
            (0.95, 1.0), (0.95, 1.0), (0.85, 0.0),  # bins 9/8
            (1.0, 1.0),                          # exactly 1.0 -> last bin
            (0.2, 0.0)]                          # edge 0.2 -> bin 2 (up)
    df = spark.createDataFrame(rows, "p double, y double")
    got = {r["bin_id"]: r for r in
           calibration_bins(df, "p", "y", n_bins=10).collect()}
    assert set(got) == {0, 2, 8, 9}
    b0 = got[0]
    assert (b0["n"], b0["n_pos"]) == (2, 1)
    assert b0["midpoint"] == 0.05 and b0["obs_rate"] == 0.5
    assert b0["ece_term"] == abs(0.5 - 0.05) * 2 / 7
    b9 = got[9]  # 0.95 x2 + the exact-1.0 row
    assert (b9["n"], b9["n_pos"]) == (3, 3)
    assert b9["obs_rate"] == 1.0 and b9["midpoint"] == 0.95
    assert got[2]["n"] == 1  # boundary score goes to the upper bin
    # ECE of a perfectly sharp bin is small but nonzero (midpoint gap)
    total_ece = sum(float(r["ece_term"]) for r in got.values())
    assert 0.0 < total_ece < 1.0


def test_calibration_bins_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.classifier import calibration_bins

    ok = spark.createDataFrame([(0.5, 1.0)], "p double, y double")
    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(ok, "p", "y", n_bins=0)
    for bad_rows in ([(1.5, 1.0)], [(None, 1.0)], [(0.5, None)]):
        bad = spark.createDataFrame(bad_rows, "p double, y double")
        with _pytest.raises(ValueError, match="calibration_bins"):
            calibration_bins(bad, "p", "y")


def test_roc_auc_hand_computed_with_ties(spark):
    from goetl_spark.operators.classifier import roc_auc

    # scores: 0.1(n) 0.4(p) 0.4(n) 0.9(p)  -> midrank ties at 0.4
    rows = [(0.1, 0.0), (0.4, 1.0), (0.4, 0.0), (0.9, 1.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    r = roc_auc(df, "p", "y").collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
    # ranks: 0.1->1, both 0.4->2.5, 0.9->4; sum_pos = 2.5 + 4 = 6.5
    # auc = (6.5 - 2*3/2) / (2*2) = 3.5/4
    assert r["auc"] == 3.5 / 4

    perfect = spark.createDataFrame(
        [(0.1, 0.0), (0.2, 0.0), (0.8, 1.0), (0.9, 1.0)],
        "p double, y double")
    assert roc_auc(perfect, "p", "y").collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(0.9, 0.0), (0.8, 0.0), (0.1, 1.0)], "p double, y double")
    assert roc_auc(inverted, "p", "y").collect()[0]["auc"] == 0.0
    all_tied = spark.createDataFrame(
        [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0)], "p double, y double")
    assert all_tied and roc_auc(all_tied, "p", "y").collect()[0]["auc"] == 0.5


def test_roc_auc_matches_sklearn_formula_and_partitioning(spark):
    from goetl_spark.operators.classifier import roc_auc

    rows = [((i * 37 % 100) / 100.0, float((i * 13 % 7) < 3))
            for i in range(400)]
    df = spark.createDataFrame(rows, "p double, y double")

    def ref(pairs):  # midrank AUC, pure python
        from collections import Counter
        n_by = Counter(p for p, _ in pairs)
        order = sorted(n_by)
        cum, rank_of = 0, {}
        for s in order:
            rank_of[s] = cum + (n_by[s] + 1) / 2
            cum += n_by[s]
        pos = [rank_of[p] for p, y in pairs if y > 0]
        np_, nn = len(pos), len(pairs) - len(pos)
        return (sum(pos) - np_ * (np_ + 1) / 2) / (np_ * nn)

    got = roc_auc(df, "p", "y").collect()[0]["auc"]
    assert abs(got - ref(rows)) < 1e-12
    again = roc_auc(df.repartition(13), "p", "y").collect()[0]["auc"]
    assert again == got  # exact-integer rank sums: partition-independent


def test_roc_auc_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.classifier import roc_auc

    with _pytest.raises(ValueError, match="NULL"):
        roc_auc(spark.createDataFrame([(None, 1.0)], "p double, y double"),
                "p", "y")
    with _pytest.raises(ValueError, match="single-class"):
        roc_auc(spark.createDataFrame([(0.5, 1.0), (0.6, 1.0)],
                                      "p double, y double"), "p", "y")


def test_pr_auc_hand_computed_and_sklearn_parity(spark):
    from goetl_spark.operators.classifier import pr_auc

    # descending: 0.9(p) | 0.4 tie group (1p,1n) | 0.1(n)
    rows = [(0.1, 0.0), (0.4, 1.0), (0.4, 0.0), (0.9, 1.0)]
    df = spark.createDataFrame(rows, "p double, y double")
    r = pr_auc(df, "p", "y").collect()[0]
    # groups desc: 0.9 -> dR=1/2, P=1/1; 0.4 -> dR=1/2, P=2/3; 0.1 -> 0
    want = round(0.5 * 1.0, 9) + round(0.5 * (2 / 3), 9)
    assert abs(r["average_precision"] - want) < 1e-12
    assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)

    perfect = spark.createDataFrame(
        [(0.1, 0.0), (0.8, 1.0), (0.9, 1.0)], "p double, y double")
    assert pr_auc(perfect, "p", "y").collect()[0][
        "average_precision"] == 1.0

    def ref(pairs):  # sklearn's threshold AP, pure python
        from collections import defaultdict
        g = defaultdict(lambda: [0, 0])
        for p, y in pairs:
            g[p][0] += 1
            g[p][1] += int(y > 0)
        np_ = sum(v[1] for v in g.values())
        nc = tc = 0
        ap = 0.0
        for s in sorted(g, reverse=True):
            n, tp = g[s]
            nc, tc = nc + n, tc + tp
            if tp:
                ap += round(tp / np_ * (tc / nc), 9)
        return ap

    rows2 = [((i * 37 % 100) / 100.0, float((i * 13 % 7) < 2))
             for i in range(300)]
    df2 = spark.createDataFrame(rows2, "p double, y double")
    got = pr_auc(df2, "p", "y").collect()[0]["average_precision"]
    assert abs(got - ref(rows2)) < 1e-9
    again = pr_auc(df2.repartition(11), "p", "y").collect()[0][
        "average_precision"]
    assert again == got  # rounded-decimal sum: partition-independent


def test_pr_auc_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.classifier import pr_auc

    with _pytest.raises(ValueError, match="NULL"):
        pr_auc(spark.createDataFrame([(0.5, None)], "p double, y double"),
               "p", "y")
    with _pytest.raises(ValueError, match="single-class"):
        pr_auc(spark.createDataFrame([(0.5, 0.0), (0.6, 0.0)],
                                     "p double, y double"), "p", "y")


def test_eval_ops_reject_nan_scores(spark):
    # r13 advisor item 1: NaN fails both (p < 0) and (p > 1), so the
    # old guards silently binned/ranked it — now rejected loudly
    import pytest as _pytest

    from goetl_spark.operators.classifier import (
        calibration_bins, pr_auc, roc_auc)

    nan = spark.createDataFrame(
        [(float("nan"), 1.0), (0.5, 0.0), (0.7, 1.0)],
        "p double, y double")
    with _pytest.raises(ValueError, match="NaN"):
        calibration_bins(nan, "p", "y")
    with _pytest.raises(ValueError, match="NaN"):
        roc_auc(nan, "p", "y")
    with _pytest.raises(ValueError, match="NaN"):
        pr_auc(nan, "p", "y")


def test_grouped_auc_matches_whole_frame_per_slice(spark):
    # roc_auc_by / pr_auc_by (r13 verdict ask #4): per-group results
    # must equal the whole-frame operators run on each slice — bit-
    # exact, including a NULL group key (its own segment)
    from pyspark.sql import functions as F

    from goetl_spark.operators.classifier import (
        pr_auc, pr_auc_by, roc_auc, roc_auc_by)

    rows = [(("g%d" % (i % 3)) if i % 11 else None,
             (i * 37 % 100) / 100.0, float((i * 13 % 7) < 3))
            for i in range(500)]
    df = spark.createDataFrame(rows, "g string, p double, y double")
    got = {r["g"]: r for r in roc_auc_by(df, ["g"], "p", "y").collect()}
    gotp = {r["g"]: r for r in pr_auc_by(df, ["g"], "p", "y").collect()}
    assert set(got) == {None, "g0", "g1", "g2"}
    for gval in got:
        sl = df.filter(F.col("g").isNull() if gval is None
                       else (F.col("g") == gval))
        w = roc_auc(sl, "p", "y").collect()[0]
        assert got[gval]["auc"] == w["auc"]
        assert (got[gval]["n"], got[gval]["n_pos"], got[gval]["n_neg"]) \
            == (w["n"], w["n_pos"], w["n_neg"])
        wp = pr_auc(sl, "p", "y").collect()[0]
        assert gotp[gval]["average_precision"] == wp["average_precision"]
    # partition independence (exact integer/decimal machinery)
    key = str
    a = sorted(map(tuple, roc_auc_by(df, ["g"], "p", "y").collect()),
               key=key)
    b = sorted(map(tuple,
                   roc_auc_by(df.repartition(13), ["g"], "p", "y")
                   .collect()), key=key)
    assert a == b


def test_grouped_auc_single_class_group_is_null_and_guards(spark):
    import pytest as _pytest

    from goetl_spark.operators.classifier import pr_auc_by, roc_auc_by

    rows = [("g0", 0.1, 0.0), ("g0", 0.9, 1.0),
            ("solo", 0.5, 1.0), ("solo", 0.6, 1.0)]
    df = spark.createDataFrame(rows, "g string, p double, y double")
    r = {x["g"]: x for x in roc_auc_by(df, ["g"], "p", "y").collect()}
    assert r["solo"]["auc"] is None  # undefined, not a coin-flip 0.5
    assert r["g0"]["auc"] == 1.0
    rp = {x["g"]: x for x in pr_auc_by(df, ["g"], "p", "y").collect()}
    assert rp["solo"]["average_precision"] is None
    assert rp["g0"]["average_precision"] == 1.0
    # empty group list routes to the whole-frame ops
    with _pytest.raises(ValueError, match="roc_auc"):
        roc_auc_by(df, [], "p", "y")
    with _pytest.raises(ValueError, match="pr_auc"):
        pr_auc_by(df, [], "p", "y")
    # NaN score / NULL label raise at execution (lazy assert_true)
    bad = df.union(spark.createDataFrame([("g0", float("nan"), 1.0)],
                                         df.schema))
    with _pytest.raises(Exception, match="NaN"):
        roc_auc_by(bad, ["g"], "p", "y").collect()
    bad2 = df.union(spark.createDataFrame([("g0", 0.5, None)], df.schema))
    with _pytest.raises(Exception, match="NULL"):
        pr_auc_by(bad2, ["g"], "p", "y").collect()


def test_calibration_bins_by_matches_whole_frame_and_guards(spark):
    from pyspark.sql import functions as F

    from goetl_spark.operators.classifier import (calibration_bins,
                                                  calibration_bins_by)

    rows = [(("g%d" % (i % 2)) if i % 9 else None,
             (i * 37 % 101) / 100.0, float((i * 13 % 7) < 3))
            for i in range(400)]
    df = spark.createDataFrame(rows, "g string, p double, y double")
    got = {}
    for r in calibration_bins_by(df, ["g"], "p", "y", n_bins=5).collect():
        got.setdefault(r["g"], {})[r["bin_id"]] = r
    for gval in [None, "g0", "g1"]:
        sl = df.filter(F.col("g").isNull() if gval is None
                       else (F.col("g") == gval))
        want = {r["bin_id"]: r
                for r in calibration_bins(sl, "p", "y", n_bins=5).collect()}
        assert set(got[gval]) == set(want)
        for b in want:
            gw, ww = got[gval][b], want[b]
            assert (gw["n"], gw["n_pos"], gw["midpoint"], gw["obs_rate"],
                    gw["ece_term"]) == (ww["n"], ww["n_pos"],
                                        ww["midpoint"], ww["obs_rate"],
                                        ww["ece_term"])
    import pytest as _pytest

    # a group consisting ENTIRELY of bad rows must still raise (the
    # assert lives on the broadcast totals side, not the filtered rows)
    allbad = df.union(spark.createDataFrame([("solo", 1.5, 1.0)],
                                            df.schema))
    with _pytest.raises(Exception, match="calibration_bins_by"):
        calibration_bins_by(allbad, ["g"], "p", "y").collect()
    nan = df.union(spark.createDataFrame([("g0", float("nan"), 1.0)],
                                         df.schema))
    with _pytest.raises(Exception, match="calibration_bins_by"):
        calibration_bins_by(nan, ["g"], "p", "y").collect()
    with _pytest.raises(ValueError, match="whole-frame"):
        calibration_bins_by(df, [], "p", "y")


def test_auc_empty_input_clean_error(spark):
    import pytest as _pytest

    from goetl_spark.operators.classifier import pr_auc, roc_auc

    empty = spark.createDataFrame([], "p double, y double")
    with _pytest.raises(ValueError, match="empty"):
        roc_auc(empty, "p", "y")
    with _pytest.raises(ValueError, match="empty"):
        pr_auc(empty, "p", "y")
