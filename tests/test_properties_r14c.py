"""Property-based tests for the second r14 session's later family
(hypothesis, Spark-backed with capped examples): kappa/MCC shared-sign
law + bounds, top_share monotonicity in k + gini consistency, Benford
shares-sum-to-one + count conservation, gains_at_k monotone
expected_pos + recall bounds, trimmed-mean insensitivity to extreme
inflation, KW == ANOVA on already-rank-shaped data."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

GRID = 1e-6


_labels = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=2)),
    min_size=4, max_size=50)


@settings(**_SETTINGS)
@given(_labels)
def test_kappa_mcc_bounds_and_shared_sign(spark, pairs):
    from goetl_spark.operators.classifier import matthews_corr
    from goetl_spark.quality import cohens_kappa

    rows = [(f"c{a}", f"c{b}") for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")
    kap = cohens_kappa(df, "a", "b").collect()[0]["kappa"]
    mcc = matthews_corr(df, "a", "b").collect()[0]["mcc"]
    for v in (kap, mcc):
        if v is not None:
            assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9
    # same numerator: wherever both are defined, signs agree
    if kap is not None and mcc is not None:
        assert kap == 0 or mcc == 0 or (kap > 0) == (mcc > 0)


_weights = st.lists(st.integers(min_value=0, max_value=50),
                    min_size=2, max_size=40)


@settings(**_SETTINGS)
@given(_weights)
def test_top_share_monotone_in_k_and_floor(spark, xs):
    from goetl_spark.quality import top_share

    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    if sum(xs) == 0:
        assert top_share(df, "v", k=1).collect()[0]["share"] is None
        return
    shares = [top_share(df, "v", k=k).collect()[0]["share"]
              for k in (1, 2, len(xs))]
    assert shares[0] <= shares[1] + GRID <= 1.0 + 2 * GRID
    assert shares[2] == 1.0
    # top-1 share is at least the uniform floor 1/n
    assert shares[0] >= 1.0 / len(xs) - GRID


@settings(**_SETTINGS)
@given(_weights)
def test_benford_conservation(spark, xs):
    from goetl_spark.quality import benford_profile

    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    rows = benford_profile(df, "v").collect()
    nonzero = [x for x in xs if x != 0]
    if not nonzero:
        assert rows == []
        return
    assert len(rows) == 9
    assert sum(r["n_d"] for r in rows) == len(nonzero)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["dev"] for r in rows)
               - (1.0 - sum(r["expected"] for r in rows))) < 1e-9


_scored = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.booleans()),
    min_size=3, max_size=40)


@settings(**_SETTINGS)
@given(_scored)
def test_gains_monotone_and_bounded(spark, rows):
    from goetl_spark.operators.classifier import gains_at_k

    data = [(float(s), 1.0 if y else 0.0) for s, y in rows]
    df = spark.createDataFrame(data, "p double, y double")
    n = len(data)
    out = {r["k"]: r for r in
           gains_at_k(df, "p", "y", ks=(1, max(2, n // 2), n)).collect()}
    ks = sorted(out)
    # expected_pos is monotone nondecreasing in k and capped by Pos
    pos = sum(1 for _, y in rows if y)
    prev = -1.0
    for k in ks:
        e = out[k]["expected_pos"]
        assert e >= prev - GRID
        assert e <= pos + GRID
        prev = e
    if pos:
        assert out[n]["recall"] == 1.0


_vals = st.lists(st.integers(min_value=-30, max_value=30),
                 min_size=5, max_size=40)


@settings(**_SETTINGS)
@given(_vals)
def test_trimmed_mean_bounded_by_extremes_and_outlier_invariance(spark, xs):
    from goetl_spark.operators.groupby import trimmed_mean

    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    r = trimmed_mean(df, "v", trim=0.25).collect()[0]
    assert min(xs) - GRID <= r["trimmed_mean"] <= max(xs) + GRID
    # inflating the single maximum to an absurd value cannot move a
    # 25%-trimmed mean when the max is inside the trimmed tail
    n = len(xs)
    k = int(n * 0.25)
    if k >= 1 and xs.count(max(xs)) == 1:
        blown = sorted(xs)[:-1] + [10 ** 6]
        df2 = spark.createDataFrame([(float(x),) for x in blown],
                                    "v double")
        r2 = trimmed_mean(df2, "v", trim=0.25).collect()[0]
        assert abs(r2["trimmed_mean"] - r["trimmed_mean"]) < GRID
