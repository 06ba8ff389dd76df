"""Property-based tests for the round-12 operator family (hypothesis,
Spark-backed with capped examples — the test_properties.py convention):
the rollup merge contract, seasonal decomposition invariances, ACF
bounds, k-anonymity post-conditions, and target-encode shrinkage."""
from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_TS0 = dt.datetime(2024, 1, 1)

# (hour offset, key id, value in a grid-friendly range)
_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=72),
              st.integers(min_value=0, max_value=2),
              st.integers(min_value=-500, max_value=500)),
    min_size=1, max_size=40)


def _edf(spark, rows):
    data = [(f"k{k}", _TS0 + dt.timedelta(hours=h, minutes=(h * 7) % 60),
             v / 8.0) for h, k, v in rows]
    return spark.createDataFrame(
        data, "event_type string, ts timestamp, value double")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events, _events)
def test_rollup_merge_equals_direct(spark, a_rows, b_rows):
    """merge(rollup(a), rollup(b)) == rollup(a ∪ b) bit-for-bit — the
    continuous-aggregate contract for ARBITRARY splits, not just the
    even/odd split q209 pins."""
    from goetl_spark.operators.timeseries import hypertable_rollup, rollup_merge

    a, b = _edf(spark, a_rows), _edf(spark, b_rows)
    grains = ("hour", "day")
    merged = rollup_merge(
        hypertable_rollup(a, "ts", ["event_type"], "value", grains),
        hypertable_rollup(b, "ts", ["event_type"], "value", grains),
        ["event_type"])
    direct = hypertable_rollup(a.unionByName(b), "ts", ["event_type"],
                               "value", grains)
    cols = ["grain", "bucket", "event_type", "n", "sum_dec", "vmin", "vmax"]
    assert (sorted(map(tuple, merged.select(*cols).collect()))
            == sorted(map(tuple, direct.select(*cols).collect())))


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(min_value=-40, max_value=40))
def test_seasonal_decompose_shift_invariance(spark, shift):
    """Adding a constant to a gap-free series shifts value and trend by
    that constant and leaves the seasonal profile unchanged (it is the
    centered detrended phase effect)."""
    from goetl_spark.operators.timeseries import seasonal_decompose

    rows = [("k", _TS0 + dt.timedelta(hours=i),
             10.0 + ((i % 24) - 11.5) / 4.0) for i in range(24 * 4)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                                     "value double")
    base = seasonal_decompose(df, "ts", ["event_type"], "value")
    shifted = seasonal_decompose(
        df.withColumn("value", F.col("value") + F.lit(float(shift))),
        "ts", ["event_type"], "value")
    b = {r["bucket"]: r for r in base.collect()}
    s = {r["bucket"]: r for r in shifted.collect()}
    for k, rb in b.items():
        rs = s[k]
        assert abs(rs["value"] - rb["value"] - shift) < 1e-9
        if rb["trend"] is not None:
            assert abs(rs["trend"] - rb["trend"] - shift) < 1e-9
        if rb["seasonal"] is not None:
            assert abs(rs["seasonal"] - rb["seasonal"]) < 1e-9


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_acf_within_pearson_bounds(spark, rows):
    """Every defined ACF value is a Pearson correlation: |acf| <= 1
    (+ tiny float slack), and n decreases with the lag."""
    from goetl_spark.operators.timeseries import acf

    out = acf(_edf(spark, rows), "ts", ["event_type"], "value",
              lags=(1, 2)).collect()
    by_key = {}
    for r in out:
        if r["acf"] is not None:
            assert abs(r["acf"]) <= 1.0 + 1e-9, r
        by_key.setdefault(r["event_type"], {})[r["lag"]] = r["n"]
    for ns in by_key.values():
        if 1 in ns and 2 in ns:
            assert ns[2] <= ns[1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                          st.integers(min_value=0, max_value=3)),
                min_size=1, max_size=40),
       st.integers(min_value=2, max_value=5))
def test_suppression_output_is_k_anonymous(spark, pairs, k):
    """suppress_small_groups' output re-checks as fully k-anonymous,
    and it removed EXACTLY the rows of under-k classes."""
    from goetl_spark.quality import k_anonymity_report, suppress_small_groups

    df = spark.createDataFrame(
        [(f"s{a}", b) for a, b in pairs], "seg string, nat int")
    kept = suppress_small_groups(df, ["seg", "nat"], k)
    recheck = k_anonymity_report(kept, ["seg", "nat"], k).collect()
    assert all(r["k_ok"] for r in recheck)
    from collections import Counter
    sizes = Counter((f"s{a}", b) for a, b in pairs)
    want_kept = sum(n for n in sizes.values() if n >= k)
    assert kept.count() == want_kept


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=-100, max_value=100)),
                min_size=2, max_size=30),
       st.floats(min_value=0.5, max_value=50.0))
def test_target_encode_shrinks_toward_global_mean(spark, pairs, m):
    """Every category's encoding lies between its raw mean and the
    global mean (inclusive) — the definition of pseudo-count
    shrinkage."""
    from goetl_spark.operators.encoding import target_encode

    df = spark.createDataFrame(
        [(f"c{a}", float(v)) for a, v in pairs], "cat string, y double")
    enc = {r["cat"]: r["target_enc"]
           for r in target_encode(df, ["cat"], "y", smoothing=m)
           .select("cat", "target_enc").distinct().collect()}
    vals = [float(v) for _, v in pairs]
    gmean = sum(vals) / len(vals)
    from collections import defaultdict
    per = defaultdict(list)
    for a, v in pairs:
        per[f"c{a}"].append(float(v))
    for cat, xs in per.items():
        raw = sum(xs) / len(xs)
        lo, hi = min(raw, gmean), max(raw, gmean)
        assert lo - 1e-9 <= enc[cat] <= hi + 1e-9, (cat, raw, gmean, enc[cat])
