"""Property-based tests for the round-13 operator family (hypothesis,
Spark-backed with capped examples — the test_properties.py convention):
retrieval metrics vs a pure-Python reference, LOO-encoding leakage and
consistency laws, PSI bounds and split-additivity of its counts,
transition-matrix row-stochasticity, classification-metric count
identities, and association-rule invariants."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

# ranked runs: per query a permutation prefix; qrels: subsets of docs
_runs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),    # query id
              st.integers(min_value=0, max_value=30)),  # doc id
    min_size=1, max_size=60)
_rels = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=40)


def _py_metrics(run_rows, rel_rows, k):
    """Pure-Python reference for retrieval_metrics."""
    from collections import defaultdict
    ranked = defaultdict(list)
    seen = defaultdict(set)
    for q, d in run_rows:
        if d not in seen[q]:
            seen[q].add(d)
            ranked[q].append(d)
    rels = defaultdict(set)
    for q, d in rel_rows:
        rels[q].add(d)
    out = {}
    for q, rel in rels.items():
        top = ranked.get(q, [])[:k]
        hits = [(i + 1, d) for i, d in enumerate(top) if d in rel]
        n = len(hits)
        first = hits[0][0] if hits else None
        ap = (sum((j + 1) / r for j, (r, _) in enumerate(hits))
              / min(len(rel), k)) if hits else 0.0
        out[q] = (len(rel), n, n / len(rel), n / k,
                  (1 / first) if first else 0.0, ap)
    return out


@settings(**_SETTINGS)
@given(_runs, _rels, st.integers(min_value=1, max_value=7))
def test_retrieval_metrics_match_python_reference(spark, run_rows,
                                                  rel_rows, k):
    from goetl_spark.operators.ranking import retrieval_metrics

    # build a valid ranked run: unique docs per query, 1-based ranks
    from collections import defaultdict
    seen, rows = defaultdict(set), []
    for q, d in run_rows:
        if d not in seen[q]:
            seen[q].add(d)
            rows.append((q, d, len(seen[q])))
    run = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long")
    qrels = spark.createDataFrame(list(set(rel_rows)),
                                  "query_id long, neighbor_id long")
    got = {r["query_id"]:
           (r["nrel"], r["hits_at_k"], r["recall_at_k"],
            r["precision_at_k"], r["mrr_at_k"], r["ap_at_k"])
           for r in retrieval_metrics(run, qrels, k=k).collect()}
    want = _py_metrics(run_rows, set(rel_rows), k)
    assert set(got) == set(want)
    for q in want:
        for g, w in zip(got[q], want[q]):
            assert abs(g - w) < 1e-12, (q, got[q], want[q])


_cats = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", None]),
              st.one_of(st.none(),
                        st.integers(min_value=-50, max_value=50))),
    min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(_cats)
def test_loo_leakage_and_consistency_laws(spark, rows):
    """Two laws: (1) a class's LOO encodings differ between rows iff
    their own targets differ; (2) every NULL-target row in a class with
    observed targets gets EXACTLY the plain target_encode value."""
    from goetl_spark.operators.encoding import target_encode, target_encode_loo

    data = [(c, float(v) if v is not None else None) for c, v in rows]
    df = spark.createDataFrame(data, "cat string, y double")
    if df.filter(F.col("y").isNotNull()).count() == 0:
        return  # all-NULL target raises by contract; not this test
    loo = target_encode_loo(df, ["cat"], "y", smoothing=3.0).collect()
    plain = {r["cat"]: r["target_enc"] for r in
             target_encode(df, ["cat"], "y", smoothing=3.0)
             .select("cat", "target_enc").distinct().collect()}
    by_class = {}
    for r in loo:
        by_class.setdefault(r["cat"], []).append((r["y"], r["target_enc_loo"]))
    for cat, pairs in by_class.items():
        for y, enc in pairs:
            if y is None:
                assert enc == plain[cat]  # nothing to leak -> plain value
        obs = [(y, e) for y, e in pairs if y is not None]
        for (y1, e1) in obs:
            for (y2, e2) in obs:
                if y1 == y2:
                    assert e1 == e2
                else:
                    assert e1 != e2  # self-exclusion separates them


_vals = st.lists(st.one_of(st.none(),
                           st.integers(min_value=-100, max_value=100)),
                 min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_vals, _vals)
def test_psi_counts_split_additive_and_terms_signed(spark, xs, ys):
    """bin_counts is additive over arbitrary splits (the streaming
    monitor's whole contract), and each PSI term is >= 0 exactly when
    sign(share_a - share_b) agrees with sign(ln ratio) — i.e. terms
    are never negative."""
    from goetl_spark.quality import bin_counts, psi_from_counts

    breaks = [-25.0, 0.0, 25.0]
    a = spark.createDataFrame([(float(v) if v is not None else None,)
                               for v in xs], "v double")
    b = spark.createDataFrame([(float(v) if v is not None else None,)
                               for v in ys], "v double")
    u = a.unionByName(b)
    split_sum = (bin_counts(a, "v", breaks)
                 .unionByName(bin_counts(b, "v", breaks))
                 .groupBy("bin_id").agg(F.sum("n").alias("n")))
    direct = bin_counts(u, "v", breaks)
    assert (sorted(map(tuple, split_sum.collect()))
            == sorted(map(tuple, direct.collect())))
    for r in psi_from_counts(bin_counts(a, "v", breaks),
                             bin_counts(b, "v", breaks),
                             n_bins=5).collect():
        assert float(r["psi_term"]) >= 0.0  # (p-q)ln(p/q) >= 0 always


_chains = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),   # user
              st.sampled_from(["a", "b", "c", None])),  # state
    min_size=2, max_size=50)


@settings(**_SETTINGS)
@given(_chains)
def test_transition_matrix_row_stochastic(spark, rows):
    import datetime as dt

    from goetl_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    data = [(u, t0 + dt.timedelta(minutes=i), i, s)
            for i, (u, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, et string")
    out = transition_matrix(df, "user_id", "ts", "et",
                            order_cols=["event_id"]).collect()
    if not out:
        return
    sums = {}
    for r in out:
        sums.setdefault(r["src"], 0.0)
        sums[r["src"]] += r["p"]
        assert r["n"] <= r["n_src_total"]
    for s, tot in sums.items():
        assert abs(tot - 1.0) < 1e-9, (s, tot)


_preds = st.lists(
    st.tuples(st.sampled_from(["x", "y", "z", None]),
              st.sampled_from(["x", "y", "z", None])),
    min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_preds)
def test_classification_metric_count_identities(spark, rows):
    """Global identities: Σtp + Σfn == total rows == Σtp + Σfp (every
    row has exactly one label class and one predicted class), and
    per-class f1 is between min and max of precision/recall."""
    from goetl_spark.operators.classifier import classification_metrics

    df = spark.createDataFrame(rows, "label string, pred string")
    out = classification_metrics(df, "label", "pred").collect()
    n = len(rows)
    assert sum(r["tp"] + r["fn"] for r in out) == n
    assert sum(r["tp"] + r["fp"] for r in out) == n
    assert sum(r["support"] for r in out) == n
    for r in out:
        if r["precision"] is not None and r["recall"] is not None \
                and r["f1"] is not None:
            lo, hi = sorted([r["precision"], r["recall"]])
            assert lo - 1e-12 <= r["f1"] <= hi + 1e-12


_baskets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),
              st.sampled_from(["p", "q", "r", "s"])),
    min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_baskets)
def test_association_rule_invariants(spark, rows):
    from goetl_spark.operators.mining import association_rules

    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(df, "basket", "item").collect()
    for r in out:
        assert 1 <= r["n_both"] <= min(r["n_ante"], r["n_cons"])
        assert 0.0 < r["support"] <= 1.0
        assert 0.0 < r["confidence"] <= 1.0
        # lift symmetry: confidence/base is the same both directions
    by_pair = {(r["antecedent"], r["consequent"]): r["lift"] for r in out}
    for (a, b), lift in by_pair.items():
        assert abs(by_pair[(b, a)] - lift) < 1e-12
