"""Property-based tests for the r15 operators (hypothesis,
Spark-backed with capped examples): C2ST a/b swap anti-symmetry +
bounds, standing-index Jaccard == one-shot jaccard_join on random
token corpora (the losslessness law under a frozen order), standing-
index edit distance == one-shot edit_distance_join on random short
strings including below-build-threshold queries."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


_cells = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),   # feature class
              st.integers(min_value=0, max_value=1),   # fold
              st.integers(min_value=0, max_value=1)),  # snapshot
    min_size=8, max_size=60)


@settings(**_SETTINGS)
@given(_cells)
def test_c2st_swap_antisymmetry_and_bounds(spark, rows):
    from goetl_spark.quality import classifier_two_sample_test

    a = [(f"c{c}", f) for c, f, s in rows if s == 0]
    b = [(f"c{c}", f) for c, f, s in rows if s == 1]
    folds = {f for _, f, _ in rows}
    if not a or not b or folds != {0, 1}:
        return  # contract violations are covered deterministically
    da = spark.createDataFrame(a, "u string, fold int")
    db = spark.createDataFrame(b, "u string, fold int")
    r1 = classifier_two_sample_test(da, db, ["u"], "fold").collect()[0]
    r2 = classifier_two_sample_test(db, da, ["u"], "fold").collect()[0]
    assert 0.0 <= r1["auc"] <= 1.0
    assert 0.0 <= r1["separability"] <= 1.0
    # swapping snapshots flips BOTH the labels and (by the smoothed-
    # rate identity rate' = 1 - rate) every score, so the ranking
    # question P(S_pos > S_neg) is INVARIANT: the test must not care
    # which snapshot the caller names "current" — auc, separability,
    # and z all hold; only the n_a/n_b bookkeeping swaps
    assert abs(r1["auc"] - r2["auc"]) < 1e-9
    assert abs(r1["separability"] - r2["separability"]) < 1e-9
    assert abs(r1["z"] - r2["z"]) < 1e-6
    assert (r1["n_a"], r1["n_b"]) == (r2["n_b"], r2["n_a"])


_token_corpus = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=6),
    min_size=1, max_size=12)


@settings(**_SETTINGS)
@given(_token_corpus, _token_corpus,
       st.sampled_from([0.4, 0.6, 0.8, 1.0]))
def test_jaccard_index_equals_oneshot(spark, tmp_path_factory,
                                      corpus, batch, tau):
    from goetl_spark.operators.dedup import (
        jaccard_index_candidates, jaccard_index_write, jaccard_join)

    c = spark.createDataFrame(
        [(i, list(set(t))) for i, t in enumerate(corpus)],
        "doc_id long, tokens array<string>")
    b = spark.createDataFrame(
        [(100 + i, list(set(t))) for i, t in enumerate(batch)],
        "doc_id long, tokens array<string>")
    path = str(tmp_path_factory.mktemp("jidx"))
    jaccard_index_write(c, path, "doc_id", "tokens", threshold=tau)
    got = {(r["query_id"], r["match_id"], round(r["jaccard"], 9))
           for r in jaccard_index_candidates(
               b, path, "doc_id", "tokens",
               include_new_pairs=False).collect()}
    want = {(r["doc_id"], r["mid"], round(r["jaccard"], 9))
            for r in jaccard_join(
                b, c.selectExpr("doc_id AS mid", "tokens"),
                "doc_id", "tokens", "mid", "tokens", tau).collect()}
    assert got == want


_strings = st.lists(st.text(alphabet="abc", min_size=0, max_size=6),
                    min_size=1, max_size=10)


@settings(**_SETTINGS)
@given(_strings, _strings, st.integers(min_value=0, max_value=2))
def test_edit_index_equals_oneshot_incl_below_build(spark,
                                                    tmp_path_factory,
                                                    corpus, batch, dq):
    from goetl_spark.operators.dedup import (
        edit_distance_index_candidates, edit_distance_index_write,
        edit_distance_join)

    c = spark.createDataFrame(list(enumerate(corpus)),
                              "doc_id long, text string")
    b = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(batch)],
        "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("eidx"))
    edit_distance_index_write(c, path, "doc_id", "text", max_dist=2)
    got = {(r["query_id"], r["match_id"], r["edit_dist"])
           for r in edit_distance_index_candidates(
               b, path, "doc_id", "text", max_dist=dq).collect()}
    want = {(r["doc_id"], r["mid"], r["edit_dist"])
            for r in edit_distance_join(
                b, c.selectExpr("doc_id AS mid", "text"),
                "doc_id", "text", "mid", "text", dq).collect()}
    assert got == want
