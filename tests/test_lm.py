"""Bigram LM / KL divergence / char entropy tests (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators.lm import (
    bigram_logprob_scores, char_entropy, token_kl_divergence)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b a" + "a b" -> uni a:3 b:2, V=2, big (a,b):2 (b,a):1
    out = {r.doc_id: r for r in
           bigram_logprob_scores(_docs(spark, ["a b a", "a b"]),
                                 k=0.5).collect()}
    p_ab = (2 + 0.5) / (3 + 0.5 * 2)   # 0.625
    p_ba = (1 + 0.5) / (2 + 0.5 * 2)   # 0.5
    t_ab = round(math.log(p_ab), 6)
    t_ba = round(math.log(p_ba), 6)
    assert out[0].n_bigrams == 2
    assert out[0].avg_logprob == pytest.approx((t_ab + t_ba) / 2, abs=1e-9)
    assert out[1].n_bigrams == 1
    assert out[1].avg_logprob == pytest.approx(t_ab, abs=1e-9)


def test_bigram_short_docs_drop_out(spark):
    out = bigram_logprob_scores(_docs(spark, ["solo", "", "a b"])).collect()
    assert {r.doc_id for r in out} == {2}


def test_kl_zero_for_identical_slices(spark):
    df = _docs(spark, ["x y z", "x y z"])
    r = token_kl_divergence(df, F.col("doc_id") == 0).collect()[0]
    assert r.kl_pq == 0.0 and r.kl_qp == 0.0
    assert r.vocab == 3 and r.n_tokens_p == 3 and r.n_tokens_q == 3


def test_kl_positive_and_asymmetric_for_skewed_slices(spark):
    df = _docs(spark, ["a a a a b", "b b b b c"])
    r = token_kl_divergence(df, F.col("doc_id") == 0).collect()[0]
    assert r.kl_pq > 0 and r.kl_qp > 0
    assert r.vocab == 3
    # full hand-rolled smoothed KL over the union vocab {a, b, c}
    v, na, nb, k = 3, 5, 5, 0.5
    counts = {"a": (4, 0), "b": (1, 4), "c": (0, 1)}
    expect = sum(
        round(((ca + k) / (na + k * v))
              * math.log(((ca + k) / (na + k * v))
                         / ((cb + k) / (nb + k * v))), 9)
        for ca, cb in counts.values())
    assert r.kl_pq == pytest.approx(expect, abs=1e-9)


def test_char_entropy_bounds(spark):
    out = {r.doc_id: r for r in
           char_entropy(_docs(spark, ["aaaa", "ab", "abcd", ""])).collect()}
    assert out[0].entropy == 0.0 and out[0].n_chars == 4
    assert out[1].entropy == pytest.approx(math.log(2), abs=1e-6)
    assert out[2].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert 3 not in out  # empty doc has no characters


def test_perplexity_buckets_tiers_and_determinism(spark):
    from goetl_spark.operators.lm import perplexity_buckets

    # 30 fluent docs sharing bigrams (high logprob) + 30 unique-token
    # docs (every bigram count 1, large V penalty → low logprob)
    fluent = [(i, "the cat sat on the mat and the cat sat") for i in range(30)]
    noise = [(100 + i, " ".join(f"zq{i}w{j}" for j in range(10)))
             for i in range(30)]
    df = spark.createDataFrame(fluent + noise, "doc_id long, text string")
    out = perplexity_buckets(df, cuts=(1.0 / 3.0, 2.0 / 3.0)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.lm_bucket, []).append(r.doc_id)
    # every fluent doc scores above every noise doc, and tiers split
    # 20/20/20: head is entirely fluent, tail entirely noise
    assert len(by_bucket["head"]) == 20 and len(by_bucket["tail"]) == 20
    assert all(d < 100 for d in by_bucket["head"])
    assert all(d >= 100 for d in by_bucket["tail"])
    # deterministic on re-run
    again = {r.doc_id: r.lm_bucket
             for r in perplexity_buckets(df).collect()}
    assert all(again[r.doc_id] == r.lm_bucket for r in out)


def test_perplexity_buckets_validates_cuts(spark):
    import pytest
    from goetl_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(df, cuts=(0.7, 0.3))


# --- TF-IDF vectors (text.tfidf_vectors) ------------------------------------

def test_tfidf_hand_computed(spark):
    """3-doc corpus with known counts: smooth idf (sklearn form),
    raw tf, one row per nonzero (doc, vocab term)."""
    import math

    from goetl_spark.operators.text import tfidf_vectors

    df = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "cat fish"), (2, "dog dog dog bird")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["term"]): r
           for r in tfidf_vectors(df, vocab_size=10).collect()}
    # df: cat 2, dog 2, bird 1, fish 1; N = 3
    idf = lambda d: math.log(4.0 / (1.0 + d)) + 1.0
    assert out[(0, "cat")]["tf"] == 2
    assert out[(0, "cat")]["tfidf"] == 2 * idf(2)
    assert out[(2, "dog")]["tf"] == 3
    assert out[(2, "dog")]["tfidf"] == 3 * idf(2)
    assert out[(1, "fish")]["tfidf"] == 1 * idf(1)
    assert len(out) == 6  # nonzero cells only
    assert (0, "fish") not in out


def test_tfidf_vocab_cap_and_min_df(spark):
    """vocab_size keeps the top terms by (df DESC, term) —
    deterministic tie-break — and min_df drops rare terms."""
    from goetl_spark.operators.text import tfidf_vectors

    df = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb"), (2, "aa zz")],
        "doc_id long, text string")
    # df: aa 3, bb 2, cc 1, zz 1 -> top-2 = aa, bb
    terms = {r["term"] for r in
             tfidf_vectors(df, vocab_size=2).collect()}
    assert terms == {"aa", "bb"}
    # min_df=2 drops cc/zz even with room in the vocab
    terms = {r["term"] for r in
             tfidf_vectors(df, vocab_size=10, min_df=2).collect()}
    assert terms == {"aa", "bb"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tfidf_vectors(df, vocab_size=0)


# --- Kneser-Ney bigram LM (lm.kneser_ney_logprob_scores) --------------------

def test_kneser_ney_hand_computed(spark):
    """Tiny corpus, every KN quantity verified by hand:
    bigrams (a,b):1 (b,a):2 (a,c):1 -> ctx a:(c1=2,fwd=2) b:(2,1),
    cont a/b/c = 1 type each, T = 3 types, D = 0.75:
    P(b|a) = 0.25/2 + 0.75*2/2 * 1/3 = 0.375
    P(a|b) = 1.25/2 + 0.75*1/2 * 1/3 = 0.75
    P(c|a) = 0.25/2 + 0.75*2/2 * 1/3 = 0.375"""
    import math

    from goetl_spark.operators.lm import kneser_ney_logprob_scores

    df = spark.createDataFrame([(0, "a b a c"), (1, "b a")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in kneser_ney_logprob_scores(df).collect()}
    r6 = lambda x: round(x, 6)
    exp0 = (r6(math.log(0.375)) + r6(math.log(0.75))
            + r6(math.log(0.375))) / 3
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["avg_logprob"] - exp0) < 1e-12
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["avg_logprob"] - r6(math.log(0.75))) < 1e-12


def test_kneser_ney_ranks_fluency_and_validates(spark):
    """Repeated natural patterns score above shuffled noise, short docs
    drop out, discount is range-checked."""
    import pytest as _pytest

    from goetl_spark.operators.lm import kneser_ney_logprob_scores

    fluent = "the cat sat on the mat " * 5
    # every noise bigram occurs ONCE (self-training can't memorize it),
    # so the discount bites and continuation mass is all it gets
    noise = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, fluent), (1, noise), (2, "single")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["avg_logprob"]
           for r in kneser_ney_logprob_scores(df).collect()}
    assert out[0] > out[1]
    assert 2 not in out  # < 2 tokens, no bigrams
    with _pytest.raises(ValueError):
        kneser_ney_logprob_scores(df, discount=1.0)


def test_collocation_pmi_hand_computed(spark):
    # corpus bigrams: "a b a b" -> (a,b) (b,a) (a,b); "c d" -> (c,d)
    # big: (a,b):2 (b,a):1 (c,d):1; n=4
    # marginals: cl(a)=2 cl(b)=1 cl(c)=1; cr(b)=2 cr(a)=1 cr(d)=1
    from goetl_spark.operators.lm import collocation_pmi

    out = {(r.w1, r.w2): r for r in
           collocation_pmi(_docs(spark, ["a b a b", "c d"]),
                           min_count=1).collect()}
    assert set(out) == {("a", "b"), ("b", "a"), ("c", "d")}
    assert out[("a", "b")].n_pair == 2
    assert out[("a", "b")].pmi == round(math.log(2 * 4 / (2 * 2)), 6)
    assert out[("b", "a")].pmi == round(math.log(1 * 4 / (1 * 1)), 6)
    # the fixed phrases (c,d)/(b,a) tie at max PMI: all marginals 1
    assert out[("c", "d")].pmi == round(math.log(4.0), 6)
    top = max(r.pmi for r in out.values())
    assert {(r.w1, r.w2) for r in out.values() if r.pmi == top} \
        == {("b", "a"), ("c", "d")}


def test_collocation_pmi_min_count_after_marginals(spark):
    from goetl_spark.operators.lm import collocation_pmi

    df = _docs(spark, ["a b a b", "c d"])
    kept = {(r.w1, r.w2): r for r in
            collocation_pmi(df, min_count=2).collect()}
    assert set(kept) == {("a", "b")}
    # score identical to the unfiltered run: marginals include the
    # dropped hapax pairs
    full = {(r.w1, r.w2): r.pmi for r in
            collocation_pmi(df, min_count=1).collect()}
    assert kept[("a", "b")].pmi == full[("a", "b")]

    with pytest.raises(ValueError):
        collocation_pmi(df, min_count=0)


def test_textrank_keywords(spark):
    import pytest
    from goetl_spark.operators.lm import textrank_keywords

    # "hub" is adjacent to everything; leaves only touch hub
    docs = spark.createDataFrame(
        [(1, "hub alpha hub beta hub gamma"),
         (2, "alpha hub beta"),
         (3, "solo")],  # single token: no edges, excluded
        "doc_id long, text string")
    out = {r.word: r.score for r in textrank_keywords(docs).collect()}
    assert "solo" not in out
    assert set(out) == {"hub", "alpha", "beta", "gamma"}
    assert out["hub"] == max(out.values())
    # scores sum to ~1 (symmetric graph conserves rank mass)
    assert abs(sum(out.values()) - 1.0) < 1e-9
    # hand-check one iteration on a 2-node graph: a-b with weight 2
    two = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    r1 = {r.word: r.score for r in
          textrank_keywords(two, iterations=1).collect()}
    # each node: (1-d)/2 + d * (0.5*2)/2 = 0.075 + 0.425 = 0.5
    assert abs(r1["a"] - 0.5) < 1e-12 and abs(r1["b"] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        textrank_keywords(docs, iterations=0)
    with pytest.raises(ValueError):
        textrank_keywords(docs, min_weight=0)
