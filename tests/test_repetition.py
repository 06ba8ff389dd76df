"""Gopher repetition rules (text.py::repetition_stats) — hand-checked
line/n-gram fractions, empty-doc zeros, threshold flags."""
from __future__ import annotations

import pytest

from goetl_spark.operators.text import repetition_stats


@pytest.fixture(scope="module")
def rep(spark):
    rows = [
        (1, "a b\na b\nc"),                    # duplicate line + hot bigram
        (2, ""),                               # empty
        (3, "spam ham spam ham spam ham"),     # looping bigram
        (4, "one two three four five one two three four five"),  # dup 5-gram
        # clean: 10 distinct words -> top bigram = 4/20 chars, at threshold
        (5, "aa bb cc dd ee ff gg hh ii jj"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repetition_stats(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_duplicate_lines(rep):
    r = rep[1]
    # lines [a b, a b, c]: 1 of 3 is a repeat; 3 of 7 chars are repeats
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3)
    assert r["dup_line_char_frac"] == pytest.approx(3 / 7)
    # bigrams of [a,b,a,b,c]: "a b" twice (2 chars each), 5 word chars
    assert r["top_ngram_char_frac"] == pytest.approx(4 / 5)
    assert r["dup_ngram_char_frac"] == 0.0  # single 5-gram, no repeat


def test_empty_doc_passes(rep):
    r = rep[2]
    assert r["n_lines"] == 0
    for c in ("dup_line_frac", "dup_line_char_frac",
              "top_ngram_char_frac", "dup_ngram_char_frac"):
        assert r[c] == 0.0
    assert r["rep_pass"] is True


def test_looping_bigram_fails_top_ngram(rep):
    r = rep[3]
    # "spam ham" occurs 3x, 7 chars each, over 21 word chars -> 1.0
    assert r["top_ngram_char_frac"] == pytest.approx(1.0)
    assert r["top_ngram_ok"] is False
    assert r["rep_pass"] is False
    assert r["dup_line_frac"] == 0.0


def test_duplicated_five_gram(rep):
    r = rep[4]
    # "one two three four five" 5-gram occurs twice: 2*19 chars / 38
    assert r["dup_ngram_char_frac"] == pytest.approx(1.0)
    assert r["dup_ngram_ok"] is False


def test_clean_doc_passes(rep):
    r = rep[5]
    assert r["rep_pass"] is True
    assert r["dup_line_frac"] == 0.0
    assert r["dup_ngram_char_frac"] == 0.0


def test_param_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        repetition_stats(df, top_n=0)


def test_vocab_coverage(spark):
    from goetl_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "cat bird"), (3, "")],
        "doc_id int, text string")
    vocab = spark.createDataFrame([("cat",), ("dog",)], "token string")
    out = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 0)
    assert out[1]["oov_rate"] == 0.0
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (2, 1)
    assert out[2]["oov_rate"] == 0.5
    assert (out[3]["n_tokens"], out[3]["n_oov"], out[3]["oov_rate"]) == (0, 0, 0.0)
