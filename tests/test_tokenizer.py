"""WordPiece tokenizer tests (operators/tokenizer.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from goetl_spark.operators.tokenizer import (
    vocab_from_corpus, wordpiece_pieces, wordpiece_tokenize)

VOCAB = {"un", "##aff", "##able", "##ed", "aff", "able", "run", "##ning",
         "a", "b", "##a", "##b", "1", "##1"}


def test_pieces_greedy_longest_match():
    assert wordpiece_pieces("unaffable", VOCAB) == ["un", "##aff", "##able"]
    assert wordpiece_pieces("running", VOCAB) == ["run", "##ning"]
    assert wordpiece_pieces("able", VOCAB) == ["able"]


def test_pieces_unk_on_uncoverable_word():
    assert wordpiece_pieces("xyz", VOCAB) == ["[UNK]"]
    # covered prefix but uncoverable tail still collapses to UNK
    assert wordpiece_pieces("runx", VOCAB) == ["[UNK]"]


def test_tokenize_dataframe(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="Unaffable RUNNING!"),
         Row(doc_id=1, text=""),
         Row(doc_id=2, text=None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           wordpiece_tokenize(df, VOCAB).collect()}
    assert out[0].tokens == ["un", "##aff", "##able", "run", "##ning"]
    assert out[0].n_tokens == 5
    assert out[1].tokens == [] and out[1].n_tokens == 0
    assert out[2].tokens == [] and out[2].n_tokens == 0


def test_tokenize_requires_vocab(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x")],
                               "doc_id long, text string")
    with pytest.raises(ValueError):
        wordpiece_tokenize(df, [])


def test_vocab_from_corpus_covers_frequent_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox jumps")
         for i in range(5)],
        "doc_id long, text string")
    vocab = vocab_from_corpus(df, min_count=2)
    out = wordpiece_tokenize(df, vocab).collect()
    assert all("[UNK]" not in r.tokens for r in out)
    assert all(r.n_tokens == 5 for r in out)  # every word is a vocab hit


# --- BPE merge learning (learn_bpe_merges / apply_bpe_merges) ---------------

def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_learn_bpe_merges_hand_computed(spark):
    """Classic Sennrich-style replay: 3x'abab' + 2x'abc' must learn
    (a,b):8 -> (ab,ab):3 -> (ab,c):2 in that order."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["abab abab", "abab abc", "abc"])
    merges = learn_bpe_merges(df, num_merges=3)
    assert merges == [("a", "b", 8), ("ab", "ab", 3), ("ab", "c", 2)]


def test_learn_bpe_greedy_repeat_chains(spark):
    """'aaaa' repeats: pair (a,a) counts every adjacency (9), the fold
    merges non-overlapping left-to-right (aaaa -> aa,aa), and the next
    round learns (aa,aa)."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["aaaa", "aaaa", "aaaa"])
    merges = learn_bpe_merges(df, num_merges=5)
    assert merges[0] == ("a", "a", 9)
    assert merges[1] == ("aa", "aa", 3)
    assert len(merges) == 2  # no pair left after [aaaa]


def test_learn_bpe_tiebreak_and_min_count(spark):
    """Equal counts break lexicographically on (left, right); pairs
    under min_pair_count stop the loop."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["xy pq", "xy pq"])
    merges = learn_bpe_merges(df, num_merges=10, min_pair_count=2)
    assert merges[0] == ("p", "q", 2)
    assert merges[1] == ("x", "y", 2)
    assert len(merges) == 2  # singleton merged words can't pair again

    assert learn_bpe_merges(df, num_merges=10, min_pair_count=3) == []


def test_apply_bpe_merges_matches_training_replay(spark):
    """Inference (lowest-rank-first) reproduces the training-time fold:
    learned tokens come back whole, unseen symbols stay single chars,
    NULL text propagates."""
    from goetl_spark.operators.tokenizer import (
        apply_bpe_merges, learn_bpe_merges)

    train = _corpus(spark, ["abab abab", "abab abc", "abc"])
    merges = learn_bpe_merges(train, num_merges=3)
    test = spark.createDataFrame(
        [Row(doc_id=0, text="abab abc ababd"),
         Row(doc_id=1, text="zz"),
         Row(doc_id=2, text=None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           apply_bpe_merges(test, merges).collect()}
    assert out[0]["tokens"] == ["abab", "abc", "abab", "d"]
    assert out[0]["n_tokens"] == 4
    assert out[1]["tokens"] == ["z", "z"]
    assert out[2]["tokens"] is None and out[2]["n_tokens"] is None


def test_learn_bpe_validates(spark):
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["ab"])
    with pytest.raises(ValueError):
        learn_bpe_merges(df, num_merges=0)
