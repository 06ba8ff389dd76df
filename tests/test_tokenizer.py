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
