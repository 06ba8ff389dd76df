"""Conversation operators (operators/chat.py) — turn building,
structural stats/flags, template rendering."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from goetl_spark.operators.chat import (
    chat_turn_stats, flatten_chat, words_to_turns)


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id int, conversation array<struct<role:string,content:string>>")


@pytest.fixture(scope="module")
def stats(spark):
    rows = [
        (1, [("user", "hi there"), ("assistant", "hello you")]),
        (2, [("user", "a"), ("user", "b"), ("assistant", "c")]),   # broken alternation
        (3, [("assistant", "starts wrong"), ("user", "x")]),
        (4, [("user", "only one turn")]),
        (5, []),
    ]
    out = chat_turn_stats(_conv(spark, rows)).collect()
    return {r["conv_id"]: r for r in out}


def test_valid_conversation(stats):
    r = stats[1]
    assert r["n_turns"] == 2 and r["n_user"] == 1 and r["n_assistant"] == 1
    assert r["user_chars"] == 8 and r["assistant_chars"] == 9
    assert r["user_tokens"] == 2 and r["assistant_tokens"] == 2
    assert r["chat_ok"] is True


def test_broken_alternation(stats):
    r = stats[2]
    assert r["alternation_ok"] is False and r["chat_ok"] is False
    assert r["n_user"] == 2


def test_wrong_start_and_end(stats):
    assert stats[3]["starts_with_user"] is False
    assert stats[3]["ends_with_assistant"] is False
    assert stats[4]["ends_with_assistant"] is False
    assert stats[4]["chat_ok"] is False  # min_turns=2


def test_empty_conversation(stats):
    r = stats[5]
    assert r["n_turns"] == 0 and r["chat_ok"] is False
    assert r["alternation_ok"] is True  # vacuous


def test_words_to_turns_and_flatten(spark):
    df = spark.createDataFrame(
        [(1, "One two three FOUR five")], "doc_id int, text string")
    out = df.select(
        "doc_id", words_to_turns("text", words_per_turn=2).alias("conversation"))
    conv = out.collect()[0]["conversation"]
    assert [(t["role"], t["content"]) for t in conv] == [
        ("user", "one two"), ("assistant", "three four"), ("user", "five")]
    flat = flatten_chat(out).collect()[0]["text"]
    assert flat == ("<|user|>one two\n<|assistant|>three four\n"
                    "<|user|>five\n")


def test_words_to_turns_empty_and_guards(spark):
    df = spark.createDataFrame([(1, "...")], "doc_id int, text string")
    conv = df.select(words_to_turns("text").alias("c")).collect()[0]["c"]
    assert conv == []
    with pytest.raises(ValueError):
        df.select(words_to_turns("text", words_per_turn=0))
    with pytest.raises(ValueError):
        df.select(words_to_turns("text", roles=[]))
