"""Substring-span dedup (operators/dedup.py::winnow_anchor_positions /
duplicate_spans / cut_spans) — the Lee et al. training-data dedup
surface. Oracle row: q141 (planted-copy guarantee booleans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.dedup import (
    cut_spans, duplicate_spans, winnow_anchor_positions)

SHARED = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark):
    docs = [
        (1, "AAAA unique prefix one " + SHARED + " unique suffix one BBBB"),
        (2, "CCCC totally different lead-in " + SHARED + " other tail DDDD"),
        (3, "nothing in common here at all with anyone else whatsoever"),
    ]
    return docs, spark.createDataFrame(docs, "doc_id long, text string")


def test_anchor_positions_content_defined(spark):
    """Both copies of a shared region anchor at the same in-region
    offsets (the winnowing property span detection relies on)."""
    docs, df = _corpus(spark)
    anchors = winnow_anchor_positions(df, k=10, window=4)
    rows = anchors.collect()
    s1 = docs[0][1].index(SHARED)
    s2 = docs[1][1].index(SHARED)
    in1 = {r.pos - s1 for r in rows if r.doc_id == 1
           and s1 <= r.pos and r.pos + 10 <= s1 + len(SHARED)}
    in2 = {r.pos - s2 for r in rows if r.doc_id == 2
           and s2 <= r.pos and r.pos + 10 <= s2 + len(SHARED)}
    # interior anchors (window fully inside the region) must coincide;
    # edge windows may straddle unique context — allow them to differ
    interior1 = {o for o in in1 if o >= 4 - 1 and o + 10 <= len(SHARED) - 3}
    assert interior1 and interior1 <= in2
    # grams are the verbatim substrings
    for r in rows:
        assert r.gram == dict(docs)[r.doc_id][r.pos:r.pos + 10]


def test_duplicate_spans_guarantee_and_precision(spark):
    docs, df = _corpus(spark)
    spans = duplicate_spans(df, k=10, window=4, min_df=2).collect()
    s1 = docs[0][1].index(SHARED); e1 = s1 + len(SHARED)
    s2 = docs[1][1].index(SHARED); e2 = s2 + len(SHARED)
    d1 = [r for r in spans if r.doc_id == 1]
    d2 = [r for r in spans if r.doc_id == 2]
    assert [r for r in spans if r.doc_id == 3] == []
    # guarantee: region length >= window + k - 1 -> a span overlaps it
    assert any(r.span_start < e1 and r.span_end > s1 for r in d1)
    assert any(r.span_start < e2 and r.span_end > s2 for r in d2)
    # precision: spans extend at most k-1 past the duplicated region
    for r in d1:
        assert r.span_start >= s1 - 9 and r.span_end <= e1 + 9


def test_duplicate_spans_min_df(spark):
    _, df = _corpus(spark)
    assert duplicate_spans(df, k=10, window=4, min_df=3).count() == 0
    with pytest.raises(ValueError, match="min_df"):
        duplicate_spans(df, min_df=1)


def test_duplicate_spans_merge_gap(spark):
    # two shared regions separated by unique middles longer than the
    # default gap stay separate spans; a huge merge_gap unifies them
    a = "alpha beta gamma delta epsilon zeta"
    b = "eins zwei drei vier funf sechs sieben"
    docs = [
        (1, a + " UNIQ1 MIDDLE one xxxxxxxxxxxxxxxxxxxxxxxxxxxx " + b),
        (2, a + " totally other filler yyyyyyyyyyyyyyyyyyyyyyyy " + b),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicate_spans(df, k=10, window=4, min_df=2)
    per_doc = {r.doc_id: r.n for r in
               spans.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 2, 2: 2}
    merged = duplicate_spans(df, k=10, window=4, min_df=2, merge_gap=1000)
    assert {r.doc_id: r.n for r in
            merged.groupBy("doc_id").agg(F.count("*").alias("n")).collect()} \
        == {1: 1, 2: 1}


def test_cut_spans_basic_overlap_and_passthrough(spark):
    docs, df = _corpus(spark)
    sp = spark.createDataFrame(
        [(1, 5, 10), (1, 8, 15), (1, 20, 25), (2, 0, 4)],
        "doc_id long, span_start long, span_end long")
    out = {r.doc_id: r.text_deduped for r in cut_spans(df, sp).collect()}
    t1 = docs[0][1]
    # overlapping [5,10)+[8,15) clamp to [5,15)
    assert out[1] == t1[:5] + t1[15:20] + t1[25:]
    assert out[2] == docs[1][1][4:]
    assert out[3] == docs[2][1]  # no spans -> unchanged


def test_cut_then_detect_is_clean(spark):
    """Removing every detected span leaves a corpus with no duplicated
    spans at the same parameters (the end-to-end dedup contract)."""
    _, df = _corpus(spark)
    spans = duplicate_spans(df, k=10, window=4, min_df=2)
    cleaned = (cut_spans(df, spans.select("doc_id", "span_start",
                                          "span_end"))
               .select("doc_id", F.col("text_deduped").alias("text")))
    assert duplicate_spans(cleaned, k=10, window=4, min_df=2).count() == 0


def test_short_docs_no_anchors(spark):
    df = spark.createDataFrame([(1, "tiny"), (2, "tiny")],
                               "doc_id long, text string")
    # shorter than k: no anchors, no spans, cut passes through
    assert winnow_anchor_positions(df, k=10, window=4).count() == 0
    spans = duplicate_spans(df, k=10, window=4)
    assert spans.count() == 0
    out = cut_spans(df, spans.select("doc_id", "span_start", "span_end"))
    assert {r.doc_id: r.text_deduped for r in out.collect()} == \
        {1: "tiny", 2: "tiny"}
