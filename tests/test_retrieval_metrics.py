"""Retrieval evaluation (operators/ranking.py::retrieval_metrics):
hand-computed hits/recall/precision/MRR/AP fixtures, zero-hit and
perfect queries, unjudged-query exclusion, qrels dedup, exact-rational
AP (the lcm accumulation), and guards."""
from __future__ import annotations

import pytest

from goetl_spark.operators.ranking import retrieval_metrics


def _run(spark):
    # query A: hits at ranks 2 and 4; B: no hits; C: unjudged; D: perfect
    rows = [
        ("A", "d9", 1), ("A", "d1", 2), ("A", "d8", 3), ("A", "d2", 4),
        ("A", "d7", 5),
        ("B", "z1", 1), ("B", "z2", 2),
        ("C", "c1", 1),
        ("D", "a", 1), ("D", "b", 2),
    ]
    return spark.createDataFrame(
        rows, "query_id string, neighbor_id string, rank long")


def _qrels(spark):
    rows = [("A", "d1"), ("A", "d2"), ("A", "d3"), ("A", "d3"),  # dup
            ("B", "x"), ("D", "a"), ("D", "b")]
    return spark.createDataFrame(rows, "query_id string, neighbor_id string")


def test_hand_computed_metrics(spark):
    got = {r["query_id"]: r for r in
           retrieval_metrics(_run(spark), _qrels(spark), k=5).collect()}
    assert set(got) == {"A", "B", "D"}  # judged queries only — no C

    a = got["A"]
    assert a["nrel"] == 3 and a["hits_at_k"] == 2  # the qrels dup collapsed
    assert a["recall_at_k"] == 2 / 3
    assert a["precision_at_k"] == 2 / 5
    assert a["mrr_at_k"] == 1 / 2
    # AP@5 = (prec@2 + prec@4) / min(3,5) = (1/2 + 2/4) / 3
    assert a["ap_at_k"] == (0.5 + 0.5) / 3

    b = got["B"]
    assert (b["hits_at_k"], b["recall_at_k"], b["mrr_at_k"],
            b["ap_at_k"]) == (0, 0.0, 0.0, 0.0)

    d = got["D"]
    assert d["recall_at_k"] == 1.0 and d["mrr_at_k"] == 1.0
    assert d["ap_at_k"] == 1.0  # (1/1 + 2/2) / 2
    assert d["precision_at_k"] == 2 / 5


def test_rank_cutoff_applies(spark):
    # at k=3 query A keeps only the rank-2 hit
    a = {r["query_id"]: r for r in
         retrieval_metrics(_run(spark), _qrels(spark), k=3).collect()}["A"]
    assert a["hits_at_k"] == 1
    assert a["recall_at_k"] == 1 / 3
    assert a["ap_at_k"] == (1 / 2) / 3  # min(nrel, k) = 3


def test_bounds_and_partition_independence(spark):
    run, qrels = _run(spark), _qrels(spark)
    a = sorted(map(tuple, retrieval_metrics(run, qrels, k=5).collect()))
    b = sorted(map(tuple, retrieval_metrics(
        run.repartition(7), qrels.repartition(3), k=5).collect()))
    assert a == b  # exact-integer AP: shuffle-order independent
    for row in a:
        for v in row[3:]:
            assert 0.0 <= v <= 1.0


def test_guards(spark):
    run, qrels = _run(spark), _qrels(spark)
    with pytest.raises(ValueError, match=">= 1"):
        retrieval_metrics(run, qrels, k=0)
    with pytest.raises(ValueError, match="42"):
        retrieval_metrics(run, qrels, k=43)


def test_duplicate_hits_or_ranks_raise(spark):
    # r13 advisor item: a duplicate (query, doc) pair or repeated rank
    # among a query's top-k HITS would double-count (recall silently
    # > 1.0) — the folded guard must raise at execution, not return
    run, qrels = _run(spark), _qrels(spark)
    # the RELEVANT doc d1 retrieved twice for query A (ranks 2 and 5)
    extra = spark.createDataFrame(
        [("A", "d1", 5)], "query_id string, neighbor_id string, rank long")
    with pytest.raises(Exception, match="duplicate"):
        retrieval_metrics(run.union(extra), qrels, k=5).collect()
    # two different RELEVANT docs sharing one rank
    tied = spark.createDataFrame(
        [("A", "d1", 1), ("A", "d2", 1)],
        "query_id string, neighbor_id string, rank long")
    qr2 = spark.createDataFrame([("A", "d1"), ("A", "d2")],
                                "query_id string, neighbor_id string")
    with pytest.raises(Exception, match="duplicate|repeated rank"):
        retrieval_metrics(tied, qr2, k=5).collect()
    # metric-neutral duplicates (a NON-relevant doc repeated) pass
    # through untouched — same rows as the clean run
    neutral = spark.createDataFrame(
        [("A", "d9", 5)], "query_id string, neighbor_id string, rank long")
    clean = sorted(map(tuple, retrieval_metrics(run, qrels, k=4).collect()))
    noisy = sorted(map(tuple, retrieval_metrics(
        run.union(neutral), qrels, k=4).collect()))
    assert clean == noisy
