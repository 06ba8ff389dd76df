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


def _ndcg_ref(hits, grades, k=3):
    # pure-python reference with the operator's scale-9 term rounding
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"),
                                                ROUND_HALF_UP))

    dcg = sum(rnd(g / math.log2(r + 1)) for r, g in hits)
    ideal = sorted([g for g in grades if g > 0], reverse=True)[:k]
    idcg = sum(rnd(g / math.log2(i + 2)) for i, g in enumerate(ideal))
    return dcg, idcg


def test_ndcg_hand_computed(spark):
    from goetl_spark.operators.ranking import ndcg_at_k

    res = spark.createDataFrame(
        [("A", "d1", 1), ("A", "d2", 2), ("A", "d3", 3), ("A", "d9", 4),
         ("B", "x1", 1), ("B", "x2", 2), ("C", "c1", 1), ("Z", "z0", 1)],
        "query_id string, neighbor_id string, rank long")
    qr = spark.createDataFrame(
        [("A", "d1", 1.0), ("A", "d2", 3.0), ("A", "d4", 2.0),
         ("A", "d3", 0.0), ("B", "x2", 2.0), ("B", "x9", 1.0),
         ("C", "c9", 0.0), ("A", "d2", 1.0)],  # dup judgment -> max 3.0
        "query_id string, neighbor_id string, grade double")
    out = {r["query_id"]: r for r in ndcg_at_k(res, qr, k=3).collect()}

    dA, iA = _ndcg_ref([(1, 1.0), (2, 3.0)], [1.0, 3.0, 2.0, 0.0])
    assert abs(out["A"]["dcg_at_k"] - dA) < 1e-12
    assert abs(out["A"]["idcg_at_k"] - iA) < 1e-12
    assert abs(out["A"]["ndcg_at_k"] - dA / iA) < 1e-12
    assert out["A"]["n_judged"] == 3
    dB, iB = _ndcg_ref([(2, 2.0)], [2.0, 1.0])
    assert abs(out["B"]["ndcg_at_k"] - dB / iB) < 1e-12
    # judged but zero-relevant: NULL nDCG (nothing to rank), not 0
    assert out["C"]["ndcg_at_k"] is None and out["C"]["dcg_at_k"] == 0.0
    # unjudged query dropped
    assert "Z" not in out
    # perfect ranking -> 1.0 exactly (same terms both sides)
    perfect = spark.createDataFrame(
        [("A", "d2", 1), ("A", "d4", 2), ("A", "d1", 3)],
        "query_id string, neighbor_id string, rank long")
    p = ndcg_at_k(perfect, qr, k=3).collect()
    assert {r["query_id"]: r["ndcg_at_k"] for r in p}["A"] == 1.0


def test_ndcg_guards(spark):
    from goetl_spark.operators.ranking import ndcg_at_k

    res = spark.createDataFrame([("A", "d1", 1)],
                                "query_id string, neighbor_id string, "
                                "rank long")
    qr = spark.createDataFrame([("A", "d1", 2.0)],
                               "query_id string, neighbor_id string, "
                               "grade double")
    with pytest.raises(ValueError, match=">= 1"):
        ndcg_at_k(res, qr, k=0)
    neg = qr.union(spark.createDataFrame([("A", "bad", -1.0)], qr.schema))
    with pytest.raises(Exception, match="negative grade"):
        ndcg_at_k(res, neg, k=3).collect()
    dup = res.union(spark.createDataFrame([("A", "d1", 2)], res.schema))
    with pytest.raises(Exception, match="duplicate"):
        ndcg_at_k(dup, qr, k=3).collect()
