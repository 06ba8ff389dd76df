"""GPT-style block packing (sampling.py::block_pack) — hand-checked
span mapping, full-block invariant, zero-token drop, guards."""
from __future__ import annotations

import pytest

from goetl_spark.operators.sampling import block_pack


@pytest.fixture(scope="module")
def spans(spark):
    rows = [(1, 5), (2, 3), (3, 10), (4, 0)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = block_pack(df, "n_tokens", 4).collect()
    return sorted(((r["doc_id"], r["block_id"], r["block_offset"],
                    r["tokens_in_block"], r["token_start"]) for r in out))


def test_span_mapping(spans):
    assert spans == [
        (1, 0, 0, 4, 0), (1, 1, 0, 1, 0),   # doc1 straddles blocks 0/1
        (2, 1, 1, 3, 5),                     # doc2 inside block 1
        (3, 2, 0, 4, 8), (3, 3, 0, 4, 8), (3, 4, 0, 2, 8),  # doc3 spans 3
    ]


def test_blocks_exactly_full(spans):
    per_block: dict[int, int] = {}
    for _, b, _, t, _ in spans:
        per_block[b] = per_block.get(b, 0) + t
    last = max(per_block)
    for b, total in per_block.items():
        assert total == (2 if b == last else 4), (b, total)


def test_per_doc_token_conservation(spans):
    per_doc: dict[int, int] = {}
    for d, _, _, t, _ in spans:
        per_doc[d] = per_doc.get(d, 0) + t
    assert per_doc == {1: 5, 2: 3, 3: 10}  # doc4 (0 tokens) dropped


def test_partitioning_independence(spark):
    rows = [(i, (i * 7) % 5 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    a = sorted(map(tuple, block_pack(df.repartition(1), "n_tokens", 8,
                                     num_partitions=1).collect()))
    b = sorted(map(tuple, block_pack(df.repartition(7), "n_tokens", 8,
                                     num_partitions=5).collect()))
    assert a == b


def test_guard(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id int, n_tokens int")
    with pytest.raises(ValueError):
        block_pack(df, "n_tokens", 0)
