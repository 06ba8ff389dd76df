"""Mechanical anti-pattern gate over EVERY live + staged query plan.

PLAN_AUDIT.md records shuffle/broadcast/pushdown counts per round, but
until now nothing FAILED when a scale anti-pattern crept into a plan —
the r9 q89 global-window fixture survived two rounds because the audit
was a report, not a gate. This module walks the physical plan tree of
every registered and staged catalog query (via py4j node introspection,
AQE unwrapped, subqueries included) and asserts the four invariants the
verdicts check by hand:

1. **No CartesianProduct** — an all-pairs join is never acceptable at
   100 TB; the dedup/ANN families are banded/bucketed by construction.
2. **No BatchEvalPython** — row-at-a-time Python UDFs stay out of
   registered plans (the `filter.Custom` escape hatch is API-only).
   Arrow paths (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
   are the sanctioned slow path and remain allowed.
3. **No unpartitioned Window / WindowGroupLimit** — a window with an
   empty PARTITION BY sorts the whole input in ONE task; every ranking
   in the tree must ride a partitioned window (the two-phase cumsum in
   sampling.py exists precisely to avoid this).
4. **BroadcastNestedLoopJoin only with a provably bounded build side**:
   a zero-grouping-key aggregate (exactly one row: scalar totals, bloom
   bitmaps folded to one struct, LM normalization constants), a
   LocalTableScan / driver-built ExistingRDD (bloom.py's serialized
   filter frame), or a Range of at most `_RANGE_BOUND` rows (q23's
   32-row hash-seed fan-out). Anything else must carry a documented
   entry in `_BNLJ_EXEMPT` or the gate fails.

Streaming queries execute their replay inside the query fn and return a
memory-sink read — their returned plan is not the work, so they are
skipped here; their scale story (bounded per-key state) is asserted in
the streaming tests. q22/q81/q109/q121/q126/q159 localCheckpoint their
hot frame, which would truncate the audited plan, so the gate reuses
scripts/audit_plans.py's lazy variants — the same plans PLAN_AUDIT.md
documents.
"""
from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from audit_plans import LAZY_VARIANTS  # noqa: E402

from goetl_spark import queries as catalog  # noqa: E402

# replay-inside-the-fn streaming queries: returned DF is a memory sink
_STREAMING_EXEC = {
    "q31_streaming_tumbling", "q48_stateful_stream", "q57_streaming_dedup",
    "q58_stream_stream_join", "q93_stream_dedup_ingest", "q139_funnel_stream",
    "q140_zscore_stream", "q158_stream_bloom_cut", "q170_heavy_hitters_stream",
    "q183_holt_stream", "q190_cusum_stream", "q210_stream_rollup",
}

# BNLJ build sides that are bounded SEMANTICALLY but not provable from
# the plan tree alone — each entry documents why the broadcast side
# cannot grow with the corpus. A new BNLJ lands here only with a reason.
_BNLJ_EXEMPT = {
    # broadcast side = the nq query vectors selected by an equality/IN
    # filter on doc_id — bounded by the query batch, not the corpus
    "q26_knn_bruteforce": "filtered query-vector scan (nq rows)",
    # broadcast side = mined candidate ids, ≤ n_queries × k by the
    # retriever's own top-k contract before the NLJ re-join
    "q137_hard_negatives": "top-k candidate set (n_queries x k rows)",
    # q26's identical shape: the graded RUN is knn_bruteforce over the
    # 40 query vectors selected by an inequality on vec_id — the
    # broadcast side is the query batch, not the corpus; the metrics
    # join itself is an equi-join on the query key
    "q218_retrieval_eval": "filtered query-vector scan (nq rows)",
}

_RANGE_BOUND = 4096  # widest constant fan-out in the tree is 32 seeds


def _walk(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from _walk(node.initialPlan())
        return
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))
    try:  # scalar/IN subqueries hang off the node, not children()
        it = node.subqueries().iterator()
        while it.hasNext():
            yield from _walk(it.next())
    except Exception:
        pass


def _bnlj_build_bounded(bnlj) -> bool:
    """True iff the broadcast build side of a BNLJ is provably ≤1 row
    (zero-key aggregate), driver-built (LocalTableScan/ExistingRDD), or
    a small constant Range."""
    for i in range(bnlj.children().size()):
        child = bnlj.children().apply(i)
        if not child.nodeName().startswith("BroadcastExchange"):
            continue
        for n in _walk(child):
            name = n.nodeName()
            if name in ("HashAggregate", "SortAggregate", "ObjectHashAggregate") \
                    and n.groupingExpressions().isEmpty():
                return True
            if name == "LocalTableScan" or name.startswith("Scan ExistingRDD"):
                return True
            if name == "Range" and int(str(n.numElements())) <= _RANGE_BOUND:
                return True
        return False
    return False


def _gate_names() -> list[str]:
    todo = {**catalog.queries(), **catalog.staged_queries()}
    return sorted(n for n in todo if n not in _STREAMING_EXEC)


# Driver-hash-safe output types. The r14 driver hash-failed q221/q223
# — the registry's ONLY DecimalType-emitting rows — because Spark hands
# the driver `Decimal(...)` objects while DuckDB's pandas bridge hands
# back float64: numerically equal, canonicalizes differently, hash
# mismatch. This gate makes the emitted-type contract mechanical: every
# live + staged query (streaming included — their memory-sink reads are
# hashed the same way) may emit ONLY types both engines canonicalize
# identically. Round decimal-grid arithmetic INTERNALLY all you want;
# cast to double before emitting (quality.py::psi_from_counts is the
# pattern).
_HASH_SAFE_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "boolean", "string", "date", "timestamp", "timestamp_ntz",
}


def _type_gate_names() -> list[str]:
    todo = {**catalog.queries(), **catalog.staged_queries()}
    return sorted(todo)


@pytest.mark.parametrize("name", _type_gate_names())
def test_hash_safe_output_types(spark, name):
    todo = {**catalog.queries(), **catalog.staged_queries()}
    fn = LAZY_VARIANTS.get(name, todo[name])
    df = fn(spark, "/root/testdata/sf0.001")
    bad = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
           if f.dataType.simpleString() not in _HASH_SAFE_TYPES]
    assert not bad, (
        f"{name} emits non-hash-safe column types {bad}; the driver's "
        "value hash canonicalizes these differently across engines — "
        "cast to a type in _HASH_SAFE_TYPES before emitting")


@pytest.mark.parametrize("name", _gate_names())
def test_no_scale_antipatterns(spark, name):
    todo = {**catalog.queries(), **catalog.staged_queries()}
    fn = LAZY_VARIANTS.get(name, todo[name])
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan()

    violations = []
    for n in _walk(plan):
        node = n.nodeName()
        if node == "CartesianProduct":
            violations.append("CartesianProduct")
        elif node == "BatchEvalPython":
            violations.append("BatchEvalPython (row-at-a-time UDF)")
        elif node in ("Window", "WindowGroupLimit") \
                and n.partitionSpec().size() == 0:
            violations.append(f"unpartitioned {node} (single-task sort)")
        elif node.startswith("BroadcastNestedLoopJoin"):
            if name not in _BNLJ_EXEMPT and not _bnlj_build_bounded(n):
                violations.append(
                    "BroadcastNestedLoopJoin with unbounded build side")
    assert not violations, f"{name}: {violations}"
