"""Join / groupby / union / CDC / SCD semantics tests (SURVEY §2.4-2.7)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.operators import groupby as G
from goetl_spark.operators.cdc import capture_changes
from goetl_spark.operators.join import JoinConfig, join, lookup, semi_join, anti_join
from goetl_spark.operators.scd import OPEN_END_DATE, scd_type1, scd_type2, scd_type3
from goetl_spark.operators.union import distinct, fan_in


def _left(spark):
    return spark.createDataFrame(
        [Row(k=1, name="a"), Row(k=2, name="b"), Row(k=None, name="nullkey")],
        "k int, name string",
    )


def _right(spark):
    return spark.createDataFrame(
        [Row(k=1, v=10), Row(k=1, v=11), Row(k=3, v=30), Row(k=None, v=99)],
        "k int, v int",
    )


def test_inner_join_one_to_many_and_null_keys(spark):
    # one-to-many expansion (join.go:140-146); NULL keys never match
    # (join.go:130-137 skip semantics)
    out = join(_left(spark), _right(spark),
               JoinConfig(join_type="inner", left_keys=["k"]))
    rows = out.collect()
    assert len(rows) == 2  # k=1 matched twice; null keys dropped
    assert {r.v for r in rows} == {10, 11}


def test_left_join_preserves_null_key_rows(spark):
    out = join(_left(spark), _right(spark),
               JoinConfig(join_type="left", left_keys=["k"]))
    rows = out.collect()
    # 2 matches for k=1, 1 unmatched k=2, 1 null-key row preserved with null right
    assert len(rows) == 4
    nullkey = [r for r in rows if r.name == "nullkey"][0]
    assert nullkey.v is None


def test_full_join_collision_rename(spark):
    # unprefixed collision → right_<col> (join.go:218-222)
    l = spark.createDataFrame([Row(k=1, v=1)])
    r = spark.createDataFrame([Row(k=2, v=2)])
    out = join(l, r, JoinConfig(join_type="full", left_keys=["k"]))
    assert set(out.columns) == {"k", "v", "right_k", "right_v"}
    assert out.count() == 2


def test_join_field_prefixes(spark):
    out = join(
        _left(spark), _right(spark),
        JoinConfig(join_type="inner", left_keys=["k"],
                   field_prefix={"left": "l_", "right": "r_"}),
    )
    assert set(out.columns) == {"l_k", "l_name", "r_k", "r_v"}


def test_lookup_broadcast_left_join(spark):
    src = spark.createDataFrame([Row(nk=1, x="p"), Row(nk=9, x="q")])
    dim = spark.createDataFrame([Row(nk=1, nation="FRANCE")])
    out = lookup(src, dim, keys=["nk"]).collect()
    got = {r.x: r.nation for r in out}
    assert got == {"p": "FRANCE", "q": None}


def test_semi_anti(spark):
    l = spark.createDataFrame([Row(k=1), Row(k=2)])
    r = spark.createDataFrame([Row(k=1)])
    assert semi_join(l, r, ["k"]).collect()[0].k == 1
    assert anti_join(l, r, ["k"]).collect()[0].k == 2


def test_groupby_facade(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=None), Row(g="b", v=2.0)],
        "g string, v double",
    )
    out = G.group_by(df, ["g"], G.count("n"), G.sum_("v", "sv"),
                     G.avg("v", "av"), G.min_("v", "mn"), G.max_("v", "mx"))
    rows = out.collect()
    # deterministic order by group key (groupby.go:196-199)
    assert [r.g for r in rows] == ["a", "b"]
    a = rows[0]
    assert a.n == 2          # count counts ALL records (groupby.go:253-269)
    assert a.sv == 1.0       # sum skips NULLs (groupby.go:279-286)
    assert a.av == 1.0       # avg over non-null only


def test_groupby_empty_group_avg_null(spark):
    df = spark.createDataFrame([Row(g="a", v=None)], "g string, v double")
    r = G.group_by(df, ["g"], G.avg("v", "av")).collect()[0]
    assert r.av is None      # empty group avg → NULL (groupby.go:314-319)


def test_global_agg_single_row(spark):
    df = spark.createDataFrame([Row(v=1), Row(v=2)])
    out = G.GroupBy([], [G.sum_("v", "s")]).apply(df)
    assert out.collect() == [Row(s=3)]


def test_fan_in_heterogeneous(spark):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(x=2, z=9.0)])
    out = fan_in([a, b]).orderBy("x").collect()
    assert out[0].y == "a" and out[0].z is None
    assert out[1].y is None and out[1].z == 9.0


def test_distinct_subset(spark):
    df = spark.createDataFrame([Row(a=1, b=1), Row(a=1, b=2)])
    assert distinct(df, ["a"]).count() == 1


# --- CDC (dag/tasks/cdc.go) -------------------------------------------------

def _snapshots(spark):
    prev = spark.createDataFrame(
        [Row(id=1, v="old", w=1), Row(id=2, v="same", w=2), Row(id=3, v="gone", w=3),
         Row(id=None, v="nullkey", w=0)],
        "id int, v string, w int",
    )
    cur = spark.createDataFrame(
        [Row(id=1, v="new", w=1), Row(id=2, v="same", w=2), Row(id=4, v="born", w=4),
         Row(id=None, v="nullkey", w=0)],
        "id int, v string, w int",
    )
    return cur, prev


def test_cdc_insert_update_delete(spark):
    cur, prev = _snapshots(spark)
    out = capture_changes(cur, prev, ["id"], ["v", "w"],
                          timestamp="2024-01-01 00:00:00")
    got = {r.id: r.change_type for r in out.collect()}
    # null-key records silently skipped (cdc.go:125-128); unchanged dropped
    assert got == {1: "UPDATE", 3: "DELETE", 4: "INSERT"}


def test_cdc_delete_carries_previous_values(spark):
    cur, prev = _snapshots(spark)
    out = capture_changes(cur, prev, ["id"], ["v"], timestamp="2024-01-01 00:00:00")
    deleted = [r for r in out.collect() if r.change_type == "DELETE"][0]
    assert deleted.v == "gone"   # cdc.go:161-171 emits previous record


def test_cdc_compare_fields_scoped(spark):
    # only fields listed in compare_fields trigger UPDATE
    cur, prev = _snapshots(spark)
    out = capture_changes(cur, prev, ["id"], ["w"], timestamp="2024-01-01 00:00:00")
    got = {r.id: r.change_type for r in out.collect()}
    assert 1 not in got          # v changed but w didn't


# --- SCD (dag/tasks/scd.go) -------------------------------------------------

def _dim(spark):
    return spark.createDataFrame(
        [
            # closed history row
            Row(id=1, attr="v0", effective_from="2020-01-01",
                effective_to="2021-01-01", is_current=False),
            Row(id=1, attr="v1", effective_from="2021-01-01",
                effective_to=OPEN_END_DATE, is_current=True),
            Row(id=2, attr="stable", effective_from="2020-01-01",
                effective_to=OPEN_END_DATE, is_current=True),
        ],
    )


def test_scd1_passthrough(spark):
    src = spark.createDataFrame([Row(id=1, attr="x")])
    assert scd_type1(src, _dim(spark)).collect() == [Row(id=1, attr="x")]


def test_scd2_close_insert_unchanged_new(spark):
    src = spark.createDataFrame(
        [Row(id=1, attr="v2"),      # changed → close old + insert
         Row(id=2, attr="stable"),  # unchanged → passthrough
         Row(id=9, attr="fresh")],  # new key → insert current
    )
    out = scd_type2(src, _dim(spark), ["id"], ["attr"],
                    effective_date="2024-06-01").collect()
    assert len(out) == 5
    by = {(r.id, r.attr): r for r in out}
    closed = by[(1, "v1")]
    assert closed.is_current is False and closed.effective_to == "2024-06-01"
    new = by[(1, "v2")]
    assert new.is_current is True and new.effective_from == "2024-06-01" \
        and new.effective_to == OPEN_END_DATE
    assert by[(2, "stable")].is_current is True
    fresh = by[(9, "fresh")]
    assert fresh.is_current is True and fresh.effective_from == "2024-06-01"
    assert by[(1, "v0")].is_current is False  # history untouched


def test_scd3_previous_columns_and_version(spark):
    dim = spark.createDataFrame([Row(id=1, attr="old", version=3)])
    src = spark.createDataFrame([Row(id=1, attr="new"), Row(id=2, attr="brand")])
    rows = {r.id: r for r in scd_type3(src, dim, ["id"], ["attr"]).collect()}
    assert rows[1].previous_attr == "old" and rows[1].version == 4
    assert rows[2].previous_attr is None and rows[2].version == 1


# --- MERGE (operators/merge.py) ---------------------------------------------

def test_merge_update_insert_delete_keep(spark):
    from goetl_spark.operators.merge import merge

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, bal double")
    source = spark.createDataFrame(
        [(1, "a2", 15.0),     # matched → update
         (2, "b", -5.0),      # matched + delete condition → delete
         (9, "new", -1.0)],   # source-only → insert (even with negative bal)
        "id int, name string, bal double")
    out = {r.id: r for r in merge(
        target, source, on=["id"],
        delete_condition=F.col("bal") < 0).collect()}
    assert set(out) == {1, 3, 9}
    assert out[1].name == "a2" and out[1].bal == 15.0  # source wins
    assert out[3].name == "c"                          # target-only kept
    assert out[9].name == "new"                        # inserted


def test_merge_no_insert_mode(spark):
    from goetl_spark.operators.merge import merge

    target = spark.createDataFrame([(1, 1.0)], "id int, v double")
    source = spark.createDataFrame([(1, 2.0), (2, 9.0)], "id int, v double")
    out = merge(target, source, on=["id"], insert_unmatched=False).collect()
    assert [(r.id, r.v) for r in out] == [(1, 2.0)]


def _file_snapshot(root):
    """{relpath: (size, mtime_ns, md5)} for every parquet file under root."""
    import hashlib
    import os

    snap = {}
    for r, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                st = os.stat(p)
                digest = hashlib.md5(open(p, "rb").read()).hexdigest()
                snap[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns, digest)
    return snap


def test_merge_partitioned_rewrites_only_touched(spark, tmp_path):
    from goetl_spark.operators.merge import merge, merge_partitioned

    path = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10), i % 4) for i in range(1, 41)],
        "id int, name string, bal double, part int")
    target.repartition(4).write.partitionBy("part").parquet(path)
    before = _file_snapshot(path)

    # changeset touches parts 1 and 2 only: update id=1 (part 1), delete
    # id=2 (part 2, bal<0 trigger), insert id=99 (part 2)
    source = spark.createDataFrame(
        [(1, "upd", 111.0, 1), (2, "x", -1.0, 2), (99, "new", 9.0, 2)],
        "id int, name string, bal double, part int")
    stats = merge_partitioned(
        spark, path, source, on=["id"], partition_col="part",
        delete_condition=F.col("bal") < 0)
    assert stats["touched_partitions"] == 2
    assert stats["total_partitions"] == 4

    after = _file_snapshot(path)
    untouched_b = {p: v for p, v in before.items()
                   if p.startswith(("part=0", "part=3"))}
    untouched_a = {p: v for p, v in after.items()
                   if p.startswith(("part=0", "part=3"))}
    # byte-identical, not even rewritten-in-place (mtime preserved)
    assert untouched_b == untouched_a

    # result equals the full-table merge
    got = {r.id: r for r in spark.read.parquet(path).collect()}
    want = {r.id: r for r in merge(
        target, source, on=["id"],
        delete_condition=F.col("bal") < 0).collect()}
    assert set(got) == set(want)
    for k in want:
        assert (got[k].name, got[k].bal, got[k].part) == \
            (want[k].name, want[k].bal, want[k].part)


def test_merge_partitioned_delete_can_empty_partition(spark, tmp_path):
    from goetl_spark.operators.merge import merge_partitioned

    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, 5.0, 0), (2, 6.0, 1)], "id int, bal double, part int"
    ).write.partitionBy("part").parquet(path)
    # delete the only row of part 1
    src = spark.createDataFrame([(2, -1.0, 1)], "id int, bal double, part int")
    merge_partitioned(spark, path, src, on=["id"], partition_col="part",
                      delete_condition=F.col("bal") < 0)
    rows = spark.read.parquet(path).collect()
    assert [(r.id, r.part) for r in rows] == [(1, 0)]


# --- bloom join pruning (operators/bloom.py) --------------------------------

def test_bloom_prune_superset_and_join_parity(spark):
    from goetl_spark.operators.bloom import bloom_prune

    fact = spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS v")
    dim = spark.range(0, 5000).filter("id % 50 = 0")\
        .selectExpr("id AS k", "id AS d")  # 100 keys

    pruned = bloom_prune(fact, dim, "k", expected_items=100, fpp=0.01)
    kept = pruned.count()
    # no false negatives: every true match survives ...
    true_matches = 100
    assert kept >= true_matches
    # ... and the filter actually prunes (99.9% of rows have no match;
    # fpp 1% => kept should be well under 5% of the fact)
    assert kept < 250

    got = sorted(pruned.join(dim, "k").select("k", "v", "d").collect())
    want = sorted(fact.join(dim, "k").select("k", "v", "d").collect())
    assert got == want


def test_bloom_params_sizing():
    from goetl_spark.operators.bloom import bloom_params

    m, h = bloom_params(1000, 0.01)
    assert m % 64 == 0 and 9000 < m < 11000  # ~9.6 bits/key at 1% fpp
    assert h in (6, 7)


def test_bloom_build_word_packing(spark):
    from goetl_spark.operators.bloom import (
        bloom_build, bloom_might_contain, bloom_params)

    dim = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    m, h = bloom_params(3, 0.001)
    packed = bloom_build(dim, "k", m, h)
    assert len(packed) == m // 64
    probe = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zzz",), ("qqq",)], "k string")
    got = {r.k: r.hit for r in probe.select(
        "k", bloom_might_contain(packed, m, h, F.col("k")).alias("hit")
    ).collect()}
    assert got["a"] and got["b"] and got["c"]  # never a false negative


def test_bloom_prune_drops_null_keys(spark):
    from goetl_spark.operators.bloom import bloom_prune

    fact = spark.createDataFrame([(1, "x"), (None, "y"), (2, "z")],
                                 "k int, v string")
    dim = spark.createDataFrame([(1,), (None,)], "k int")
    out = bloom_prune(fact, dim, "k", expected_items=2).collect()
    assert all(r.k is not None for r in out)
    assert {r.v for r in out} >= {"x"}
