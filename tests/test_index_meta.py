"""Scheme-agnostic index manifests (operators/index_meta.py) + the
round-16 ADVICE fixes to the standing indexes.

Pins three contracts:

1. STRICT manifests — every standing-index query/append path RAISES
   when the `_meta` leg is unreadable, instead of silently skipping
   the tau/d/config direction guard (the r15 verdict's remote-path
   recall hole: a lower-tau query against an index whose manifest the
   driver could not read used to return SILENTLY INCOMPLETE results).
   The manifest now travels through the Hadoop FileSystem API
   resolved from the path's own scheme, so the only scheme-dependent
   code left is the optional legacy fallback — and that returns None
   on a remote scheme, which now means RAISE, never skip.
2. NULL elements inside token arrays (r16 ADVICE medium) —
   jaccard_index candidates must equal jaccard_join exactly: NULL
   tokens are dropped before sizing/sorting, so a pair whose prefixes
   used to share only an unmatchable NULL key is found again.
3. ann_index_search's fact-sized-batch guard — the broadcast contract
   fails loudly via the batch count that rides the probe-set
   aggregate (zero extra jobs), not as an executor OOM.
"""
from __future__ import annotations

import os

import pytest

from goetl_spark.operators.dedup import (
    edit_distance_index_candidates,
    edit_distance_index_write,
    jaccard_index_candidates,
    jaccard_index_write,
    jaccard_join,
    lsh_index_candidates,
    lsh_index_write,
    simhash_index_candidates,
    simhash_index_write,
)
from goetl_spark.operators.index_meta import (
    _legacy_read,
    meta_config,
    meta_read,
    meta_write,
)
from goetl_spark.operators.similarity import ann_index_search, ann_index_write


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_meta_roundtrip_and_hidden_from_parquet(spark, tmp_path):
    path = str(tmp_path / "idx")
    meta_write(spark, path, {"threshold": 0.8})
    assert meta_read(spark, path) == {"threshold": 0.8}
    # overwrite replaces
    meta_write(spark, path, {"threshold": 0.9})
    assert meta_read(spark, path) == {"threshold": 0.9}
    # `_meta` is invisible to a parquet read of the same root (the
    # LSH/SimHash root layouts depend on the hidden-file convention)
    spark.range(5).write.mode("append").parquet(path)
    assert spark.read.parquet(path).count() == 5


def test_meta_read_missing_returns_none(spark, tmp_path):
    assert meta_read(spark, str(tmp_path / "nothing")) is None


def test_legacy_fallback_local_and_remote(spark, tmp_path):
    # pre-migration local index: only the driver-local JSON exists
    import json

    p = tmp_path / "legacy_idx"
    p.mkdir()
    (p / "_old_meta.json").write_text(json.dumps({"n": 3}))
    assert meta_read(spark, str(p), legacy="_old_meta.json") == {"n": 3}
    # a remote scheme has no driver-local file to fall back to
    assert _legacy_read("s3a://bucket/idx", "_old_meta.json") is None


# --- contract 1: strict manifests -----------------------------------------


def test_jaccard_candidates_raise_without_manifest(spark, tmp_path):
    path = str(tmp_path / "jidx")
    corpus = _docs(spark, [(1, ["a", "b", "c"]), (2, ["a", "b", "d"])])
    jaccard_index_write(corpus, path, threshold=0.5)
    os.remove(f"{path}/_meta.json")
    batch = _docs(spark, [(10, ["a", "b", "c"])])
    # the old behavior silently skipped the tau guard here — a batch
    # queried at a LOWER tau than the build lost matches with no error
    with pytest.raises(ValueError, match="no readable manifest"):
        jaccard_index_candidates(batch, path, threshold=0.3)
    with pytest.raises(ValueError, match="no readable manifest"):
        jaccard_index_candidates(batch, path)  # even without explicit tau
    with pytest.raises(ValueError, match="no readable manifest"):
        jaccard_index_write(corpus, path, threshold=0.5, mode="append")


def test_jaccard_direction_guard_fires_through_spark_manifest(spark,
                                                              tmp_path):
    path = str(tmp_path / "jidx2")
    jaccard_index_write(_docs(spark, [(1, ["a", "b"])]), path,
                        threshold=0.8)
    batch = _docs(spark, [(10, ["a", "b"])])
    with pytest.raises(ValueError, match="pigeonhole"):
        jaccard_index_candidates(batch, path, threshold=0.5)
    # higher tau is a candidate superset — allowed
    assert jaccard_index_candidates(batch, path, threshold=0.9) is not None


def test_edit_candidates_raise_without_manifest(spark, tmp_path):
    path = str(tmp_path / "eidx")
    corpus = spark.createDataFrame([(1, "kitten"), (2, "mitten")],
                                   "doc_id long, text string")
    edit_distance_index_write(corpus, path, max_dist=2)
    os.remove(f"{path}/_meta.json")
    batch = spark.createDataFrame([(10, "sitten")],
                                  "doc_id long, text string")
    # the old fallback guessed idx_d = query d, mis-enumerating the
    # stored segmentation into near-empty candidates SILENTLY
    with pytest.raises(ValueError, match="no readable manifest"):
        edit_distance_index_candidates(batch, path, max_dist=1)
    with pytest.raises(ValueError, match="no readable manifest"):
        edit_distance_index_write(corpus, path, max_dist=2, mode="append")


def test_lsh_simhash_raise_without_manifest(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog {i % 2}")
         for i in range(6)], "doc_id long, text string")
    lp = str(tmp_path / "lidx")
    lsh_index_write(docs, lp)
    os.remove(f"{lp}/_meta.json")
    with pytest.raises(ValueError, match="no readable manifest"):
        lsh_index_candidates(docs, lp)
    with pytest.raises(ValueError, match="no readable manifest"):
        lsh_index_write(docs, lp, mode="append")
    sp = str(tmp_path / "sidx")
    simhash_index_write(docs, sp, max_hamming=4)
    os.remove(f"{sp}/_meta.json")
    with pytest.raises(ValueError, match="no readable manifest"):
        simhash_index_candidates(docs, sp, max_hamming=4)
    with pytest.raises(ValueError, match="no readable manifest"):
        simhash_index_write(docs, sp, max_hamming=4, mode="append")


def test_rebuild_crash_leaves_no_mismatched_manifest(spark, tmp_path,
                                                     monkeypatch):
    """Invalidate-first / commit-last: a REBUILD that crashes between
    the data legs must leave NO readable manifest — in either crash
    direction a surviving manifest would describe data it does not
    match (new tau over old prefixes loses recall silently; old tau
    over new shorter prefixes does too). With the manifest gone the
    readers raise, so the half-rebuilt index is LOUD."""
    import goetl_spark.operators.dedup as dd

    path = str(tmp_path / "jrebuild")
    corpus = _docs(spark, [(1, ["a", "b", "c"]), (2, ["a", "b", "d"])])
    jaccard_index_write(corpus, path, threshold=0.8)
    assert meta_config(meta_read(spark, path)) == {"threshold": 0.8}

    # crash the rebuild mid-data: fail inside the per-record sort leg
    def boom(*a, **k):
        raise RuntimeError("injected rebuild crash")

    monkeypatch.setattr(dd, "_jaccard_sorted", boom)
    with pytest.raises(RuntimeError, match="injected"):
        jaccard_index_write(corpus, path, threshold=0.5)
    monkeypatch.undo()
    # the OLD manifest was invalidated before any leg was touched and
    # the new one never committed -> queries raise instead of trusting
    # a config that may not match the on-disk legs
    assert meta_read(spark, path) is None
    with pytest.raises(ValueError, match="no readable manifest"):
        jaccard_index_candidates(_docs(spark, [(9, ["a", "b"])]), path)
    # a completed rebuild recommits and recovers
    jaccard_index_write(corpus, path, threshold=0.5)
    assert meta_config(meta_read(spark, path)) == {"threshold": 0.5}


def test_overwrite_rebuild_resets_stream_marker(spark, tmp_path):
    """meta_invalidate removes the streaming append marker with the
    manifest: an overwrite is a NEW index, and a stale marker would
    make a new stream's restarted batch ids look like replays (the
    subdir layouts don't truncate the path, so the reset must be
    explicit)."""
    from goetl_spark.streaming.indexes import (
        _marker_read, make_index_appender)

    path = str(tmp_path / "jmarker")
    corpus = _docs(spark, [(1, ["a", "b", "c"])])
    jaccard_index_write(corpus, path, threshold=0.8)
    make_index_appender(path, "jaccard", threshold=0.8)(
        _docs(spark, [(11, ["a", "c"])]), batch_id=7)
    assert _marker_read(spark, path) == 7
    jaccard_index_write(corpus, path, threshold=0.8)  # rebuild
    assert _marker_read(spark, path) is None


# --- contract 2: NULL elements inside token arrays -------------------------


def test_jaccard_index_null_elements_match_jaccard_join(spark, tmp_path):
    # the ADVICE reproducer: two [NULL, 'c'] records at tau=1.0 used
    # to share only the unmatchable NULL prefix key and get dropped
    corpus = _docs(spark, [(1, [None, "c"])])
    batch = _docs(spark, [(10, [None, "c"])])
    path = str(tmp_path / "jnull")
    jaccard_index_write(corpus, path, threshold=1.0)
    got = {(r["query_id"], r["match_id"], r["jaccard"])
           for r in jaccard_index_candidates(batch, path).collect()}
    assert got == {(10, 1, 1.0)}

    # and the general parity law on a corpus with NULLs sprinkled in
    corpus2 = [(1, ["a", None, "b", "c"]), (2, ["a", "b", None, "d"]),
               (3, [None, None, "x"]), (4, ["x", "y"]), (5, [None])]
    batch2 = [(10, ["a", "b", "c", None]), (11, ["x", None]),
              (12, [None, None])]
    path2 = str(tmp_path / "jnull2")
    jaccard_index_write(_docs(spark, corpus2), path2, threshold=0.5)
    got2 = {(r["query_id"], r["match_id"], round(r["jaccard"], 9))
            for r in jaccard_index_candidates(
                _docs(spark, batch2), path2,
                include_new_pairs=False).collect()}
    want2 = {(r["doc_id"], r["r_id"], round(r["jaccard"], 9))
             for r in jaccard_join(
                 _docs(spark, batch2),
                 _docs(spark, corpus2).selectExpr("doc_id AS r_id",
                                                  "tokens"),
                 "doc_id", "tokens", "r_id", "tokens", 0.5).collect()}
    assert got2 == want2
    # sanity: the law is non-vacuous, and exactly the NULL-stripped
    # overlaps match ({a,b,c}≡{a,b,c}; {a,b,c}∩{a,b,d}=2/4; {x}≡{x};
    # {x}∩{x,y}=1/2; the all-NULL batch record 12 vanishes)
    assert want2 == {(10, 1, 1.0), (10, 2, 0.5),
                     (11, 3, 1.0), (11, 4, 0.5)}


def test_jaccard_index_all_null_tokens_vanish(spark, tmp_path):
    # a record whose tokens are ALL NULL has no non-null set — it can
    # never match, exactly as in jaccard_join's null-strict sort side
    path = str(tmp_path / "jallnull")
    jaccard_index_write(_docs(spark, [(1, [None, None]), (2, ["a"])]),
                        path, threshold=0.5)
    recs = spark.read.parquet(f"{path}/records")
    assert {r["__id"] for r in recs.collect()} == {2}


# --- contract 3: ann_index_search batch guard ------------------------------


def test_ann_search_batch_size_guard(spark, tmp_path):
    rows = [(i, [float(i % 3), float((i * 7) % 5), 1.0])
            for i in range(30)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    path = str(tmp_path / "aguard")
    ann_index_write(df, path, k_cells=3, iterations=1)
    with pytest.raises(ValueError, match="max_batch_rows"):
        ann_index_search(df, path, k=3, max_batch_rows=10)
    # at the documented cap the search is unchanged
    assert ann_index_search(df, path, k=3,
                            max_batch_rows=30).count() > 0


def test_lsh_rebuild_safe_under_dynamic_partition_overwrite(spark,
                                                            tmp_path):
    """The root-layout writers cannot rely on overwrite truncation:
    under spark.sql.sources.partitionOverwriteMode=dynamic only the
    written band partitions are replaced — the per-write static
    option pins full truncation (stale bands from a smaller rebuild
    corpus must not survive), and meta_invalidate resets the stream
    marker + manifest regardless of the session default."""
    from goetl_spark.streaming.indexes import (
        _marker_read, make_index_appender)

    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        docs = spark.createDataFrame(
            [(i, f"the quick brown fox jumps over dog {i}")
             for i in range(8)], "doc_id long, text string")
        path = str(tmp_path / "ldyn")
        lsh_index_write(docs, path)
        make_index_appender(path, "lsh")(
            docs.withColumn("doc_id", docs.doc_id + 50), batch_id=9)
        assert _marker_read(spark, path) == 9
        n_full = spark.read.parquet(path).count()
        # rebuild on a SMALLER corpus: stale bands + marker must go
        lsh_index_write(docs.filter("doc_id < 2"), path)
        assert _marker_read(spark, path) is None
        assert meta_read(spark, path) is not None  # committed last
        n_small = spark.read.parquet(path).count()
        assert n_small < n_full
        ids = {r["doc_id"] for r in
               spark.read.parquet(path).select("doc_id").collect()}
        assert ids == {0, 1}  # no stale rows survived the rebuild
    finally:
        spark.conf.set(key, old)
