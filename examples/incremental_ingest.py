"""Example 5 — incremental corpus ingest with a standing dedup index.

The day-over-day production shape: day 1 builds the standing corpus
and its near-dup index ONCE; each later batch checks itself against
the corpus (exact digests + banded-LSH candidates + exact-Jaccard
verification) without recomputing anything corpus-side, then appends
only the accepted documents to both.

Run: python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

# runnable standalone (`python examples/<name>.py`): the script dir
# is examples/, so put the repo root on the path for goetl_spark
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None,
         workdir: str | None = None) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from goetl_spark.operators.bloom import (
        _with_bloom_flag, bloom_build_keys, bloom_index_read,
        bloom_index_write, bloom_params)
    from goetl_spark.operators.dedup import (
        dedup_against, lsh_index_candidates, lsh_index_write,
        ngram_jaccard_pairs)
    from goetl_spark.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("example-incremental", master="local[4]",
                               shuffle_partitions=4)
    workdir = workdir or tempfile.mkdtemp(prefix="goetl_ingest_")
    idx_path = f"{workdir}/lsh_index"
    corpus_path = f"{workdir}/corpus"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- day 1: standing corpus + its LSH index, built once
    day1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    day1.write.mode("overwrite").parquet(corpus_path)
    lsh_index_write(day1, idx_path)
    n_corpus = day1.count()
    # ... and the content-digest bloom index: at cluster scale a later
    # batch probes these bytes (codegen getbit, no corpus read) and
    # routes definite-fresh docs past the exact digest join entirely
    bits, hashes = bloom_params(n_corpus, fpp=0.01)
    bloom_index_write(
        bloom_build_keys(day1.select(F.md5("text").alias("digest")),
                         ["digest"], bits, hashes),
        f"{workdir}/bloom_idx", ["digest"], hashes)

    # --- day 2 batch: half fresh docs, a few exact copies, a few
    #     near-dups (same text + a marker suffix) of corpus docs
    fresh = (docs.filter(F.col("doc_id") % 2 == 1)
             .select((F.col("doc_id") + 100_000).alias("doc_id"), "text")
             .limit(40))
    copies = (day1.limit(5)
              .select((F.col("doc_id") + 200_000).alias("doc_id"), "text"))
    neardups = (day1.limit(5)
                .select((F.col("doc_id") + 300_000).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" near dup tail"))
                        .alias("text")))
    batch = fresh.unionByName(copies).unionByName(neardups)
    n_batch = batch.count()

    corpus = spark.read.parquet(corpus_path)

    # 1a. standing bloom index: flag which batch docs are DEFINITELY
    #     new (bloom miss = no false negatives) without touching the
    #     corpus — the pre-shuffle routing cut at 100 TB
    packed, cols, hashes = bloom_index_read(f"{workdir}/bloom_idx",
                                            ["digest"])
    probed = _with_bloom_flag(
        batch.withColumn("digest", F.md5("text")),
        packed, hashes, cols, "maybe_seen")
    n_definitely_new = probed.filter(~F.col("maybe_seen")).count()

    # 1b. exact layer: digest anti-join against the standing corpus
    #     (corpus text never shuffles — digests only)
    no_exact = dedup_against(batch, corpus)
    n_exact_dropped = n_batch - no_exact.count()

    # 2. near-dup layer: banded candidates from the persisted index,
    #    then EXACT Jaccard verification of just those candidate pairs
    cand = lsh_index_candidates(no_exact, idx_path,
                                include_new_pairs=False)
    cand_docs = (no_exact.join(
        cand.select(F.col("query_id").alias("doc_id")).distinct(),
        "doc_id"))
    pair_universe = cand_docs.unionByName(
        corpus.join(cand.select(F.col("match_id").alias("doc_id"))
                    .distinct(), "doc_id"))
    verified = (ngram_jaccard_pairs(pair_universe, threshold=0.5)
                .select("id_a", "id_b"))
    drop_ids = (verified.select(F.greatest("id_a", "id_b").alias("doc_id"))
                .distinct())
    accepted = no_exact.join(drop_ids, "doc_id", "left_anti")
    n_near_dropped = no_exact.count() - accepted.count()

    # 3. append accepted docs to the corpus AND the index — as a
    #    STREAM (r16): in production the accepted docs arrive
    #    continuously, so the index append runs through
    #    stream_index_append (foreachBatch -> lsh_index_write(append)
    #    behind the batch-id idempotence marker) instead of a one-shot
    #    batch call; by the frozen-order append law the resulting
    #    index is identical either way
    from goetl_spark.streaming.indexes import stream_index_append
    from goetl_spark.streaming.sources import replay_stream

    accepted.write.mode("append").parquet(corpus_path)
    accepted_stream = replay_stream(
        accepted, num_chunks=2, dir=f"{workdir}/replay")
    sq = stream_index_append(
        accepted_stream, idx_path, f"{workdir}/ckpt", "lsh")
    try:
        sq.awaitTermination()
    finally:
        sq.stop()
    n_final = spark.read.parquet(corpus_path).count()

    # 4. the ANN leg of the same day-2 story (r17: the FULL
    #    monitor -> refit -> rebuild loop, the r16 verdict slack
    #    item (b)): day 1 fits the IVF index once; accepted
    #    embeddings stream-append under the FROZEN centroids
    #    (map-only assigns, exactly-once via the layout-2 stamped
    #    subdirs + checkpoint-scoped marker); the recall monitor on a
    #    small FIXED probe batch decides when drifted cell balance
    #    warrants a re-fit; the re-fit is the crash-safe
    #    invalidate-first/commit-last overwrite — and it rebuilds
    #    from the corpus OF RECORD, never by reading the index's own
    #    corpus leg (the overwrite truncates that leg before the
    #    write job would scan it)
    from goetl_spark.operators.index_meta import meta_read
    from goetl_spark.operators.similarity import (
        ann_index_recall_report, ann_index_search, ann_index_write)
    from goetl_spark.streaming.indexes import stream_index_append

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann_path = f"{workdir}/ann_index"
    day1_vecs = emb.filter(F.col("vec_id") % 2 == 0)
    day2_vecs = emb.filter(F.col("vec_id") % 2 != 0)
    ann_index_write(day1_vecs, ann_path, k_cells=4, iterations=1)
    vec_stream = replay_stream(day2_vecs, num_chunks=2,
                               dir=f"{workdir}/vec_replay")
    sq2 = stream_index_append(vec_stream, ann_path,
                              f"{workdir}/vec_ckpt", "ann")
    try:
        sq2.awaitTermination()
    finally:
        sq2.stop()
    # fixed deterministic probe batch — a health check, not a workload
    probe = emb.filter(F.col("vec_id") % 37 == 0)
    report = ann_index_recall_report(
        probe, ann_path, k=5, nprobe=1, min_recall=0.999).collect()[0]
    refit = bool(report["needs_refit"])
    if refit:
        # rebuild over day1+day2 from the source tables: the manifest
        # invalidates first, every leg truncates and lands, the new
        # centroids commit LAST — any crash inside leaves a loudly
        # manifest-less index, never a readable config over data it
        # does not match (and the stream markers reset with it, so
        # tomorrow's appender starts clean)
        ann_index_write(day1_vecs.unionByName(day2_vecs), ann_path,
                        k_cells=4, iterations=1)
    assert meta_read(spark, ann_path) is not None  # committed
    n_hits = ann_index_search(probe, ann_path, k=5, nprobe=2).count()

    result = {"corpus_day1": n_corpus, "batch": n_batch,
              "bloom_definitely_new": n_definitely_new,
              "exact_dropped": n_exact_dropped,
              "near_dropped": n_near_dropped,
              "corpus_after": n_final,
              "ann_recall_nprobe1": float(report["recall"]),
              "ann_refit_triggered": refit,
              "ann_post_search_hits": n_hits}
    print(f"incremental_ingest: {result}")
    shutil.rmtree(workdir, ignore_errors=True)
    if owns_spark:
        spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
