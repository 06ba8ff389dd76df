"""Example 7 — model-based curation with encoded features + retrieval
grading.

The round-13 feature/eval layer end-to-end, each stage the registered
scale-shaped operator: categorical metadata (source, language) is
FITTED into bounded encoder tables on a labeled frame — leakage-safe
leave-one-out encoding for the training features, fit==serve literal
tables for everything scored later — an LR quality model trains over
text + encoded features, the whole corpus is scored by the pure
literal-expression scorer (map-only, no ML runtime in the plan), and
the corpus's embedding retriever is graded against labeled ground
truth with exact-arithmetic retrieval metrics. The shape a 100 TB
curation pipeline runs per snapshot: fit on a sample, serve
everything, grade the retriever before trusting its dedup verdicts.

Run: python examples/model_curation.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.classifier import (
        encode_categories, fit_category_encoders, fit_frequency_encoders,
        score_quality, train_quality_classifier)
    from goetl_spark.operators.encoding import target_encode_loo
    from goetl_spark.operators.ranking import retrieval_metrics
    from goetl_spark.operators.similarity import knn_bruteforce
    from goetl_spark.queries import _t
    from goetl_spark.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("example-model-curation", master="local[4]",
                               shuffle_partitions=4)

    docs = _t(spark, sf_dir, "documents")

    # 1) LABEL a training sample with a deterministic quality proxy
    # (in production: human labels or a reference corpus). Here:
    # English docs above the median length are the "reference" class.
    med = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    labeled = docs.withColumn(
        "label",
        F.when((F.col("lang") == "en") & (F.col("n_chars") >= med), 1.0)
         .otherwise(0.0))

    # 2) FIT the categorical feature layer on the labeled frame:
    # leakage-safe LOO encoding builds the TRAINING feature (each
    # row's own label excluded), while the fit==serve literal tables
    # encode everything scored later with the plain class statistics.
    enc_tables = fit_category_encoders(labeled, ["source"], "label")
    freq_tables = fit_frequency_encoders(labeled, ["lang"])
    train = (target_encode_loo(labeled, ["source"], "label",
                               out_col="f_cat_source")
             .transform(lambda d: encode_categories(d, freq_tables)))

    # 3) TRAIN the LR quality model over text + encoded features, then
    # SCORE the full corpus with the literal-expression scorer (the
    # serving path encodes with the fitted tables, not LOO).
    model = train_quality_classifier(
        train, extra_cols=["f_cat_source", "f_cat_lang"])
    serve = encode_categories(encode_categories(docs, enc_tables),
                              freq_tables)
    scored = score_quality(serve, model)
    kept = scored.filter(F.col("quality_prob") >= 0.5)

    # 4) GRADE the embedding retriever against labeled ground truth
    # before trusting it for semantic dedup: brute-force cosine run,
    # same-label qrels, exact-arithmetic metrics.
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    run = knn_bruteforce(emb, queries, k=10)
    qrels = (queries.select(F.col("vec_id").alias("query_id"), "label")
             .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                              "label"), "label")
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id"))
    metrics = retrieval_metrics(run, qrels, k=10)
    summary = metrics.agg(
        F.avg("recall_at_k").alias("mean_recall"),
        F.avg("mrr_at_k").alias("mean_mrr"),
        F.avg("ap_at_k").alias("map_at_k")).collect()[0]

    # 4b) the STANDING retriever + its re-fit trigger (r16): in
    # production the retriever is a persisted IVF index that accretes
    # daily appends under FROZEN centroids — build on half the
    # corpus, append the other half (the day-2 pattern), then monitor
    # recall at the operating nprobe against the full-probe exact
    # search. needs_refit is the operational answer to "have the
    # appends drifted the cells enough that the centroids need
    # re-fitting?" — the LSH re-band discipline for vectors.
    from goetl_spark.operators.similarity import (
        ann_index_recall_report, ann_index_write)
    from goetl_spark.queries import _scratch

    idx_path = _scratch("example_mc_ann_idx")
    ann_index_write(emb.filter(F.col("vec_id") % 2 == 0), idx_path,
                    k_cells=4, iterations=1)
    ann_index_write(emb.filter(F.col("vec_id") % 2 != 0), idx_path,
                    mode="append")
    monitor = ann_index_recall_report(queries, idx_path, k=10,
                                      nprobe=2,
                                      min_recall=0.8).collect()[0]

    # 4c) the day-2 SEMANTIC keep decision (r17): the graded
    # retriever's standing twin for dedup. The semantic index pins
    # the dedup tau beside the IVF cells; a new batch pulls its
    # paraphrase-duplicates of the accepted corpus (and within
    # itself) with one assign pass + a partition-pruned read, then
    # the acceptance rule: a batch doc matching ANY corpus doc drops
    # (the corpus of record wins), the within-batch survivors keep
    # one representative per component (min id — semantic_dedup's
    # deterministic choice). tau=0.25 because the synthetic
    # embeddings are near-orthogonal random vectors (the q264
    # fixture convention); the corpus side is the even vec_ids, so
    # parity distinguishes corpus matches from batch matches below.
    from goetl_spark.operators.dedup import dedup_clusters
    from goetl_spark.operators.similarity import (
        semantic_index_candidates, semantic_index_write)

    sem_path = _scratch("example_mc_sem_idx")
    accepted = emb.filter(F.col("vec_id") % 2 == 0)
    semantic_index_write(accepted, sem_path, threshold=0.25,
                         k_cells=4, iterations=1)
    batch = emb.filter(F.col("vec_id") % 2 != 0)
    cand = semantic_index_candidates(batch, sem_path, nprobe=2)
    drop_cross = (cand.filter(F.col("match_id") % 2 == 0)
                  .select(F.col("query_id").alias("vec_id")).distinct())
    survivors = batch.join(drop_cross, "vec_id", "left_anti")
    within = (cand.filter(F.col("match_id") % 2 != 0)
              .join(survivors.select(F.col("vec_id")
                                     .alias("query_id")), "query_id")
              .join(survivors.select(F.col("vec_id")
                                     .alias("match_id")), "match_id"))
    drop_within = (dedup_clusters(within, "query_id", "match_id")
                   .filter(F.col("cluster_id") < F.col("doc_id"))
                   .select(F.col("doc_id").alias("vec_id")))
    sem_kept = survivors.join(drop_within, "vec_id", "left_anti")
    n_batch = int(batch.count())
    n_drop_cross = int(drop_cross.count())
    n_drop_within = int(drop_within.count())
    n_sem_kept = int(sem_kept.count())

    # 5) GRADE the scorer itself on the labeled frame: ranking quality
    # (exact tie-aware AUC) and confidence quality (reliability bins +
    # total ECE) — the eval-suite legs a threshold can't see.
    from goetl_spark.operators.classifier import calibration_bins, roc_auc

    scored_train = score_quality(train, model)
    auc = roc_auc(scored_train, "quality_prob", "label") \
        .collect()[0]["auc"]
    ece = sum(float(r["ece_term"]) for r in
              calibration_bins(scored_train, "quality_prob", "label",
                               n_bins=10).collect())

    # 6) the TARGETING readout (r14 gains_at_k, wired per the r14
    # verdict): a curation budget acts on the top k scored docs —
    # how many reference-class docs does each depth capture, and how
    # much better than random? Tie blocks contribute in expectation,
    # so the numbers are permutation-invariant under equal scores.
    from goetl_spark.operators.classifier import gains_at_k

    n_lab = scored_train.count()
    gains = {int(r["k"]): (float(r["recall"]), float(r["lift"]))
             for r in gains_at_k(
                 scored_train, "quality_prob", "label",
                 ks=(max(1, n_lab // 20), max(2, n_lab // 4))).collect()}

    out = {
        "labeled_pos": int(labeled.filter("label = 1.0").count()),
        "fitted_sources": len(enc_tables["source"]["values"]),
        "corpus": int(docs.count()),
        "kept": int(kept.count()),
        "retrieval_queries": int(metrics.count()),
        "mean_recall_at_10": float(summary["mean_recall"]),
        "mean_mrr_at_10": float(summary["mean_mrr"]),
        "map_at_10": float(summary["map_at_k"]),
        "ivf_recall_at_nprobe2": round(float(monitor["recall"]), 6),
        "ivf_needs_refit": bool(monitor["needs_refit"]),
        "sem_batch": n_batch,
        "sem_dropped_vs_corpus": n_drop_cross,
        "sem_dropped_within": n_drop_within,
        "sem_kept": n_sem_kept,
        "train_auc": float(auc),
        "train_ece": float(ece),
        "gains": gains,
    }
    if owns_spark:
        spark.stop()
    return out


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
