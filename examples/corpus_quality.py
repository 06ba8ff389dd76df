"""Example 4 — corpus quality triage for pre-training data.

The round-7 quality layer end-to-end, each stage the registered
scale-shaped operator: per-source boilerplate stripping, the published
Gopher rule bundle, CCNet perplexity tiers, a trained model-based
quality score, SemDeDup on embeddings, and the epoch-deterministic
shuffle that feeds the training shards.

Run: python examples/corpus_quality.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

# runnable standalone (`python examples/<name>.py`): the script dir
# is examples/, so put the repo root on the path for goetl_spark
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.classifier import (
        score_quality, train_quality_classifier)
    from goetl_spark.operators.dedup import strip_boilerplate
    from goetl_spark.operators.lm import perplexity_buckets
    from goetl_spark.operators.sampling import epoch_shuffle
    from goetl_spark.operators.similarity import semantic_dedup
    from goetl_spark.operators.text import gopher_quality_flags
    from goetl_spark.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("example-corpus-quality", master="local[4]",
                               shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. strip per-source boilerplate lines (order-preserving);
    #    localCheckpoint marks the stage boundary (a parquet write in
    #    production)
    stripped = strip_boilerplate(docs, group_col="source",
                                 min_doc_frac=0.5, min_docs=3) \
        .localCheckpoint(eager=True)
    n_boiler_lines = int(
        stripped.agg(F.sum("n_dropped")).collect()[0][0] or 0)

    # 2. Gopher rule flags (report per-rule pass rates; this synthetic
    #    corpus is short-doc heavy, so the word floor is lowered)
    flagged = gopher_quality_flags(
        stripped.select("doc_id", "source", "text"), min_words=10)
    n_gopher = flagged.filter(F.col("gopher_pass")).count()

    # 3. CCNet perplexity tiers over the corpus's own bigram LM
    tiers = perplexity_buckets(stripped.select("doc_id", "text"))
    tier_counts = {r.lm_bucket: r.n for r in
                   tiers.groupBy("lm_bucket")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 4. model-based score: train on weak labels (head tier = positive,
    #    tail = negative — the CCNet bootstrap), score every doc
    labeled = (stripped.join(tiers.select("doc_id", "lm_bucket"), "doc_id")
               .filter(F.col("lm_bucket") != "middle")
               .withColumn("label",
                           (F.col("lm_bucket") == "head").cast("double")))
    model = train_quality_classifier(labeled, max_iter=20)
    scored = score_quality(stripped.select("doc_id", "text"), model)
    survivors = scored.filter(F.col("quality_prob") >= 0.5) \
        .select("doc_id")
    n_model_kept = survivors.count()

    # 5. SemDeDup on the embedding table (label-blocked config)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem = semantic_dedup(emb, threshold=0.35, bucket_col="label")
    n_sem_kept = sem.filter(F.col("keep")).count()

    # 5b. excerpt/quote detection: asymmetric containment catches the
    #     small-doc-inside-big-doc overlap Jaccard's size symmetry
    #     scores near zero (r8 operator)
    from goetl_spark.operators.dedup import ngram_containment_pairs

    n_contained = ngram_containment_pairs(
        stripped.select("doc_id", "text"), threshold=0.8).count()

    # 6. epoch-0 shuffle of the surviving docs (deterministic shards)
    first_doc = int(epoch_shuffle(survivors, "doc_id", epoch=0)
                    .select("doc_id").first()[0])

    # 7. MIX DIAGNOSTICS (r14): before shipping the surviving corpus,
    #    measure its composition — is any language a source
    #    monoculture (entropy/evenness), how head-heavy is each
    #    language's source mix (top-share), and how saturated is each
    #    language's vocabulary (keep collecting or stop)?
    from goetl_spark.operators.text import vocabulary_richness
    from goetl_spark.quality import categorical_entropy, top_share

    kept_docs = docs.join(survivors, "doc_id")
    mix = {r["lang"]: (r["balance"], r["k"])
           for r in categorical_entropy(
               kept_docs, "source", ["lang"]).collect()}
    src_tot = (kept_docs.groupBy("lang", "source")
               .agg(F.sum("n_chars").alias("chars")))
    head = {r["lang"]: r["share"]
            for r in top_share(src_tot, "chars", ["lang"], k=3).collect()}
    sat = {r["lang"]: r["coverage"]
           for r in vocabulary_richness(
               kept_docs, "text", ["lang"]).collect()}

    # 8. MULTIVARIATE survivorship-bias check (r15): did the pipeline
    #    keep a corpus whose JOINT (lang, source, length-bin) mix
    #    still looks like the input, or did the filters carve out a
    #    joint slice no per-column diagnostic above can see? C2ST
    #    between input and survivors; |z| is the act threshold.
    from goetl_spark.quality import classifier_two_sample_test

    feats = docs.select(
        "doc_id", "lang", "source",
        F.when(F.col("n_chars").isNull(), F.lit(-1))
         .when(F.col("n_chars") < 500, F.lit(0))
         .when(F.col("n_chars") < 2000, F.lit(1))
         .otherwise(F.lit(2)).alias("len_bin"),
        (F.floor(F.col("doc_id") / 2) % 2).cast("int").alias("fold"))
    drift = classifier_two_sample_test(
        feats, feats.join(survivors, "doc_id"),
        ["lang", "source", "len_bin"], "fold").collect()[0]

    result = {"input_docs": n0, "boiler_lines_dropped": n_boiler_lines,
              "gopher_pass": n_gopher, "tiers": tier_counts,
              "model_kept": n_model_kept, "semdedup_kept_vecs": n_sem_kept,
              "containment_pairs": n_contained,
              "epoch0_first_doc": first_doc,
              "mix_evenness": mix, "head3_share": head,
              "vocab_coverage": sat,
              "survivorship_auc": float(drift["auc"]),
              "survivorship_z": float(drift["z"])}
    print(f"corpus_quality: {result}")
    if owns_spark:
        spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
