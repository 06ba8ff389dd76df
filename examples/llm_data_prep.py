"""Example 3 — LLM training-data preparation pipeline.

Beyond the reference's surface: the end-to-end corpus pipeline this
engine adds for 100 TB training-data work — quality scoring, exact
dedup, test-set decontamination, subword tokenization, chunking, and
token-budget packing, each stage the registered scale-shaped operator
(this is the composition q95 verifies against a single SQL oracle).

Run: python examples/llm_data_prep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

# runnable standalone (`python examples/<name>.py`): the script dir
# is examples/, so put the repo root on the path for goetl_spark
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.dedup import contamination_flags, exact_dedup
    from goetl_spark.operators.sampling import (
        chunk_documents, epoch_shuffle, pack_sequences)
    from goetl_spark.operators.text import gopher_quality_flags, quality_score
    from goetl_spark.operators.tokenizer import (
        vocab_from_corpus, wordpiece_tokenize)
    from goetl_spark.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("example-llm", master="local[4]",
                               shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. URL hygiene: the corpus has no URL column, so construct the
    #    crawl-style mix (tracking params, case variants); canonical
    #    forms collapse variants for URL-level dedup, and a per-domain
    #    cap (partial top-k — no full-corpus window shuffle) bounds any
    #    one domain's contribution
    from goetl_spark.operators.web import normalize_url, url_domain
    from goetl_spark.operators.window import topk_per_group_partial

    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://WWW."), F.col("source"),
                 F.lit(".example.com/d/"), F.col("doc_id"),
                 F.when(F.col("doc_id") % 2 == 0,
                        F.lit("?utm_source=crawl")).otherwise(F.lit("")))
        .alias("url"))
    canon = (urls.withColumn("url", normalize_url("url"))
             .withColumn("domain", url_domain("url")))
    n_domains = canon.select("domain").distinct().count()
    capped = topk_per_group_partial(canon, ["domain"], "doc_id", k=200,
                                    ascending=True)
    n_capped = capped.count()

    # 0b. crawl-frontier URL triage (8 RE2 rules, integer thresholds,
    #     zero UDF) — runs before anything is fetched in production
    from goetl_spark.operators.web import url_quality_flags

    n_url_pass = (url_quality_flags(capped)
                  .filter(F.col("url_pass")).count())

    # 1. quality filter (pure Column expressions, zero UDF)
    kept = (docs.withColumn("q", quality_score(F.col("text")))
            .filter(F.col("q") >= 0.3)
            .select("doc_id", "text"))
    n1 = kept.count()

    # 1b. the published Gopher rule bundle, reported per-rule (the
    #     synthetic corpus is short-doc heavy, so report rather than
    #     filter here; production pipelines filter on gopher_pass)
    n_gopher = (gopher_quality_flags(kept, min_words=10)
                .filter(F.col("gopher_pass")).count())

    # 2. exact dedup on content hash (winners join back to the text)
    winners = exact_dedup(kept, text_col="text", id_col="doc_id") \
        .select(F.col("keep_id").alias("doc_id"))
    deduped = kept.join(winners, on="doc_id")
    n2 = deduped.count()

    # 3. decontaminate against a benchmark set (first 20 docs stand in;
    #    their shingles broadcast — corpus text never shuffles)
    bench = docs.orderBy("doc_id").limit(20).select("doc_id", "text")
    flagged = contamination_flags(deduped, bench, min_hits=1)
    clean = deduped.join(flagged.select("doc_id"), on="doc_id",
                         how="left_anti")
    n3 = clean.count()

    # 3b. standing-blocklist cut: bloom misses skip the shuffle, only
    #     the FPP-bounded hit sliver pays the exact anti-join (the same
    #     operator runs per micro-batch on streams — stream_bloom_cut)
    from goetl_spark.operators.bloom import bloom_anti_join

    blocklist = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    clean = bloom_anti_join(clean, blocklist, on=["doc_id"])
    n3b = clean.count()

    # 3b'. content-level TERM blocklist (token-exact, broadcast list;
    #      only (id, count) pairs shuffle) — the id-bloom cut above
    #      removes known-bad documents, this one flags bad CONTENT
    from goetl_spark.operators.text import term_blocklist_hits

    n_term_flagged = (term_blocklist_hits(clean, ["slow", "dup"])
                      .filter(F.col("block_flag")).count())

    # 3c. corpus-level fluency gate: Kneser-Ney bigram score (the
    #     KenLM-class smoothing CCNet uses); keep docs at or above the
    #     corpus median so the report stays corpus-relative
    from goetl_spark.operators.lm import kneser_ney_logprob_scores

    kn = kneser_ney_logprob_scores(clean)
    n_fluent = (kn.crossJoin(
        F.broadcast(kn.agg(F.expr("percentile_approx(avg_logprob, 0.5)")
                           .alias("med"))))
        .filter(F.col("avg_logprob") >= F.col("med")).count())

    # 4. real subword token counts (broadcast vocab, Arrow-batched)
    vocab = vocab_from_corpus(clean, max_word_pieces=500)
    tokenized = wordpiece_tokenize(clean, vocab)

    # 4b. OR learn a BPE vocabulary from the corpus itself and apply it
    #     (training = two bounded actions per merge; inference = the
    #     same Arrow path as wordpiece)
    from goetl_spark.operators.tokenizer import (
        apply_bpe_merges, learn_bpe_merges)

    merges = learn_bpe_merges(clean, num_merges=10)
    bpe_tokens = (apply_bpe_merges(clean, merges)
                  .agg(F.sum("n_tokens")).collect()[0][0])

    # 4c. OR the third family: unigram-LM (SentencePiece) — hard-EM
    #     training over the distinct-word table, Viterbi inference
    from goetl_spark.operators.tokenizer import (
        learn_unigram_vocab, unigram_tokenize)

    uni_vocab = dict(learn_unigram_vocab(clean, vocab_size=60,
                                         seed_size=400, iterations=2))
    uni_tokens = int(unigram_tokenize(clean, uni_vocab, unk_score=None)
                     .agg(F.sum("n_tokens")).collect()[0][0])

    # 5. chunk long docs into 64-token windows with 8-token overlap
    chunks = chunk_documents(clean, chunk_tokens=64, overlap_tokens=8)
    n4 = chunks.count()

    # 5b. RAG-side sibling: sentence-aligned chunks (sentences whole,
    #     budget-aligned assignment — one cumulative window)
    from goetl_spark.operators.sampling import chunk_by_sentences

    n_sent_chunks = chunk_by_sentences(clean, budget_tokens=64).count()

    # 6. pack token counts into 256-token training sequences
    packed = pack_sequences(
        tokenized.select("doc_id", "n_tokens"), "n_tokens",
        budget=256, order_cols=("doc_id",))
    n_packs = packed.select("pack_id").distinct().count()

    # 7. epoch-deterministic global shuffle before sharding (same
    #    permutation on re-run; a different one per epoch)
    first_doc = int(epoch_shuffle(clean, "doc_id", epoch=0)
                    .select("doc_id").first()[0])

    # 8. survivorship-bias C2ST (the q255 multivariate drift leg wired
    #    into the pipeline, r15 verdict slack item (c)): can a
    #    cross-fitted cell-rate classifier tell the DROPPED documents
    #    from the SURVIVORS on (lang, source, binned length)?
    #    separability ~ 0 says the cascade cut volume without
    #    reshaping the joint corpus mix; a large |z| flags a biased
    #    cascade — and classifier_two_sample_test_by over ["source"]
    #    answers WHICH source the bias lives in. Per-column PSI/KS
    #    can miss a joint-only shift; this is the multivariate check.
    from goetl_spark.quality import classifier_two_sample_test

    feats = docs.select(
        "doc_id", "lang", "source",
        F.when(F.col("n_chars").isNull(), F.lit(-1))
         .when(F.col("n_chars") < 500, F.lit(0))
         .when(F.col("n_chars") < 2000, F.lit(1))
         .otherwise(F.lit(2)).alias("len_bin"),
        (F.floor(F.col("doc_id") / 2) % 2).cast("int").alias("fold"))
    surv = feats.join(clean.select("doc_id"), "doc_id")
    dropped = feats.join(clean.select("doc_id"), "doc_id", "left_anti")
    n_dropped = dropped.count()
    # the scalar C2ST raises on an empty snapshot (by contract); a
    # cascade that dropped nothing has no survivorship question to ask
    c2st = (classifier_two_sample_test(
                dropped, surv, ["lang", "source", "len_bin"],
                "fold").collect()[0]
            if n_dropped else None)

    result = {"input_docs": n0, "domains": n_domains,
              "after_domain_cap": n_capped, "url_pass": n_url_pass,
              "after_quality": n1,
              "gopher_pass": n_gopher, "after_dedup": n2,
              "after_decontamination": n3, "after_blocklist": n3b,
              "term_flagged": n_term_flagged,
              "fluent_docs": n_fluent, "bpe_merges": len(merges),
              "bpe_tokens": int(bpe_tokens),
              "unigram_tokens": uni_tokens, "chunks": n4,
              "sentence_chunks": n_sent_chunks,
              "packs_of_256_tokens": n_packs,
              "epoch0_first_doc": first_doc,
              "survivorship_n_dropped": n_dropped,
              "survivorship_n_kept":
                  int(c2st["n_b"]) if c2st is not None else n3b,
              "survivorship_separability":
                  round(float(c2st["separability"]), 6)
                  if c2st is not None else None,
              "survivorship_z": round(float(c2st["z"]), 6)
                  if c2st is not None else None}
    print(f"llm_data_prep: {result}")
    if owns_spark:
        spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
