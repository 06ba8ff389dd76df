"""The examples/ programs must actually run (reference parity:
examples/main.go ships runnable end-to-end demos)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

SF = "/root/testdata/sf0.001"


def test_csv_json_cleaning_example(spark, tmp_path):
    from csv_json_cleaning import main

    r = main(str(tmp_path), spark=spark)
    assert r["input_rows"] == 4
    assert r["cleaned_rows"] == 2      # blank name + missing age dropped
    assert r["roundtrip_rows"] == 2
    assert r["grades"] == {"B": 1, "A": 1}


def test_warehouse_pipeline_example(spark):
    from warehouse_pipeline import main

    r = main(SF, spark=spark)
    assert r["quality_passed"] is True
    assert r["scd2_closed"] > 0
    assert r["scd2_rows"] > r["scd2_closed"]
    assert r["top_nation"][1] > 0


def test_llm_data_prep_example(spark):
    from llm_data_prep import main

    r = main(SF, spark=spark)
    assert r["input_docs"] >= r["after_quality"] >= r["after_dedup"] \
        >= r["after_decontamination"] > 0
    assert r["after_decontamination"] < r["input_docs"]  # bench leak removed
    assert 0 < r["after_blocklist"] <= r["after_decontamination"]
    assert 0 < r["fluent_docs"] <= r["after_blocklist"]
    assert r["bpe_merges"] == 10 and r["bpe_tokens"] > 0
    assert 0 < r["sentence_chunks"] <= r["chunks"] * 2
    assert r["chunks"] >= r["after_blocklist"]
    assert r["packs_of_256_tokens"] > 0
    assert 0 <= r["gopher_pass"] <= r["after_quality"]
    assert r["domains"] > 0
    assert r["after_domain_cap"] <= min(r["input_docs"],
                                        200 * r["domains"])
    # the epoch-0 shuffle is deterministic: same first doc on re-run
    r2 = main(SF, spark=spark)
    assert r2["epoch0_first_doc"] == r["epoch0_first_doc"]


def test_corpus_quality_example(spark):
    from corpus_quality import main

    r = main(SF, spark=spark)
    assert r["input_docs"] > 0
    assert 0 <= r["gopher_pass"] <= r["input_docs"]
    assert sum(r["tiers"].values()) <= r["input_docs"]
    assert set(r["tiers"]) <= {"head", "middle", "tail"}
    assert 0 < r["model_kept"] <= r["input_docs"]
    assert 0 < r["semdedup_kept_vecs"] <= 500
    assert r["containment_pairs"] >= 0
    # mix-diagnostics leg (r14): every surviving language reports
    # evenness in [0,1] (or None for a single-source language), a
    # top-3 head share in (0,1], and a vocabulary coverage in [0,1]
    assert r["mix_evenness"] and set(r["head3_share"]) == set(
        r["vocab_coverage"])
    for bal, k in r["mix_evenness"].values():
        assert (bal is None and k == 1) or 0.0 <= bal <= 1.0 + 1e-9
    for share in r["head3_share"].values():
        assert 0.0 < share <= 1.0
    for cov in r["vocab_coverage"].values():
        assert 0.0 <= cov <= 1.0
    # survivorship-bias leg (r15): the C2ST readout is a valid AUC;
    # keeping a model-filtered subset of the input is REAL joint
    # drift, so no tight near-0.5 pin — just the contract bounds
    assert 0.0 <= r["survivorship_auc"] <= 1.0
    r2 = main(SF, spark=spark)
    assert r2["epoch0_first_doc"] == r["epoch0_first_doc"]


def test_incremental_ingest_example(spark, tmp_path):
    from incremental_ingest import main

    r = main(SF, spark=spark, workdir=str(tmp_path / "ingest"))
    assert r["exact_dropped"] == 5          # the 5 exact copies
    # bloom has no false negatives: every doc the exact layer dropped
    # was flagged maybe-seen, so definitely-new ≤ batch − dropped
    assert r["bloom_definitely_new"] <= r["batch"] - r["exact_dropped"]
    # and with 1% FPP on this size the cut is near-exact
    assert r["bloom_definitely_new"] >= r["batch"] - r["exact_dropped"] - 3
    assert r["near_dropped"] >= 4           # near-dups caught+verified
    assert r["corpus_after"] == (r["corpus_day1"] + r["batch"]
                                 - r["exact_dropped"] - r["near_dropped"])
    # r17 monitor->refit->rebuild loop: the recall reading is a valid
    # fraction, the rebuild decision matches the 0.999 floor, and the
    # index answers searches afterwards either way (manifest committed)
    assert 0.0 <= r["ann_recall_nprobe1"] <= 1.0
    assert r["ann_refit_triggered"] == (r["ann_recall_nprobe1"] < 0.999)
    assert r["ann_post_search_hits"] > 0


def test_timeseries_monitoring_example(spark, tmp_path):
    from timeseries_monitoring import main

    r = main(SF, spark=spark, workdir=str(tmp_path / "ts"))
    # the continuous-aggregate contract holds on the streamed table
    assert r["incremental_exact"] is True
    assert r["rollup_rows"] > 0
    assert r["series"] == len(r["slopes"]) > 0
    assert r["resid_buckets"] > 0
    for v in r["daily_acf"].values():
        assert -1.0 <= v <= 1.0
    # the alarm battery is selective, not saturated
    assert 0 <= r["cusum_alarms"] < r["resid_buckets"] / 2
    # drift leg (r14): stream-accumulated PSI vs the early-window
    # reference is finite and small on stationary synthetic data
    assert 0.0 <= float(r["stream_psi"]) < 1.0
    # calibration leg: the seasonal profile's claimed probabilities
    # are near-calibrated against their own observed frequencies
    assert 0.0 <= r["calibration_ece"] < 0.25
    # forecast-grading leg (r14): every fitted series is graded; MAE
    # is finite and R² bounded above by 1 (a flat synthetic series
    # can grade negative — worse than predicting the mean is a real
    # verdict, not an error)
    assert len(r["forecast_eval"]) > 0
    for mae, r2 in r["forecast_eval"].values():
        assert mae is not None and mae >= 0.0
        assert r2 is None or r2 <= 1.0


def test_model_curation_example(spark):
    from model_curation import main

    r = main(SF, spark=spark)
    assert r["corpus"] > 0 and 0 < r["kept"] < r["corpus"]
    assert r["labeled_pos"] > 0
    assert r["fitted_sources"] >= 2
    assert r["retrieval_queries"] == 20
    for k in ("mean_recall_at_10", "mean_mrr_at_10", "map_at_10"):
        assert 0.0 <= r[k] <= 1.0
    # the synthetic labels are only weakly embedded (measured MRR ~0.25
    # at sf0.001, barely above the ~0.23 random floor for 10%-relevant
    # qrels) — pin that the pipeline produced real hits, not corpus
    # quality the data doesn't have
    assert r["mean_mrr_at_10"] > 0.0 and r["mean_recall_at_10"] > 0.0
    # the trained model DOES separate its own training classes: strong
    # ranking, reasonably calibrated confidences
    assert r["train_auc"] > 0.9
    assert 0.0 <= r["train_ece"] < 0.5
    # targeting readout: a strongly-ranking model's top slice must
    # beat random selection (lift > 1) and shallow-depth recall must
    # not exceed deeper-depth recall
    gains = r["gains"]
    assert len(gains) == 2
    (k_lo, (rec_lo, lift_lo)), (k_hi, (rec_hi, lift_hi)) = \
        sorted(gains.items())
    assert k_lo < k_hi
    assert rec_lo <= rec_hi <= 1.0
    assert lift_lo > 1.0
    # r17 day-2 semantic keep loop: the acceptance rule partitions
    # the batch exactly (kept = batch − corpus-dups − within-dups),
    # and the near-orthogonal synthetic embeddings still yield some
    # matches at tau=0.25 (the q264 fixture convention) while never
    # emptying the batch
    assert r["sem_kept"] == (r["sem_batch"] - r["sem_dropped_vs_corpus"]
                             - r["sem_dropped_within"])
    assert 0 < r["sem_kept"] <= r["sem_batch"]
    assert r["sem_dropped_vs_corpus"] + r["sem_dropped_within"] > 0


def test_record_linkage_example(spark):
    from record_linkage import main

    r = main(SF, spark=spark)
    assert r["catalog_a"] > 0 and r["catalog_b"] > 0
    # both linkers fire and fusion tiers partition the pair universe
    assert r["edit_pairs"] > 0 and r["jaccard_pairs"] > 0
    assert r["confident"] + r["review"] > 0
    assert r["confident"] <= min(r["edit_pairs"] + r["jaccard_pairs"],
                                 r["edit_pairs"] * 2)
    # the matched slice is a subset of catalog A
    assert 0 < r["matched_a"] <= r["catalog_a"]
    if r["price_ks"] is not None:
        assert 0.0 <= r["price_ks"] <= 1.0
    # day-2 incremental leg (r15 standing indexes): the feed links
    # against the persisted catalog-A layout; the d=1 edit feed is a
    # subset of the full d=2 one-shot pair universe, the jaccard feed
    # of the one-shot jaccard universe
    assert r["feed"] > 0
    assert 0 <= r["feed_edit_pairs"] <= r["edit_pairs"]
    assert 0 <= r["feed_jaccard_pairs"] <= r["jaccard_pairs"]
    assert r["feed_jaccard_pairs"] > 0  # color-word names collide
