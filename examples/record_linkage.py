"""Example 8 — record linkage / entity resolution across two tables.

The round-14 linkage family end-to-end, each stage the registered
scale-shaped operator: LOSSLESS candidate generation two ways —
PassJoin edit-distance join on the name strings
(operators/dedup.py::edit_distance_join) and AllPairs exact
Jaccard-threshold join on the name token sets
(operators/dedup.py::jaccard_join) — then evidence fusion (a pair
found by both linkers with high agreement is a confident match), and
a drift check (quality.py::ks_distance) proving the matched slice is
distributionally representative of its source, and (r15) the day-2
incremental leg: catalog A persisted as STANDING edit/Jaccard indexes
(dedup.py::edit_distance_index_write / jaccard_index_write) so
tomorrow's feed links without re-paying the catalog's rarity sort or
segmentation. The shape a 100 TB
catalog-reconciliation pipeline runs: both linkers are pigeonhole-
blocked equi-joins, never a cartesian, and completeness at the
declared thresholds is a theorem (brute-force-pinned in tests), not
a recall curve.

Run: python examples/record_linkage.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.dedup import (edit_distance_join,
                                             jaccard_join)
    from goetl_spark.queries import _t
    from goetl_spark.quality import ks_distance
    from goetl_spark.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("example-record-linkage",
                               master="local[4]", shuffle_partitions=4)

    # two "catalogs" to reconcile: disjoint part slices whose names
    # collide (the synthetic names are short color-word phrases —
    # realistic entity-resolution noise: shared vocabulary, small
    # edits between genuinely different items)
    p = _t(spark, sf_dir, "part")
    cat_a = p.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"),
        F.col("p_retailprice").alias("price_a"))
    cat_b = p.filter(F.col("p_partkey") % 2 == 1).select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"),
        F.col("p_retailprice").alias("price_b"))

    # 1) STRING linker: every pair within levenshtein <= 2 — complete
    # by the PassJoin pigeonhole, verified by one exact JVM distance
    by_edit = edit_distance_join(
        cat_a.select("id_a", F.col("name_a").alias("s")),
        cat_b.select("id_b", F.col("name_b").alias("s")),
        "id_a", "s", "id_b", "s", max_dist=2)

    # 2) TOKEN linker: every pair whose word sets overlap at J >= 0.5
    # — complete by the AllPairs prefix filter
    by_jaccard = jaccard_join(
        cat_a.select("id_a",
                     F.array_distinct(F.split("name_a", r"\s+"))
                      .alias("w")),
        cat_b.select("id_b",
                     F.array_distinct(F.split("name_b", r"\s+"))
                      .alias("w")),
        "id_a", "w", "id_b", "w", threshold=0.5)

    # 3) EVIDENCE FUSION: both linkers agreeing is the confident tier;
    # either alone is the review tier (classic linkage triage)
    e = by_edit.select("id_a", "id_b",
                       F.lit(True).alias("by_edit"), "edit_dist")
    j = by_jaccard.select("id_a", "id_b",
                          F.lit(True).alias("by_jaccard"), "jaccard")
    fused = (e.join(j, ["id_a", "id_b"], "full")
             .select("id_a", "id_b",
                     F.coalesce("by_edit", F.lit(False)).alias("by_edit"),
                     F.coalesce("by_jaccard", F.lit(False))
                      .alias("by_jaccard"),
                     "edit_dist", "jaccard")
             .withColumn("tier",
                         F.when(F.col("by_edit") & F.col("by_jaccard"),
                                "confident").otherwise("review"))
             .localCheckpoint(eager=True))
    n_confident = fused.filter(F.col("tier") == "confident").count()
    n_review = fused.filter(F.col("tier") == "review").count()

    # 4) REPRESENTATIVENESS: are the matched A-side items priced like
    # catalog A overall, or did the linker select a biased slice?
    # ks_distance is the bin-free check (no edge set to own).
    matched_a = (fused.select("id_a").distinct()
                 .join(cat_a, "id_a").select("price_a"))
    ks = ks_distance(matched_a, cat_a.select("price_a"),
                     "price_a").collect()[0]

    # 5) DAY-2 INCREMENTAL (r15): catalog A becomes STANDING indexes —
    # the rarity sort (Jaccard) and segmentation (PassJoin) are paid
    # ONCE; tomorrow's feed links against the persisted layout without
    # touching catalog A again. The edit feed queries at the TIGHTER
    # d=1 (triage only wants near-exact day-2 matches — legal against
    # a d=2 index, the below-build-threshold guarantee).
    import os
    import shutil
    import tempfile

    from goetl_spark.operators.dedup import (
        edit_distance_index_candidates, edit_distance_index_write,
        jaccard_index_candidates, jaccard_index_write)

    base = os.path.join(tempfile.gettempdir(), "goetl_example_link_idx")
    shutil.rmtree(base, ignore_errors=True)
    edit_distance_index_write(
        cat_a.select("id_a", F.col("name_a").alias("s")),
        f"{base}/edit", "id_a", "s", max_dist=2)
    jaccard_index_write(
        cat_a.select("id_a",
                     F.array_distinct(F.split("name_a", r"\s+"))
                      .alias("w")),
        f"{base}/jacc", "id_a", "w", threshold=0.5)
    feed = cat_b.filter(F.col("id_b") % 7 == 0)
    inc_edit = edit_distance_index_candidates(
        feed.select("id_b", F.col("name_b").alias("s")),
        f"{base}/edit", "id_b", "s", max_dist=1)
    inc_jacc = jaccard_index_candidates(
        feed.select("id_b",
                    F.array_distinct(F.split("name_b", r"\s+"))
                     .alias("w")),
        f"{base}/jacc", "id_b", "w", include_new_pairs=False)

    out = {
        "catalog_a": cat_a.count(),
        "catalog_b": cat_b.count(),
        "edit_pairs": by_edit.count(),
        "jaccard_pairs": by_jaccard.count(),
        "confident": n_confident,
        "review": n_review,
        "matched_a": int(ks["n_a"]),
        "price_ks": float(ks["ks"]) if ks["ks"] is not None else None,
        "feed": feed.count(),
        "feed_edit_pairs": inc_edit.count(),
        "feed_jaccard_pairs": inc_jacc.count(),
    }
    if owns_spark:
        spark.stop()
    return out


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
