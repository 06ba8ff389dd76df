"""Frequent-co-occurrence mining: item pairs within baskets.

The market-basket primitive (and, on token/shingle baskets, the
collocation-mining primitive for corpus analysis): which item pairs
appear together in the same basket, how often, and with what lift.

Scale design: one shuffle gathers each basket's item SET (collect_set,
bounded by the cap below), pair expansion runs in-row over the sorted
array — map-side, no self-join — and the pair-count aggregation is the
only other shuffle. Pair blowup is quadratic in basket SIZE, not
corpus size; ``max_basket_size`` (default 256) drops pathological
baskets BEFORE expansion the same way dedup.py caps hot shingles (a
single million-line order would otherwise emit 5·10¹¹ pairs). The cap
is a documented, default-on guard, mirrored in the q119 oracle."""

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
    multiplicity (items are set-deduplicated inside the basket).

    Plan: ONE shuffle gathers each basket's item set (collect_set —
    bounded by the cap), the pair expansion happens IN-ROW (a sorted
    array double-loop via transform+flatten, map-side, never a
    self-join), and the pair count agg is the only other shuffle. The
    first audit of the self-join formulation showed 8 exchanges; this
    shape has 2 (+1 if the caller sorts). NULL items are filtered
    BEFORE the basket aggregate so the ``max_basket_size`` cap is
    computed over the same item set a SQL DISTINCT-frame oracle sees —
    collect_set alone would drop the NULL after the cap (round-6
    advisor finding)."""
    baskets = (df.filter(F.col(basket_col).isNotNull()
                         & F.col(item_col).isNotNull())
               .groupBy(F.col(basket_col).alias("b"))
               .agg(F.array_sort(F.collect_set(F.col(item_col)))
                    .alias("items")))
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("items") <= max_basket_size)
    n = F.size("items")
    pair_arrays = F.flatten(F.transform(
        F.col("items"),
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + 2, n),
            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")))))
    pairs = (
        baskets.select(F.explode(pair_arrays).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    if min_count > 1:
        pairs = pairs.filter(F.col("n_baskets") >= min_count)
    return pairs
