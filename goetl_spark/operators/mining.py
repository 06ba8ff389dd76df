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


def _baskets(df: DataFrame, basket_col: str, item_col: str,
             max_basket_size: int | None) -> DataFrame:
    """(basket, sorted item SET) with NULLs filtered before the set and
    over-cap baskets dropped before any expansion — shared by pair
    counting and rule mining so their counts agree by construction."""
    baskets = (df.filter(F.col(basket_col).isNotNull()
                         & F.col(item_col).isNotNull())
               .groupBy(F.col(basket_col).alias("b"))
               .agg(F.array_sort(F.collect_set(F.col(item_col)))
                    .alias("items")))
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("items") <= max_basket_size)
    return baskets


def _expand_pairs(baskets: DataFrame) -> DataFrame:
    """In-row (item_a < item_b) pair expansion + the pair-count agg."""
    n = F.size("items")
    pair_arrays = F.flatten(F.transform(
        F.col("items"),
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + 2, n),
            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")))))
    return (baskets.select(F.explode(pair_arrays).alias("p"))
            .select("p.item_a", "p.item_b")
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_baskets")))


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
    pairs = _expand_pairs(_baskets(df, basket_col, item_col,
                                   max_basket_size))
    if min_count > 1:
        pairs = pairs.filter(F.col("n_baskets") >= min_count)
    return pairs


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = 256,
    min_count: int = 1,
    min_support: float | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Directional association rules from the co-occurring pairs:
    for every pair surviving ``min_count``, BOTH rules a→b and b→a
    with the classic Agrawal metrics —

        support    = n_both / n_baskets_total
        confidence = n_both / n_antecedent
        lift       = confidence / (n_consequent / n_baskets_total)

    Item basket-counts are computed over the SAME capped,
    NULL-filtered, set-deduplicated baskets as the pair counts (one
    shared basket build — a pair's count can never exceed either
    item's count, an invariant a separate uncapped item scan would
    silently break for items living in over-cap baskets).

    Determinism: each metric is a fixed chain of at most two long/long
    IEEE divisions and one multiply — lift is computed as
    ``(n_both / n_ante) / (n_cons / N)`` rather than ``n_both·N /
    (n_ante·n_cons)`` so no integer product can overflow long at
    corpus scale — hash-exact in oracle SQL.

    Pruning knobs for domains where the co-occurring pair count
    approaches items² (the r13 verdict's slack item (c)): both prune
    the PAIR table — before the rule doubling and the item joins,
    where the blowup actually lives — and both stay lazy.
    ``min_support`` drops pairs below that share of total baskets
    (the total rides a 1-row broadcast crossJoin, no driver action);
    ``top_n`` keeps the N most frequent pairs (by basket count, ties
    broken (item_a, item_b) — deterministic) via orderBy+limit, which
    Spark executes as TakeOrdered (per-partition heaps, never a global
    sort). Each surviving pair still yields both rule directions, so
    ``top_n`` bounds the output at 2·top_n rows.

    Scale shape: the basket build is :func:`cooccurrence_pairs`'s one
    shuffle (pinned once, read by both the pair expansion and the item
    counts); rules and item counts are aggregates of bounded tables
    (pairs ≤ co-occurring-domain², items ≤ item domain); the total is
    a 1-row aggregate crossJoined back — no driver action."""
    if min_support is not None and not 0.0 <= min_support <= 1.0:
        raise ValueError(f"min_support must be in [0, 1], "
                         f"got {min_support}")
    if top_n is not None and top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    baskets = _baskets(df, basket_col, item_col,
                       max_basket_size).localCheckpoint(eager=True)
    pairs = _expand_pairs(baskets)
    if min_count > 1:
        pairs = pairs.filter(F.col("n_baskets") >= min_count)
    total = baskets.agg(F.count(F.lit(1)).alias("n_baskets_total"))
    if min_support is not None:
        pairs = (pairs.crossJoin(F.broadcast(total))
                 .filter(F.col("n_baskets")
                         >= F.lit(min_support) * F.col("n_baskets_total"))
                 .drop("n_baskets_total"))
    if top_n is not None:
        pairs = (pairs.orderBy(F.col("n_baskets").desc(),
                               "item_a", "item_b")
                 .limit(top_n))
    items = (baskets.select(F.explode("items").alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).alias("n_item")))

    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("n_baskets").alias("n_both"),
    ).unionByName(pairs.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        F.col("n_baskets").alias("n_both")))
    ante = items.select(F.col("item").alias("antecedent"),
                        F.col("n_item").alias("n_ante"))
    cons = items.select(F.col("item").alias("consequent"),
                        F.col("n_item").alias("n_cons"))
    conf = F.col("n_both") / F.col("n_ante")
    base = F.col("n_cons") / F.col("n_baskets_total")
    return (both.join(ante, "antecedent").join(cons, "consequent")
            .crossJoin(F.broadcast(total))
            .select(
                "antecedent", "consequent",
                F.col("n_both").cast("long").alias("n_both"),
                F.col("n_ante").cast("long").alias("n_ante"),
                F.col("n_cons").cast("long").alias("n_cons"),
                F.col("n_baskets_total").cast("long")
                 .alias("n_baskets_total"),
                (F.col("n_both") / F.col("n_baskets_total"))
                 .alias("support"),
                conf.alias("confidence"),
                (conf / base).alias("lift")))
