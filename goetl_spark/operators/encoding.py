"""Categorical feature encoding for model-based data curation.

Beyond the reference surface: the feature-engineering step between the
corpus and a quality/routing model (classifier.py trains and scores;
these build its categorical inputs). Both encoders are one
map-side-combinable aggregate over the category column plus a broadcast
join back — the fact table never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_cols: Sequence[str],
    target_col: str,
    smoothing: float = 10.0,
    out_col: str = "target_enc",
) -> DataFrame:
    """Smoothed mean target encoding (the standard high-cardinality
    categorical encoder): each category combination maps to

        (sum_c + m · global_mean) / (n_c + m)

    — the category's target mean shrunk toward the global mean with
    pseudo-count ``m = smoothing``, so rare categories don't memorize
    their few labels. Appends ``out_col``; NULL targets are excluded
    from sums and counts (ANSI AVG semantics), NULL categories form
    their own class.

    Determinism: sum_c and the global sum accumulate exact
    DECIMAL(38,6) (shuffle-order independent); the encoding itself is
    one fixed double expression per category — nothing computed is
    re-rounded, so the result replays bit-exact in oracle SQL.

    Scale shape: ONE map-side-combinable groupBy bounded by the
    category domain, one scalar (1-row) global aggregate broadcast as
    a literal, one broadcast join back. The fact side never shuffles.
    A domain too large to broadcast means the feature is near-unique —
    use hashing (classifier.py's feature layer) instead.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    cats = list(cat_cols)
    if not cats:
        raise ValueError("cat_cols must be non-empty")
    t = F.col(target_col).cast("double")
    base = df.filter(t.isNotNull())
    # string round-trip, not a direct cast: target sums exceed 2^53 of
    # scaled integer at realistic magnitudes, where decimal->double
    # casts diverge by 1 ulp between engines (timeseries._dec2dbl)
    g = base.agg(
        F.sum(t.cast("decimal(38,6)")).cast("string").cast("double")
        .alias("s"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    if g["n"] == 0:
        raise ValueError(f"target_encode: {target_col!r} is all NULL")
    gmean = g["s"] / g["n"]

    m = float(smoothing)
    per_cat = (base.groupBy(*cats)
               .agg(F.sum(t.cast("decimal(38,6)")).cast("string")
                    .cast("double").alias("__s"),
                    F.count(F.lit(1)).alias("__n")))
    enc = per_cat.select(
        *cats,
        ((F.col("__s") + F.lit(m) * F.lit(gmean))
         / (F.col("__n") + F.lit(m))).alias(out_col))
    return df.join(F.broadcast(enc), cats, "left")


def frequency_encode(
    df: DataFrame,
    cat_cols: Sequence[str],
    out_col: str = "freq_enc",
) -> DataFrame:
    """Frequency encoding: each category combination maps to its share
    of the table (n_c / N) — the zero-leakage companion to
    :func:`target_encode` (uses no labels at all). Same scale shape:
    one domain-bounded aggregate, one broadcast join back."""
    cats = list(cat_cols)
    if not cats:
        raise ValueError("cat_cols must be non-empty")
    total = df.count()
    if total == 0:
        raise ValueError("frequency_encode: empty input")
    per_cat = (df.groupBy(*cats)
               .agg((F.count(F.lit(1)).cast("double") / F.lit(float(total)))
                    .alias(out_col)))
    return df.join(F.broadcast(per_cat), cats, "left")
