"""Skew-handling join: salting for hot keys.

Scale machinery (SURVEY §4.2's 100 TB candidate work). AQE's skew-join
splitting (on in our session defaults) handles most skew at runtime;
explicit salting remains the tool when one key dominates so heavily that
even split shuffle blocks overwhelm single tasks, or when the build side
must be replicated deterministically.

``salted_join``: the big (skewed) side gets a salt derived from a
uniformly-distributed column; the small side is replicated ``salt_n``
times. The join key becomes (key, salt) — the hot key's rows spread over
``salt_n`` tasks. Results are identical to the unsalted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_n: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join ``skewed ⋈ small`` with the hot side salted ``salt_n`` ways.

    ``salt_source``: a column of the skewed side whose hash spreads rows
    (default: a deterministic hash over all its columns). The small side
    is exploded ×``salt_n`` — keep it broadcast-small or modest.
    """
    keys = list(on)
    src = F.col(salt_source) if salt_source else F.struct(*skewed.columns)
    left = skewed.withColumn("__salt", F.pmod(F.hash(src), F.lit(salt_n)))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = left.join(right, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def diagnose_skew(
    df: DataFrame, key_cols: Sequence[str], top: int = 10,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Key-skew report for a prospective join/groupBy: the ``top`` hottest
    keys with absolute count, share of all rows, and the salt factor
    (``ceil(count / target_rows_per_task)``) that would spread each over
    tasks of the target size.

    Run this before shipping a join on a new key at scale — the hot-key
    list is what decides between nothing (AQE handles it), salting
    (:func:`salted_join`), or dropping a pathological key (NULL-heavy
    foreign keys are the classic). One partial-aggregated groupBy + a
    tiny top-k sort; NULL keys are reported as a key like any other
    (they're usually the hottest)."""
    total = df.count()
    counts = (df.groupBy(*[F.col(c) for c in key_cols])
              .agg(F.count(F.lit(1)).alias("n_rows")))
    return (
        counts.orderBy(F.col("n_rows").desc(),
                       *[F.col(c).asc_nulls_first() for c in key_cols])
        .limit(top)
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows") / F.lit(float(total))).alias("row_share"),
            F.ceil(F.col("n_rows") / F.lit(target_rows_per_task))
            .cast("bigint").alias("suggested_salt"),
        )
    )
