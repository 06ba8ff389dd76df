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
