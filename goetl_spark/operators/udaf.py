"""Custom aggregator (UDAF) escape hatch: grouped pandas aggregation.

Reference: the ``Aggregator`` interface — Add/Result/Reset streamed per
group (aggregate/aggregator.go:32-39, SURVEY §2.9). Built-ins cover every
aggregator the reference ships (count/sum/avg/min/max →
operators/groupby.py); this module is the parity surface for USER-defined
aggregation logic that SQL can't express.

Two shapes:
- :func:`apply_grouped` — full-group pandas function via applyInPandas.
  Arrow-batched; each group's rows land in one pandas DataFrame. The
  group's data must fit an executor (same contract as any holistic UDAF).
- :class:`PandasAggregator` — Add/Result-style contract adapter: write
  ``add(state, pdf)`` / ``result(state)`` increments, run them through
  applyInPandas. Mirrors the reference API for porting user aggregators.

Scale note: prefer expression aggregates (one shuffle of partial states);
applyInPandas shuffles raw rows. Use it when per-group logic genuinely
needs to see all rows (rank-based stats, model fits).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def apply_grouped(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable,  # fn(pdf: pandas.DataFrame) -> pandas.DataFrame
    schema: str,
) -> DataFrame:
    """Run ``fn`` once per group via applyInPandas (Arrow-batched)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


@dataclass
class PandasAggregator:
    """Add/Result contract over pandas chunks (Aggregator parity,
    aggregate/aggregator.go:32-39).

    ``init()`` → state; ``add(state, pdf)`` → state folds in a chunk;
    ``result(state)`` → dict of output fields. ``aggregate()`` wires it
    through applyInPandas with the group keys prepended to the output.
    """

    init: Callable[[], object]
    add: Callable[[object, object], object]
    result: Callable[[object], dict]
    schema: str  # output fields EXCLUDING the group keys, e.g. "n long, s double"

    def aggregate(self, df: DataFrame, keys: Sequence[str]) -> DataFrame:
        import pandas as pd

        init, add, result = self.init, self.add, self.result
        keys = list(keys)
        key_schema = ", ".join(
            f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
        )
        full_schema = f"{key_schema}, {self.schema}" if keys else self.schema

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            state = add(init(), pdf)
            out = result(state)
            for k in keys:
                out[k] = pdf[k].iloc[0]
            return pd.DataFrame([out])

        return apply_grouped(df, keys, run, full_schema)
