"""Configurable equi-join with the reference's JoinConfig surface.

Reference: ``dag/tasks/join.go`` (SURVEY.md §2.4). The reference has one
algorithm — an in-memory hash join keyed on stringified composite keys —
and ignores its own ``Strategy`` field. Here the join is declared to
Catalyst, which picks broadcast-hash / shuffled-hash / sort-merge from
stats + AQE; ``strategy='broadcast'`` maps to an explicit broadcast hint
(the thing the reference parsed but never implemented).

Parity points:
- join types inner/left/right/full (dag/tasks/join.go:33-40).
- NULL join keys never match (SQL semantics) — matches the reference
  skipping records with missing/nil key fields on the inner path and
  emitting them with null right side on left/full (join.go:130-137).
- one-to-many expansion: left row emitted once per matching right row
  (join.go:140-146) — native.
- column-conflict handling: optional per-side prefixes; unprefixed
  collisions renamed ``right_<col>`` (join.go:190-224).

Scale note: at 100 TB the driver of join cost is the shuffle. Dimension
sides below the broadcast threshold are broadcast automatically; for
repeated joins on the same key, pre-``repartition(keys)`` both sides once
and reuse (Catalyst will not re-shuffle an already-partitioned child).
Skewed keys are handled by AQE skew-join (on by default in our session).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class JoinConfig:
    """Mirror of the reference's JoinConfig (dag/tasks/join.go:33-47)."""

    join_type: str = "inner"  # inner | left | right | full
    left_keys: Sequence[str] = dc_field(default_factory=list)
    right_keys: Sequence[str] = dc_field(default_factory=list)
    # per-side output column prefixes: {"left": "l_", "right": "r_"}
    field_prefix: Mapping[str, str] = dc_field(default_factory=dict)
    # "auto" lets Catalyst choose; "broadcast" hints broadcast of the right
    # side; "sort"/"hash" accepted for config parity (Catalyst decides).
    strategy: str = "auto"

    def __post_init__(self):
        if self.join_type not in ("inner", "left", "right", "full"):
            raise ValueError(f"unsupported join type: {self.join_type}")
        if not self.right_keys:
            self.right_keys = list(self.left_keys)
        if len(self.left_keys) != len(self.right_keys):
            raise ValueError("left_keys and right_keys must have equal length")


def join(left: DataFrame, right: DataFrame, config: JoinConfig) -> DataFrame:
    """Join two DataFrames per ``config``.

    Output columns: all left columns then all right columns, with the
    reference's conflict rule — per-side prefixes if configured, else
    colliding right columns become ``right_<col>`` (dag/tasks/join.go:190-224).
    Right-side join-key columns that merely duplicate an equi-key are kept
    (the reference keeps both sides' key fields in the merged record).
    """
    lpfx = config.field_prefix.get("left", "")
    rpfx = config.field_prefix.get("right", "")

    left_aliased = left.select([F.col(c).alias(lpfx + c) for c in left.columns])
    right_aliased = right.select([F.col(c).alias(rpfx + c) for c in right.columns])

    left_out_cols = [lpfx + c for c in left.columns]
    # unprefixed collision → right_<col> (join.go:218-222)
    right_out: list[tuple[str, str]] = []
    for c in right.columns:
        name = rpfx + c
        if name in left_out_cols:
            name = f"right_{c}"
        right_out.append((rpfx + c, name))
    right_aliased = right_aliased.select(
        [F.col(src).alias(dst) for src, dst in right_out]
    )

    lkeys = [lpfx + k for k in config.left_keys]
    rkeys = [
        dst for src, dst in right_out
        if src in [rpfx + k for k in config.right_keys]
    ]
    # preserve key order
    rk_order = {rpfx + k: i for i, k in enumerate(config.right_keys)}
    rkeys = sorted(
        [ (src, dst) for src, dst in right_out if src in rk_order ],
        key=lambda p: rk_order[p[0]],
    )
    cond = None
    for lk, (_, rk) in zip(lkeys, rkeys):
        c = left_aliased[lk] == right_aliased[rk]
        cond = c if cond is None else (cond & c)

    if config.strategy == "broadcast":
        right_aliased = F.broadcast(right_aliased)

    how = {"full": "full_outer"}.get(config.join_type, config.join_type)
    return left_aliased.join(right_aliased, on=cond, how=how)


def lookup(source: DataFrame, lookup_df: DataFrame, keys: Sequence[str],
           lookup_keys: Sequence[str] | None = None,
           prefix: str = "") -> DataFrame:
    """Enrichment join: broadcast left join against a small lookup table.

    Reference: AddLookupTask (dag/dag_builder.go:126-133) — an alias for a
    left hash join. The lookup side is explicitly broadcast: at scale the
    dimension is small by definition, so this avoids shuffling the fact side.
    """
    cfg = JoinConfig(
        join_type="left",
        left_keys=list(keys),
        right_keys=list(lookup_keys or keys),
        field_prefix={"right": prefix} if prefix else {},
        strategy="broadcast",
    )
    return join(source, lookup_df, cfg)


def semi_join(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """left_semi — beyond the reference surface (SURVEY §2.4 'Not present')."""
    return left.join(right, on=list(keys), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """left_anti — beyond the reference surface."""
    return left.join(right, on=list(keys), how="left_anti")


def join_cardinality(left: DataFrame, right: DataFrame,
                     keys: Sequence[str]) -> DataFrame:
    """EXACT inner-join output cardinality — without running the join.

    The pre-flight planning companion to
    :func:`goetl_spark.operators.skew.diagnose_skew`: before shipping a
    join at 100 TB you want |A ⋈ B| (is the output 10⁹ or 10¹⁵ rows?)
    and WHICH keys explode. |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k), so two
    partial-aggregated groupBys (each output ≤ #distinct keys, raw rows
    never re-shuffled) joined on the key give the per-key product; the
    caller sums ``pairs`` for the total or sorts by it for the top
    offenders. Cost is two map-side-combined aggs — orders of magnitude
    under materializing a bad join. NULL keys never match in SQL, so
    they are excluded from both sides.

    Returns (keys..., n_left, n_right, pairs), one row per matching key.
    """
    ks = list(keys)
    notnull = None
    for k in ks:
        cond = F.col(k).isNotNull()
        notnull = cond if notnull is None else notnull & cond
    lc = (left.where(notnull).groupBy(*ks)
          .agg(F.count(F.lit(1)).alias("n_left")))
    rc = (right.where(notnull).groupBy(*ks)
          .agg(F.count(F.lit(1)).alias("n_right")))
    return lc.join(rc, on=ks).select(
        *ks, "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("pairs"))


def bcast_if_small(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast hint for the small side of an ITERATIVE loop's joins —
    pagerank / kcore / dedup_clusters style algorithms whose per-round
    tables (labels, degrees, contributions) are ``localCheckpoint``ed,
    which hides size statistics from Catalyst (a LogicalRDD reports the
    default huge estimate), so every round's join planned as sort-merge
    and re-shuffled the big edge set even when the keyed side was a few
    thousand rows. The caller passes a row count it already knows (the
    algorithms count or observe their node tables anyway); under the
    threshold the hint makes each round's joins map-side — zero edge
    shuffles — and above it the planner keeps the shuffle strategies,
    so billion-node graphs are unaffected (guide §3.1: estimates are
    often badly wrong after opaque operations — hint when you KNOW).

    Threshold: ``goetl.iterative.broadcastRows`` session conf (rows, not
    bytes — iterative-state rows here are a few dozen bytes each, so the
    2M default is ~100 MB built, well inside guide §3.1's comfort band);
    parameterised for cluster-specific tuning, scale-adaptive by
    construction because the DATA decides which side of the threshold it
    falls on."""
    if n_rows is None:
        return df
    try:
        cap = int(df.sparkSession.conf.get(
            "goetl.iterative.broadcastRows", "2000000"))
    except Exception:
        cap = 2_000_000
    return F.broadcast(df) if n_rows <= cap else df
