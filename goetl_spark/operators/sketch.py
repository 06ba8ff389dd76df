"""Mergeable quantile sketch (t-digest style) — partial aggregation for
percentiles at 100 TB.

Beyond the reference surface (goetl has no approximate aggregates at
all; its GroupBy materializes every group in heap,
aggregate/groupby.go:88-148). Exact percentiles (q38) need a full sort
or `percentile` over collected groups; at corpus scale the standard
design is a MERGEABLE sketch: every partition compresses its values into
a bounded set of weighted centroids, the driver merges partition
sketches, and quantiles interpolate the merged cumulative weights —
one pass, no sort, fixed memory per partition, same shape Spark uses
internally for `approx_percentile` (GK summaries) and the design tool
for any custom distributed statistic.

This is a simplified t-digest (Dunning & Ertl): centroids are built over
sorted values with the k1 scale function bounding each centroid's weight
share near the tails (quantile accuracy is therefore best at the
extremes — the property that matters for p99-style monitoring).

Flow: ``mapInPandas`` (one numpy pass per partition) → centroid rows
(≤ ~2·compression per partition — tiny) → driver merge + interpolate.
The collect is bounded by #partitions × compression, never by rows.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def _spread(df):
    """Identity since the r17 optimization round: the round-robin spread
    this wrapped was MEASURED a loss here (the exchange of the input
    rows cost more than the extra map parallelism bought — q87 t-digest
    2.5 -> 1.9 s, q166 audio 2.0 -> 0.9 s without it; guide §1.1
    measure-first). Kept as a seam so the decision is re-testable."""
    return df

def _k1(q: float, compression: int) -> float:
    """The k1 scale function k(q) = (δ/2π)·asin(2q−1): steep at the tails,
    flat in the middle, so tail centroids stay tiny (tight p99s) and the
    TOTAL centroid count is bounded by ~δ (k spans δ/2 units over q∈[0,1]
    and each centroid is allowed at most one unit)."""
    return compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _compress(means, weights, compression: int):
    """Merge sorted (means, weights) into ≤ ~compression centroids: a
    centroid may absorb the next value while its (k(q_right) − k(q_left))
    span stays ≤ 1 — the standard t-digest size invariant."""
    import numpy as np

    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    k_left = _k1(0.0, compression)
    for m, w in zip(means[1:], weights[1:]):
        q_right = (w_before + cur_w + w) / total
        if _k1(q_right, compression) - k_left <= 1.0:
            cur_m += (m - cur_m) * w / (cur_w + w)  # weighted running mean
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_left = _k1(min(w_before / total, 1.0), compression)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_sketch(df: DataFrame, col: str, compression: int = 100) -> DataFrame:
    """Per-partition sketch stage: (mean, weight) centroid rows.

    Each partition emits ≤ ~compression rows regardless of its size —
    the partial-aggregate half of the design. NULLs are skipped (SQL
    aggregate semantics)."""

    def sketch(batches):
        import numpy as np
        import pandas as pd

        vals = []
        for pdf in batches:
            v = pd.to_numeric(pdf[col], errors="coerce").dropna().to_numpy(float)
            if len(v):
                vals.append(v)
        if vals:
            v = np.concatenate(vals)
            m, w = _compress(v, np.ones_like(v), compression)
            yield pd.DataFrame({"mean": m, "weight": w})

    return _spread(df.select(col)).mapInPandas(sketch, schema="mean double, weight double")


def merge_tdigest(centroids, compression: int = 100):
    """Driver-side merge of collected centroid rows → (means, weights)."""
    import numpy as np

    m = np.array([r["mean"] for r in centroids], dtype=float)
    w = np.array([r["weight"] for r in centroids], dtype=float)
    if len(m) == 0:
        return m, w
    return _compress(m, w, compression)


def tdigest_quantiles(means, weights, probs: Sequence[float]) -> list[float]:
    """Interpolate quantiles from merged centroids: cumulative midpoint
    weights form the x-axis, centroid means the y-axis (standard t-digest
    estimation)."""
    import numpy as np

    if len(means) == 0:
        return [math.nan for _ in probs]
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    qs = cum / total
    return [float(np.interp(p, qs, means)) for p in probs]


def tdigest_quantiles_by_group(
    df: DataFrame, group_cols: Sequence[str], value_col: str,
    probs: Sequence[float], compression: int = 100,
) -> DataFrame:
    """Per-GROUP approximate quantiles via two-level mergeable sketches —
    the partial-aggregation shape under groupBy:

    1. ``mapInPandas`` partial stage: each input partition compresses each
       group's values it holds into ≤ ~2·compression centroid rows
       (group, mean, weight) — the map-side combine. The shuffle moves
       centroids, never raw rows: #partitions × #groups-per-partition ×
       2·compression.
    2. ``applyInPandas`` merge stage: per group, merge the partial
       centroid sets (same k1 invariant) and interpolate the requested
       quantiles → one row per (group, prob).

    This is exactly how a native engine runs approx-percentile-by-key
    (partial GK/t-digest + merge); at 100 TB the reduction in shuffled
    bytes vs a raw-row groupBy is ~rows/(2·compression) per group.
    Accuracy matches the global sketch (rank error ≲ 1/compression,
    tightest at the tails). Returns (group_cols..., prob, quantile)."""
    import pandas as pd

    gcols = list(group_cols)
    plist = [float(p) for p in probs]
    centroid_schema = ", ".join(
        f"`{c}` {t}" for c, t in df.select(*gcols).dtypes
    ) + ", mean double, weight double"

    def partial(batches):
        import numpy as np

        # Accumulate each group's CENTROIDS across the partition's Arrow
        # batches (raw values enter as weight-1 centroids and are
        # merge-compressed in place whenever a group's buffer exceeds
        # 8·compression), then compress once more per group at the end.
        # This keeps BOTH bounds: the emitted shuffle stays ≤ #partitions
        # × 2·compression per group (one centroid set per partition, the
        # round-5 fix), and worker memory stays O(groups × compression +
        # batch) instead of O(partition rows) — accumulating raw values
        # to the end would hold the whole partition in Python.
        cap = 8 * compression
        acc: dict[tuple, tuple] = {}  # key -> (means, weights)
        for pdf in batches:
            for key, g in pdf.groupby(gcols, dropna=False, sort=False):
                v = pd.to_numeric(g[value_col], errors="coerce") \
                    .dropna().to_numpy(float)
                if not len(v):
                    continue
                if not isinstance(key, tuple):
                    key = (key,)
                pm, pw = acc.get(key, (np.empty(0), np.empty(0)))
                m = np.concatenate([pm, v])
                w = np.concatenate([pw, np.ones_like(v)])
                if len(m) > cap:
                    m, w = _compress(m, w, compression)
                acc[key] = (m, w)
        out = []
        for key, (m, w) in acc.items():
            m, w = _compress(m, w, compression)
            part = pd.DataFrame({"mean": m, "weight": w})
            for c, k in zip(gcols, key):
                part[c] = k
            out.append(part[gcols + ["mean", "weight"]])
        if out:
            yield pd.concat(out, ignore_index=True)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m, w = _compress(pdf["mean"].to_numpy(float),
                         pdf["weight"].to_numpy(float), compression)
        qs = tdigest_quantiles(m, w, plist)
        out = pd.DataFrame({"prob": plist, "quantile": qs})
        for c in gcols:
            out[c] = pdf[c].iloc[0]
        return out[gcols + ["prob", "quantile"]]

    partials = _spread(df.select(*gcols, value_col)).mapInPandas(
        partial, schema=centroid_schema)
    out_schema = ", ".join(
        f"`{c}` {t}" for c, t in df.select(*gcols).dtypes
    ) + ", prob double, quantile double"
    return partials.groupBy(*gcols).applyInPandas(merge, schema=out_schema)


# --- Count-Min sketch ------------------------------------------------------

def _cm_hash_cols(col_expr, width: int, depth: int):
    """The ``depth`` bucket indices as JVM-side Column expressions:
    md5 over 'd:<value>' (engine-portable, same bytes hashlib sees in
    :func:`countmin_estimate`), first 12 hex chars as bigint, mod width."""
    from pyspark.sql import functions as F

    return [
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{d}:"), col_expr.cast("string"))),
            1, 12), 16, 10).cast("bigint") % width).cast("int").alias(f"j{d}")
        for d in range(depth)
    ]


def countmin_build(df: DataFrame, col: str, width: int = 2048,
                   depth: int = 4):
    """Distributed Count-Min sketch of a key column → (depth × width)
    numpy counter matrix on the driver.

    The frequency-sketch sibling of the t-digest above — the standard
    answer to "how often does each key occur" when the key domain is too
    large for an exact groupBy to be worth it (heavy-hitter detection,
    skew pre-screening, streaming top-k). Guarantees (Cormode &
    Muthukrishnan): estimate ≥ true count always (one-sided), and
    estimate ≤ true + (e/width)·N with probability 1 − e^−depth.

    Scale shape: the bucket indices are computed JVM-side (md5 column
    expressions — no Python hashing in the hot path); the Arrow-batched
    partial stage just bincounts them into a local (depth × width)
    matrix, so each partition emits ≤ depth·width cells regardless of
    row count; cells merge with one tiny groupBy-sum. The collect is
    bounded by depth × width, never by rows — the same mergeable-
    partial-aggregate economics as :func:`tdigest_sketch`."""
    import numpy as np
    from pyspark.sql import functions as F

    hashed = (df.where(F.col(col).isNotNull())  # NULL keys skip, SQL-agg style
              .select(*_cm_hash_cols(F.col(col), width, depth)))

    def partial(batches):
        import pandas as pd

        M = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            for d in range(depth):
                M[d] += np.bincount(pdf[f"j{d}"], minlength=width)
        dd, jj = np.nonzero(M)
        if len(dd):
            yield pd.DataFrame({"d": dd.astype("int32"),
                                "j": jj.astype("int32"),
                                "c": M[dd, jj]})

    cells = (hashed.mapInPandas(partial, schema="d int, j int, c long")
             .groupBy("d", "j").agg(F.sum("c").alias("c")).collect())
    M = np.zeros((depth, width), dtype=np.int64)
    for r in cells:
        M[r["d"], r["j"]] = r["c"]
    return M


def countmin_estimate(M, key) -> int:
    """Point-frequency estimate for ``key`` from a :func:`countmin_build`
    matrix: min over rows of the key's bucket — pure driver-side lookup,
    hashing exactly the bytes the build stage hashed."""
    import hashlib

    depth, width = M.shape
    est = None
    for d in range(depth):
        j = int(hashlib.md5(f"{d}:{key}".encode()).hexdigest()[:12], 16) % width
        v = int(M[d, j])
        est = v if est is None else min(est, v)
    return est


def approx_quantiles(
    df: DataFrame, col: str, probs: Sequence[float], compression: int = 100
) -> list[float]:
    """End-to-end: distributed sketch pass + driver merge + interpolation.

    One scan, no shuffle, no sort; collect size is bounded by
    #partitions × 2·compression centroid rows. Accuracy is pinned by a
    unit test (≤ 0.01 quantile-rank error at compression=100 on 100k
    skewed values) — tighter at the tails by the k1 scale construction.
    """
    rows = tdigest_sketch(df, col, compression).collect()
    m, w = merge_tdigest([r.asDict() for r in rows], compression)
    return tdigest_quantiles(m, w, probs)


# ---------------------------------------------------------------------------
# Standing HLL sketch index — incremental distinct counts at 100 TB
# ---------------------------------------------------------------------------

def _hll_meta_read(spark, path: str) -> dict | None:
    """Manifest reader on the scheme-agnostic Hadoop-FS channel
    (operators/index_meta.py, r17 — this family missed the r16
    migration: its driver-local manifest silently skipped the config
    guard on remote schemes, the same hole class the r15 verdict
    closed for the five join/search indexes). The pre-r17
    ``_hll_meta.json`` still reads as a local-path fallback."""
    from .index_meta import meta_read

    return meta_read(spark, path, legacy="_hll_meta.json")


def hll_sketch_build(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group Datasketches HLL sketch of ``key_col`` (global single
    row when ``group_cols`` is None): (group..., sketch binary, batch_rows).

    The point of a SKETCH over ``approx_count_distinct``'s scalar: the
    binary is MERGEABLE — yesterday's sketch unions with today's
    without touching yesterday's rows, which is what makes a standing
    distinct-count index O(batch) per day instead of O(history)
    (:func:`hll_index_write` / :func:`hll_index_append`). Size is
    ~2^lg_k bytes per group regardless of cardinality. NULL keys are
    skipped (SQL COUNT DISTINCT semantics)."""
    groups = list(group_cols or [])
    agg = [F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
           F.count(key_col).alias("batch_rows")]
    return (df.groupBy(*groups).agg(*agg) if groups
            else df.agg(*agg))


def hll_index_write(
    df: DataFrame,
    path: str,
    key_col: str,
    group_cols: Sequence[str] | None = None,
    lg_k: int = 12,
    mode: str = "overwrite",
    batch_stamp: str | None = None,
) -> None:
    """Persist (or append a batch to) a standing HLL distinct-count
    index: one sketch row per group per batch. Appends never merge
    on write — union happens at estimate time (:func:`hll_index_
    estimate`), so the daily cost is sketching the BATCH only. Full
    standing-index discipline since r17: the manifest travels the
    scheme-agnostic Hadoop-FS channel (a mismatched key_col or group
    layout is a different index — appends refuse, and a MISSING
    manifest refuses too instead of skipping the check), overwrite
    builds are invalidate-first/commit-last, and appends land in a
    per-batch ``_b={batch_stamp}`` subdirectory — pass a
    deterministic stamp and a retried failed append replaces its own
    sketch rows instead of duplicating them (a duplicated sketch row
    never changes the DISTINCT estimate — unions are idempotent —
    but it inflates ``n_batches`` and the estimate-time row count;
    the stamp closes even that)."""
    from .index_meta import (
        LAYOUT, file_delete_recursive, leg_write, meta_config,
        meta_invalidate, meta_write, resolve_stamp)

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    meta = {"key_col": key_col, "group_cols": list(group_cols or []),
            "lg_k": lg_k}
    if mode == "append":
        existing = _hll_meta_read(spark, path)
        if existing is None:
            raise ValueError(
                f"hll_index_write(append): no readable manifest at "
                f"{path!r} — cannot confirm the index key/group "
                f"layout; rebuild with mode='overwrite'")
        if meta_config(existing) != meta:
            raise ValueError(
                f"hll_index_write(append): config {meta} != index "
                f"config {meta_config(existing)} — refusing to mix "
                f"index layouts")
        stamp = resolve_stamp(existing, batch_stamp, "hll_index_write")
    else:
        # invalidate-first / commit-last + explicit truncation (the
        # layout-2 base write no longer sweeps stale batch subdirs)
        meta_invalidate(spark, path)
        file_delete_recursive(spark, path)
        stamp = "base"
    leg_write(hll_sketch_build(df, key_col, group_cols, lg_k),
              path, mode, stamp)
    if mode == "overwrite":
        meta_write(spark, path, {**meta, "layout": LAYOUT})


def hll_index_estimate(
    spark,
    path: str,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Distinct-count estimates from a standing index: union all
    persisted sketch rows per group (``hll_union_agg``) and estimate.
    Reads only sketch rows (~2^lg_k bytes x groups x batches), never
    the underlying data — the whole-history distinct count of a
    100 TB-a-day key stream costs a few MB of I/O. Returns
    (group..., n_batches, approx_distinct). A coarser ``group_cols``
    than the index's is valid (sketch unions merge exactly); a
    missing manifest raises — the family's reader discipline."""
    meta = _hll_meta_read(spark, path)
    if meta is None:
        raise ValueError(
            f"hll_index_estimate: no readable manifest at {path!r} — "
            f"cannot confirm the index layout; rebuild with "
            f"hll_index_write (a skipped config check is the silent-"
            f"mix hazard the manifest exists to prevent)")
    groups = list(group_cols if group_cols is not None
                  else meta.get("group_cols", []))
    idx = spark.read.parquet(path)
    # n_batches must count BATCHES, not sketch rows: under a coarser
    # group_cols than the index's (valid — unions merge exactly) a
    # row count would read batches x merged-groups and a
    # dropped-batch check against it would lie. The layout-2 _b
    # partition value identifies the batch exactly; a legacy
    # layout-1 index has no batch identifier, so it keeps the old
    # row-count reading (exact at the index's own grouping).
    n_batches = (F.countDistinct("_b") if "_b" in idx.columns
                 else F.count(F.lit(1)))
    agg = [n_batches.alias("n_batches"),
           F.hll_sketch_estimate(
               F.hll_union_agg(F.col("sketch"), F.lit(True)))
            .alias("approx_distinct")]
    return (idx.groupBy(*groups).agg(*agg) if groups
            else idx.agg(*agg))
