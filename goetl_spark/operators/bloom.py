"""Bloom-filter membership prefilter for standing-reference semi-joins.

Scale machinery (SURVEY §4.2): at 100 TB the classic "keep only corpus
rows whose key appears in a reference set" (benchmark decontamination,
allowlist joins, incremental-ingest membership) has three regimes:

* reference fits a broadcast of EXACT keys → plain broadcast semi-join
  (operators/join.py::semi_join) — no false positives, no extra pass;
* reference too big to broadcast exactly but its *bloom filter* fits
  (100 M keys ≈ 120 MB at 1 % FPP vs multi-GB of raw keys) → THIS
  module: prefilter the big side with the bloom, then run the exact
  shuffle semi-join on the few survivors — the shuffle moves only rows
  that are probably members instead of the whole corpus;
* both sides huge and mostly-matching → straight shuffle semi-join
  (bloom can't help when most rows pass).

Spark's own runtime bloom filters (``spark.sql.optimizer.runtime.
bloomFilter.enabled``, injected by Catalyst for qualifying shuffle
joins) cover the single-query case; its ``BloomFilterAggregate`` is not
SQL-registered in Spark 4.1, and runtime injection cannot reuse a
filter ACROSS jobs. This module makes the filter a first-class value:
build once (bytes), persist/broadcast, probe from any later job — the
standing-index pattern of dedup.lsh_index_* applied to membership.

Design, all deterministic:

* hashing is JVM-side ``xxhash64`` — two independent 64-bit hashes per
  key (the second seeded by hashing an extra literal column), combined
  Kirsch–Mitzenmacher style (``h1 + i*h2 mod m``) into ``k`` probe
  positions, so the Python side never sees key bytes, only two longs;
* the build is one ``mapInPandas`` pass emitting ONE ``m/8``-byte
  partition bloom per input partition, OR-merged on the driver — the
  collect is bounded by ``num_partitions × num_bits/8`` (the same
  driver-merge contract as Spark's own BloomFilterAggregate final
  merge and this repo's sketch.py t-digests), never by row count;
* probes are an Arrow-batched pandas UDF over a ``SparkContext``
  broadcast of the filter bytes — vectorized numpy bit tests, no
  per-row Python.

Guarantee: a bloom filter has NO false negatives, so
``bloom_prefilter`` returns a SUPERSET of the exact semi-join and
``bloom_semi_join`` (prefilter → exact semi-join) returns EXACTLY the
semi-join rows (tests/test_bloom.py property-checks both).

Reference parity note: goetl has no bloom operator; this is
beyond-reference scale machinery in the spirit of its enrichment
lookup (reference join/lookup semantics, see operators/join.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_might_contain",
    "bloom_prefilter",
    "bloom_semi_join",
    "bloom_anti_join",
    "bloom_params",
]

# concat_ws separator for composite keys — unit separator, vanishingly
# unlikely inside real key text; identical on build and probe side so
# any collision is at worst an extra false positive, never a false
# negative.
_SEP = "\x1f"
# literal mixed into the second hash so (h1, h2) are independent.
_SEED2 = 0x9E3779B9


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: optimal ``(num_bits, num_hashes)`` for
    ``expected_items`` keys at false-positive rate ``fpp``. ``num_bits``
    is rounded up to a power of two so the positional mod compiles to a
    mask and the byte array packs evenly."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    num_bits = 1 << max(10, math.ceil(math.log2(m)))
    k = max(1, round(num_bits / expected_items * math.log(2)))
    return num_bits, min(k, 16)


def _hash_cols(key_cols: Sequence[str]) -> tuple[Column, Column]:
    """Two independent JVM-side 64-bit hashes of the composite key.

    NULL components: ``concat_ws`` skips NULLs, so a NULL-keyed row
    hashes like its non-NULL remainder — harmless for the superset
    guarantee (both sides hash identically; ANSI semi-join NULL
    semantics are enforced by the exact join that follows)."""
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    return F.xxhash64(key), F.xxhash64(key, F.lit(_SEED2))


def _positions(h1: np.ndarray, h2: np.ndarray, i: int, num_bits: int) -> np.ndarray:
    # uint64 arithmetic wraps mod 2^64 (deterministic); num_bits is a
    # power of two so & is the mod.
    return (h1 + np.uint64(i) * h2) & np.uint64(num_bits - 1)


def bloom_build(
    keys: DataFrame,
    key_cols: Sequence[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> bytes:
    """Build a bloom filter over the distinct composite keys of
    ``keys`` and return it as ``num_bits/8`` bytes (persist it anywhere
    — it is the standing index).

    EAGER: runs one Spark job. One scan → one partition bloom per
    partition (``mapInPandas``) → driver OR-merge bounded by
    ``partitions × num_bits/8`` bytes, never by rows.
    """
    if num_bits < 8 or num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two >= 8")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    h1, h2 = _hash_cols(key_cols)
    hashed = keys.select(h1.alias("h1"), h2.alias("h2"))
    nb, nh = num_bits, num_hashes

    def build_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(nb // 8, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            a = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            b = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(nh):
                pos = _positions(a, b, i, nb)
                # bitwise_or.at, not arr[idx] |= — fancy-assign drops
                # duplicate positions within a batch
                np.bitwise_or.at(
                    arr, (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7))).astype(np.uint8))
        yield pd.DataFrame({"bloom": [arr.tobytes()]})

    merged = np.zeros(num_bits // 8, dtype=np.uint8)
    for row in hashed.mapInPandas(build_part, "bloom binary").collect():
        merged |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return merged.tobytes()


def bloom_might_contain(
    df: DataFrame,
    key_cols: Sequence[str],
    bloom: bytes,
    num_hashes: int = 5,
    out_col: str = "might_contain",
) -> DataFrame:
    """Add boolean ``out_col``: True iff the row's composite key is
    *probably* in the set the filter was built over (never False for a
    true member). Filter bytes ride a SparkContext broadcast; the probe
    is one Arrow-batched numpy bit test over the two JVM-side hashes."""
    num_bits = len(bloom) * 8
    if num_bits & (num_bits - 1):
        raise ValueError("bloom length must be a power of two in bits")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    nb, nh = num_bits, num_hashes

    from pyspark.sql.functions import pandas_udf

    def probe_pd(h1: pd.Series, h2: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        a = h1.to_numpy(dtype=np.int64).view(np.uint64)
        b = h2.to_numpy(dtype=np.int64).view(np.uint64)
        hit = np.ones(len(a), dtype=bool)
        for i in range(nh):
            pos = _positions(a, b, i, nb)
            bit = arr[(pos >> np.uint64(3)).astype(np.int64)] \
                & (np.uint8(1) << (pos & np.uint64(7))).astype(np.uint8)
            hit &= bit != 0
            if not hit.any():
                break
        return pd.Series(hit)

    probe = pandas_udf(probe_pd, "boolean")
    h1, h2 = _hash_cols(key_cols)
    return df.withColumn(out_col, probe(h1, h2))


def bloom_prefilter(
    big: DataFrame,
    key_cols: Sequence[str],
    bloom: bytes,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep only rows whose key might be in the filter — a SUPERSET of
    the exact semi-join (FPP-bounded overshoot, zero misses). This is
    the 100 TB pre-shuffle cut: survivors are the only rows that pay
    the exact-join shuffle."""
    flagged = bloom_might_contain(big, key_cols, bloom, num_hashes, "__bloom_hit")
    return flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")


def bloom_semi_join(
    big: DataFrame,
    reference: DataFrame,
    on: Sequence[str],
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT semi-join ``big ⋉ reference`` executed as bloom prefilter →
    shuffle semi-join, so only probable members are shuffled.

    ``expected_items``: reference's distinct-key estimate for filter
    sizing (default: one extra count job). The composition is exact —
    false positives are removed by the ANSI semi-join, and the bloom
    has no false negatives — so its oracle is the plain semi-join.
    """
    keys = list(on)
    ref_keys = reference.select(*keys).distinct()
    if expected_items is None:
        expected_items = max(1, ref_keys.count())
    num_bits, num_hashes = bloom_params(expected_items, fpp)
    filt = bloom_build(ref_keys, keys, num_bits, num_hashes)
    survivors = bloom_prefilter(big, keys, filt, num_hashes)
    return survivors.join(ref_keys, on=keys, how="left_semi")


def bloom_anti_join(
    big: DataFrame,
    reference: DataFrame,
    on: Sequence[str],
    expected_items: int | None = None,
    fpp: float = 0.01,
    materialize: bool = False,
) -> DataFrame:
    """EXACT anti-join ``big ▷ reference`` — the decontamination /
    blocklist shape when the reference key set is too big to broadcast:
    bloom MISSES are *definitely* not in the reference and go straight
    to the output with zero shuffle; only the FPP-bounded sliver of
    bloom hits pays the exact shuffle anti-join (NULL-keyed rows are
    kept on either path, matching ANSI left-anti semantics).

    The two branches are filters over one probed plan, so lazily the
    source is scanned twice (both scans are map-side: parquet scan +
    bit test — the shuffle only ever sees hits). ``materialize=True``
    eagerly localCheckpoints the probed frame to scan once, at the
    cost of storing it (dedup.py's materialize contract)."""
    keys = list(on)
    ref_keys = reference.select(*keys).distinct()
    if expected_items is None:
        expected_items = max(1, ref_keys.count())
    num_bits, num_hashes = bloom_params(expected_items, fpp)
    filt = bloom_build(ref_keys, keys, num_bits, num_hashes)
    flagged = bloom_might_contain(big, keys, filt, num_hashes, "__bloom_hit")
    if materialize:
        flagged = flagged.localCheckpoint(eager=True)
    misses = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    hits = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    return misses.unionByName(hits.join(ref_keys, on=keys, how="left_anti"))
