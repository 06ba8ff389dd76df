"""File writers: CSV, JSONL, Parquet with the reference's option surface.

Reference: writers/csv.go, writers/json.go, writers/parquet.go
(SURVEY.md §2.2). Spark writes one file per partition — the distributed
analog of the reference's single buffered stream; batch-size knobs
(csv.go:202-208 etc.) are superseded by partition-level writes.

Option mapping:
- CSV: explicit headers or alphabetical from the record (csv.go:188-199 —
  pass ``columns`` for explicit order; Spark keeps schema order
  otherwise), delimiter/CRLF (csv.go:64-69), NULL → empty string
  (csv.go:251-255 → ``nullValue``).
- Parquet: compression default snappy (parquet.go:351-353), row-group
  size (parquet.go:144-148 → ``parquet.block.size``), schema declared by
  the DataFrame itself (vs first-record inference, parquet.go:367-446).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goetl_spark.stats import IOStats


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
    null_value: str = "",
    crlf: bool = False,
    columns: Sequence[str] | None = None,
    partitions: int | None = None,
    stats: IOStats | None = None,
) -> None:
    """CSV writer (NewCSVWriter parity, writers/csv.go:125-303).

    ``stats`` is filled by the write job itself (the reference's
    per-writer null-count bookkeeping, writers/csv.go:173-175 /
    json.go:169-172) — no second scan.
    """
    if columns:
        df = df.select(*columns)
    if partitions:
        df = df.coalesce(partitions)
    if stats:
        df = stats.attach(df)
    w = (df.write.mode(mode)
         .option("header", header)
         .option("sep", delimiter)
         .option("nullValue", null_value)
         .option("emptyValue", ""))
    if crlf:
        w = w.option("lineSep", "\r\n")
    w.csv(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite",
    partitions: int | None = None,
    stats: IOStats | None = None,
) -> None:
    """JSONL writer (NewJSONWriter parity, writers/json.go:93-283).
    Spark's JSON sink emits line-delimited JSON natively. ``stats`` is
    filled by the write pass (json.go:169-172 parity)."""
    if partitions:
        df = df.coalesce(partitions)
    if stats:
        df = stats.attach(df)
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    row_group_size: int | None = None,
    partition_by: Sequence[str] | None = None,
    partitions: int | None = None,
    stats: IOStats | None = None,
) -> None:
    """Parquet writer (NewParquetWriter parity, writers/parquet.go:64-825).

    ``partition_by`` (beyond reference) is THE 100 TB lever: directory
    partitioning gives readers partition pruning for free. ``stats`` is
    filled by the write pass (writers track record/null counts as they
    stream, parquet.go parity with csv.go:173-175).
    """
    if partitions:
        df = df.coalesce(partitions)
    if stats:
        df = stats.attach(df)
    w = df.write.mode(mode).option("compression", compression)
    if row_group_size:
        w = w.option("parquet.block.size", str(row_group_size))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) parquet table — the co-located-join lever.

    Beyond the reference surface: goetl has no table layout concept at
    all. At 100 TB, two fact tables bucketed on their join key join with
    ZERO shuffle (both sides are already hash-partitioned identically and,
    with ``sort_cols``, sort-merge-join without sorting). The write pays
    one clustering shuffle once; every subsequent join amortizes it.

    Bucketing requires the table catalog (``saveAsTable``); pass ``path``
    to keep the files external to the warehouse dir.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int = 32,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Range-clustered parquet: global range partition on ``cluster_cols``
    then sort within each file (Z-order-lite for one key family).

    Beyond the reference surface. Parquet footers carry per-row-group
    min/max for every column; when a file covers a NARROW value range of
    the cluster key, a reader filtering on that key skips whole files
    (Spark prunes row groups at scan). ``repartitionByRange`` gives each
    output file a disjoint key range; ``sortWithinPartitions`` tightens
    row-group stats inside the file. One range shuffle at write time buys
    every later selective scan file-level skipping — same amortization
    argument as bucketing, aimed at range predicates instead of equi-joins.
    """
    cols = [str(c) for c in cluster_cols]
    (df.repartitionByRange(num_files, *cols)
       .sortWithinPartitions(*cols)
       .write.mode(mode).option("compression", compression).parquet(path))


def zorder_column(df: DataFrame, cols: Sequence[str], bits: int = 12):
    """Morton (z-order) key over 2-3 numeric/timestamp columns, as a pure
    Column expression.

    Each column is linearly scaled to a ``bits``-bit integer with
    ``width_bucket`` against its actual min/max (ONE tiny agg job — no
    global sort), then the bits are interleaved: column i contributes its
    bit b at position ``b*ncols + i``, so the HIGH z bits are the high
    bits of every column in turn. Range-splitting the z key therefore
    splits every clustered dimension, not just the leading one — the
    property ``write_clustered``'s lexicographic sort lacks (its second
    column's stats are useless for skipping). NULL scales to bucket 0
    (sorts first, never lost). All codegen; the scale job reads only the
    clustered columns.
    """
    mins = df.agg(*[F.min(F.col(c).cast("double")).alias(f"mn_{i}")
                    for i, c in enumerate(cols)],
                  *[F.max(F.col(c).cast("double")).alias(f"mx_{i}")
                    for i, c in enumerate(cols)]).collect()[0]
    n = 1 << bits
    ncols = len(cols)
    z = None
    for i, c in enumerate(cols):
        mn, mx = mins[f"mn_{i}"], mins[f"mx_{i}"]
        if mn is None or mx is None or mx <= mn:
            scaled = F.lit(0).cast("long")
        else:
            scaled = (
                F.least(
                    F.lit(n - 1),
                    F.coalesce(
                        F.width_bucket(F.col(c).cast("double"),
                                       F.lit(float(mn)), F.lit(float(mx)),
                                       F.lit(n)) - 1,
                        F.lit(0),
                    ),
                ).cast("long")
            )
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)),
                b * ncols + i,
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    num_files: int = 32,
    bits: int = 12,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Z-order-clustered parquet: range-partition + sort on the Morton key
    of ``zorder_cols`` so every file covers a small HYPER-RECTANGLE of the
    clustered space.

    Parquet min/max stats then skip files/row groups for selective
    predicates on ANY of the clustered columns — the standard lakehouse
    layout for "filter by user OR by time" workloads where a single-key
    range cluster only serves one of them (Delta/Iceberg OPTIMIZE ZORDER
    is this exact recipe). One range shuffle at write, amortized over
    every later scan. Tests measure the per-file min/max footprint
    directly from the footers.
    """
    z = zorder_column(df, zorder_cols, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).option("compression", compression).parquet(path))


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    partition_by: Sequence[str] | None = None,
    partitions: int | None = None,
    stats: IOStats | None = None,
) -> None:
    """ORC writer (beyond the reference's format list) — same contract
    as :func:`write_parquet`: directory partitioning for pruning,
    ``stats`` filled by the write pass. Spark's built-in ORC source
    (no external package); snappy/zlib/zstd compression."""
    if partitions:
        df = df.coalesce(partitions)
    if stats:
        df = stats.attach(df)
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    epoch: int = 0,
    salt: str = "goetl",
    compression: str = "snappy",
    check_unique: bool = True,
) -> dict:
    """Final-mile training output: epoch-deterministic global
    permutation → ``n_shards`` contiguous, equal(±1)-count shard
    directories, ONE file per shard, rows inside each file in
    permutation order (the webdataset/streaming-loader contract).

    Composition of the existing primitives: ``sampling.epoch_shuffle``
    supplies the reproducible md5 permutation key (different but
    deterministic per epoch), ``ranking`` 's distributed exact rank
    turns it into a 1-based total order (never a single-partition
    sort), and ``shard = floor((rank-1)·n/total)`` cuts contiguous
    blocks whose sizes differ by at most one. The write hashes each
    shard to exactly one task and pre-sorts by (shard, rank), which
    satisfies the partitioned writer's required ordering — no second
    sort, intra-file order preserved.

    Scale: one range-partitioned sort + one n_shards-way shuffle, both
    on (shard, rank) pairs; nothing driver-side beyond the rank
    offsets (one row per partition). ``rank`` rides along in the
    output so loaders can verify or re-sort. Returns
    ``{"total_rows", "n_shards", "epoch"}``.
    """
    from pyspark.sql import functions as F

    from goetl_spark.operators.ranking import _ranked
    from goetl_spark.operators.sampling import epoch_shuffle

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if check_unique:
        # epoch_shuffle fail-fasts on NULL keys but not duplicates; a
        # duplicate key means tied md5 permutation values, so rank
        # order — and the writer's whole determinism contract — would
        # quietly depend on task scheduling. One cheap agg, opt-out.
        dup = (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"write_training_shards: duplicate {key_col} "
                f"{dup[0][0]!r} — shard order would be nondeterministic "
                "(pass check_unique=False only with a provably unique key)")
    shuffled = epoch_shuffle(df, key_col, epoch=epoch, salt=salt)
    # __shuffle_key is md5(salt:epoch:key) — unique iff key_col is
    # unique (epoch_shuffle already fail-fasts on NULL keys)
    ranked, total = _ranked(shuffled, ["__shuffle_key"], "rank", None)
    # rank is LONG (see ranking._ranked), so (rank - 1) * n_shards is
    # 64-bit arithmetic — no 32-bit overflow at total > 2^31/n_shards
    sharded = (ranked
               .withColumn("shard",
                           F.floor((F.col("rank") - 1) * n_shards / total)
                           .cast("int"))
               .drop("__shuffle_key"))
    (sharded.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "rank")
     .write.mode("overwrite").option("compression", compression)
     .partitionBy("shard").parquet(path))
    return {"total_rows": total, "n_shards": n_shards, "epoch": epoch}
