"""Streaming sinks: checkpointed file append and foreachBatch upsert.

The reference's writers are all batch (SURVEY §2.2); its roadmap's
"stream processing pipelines" (README.md:654-658) implies sinks that
consume unbounded input. These wire Structured Streaming's two
production patterns:

- :func:`stream_parquet_sink` — the native file sink: exactly-once via
  the checkpoint + file-manifest commit protocol, partitioned append.
- :func:`stream_upsert_jdbc` — ``foreachBatch`` into
  :class:`~goetl_spark.sinks.jdbc.JdbcUpsertWriter`. foreachBatch is
  at-least-once (a failed micro-batch re-runs), so the delivery contract
  comes from the WRITE being idempotent: upsert by key converges to the
  same final table no matter how many times a batch replays — the
  standard exactly-once-on-keys recipe for transactional stores.

Scale notes: each micro-batch is a normal DataFrame job, so everything
the batch writers do (partition fan-out = connection fan-out, error
budget latch, per-batch transactions) applies unchanged per trigger.
State here is only Spark's checkpoint — nothing driver-resident grows
with stream length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from goetl_spark.sinks.jdbc import JdbcUpsertWriter


def stream_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Append a stream to a parquet directory, exactly-once.

    The file sink commits each batch's files through the checkpoint
    manifest, so readers never see partial batches and restarts never
    duplicate them. ``trigger_available_now`` drains what exists and
    stops — the batch-backfill mode; pass False for a continuous query.
    """
    w = (stream_df.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_upsert_jdbc(
    stream_df: DataFrame,
    writer: JdbcUpsertWriter,
    checkpoint_dir: str,
    output_mode: str = "update",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously upsert a (possibly aggregated) stream into a table.

    ``output_mode="update"`` pairs with streaming aggregations: each
    trigger emits only the keys whose aggregate changed, and the upsert
    overwrites exactly those rows — the streaming materialized-view
    pattern (batch counterpart: writers/postgresql.go:544-567 upsert).
    A replayed micro-batch re-upserts the same keys to the same values,
    so duplicates cannot occur in the target.
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        writer.write(batch_df)

    w = (stream_df.writeStream.foreachBatch(_write_batch)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(output_mode))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_dedup_ingest(
    stream_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming corpus ingest with cross-batch exact dedup: each
    micro-batch drops rows whose content digest already exists in the
    accumulated output (:func:`goetl_spark.operators.dedup.dedup_against`
    — in-batch duplicates collapse to the lowest id too) and appends
    only the survivors.

    Delivery contract: foreachBatch is at-least-once (a failed batch
    re-runs), and here the WRITE ITSELF is the idempotence mechanism — a
    replayed batch finds its own digests already in the output and
    appends nothing, so the corpus converges to exactly-once ON CONTENT
    regardless of retries. Same recipe as the upsert sink, with the
    dedup anti-join playing the role of the key constraint.

    Scale: the existing side reduces to distinct digests before the
    anti-join (never text); at real scale maintain the digest set as its
    own compact table instead of re-scanning the corpus per batch (the
    docstring of ``dedup_against`` sketches this)."""
    import os

    from goetl_spark.operators.dedup import dedup_against

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        has_output = os.path.isdir(output_dir) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(output_dir)
            for f in fs)
        existing = (spark.read.parquet(output_dir) if has_output
                    else spark.createDataFrame([], batch_df.schema))
        out = dedup_against(batch_df, existing, text_col, id_col)
        out.write.mode("append").parquet(output_dir)

    w = (stream_df.writeStream.foreachBatch(_write_batch)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_bloom_cut(
    stream_df: DataFrame,
    reference: DataFrame,
    on: Sequence[str],
    output_dir: str,
    checkpoint_dir: str,
    fpp: float = 0.01,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming membership cut against a standing blocklist — the
    streaming twin of :func:`goetl_spark.operators.bloom.bloom_anti_join`
    (decontamination / seen-list removal on an ingest stream).

    The bloom filter is built ONCE from the static reference before the
    query starts (the standing-index shape — a 100 TB blocklist distills
    to m/8 bytes broadcast to every micro-batch; it is NOT rebuilt per
    trigger). Per micro-batch: bloom MISSES are definite non-members and
    flow straight to the output with zero shuffle; only the FPP-bounded
    sliver of hits pays the exact left-anti join against the reference
    keys, so the result is EXACT regardless of fpp. Stream-static
    left-anti joins are unsupported by Structured Streaming, which is
    precisely why this runs inside foreachBatch where each micro-batch
    is a plain DataFrame.

    Delivery contract: foreachBatch is at-least-once, so each batch
    writes to its own ``batch=<id>`` subdirectory with mode=overwrite —
    a replayed batch overwrites its own files byte-for-byte instead of
    appending duplicates (deterministic-target idempotence, the file
    analogue of the upsert sink's key constraint). Read the result with
    ``spark.read.parquet(output_dir)`` and drop the ``batch`` column.

    NULL-keyed stream rows are kept on either path, matching ANSI
    left-anti semantics (see bloom_anti_join)."""
    from goetl_spark.operators.bloom import (
        _with_bloom_flag, bloom_build_keys, bloom_params)

    keys = list(on)
    # pin the reference keys: the anti-join side must not recompute
    # differently across micro-batches (and count() feeds the sizing)
    ref_keys = reference.select(*keys).distinct().localCheckpoint(eager=True)
    num_bits, num_hashes = bloom_params(max(1, ref_keys.count()), fpp)
    packed = bloom_build_keys(ref_keys, keys, num_bits, num_hashes)

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        flagged = _with_bloom_flag(batch_df, packed, num_hashes, keys,
                                   "__bloom_hit")
        misses = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
        hits = (flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
                .join(ref_keys, on=keys, how="left_anti"))
        (misses.unionByName(hits)
         .write.mode("overwrite")
         .parquet(f"{output_dir}/batch={batch_id}"))

    w = (stream_df.writeStream.foreachBatch(_write_batch)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
