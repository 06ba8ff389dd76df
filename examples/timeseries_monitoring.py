"""Example 6 — metrics monitoring on a continuous aggregate.

The round-11/12 time-series layer end-to-end, each stage the
registered scale-shaped operator: an event stream lands as
micro-batches into a PERSISTED hypertable rollup (exactly-once
incremental refresh — history never rescanned), then the standing
rollup serves the monitoring battery: ACF seasonality diagnostic,
classical seasonal decomposition, residual CUSUM drift alarms, and an
OLS trend per series. The shape a 100 TB metrics pipeline runs daily:
every diagnostic reads the buckets×keys rollup, never the raw events.

Run: python examples/timeseries_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None,
         workdir: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.timeseries import (
        acf, cusum, hypertable_rollup, linear_trend, seasonal_decompose)
    from goetl_spark.queries import _t
    from goetl_spark.session import get_spark
    from goetl_spark.streaming.sources import replay_stream_ordered
    from goetl_spark.streaming.warehouse import stream_rollup

    owns_spark = spark is None
    spark = spark or get_spark("example-ts-monitoring", master="local[4]",
                               shuffle_partitions=4)
    work = workdir or os.path.join(tempfile.gettempdir(), "goetl_ex_ts")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # the catalog loader normalizes ts across the two parquet layouts the
    # testdata has shipped with (NANOS-as-long / NTZ micros)
    events = _t(spark, sf_dir, "events").select("event_type", "ts", "value")

    # 1) STREAMING INGEST: the day's events arrive as 3 time-ordered
    # micro-batches; each is rolled up and merged into the persisted
    # rollup behind the transactional batch marker (exactly-once).
    stream, _ = replay_stream_ordered(
        events, "ts", num_chunks=3, dir=os.path.join(work, "replay"))
    rollup_path = os.path.join(work, "rollup")
    q = stream_rollup(stream, rollup_path, "ts", ["event_type"], "value",
                      os.path.join(work, "ckpt"), grains=("hour", "day"))
    try:
        q.awaitTermination()
    finally:
        q.stop()

    rollup = spark.read.parquet(rollup_path)
    # the continuous-aggregate contract: incremental == direct
    direct = hypertable_rollup(events, "ts", ["event_type"], "value",
                               grains=("hour", "day"))
    cols = ["grain", "bucket", "event_type", "n", "sum_dec", "vmin", "vmax"]
    incremental_exact = (
        sorted(map(tuple, rollup.select(*cols).collect()))
        == sorted(map(tuple, direct.select(*cols).collect())))

    # 2) DIAGNOSTICS off the raw stream (bucketing inside each op —
    # the rollup above is the serving table; the operators bucket
    # identically so a production pipeline feeds them the rollup).
    acf_rows = acf(events, "ts", ["event_type"], "value",
                   grain="hour", lags=(1, 24)).collect()
    daily_acf = {r["event_type"]: r["acf"] for r in acf_rows
                 if r["lag"] == 24 and r["acf"] is not None}

    dec = seasonal_decompose(events, "ts", ["event_type"], "value",
                             grain="hour", phase="hour_of_day")
    resid = dec.filter(F.col("resid").isNotNull()) \
        .select("event_type", "bucket", "resid")

    # 3) drift alarms on the deseasonalized residuals
    # slack ~ one residual sigma, threshold ~ 5 sigma of accumulated
    # drift: quiet under seasonal noise, loud on a real mean shift
    alarms = cusum(resid, "resid", order_cols=("bucket",),
                   key_cols=("event_type",), target=0.0, slack=30.0,
                   threshold=150.0)
    n_alarms = alarms.filter(F.col("alarm")).count()

    # 4) long-run trend per series (exact-decimal OLS)
    base = events.select(
        "event_type",
        ((F.unix_micros(F.col("ts")) - F.lit(1704067200000000))
         .cast("double") / F.lit(86400_000000.0)).alias("x"),
        F.col("value").alias("y"))
    trends = {r["event_type"]: r["slope"]
              for r in linear_trend(base, ["event_type"], "x", "y").collect()}

    # 5) STREAMING DRIFT (r13 verdict slack (a)): fit PSI reference
    # bins ONCE on the early window, then the streaming monitor
    # accumulates the whole stream's bin counts into a bins-bounded
    # standing table (exactly-once markers) — at any point the PSI of
    # "everything seen so far" vs the reference is one bounded compare
    # of two tiny tables. The production shape: the reference is
    # fitted and persisted once; the monitor runs forever.
    from goetl_spark.quality import bin_counts, psi_from_counts
    from goetl_spark.streaming.quality import stream_psi_monitor

    lo, hi = events.agg(F.min("value"), F.max("value")).first()
    span = (hi - lo) or 1.0
    breaks = [lo + span * f for f in (0.25, 0.5, 0.75)]
    t0, t1 = events.agg(F.min("ts"), F.max("ts")).first()
    early = events.filter(F.col("ts") <= F.lit(t0 + (t1 - t0) / 3))
    reference = bin_counts(early, "value", breaks) \
        .localCheckpoint(eager=True)

    drift_stream, _ = replay_stream_ordered(
        events, "ts", num_chunks=3, dir=os.path.join(work, "psi_replay"))
    counts_path = os.path.join(work, "psi_counts")
    mon = stream_psi_monitor(drift_stream, counts_path, "value", breaks,
                             os.path.join(work, "psi_ckpt"))
    try:
        mon.awaitTermination()
    finally:
        mon.stop()
    psi_terms = psi_from_counts(
        spark.read.parquet(counts_path), reference,
        n_bins=len(breaks) + 2)
    stream_psi = psi_terms.agg(
        F.sum("psi_term").alias("psi")).first()["psi"]

    # 6) CALIBRATION of the seasonal profile: the hour-of-day profile
    # CLAIMS each bucket's probability of running above its series
    # mean; calibration_bins grades whether those claimed confidences
    # match observed frequencies (ECE = one sum over <= 10 rows). The
    # drift leg says the DISTRIBUTION moved; this leg says whether the
    # model's confidence can still be trusted.
    from goetl_spark.operators.classifier import calibration_bins

    hourly = rollup.filter(F.col("grain") == "hour").select(
        "event_type", "bucket",
        (F.col("sum_dec").cast("string").cast("double")
         / F.col("n")).alias("avg_v"))
    mean_by_series = hourly.groupBy("event_type").agg(
        F.avg("avg_v").alias("series_mean"))
    lab = (hourly.join(mean_by_series, "event_type")
           .withColumn("hod", F.hour("bucket"))
           .withColumn("above",
                       (F.col("avg_v") > F.col("series_mean"))
                       .cast("double")))
    prof = lab.groupBy("event_type", "hod").agg(
        F.avg("above").alias("claimed_p"))
    graded = lab.join(prof, ["event_type", "hod"])
    cal = calibration_bins(graded, "claimed_p", "above", n_bins=5)
    ece = cal.agg(F.sum("ece_term").alias("ece")).first()["ece"]

    # 7) FORECAST GRADING (r14): the trend model is only a monitor
    # until someone measures it — fit the exact-decimal OLS line on
    # the FIRST half of each series' hourly buckets, forecast the
    # second half, and grade per series with the continuous-target
    # eval leg (MAE in value units, R² vs just predicting the mean).
    from goetl_spark.operators.classifier import regression_metrics
    from goetl_spark.operators.timeseries import linear_trend as _lt

    hx = hourly.withColumn(
        "x", (F.unix_micros(F.col("bucket")).cast("double")
              / F.lit(3600_000000.0)))
    mid = hx.agg(((F.min("x") + F.max("x")) / 2).alias("m")).first()["m"]
    fit = _lt(hx.filter(F.col("x") <= mid), ["event_type"], "x", "avg_v")
    test = (hx.filter(F.col("x") > mid)
            .join(fit.select("event_type", "slope", "intercept"),
                  "event_type")
            .filter(F.col("slope").isNotNull())
            .withColumn("pred",
                        F.col("intercept") + F.col("slope") * F.col("x")))
    fc_eval = {r["event_type"]: (r["mae"], r["r2"])
               for r in regression_metrics(
                   test, "avg_v", "pred", ["event_type"]).collect()}

    out = {
        "rollup_rows": rollup.count(),
        "incremental_exact": incremental_exact,
        "series": len(trends),
        "daily_acf": daily_acf,
        "resid_buckets": resid.count(),
        "cusum_alarms": n_alarms,
        "slopes": trends,
        "stream_psi": stream_psi,
        "calibration_ece": ece,
        "forecast_eval": fc_eval,
    }
    if owns_spark:
        spark.stop()
    else:
        shutil.rmtree(work, ignore_errors=True)
    return out


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
