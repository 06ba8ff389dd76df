"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The driver records this per-round as
BENCH_r{N}.json and grades against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from goetl_spark.session import get_spark
    from goetl_spark import queries as catalog

    spark = get_spark("goetl-spark-bench", master=f"local[{cpus}]")

    # warm the JVM + parquet footers with a trivial action so per-query
    # timings measure the query, not session startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # ... and the Python worker pool: the first Arrow stage after a gap
    # pays worker spawn + import across all cores (measured ~3 s), which
    # would land on whichever pandas-UDF query runs it
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s):
        import numpy  # noqa: F401 — preload into workers
        return s

    spark.range(0, 10_000, 1, int(cpus)).select(_warm(col("id"))).count()

    timings: dict[str, float] = {}
    for name, fn in catalog.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "query_wall_time_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
