"""Example 1 — file-format round-trip with cleaning transforms.

The goetl_spark counterpart of the reference's CSV-cleaning and
JSON-transformation examples (examples/main.go: csvDataCleaningExample,
jsonTransformationExample, jsonToParquetExample): read raw CSV, trim
and type the fields, drop invalid records, and write JSONL + Parquet.

Run: python examples/csv_json_cleaning.py [work_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile


def main(work_dir: str | None = None, spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.functions import filters as flt
    from goetl_spark.functions import transforms as T
    from goetl_spark.session import get_spark
    from goetl_spark.sinks.files import write_jsonl, write_parquet
    from goetl_spark.sources.files import read_csv

    owns_spark = spark is None
    spark = spark or get_spark("example-csv", master="local[4]",
                               shuffle_partitions=4)
    work = work_dir or tempfile.mkdtemp(prefix="goetl_example_")
    raw = os.path.join(work, "users.csv")
    with open(raw, "w") as f:
        f.write("id,name,email,age,score\n"
                "1,  Alice  ,alice@example.com,34,88.5\n"
                "2,Bob,bob@example.com,,72.0\n"       # missing age
                "3,Carol,carol@example.com,29,91.25\n"
                "4,  ,dave@example.com,41,55.0\n")    # blank name

    users = read_csv(spark, raw, header=True, infer_schema=True)
    cleaned = T.trim_space(users, "name")
    cleaned = cleaned.filter(flt.not_null("name"))   # drops "" too
    cleaned = cleaned.filter(flt.not_null("age"))
    cleaned = T.convert_type(cleaned, "age", "int")
    cleaned = cleaned.withColumn("grade",
                                 F.when(F.col("score") >= 90, "A")
                                  .when(F.col("score") >= 80, "B")
                                  .otherwise("C"))

    jsonl_dir = os.path.join(work, "users_jsonl")
    parquet_dir = os.path.join(work, "users_parquet")
    write_jsonl(cleaned, jsonl_dir)
    write_parquet(cleaned, parquet_dir)

    back = spark.read.parquet(parquet_dir)
    result = {
        "input_rows": users.count(),
        "cleaned_rows": cleaned.count(),
        "roundtrip_rows": back.count(),
        "grades": {r["grade"]: r["n"] for r in
                   back.groupBy("grade").agg(F.count(F.lit(1)).alias("n"))
                   .collect()},
    }
    print(f"csv_json_cleaning: {result}")
    if owns_spark:
        spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
