"""Example 2 — star-schema warehouse pipeline.

The goetl_spark counterpart of the reference's complex-pipeline and
DAG examples (examples/main.go: complexPipelineExample,
examples/dag_example/example_dag.go): join the star schema, aggregate
revenue per nation, validate data quality, and maintain an SCD2
customer dimension from a changed snapshot.

Run: python examples/warehouse_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

# runnable standalone (`python examples/<name>.py`): the script dir
# is examples/, so put the repo root on the path for goetl_spark
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from pyspark.sql import functions as F

    from goetl_spark.operators.join import JoinConfig, join
    from goetl_spark.operators.scd import OPEN_END_DATE, scd_type2
    from goetl_spark.quality import DataQualityValidator
    from goetl_spark.session import get_spark, load_tables

    owns_spark = spark is None
    spark = spark or get_spark("example-warehouse", master="local[4]",
                               shuffle_partitions=4)
    t = load_tables(spark, sf_dir)

    # revenue per nation: fact ⋈ dims, broadcast strategy on small sides
    enriched = join(
        t["lineitem"], t["orders"],
        JoinConfig(join_type="inner", left_keys=["l_orderkey"],
                   right_keys=["o_orderkey"]))
    enriched = join(
        enriched, t["customer"],
        JoinConfig(join_type="inner", left_keys=["o_custkey"],
                   right_keys=["c_custkey"], strategy="broadcast"))
    enriched = join(
        enriched, t["nation"],
        JoinConfig(join_type="inner", left_keys=["c_nationkey"],
                   right_keys=["n_nationkey"], strategy="broadcast"))
    revenue = (enriched
               .groupBy("n_name")
               .agg(F.sum((F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))
                          .cast("decimal(38,6)")).cast("double")
                    .alias("revenue"))
               .orderBy(F.desc("revenue")))
    top = revenue.first()

    # one-job data-quality gate on the dimension
    report = DataQualityValidator(
        min_records=10,
        required_fields=["c_custkey", "c_mktsegment"],
        max_null_rate={"c_custkey": 0.0},
    ).validate(t["customer"])

    # SCD2: apply a changed snapshot (every 10th customer moves segment)
    dim = (t["customer"].select("c_custkey", "c_mktsegment")
           .withColumn("effective_from", F.lit("2024-01-01"))
           .withColumn("effective_to", F.lit(OPEN_END_DATE))
           .withColumn("is_current", F.lit(True)))
    snapshot = t["customer"].select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("MOVED"))
         .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"))
    dim2 = scd_type2(snapshot, dim, ["c_custkey"], ["c_mktsegment"],
                     effective_date="2024-06-01")
    n_closed = dim2.filter(~F.col("is_current")).count()

    result = {
        "top_nation": (top["n_name"], round(top["revenue"], 2)),
        "quality_passed": bool(report.passed),
        "scd2_rows": dim2.count(),
        "scd2_closed": n_closed,
    }
    print(f"warehouse_pipeline: {result}")
    if owns_spark:
        spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
