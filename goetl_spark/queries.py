"""Query catalog: the driver-facing inventory of implemented operators.

Each entry pairs a PySpark query (spark, sf_dir) -> DataFrame with an
equivalent DuckDB oracle SQL (or None for non-SQL-expressible ops). The
driver hash-compares values order-insensitively at sf0.01
(CORRECTNESS_r{N}.json); see ``__spark_entry__.py``.

Float determinism: SUM/AVG over doubles is order-dependent in the last
ulp, and Spark and DuckDB aggregate in different orders. Every float
aggregate here casts to DECIMAL(38,6) first (exact, associative), then
casts the result back to DOUBLE — both engines round the same exact
decimal to the same double. Per-row double arithmetic needs no such
treatment (same IEEE ops on the same parquet values in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goetl_spark.session import load_tables
from goetl_spark.functions import filters as flt
from goetl_spark.operators import groupby as G
from goetl_spark.operators.join import JoinConfig, join, lookup, semi_join, anti_join
from goetl_spark.operators.union import fan_in, distinct
from goetl_spark.operators.cdc import capture_changes
from goetl_spark.operators.scd import scd_type2, scd_type3

QueryFn = Callable[[SparkSession, str], DataFrame]

# registry: name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# exact, associative sum of a double column, rendered back to double
def dsum(col, alias: str):
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double").alias(alias)


def DSUM(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# §2.5 aggregation + §2.3 filters — flagship (TPC-H Q1 shape, SURVEY §7.1)
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           {DSUM('l_extendedprice')} AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DSUM('l_quantity')} / COUNT(*) AS avg_qty,
           {DSUM('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan → filter → hash agg → sort (reference pipeline core:
    readers/parquet.go + filter/filters.go + aggregate/groupby.go).

    The shipdate filter pushes down into the parquet scan; aggregation is
    partial+final (map-side combine) — one shuffle of 4-ish group states.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(38,6)")).cast("double")
             / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.3 filters: combinators, between, in, regex, not_null
# ---------------------------------------------------------------------------

@register(
    "q02_filter_combinators",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax < 0.02)
      AND NOT (l_linestatus = 'O')
    """,
)
def q02_filter_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter.Between/In/And/Or/Not (filter/filters.go:158-232) — all as
    pushable Column predicates."""
    li = _t(spark, sf_dir, "lineitem")
    pred = flt.all_of(
        flt.between("l_quantity", 10, 20),
        flt.is_in("l_returnflag", ["A", "R"]),
        flt.any_of(flt.greater_than("l_discount", 0.05), flt.less_than("l_tax", 0.02)),
        flt.not_(flt.equals("l_linestatus", "O")),
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "q03_filter_strings",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name LIKE '%1%'
      AND c_mktsegment IS NOT NULL AND c_mktsegment <> ''
      AND regexp_matches(c_name, 'Customer#[0-9]+')
    """,
)
def q03_filter_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter.Contains/NotNull/MatchesRegex (filter/filters.go:38-120).
    NotNull also excludes empty strings, per the reference."""
    c = _t(spark, sf_dir, "customer")
    pred = flt.all_of(
        flt.contains("c_name", "1"),
        flt.not_null("c_mktsegment"),
        flt.matches_regex("c_name", "Customer#[0-9]+"),
    )
    return c.filter(pred).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------

@register(
    "q04_join_inner",
    f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS order_count,
           {DSUM('o.o_totalprice')} AS total_spent
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def q04_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + agg (dag/tasks/join.go:106-169). Catalyst picks the
    physical join (broadcast at small SF, sort-merge at scale via AQE)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cfg = JoinConfig(join_type="inner", left_keys=["c_custkey"], right_keys=["o_custkey"])
    j = join(c, o, cfg)
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("order_count"),
             dsum("o_totalprice", "total_spent"))
        .orderBy("c_custkey")
    )


@register(
    "q05_join_left_nulls",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q05_join_left_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with unmatched rows → NULL right side, one-to-many
    expansion preserved (dag/tasks/join.go:130-146)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cfg = JoinConfig(join_type="left", left_keys=["c_custkey"], right_keys=["o_custkey"])
    j = join(c, o, cfg)
    return j.select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q06_join_multiway_broadcast",
    f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS customer_count,
           {DSUM('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region_name, nation_name
    """,
)
def q06_join_multiway_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment via broadcast lookup joins (AddLookupTask,
    dag/dag_builder.go:126-133): nation and region are broadcast — the
    customer side never shuffles for the join."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    enriched = lookup(c, n, keys=["c_nationkey"], lookup_keys=["n_nationkey"])
    enriched = lookup(enriched, r, keys=["n_regionkey"], lookup_keys=["r_regionkey"])
    return (
        enriched.groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(F.count(F.lit(1)).alias("customer_count"),
             dsum("c_acctbal", "total_acctbal"))
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# §2.5 global aggregate, §2.6 top-k / distinct / union
# ---------------------------------------------------------------------------

@register(
    "q07_global_agg",
    f"""
    SELECT COUNT(*) AS n_rows,
           {DSUM('l_quantity')} AS total_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           {DSUM('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price
    FROM lineitem
    """,
)
def q07_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregation → single row (AggregateTask,
    dag/tasks/transform.go:163-200), via the GroupBy façade with no keys."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
         / F.count("l_extendedprice")).alias("avg_price"),
    )


@register(
    "q08_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q08_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (SURVEY §2.6): orderBy+limit compiles to TakeOrderedAndProject
    — per-partition heaps, no global sort, no shuffle of the full table."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q09_union_fanin",
    """
    SELECT name, acctbal, kind FROM (
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
    )
    """,
)
def q09_union_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-in UNION ALL by name (dag/dag_executor.go:352-376)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return fan_in([c, s])


@register(
    "q10_distinct",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def q10_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (beyond reference, SURVEY §2.6 'not present')."""
    o = _t(spark, sf_dir, "orders")
    return distinct(o.select("o_orderstatus", "o_orderpriority"))


ENTRY_QUERY = q01_pricing_summary
