"""Registered engine queries + DuckDB oracle SQL (the driver contract).

Each entry exercises one or more operators from SURVEY.md §2 over the
driver's synthetic tables (TESTDATA.md). The Spark side is idiomatic
DataFrame code routed through the engine's operator/function layer; the
oracle side is equivalent ANSI SQL for DuckDB. Column names are aliased
identically on both sides (the driver's compare sorts columns by name and
hashes values).

Float policy: aggregate-derived doubles are rounded to 4 decimals on BOTH
sides so summation-order differences between engines (~1e-12 relative)
can't flip a hash. Pass-through column values are bit-identical from the
shared parquet and are not rounded.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table is written with nanosecond parquet timestamps, which
    Spark's vectorized reader rejects; read nanos as long and convert to a
    microsecond timestamp with integer division (a float division would lose
    precision on ~1.7e18 epoch-nanos)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


# ---------------------------------------------------------------------------
# Core relational queries (SURVEY §2.2-§2.8 over the TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (A3 sums/avgs, A1 counts,
    grouped hash-agg). Catalyst plans partial+final hash agg with map-side
    combine; the only shuffle is on the 2-key group — scale-safe."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                           AS sum_qty,
       round(sum(l_extendedprice), 4)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)     AS sum_charge,
       round(avg(l_quantity), 4)                                           AS avg_qty,
       round(avg(l_extendedprice), 4)                                      AS avg_price,
       round(avg(l_discount), 4)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by metric (T1) — TakeOrderedAndProject, no global sort."""
    from ra2_datalake_linaresjoan_spark.operators.topk import top_k

    orders = _t(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
        "o_totalprice",
        50,
        tiebreak=["o_orderkey"],
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


def q_event_type_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped frequency + top-10 (A2/T2, reference value_counts +
    report top-10s)."""
    from ra2_datalake_linaresjoan_spark.operators.topk import top_k_groups

    events = _t(spark, sf_dir, "events")
    return top_k_groups(events, ["event_type"], k=10, count_col="n")


SQL_EVENT_TYPE_TOP10 = """
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type ASC
LIMIT 10
"""


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (A4, reference validator_warehouse.py:175-189:
    SUM(CASE WHEN ...)) + COALESCE'd totals (A6) per order priority."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("long")
            .alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_finished"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("o_orderstatus") == "O", F.col("o_totalprice")
                        )
                    ),
                    F.lit(0.0),
                ),
                4,
            ).alias("open_value"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("o_orderpriority")
    )


SQL_CONDITIONAL_AGG = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 4) AS open_value,
       count(*) AS n_total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked dedup keep-newest (W1, reference spark_cleaner.py:108-114):
    newest event per (user_id, event_type), deterministic tiebreak."""
    from ra2_datalake_linaresjoan_spark.operators.dedup import dedup_keep_newest

    events = _t(spark, sf_dir, "events")
    deduped = dedup_keep_newest(
        events, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    )
    return deduped.select("event_id", "user_id", "event_type", "ts", "value")


SQL_WINDOW_DEDUP = """
SELECT event_id, user_id, event_type, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + uniqueness check shape (A5/A11, reference
    validator_warehouse.py:91-105)."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.countDistinct("c_custkey").alias("n_unique_keys"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("c_nationkey")
    )


SQL_COUNT_DISTINCT = """
SELECT c_nationkey,
       count(DISTINCT c_mktsegment) AS n_segments,
       count(DISTINCT c_custkey)    AS n_unique_keys,
       count(*)                     AS n_rows
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_orders": (q_top_orders, SQL_TOP_ORDERS),
    "event_type_top10": (q_event_type_top10, SQL_EVENT_TYPE_TOP10),
    "conditional_agg": (q_conditional_agg, SQL_CONDITIONAL_AGG),
    "window_dedup": (q_window_dedup, SQL_WINDOW_DEDUP),
    "count_distinct": (q_count_distinct, SQL_COUNT_DISTINCT),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
