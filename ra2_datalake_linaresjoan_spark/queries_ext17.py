"""Relational batch 17 (round 4 cont.): join-skew diagnosis.

``skew_diagnosis`` profiles the shuffle-key distribution a planner
needs BEFORE running a big join: per-key row counts for
lineitem.l_orderkey and orders.o_custkey collapsed to the four numbers
that decide the strategy — max key frequency, p99 frequency, mean, and
the skew factor max/mean. A skew factor ≫ 1 on the probe side is the
signal to salt (`operators/skew.salted_join`) or let AQE's skew-join
splitting handle it; the profile costs one aggregate per key column
(key-cardinality rows, then a 1-row collapse) — far cheaper than
discovering the skew from a straggler task at hour three.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


def _profile(df: DataFrame, key: str, table: str) -> DataFrame:
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
        F.expr("percentile(n, 0.99)").alias("p99_freq"),
        F.round(F.sum("n") / F.count(F.lit(1)), 4).alias("mean_freq"),
        F.round(F.max("n") / (F.sum("n") / F.count(F.lit(1))), 4).alias(
            "skew_factor"
        ),
    )


def q_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for the two big join keys. One
    aggregate per key; output is 2 rows."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        _profile(li.select("l_orderkey"), "l_orderkey", "lineitem")
        .unionByName(_profile(orders.select("o_custkey"), "o_custkey", "orders"))
        .orderBy("table_name")
    )


SQL_SKEW_DIAGNOSIS = """
WITH lk AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), ok AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), p AS (
  SELECT 'lineitem' AS table_name, 'l_orderkey' AS key,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_freq,
         quantile_cont(n, 0.99) AS p99_freq,
         round(sum(n) * 1.0 / count(*), 4) AS mean_freq,
         round(max(n) / (sum(n) * 1.0 / count(*)), 4) AS skew_factor
  FROM lk
  UNION ALL
  SELECT 'orders', 'o_custkey',
         CAST(count(*) AS BIGINT),
         CAST(sum(n) AS BIGINT),
         CAST(max(n) AS BIGINT),
         quantile_cont(n, 0.99),
         round(sum(n) * 1.0 / count(*), 4),
         round(max(n) / (sum(n) * 1.0 / count(*)), 4)
  FROM ok
)
SELECT * FROM p ORDER BY table_name
"""


REGISTRY_EXT17: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "skew_diagnosis": (q_skew_diagnosis, SQL_SKEW_DIAGNOSIS),
}
