"""Fourth batch of registered queries + DuckDB oracles: time-series
gap-filling with LOCF, wide→long unpivot, and RANGE-framed trailing
windows.

These round out the time-series surface the hypertable rollup
(`queries_ext3.time_bucket_rollup`) opened: the gap-fill + carry-forward
pattern is the TimescaleDB ``time_bucket_gapfill``/``locf`` shape,
re-expressed as a date-spine ``sequence``/``explode`` + an
ignore-nulls window — all built-in DataFrame ops, no UDFs.

Same contract as `queries.py`: identical column aliases both sides,
doubles rounded to 4, dates emitted as DATE on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# gapfill_daily_events — date-spine gap-fill + last-observation-carried-forward
# ---------------------------------------------------------------------------


def q_gapfill_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts per type: a date spine spanning the
    observed range (built with ``sequence``/``explode`` from a 1-row
    min/max aggregate — no driver round-trip), LEFT-joined to the daily
    aggregate; missing days get 0 events and carry the last observed
    daily max value forward (LOCF via ``last(ignorenulls)`` over a
    per-type window; max, unlike a summed mean, is bit-exact under any
    aggregation order — no float tie-breaking across engines). The spine side is tiny (days × types) and
    broadcast; the fact is aggregated before the join, so the heavy
    table shuffles exactly once."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", F.col("ts"))).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("value"), 4).alias("max_value"),
    )
    bounds = ev.agg(
        F.min(F.to_date(F.date_trunc("DAY", F.col("ts")))).alias("d0"),
        F.max(F.to_date(F.date_trunc("DAY", F.col("ts")))).alias("d1"),
    )
    spine = (
        bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(ev.select("event_type").distinct())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # hint the BUILD side: for a LEFT OUTER join only the right side can
    # host the broadcast hash table (build-left is illegal for left outer,
    # so a hint on the spine would be silently ignored and the plan would
    # ride on autoBroadcast of `daily` — fine until the aggregate outgrows
    # the threshold, then a surprise sort-merge join)
    return (
        spine
        .join(F.broadcast(daily), ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("max_value", ignorenulls=True).over(w).alias("locf_max_value"),
        )
        .orderBy("event_type", "day")
    )


SQL_GAPFILL_DAILY_EVENTS = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         round(max(value), 4) AS max_value
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events),
           (SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events),
           INTERVAL 1 DAY)) AS DATE) AS day
), grid AS (
  SELECT e.event_type, s.day
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) e
)
SELECT g.event_type, g.day,
       COALESCE(d.n_events, 0) AS n_events,
       last_value(d.max_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_max_value
FROM grid g LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
ORDER BY g.event_type, g.day
"""


# ---------------------------------------------------------------------------
# unpivot_nation_metrics — wide aggregate → long (stack / UNION ALL)
# ---------------------------------------------------------------------------


def q_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot: one wide aggregate row per nation (revenue,
    quantity, line count) melted into (n_name, metric, value) via
    ``stack`` — the inverse of pivot, a metadata-only reshape after the
    single aggregation shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    wide = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat.select("n_nationkey", "n_name")), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.round(F.sum("l_quantity"), 4).alias("quantity"),
            F.count(F.lit(1)).cast("double").alias("n_lines"),
        )
    )
    return (
        wide.selectExpr(
            "n_name",
            "stack(3, 'revenue', revenue, 'quantity', quantity, 'n_lines', n_lines) AS (metric, value)",
        )
        .orderBy("n_name", "metric")
    )


SQL_UNPIVOT_NATION_METRICS = """
WITH wide AS (
  SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         round(sum(l_quantity), 4) AS quantity,
         CAST(count(*) AS DOUBLE) AS n_lines
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, metric, value FROM (
  SELECT n_name, 'revenue' AS metric, revenue AS value FROM wide
  UNION ALL SELECT n_name, 'quantity', quantity FROM wide
  UNION ALL SELECT n_name, 'n_lines', n_lines FROM wide
)
ORDER BY n_name, metric
"""


# ---------------------------------------------------------------------------
# trailing_week_revenue — RANGE-framed window over a day offset
# ---------------------------------------------------------------------------


def q_trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per order priority: daily totals plus a
    RANGE-framed window over the day offset (value-based frame — days
    with no orders genuinely shorten the trailing sum, unlike a ROWS
    frame). The window runs on the post-aggregation table (days ×
    priorities), partitioned by priority — never on raw orders."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority",
        F.to_date(F.date_trunc("DAY", F.col("o_orderdate"))).alias("day"),
    ).agg(F.sum("o_totalprice").alias("day_rev"))
    day_num = F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(day_num)
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            "o_orderpriority",
            "day",
            F.round("day_rev", 4).alias("day_rev"),
            F.round(F.sum("day_rev").over(w), 4).alias("trailing_7d_rev"),
        )
        .orderBy("o_orderpriority", "day")
    )


SQL_TRAILING_WEEK_REVENUE = """
WITH daily AS (
  SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         sum(o_totalprice) AS day_rev
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day,
       round(day_rev, 4) AS day_rev,
       round(sum(day_rev) OVER (
         PARTITION BY o_orderpriority
         ORDER BY datediff('day', DATE '1995-01-01', day)
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS trailing_7d_rev
FROM daily
ORDER BY o_orderpriority, day
"""


REGISTRY_EXT4: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "gapfill_daily_events": (q_gapfill_daily_events, SQL_GAPFILL_DAILY_EVENTS),
    "unpivot_nation_metrics": (q_unpivot_nation_metrics, SQL_UNPIVOT_NATION_METRICS),
    "trailing_week_revenue": (q_trailing_week_revenue, SQL_TRAILING_WEEK_REVENUE),
}
