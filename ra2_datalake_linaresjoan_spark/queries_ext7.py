"""Relational queries, batch 7 (round 4): disjunctive-predicate joins
(TPC-H Q19 shape), nested-aggregate supplier selection (Q20 shape),
global-fraction HAVING (Q11 shape), mergeable distinct sketches — exact
bitmaps and HyperLogLog with an accuracy-guarantee oracle — an
interval-RANGE burst window, and exact decimal money arithmetic.

The reference's validation layer (``validator_warehouse.py``) answers
"how much / how many / who qualifies" questions with single-pass
PostgreSQL aggregates; this batch re-expresses the same question family
in the shapes a warehouse actually needs at 100 TB: predicate
disjunctions that still prune the build side before the join, HAVING
thresholds computed from one-row broadcast aggregates instead of global
windows, and distinct-count data structures (``bitmap_*`` /
``hll_sketch_agg``) that are mergeable map-side so re-aggregation never
rescans the fact table. Every oracle is exact DuckDB SQL; integer
aggregates are CAST to BIGINT (the round-2 HUGEINT hash lesson) and no
oracle returns a decimal column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# bracket_revenue — TPC-H Q19 shape: OR-of-ANDs spanning both join sides
# ---------------------------------------------------------------------------


def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjoint (brand, size, quantity) brackets — the
    Q19 disjunctive-predicate join. The part side of the disjunction
    (brand ∈ {12,23,34} AND the per-brand size cap) is applied BEFORE the
    join so the broadcast build is 3 brands' parts, not the whole part
    table, and the lineitem side gets the derived superset predicate
    (quantity ≤ 30) pushed to the parquet scan; the exact OR-of-ANDs then
    runs as the post-join filter. At 100 TB the derived predicates are
    what keeps this from being a full-fact × full-dim join — Catalyst
    cannot infer them from an opaque OR, so the plan states them
    explicitly (the classic Q19 rewrite)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    pre_part = part.filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
        | (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
        | (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
    ).select("p_partkey", "p_brand", "p_size")
    pre_li = li.filter(F.col("l_quantity") <= 30).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    bracket = (
        (F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30)
    )
    return (
        pre_li.join(F.broadcast(pre_part), pre_li.l_partkey == pre_part.p_partkey)
        .filter(bracket)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


SQL_BRACKET_REVENUE = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# promo_part_suppliers — TPC-H Q20 shape: nested aggregate gating a semi-join
# ---------------------------------------------------------------------------


def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped an above-average volume of 'red *' parts in
    1996 — the Q20 shape (nested aggregate → qualifying key set →
    enrich), adapted to this schema (no partsupp table; shipped lineitem
    volume stands in for stocked quantity). Plan: broadcast the
    name-filtered part keys into the fact scan (a broadcast semi-join, so
    the fact table is pruned before the heavy group-by), aggregate
    per-supplier totals, gate on the one-row global average via a
    broadcast cross-join (never a global window), then broadcast-enrich
    with supplier + nation names. Every post-fact-scan input is
    dimension-sized, so the only big-data shuffle is the per-supplier
    aggregate."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    red_keys = part.filter(F.col("p_name").like("red %")).select("p_partkey")
    shipped = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(F.broadcast(red_keys), li.l_partkey == red_keys.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("red_qty"))
    )
    avg_row = shipped.agg(F.avg("red_qty").alias("_avg"))
    return (
        shipped.crossJoin(F.broadcast(avg_row))
        .filter(F.col("red_qty") > F.col("_avg"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), "red_qty")
        .orderBy("s_name")
    )


SQL_PROMO_PART_SUPPLIERS = """
WITH shipped AS (
  SELECT l_suppkey, round(sum(l_quantity), 2) AS red_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1996
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
  GROUP BY l_suppkey
)
SELECT s.s_name, n.n_name AS nation, sh.red_qty
FROM shipped sh
JOIN supplier s ON sh.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE sh.red_qty > (SELECT avg(red_qty) FROM shipped)
ORDER BY s.s_name
"""


# ---------------------------------------------------------------------------
# nation_value_threshold — TPC-H Q11 shape: HAVING against a global fraction
# ---------------------------------------------------------------------------


def q_nation_value_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations whose suppliers' shipped value exceeds 4% of the global
    total — the Q11 "important stock" shape (grouped value with a HAVING
    threshold that is itself an aggregate over the same data). The fact
    table is aggregated ONCE to per-supplier value (one shuffle);
    everything after — the supplier→nation rollup, the global total, the
    threshold filter — runs on dimension-sized data with the global sum
    carried as a one-row broadcast. The naive form recomputes the fact
    aggregate in a scalar subquery; at 100 TB that is two full scans, so
    the single-aggregation plan is the whole point."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("supp_value")
    )
    per_nation = (
        per_supp.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
                      per_supp.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("supp_value").alias("nation_value"))
    )
    total = per_nation.agg(F.sum("nation_value").alias("_total"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nation_value") > 0.04 * F.col("_total"))
        .select(
            "n_name",
            F.round("nation_value", 2).alias("nation_value"),
            F.round(F.col("nation_value") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.col("nation_value").desc(), "n_name")
    )


SQL_NATION_VALUE_THRESHOLD = """
WITH per_nation AS (
  SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS nation_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name,
       round(nation_value, 2) AS nation_value,
       round(nation_value / (SELECT sum(nation_value) FROM per_nation), 6)
         AS share
FROM per_nation
WHERE nation_value > 0.04 * (SELECT sum(nation_value) FROM per_nation)
ORDER BY round(nation_value, 2) DESC, n_name
"""


# ---------------------------------------------------------------------------
# bitmap_exact_distinct — mergeable EXACT distinct counts via bitmaps
# ---------------------------------------------------------------------------


def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type computed as a mergeable bitmap
    instead of a COUNT(DISTINCT) shuffle-dedup: each (type, 4096-id
    bucket) builds a fixed 512-byte bitmap map-side
    (``bitmap_construct_agg(bitmap_bit_position(id))``), bucket bitmaps
    OR together associatively, and the distinct count is the sum of
    per-bucket popcounts. At 100 TB this is the structure you PERSIST:
    per-partition bitmaps union incrementally (new day = OR new bitmaps)
    without ever re-scanning history, which COUNT(DISTINCT) cannot do.
    The oracle is the exact COUNT(DISTINCT) itself — bitmaps are not an
    approximation."""
    ev = _t(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type", F.bitmap_bucket_number(F.col("user_id")).alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("user_id"))
            ).alias("bmp")
        )
    )
    return (
        buckets.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bmp")).alias("n_users"))
        .orderBy("event_type")
    )


SQL_BITMAP_EXACT_DISTINCT = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hll_daily_union — mergeable approximate distinct with a guarantee oracle
# ---------------------------------------------------------------------------


def q_hll_daily_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day as Apache DataSketches HLL sketches
    (``hll_sketch_agg``), re-aggregated to a global count by UNIONING the
    daily sketches (``hll_union_agg``) — the rollup never touches raw
    events again, which is the entire 100-TB value proposition of a
    mergeable sketch (daily sketch ≈ 1.5 KB vs a day of raw user ids).
    The oracle pins the exact quantities DuckDB can verify: day count,
    exact global distinct, and two boolean accuracy guarantees (every
    per-day estimate and the unioned global estimate within 5% of exact —
    lgConfigK=14 gives ~0.8% standard error, so 5% is a hard guarantee,
    not a hope). Like ``approx_distinct_guarantee``, the *guarantee* is
    the oracle-checkable contract of an approximate operator.

    NULL-ts rows are filtered in LOCKSTEP with the oracle: Spark's
    groupBy keeps a NULL day group while the oracle's
    count(DISTINCT CAST(ts AS DATE)) skips NULL — off by exactly that
    group on dirty data (round-8 parity audit)."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rolled = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            (
                F.abs(
                    F.hll_sketch_estimate("sketch").cast("double")
                    - F.col("exact_users")
                )
                > 0.05 * F.col("exact_users")
            ).cast("long")
        ).alias("daily_violations"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("global_est"),
    )
    ev_exact = ev.agg(F.countDistinct("user_id").alias("exact_global"))
    return rolled.crossJoin(F.broadcast(ev_exact)).select(
        "n_days",
        "daily_violations",
        "exact_global",
        (
            F.abs(F.col("global_est").cast("double") - F.col("exact_global"))
            <= 0.05 * F.col("exact_global")
        ).alias("global_within_5pct"),
    )


SQL_HLL_DAILY_UNION = """
SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(0 AS BIGINT) AS daily_violations,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_global,
       true AS global_within_5pct
FROM events
WHERE ts IS NOT NULL
"""


# ---------------------------------------------------------------------------
# burst_1h_max — interval-RANGE window: each user's densest hour by value
# ---------------------------------------------------------------------------


def q_burst_1h_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's maximum trailing-one-hour event value ("burst"): a
    RANGE window over exact epoch-microseconds, frame = [ts − 1h, ts],
    then a per-user max. The window partitions by user, so state is one
    user's hour of events regardless of corpus size — no global sort, no
    unbounded frame. The range key is integer microseconds
    (``unix_micros``) rather than a timestamp so both engines frame over
    identical exact values; DuckDB mirrors with ``epoch_us`` and the same
    integer RANGE bound."""
    ev = _t(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-(hour_us - 1), 0)
    )
    return (
        ev.withColumn("burst", F.sum("value").over(w))
        .groupBy("user_id")
        .agg(
            F.round(F.max("burst"), 4).alias("max_burst_1h"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SQL_BURST_1H_MAX = """
WITH b AS (
  SELECT user_id,
         sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
           AS burst
  FROM events
)
SELECT user_id, round(max(burst), 4) AS max_burst_1h,
       CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# decimal_exact_money — exact decimal arithmetic, bit-stable across engines
# ---------------------------------------------------------------------------


def q_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue in EXACT decimal arithmetic: prices and
    discounts are cast to DECIMAL(18,4) at the scan, the product and sum
    stay decimal end to end, and the result is emitted as integer
    ten-thousandths (BIGINT) — so the value hash is summation-order
    independent, which no double-precision revenue number is (the sf0.1
    ``market_share`` rounding battles of round 2 were exactly this).
    At 100 TB doubles drift by partition count; decimals don't. The
    output stays BIGINT because the driver's Arrow hash treats decimal128
    columns as type-mismatches (round-2 lesson, linted by
    ``driver_sim``).  money_case before the decimal cast: the decimal
    domain has no NaN/±Inf, so both engines RAISE on the cast —
    non-finite money is invalid input, excluded lockstep (round-11
    value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    li = money_case(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_discount"
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.select("l_suppkey", (price * (F.lit(1).cast("decimal(18,4)") - disc)).alias("rev"))
        .join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum("rev") * F.lit(10000).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("n_name")
    )


SQL_DECIMAL_EXACT_MONEY = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            * 10000 AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE (isfinite(l.l_extendedprice) AND abs(l.l_extendedprice) < 9.2e16) AND (isfinite(l.l_discount) AND abs(l.l_discount) < 9.2e16)
GROUP BY n.n_name
ORDER BY n.n_name
"""


REGISTRY_EXT7 = {
    "bracket_revenue": (q_bracket_revenue, SQL_BRACKET_REVENUE),
    "promo_part_suppliers": (q_promo_part_suppliers, SQL_PROMO_PART_SUPPLIERS),
    "nation_value_threshold": (
        q_nation_value_threshold,
        SQL_NATION_VALUE_THRESHOLD,
    ),
    "bitmap_exact_distinct": (q_bitmap_exact_distinct, SQL_BITMAP_EXACT_DISTINCT),
    "hll_daily_union": (q_hll_daily_union, SQL_HLL_DAILY_UNION),
    "burst_1h_max": (q_burst_1h_max, SQL_BURST_1H_MAX),
    "decimal_exact_money": (q_decimal_exact_money, SQL_DECIMAL_EXACT_MONEY),
}
