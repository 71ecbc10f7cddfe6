"""Relational queries, batch 6 (round 3): exact grouped percentiles,
argmax-by-composite-order (max_by), ratio-to-parent window shares,
cumulative-distinct growth curves, and a watermark lateness audit.

Each shape is one the reference's PostgreSQL validation layer could express
(percentile_cont / arg_max / window shares are stock warehouse idioms —
cf. ``validator_warehouse.py`` statistics queries) re-planned Spark-first:
aggregates before windows, windows only over post-aggregation row counts,
never a data-sized single-partition exchange. Every query carries an exact
DuckDB oracle; windowed integer sums are CAST to BIGINT in the SQL (DuckDB
realizes them as HUGEINT otherwise — the round-2 driver-hash lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# median_orders — exact grouped percentiles (median + p90)
# ---------------------------------------------------------------------------


def q_median_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-priority order-value percentiles: median and p90 via
    ``percentile`` (exact, linear interpolation — matches DuckDB's
    ``quantile_cont``), alongside the count. Exact percentiles sort within
    each group; at 100 TB swap in ``approx_percentile`` (t-digest sketch,
    mergeable map-side) — the query shape is identical, which is why the
    exact variant is the oracle-pinned one.  finite_case: the shared
    finite-population contract for order statistics (round-11
    value-fuzz — engines disagree on NaN/Inf in the sort)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import finite_case

    orders = finite_case(_t(spark, sf_dir, "orders"), "o_totalprice")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        )
        .orderBy("o_orderpriority")
    )


SQL_MEDIAN_ORDERS = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders
WHERE isfinite(o_totalprice)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# latest_event_argmax — max_by with a composite (ts, event_id) order
# ---------------------------------------------------------------------------


def q_latest_event_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user latest event via ``max_by`` over a composite (ts, event_id)
    struct — the argmax formulation of what ``window_dedup`` does with
    row_number. One aggregate with a map-side partial (Spark picks
    SortAggregate because the ordering key is a struct, but the partial
    combine still collapses each partition to one row per user before the
    single key shuffle): at 100 TB this moves one row per (partition ×
    user) instead of every event, which rank-and-filter cannot do. The
    event_id tiebreak makes the argmax total, so results are
    engine-portable."""
    ev = _t(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", ordkey).alias("last_event_type"),
            F.max_by("value", ordkey).alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SQL_LATEST_EVENT_ARGMAX = """
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id,
       event_type AS last_event_type,
       value AS last_value,
       CAST(n_events AS BIGINT) AS n_events
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# nation_share_window — ratio-to-parent via window over a pre-aggregate
# ---------------------------------------------------------------------------


def q_nation_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's customer order revenue: the
    fact is aggregated to (region, nation) FIRST (one shuffle over the big
    table), then the region total is a window sum over the 25-row
    aggregate — the ratio-to-parent idiom. The window never sees fact-table
    row counts, so the single-partition-per-region exchange is bounded by
    the dimension's cardinality at any data scale."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    per_nation = (
        orders.join(cust.select("c_custkey", "c_nationkey"),
                    orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("o_totalprice").alias("_rev"))
    )
    w = Window.partitionBy("r_name")
    return (
        per_nation.select(
            "r_name",
            "n_name",
            F.round("_rev", 2).alias("revenue"),
            F.round(F.col("_rev") / F.sum("_rev").over(w), 6).alias("region_share"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_NATION_SHARE_WINDOW = """
WITH per_nation AS (
  SELECT r_name, n_name, sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY r_name), 6) AS region_share
FROM per_nation
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# cumulative_unique_users — distinct-growth curve without expanding windows
# ---------------------------------------------------------------------------


def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cumulative distinct users: the naive form (COUNT(DISTINCT)
    over an expanding window) re-scans every prefix; the scale form used
    here maps each user to their FIRST-SEEN day (one shuffle on user_id),
    counts first-appearances per day, and takes a running sum over the
    tiny per-day series — linear in the fact, window over ~days rows
    only. The running sum is CAST to BIGINT in the oracle (HUGEINT
    otherwise — the r2 driver-hash lesson). NULL-ts rows are filtered in
    LOCKSTEP with the oracle: an all-NULL-ts user yields a NULL first_day
    whose running-sum position differs between engines (Spark windows
    order NULLS FIRST, DuckDB NULLS LAST)."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    first_seen = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    per_day = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.select(
            F.col("first_day").alias("day"),
            "n_new_users",
            F.sum("n_new_users").over(w).alias("cum_users"),
        )
        .orderBy("day")
    )


SQL_CUMULATIVE_UNIQUE_USERS = """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
), per_day AS (
  SELECT first_day, CAST(count(*) AS BIGINT) AS n_new_users
  FROM first_seen GROUP BY first_day
)
SELECT first_day AS day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY first_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM per_day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# watermark_late_audit — how late do events arrive, per type?
# ---------------------------------------------------------------------------


def q_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-watermark sizing audit on the batch table: an event is
    "late" if it is >30 min older than the maximum event time already seen
    in its type's arrival order (event_id = arrival sequence), judged
    against strictly earlier arrivals. This is exactly the statistic that
    justifies a ``withWatermark`` delay: late_ratio at 30 min ≈ the data
    you would drop with that watermark.

    Scale shape — two-phase prefix max: a naive per-type ordered window
    puts each type's ENTIRE history in one partition (5 types = 5 working
    partitions at any data size). Instead, arrival order is chunked into
    id-range buckets; phase 1 computes each bucket's max event time (a
    normal hash aggregate), phase 2 takes the running max over the tiny
    (type, bucket) table, broadcasts it back, and each row's seen-max is
    greatest(prefix-max of earlier buckets, running max within its own
    bucket) — the per-partition window now covers one bucket, not one
    type, so parallelism is |types| × |buckets| and grows with the data.

    NULL ts/event_id rows are filtered in LOCKSTEP with the oracle:
    lateness is undefined without both an event time and an arrival
    sequence, and the engines disagree on NULL ordering inside the
    prefix-max windows (Spark NULLS FIRST, DuckDB NULLS LAST)."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    ).select(
        "event_type", "event_id", F.unix_micros("ts").alias("_us")
    )
    bucketed = ev.withColumn("_bkt", F.expr("event_id div 10000"))
    bkt_max = bucketed.groupBy("event_type", "_bkt").agg(F.max("_us").alias("_bmax"))
    w_bkt = (
        Window.partitionBy("event_type")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bkt_max.select(
        "event_type", "_bkt", F.max("_bmax").over(w_bkt).alias("_prefix_max")
    )
    w_in = (
        Window.partitionBy("event_type", "_bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seen_max = F.greatest(
        F.coalesce(F.max("_us").over(w_in), F.lit(None).cast("long")),
        F.col("_prefix_max"),
    )
    late = ((seen_max - F.col("_us")) > F.lit(30 * 60 * 1_000_000)).cast("long")
    # null-safe (<=>) on event_type: the window partitions group NULL
    # types as a real group on both engines, but a plain equi-join here
    # silently DROPPED the NULL-type group's rows on the Spark side
    # while the oracle's pure-window form kept them (round-10 dirty
    # audit: 6 vs 7 groups). The prefix side's keys are renamed so the
    # downstream windows keep their unqualified references.
    prefix_r = prefix.withColumnRenamed("event_type", "_p_et").withColumnRenamed(
        "_bkt", "_p_bkt"
    )
    return (
        bucketed.join(
            F.broadcast(prefix_r),
            F.expr("event_type <=> _p_et AND _bkt = _p_bkt"),
        )
        .select("event_type", F.coalesce(late, F.lit(0)).alias("_late"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_late").alias("n_late"),
            F.round(F.sum("_late") / F.count(F.lit(1)), 6).alias("late_ratio"),
        )
        .orderBy("event_type")
    )


SQL_WATERMARK_LATE_AUDIT = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN max(epoch_us(ts)) OVER (
                PARTITION BY event_type ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              - epoch_us(ts) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS late
  FROM events
  WHERE ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late,
       round(sum(late) * 1.0 / count(*), 6) AS late_ratio
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# nation_triangles — triangle counting on a derived trade graph
# ---------------------------------------------------------------------------


def q_nation_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the nation trade graph (undirected edge = some
    order links a customer nation to a DIFFERENT supplier nation through a
    lineitem). The heavy part — deriving distinct edges from the fact —
    is one multi-join pass with broadcast dims and a distinct over ≤
    |nations|² pairs; the triangle join then runs on the tiny canonical
    (a<b) edge list with the standard a<b<c closed-wedge formulation, so
    each triangle counts exactly once. At web-graph scale the same plan
    holds with degree-ordered edge direction (orient low→high degree) —
    the canonical ordering here IS that trick with node id as the proxy."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # reduce EARLY: resolve supplier nation with a broadcast before any
    # shuffle, then collapse the fact to distinct (orderkey, supp-nation) —
    # ≤ |orders|·|nations| rows with a map-side-combinable distinct — so the
    # orderkey shuffle join moves the reduced set, not raw lineitems
    order_sn = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", F.col("s_nationkey").alias("sn"))
        .distinct()
    )
    pairs = (
        order_sn.join(orders, order_sn.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("cn"), "sn")
        .filter(F.col("cn") != F.col("sn"))
    )
    edges = (
        pairs.select(
            F.least("cn", "sn").alias("a"), F.greatest("cn", "sn").alias("b")
        )
        .distinct()
        # the edge list is referenced 4x below (e1/e2/e3 + stats); without a
        # lineage cut each reference would re-run the full fact join —
        # localCheckpoint materializes the <=|nations|^2 rows exactly once
        .localCheckpoint()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    stats = edges.agg(
        F.countDistinct(F.col("a")).alias("_na"),
        F.count(F.lit(1)).alias("n_edges"),
    )
    return stats.crossJoin(tri).select("n_edges", "n_triangles")


SQL_NATION_TRIANGLES = """
WITH pairs AS (
  SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
                  greatest(c_nationkey, s_nationkey) AS b
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT)
        FROM pairs e1 JOIN pairs e2 ON e1.b = e2.a
                      JOIN pairs e3 ON e1.a = e3.a AND e2.b = e3.b)
         AS n_triangles
"""


# ---------------------------------------------------------------------------
# ewma_daily_value — exponentially weighted moving average over a daily series
# ---------------------------------------------------------------------------

_EWMA_DECAY = 0.5


def q_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of daily mean event value per type. The recursive definition
    is re-expressed in closed form — ewma(d) = Σ decay^(d-d') · v(d') /
    Σ decay^(d-d') over d' ≤ d — which is a (day × earlier-day) self-join
    PER TYPE over the post-aggregation daily series (≤ days² tiny rows),
    never over raw events: the fact is reduced first, the quadratic part
    touches only the series. SQL window frames cannot express the
    recursion; the closed form is the engine-portable formulation."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.avg("value").alias("v"))
    cur = daily.select("event_type", F.col("day").alias("d"))
    hist = daily.select(
        F.col("event_type").alias("et2"), F.col("day").alias("d2"), "v"
    )
    weighted = (
        cur.join(
            hist,
            (F.col("event_type") == F.col("et2")) & (F.col("d2") <= F.col("d")),
        )
        .select(
            "event_type",
            "d",
            F.pow(F.lit(_EWMA_DECAY), F.datediff("d", "d2")).alias("w"),
            "v",
        )
        .groupBy("event_type", "d")
        .agg(
            F.round(F.sum(F.col("w") * F.col("v")) / F.sum("w"), 4).alias("ewma_value")
        )
    )
    return weighted.orderBy("event_type", "d")


SQL_EWMA_DAILY_VALUE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT c.event_type, c.day AS d,
       round(sum(pow({_EWMA_DECAY}, date_diff('day', h.day, c.day)) * h.v)
             / sum(pow({_EWMA_DECAY}, date_diff('day', h.day, c.day))), 4)
         AS ewma_value
FROM daily c
JOIN daily h ON h.event_type = c.event_type AND h.day <= c.day
GROUP BY c.event_type, c.day
ORDER BY c.event_type, d
"""


# ---------------------------------------------------------------------------
# daily_trend_slope — linear-regression aggregates (regr_* family)
# ---------------------------------------------------------------------------


def q_daily_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily event counts: OLS slope / intercept /
    R² via the built-in regression aggregates over (epoch-day, count)
    points — single partial+final aggregate over the daily series, the
    sketch-style shape that needs no sort and merges map-side at any
    scale. x is the absolute epoch day: slope is shift-invariant, so no
    per-group min-day join is needed."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    pts = daily.select(
        "event_type",
        F.datediff("day", F.lit("1970-01-01").cast("date")).cast("double").alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    return (
        pts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.regr_slope("y", "x"), 6).alias("slope"),
            F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("y", "x"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


SQL_DAILY_TREND_SLOPE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), pts AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', day) AS DOUBLE) AS x,
         CAST(n AS DOUBLE) AS y
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 4) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM pts
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# psi_drift — population-stability-index data-quality monitor
# ---------------------------------------------------------------------------

_PSI_BIN_W = 50.0  # fixed value-bin width: engine-portable, no quantile job


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI (population stability index) of the event-value distribution,
    per day vs the FIRST day as reference: Σ (p−q)·ln(p/q) over fixed
    width-50 value bins. The ML-monitoring statistic that flags feature
    drift before a model degrades. Plan: one (day, bin) count aggregate
    over the fact, the reference day's distribution broadcast back — the
    quadratic part is |days|×|bins| tiny rows. Laplace-smoothed
    (+1 per bin) so empty bins never divide by zero, matching formula on
    both engines."""
    ev = _t(spark, sf_dir, "events")
    # non-finite values bin to NULL exactly like NULL values always
    # have (NULL bins drop in the p⋈ref equality join) — and
    # floor(NaN/±Inf)→BIGINT never evaluates (DuckDB raises on the
    # cast; ANSI Spark is plan-luck — round-11 value-fuzz)
    # shared finite contract (round-12 advisor: inline copies risk
    # drifting from the round-11-pinned predicate)
    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    _fin = money_pred("value")
    binned = ev.select(
        F.to_date("ts").alias("day"),
        F.when(_fin, F.floor(F.col("value") / _PSI_BIN_W).cast("long")).alias(
            "bin"
        ),
    )
    # day_bin (≤ days × bins rows) feeds five downstream frames (grid,
    # totals, reference day, smoothed p, final join); without a lineage cut
    # each one would re-scan and re-aggregate the fact — materialize the
    # tiny aggregate exactly once
    day_bin = (
        binned.groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    first_day = day_bin.agg(F.min("day").alias("_d0"))
    # smoothed per-day totals need the full bin universe per day: build the
    # (day × bin) grid from the distinct sets so missing bins count as 0
    days = day_bin.select("day").distinct()
    bins = day_bin.select("bin").distinct()
    grid = days.crossJoin(F.broadcast(bins))
    filled = (
        grid.join(day_bin, ["day", "bin"], "left")
        .select("day", "bin", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tot = filled.groupBy("day").agg(F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_nb"))
    p = (
        filled.join(tot, "day")
        .select(
            "day",
            "bin",
            ((F.col("n") + 1) / (F.col("_tot") + F.col("_nb"))).alias("p"),
        )
    )
    ref = (
        p.join(F.broadcast(first_day), p.day == F.col("_d0"))
        .select(F.col("bin").alias("_rbin"), F.col("p").alias("q"))
    )
    return (
        p.join(F.broadcast(ref), p.bin == F.col("_rbin"))
        .groupBy("day")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
            ).alias("psi")
        )
        .orderBy("day")
    )


SQL_PSI_DRIFT = f"""
WITH binned AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN (isfinite(value) AND abs(value) < 9.2e16)
              THEN CAST(floor(value / {_PSI_BIN_W}) AS BIGINT) END AS bin
  FROM events
), day_bin AS (
  SELECT day, bin, CAST(count(*) AS BIGINT) AS n FROM binned GROUP BY day, bin
), grid AS (
  SELECT d.day, b.bin
  FROM (SELECT DISTINCT day FROM day_bin) d
  CROSS JOIN (SELECT DISTINCT bin FROM day_bin) b
), filled AS (
  SELECT g.day, g.bin, COALESCE(db.n, 0) AS n
  FROM grid g LEFT JOIN day_bin db ON g.day = db.day AND g.bin = db.bin
), tot AS (
  SELECT day, CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nb
  FROM filled GROUP BY day
), p AS (
  SELECT f.day, f.bin, (f.n + 1) * 1.0 / (t.tot + t.nb) AS p
  FROM filled f JOIN tot t ON f.day = t.day
), ref AS (
  SELECT bin, p AS q FROM p WHERE day = (SELECT min(day) FROM day_bin)
)
SELECT p.day,
       round(sum((p.p - r.q) * ln(p.p / r.q)), 6) AS psi
FROM p JOIN ref r ON p.bin = r.bin
GROUP BY p.day
ORDER BY p.day
"""


# ---------------------------------------------------------------------------
# purchase_attribution — last-touch attribution via as-of semantics
# ---------------------------------------------------------------------------


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent click/view AT OR BEFORE the purchase time (as-of
    backward join through the engine's union+carry-forward ``asof_join``
    — one shuffle, no per-row range scan), then attribution counts per
    touch type. The composition query that exercises the as-of operator
    inside a larger plan rather than as a leaf.

    Complete-case on (ts, user_id) in lockstep (round-10 dirty audit):
    a NULL-ts touch sorted FIRST in Spark's carry-forward order and
    became the attributed touch for early purchases while DuckDB's
    ASOF predicate never matched it, and a NULL user_id groups in
    Spark's partitioned carry but never equi-matches in the oracle's
    ASOF join condition."""
    from ra2_datalake_linaresjoan_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", F.col("event_type").alias("touch_type")
    )
    attributed = asof_join(
        purchases,
        touches,
        on="ts",
        by="user_id",
        value_cols=["touch_type"],
    )
    return (
        attributed.groupBy(
            F.coalesce("touch_type_asof", F.lit("unattributed")).alias("touch_type")
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("touch_type")
    )


SQL_PURCHASE_ATTRIBUTION = """
WITH ev AS (
  SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), purchases AS (
  SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, ts, event_type AS touch_type
  FROM ev WHERE event_type IN ('click', 'view')
), attributed AS (
  SELECT p.event_id, t.touch_type
  FROM purchases p
  ASOF LEFT JOIN touches t
    ON p.user_id = t.user_id AND t.ts <= p.ts
)
SELECT COALESCE(touch_type, 'unattributed') AS touch_type,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM attributed
GROUP BY 1
ORDER BY touch_type
"""


# ---------------------------------------------------------------------------
# brand_pareto — revenue concentration (how many parts make 80%?)
# ---------------------------------------------------------------------------


def q_brand_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per brand: the number of parts (descending by
    revenue) needed to cover 80% of the brand's lineitem revenue, plus the
    concentration ratio n80/n_parts. The cumulative-share window runs over
    the post-aggregation (brand, part) table PARTITIONED BY BRAND — the
    window's partition size is the brand's catalog slice, never the fact.
    Rank ties are impossible (part key is unique within the aggregate).
    Revenue compares happen on values rounded to cents so the 80% cut
    falls identically in both engines. Complete-case on l_extendedprice
    in LOCKSTEP (round-9 decorrelated dirty audit): an all-NULL-price
    part gets a NULL revenue whose window position and NULL cum_share
    flags diverge between engines."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_extendedprice").isNotNull())
        .select("l_partkey", "l_extendedprice")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("rev").desc(), F.col("p_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("p_brand")
    ranked = per_part.select(
        "p_brand",
        (F.sum("rev").over(w_cum) / F.sum("rev").over(w_tot)).alias("cum_share"),
    )
    return (
        ranked.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum((F.col("cum_share") < 0.8).cast("long")) + 1).alias("n80"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n80",
            F.round(F.col("n80") / F.col("n_parts"), 6).alias("concentration"),
        )
        .orderBy("p_brand")
    )


SQL_BRAND_PARETO = """
WITH per_part AS (
  SELECT p_brand, p_partkey, round(sum(l_extendedprice), 2) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_extendedprice IS NOT NULL
  GROUP BY p_brand, p_partkey
), ranked AS (
  SELECT p_brand,
         sum(rev) OVER (PARTITION BY p_brand
                        ORDER BY rev DESC, p_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / sum(rev) OVER (PARTITION BY p_brand) AS cum_share
  FROM per_part
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN cum_share < 0.8 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n80,
       round((sum(CASE WHEN cum_share < 0.8 THEN 1 ELSE 0 END) + 1) * 1.0
             / count(*), 6) AS concentration
FROM ranked
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# winsorized_value_stats — robust mean via percentile clamping
# ---------------------------------------------------------------------------


def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized statistics per event type: values clamped to the type's
    [p5, p95] before averaging — the robust-mean recipe that keeps a few
    fat-fingered outliers from dragging a monitoring metric. Thresholds
    come from one exact-percentile aggregate per type (tiny) joined back
    broadcast; the clamp is a pure Column expression. Complements
    ``mad_outliers`` (which FLAGS outliers) by showing the trimmed
    estimate itself.

    All means run over exact integer CENTS (value and the [p5,p95]
    bounds rounded to cents before clamping/summing), and the 4-dp
    rounding itself is EXACT-integer half-up ((2·100·Σc + n) div 2n):
    a cents mean can land exactly on a .00005 tie, where Spark rounds
    the shortest-decimal representation up but DuckDB rounds the binary
    double down (round-8 parity audit caught 23.17375 doing exactly
    this). Complete-case on event_type plus money_case on value — a
    NULL value has no clamp and its row would split n between engines,
    and a NaN/±Inf value raises on the cents cast in both (round-11
    value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    ev = money_case(_t(spark, sf_dir, "events"), "value").where(
        F.col("event_type").isNotNull()
    )
    cents = F.round(F.col("value") * 100).cast("long")
    thr = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)") * 100).cast("long").alias("_lo"),
        F.round(F.expr("percentile(value, 0.95)") * 100).cast("long").alias("_hi"),
    )
    clamped = (
        ev.join(F.broadcast(thr), "event_type")
        .select(
            "event_type",
            cents.alias("_c"),
            F.least(F.greatest(cents, F.col("_lo")), F.col("_hi")).alias("_w"),
        )
    )
    n_ = F.count(F.lit(1))
    agg = clamped.groupBy("event_type").agg(
        n_.alias("n_events"),
        F.sum("_c").alias("_sc"),
        F.sum("_w").alias("_sw"),
        F.sum((F.col("_c") != F.col("_w")).cast("long")).alias("_ncl"),
    )
    # values are non-negative, so div == floor == the half-up identity;
    # 200·Σcents stays under int64 up to ~4.6e16 cents per group
    return agg.selectExpr(
        "event_type",
        "n_events",
        "((200 * _sc + n_events) div (2 * n_events)) / 10000 AS raw_mean",
        "((200 * _sw + n_events) div (2 * n_events)) / 10000"
        " AS winsorized_mean",
        "((2000000 * _ncl + n_events) div (2 * n_events)) / 1000000"
        " AS clamped_ratio",
    ).orderBy("event_type")


SQL_WINSORIZED_VALUE_STATS = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, value
  FROM events WHERE event_type IS NOT NULL AND (isfinite(value) AND abs(value) < 9.2e16)
), thr AS (
  SELECT event_type,
         CAST(round(quantile_cont(value, 0.05) * 100) AS BIGINT) AS lo,
         CAST(round(quantile_cont(value, 0.95) * 100) AS BIGINT) AS hi
  FROM ev GROUP BY event_type
), clamped AS (
  SELECT e.event_type, e.c,
         least(greatest(e.c, t.lo), t.hi) AS w
  FROM ev e JOIN thr t ON e.event_type = t.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       ((200 * CAST(sum(c) AS BIGINT) + count(*)) // (2 * count(*)))
         / 10000 AS raw_mean,
       ((200 * CAST(sum(w) AS BIGINT) + count(*)) // (2 * count(*)))
         / 10000 AS winsorized_mean,
       ((2000000 * CAST(sum(CASE WHEN c <> w THEN 1 ELSE 0 END) AS BIGINT)
         + count(*)) // (2 * count(*))) / 1000000 AS clamped_ratio
FROM clamped
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# trade_reachability — native recursive CTE (Spark 4) BFS over the trade graph
# ---------------------------------------------------------------------------


def q_trade_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability from nation 0 over the DIRECTED trade graph
    (customer-nation → supplier-nation edges derived with the same early
    broadcast-reduce as ``nation_triangles``), via Spark 4's native
    WITH RECURSIVE — the declarative sibling of the engine's iterative
    operators (`nation_pagerank`, `neardup_components`), which remain the
    scale path when per-iteration checkpointing is needed. Hops are
    bounded (≤ 6) so UNION-dedup terminates on cyclic graphs; min hops
    per node is taken after the recursion, making the result
    path-independent and engine-portable."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    order_sn = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    edges = (
        order_sn.join(orders, order_sn.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("src"), "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    edges.createOrReplaceTempView("_trade_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
          SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
          UNION ALL
          SELECT e.dst AS node, r.hops + 1 AS hops
          FROM reach r JOIN _trade_edges e ON e.src = r.node
          WHERE r.hops < 3
        )
        SELECT CAST(node AS BIGINT) AS nationkey,
               CAST(min(hops) AS BIGINT) AS min_hops
        FROM reach
        GROUP BY node
        ORDER BY nationkey
        """
    )


SQL_TRADE_REACHABILITY = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
), reach(node, hops) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT e.dst AS node, r.hops + 1 AS hops
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT CAST(node AS BIGINT) AS nationkey,
       CAST(min(hops) AS BIGINT) AS min_hops
FROM reach
GROUP BY node
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# top_orders_lateral — correlated LATERAL subquery top-k per group
# ---------------------------------------------------------------------------


def q_top_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer through a correlated LATERAL subquery —
    the SQL-standard alternative to the row_number window for top-k per
    group (Catalyst rewrites the correlated limit into a ranked join, so
    the physical plan stays set-based — no per-customer re-execution).
    Summarized per market segment so the verified result is stable:
    customers with orders, and the total of their top-2 order values."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cust.createOrReplaceTempView("_lat_customer")
    orders.createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_top_orders,
               round(sum(t.o_totalprice), 2) AS top2_revenue
        FROM _lat_customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM _lat_orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
               LIMIT 2
             ) t
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


SQL_TOP_ORDERS_LATERAL = """
SELECT c.c_mktsegment,
       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_top_orders,
       round(sum(t.o_totalprice), 2) AS top2_revenue
FROM customer c,
     LATERAL (
       SELECT o_orderkey, o_totalprice
       FROM orders o
       WHERE o.o_custkey = c.c_custkey
       ORDER BY o_totalprice DESC, o_orderkey ASC
       LIMIT 2
     ) t
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


REGISTRY_EXT6 = {
    "median_orders": (q_median_orders, SQL_MEDIAN_ORDERS),
    "latest_event_argmax": (q_latest_event_argmax, SQL_LATEST_EVENT_ARGMAX),
    "nation_share_window": (q_nation_share_window, SQL_NATION_SHARE_WINDOW),
    "cumulative_unique_users": (
        q_cumulative_unique_users,
        SQL_CUMULATIVE_UNIQUE_USERS,
    ),
    "watermark_late_audit": (q_watermark_late_audit, SQL_WATERMARK_LATE_AUDIT),
    "nation_triangles": (q_nation_triangles, SQL_NATION_TRIANGLES),
    "ewma_daily_value": (q_ewma_daily_value, SQL_EWMA_DAILY_VALUE),
    "daily_trend_slope": (q_daily_trend_slope, SQL_DAILY_TREND_SLOPE),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "purchase_attribution": (q_purchase_attribution, SQL_PURCHASE_ATTRIBUTION),
    "brand_pareto": (q_brand_pareto, SQL_BRAND_PARETO),
    "winsorized_value_stats": (q_winsorized_value_stats, SQL_WINSORIZED_VALUE_STATS),
    "trade_reachability": (q_trade_reachability, SQL_TRADE_REACHABILITY),
    "top_orders_lateral": (q_top_orders_lateral, SQL_TOP_ORDERS_LATERAL),
}
