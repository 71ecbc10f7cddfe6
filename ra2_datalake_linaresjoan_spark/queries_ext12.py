"""Relational batch 12 (round 3 continuation): SCD2 time travel and
linear multi-touch attribution.

- ``time_travel_scd2`` answers "what did the world look like at T?"
  against the SCD2 episode table ``operators/scd2.scd2_history`` builds —
  the point-in-time read every warehouse with slowly-changing dimensions
  needs (Delta time travel reads a snapshot by version; SCD2 time travel
  reads one by PREDICATE, so it works on any engine and any storage).
  The as-of filter is two pushdown-friendly comparisons, no join.
- ``linear_attribution`` distributes each purchase's credit EQUALLY over
  the user's prior click/view touches (multi-touch, complementing the
  last-touch ``purchase_attribution``). Per-purchase credit shares are
  computed from the same strictly-preceding window counts
  ``feature_store_pit`` uses — one user-keyed shuffle, no
  purchase×touch pair explosion — and are summed as INTEGER micro-credits
  (round(1e6·share)) so the totals are partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

_ASOF_TS = "2024-01-15 12:00:00"


# ---------------------------------------------------------------------------
# time_travel_scd2 — point-in-time read over the episode table
# ---------------------------------------------------------------------------


def q_time_travel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct every user's state as of 2024-01-15 12:00 UTC from the
    SCD2 episode table (change feed = each user's event-type stream,
    episodes collapsed by ``scd2_history``): the as-of row is the episode
    with valid_from ≤ T < valid_to (null-open upper bound). Output:
    users per as-of state plus min/max user ids as an identity checksum.
    The point-in-time SELECT is two comparisons the scan can push down —
    at 100 TB you'd partition the episode table by valid_from month and
    prune; no join, no window at read time."""
    from ra2_datalake_linaresjoan_spark.operators.scd2 import scd2_history

    ev = _t(spark, sf_dir, "events")
    hist = scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id"),
        key="user_id",
        state="event_type",
        ts="ts",
        tiebreak="event_id",
    )
    t = F.lit(_ASOF_TS).cast("timestamp")
    asof = hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    return (
        asof.groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("state")
    )


SQL_TIME_TRAVEL_SCD2 = f"""
WITH changed AS (
  -- complete-case on (state, ts, tiebreak) in lockstep with
  -- operators/scd2.scd2_history's round-10 input contract (a NULL-ts
  -- row would order on OPPOSITE ends per engine; NULL keys keep their
  -- own group on both)
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_state,
         event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), episodes AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changed
  WHERE prev_state IS NULL OR prev_state <> event_type
), pit AS (
  SELECT * FROM episodes
  WHERE valid_from <= TIMESTAMP '{_ASOF_TS}'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_TS}')
)
SELECT state,
       CAST(count(*) AS BIGINT) AS n_users,
       min(user_id) AS min_user,
       max(user_id) AS max_user
FROM pit GROUP BY state ORDER BY state
"""


# ---------------------------------------------------------------------------
# linear_attribution — equal-credit multi-touch attribution
# ---------------------------------------------------------------------------


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits one unit of
    credit equally across the user's clicks and views STRICTLY BEFORE
    it. Per-purchase type shares come from the same strictly-preceding
    window counts as ``feature_store_pit`` (one user shuffle — never a
    purchase×touch join), and each share is banked as an integer
    micro-credit (round(1e6·count/total)), so the grand totals are
    exact BIGINT sums, partition-order-invariant. Purchases with no
    prior touch credit 'unattributed'."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    clicks = F.coalesce(
        F.sum((F.col("event_type") == "click").cast("long")).over(w), F.lit(0)
    )
    views = F.coalesce(
        F.sum((F.col("event_type") == "view").cast("long")).over(w), F.lit(0)
    )
    p = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .select(
            "event_type",
            clicks.alias("nc"),
            views.alias("nv"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("nc", "nv", (F.col("nc") + F.col("nv")).alias("tot"))
    )
    micro = lambda n: F.when(  # noqa: E731
        F.col("tot") > 0, F.round(F.lit(1_000_000) * n / F.col("tot")).cast("long")
    ).otherwise(F.lit(0))
    credits = p.select(
        micro(F.col("nc")).alias("click_micro"),
        micro(F.col("nv")).alias("view_micro"),
        (F.col("tot") == 0).cast("long").alias("unattributed"),
    )
    return credits.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("click_micro").alias("click_credit_micro"),
        F.sum("view_micro").alias("view_credit_micro"),
        F.sum("unattributed").alias("n_unattributed"),
    )


SQL_LINEAR_ATTRIBUTION = """
WITH p AS (
  SELECT event_type,
    COALESCE(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      OVER w AS BIGINT), 0) AS nc,
    COALESCE(CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      OVER w AS BIGINT), 0) AS nv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), credits AS (
  SELECT CASE WHEN nc + nv > 0
              THEN CAST(round(1000000 * nc / CAST(nc + nv AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS click_micro,
         CASE WHEN nc + nv > 0
              THEN CAST(round(1000000 * nv / CAST(nc + nv AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS view_micro,
         CASE WHEN nc + nv = 0 THEN 1 ELSE 0 END AS unattributed
  FROM p WHERE event_type = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(click_micro) AS BIGINT) AS click_credit_micro,
       CAST(sum(view_micro) AS BIGINT) AS view_credit_micro,
       CAST(sum(unattributed) AS BIGINT) AS n_unattributed
FROM credits
"""


REGISTRY_EXT12 = {
    "time_travel_scd2": (q_time_travel_scd2, SQL_TIME_TRAVEL_SCD2),
    "linear_attribution": (q_linear_attribution, SQL_LINEAR_ATTRIBUTION),
}
