"""Batch 39 (round 9): the two composition queries the round-8 verdict
graded as grounded next steps — each assembles already-verified halves
into a production operation.

- ``ab_value_drift_ks`` — two-POPULATION KS drift (variant A vs B by
  the deterministic ``user_id % 2`` assignment ``ab_test_readout``
  uses) through the same 256-bucket equi-width histogram sketch and
  exact-integer kernel as ``quantile_drift_detect``
  (``streaming.sketches.ks_from_joint``). Where quantile_drift splits
  one stream by TIME, this splits it by EXPERIMENT ARM — the
  metric-drift guardrail an A/B readout pairs with: a significant KS
  on the value distribution flags a treatment effect (or an SRM-like
  corruption) that a mean-only readout can miss. One histogram scan;
  the joint table is ≤256 rows at any corpus size.
- ``cdc_scd2_apply_audit`` — incremental CDC apply onto an SCD2
  episode table (``operators/scd2.scd2_apply``), audited against the
  one-shot rebuild: the event history splits into three arrival
  batches at exact-integer time terciles, batch 1 seeds the episode
  table, batches 2 and 3 apply incrementally (touching only OPEN
  episodes — the invariant that makes CDC apply O(batch), not
  O(history)), and the result must equal ``scd2_history`` over the
  full feed row-for-row (exceptAll both ways = 0). This is the MERGE
  pattern a type-2 warehouse dimension runs on every load; composes
  ``merge_upsert_audit``'s delta-apply accounting with the SCD2
  operator ``asof_join`` reads.

Reference parity note: the reference engine loads dimensions
current-state-only (loader_NeonDB.py load_all) — both queries are part
of the warehouse/LLM extension surface, with the registry's
exact-oracle gate applied as everywhere else (the equality audit pins
booleans/zeros the oracle can state exactly, the approx_quantile /
hll_daily_union convention).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t
from ra2_datalake_linaresjoan_spark.queries_ext38 import (
    _QD_BUCKETS,
    _QD_HI,
    _QD_LO,
    _QD_THRESH,
)

# ---------------------------------------------------------------------------
# ab_value_drift_ks — per-arm value-distribution drift through the sketch
# ---------------------------------------------------------------------------


def q_ab_value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: KS distance between the event-value distributions of
    experiment arms A (user_id % 2 = 0) and B (= 1), through the
    256-bucket equi-width histogram sketch and the shared exact-integer
    kernel ``ks_from_joint`` (DECIMAL(38,0)-widened cross-products,
    division-last, NULL on an empty arm).

    ONE corpus scan builds the joint histogram with both arms as
    conditional counts per bucket; the ≤256-row joint table is
    localCheckpointed so the kernel's two branches (totals + cumulative
    window) read the bounded table instead of re-scanning events.
    Complete-case on user_id plus finite_case on value in lockstep with
    the oracle — no id means no arm, and only a finite value has a
    bucket (NaN defeats the clamp differently per engine — round-11
    value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import finite_case
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        ks_from_joint,
        quantile_bucket,
    )

    vals = (
        finite_case(_t(spark, sf_dir, "events"), "value")
        .where(F.col("user_id").isNotNull())
        .select((F.col("user_id") % 2 == 0).alias("is_a"), "value")
    )
    joint = (
        vals.select(
            quantile_bucket("value", _QD_LO, _QD_HI, _QD_BUCKETS).alias(
                "bucket"
            ),
            F.col("is_a").cast("long").alias("is_a"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_a").alias("na"),
            F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
        )
        .localCheckpoint()
    )
    out = ks_from_joint(joint)
    return out.select(
        "n_a",
        "n_b",
        "ks_d",
        "argmax_bucket",
        F.when(F.col("ks_d").isNotNull(), F.col("ks_d") > _QD_THRESH).alias(
            "drifted"
        ),
    )


SQL_AB_VALUE_DRIFT_KS = f"""
WITH vals AS (
  SELECT user_id % 2 = 0 AS is_a, value FROM events
  WHERE user_id IS NOT NULL AND isfinite(value)
), joint AS (
  SELECT CAST(least({_QD_BUCKETS - 1}, greatest(0,
           floor((value - {_QD_LO!r}) * {_QD_BUCKETS}
                 / {_QD_HI - _QD_LO!r}))) AS INT) AS bucket,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
  FROM vals GROUP BY 1
), tot AS (
  SELECT CAST(coalesce(sum(na), 0) AS BIGINT) AS na_tot,
         CAST(coalesce(sum(nb), 0) AS BIGINT) AS nb_tot
  FROM joint
), cum AS (
  SELECT bucket,
         CAST(sum(na) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cuma,
         CAST(sum(nb) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cumb
  FROM joint
), best AS (
  -- HUGEINT products mirror the engine's DECIMAL(38,0) widening
  SELECT bucket,
         abs(cuma * CAST(nb_tot AS HUGEINT)
             - cumb * CAST(na_tot AS HUGEINT)) AS gnum,
         na_tot, nb_tot
  FROM cum, tot
  ORDER BY gnum DESC, bucket LIMIT 1
)
SELECT na_tot AS n_a, nb_tot AS n_b,
       round(CASE WHEN na_tot = 0 OR nb_tot = 0 THEN NULL
             ELSE gnum * 1.0 / (CAST(na_tot AS HUGEINT) * nb_tot) END, 6)
         AS ks_d,
       bucket AS argmax_bucket,
       round(CASE WHEN na_tot = 0 OR nb_tot = 0 THEN NULL
             ELSE gnum * 1.0 / (CAST(na_tot AS HUGEINT) * nb_tot) END, 6)
         > {_QD_THRESH!r} AS drifted
FROM best
"""


# ---------------------------------------------------------------------------
# cdc_scd2_apply_audit — incremental episode apply == one-shot rebuild
# ---------------------------------------------------------------------------


def q_cdc_scd2_apply_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row auditing the incremental CDC→SCD2 apply path: the event
    feed (key = user_id, state = event_type, order = ts/event_id)
    splits into three arrival batches at exact-integer time terciles;
    ``scd2_history`` builds the episode table from batch 1 and
    ``scd2_apply`` merges batches 2 and 3 incrementally — each apply
    touches only OPEN episodes plus the batch (the O(batch) CDC
    contract), never the closed history. The audit proves the
    incremental table equals the one-shot rebuild ROW-FOR-ROW
    (``exceptAll`` both directions — sym_diff = 0, episodes_match) and
    reports the episode/key/open counts the oracle derives
    independently via the gaps-and-islands window.

    Complete-case on (user_id, event_type, ts, event_id) in lockstep —
    an episode needs a key, a state, and a deterministic position."""
    from ra2_datalake_linaresjoan_spark.operators.scd2 import (
        scd2_apply,
        scd2_history,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("_us", F.unix_micros("ts"))
    )
    span = ev.agg(F.min("_us").alias("lo"), F.max("_us").alias("hi"))
    third = F.floor((F.col("hi") - F.col("lo")) / F.lit(3)).cast("long")
    bounded = ev.crossJoin(F.broadcast(span)).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        ((F.col("_us") - F.col("lo")) >= third).alias("_past1"),
        ((F.col("_us") - F.col("lo")) >= 2 * third).alias("_past2"),
    )
    b1 = bounded.where(~F.col("_past1")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    b2 = bounded.where(F.col("_past1") & ~F.col("_past2")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    b3 = bounded.where(F.col("_past2")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    inc = scd2_apply(
        scd2_apply(
            scd2_history(b1, "user_id", "event_type", "ts", "event_id"),
            b2, "user_id", "event_type", "ts", "event_id",
        ),
        b3, "user_id", "event_type", "ts", "event_id",
    ).localCheckpoint()
    full = scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id",
    ).localCheckpoint()
    # coalesce: sum over ZERO episodes (a fully-dirty feed) is NULL in
    # Spark while the oracle's count() is 0 (round-10 review — same
    # class fixed in scd2_stream_sink_audit)
    full_stats = full.agg(
        F.countDistinct("user_id").alias("n_keys"),
        F.count(F.lit(1)).alias("n_episodes"),
        F.coalesce(
            F.sum(F.col("is_current").cast("long")), F.lit(0).cast("long")
        ).alias("n_open"),
    )
    inc_stats = inc.agg(
        F.count(F.lit(1)).alias("n_episodes_incremental")
    )
    sym = (
        full.exceptAll(inc)
        .unionByName(inc.exceptAll(full))
        .agg(F.count(F.lit(1)).alias("sym_diff"))
    )
    return (
        full_stats.crossJoin(inc_stats)
        .crossJoin(sym)
        .select(
            "n_keys",
            "n_episodes",
            "n_open",
            "n_episodes_incremental",
            "sym_diff",
            (F.col("sym_diff") == 0).alias("episodes_match"),
        )
    )


SQL_CDC_SCD2_APPLY_AUDIT = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
), ch AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM ev
), ep AS (
  SELECT user_id FROM ch WHERE prev IS NULL OR prev <> event_type
)
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
       CAST(count(*) AS BIGINT) AS n_episodes,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_open,
       CAST(count(*) AS BIGINT) AS n_episodes_incremental,
       CAST(0 AS BIGINT) AS sym_diff,
       TRUE AS episodes_match
FROM ep
"""


REGISTRY_EXT39: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "ab_value_drift_ks": (q_ab_value_drift_ks, SQL_AB_VALUE_DRIFT_KS),
    "cdc_scd2_apply_audit": (q_cdc_scd2_apply_audit, SQL_CDC_SCD2_APPLY_AUDIT),
}
