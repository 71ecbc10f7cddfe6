"""Relational batch 18 (round 4 cont.): survival analysis and dedup
impact attribution.

- ``session_survival_curve`` — the survival/retention read of the
  gaps-and-islands sessionizer: for duration thresholds {1, 5, 15, 60}
  minutes, how many sessions survive at least that long and what share
  of all sessions that is. Durations are exact microsecond integers
  (same µs-gap discipline as ``session_islands``); the threshold sweep
  is an in-row explode over the SESSION-grain aggregate, so the event
  table shuffles once on user_id and everything after is
  session-cardinality.
- ``dup_inflation_by_source`` — dedup impact attribution: per source,
  how many docs are exact-duplicate copies of an earlier doc (min-id
  survivor convention, corpus-wide fingerprint groups) and the token
  inflation they carry. The per-source read of what
  ``exact_dedup_docs`` decides globally — the number that tells a
  curation owner WHICH feed to fix. One fingerprint shuffle + one
  source aggregate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

_SURV_MINS = (1, 5, 15, 60)


def q_session_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration survival curve over 30-min-gap sessions:
    (threshold_min, n_sessions_total, n_surviving, survival_share)."""
    ev = _t(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_ord))
    is_break = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        ev.withColumn("session_no", F.sum(is_break).over(w_run))
        .groupBy("user_id", "session_no")
        .agg(
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
                "dur_us"
            )
        )
    )
    total = sessions.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sessions.select(
            "dur_us",
            F.explode(F.array(*[F.lit(m) for m in _SURV_MINS])).alias(
                "threshold_min"
            ),
        )
        .filter(
            # cast first: 60 min * 60e6 µs overflows 32-bit int literals
            F.col("dur_us")
            >= F.col("threshold_min").cast("long") * F.lit(60_000_000).cast("long")
        )
        .groupBy("threshold_min")
        .agg(F.count(F.lit(1)).alias("n_surviving"))
        .crossJoin(F.broadcast(total))
        .select(
            "threshold_min",
            F.col("n_total").alias("n_sessions_total"),
            "n_surviving",
            F.round(F.col("n_surviving") / F.col("n_total"), 6).alias(
                "survival_share"
            ),
        )
        .orderBy("threshold_min")
    )


SQL_SESSION_SURVIVAL_CURVE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL '1800 seconds' THEN 0 ELSE 1 END
           AS is_break
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
  FROM flagged
), sessions AS (
  SELECT user_id, session_no,
         CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
  FROM numbered GROUP BY user_id, session_no
), total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sessions)
SELECT CAST(t.threshold_min AS INT) AS threshold_min,
       CAST(any_value(total.n_total) AS BIGINT) AS n_sessions_total,
       CAST(count(*) AS BIGINT) AS n_surviving,
       round(count(*) * 1.0 / any_value(total.n_total), 6) AS survival_share
FROM sessions
CROSS JOIN (SELECT unnest([1, 5, 15, 60]) AS threshold_min) t
CROSS JOIN total
WHERE dur_us >= CAST(t.threshold_min AS BIGINT) * 60000000
GROUP BY t.threshold_min
ORDER BY threshold_min
"""


def q_dup_inflation_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate inflation: a doc is a redundant COPY
    when a smaller-id doc anywhere in the corpus shares its md5
    fingerprint. Reports per source: docs, redundant copies, copy rate,
    and the wasted whitespace-token count those copies carry.

    NULL-text docs all share fp = md5(NULL) = NULL — unrelated failed
    extractions must never count as copies of each other, so is_copy
    requires a NON-NULL fingerprint (lockstep on both engines). An
    empty/whitespace-only text counts 0 tokens, not the 1 that
    split-of-empty-string yields in both engines."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("fp"),
        F.when(F.length(F.trim("text")) == 0, 0)
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tok"),
    )
    w = Window.partitionBy("fp")
    flagged = keyed.select(
        "source",
        "n_tok",
        (
            F.col("fp").isNotNull()
            & (F.col("doc_id") > F.min("doc_id").over(w))
        ).alias("is_copy"),
    )
    # CASE-ELSE-0, never a bare boolean cast (round-10 dirty audit): a
    # NULL-id doc's is_copy is NULL (no identity, no copy evidence) and
    # a group of ONLY such docs summed to NULL in Spark while the
    # oracle's CASE-ELSE-0 yielded 0
    n_copies = F.sum(F.when(F.col("is_copy"), 1).otherwise(0)).cast("long")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_copies.alias("n_copies"),
            F.round(n_copies / F.count(F.lit(1)), 6).alias("copy_rate"),
            F.sum(F.when(F.col("is_copy"), F.col("n_tok")).otherwise(0)).alias(
                "wasted_tokens"
            ),
        )
        .orderBy("source")
    )


SQL_DUP_INFLATION_BY_SOURCE = r"""
WITH keyed AS (
  SELECT doc_id, source, md5(text) AS fp,
         CASE WHEN len(trim(text, ' ')) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) END AS n_tok
  FROM documents
), flagged AS (
  SELECT source, n_tok,
         fp IS NOT NULL AND doc_id > min(doc_id) OVER (PARTITION BY fp)
           AS is_copy
  FROM keyed
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_copy THEN 1 ELSE 0 END) AS BIGINT) AS n_copies,
       round(sum(CASE WHEN is_copy THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS copy_rate,
       CAST(sum(CASE WHEN is_copy THEN n_tok ELSE 0 END) AS BIGINT)
         AS wasted_tokens
FROM flagged
GROUP BY source
ORDER BY source
"""


REGISTRY_EXT18: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "session_survival_curve": (q_session_survival_curve, SQL_SESSION_SURVIVAL_CURVE),
    "dup_inflation_by_source": (q_dup_inflation_by_source, SQL_DUP_INFLATION_BY_SOURCE),
}
