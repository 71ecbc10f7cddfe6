"""Batch 29 (round 6): decision-statistics layer — multiple-testing
control, score calibration, and experiment power planning.

- ``bh_fdr_daily_anomalies`` — Benjamini–Hochberg FDR (q = 0.10) over
  the per-(event_type, day) daily-count anomaly p-values: WHICH of the
  many anomaly alerts survive multiple-testing control — the principled
  layer on top of the raw |z| > 2 flags ``event_rate_anomaly`` emits.
  z comes from exact per-type integer moments; the normal tail is the
  Abramowitz–Stegun 7.1.26 erf polynomial (max abs error 1.5e-7) —
  pure closed-form double arithmetic, so both engines produce
  bit-identical p-values and the step-up rank threshold can never
  disagree. All windows run over the (types × days)-bounded table.
- ``score_calibration_bins`` — reliability profile of n_chars as a
  lang = 'en' classifier score: per fixed-width score bin, the
  empirical positive rate with its Wilson 95 % interval — the
  calibration view that complements ``auc_quality_score``'s ranking
  view (a score can rank well and still be uncalibrated). Integer bin
  key (DIV), exact integer counts, in-row Wilson closed form.
- ``power_analysis_arms`` — two-proportion power planning for the
  user_id % 2 experiment ``ab_test_readout`` reads out: the required
  per-arm sample size to detect the OBSERVED conversion lift at
  α = 0.05 / power = 0.8, and whether the current arms already meet
  it. One user-grain aggregate + a 2-row arm roll-up; the closed form
  uses fixed z constants and exact (conversions, n) integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

# Abramowitz–Stegun 7.1.26 erf approximation constants (shared verbatim
# with the SQL oracle — the parity contract is "identical expression,
# identical doubles", not "mathematically equivalent").
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_SQRT2 = 1.4142135623730951

_BH_Q = 0.10
_BH_TOP = 20


def _phi_tail_col(x: Column) -> Column:
    """2·(1 − Φ(x)) for x ≥ 0 via the A&S erf polynomial: the two-sided
    normal p-value of a |z| statistic."""
    z = x / F.lit(_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * z)
    poly = F.lit(0.0)
    for k in range(len(_AS_A) - 1, -1, -1):
        poly = (poly + F.lit(_AS_A[k])) * t
    erf = F.lit(1.0) - poly * F.exp(-z * z)
    return F.lit(1.0) - erf


def _d(v: float) -> str:
    """A float constant as an explicit DOUBLE literal — DuckDB parses
    bare decimal literals as DECIMAL, whose exact intermediate
    arithmetic can drift a ulp from Spark's all-double evaluation."""
    return f"CAST({v!r} AS DOUBLE)"


def _phi_tail_sql(x: str) -> str:
    z = f"(({x}) / {_d(_SQRT2)})"
    t = f"({_d(1.0)} / ({_d(1.0)} + {_d(_AS_P)} * {z}))"
    poly = _d(0.0)
    for k in range(len(_AS_A) - 1, -1, -1):
        poly = f"(({poly} + {_d(_AS_A[k])}) * {t})"
    return f"({_d(1.0)} - ({_d(1.0)} - {poly} * exp(-{z} * {z})))"


def q_bh_fdr_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most anomalous (event_type, day) daily counts by two-sided
    normal p-value, each with its BH rank, step-up threshold rank·q/m,
    and whether it survives FDR control at q = 0.10. The BH cutoff k*
    (largest rank whose p ≤ rank·q/m) is computed over ALL m hypotheses
    via a full-frame window on the bounded (type, day) table; the
    listed rows are the p-ascending head."""
    # ts IS NOT NULL in lockstep (round-9 review): a NULL-day hypothesis
    # ties with real days at equal counts, and the engines break the
    # (p, type, day) rank tie at opposite ends (Spark orders NULL day
    # FIRST, DuckDB LAST) — bh_rank and the top-20 cut then diverge
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # sentinel for NULL types: the per-type stats equi-join silently
    # dropped NULL-type hypotheses from the family (m undercounted ->
    # every BH threshold loosened) while both engines agreed
    daily = ev.groupBy(
        F.coalesce(F.col("event_type"), F.lit("<null>")).alias("event_type"),
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s1") / F.col("d")
    var = F.col("s2") / F.col("d") - mean * mean
    z = F.abs((F.col("c") - mean) / F.sqrt(var))
    scored = (
        daily.join(m, "event_type")
        .filter(var > 0)
        .select(
            "event_type",
            "day",
            "c",
            z.alias("z"),
            _phi_tail_col(z).alias("p"),
        )
    )
    w_rank = Window.orderBy("p", "event_type", "day")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.select(
        "event_type",
        "day",
        "c",
        "z",
        "p",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m_tests"),
    )
    ranked = ranked.withColumn(
        "k_star",
        F.max(
            F.when(
                F.col("p")
                <= F.col("rk") * F.lit(_BH_Q) / F.col("m_tests"),
                F.col("rk"),
            ).otherwise(0)
        ).over(w_all),
    )
    return (
        ranked.select(
            "event_type",
            "day",
            "c",
            F.round("z", 4).alias("z"),
            F.round("p", 6).alias("p_value"),
            F.col("rk").alias("bh_rank"),
            "m_tests",
            F.round(
                F.col("rk") * F.lit(_BH_Q) / F.col("m_tests"), 6
            ).alias("bh_threshold"),
            (F.col("rk") <= F.col("k_star")).alias("discovered"),
        )
        .orderBy("bh_rank")
        .limit(_BH_TOP)
    )


SQL_BH_FDR_DAILY_ANOMALIES = f"""
WITH daily AS (
  SELECT coalesce(event_type, '<null>') AS event_type,
         CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY 1
), scored AS (
  SELECT daily.event_type, day, c,
         abs((c - s1 * 1.0 / d)
             / sqrt(s2 * 1.0 / d - (s1 * 1.0 / d) * (s1 * 1.0 / d))) AS z
  FROM daily JOIN m USING (event_type)
  WHERE s2 * 1.0 / d - (s1 * 1.0 / d) * (s1 * 1.0 / d) > 0
), pvals AS (
  SELECT event_type, day, c, z, {_phi_tail_sql("z")} AS p
  FROM scored
), ranked AS (
  SELECT event_type, day, c, z, p,
         row_number() OVER (ORDER BY p, event_type, day) AS rk,
         CAST(count(*) OVER (ROWS BETWEEN UNBOUNDED PRECEDING
              AND UNBOUNDED FOLLOWING) AS BIGINT) AS m_tests
  FROM pvals
), cut AS (
  SELECT *,
         CAST(max(CASE WHEN p <= rk * {_d(_BH_Q)} / m_tests THEN rk ELSE 0 END)
              OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS k_star
  FROM ranked
)
SELECT event_type, day, c, round(z, 4) AS z, round(p, 6) AS p_value,
       CAST(rk AS BIGINT) AS bh_rank, m_tests,
       round(rk * {_d(_BH_Q)} / m_tests, 6) AS bh_threshold,
       rk <= k_star AS discovered
FROM cut
ORDER BY bh_rank
LIMIT {_BH_TOP}
"""


# ---------------------------------------------------------------------------
# score_calibration_bins — reliability profile with Wilson intervals
# ---------------------------------------------------------------------------

_SCB_WIDTH = 64
_SCB_Z = 1.959963984540054  # Phi^-1(0.975)


def q_score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (score bin, 64 chars wide): docs, empirical P(lang = 'en'),
    and the Wilson 95 % interval — does the length score's positive
    rate actually rise with the score (calibration), not just rank well
    (AUC)? Integer bin keys and counts; Wilson is an in-row closed form
    of (pos, n)."""
    docs = _t(spark, sf_dir, "documents")
    b = docs.groupBy(
        (F.col("n_chars") - (F.col("n_chars") % _SCB_WIDTH)).alias("bin_lo")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # when/otherwise(0): NULL lang counts 0 like the oracle's CASE
        # ELSE 0 (a bare boolean cast poisons an all-NULL group to NULL)
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long")
        ).alias("pos"),
    )
    z2 = _SCB_Z * _SCB_Z
    p = F.col("pos") / F.col("n")
    denom = F.lit(1.0) + F.lit(z2) / F.col("n")
    center = (p + F.lit(z2) / (2 * F.col("n"))) / denom
    half = (
        F.lit(_SCB_Z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / F.col("n")
            + F.lit(z2) / (4 * F.col("n") * F.col("n"))
        )
        / denom
    )
    return b.select(
        "bin_lo",
        "n",
        "pos",
        F.round(p, 6).alias("pos_rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("bin_lo")


SQL_SCORE_CALIBRATION_BINS = f"""
WITH b AS (
  SELECT n_chars - (n_chars % {_SCB_WIDTH}) AS bin_lo,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM documents GROUP BY 1
)
SELECT bin_lo, n, pos,
       round(pos * 1.0 / n, 6) AS pos_rate,
       round(((pos * 1.0 / n) + {_d(_SCB_Z * _SCB_Z)} / (2 * n)
              - {_d(_SCB_Z)} * sqrt((pos * 1.0 / n) * (1.0 - pos * 1.0 / n) / n
                                  + {_d(_SCB_Z * _SCB_Z)} / (4.0 * n * n)))
             / (1.0 + {_d(_SCB_Z * _SCB_Z)} / n), 6) AS wilson_lo,
       round(((pos * 1.0 / n) + {_d(_SCB_Z * _SCB_Z)} / (2 * n)
              + {_d(_SCB_Z)} * sqrt((pos * 1.0 / n) * (1.0 - pos * 1.0 / n) / n
                                  + {_d(_SCB_Z * _SCB_Z)} / (4.0 * n * n)))
             / (1.0 + {_d(_SCB_Z * _SCB_Z)} / n), 6) AS wilson_hi
FROM b
ORDER BY bin_lo
"""


# ---------------------------------------------------------------------------
# power_analysis_arms — two-proportion sample-size planning
# ---------------------------------------------------------------------------

_PA_Z_ALPHA = 1.959963984540054  # Phi^-1(0.975): alpha = 0.05 two-sided
_PA_Z_BETA = 0.8416212335729143  # Phi^-1(0.80): power = 0.8
_PA_HEAVY = 13  # conversion = strictly more purchases than this


def q_power_analysis_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-arm users and conversions (user_id % 2 assignment;
    conversion = HEAVY purchaser, > 13 purchase events — the ≥1-purchase
    definition ``ab_test_readout`` uses saturates at 100 % on this
    corpus, leaving a zero lift and nothing to power), the observed
    lift, the required per-arm n to detect THAT lift at α = 0.05 /
    power = 0.8 (two-proportion closed form), and whether the current
    arms already meet it (null lift → null plan). One user-grain
    aggregate, one 2-row roll-up; floats only in the final closed form
    over exact integers."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long"))
            > _PA_HEAVY
        )
        .cast("int")
        .alias("conv")
    )
    arms = users.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0") / F.col("n0")
    p1 = F.col("x1") / F.col("n1")
    pbar = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    delta = F.abs(p0 - p1)
    n_req = F.when(
        delta > 0,
        F.ceil(
            F.pow(
                F.lit(_PA_Z_ALPHA)
                * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar))
                + F.lit(_PA_Z_BETA)
                * F.sqrt(
                    p0 * (F.lit(1.0) - p0) + p1 * (F.lit(1.0) - p1)
                ),
                F.lit(2.0),
            )
            / (delta * delta)
        ).cast("long"),
    )
    return wide.select(
        "n0",
        "x0",
        "n1",
        "x1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(delta, 6).alias("observed_lift"),
        n_req.alias("n_required_per_arm"),
        (F.least(F.col("n0"), F.col("n1")) >= n_req).alias("powered_now"),
    )


SQL_POWER_ANALYSIS_ARMS = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > {_PA_HEAVY} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
), arms AS (
  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS x
  FROM users GROUP BY 1
), wide AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 0 THEN x END) AS x0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 1 THEN x END) AS x1
  FROM arms
), calc AS (
  SELECT n0, x0, n1, x1,
         x0 * 1.0 / n0 AS p0, x1 * 1.0 / n1 AS p1,
         (x0 + x1) * 1.0 / (n0 + n1) AS pbar,
         abs(x0 * 1.0 / n0 - x1 * 1.0 / n1) AS delta
  FROM wide
)
SELECT n0, x0, n1, x1,
       round(p0, 6) AS p0, round(p1, 6) AS p1,
       round(delta, 6) AS observed_lift,
       CASE WHEN delta > 0 THEN
         CAST(ceil(pow({_d(_PA_Z_ALPHA)} * sqrt(2.0 * pbar * (1.0 - pbar))
                       + {_d(_PA_Z_BETA)} * sqrt(p0 * (1.0 - p0)
                                               + p1 * (1.0 - p1)), 2.0)
                   / (delta * delta)) AS BIGINT)
       END AS n_required_per_arm,
       CASE WHEN delta > 0 THEN
         least(n0, n1) >= CAST(ceil(pow({_d(_PA_Z_ALPHA)}
                       * sqrt(2.0 * pbar * (1.0 - pbar))
                       + {_d(_PA_Z_BETA)} * sqrt(p0 * (1.0 - p0)
                                               + p1 * (1.0 - p1)), 2.0)
                   / (delta * delta)) AS BIGINT)
       END AS powered_now
FROM calc
"""


REGISTRY_EXT29: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "bh_fdr_daily_anomalies": (
        q_bh_fdr_daily_anomalies,
        SQL_BH_FDR_DAILY_ANOMALIES,
    ),
    "score_calibration_bins": (
        q_score_calibration_bins,
        SQL_SCORE_CALIBRATION_BINS,
    ),
    "power_analysis_arms": (q_power_analysis_arms, SQL_POWER_ANALYSIS_ARMS),
}
