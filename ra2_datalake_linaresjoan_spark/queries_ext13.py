"""Relational batch 13 (round 3 continuation): experiment analysis and
binless distribution drift.

- ``ab_test_readout`` is the experimentation readout: per deterministic
  variant (user_id parity), user-level conversion (≥1 purchase) with a
  Wilson 95% score interval. The interval is a single in-row IEEE
  expression over exact integer counts (division + ``sqrt`` — both
  correctly-rounded ops, so cross-engine bit-stable; no ``ln``/``erf``).
- ``ks_distance`` computes the exact two-sample Kolmogorov-Smirnov
  statistic between two sources' quality-proxy distributions — the
  BINLESS drift test complementing the binned ``psi_drift``. D = max
  |CDF_a − CDF_b| over the pooled support: one sort-window over the
  value-level aggregate (values, not rows — the support is
  vocabulary-sized), cumulative counts as exact integers, the CDF gap
  an in-row rational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# ab_test_readout — user-level conversion + Wilson interval per variant
# ---------------------------------------------------------------------------


def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant (user_id mod 2 — the deterministic assignment an
    experiment framework would persist) user-level conversion: a user
    converts when they have ≥1 purchase event. One user-grain aggregate
    (the same shuffle sessionization uses), one variant-grain roll-up,
    then the Wilson 95% score interval computed in-row from the exact
    (conversions, n) integers — the safe small-sample interval, and
    engine-bit-stable because it only uses division and sqrt. Rounded at
    6 dp.

    NULL user ids are filtered in lockstep with the oracle (no id = no
    variant assignment), and a non-purchase/NULL event counts 0 via
    when/otherwise — a bare boolean cast would poison the max to NULL
    for users whose types are all NULL (round-8 parity audit)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    g = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    z = F.lit(1.959963984540054)  # 97.5th normal quantile, fixed constant
    p = F.col("n_converted") / F.col("n_users")
    n = F.col("n_users")
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return g.select(
        "variant",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("conversion"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("variant")


SQL_AB_TEST_READOUT = """
WITH users AS (
  SELECT user_id % 2 AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), g AS (
  SELECT variant,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM users GROUP BY variant
)
SELECT variant, n_users, n_converted,
       round(n_converted / CAST(n_users AS DOUBLE), 6) AS conversion,
       round(((n_converted / CAST(n_users AS DOUBLE))
              + 1.959963984540054 * 1.959963984540054 / (2 * n_users))
             / (1 + 1.959963984540054 * 1.959963984540054 / n_users)
             - (1.959963984540054
                / (1 + 1.959963984540054 * 1.959963984540054 / n_users))
               * sqrt((n_converted / CAST(n_users AS DOUBLE))
                      * (1 - n_converted / CAST(n_users AS DOUBLE)) / n_users
                      + 1.959963984540054 * 1.959963984540054
                        / (4 * n_users * n_users)), 6) AS wilson_lo,
       round(((n_converted / CAST(n_users AS DOUBLE))
              + 1.959963984540054 * 1.959963984540054 / (2 * n_users))
             / (1 + 1.959963984540054 * 1.959963984540054 / n_users)
             + (1.959963984540054
                / (1 + 1.959963984540054 * 1.959963984540054 / n_users))
               * sqrt((n_converted / CAST(n_users AS DOUBLE))
                      * (1 - n_converted / CAST(n_users AS DOUBLE)) / n_users
                      + 1.959963984540054 * 1.959963984540054
                        / (4 * n_users * n_users)), 6) AS wilson_hi
FROM g ORDER BY variant
"""


# ---------------------------------------------------------------------------
# ks_distance — exact two-sample Kolmogorov-Smirnov over value-level CDFs
# ---------------------------------------------------------------------------


def q_ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between src0's and src1's document
    word-count distributions. The distributions aggregate to VALUE level
    first (distinct word counts — the support is small however large the
    corpus), cumulative counts come from one ordered window over that
    aggregate, and D = max |CDF_a − CDF_b| is an in-row rational of
    exact integers. Output: sample sizes, D (6 dp), and the argmax
    support point (ties broken by lowest value). Binless — detects
    shape drift PSI's fixed bins smear out."""
    docs = _t(spark, sf_dir, "documents")
    # text IS NOT NULL in lockstep: a NULL text gives a NULL word count
    # in both engines, but Spark's cumulative window orders NULL FIRST
    # while DuckDB orders it LAST — every CDF value after the NULL group
    # would silently diverge between engines
    vals = (
        docs.filter(
            F.col("source").isin("src0", "src1") & F.col("text").isNotNull()
        )
        .select(
            "source", F.size(F.split("text", " ")).alias("v")
        )
        .groupBy("v")
        .agg(
            F.sum((F.col("source") == "src0").cast("long")).alias("ca"),
            F.sum((F.col("source") == "src1").cast("long")).alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = vals.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    cum = vals.select(
        "v",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    ).crossJoin(F.broadcast(tot))
    gap = F.when(
        (F.col("na") != 0) & (F.col("nb") != 0),
        F.abs(F.col("cuma") / F.col("na") - F.col("cumb") / F.col("nb")),
    )
    scored = cum.select(
        "v", "na", "nb", F.round(gap, 6).alias("gap")
    )
    best = scored.orderBy(F.col("gap").desc(), "v").limit(1)
    return best.select(
        "na",
        "nb",
        F.col("gap").alias("ks_d"),
        F.col("v").alias("argmax_value"),
    )


SQL_KS_DISTANCE = """
WITH vals AS (
  SELECT len(string_split(text, ' ')) AS v,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM documents
  WHERE source IN ('src0', 'src1') AND text IS NOT NULL
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM vals
), cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cuma,
         CAST(sum(cb) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumb
  FROM vals
)
SELECT na, nb,
       round(CASE WHEN na = 0 OR nb = 0 THEN NULL
             ELSE abs(cuma / CAST(na AS DOUBLE)
                      - cumb / CAST(nb AS DOUBLE)) END, 6)
         AS ks_d,
       v AS argmax_value
FROM cum, tot
ORDER BY ks_d DESC, v ASC
LIMIT 1
"""


REGISTRY_EXT13 = {
    "ab_test_readout": (q_ab_test_readout, SQL_AB_TEST_READOUT),
    "ks_distance": (q_ks_distance, SQL_KS_DISTANCE),
}
