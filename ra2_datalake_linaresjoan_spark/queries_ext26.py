"""Batch 26 (round 5 capstone): the hand-built sketch kernels under the
oracle gate — the same `streaming/sketches.py` functions the state-store
streams use, executed in batch and hash-matched against a DuckDB
re-implementation, so the sketch ARITHMETIC (not just its plumbing) is
driver-verified.

- ``hll_register_estimate`` — md5-HLL over event users: registers built
  by ``hll_registers`` (exact-integer rho via binary-string length),
  the harmonic estimate with linear-counting correction, next to the
  exact distinct count and the relative error. One register aggregate
  (≤ m rows) + one exact-distinct aggregate.
- ``bloom_membership_audit`` — Bloom bit set over the document
  fingerprint corpus probed with seen fingerprints AND synthetic
  never-seen keys: seen recall must be 1 (no false negatives, the
  Bloom guarantee), and the unseen false-positive count/rate is the
  measured fill-factor check. Bit set ≤ m rows broadcasts; probes pay
  a map-side membership join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t
from ra2_datalake_linaresjoan_spark.streaming.sketches import (
    BLOOM_K,
    BLOOM_M,
    HLL_M,
    bloom_bits,
    bloom_probe,
    hll_estimate,
    hll_registers,
)

_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def q_hll_register_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: registers set, HLL estimate, exact distinct users, and
    the signed relative error at 4 dp — the accuracy audit for the
    state-store HLL, oracle-checked against an independent SQL
    re-implementation of the register math. NULL user_ids drop in
    lockstep: countDistinct skips NULL, so an unfiltered NULL key would
    set a phantom (NULL, NULL) register and bias the estimate against
    its own exact baseline — identically on both engines once DuckDB's
    '0x'-cast crash is avoided."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("k"))
        .where(F.col("k").isNotNull())
    )
    regs = (
        hll_registers(ev, "k")
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_estimate(regs)
    exact = ev.agg(F.countDistinct("k").alias("n_exact"))
    return est.crossJoin(exact).select(
        "n_registers_set",
        "estimate",
        "n_exact",
        F.round(
            F.when(
                F.col("n_exact") != 0,
                (F.col("estimate") - F.col("n_exact")) / F.col("n_exact"),
            ),
            4,
        ).alias("rel_err"),
    )


SQL_HLL_REGISTER_ESTIMATE = f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE user_id IS NOT NULL
), obs AS (
  SELECT CAST(concat('0x', substr(md5(k), 1, 8)) AS BIGINT) % {HLL_M} AS register,
         CASE WHEN CAST(concat('0x', substr(md5(k), 9, 8)) AS BIGINT) = 0 THEN 33
              ELSE 33 - length(bin(CAST(concat('0x', substr(md5(k), 9, 8)) AS BIGINT)))
         END AS rho
  FROM keyed
), regs AS (
  SELECT register, CAST(max(rho) AS INT) AS rho FROM obs GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_set,
         coalesce(sum(power(2.0, -rho)), 0.0) AS s_set
  FROM regs
), est AS (
  SELECT n_set AS n_registers_set,
         round(CASE WHEN {_HLL_ALPHA * HLL_M * HLL_M!r} / (s_set + ({HLL_M} - n_set))
                         <= {2.5 * HLL_M!r}
                     AND {HLL_M} - n_set > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_set))
                    ELSE {_HLL_ALPHA * HLL_M * HLL_M!r} / (s_set + ({HLL_M} - n_set))
               END, 2) AS estimate
  FROM agg
), exact AS (
  SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_exact FROM keyed
)
SELECT n_registers_set, estimate, n_exact,
       round(CASE WHEN n_exact = 0 THEN NULL
             ELSE (estimate - n_exact) / n_exact END, 4) AS rel_err
FROM est CROSS JOIN exact
"""


def q_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: seen probes (all must flag maybe-member — the no-false-
    negative guarantee), unseen probes, unseen flagged (false
    positives), and the FP rate at 6 dp. Bit set and probes use the
    library kernels the streaming state store runs. NULL-text docs drop
    in lockstep (md5(NULL) is not a filter key, and DuckDB's
    '0x'-concat cast would error where Spark's conv returns NULL); a
    probe set with zero unseen probes reports NULL fp_rate instead of
    an ANSI DIVIDE_BY_ZERO."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("text").isNotNull()).select(
        F.md5("text").alias("k")
    )
    bits = bloom_bits(corpus, "k").groupBy("bit").agg(
        F.count(F.lit(1)).alias("n")
    )
    seen = (
        docs.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
        .select(F.md5("text").alias("k"), F.lit(True).alias("is_member"))
    )
    unseen = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .select(
            F.concat(F.lit("probe-"), F.col("doc_id").cast("string")).alias("k"),
            F.lit(False).alias("is_member"),
        )
    )
    probes = seen.union(unseen).distinct()
    flagged = bloom_probe(bits, probes.select("k"), "k").join(probes, "k")
    return flagged.agg(
        F.sum(F.col("is_member").cast("long")).alias("n_seen_probes"),
        F.sum(
            (F.col("is_member") & F.col("maybe_member")).cast("long")
        ).alias("n_seen_flagged"),
        F.sum((~F.col("is_member")).cast("long")).alias("n_unseen_probes"),
        F.sum(
            ((~F.col("is_member")) & F.col("maybe_member")).cast("long")
        ).alias("n_false_positives"),
        F.round(
            F.when(
                F.sum((~F.col("is_member")).cast("long")) != 0,
                F.sum(
                    ((~F.col("is_member")) & F.col("maybe_member")).cast("long")
                )
                / F.sum((~F.col("is_member")).cast("long")),
            ),
            6,
        ).alias("fp_rate"),
    )


def _bloom_audit_sql() -> str:
    def bits_of(expr: str) -> str:
        return ", ".join(
            f"CAST(concat('0x', substr(md5({expr}), {1 + 8 * j}, 8)) AS BIGINT) % {BLOOM_M}"
            for j in range(BLOOM_K)
        )

    hit = " AND ".join(
        f"CAST(concat('0x', substr(md5(k), {1 + 8 * j}, 8)) AS BIGINT) % {BLOOM_M} IN (SELECT bit FROM bits)"
        for j in range(BLOOM_K)
    )
    return f"""
WITH corpus AS (
  SELECT md5(text) AS k FROM documents WHERE text IS NOT NULL
), bits AS (
  SELECT DISTINCT unnest([{bits_of('k')}]) AS bit FROM corpus
), probes AS (
  SELECT DISTINCT * FROM (
    SELECT md5(text) AS k, TRUE AS is_member FROM documents
    WHERE doc_id % 7 = 0 AND text IS NOT NULL
    UNION ALL
    SELECT concat('probe-', CAST(doc_id AS VARCHAR)), FALSE FROM documents
    WHERE doc_id % 11 = 0
  )
), flagged AS (
  SELECT k, is_member, ({hit}) AS maybe_member FROM probes
)
SELECT CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_seen_probes,
       CAST(sum(CASE WHEN is_member AND maybe_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_flagged,
       CAST(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unseen_probes,
       CAST(sum(CASE WHEN NOT is_member AND maybe_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives,
       round(CASE WHEN sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) = 0
             THEN NULL
             ELSE sum(CASE WHEN NOT is_member AND maybe_member THEN 1 ELSE 0 END) * 1.0
                  / sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) END, 6) AS fp_rate
FROM flagged
"""


SQL_BLOOM_MEMBERSHIP_AUDIT = _bloom_audit_sql()


REGISTRY_EXT26: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "hll_register_estimate": (q_hll_register_estimate, SQL_HLL_REGISTER_ESTIMATE),
    "bloom_membership_audit": (
        q_bloom_membership_audit,
        SQL_BLOOM_MEMBERSHIP_AUDIT,
    ),
}
