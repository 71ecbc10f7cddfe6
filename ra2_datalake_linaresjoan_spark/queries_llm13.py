"""LLM-data batch 13 (round 4 cont.): dataset split assignment and
context-length planning.

- ``stratified_split_assign`` — deterministic, engine-portable
  train/val/test assignment (md5(doc_id) mod 100 → 90/5/5) audited per
  language stratum: observed shares vs targets. Hash assignment (not
  random) is the property that makes the split reproducible across
  engines, re-runs, and backfills — the same doc NEVER migrates between
  splits when the corpus grows (the leakage mechanism
  ``split_leakage_audit`` checks for).
- ``padding_waste_sweep`` — for candidate context lengths L ∈ {128,
  256, 512, 1024}: tokens kept after truncation, padding waste
  without packing, and utilization. The no-packing baseline a trainer
  compares against ``seq_packing``'s packed utilization to price the
  packing pipeline; one scan, the sweep is an in-row explode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

_SPLIT_TRAIN = 90  # buckets 0-89
_SPLIT_VAL = 95  # buckets 90-94; 95-99 = test


def q_stratified_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, split) counts and observed shares for the 90/5/5
    hash split, with the target share alongside — the audit row a
    datacard quotes. One scan, one lang×3 aggregate."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < _SPLIT_TRAIN, F.lit("train"))
        .when(bucket < _SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    assigned = docs.select("lang", split.alias("split"))
    per_lang = assigned.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    return (
        assigned.groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(F.broadcast(per_lang), "lang")
        .select(
            "lang",
            "split",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_lang"), 6).alias("observed_share"),
            F.when(F.col("split") == "train", 0.90)
            .when(F.col("split") == "val", 0.05)
            .otherwise(0.05)
            .alias("target_share"),
        )
        .orderBy("lang", "split")
    )


SQL_STRATIFIED_SPLIT_ASSIGN = f"""
WITH assigned AS (
  SELECT lang,
         CASE
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < {_SPLIT_TRAIN} THEN 'train'
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < {_SPLIT_VAL} THEN 'val'
           ELSE 'test' END AS split
  FROM documents
), per_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM assigned GROUP BY lang
)
SELECT a.lang, a.split, CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) * 1.0 / any_value(p.n_lang), 6) AS observed_share,
       CAST(CASE a.split WHEN 'train' THEN 0.90 WHEN 'val' THEN 0.05
            ELSE 0.05 END AS DOUBLE) AS target_share
FROM assigned a JOIN per_lang p ON a.lang = p.lang
GROUP BY a.lang, a.split
ORDER BY a.lang, a.split
"""


_PAD_LENS = (128, 256, 512, 1024)


def q_padding_waste_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each candidate context length: total whitespace tokens kept
    after truncation, tokens truncated away, padding waste (one doc per
    sequence, padded to L), and utilization = kept / (n_docs · L). All
    exact integers; the length sweep is an in-row explode, so the
    corpus scans once."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        F.explode(F.array(*[F.lit(n) for n in _PAD_LENS])).alias("max_len"),
    )
    kept = F.least(F.col("n_tok"), F.col("max_len"))
    return (
        toks.groupBy("max_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("tokens_kept"),
            F.sum(F.col("n_tok") - kept).alias("tokens_truncated"),
            F.sum(F.col("max_len") - kept).alias("padding_waste"),
            F.round(
                F.sum(kept) / (F.count(F.lit(1)) * F.first("max_len")), 6
            ).alias("utilization"),
        )
        .orderBy("max_len")
    )


SQL_PADDING_WASTE_SWEEP = rf"""
WITH toks AS (
  SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         t.max_len
  FROM documents
  CROSS JOIN (SELECT unnest([128, 256, 512, 1024]) AS max_len) t
)
SELECT CAST(max_len AS INT) AS max_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(n_tok, max_len)) AS BIGINT) AS tokens_kept,
       CAST(sum(n_tok - least(n_tok, max_len)) AS BIGINT) AS tokens_truncated,
       CAST(sum(max_len - least(n_tok, max_len)) AS BIGINT) AS padding_waste,
       round(sum(least(n_tok, max_len)) * 1.0 / (count(*) * any_value(max_len)), 6)
         AS utilization
FROM toks
GROUP BY max_len
ORDER BY max_len
"""


REGISTRY_LLM13: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "stratified_split_assign": (q_stratified_split_assign, SQL_STRATIFIED_SPLIT_ASSIGN),
    "padding_waste_sweep": (q_padding_waste_sweep, SQL_PADDING_WASTE_SWEEP),
}
