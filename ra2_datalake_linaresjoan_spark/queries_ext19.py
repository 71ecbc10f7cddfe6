"""Batch 19 (round 4 close): information-theoretic corpus statistics and
arrival-process profiling.

- ``ngram_entropy_rate`` — per-language bigram conditional entropy
  H(w₂|w₁) = −Σ p(w₁,w₂) ln p(w₂|w₁) alongside the unigram entropy
  H(w): the redundancy/predictability read a language-mix plan uses
  (low conditional entropy ⇒ repetitive/templated text, the corpus-
  level cousin of the per-doc repetition signals). Everything after
  the postings shuffle is bigram-vocabulary-sized; probabilities are
  ratios of exact counts and the float fold is a vocabulary-sized
  aggregate rounded at 4 dp.
- ``inter_event_time_dist`` — per event type, exact interpolated
  percentiles (p50/p90/p99) of the per-user inter-arrival gaps in
  microseconds — the arrival-process profile that parameterizes
  load models and sessionization thresholds (the 30-min gap rule is
  readable straight off this table). Lag windows are user-partitioned;
  the percentile aggregate sees only gap rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_words

from ra2_datalake_linaresjoan_spark.queries import _t


def q_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_tokens, unigram_entropy, bigram_cond_entropy) — both in
    nats at 4 dp; conditional ≤ unigram always (conditioning never
    increases entropy; pinned by a semantic test).

    Complete-case on doc_id in lockstep (round-10 dirty audit): the
    bigram chain is lead() over (doc_id, pos) — NULL-id docs merge into
    one tied-pos partition with a nondeterministic, engine-divergent
    bigram multiset (the bigram_lm_perplexity class)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tok = docs.select(
        "lang",
        "doc_id",
        F.posexplode(ascii_words("text")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    uni = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cu"))
    uni_tot = uni.groupBy("lang").agg(F.sum("cu").alias("nu"))
    h_uni = (
        uni.join(F.broadcast(uni_tot), "lang")
        .groupBy("lang")
        .agg(
            F.first("nu").alias("n_tokens"),
            F.round(
                -F.sum(
                    (F.col("cu") / F.col("nu"))
                    * F.log(F.col("cu") / F.col("nu"))
                ),
                4,
            ).alias("unigram_entropy"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            "lang",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    w1_tot = big.groupBy("lang", "w1").agg(F.sum("cb").alias("c1"))
    big_tot = big.groupBy("lang").agg(F.sum("cb").alias("nb"))
    h_cond = (
        big.join(w1_tot, ["lang", "w1"])
        .join(F.broadcast(big_tot), "lang")
        .groupBy("lang")
        .agg(
            F.round(
                -F.sum(
                    (F.col("cb") / F.col("nb"))
                    * F.log(F.col("cb") / F.col("c1"))
                ),
                4,
            ).alias("bigram_cond_entropy")
        )
    )
    return h_uni.join(h_cond, "lang").orderBy("lang")


SQL_NGRAM_ENTROPY_RATE = r"""
WITH tok AS (
  SELECT lang, doc_id, t.pos, t.word
  FROM documents,
       LATERAL (SELECT generate_subscripts(
                         regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), 1) AS pos,
                       unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> '' AND doc_id IS NOT NULL
), uni AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY 1, 2
), uni_tot AS (
  SELECT lang, CAST(sum(cu) AS BIGINT) AS nu FROM uni GROUP BY 1
), h_uni AS (
  SELECT u.lang, any_value(nu) AS n_tokens,
         round(-sum((CAST(cu AS DOUBLE) / nu) * ln(CAST(cu AS DOUBLE) / nu)), 4)
           AS unigram_entropy
  FROM uni u JOIN uni_tot USING (lang)
  GROUP BY u.lang
), big AS (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS cb FROM (
    SELECT lang, word AS w1,
           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
), w1_tot AS (
  SELECT lang, w1, CAST(sum(cb) AS BIGINT) AS c1 FROM big GROUP BY 1, 2
), big_tot AS (
  SELECT lang, CAST(sum(cb) AS BIGINT) AS nb FROM big GROUP BY 1
), h_cond AS (
  SELECT b.lang,
         round(-sum((CAST(cb AS DOUBLE) / nb) * ln(CAST(cb AS DOUBLE) / c1)), 4)
           AS bigram_cond_entropy
  FROM big b JOIN w1_tot USING (lang, w1) JOIN big_tot USING (lang)
  GROUP BY b.lang
)
SELECT lang, n_tokens, unigram_entropy, bigram_cond_entropy
FROM h_uni JOIN h_cond USING (lang)
ORDER BY lang
"""


def q_inter_event_time_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: gap count and exact p50/p90/p99 of per-user
    inter-arrival times (µs, reported in seconds at 4 dp)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    sec = F.col("gap_us") / 1_000_000.0
    return (
        gaps.select("event_type", sec.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_s"),
            F.round(F.expr("percentile(gap_s, 0.99)"), 4).alias("p99_s"),
        )
        .orderBy("event_type")
    )


SQL_INTER_EVENT_TIME_DIST = """
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) / 1000000.0
           AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
       round(quantile_cont(gap_s, 0.99), 4) AS p99_s
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


REGISTRY_EXT19: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "ngram_entropy_rate": (q_ngram_entropy_rate, SQL_NGRAM_ENTROPY_RATE),
    "inter_event_time_dist": (q_inter_event_time_dist, SQL_INTER_EVENT_TIME_DIST),
}
