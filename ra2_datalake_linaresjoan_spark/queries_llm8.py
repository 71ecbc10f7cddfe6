"""LLM-data queries, batch 8 (round 3 continuation): n-gram novelty
scoring and cross-source duplication provenance.

- ``ngram_novelty`` measures how much of each document is corpus-unique
  text — the generalization/memorization signal between ``doc_repetition``
  (within-document) and ``contamination`` (cross-set): the corpus-wide
  document frequency of every 3-gram is ONE inverted-index aggregate,
  and a shingle is "novel" when no other document contains it. Reported
  as a per-source decile-free summary (mean novelty is a ratio of exact
  counts).
- ``cross_source_dups`` is the provenance matrix every corpus audit
  wants: which source pairs share content (by coarse 40-char prefix
  fingerprint, the same identity ``split_leakage_audit`` uses so the
  path fires at every scale factor). The fingerprint→source-set
  aggregate is fingerprint-sized; emitting unordered source pairs from
  each fingerprint's DISTINCT source list in-row avoids the
  fingerprint×fingerprint self-join entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# ngram_novelty — corpus-unique shingle fraction per document, by source
# ---------------------------------------------------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty = the fraction of a document's DISTINCT word 3-grams that
    appear in no other document. Plan: distinct (doc, shingle) pairs
    from one explode; the shingle's document frequency from the same
    table (vocab-sized aggregate, broadcast back); per-doc novel/total
    counts; then a per-source roll-up of exact integers — mean novelty
    is computed from the summed numerators/denominators, so the output
    is partition-invariant with one rounded division per row."""
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import shingles

    # complete-case on doc_id (lockstep): the source re-attach is an
    # equi-join on doc_id, which silently DROPPED NULL-id docs on the
    # Spark side while the oracle grouped them (round-10 review); both
    # engines now exclude them up front. (shingles() only needs
    # (doc_id, text) — the old select passed source just to drop it.)
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    sh = shingles(
        docs.select("doc_id", "text"), "doc_id", "text", n=3
    ).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    df_counts = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("df")
    )
    per_doc = (
        sh.join(F.broadcast(df_counts), "shingle")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_shingles").alias("total_shingles"),
            F.sum("n_novel").alias("total_novel"),
        )
        .select(
            "source",
            "n_docs",
            "total_shingles",
            "total_novel",
            F.round(F.col("total_novel") / F.col("total_shingles"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("source")
    )


SQL_NGRAM_NOVELTY = r"""
WITH w AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), '[\s\x0b]+') AS words
  FROM documents
  WHERE doc_id IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(words[i:i+2], ' ') AS shingle
  FROM w, unnest(range(1, len(words) - 1)) AS t(i)
  WHERE len(words) >= 3
), dfc AS (
  SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY shingle
), per_doc AS (
  SELECT s.doc_id, s.source,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM sh s JOIN dfc d USING (shingle)
  GROUP BY s.doc_id, s.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_shingles) AS BIGINT) AS total_shingles,
       CAST(sum(n_novel) AS BIGINT) AS total_novel,
       round(sum(n_novel) / CAST(sum(n_shingles) AS DOUBLE), 6)
         AS novelty_rate
FROM per_doc GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# cross_source_dups — which sources share content (provenance matrix)
# ---------------------------------------------------------------------------


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair,
    how many content fingerprints (40-char text prefixes) both sources
    contain. The fingerprint → sorted DISTINCT source list is one
    aggregate; each row then emits its own pairs IN-ROW (explode over
    the list's index pairs) — fingerprint-sized data, no self-join, no
    shuffle larger than the pair aggregate. The standard corpus-lineage
    audit (which crawls/mirrors overlap) at any scale."""
    # source IS NOT NULL in lockstep: Spark's collect_set silently
    # drops NULL elements while DuckDB's list(DISTINCT source) keeps
    # them — the oracle emitted (src, NULL) pairs Spark never saw
    # (round-10 review)
    docs = _t(spark, sf_dir, "documents").where(F.col("source").isNotNull())
    fps = (
        docs.select(F.substring("text", 1, 40).alias("fp"), "source")
        .distinct()
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = fps.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(srcs) - 1), i ->"
                " transform(sequence(0, i - 1), j ->"
                " struct(srcs[j] AS src_a, srcs[i] AS src_b))))"
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .orderBy(F.col("n_shared_fps").desc(), "src_a", "src_b")
        .limit(20)
    )


SQL_CROSS_SOURCE_DUPS = """
WITH fps AS (
  SELECT fp, list_sort(list(DISTINCT source)) AS srcs
  FROM (SELECT DISTINCT substr(text, 1, 40) AS fp, source FROM documents
        WHERE source IS NOT NULL)
  GROUP BY fp
  HAVING len(list(DISTINCT source)) >= 2
), pairs AS (
  SELECT srcs[j + 1] AS src_a, srcs[i + 1] AS src_b
  FROM fps,
       unnest(range(1, len(srcs))) AS t1(i),
       unnest(range(0, len(srcs))) AS t2(j)
  WHERE j < i
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared_fps
FROM pairs GROUP BY src_a, src_b
ORDER BY n_shared_fps DESC, src_a ASC, src_b ASC
LIMIT 20
"""


REGISTRY_LLM8 = {
    "ngram_novelty": (q_ngram_novelty, SQL_NGRAM_NOVELTY),
    "cross_source_dups": (q_cross_source_dups, SQL_CROSS_SOURCE_DUPS),
}
