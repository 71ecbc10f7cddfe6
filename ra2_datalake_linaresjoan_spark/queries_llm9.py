"""LLM-data queries, batch 9 (round 3 continuation): code-switching
detection and tokenizer fertility.

- ``code_switch_score`` flags documents whose token stream mixes
  languages: each language's EXCLUSIVE top-vocabulary (its top-30 words
  minus every other language's top-30) is induced from the corpus in
  one aggregate, then each document counts tokens that hit a FOREIGN
  language's exclusive vocabulary. The standard mixed-language hygiene
  screen before language-targeted training; broadcast vocab join, one
  doc-grain aggregate.
- ``tokenizer_fertility`` measures subword fertility — BPE symbols per
  whitespace word, the tokenizer-efficiency metric — per language,
  reusing the ``bpe_encode`` merge chain on the vocab aggregate so the
  corpus shuffles once and the merge rewriting touches only distinct
  words. Fertility is an in-row division of exact frequency-weighted
  integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t
from ra2_datalake_linaresjoan_spark.queries_llm6 import _BPE_MERGES

_TOPV = 30


# ---------------------------------------------------------------------------
# code_switch_score — foreign-exclusive-vocabulary hit rate per document
# ---------------------------------------------------------------------------


def q_code_switch_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching screen: per (doc language) how many documents have
    ≥5% of tokens from ANOTHER language's exclusive top-30 vocabulary.
    Exclusive = in that language's top-30 by frequency (ties broken
    lexicographically) and in no other language's top-30 — computed with
    two vocabulary-sized aggregates, broadcast to the token stream. The
    summary per language: docs, flagged docs, and the flagged share
    (in-row division of exact counts, 6 dp)."""
    docs = _t(spark, sf_dir, "documents")
    tokens = (
        docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    counts = tokens.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    wr = Window.partitionBy("lang").orderBy(F.col("n").desc(), "w")
    top = counts.select(
        "lang", "w", F.row_number().over(wr).alias("r")
    ).filter(F.col("r") <= _TOPV)
    exclusive = (
        top.groupBy("w")
        .agg(F.countDistinct("lang").alias("nl"), F.min("lang").alias("vlang"))
        .filter(F.col("nl") == 1)
        .select("w", "vlang")
    )
    hits = tokens.join(F.broadcast(exclusive), "w", "left")
    per_doc = hits.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            (
                F.col("vlang").isNotNull() & (F.col("vlang") != F.col("lang"))
            ).cast("long")
        ).alias("n_foreign"),
    )
    flagged = (F.col("n_foreign") * 20 >= F.col("n_tokens")).cast("long")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flagged).alias("n_flagged"),
        )
        .select(
            "lang",
            "n_docs",
            "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_docs"), 6).alias("flag_rate"),
        )
        .orderBy("lang")
    )


SQL_CODE_SWITCH_SCORE = f"""
WITH tokens AS (
  SELECT doc_id, lang, w
  FROM (SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0
), counts AS (
  SELECT lang, w, count(*) AS n FROM tokens GROUP BY 1, 2
), top AS (
  SELECT lang, w FROM (
    SELECT lang, w,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, w ASC) AS r
    FROM counts
  ) WHERE r <= {_TOPV}
), exclusive AS (
  SELECT w, min(lang) AS vlang
  FROM top GROUP BY w HAVING count(DISTINCT lang) = 1
), per_doc AS (
  SELECT t.doc_id, t.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN e.vlang IS NOT NULL AND e.vlang <> t.lang
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_foreign
  FROM tokens t LEFT JOIN exclusive e ON t.w = e.w
  GROUP BY t.doc_id, t.lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_foreign * 20 >= n_tokens THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       round(sum(CASE WHEN n_foreign * 20 >= n_tokens THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS flag_rate
FROM per_doc GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# tokenizer_fertility — BPE symbols per word, per language
# ---------------------------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword fertility per language: total BPE symbols emitted by the
    5-rule merge table divided by total whitespace words — the metric
    that decides whether a tokenizer suits a language (fertility ≈ 1 is
    ideal; high fertility inflates sequence length and training cost).
    The merge chain runs once per DISTINCT (lang, word) with counts as
    weights (the corpus shuffles once into the vocab aggregate); symbol
    counting is in-row ``size(split(...))`` — no second explode."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from ra2_datalake_linaresjoan_spark.queries_llm6 import bpe_merge_chain

    n_sym = F.size(F.split(F.trim(bpe_merge_chain(F.col("w"))), " "))
    g = vocab.select(
        "lang",
        "freq",
        (n_sym.cast("long") * F.col("freq")).alias("sym_weighted"),
    )
    return (
        g.groupBy("lang")
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum("sym_weighted").alias("n_symbols"),
        )
        .select(
            "lang",
            "n_words",
            "n_symbols",
            F.round(F.col("n_symbols") / F.col("n_words"), 6).alias("fertility"),
        )
        .orderBy("lang")
    )


from ra2_datalake_linaresjoan_spark.queries_llm6 import sql_bpe_chain as _sql_bpe_chain_w  # noqa: E501  (shared tokenizer-apply, round-10 review)


SQL_TOKENIZER_FERTILITY = f"""
WITH vocab AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0
  GROUP BY lang, w
), g AS (
  SELECT lang, freq,
         CAST(len(string_split(trim({_sql_bpe_chain_w()}, ' '), ' '))
              AS BIGINT) * freq AS sym_weighted
  FROM vocab
)
SELECT lang,
       CAST(sum(freq) AS BIGINT) AS n_words,
       CAST(sum(sym_weighted) AS BIGINT) AS n_symbols,
       round(sum(sym_weighted) / CAST(sum(freq) AS DOUBLE), 6) AS fertility
FROM g GROUP BY lang ORDER BY lang
"""


REGISTRY_LLM9 = {
    "code_switch_score": (q_code_switch_score, SQL_CODE_SWITCH_SCORE),
    "tokenizer_fertility": (q_tokenizer_fertility, SQL_TOKENIZER_FERTILITY),
}
