"""LLM-data-pipeline queries, batch 2: repetition quality signal, sequence
packing, PII redaction, benchmark contamination.

Each query returns a DataFrame AND carries an exact DuckDB oracle — the
operators are designed so every step (integer bin math, regex counts,
shingle joins) is engine-portable. Reference parity: these extend the
reference's quality/dedup surface (SURVEY §2.11) with the operations a
pretraining-data pipeline runs at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the SHARED table reader (round-9 review): a local raw-parquet copy
# would silently skip queries._t's events-timestamp normalization if an
# events-based query ever lands in this module
from ra2_datalake_linaresjoan_spark.queries import _t  # noqa: F401


# ---------------------------------------------------------------------------
# doc_repetition — repeated n-gram ratio histogram (Gopher-style signal)
# ---------------------------------------------------------------------------


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: per document, the fraction of 3-gram
    shingles that are duplicates (1 - distinct/total), bucketed into
    deciles by exact integer arithmetic — high buckets are the
    boilerplate/spam candidates a quality filter drops. One shuffle on
    doc_id, one on the bucket."""
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    # hashed=True (round-13): total/distinct counts are
    # shingle-identity-invariant — the doc-keyed shuffle and the
    # countDistinct state carry int64 keys, not 3-word strings
    sh = shingles(docs, "doc_id", "text", n=3, distinct=False, hashed=True)
    per = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("shingle").alias("dist"),
    )
    return (
        per.select(
            F.expr("((total - dist) * 10) div total").alias("rep_bucket"),
            (1 - F.col("dist") / F.col("total")).alias("_rep"),
        )
        .groupBy("rep_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_rep"), 6).alias("avg_repetition"),
        )
        .orderBy("rep_bucket")
    )


SQL_DOC_REPETITION = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), '[\s\x0b]+') AS words FROM documents
), sh AS (
  SELECT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM w, unnest(range(1, len(words) - 1)) AS t(i)
  WHERE len(words) >= 3
), per AS (
  SELECT doc_id, count(*) AS total, count(DISTINCT shingle) AS dist FROM sh GROUP BY doc_id
)
SELECT ((total - dist) * 10) // total AS rep_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(1 - dist * 1.0 / total), 6) AS avg_repetition
FROM per GROUP BY 1 ORDER BY rep_bucket
"""


# ---------------------------------------------------------------------------
# seq_packing — concat-and-chunk context-window assignment per shard
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 2048


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents concatenated in doc_id order WITHIN each
    language shard and chunked into 2048-token context windows; per-bin
    doc counts and token totals. Packing is per-shard (no global ordered
    window — the 100-TB shape).

    Complete-case on (doc_id, text) in LOCKSTEP (round-9 review): the
    packing order is doc_id, and a NULL id packs FIRST in Spark's
    window but LAST in DuckDB's, shifting every later document's bin
    when the shard total crosses a capacity boundary — and a NULL text
    has no tokens to pack."""
    from ra2_datalake_linaresjoan_spark.llmdata.packing import (
        pack_sequences,
        whitespace_tokens,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select(
            "lang", "doc_id", whitespace_tokens("text").cast("long").alias("tokens")
        )
    )
    packed = pack_sequences(
        docs, "doc_id", "tokens", _PACK_CAPACITY, shard_cols=["lang"]
    )
    return (
        packed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


SQL_SEQ_PACKING = r"""
WITH tok AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) AS tokens
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
), cum AS (
  SELECT lang, doc_id, tokens,
         COALESCE(sum(tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM tok
)
SELECT lang, CAST(cum_before // 2048 AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM cum GROUP BY lang, bin_id ORDER BY lang, bin_id
"""


# ---------------------------------------------------------------------------
# pii_redact — deterministic PII injection, count, redact, verify clean
# ---------------------------------------------------------------------------


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub parity: inject a deterministic email+phone per document,
    count matches, redact, and prove the redacted text is clean — per
    language: docs, emails, phones, residual matches after redaction
    (must be 0). All scan-speed Column regex ops."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        pii_counts,
        redact_pii,
    )

    docs = _t(spark, sf_dir, "documents")
    with_pii = docs.select(
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("text2"),
    )
    emails, phones = pii_counts(F.col("text2"))
    r_emails, r_phones = pii_counts(redact_pii(F.col("text2")))
    return (
        with_pii.select(
            "lang",
            emails.alias("_e"),
            phones.alias("_p"),
            (r_emails + r_phones).alias("_resid"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_e").alias("emails"),
            F.sum("_p").alias("phones"),
            F.sum("_resid").alias("residual_after_redact"),
        )
        .orderBy("lang")
    )


SQL_PII_REDACT = r"""
WITH t AS (
  SELECT lang,
         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(doc_id::VARCHAR, 4, '0') AS text2
  FROM documents
), c AS (
  SELECT lang,
         len(regexp_extract_all(text2, '[A-Za-z0-9.]+@[A-Za-z]+\.[A-Za-z]+')) AS e,
         len(regexp_extract_all(text2, '\+1-555-[0-9]{4}')) AS p,
         regexp_replace(
           regexp_replace(text2, '[A-Za-z0-9.]+@[A-Za-z]+\.[A-Za-z]+', '[EMAIL]', 'g'),
           '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS red
  FROM t
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(e) AS BIGINT) AS emails,
       CAST(sum(p) AS BIGINT) AS phones,
       CAST(sum(len(regexp_extract_all(red, '[A-Za-z0-9.]+@[A-Za-z]+\.[A-Za-z]+'))
              + len(regexp_extract_all(red, '\+1-555-[0-9]{4}'))) AS BIGINT)
         AS residual_after_redact
FROM c GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# contamination — train/benchmark n-gram overlap
# ---------------------------------------------------------------------------


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: docs with doc_id % 97 == 0 act as the
    held-out benchmark; a train doc is contaminated when it shares any
    5-gram with the benchmark (inverted-index semi join — never
    all-pairs). One summary row: sizes + rate."""
    from ra2_datalake_linaresjoan_spark.llmdata.contamination import (
        contamination_report,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(train, bench, "doc_id", "text", n=5)


SQL_CONTAMINATION = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), '[\s\x0b]+') AS words FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS shingle
  FROM w, unnest(range(1, len(words) - 3)) AS t(i)
  WHERE len(words) >= 5
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), train_ids AS (
  SELECT DISTINCT doc_id FROM documents WHERE doc_id % 97 <> 0
), cont AS (
  SELECT DISTINCT s.doc_id FROM sh s
  WHERE s.doc_id % 97 <> 0 AND s.shingle IN (SELECT shingle FROM bench)
)
SELECT CAST((SELECT count(*) FROM train_ids) AS BIGINT) AS n_train,
       CAST((SELECT count(*) FROM cont) AS BIGINT) AS n_contaminated,
       CASE WHEN (SELECT count(*) FROM train_ids) > 0
            THEN round((SELECT count(*) FROM cont) * 1.0
                       / (SELECT count(*) FROM train_ids), 6)
            ELSE 0.0 END AS contamination_rate
"""


REGISTRY_LLM2: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "doc_repetition": (q_doc_repetition, SQL_DOC_REPETITION),
    "seq_packing": (q_seq_packing, SQL_SEQ_PACKING),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "contamination": (q_contamination, SQL_CONTAMINATION),
}
