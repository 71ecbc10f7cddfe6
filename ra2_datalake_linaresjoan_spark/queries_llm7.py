"""LLM-data queries, batch 7 (round 3 continuation): tokenizer vocabulary
coverage, dataset split hygiene, and embedding-norm outlier detection.

- ``vocab_oov_rate`` — the tokenizer-evaluation staple: freeze a top-K
  vocabulary from the corpus, then measure per-language token coverage
  and out-of-vocabulary rate. Vocabulary induction is one aggregate
  shuffled to vocab size; coverage is a broadcast membership join —
  never a per-language rescan.
- ``split_leakage_audit`` — deterministic md5 train/val/test assignment
  plus the leakage check every release needs: content fingerprints that
  appear in more than one split. The fingerprint (text prefix) is
  deliberately coarse so the leakage path fires at every scale factor.
- ``emb_norm_outliers`` — vector hygiene: squared norms in exact integer
  micro-units, per-label median/MAD (exact grouped percentiles over
  integers — halves at worst, bit-stable), robust outlier flags. The
  per-label thresholds broadcast back; the fact table is scanned twice
  (norms, flags) and shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t


# ---------------------------------------------------------------------------
# vocab_oov_rate — top-K vocabulary coverage per language
# ---------------------------------------------------------------------------

_VOCAB_K = 100


def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeze the top-100 corpus words (by document frequency… here term
    frequency, ties broken lexicographically) as the vocabulary, then
    report per language: total tokens, in-vocabulary tokens, and the OOV
    rate. Token stream → ONE (word, lang) aggregate (vocab-sized, Zipf's
    gift); vocabulary = top-K of its word marginal; coverage = broadcast
    semi-membership via a left join flag. The OOV rate is an in-row
    division of exact counts rounded at 6 dp."""
    docs = _t(spark, sf_dir, "documents")
    tokens = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = (
        tokens.groupBy("w")
        .agg(F.sum("n").alias("tot"))
        .orderBy(F.col("tot").desc(), "w")
        .limit(_VOCAB_K)
        .select("w")
    )
    covered = tokens.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "w", "left"
    )
    return (
        covered.groupBy("lang")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNotNull(), F.col("n")).otherwise(F.lit(0))).alias(
                "n_in_vocab"
            ),
        )
        .select(
            "lang",
            "n_tokens",
            "n_in_vocab",
            F.round(
                F.lit(1.0) - F.col("n_in_vocab") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


SQL_VOCAB_OOV_RATE = f"""
WITH tokens AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0
  GROUP BY lang, w
), vocab AS (
  SELECT w FROM (
    SELECT w, sum(n) AS tot FROM tokens GROUP BY w
  ) ORDER BY tot DESC, w ASC LIMIT {_VOCAB_K}
)
SELECT lang,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NOT NULL THEN n ELSE 0 END) AS BIGINT)
         AS n_in_vocab,
       round(1.0 - sum(CASE WHEN v.w IS NOT NULL THEN n ELSE 0 END)
                   / CAST(sum(n) AS DOUBLE), 6) AS oov_rate
FROM tokens t LEFT JOIN vocab v ON t.w = v.w
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# split_leakage_audit — md5 split assignment + cross-split leakage
# ---------------------------------------------------------------------------


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset splitting and its hygiene check: each doc
    lands in train/val/test by md5(doc text) mod 10 (8/1/1) — stable
    across runs, engines, and partitionings — and a 40-char-prefix
    fingerprint approximates content identity. Output per split: docs,
    plus the LEAKED count — docs whose fingerprint also appears in a
    DIFFERENT split (the contamination every eval-set release must
    report). Two aggregates on the fingerprint (fingerprint → split set,
    then split totals); the distinct-splits-per-fingerprint table is
    fingerprint-sized and joins back by fingerprint."""
    # NULL-text docs drop in lockstep (no content fingerprint to leak;
    # DuckDB's '0x'-concat cast errors on md5(NULL) where Spark's conv
    # silently fell to the 'test' branch)
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    assigned = docs.select(
        "doc_id",
        F.substring("text", 1, 40).alias("fp"),
        (
            F.when(F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 10 < 8, "train")
            .when(F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 10 == 8, "val")
            .otherwise("test")
        ).alias("split"),
    )
    fp_splits = assigned.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    return (
        assigned.join(fp_splits, "fp")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_splits") > 1).cast("long")).alias("n_leaked"),
        )
        .select(
            "split",
            "n_docs",
            "n_leaked",
            F.round(F.col("n_leaked") / F.col("n_docs"), 6).alias("leak_rate"),
        )
        .orderBy("split")
    )


SQL_SPLIT_LEAKAGE_AUDIT = """
WITH assigned AS (
  SELECT doc_id, substr(text, 1, 40) AS fp,
         CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 10 < 8
                THEN 'train'
              WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 10 = 8
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents WHERE text IS NOT NULL
), fp_splits AS (
  SELECT fp, count(DISTINCT split) AS n_splits FROM assigned GROUP BY fp
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked,
       round(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS leak_rate
FROM assigned JOIN fp_splits USING (fp)
GROUP BY split
ORDER BY split
"""


# ---------------------------------------------------------------------------
# emb_norm_outliers — robust (median/MAD) vector-norm hygiene
# ---------------------------------------------------------------------------


def q_emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm outlier audit per label: squared L2 norms in exact
    integer micro-units (Σ round(e·1000)², a single array-lambda — no
    explode), per-label exact median and MAD (integer percentiles —
    worst case a .5 half, bit-stable across engines), and the count of
    vectors beyond median ± 3·MAD (the corrupt-vector screen run before
    any ANN indexing). The label-level thresholds are a tiny aggregate
    broadcast back onto the norms; two scans of the vector column, one
    shuffle each.

    Routes through _emb_clean + a lockstep NULL-label filter: an
    interior-NULL element NULLs Spark's norm fold where DuckDB's
    list_sum skips it, and the label joins drop Spark's NULL-label
    group the oracle keeps (round-8 parity audit)."""
    emb = _emb_clean(spark, sf_dir).where(F.col("label").isNotNull())
    norms = emb.select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(transform(embedding, e ->"
            " CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)),"
            " 0L, (acc, q) -> acc + q * q)"
        ).alias("norm2"),
    )
    med = norms.groupBy("label").agg(
        F.expr("percentile(norm2, 0.5)").alias("med")
    )
    mad = (
        norms.join(F.broadcast(med), "label")
        .select("label", F.abs(F.col("norm2") - F.col("med")).alias("dev"))
        .groupBy("label")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    )
    thresholds = med.join(mad, "label")
    return (
        norms.join(F.broadcast(thresholds), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.first("med"), 1).alias("median_norm2"),
            F.round(F.first("mad"), 1).alias("mad_norm2"),
            F.sum(
                (
                    F.abs(F.col("norm2") - F.col("med")) > 3 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("label")
    )


SQL_EMB_NORM_OUTLIERS = f"""
WITH norms AS (
  SELECT vec_id, label,
         CAST(list_sum(list_transform(embedding, e ->
           CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)
           * CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)
           AS norm2
  FROM embeddings
  WHERE label IS NOT NULL AND {EMB_CLEAN_SQL}
), med AS (
  SELECT label, quantile_cont(norm2, 0.5) AS med FROM norms GROUP BY label
), mad AS (
  SELECT label, quantile_cont(abs(norm2 - med), 0.5) AS mad
  FROM norms JOIN med USING (label)
  GROUP BY label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(any_value(med), 1) AS median_norm2,
       round(any_value(mad), 1) AS mad_norm2,
       CAST(sum(CASE WHEN abs(norm2 - med) > 3 * mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM norms JOIN med USING (label) JOIN mad USING (label)
GROUP BY label
ORDER BY label
"""


REGISTRY_LLM7 = {
    "vocab_oov_rate": (q_vocab_oov_rate, SQL_VOCAB_OOV_RATE),
    "split_leakage_audit": (q_split_leakage_audit, SQL_SPLIT_LEAKAGE_AUDIT),
    "emb_norm_outliers": (q_emb_norm_outliers, SQL_EMB_NORM_OUTLIERS),
}
