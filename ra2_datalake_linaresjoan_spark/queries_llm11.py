"""LLM-data batch 11 (round 4): distribution-shift measurement, n-gram
language-model scoring, sparse lexical similarity, and per-dimension
embedding normalization statistics.

Scale shapes:

- ``kl_divergence_sources`` — per-source KL divergence against the
  corpus word distribution. Everything after the one postings shuffle
  is vocabulary-sized: per-source counts equi-join corpus counts on
  word, then collapse to one row per source.
- ``bigram_lm_perplexity`` — add-one-smoothed bigram LM trained on the
  corpus scores every document (avg negative log-likelihood — the
  perplexity-proxy quality filter one level up from
  ``unigram_logprob_filter``). Bigrams come from a per-doc lead window
  (doc-partitioned, never global); the LM tables are bigram-/unigram-
  vocabulary-sized equi-joins.
- ``tfidf_cosine_pairs`` — sparse lexical near-duplicate scoring:
  inverted-index blocking on RARE terms (df-bounded) generates
  candidate pairs; exact TF-IDF cosine is computed only for candidates
  via a shared-term join. Never an all-pairs product; the blocking-key
  df ceiling bounds per-term fan-out exactly like the LSH band join.
- ``robust_scaler_embeddings`` — per-dimension median/IQR (the robust
  scaler a feature pipeline fits) plus Tukey-fence outlier counts, over
  the posexploded (dim, value) table: 64 × n rows in, 64 rows out,
  exact interpolated percentiles (``percentile`` ↔ ``quantile_cont``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_words

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# kl_divergence_sources — domain shift vs the corpus distribution
# ---------------------------------------------------------------------------


def q_kl_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over word distributions, per source — the
    domain-shift ranking that tells a mixture planner which sources are
    least like the blend. Sum over the source's OWN support only (every
    source word appears in the corpus by construction), 4-dp.
    Tokenization = the shared ``ascii_words`` contract (round-11
    unicode-fuzz)."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(ascii_words(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    src_wc = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("s_n"))
    corp_wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("c_n"))
    src_tot = src_wc.groupBy("source").agg(F.sum("s_n").alias("s_tot"))
    corp_tot = corp_wc.agg(F.sum("c_n").alias("c_tot"))
    p_s = F.col("s_n") / F.col("s_tot")
    p_c = F.col("c_n") / F.col("c_tot")
    return (
        src_wc.join(corp_wc, "word")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(corp_tot))
        .groupBy("source")
        .agg(
            F.first("s_tot").alias("n_tokens"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 4).alias("kl_nats"),
        )
        .orderBy("source")
    )


SQL_KL_DIVERGENCE_SOURCES = r"""
WITH words AS (
  SELECT source, t.word
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
), src_wc AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS s_n FROM words GROUP BY 1, 2
), corp_wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c_n FROM words GROUP BY 1
), src_tot AS (
  SELECT source, CAST(sum(s_n) AS BIGINT) AS s_tot FROM src_wc GROUP BY 1
), corp_tot AS (SELECT CAST(sum(c_n) AS BIGINT) AS c_tot FROM corp_wc)
SELECT source,
       CAST(any_value(s_tot) AS BIGINT) AS n_tokens,
       round(sum((CAST(s_n AS DOUBLE) / s_tot)
                 * ln((CAST(s_n AS DOUBLE) / s_tot)
                      / (CAST(c_n AS DOUBLE) / c_tot))), 4) AS kl_nats
FROM src_wc JOIN corp_wc USING (word) JOIN src_tot USING (source)
CROSS JOIN corp_tot
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# bigram_lm_perplexity — add-one bigram LM scoring per language
# ---------------------------------------------------------------------------


def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an add-one-smoothed bigram LM on the whole corpus, score
    every document's average bigram NLL, report per-language doc counts
    and mean NLL (4 dp). P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).

    Complete-case on doc_id in lockstep (round-10 dirty audit): the
    bigram chain is lead() over (doc_id partition, pos order) — all
    NULL-id docs merge into ONE partition with duplicate pos values,
    whose tie order (and hence bigram multiset) is nondeterministic and
    engine-divergent (the llm8 ngram_novelty class)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tok = docs.select(
        "doc_id",
        "lang",
        F.posexplode(ascii_words("text")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            "doc_id",
            "lang",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cu"))
    v = tok.agg(F.count_distinct("word").alias("v"))
    nll = (
        big.join(cb, ["w1", "w2"])
        .join(cu.withColumnRenamed("word", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id", "lang")
        .agg(
            F.avg(
                -F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("v")))
            ).alias("doc_nll")
        )
    )
    return (
        nll.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_scored"),
            F.round(F.avg("doc_nll"), 4).alias("avg_bigram_nll"),
        )
        .orderBy("lang")
    )


SQL_BIGRAM_LM_PERPLEXITY = r"""
WITH tok AS (
  SELECT doc_id, lang, t.pos, t.word
  FROM documents,
       LATERAL (SELECT generate_subscripts(
                         regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), 1) AS pos,
                       unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> '' AND doc_id IS NOT NULL
), big AS (
  SELECT doc_id, lang, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), big2 AS (SELECT * FROM big WHERE w2 IS NOT NULL),
cb AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM big2 GROUP BY 1, 2
), cu AS (
  SELECT word AS w1, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY 1
), v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM tok),
nll AS (
  SELECT doc_id, lang,
         avg(-ln((cb + 1.0) / (cu + v.v))) AS doc_nll
  FROM big2 JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
  GROUP BY doc_id, lang
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_scored,
       round(avg(doc_nll), 4) AS avg_bigram_nll
FROM nll
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs — rare-term-blocked sparse lexical similarity
# ---------------------------------------------------------------------------

_COS_MIN = 0.3


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by exact TF-IDF cosine (word features),
    candidates blocked on RARE BIGRAMS — canopy-style: only docs sharing
    a bigram with 2 ≤ df ≤ max(5, 2% of docs) are ever compared, so the
    pair space is Σ_rare df² — bounded per blocking key, never |docs|².
    Bigram keys (not unigram) because a dense common vocabulary leaves
    no rare unigrams to block on; at production scale the relative 2%
    ceiling should become an absolute df cap so per-key fan-out stays
    bounded as the corpus grows. The cosine itself is exact over the
    candidates' shared terms (dot) and full vectors (norms).

    Complete-case on doc_id in lockstep (round-10 dirty audit): the
    bigram blocking keys come from lead() over (doc_id, pos) and all
    NULL-id docs merge into one tied-pos partition whose bigrams are
    nondeterministic (the bigram_lm_perplexity class). The final
    threshold compares the 6-dp ROUNDED cosine on BOTH engines (the
    oracle previously filtered the raw value — one-sided membership at
    the boundary)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tok = docs.select(
        "doc_id",
        F.posexplode(ascii_words("text")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wts = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("wt"),
        )
        # materialize once: the weighted postings feed four consumers
        # (norms + both dot sides); without this each consumer re-scans
        # and re-tokenizes the whole corpus
        .localCheckpoint()
    )
    norms = wts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("norm")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    tfb = (
        tok.select(
            "doc_id",
            F.concat_ws("_", "word", F.lead("word").over(w_doc)).alias("bg"),
            F.lead("word").over(w_doc).alias("_nxt"),
        )
        .filter(F.col("_nxt").isNotNull())
        .select("doc_id", "bg")
        .distinct()
        # round-14 (guide §2.4, the r13 repeated-subtree sweep extended
        # to the non-headline registry): tfb feeds THREE consumers (the
        # dfb rare-key build + both blocked self-join sides) and each
        # re-ran the corpus scan + posexplode + lead() window without
        # this — the audited final plan held 6 parquet scans of
        # documents; with the distinct (doc_id, bg) table materialized
        # it holds none
        .localCheckpoint()
    )
    dfb = tfb.groupBy("bg").agg(F.count(F.lit(1)).alias("dfb"))
    rare = (
        dfb.crossJoin(F.broadcast(n))
        .filter(
            (F.col("dfb") >= 2)
            & (
                F.col("dfb")
                <= F.greatest(F.lit(5), F.floor(0.02 * F.col("n_docs")))
            )
        )
        .select("bg")
    )
    blocked = tfb.join(F.broadcast(rare), "bg")
    cand = (
        blocked.alias("a")
        .join(blocked.alias("b"), "bg")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    dots = (
        cand.join(wts.select(F.col("doc_id").alias("d1"), "word",
                             F.col("wt").alias("w1")), "d1")
        .join(wts.select(F.col("doc_id").alias("d2"), "word",
                         F.col("wt").alias("w2")), ["d2", "word"])
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("doc_id").alias("d1"),
                               F.col("norm").alias("norm1")), "d1")
        .join(norms.select(F.col("doc_id").alias("d2"),
                           F.col("norm").alias("norm2")), "d2")
        .select(
            "d1",
            "d2",
            F.round(F.col("dot") / (F.col("norm1") * F.col("norm2")), 6).alias(
                "cos_tfidf"
            ),
        )
        .filter(F.col("cos_tfidf") >= _COS_MIN)
        .orderBy(F.desc("cos_tfidf"), "d1", "d2")
        .limit(20)
    )


SQL_TFIDF_COSINE_PAIRS = rf"""
WITH tok AS (
  SELECT doc_id, t.pos, t.word
  FROM documents,
       LATERAL (SELECT generate_subscripts(
                         regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), 1) AS pos,
                       unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> '' AND doc_id IS NOT NULL
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, word
), df AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
         WHERE doc_id IS NOT NULL),
wts AS (
  SELECT doc_id, word, tf * ln(CAST(n.n_docs AS DOUBLE) / df) AS wt
  FROM tf JOIN df USING (word) CROSS JOIN n
), norms AS (
  SELECT doc_id, sqrt(sum(wt * wt)) AS norm FROM wts GROUP BY doc_id
), tfb AS (
  SELECT DISTINCT doc_id, bg FROM (
    SELECT doc_id,
           word || '_' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bg,
           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM tok
  ) WHERE nxt IS NOT NULL
), dfb AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS dfb FROM tfb GROUP BY bg
), rare AS (
  SELECT bg FROM dfb CROSS JOIN n
  WHERE dfb BETWEEN 2 AND greatest(5, CAST(floor(0.02 * n.n_docs) AS BIGINT))
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM tfb a JOIN tfb b ON a.bg = b.bg AND a.doc_id < b.doc_id
  WHERE a.bg IN (SELECT bg FROM rare)
), dots AS (
  SELECT c.d1, c.d2, sum(wa.wt * wb.wt) AS dot
  FROM cand c
  JOIN wts wa ON wa.doc_id = c.d1
  JOIN wts wb ON wb.doc_id = c.d2 AND wb.word = wa.word
  GROUP BY c.d1, c.d2
)
SELECT d1, d2, round(dot / (na.norm * nb.norm), 6) AS cos_tfidf
FROM dots JOIN norms na ON na.doc_id = d1 JOIN norms nb ON nb.doc_id = d2
WHERE round(dot / (na.norm * nb.norm), 6) >= {_COS_MIN}
ORDER BY cos_tfidf DESC, d1, d2
LIMIT 20
"""


# ---------------------------------------------------------------------------
# robust_scaler_embeddings — per-dimension median/IQR + Tukey outliers
# ---------------------------------------------------------------------------


def q_robust_scaler_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension robust-scaler fit over the embedding matrix:
    median, IQR (exact interpolated percentiles), and the count of
    values outside the 1.5·IQR Tukey fences. 64 rows out regardless of
    corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    stats = vals.groupBy("dim").agg(
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.5)").alias("med"),
        F.expr("percentile(v, 0.75)").alias("q3"),
    )
    fenced = vals.join(F.broadcast(stats), "dim").select(
        "dim",
        "v",
        "med",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (
            (F.col("v") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("v") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        ).alias("is_out"),
    )
    return (
        fenced.groupBy("dim")
        .agg(
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("iqr"), 6).alias("iqr"),
            F.sum(F.col("is_out").cast("long")).alias("n_outliers"),
        )
        .orderBy("dim")
    )


SQL_ROBUST_SCALER_EMBEDDINGS = """
WITH vals AS (
  SELECT t.dim - 1 AS dim, CAST(t.v AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS dim,
                       unnest(embedding) AS v) t
), stats AS (
  SELECT dim, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS med,
         quantile_cont(v, 0.75) AS q3
  FROM vals GROUP BY dim
)
SELECT CAST(vals.dim AS INT) AS dim,
       round(any_value(med), 6) AS median,
       round(any_value(q3 - q1), 6) AS iqr,
       CAST(sum(CASE WHEN v < q1 - 1.5 * (q3 - q1)
                       OR v > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM vals JOIN stats ON vals.dim = stats.dim
GROUP BY vals.dim
ORDER BY dim
"""


REGISTRY_LLM11: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "kl_divergence_sources": (q_kl_divergence_sources, SQL_KL_DIVERGENCE_SOURCES),
    "bigram_lm_perplexity": (q_bigram_lm_perplexity, SQL_BIGRAM_LM_PERPLEXITY),
    "tfidf_cosine_pairs": (q_tfidf_cosine_pairs, SQL_TFIDF_COSINE_PAIRS),
    "robust_scaler_embeddings": (
        q_robust_scaler_embeddings,
        SQL_ROBUST_SCALER_EMBEDDINGS,
    ),
}
