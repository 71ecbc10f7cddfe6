"""LLM-data-pipeline queries, batch 4 (round 3): RAG-style document
chunking, bigram vocabulary induction, int8 embedding quantization error,
end-to-end dedup survivor accounting, deterministic per-shard quota
sampling, and token-length batching histograms.

Batch 2 covered corpus hygiene (dedup, PII, packing, contamination) and
batch 3 corpus composition (mixture weights, heavy hitters, cluster
tightness); this batch covers the SERVING/prep side: how documents become
retrieval chunks, how a tokenizer's vocab is seeded, how embeddings
compress, and how batches pad. All arithmetic is engine-portable (integer
math, md5 fingerprints, element-wise double ops with identical evaluation
order), so every query carries an exact DuckDB oracle; aggregates over
chunk/bigram sets are order-independent (counts, sums, min/max of md5
hex), never a position-dependent concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t

_CHUNK = 64  # chars per chunk
_STRIDE = 48  # chunk stride (overlap = _CHUNK - _STRIDE)


# ---------------------------------------------------------------------------
# doc_chunking — fixed-size overlapping chunks (RAG ingestion shape)
# ---------------------------------------------------------------------------


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking: every document explodes into
    64-char chunks on a 48-char stride (1-based substring starts
    1, 49, 97, ... ≤ length). The explode is linear in corpus bytes and
    happens BEFORE any shuffle — the only exchange is the final per-lang
    aggregate. Chunk content is pinned order-independently via min/max of
    the per-chunk md5 (hex compares identically in both engines)."""
    docs = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_STRIDE)
    )
    chunks = docs.select(
        "lang",
        F.explode(starts).alias("start"),
        F.col("text"),
    ).select("lang", F.substring("text", F.col("start"), _CHUNK).alias("chunk"))
    return (
        chunks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.length("chunk")).alias("chunk_chars"),
            F.min(F.md5(F.col("chunk").cast("binary"))).alias("min_chunk_md5"),
            F.max(F.md5(F.col("chunk").cast("binary"))).alias("max_chunk_md5"),
        )
        .orderBy("lang")
    )


SQL_DOC_CHUNKING = f"""
WITH chunks AS (
  SELECT lang, substr(text, CAST(s.start AS INT), {_CHUNK}) AS chunk
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, greatest(length(text), 1),
                                              {_STRIDE})) AS start) s
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(length(chunk)) AS BIGINT) AS chunk_chars,
       min(md5(chunk)) AS min_chunk_md5,
       max(md5(chunk)) AS max_chunk_md5
FROM chunks
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# bigram_vocab — top word bigrams per language (vocab induction seed)
# ---------------------------------------------------------------------------


def q_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 word bigrams per language by document frequency-weighted
    count: adjacent word pairs built with a zero-shuffle array transform
    (no self-join on position — the classic n-gram-via-join anti-pattern
    re-expressed as ``transform(sequence(...))`` inside the row), then one
    count shuffle and a per-lang top-k window over the counted (small)
    result. Deterministic (count DESC, bigram ASC) ranking."""
    docs = _t(spark, sf_dir, "documents")
    # project the split array ONCE, then derive bigrams from the column
    # in a second select: Spark does no common-subexpression
    # elimination inside lambda bodies, so the old inline form rebuilt
    # the full words array TWICE PER ELEMENT — the O(n_words^2)
    # no-CSE-in-lambda class measured at ~200x on char_entropy
    # (round-10 review)
    ws = docs.select("lang", F.split("text", " ").alias("ws"))
    bigrams = F.when(
        F.size("ws") >= 2,
        F.expr("transform(sequence(0, size(ws) - 2), i -> ws[i] || ' ' || ws[i + 1])"),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        ws.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .orderBy("lang", "rk")
    )


SQL_BIGRAM_VOCAB = """
WITH words AS (
  SELECT lang, string_split(text, ' ') AS ws FROM documents
), bigrams AS (
  SELECT lang, unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM words WHERE len(ws) >= 2
), counted AS (
  SELECT lang, bigram, CAST(count(*) AS BIGINT) AS cnt
  FROM bigrams GROUP BY lang, bigram
)
SELECT lang, bigram, cnt,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY cnt DESC, bigram ASC) AS BIGINT) AS rk
FROM counted
QUALIFY rk <= 10
ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# embedding_quantize — int8 scalar quantization reconstruction error
# ---------------------------------------------------------------------------


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization QUALITY per label cluster (the error side
    of what ``quantize_embeddings`` in the core registry emits as
    quantized values): each vector is quantized with its own scale
    (127 / max|v|), reconstructed, and the per-vector MSE averaged per
    label. Entirely element-wise Column
    lambdas (transform/aggregate) — no UDF, no shuffle before the final
    small aggregate; the evaluation order inside each vector is the array
    order in BOTH engines, so per-vector error is bit-identical and the
    per-label mean only averages ~hundreds of values (noise ≪ rounding).

    Routes through _emb_clean + a lockstep NULL-label filter: interior
    NULLs poison the Spark error fold asymmetrically and a zero-norm
    vector divides by a zero scale (round-8 parity audit)."""
    emb = _emb_clean(spark, sf_dir).where(F.col("label").isNotNull())
    v = F.transform("embedding", lambda x: x.cast("double"))
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = F.lit(127.0) / absmax
    err2 = F.aggregate(
        F.transform(v, lambda x: F.pow(x - F.round(x * scale) / scale, F.lit(2.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    per_vec = emb.select(
        "label", (err2 / F.size("embedding")).alias("_mse")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("_mse"), 8).alias("avg_mse"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_QUANTIZE = f"""
WITH v AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
  WHERE label IS NOT NULL AND {EMB_CLEAN_SQL}
), scaled AS (
  SELECT label, vec,
         127.0 / list_aggregate(list_transform(vec, x -> abs(x)), 'max') AS scale
  FROM v
), per_vec AS (
  SELECT label,
         list_aggregate(list_transform(vec,
             x -> pow(x - round(x * scale) / scale, 2.0)), 'sum')
           / len(vec) AS mse
  FROM scaled
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(mse), 8) AS avg_mse
FROM per_vec
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# dedup_survivors — end-to-end exact-dedup accounting per language
# ---------------------------------------------------------------------------


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivor accounting: documents fingerprinted by the
    normalized ``doc_fingerprint`` (lowercase / punctuation-strip /
    whitespace-collapse / trim), survivor = min doc_id per fingerprint
    (the same contract as ``llmdata.dedup.exact_dedup``, which this
    calls directly),
    then per-lang totals / survivors / removed. One shuffle on the
    fingerprint, one on lang — both unavoidable and both map-side
    combined. The removed count is the dedup rate a crawl round reports."""
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    survivors = exact_dedup(docs, text_col="text", id_col="doc_id")
    total = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n_survivors"))
    # null-safe (<=>) lang join: a NULL-lang group's survivor count must
    # land on its total row, not fall out of the equi-join
    return (
        total.alias("t")
        .join(kept.alias("k"), F.expr("t.lang <=> k.lang"), "left")
        .select(
            F.col("t.lang").alias("lang"),
            "n_docs",
            F.coalesce("n_survivors", F.lit(0)).alias("n_survivors"),
            (F.col("n_docs") - F.coalesce("n_survivors", F.lit(0))).alias("n_removed"),
        )
        .orderBy("lang")
    )


SQL_DEDUP_SURVIVORS = r"""
WITH ranked AS (
  -- the FULL doc_fingerprint normalization (lowercase, punctuation-
  -- strip, whitespace-collapse, final trim) in lockstep with the
  -- Spark side's exact_dedup: raw md5(text) would keep normalization-
  -- only duplicates ('Hello!' vs 'hello') as survivors here while the
  -- engine removes them (round-9 advisor catch)
  SELECT lang, doc_id, text,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(regexp_replace(
             trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')), '[^a-z0-9\s\x0b]', '', 'g'), '[\s\x0b]+', ' ', 'g'), ' '))
           ORDER BY doc_id) AS rn
  FROM documents
), flagged AS (
  -- survivor rule in lockstep with exact_dedup: min-id per fingerprint
  -- among non-NULL (text, id) docs; NULL-text / NULL-id docs pass
  -- through as survivors (no evidence of duplication)
  SELECT lang,
         CASE WHEN text IS NULL OR doc_id IS NULL THEN 1
              WHEN rn = 1 THEN 1 ELSE 0 END AS survivor
  FROM ranked
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(survivor) AS BIGINT) AS n_survivors,
       CAST(sum(1 - survivor) AS BIGINT) AS n_removed
FROM flagged
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# quota_sample_docs — deterministic per-shard quota (exact-N) sampling
# ---------------------------------------------------------------------------

_QUOTA = 50


def q_quota_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N quota sampling per language: rank documents by
    md5(doc_id) — a stable, data-independent pseudo-random order — and
    keep the first 50 per lang. Complements ``stratified_sample_docs``
    (hash-THRESHOLD sampling: exact expected rate, no window) with the
    exact-COUNT contract (needs a per-shard top-k, here via window; at
    100 TB per-shard rank over a hash is still the standard quota plan —
    the window partitions by shard, not globally).

    Complete-case on doc_id in lockstep (round-10 review): the sample
    order is md5(doc_id) — a NULL id has no draw, ranks on OPPOSITE
    ends per engine (Spark NULLS FIRST / DuckDB LAST at the quota
    boundary), and several NULL-id rows tie nondeterministically."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tagged = docs.select(
        "lang", "n_chars", F.md5(F.col("doc_id").cast("string").cast("binary")).alias("_h")
    )
    w = Window.partitionBy("lang").orderBy("_h")
    picked = tagged.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _QUOTA
    )
    return (
        picked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("_h").alias("first_hash"),
            F.max("_h").alias("last_hash"),
        )
        .orderBy("lang")
    )


SQL_QUOTA_SAMPLE_DOCS = f"""
WITH tagged AS (
  SELECT lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
  WHERE doc_id IS NOT NULL
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       min(h) AS first_hash,
       max(h) AS last_hash
FROM tagged
WHERE rk <= {_QUOTA}
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# token_length_buckets — padding-efficiency histogram
# ---------------------------------------------------------------------------

_BUCKET_W = 50


def q_token_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batching histogram: documents bucketed by whitespace token count
    (width-50 buckets), with per-bucket doc count, token totals, and the
    min/max length inside the bucket — the statistic that sizes padded
    batch waste (tokens_max*n - tokens_sum per bucket ≈ pad cost). Pure
    scan + one aggregate; integer arithmetic end to end."""
    from ra2_datalake_linaresjoan_spark.llmdata.packing import whitespace_tokens

    docs = _t(spark, sf_dir, "documents")
    toks = whitespace_tokens("text").cast("long")
    return (
        docs.select((toks / _BUCKET_W).cast("long").alias("bucket"), toks.alias("t"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("tokens_sum"),
            F.min("t").alias("tokens_min"),
            F.max("t").alias("tokens_max"),
        )
        .orderBy("bucket")
    )


SQL_TOKEN_LENGTH_BUCKETS = rf"""
WITH tok AS (
  SELECT CAST(len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) AS BIGINT) AS t
  FROM documents
)
SELECT CAST(t // {_BUCKET_W} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS tokens_sum,
       CAST(min(t) AS BIGINT) AS tokens_min,
       CAST(max(t) AS BIGINT) AS tokens_max
FROM tok
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# quality_curriculum — decile binning by quality score, no global window
# ---------------------------------------------------------------------------


def q_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/quality-pruning bins: documents bucketed into quality
    DECILES with per-bin counts and char mass — the statistic behind
    "train on the top-k% by quality" schedules. Scale shape: decile
    boundaries come from ONE 1-row exact-percentile aggregate (swap in
    ``approx_percentile`` at 100 TB, identical plan) broadcast back;
    each doc's bin is `#thresholds below score` via an array lambda —
    no global ntile window, no single-partition sort of the corpus."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("n_chars", quality_score(F.col("text")).alias("s"))
    qs = ", ".join(str(q / 10) for q in range(1, 10))
    # thresholds round to the 6-dp grid the SCORES live on: Spark's
    # percentile and DuckDB's quantile_cont interpolate with different
    # operation orders and can land 1 ULP apart (observed: 0.452 vs
    # 0.45199999999999996 on the round-13 dirty corpus), flipping
    # `s > t` for a score sitting exactly on a decile boundary
    thresholds = scored.agg(
        F.expr(f"transform(percentile(s, array({qs})), t -> round(t, 6))")
        .alias("_thr")
    )
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .select(
            F.size(F.filter("_thr", lambda t: F.col("s") > t))
            .cast("long")
            .alias("decile"),
            "s",
            "n_chars",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("s"), 6).alias("avg_quality"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("decile")
    )


SQL_QUALITY_CURRICULUM = r"""
WITH feat AS (
  SELECT n_chars,
         CASE WHEN trim(text, ' ') = '' OR text IS NULL THEN 0
              ELSE len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) END AS n_tok,
         regexp_replace(text, '[\s\x0b]', '', 'g') AS nospace,
         regexp_split_to_array(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), '[\s\x0b]+') AS words
  FROM documents
), comp AS (
  SELECT n_chars,
         least(n_tok / 200.0, 1.0) AS len_score,
         CASE WHEN length(nospace) = 0 THEN 0.0
              ELSE length(regexp_replace(nospace, '[\p{L}\p{N}_]', '', 'g')) * 1.0 / length(nospace)
         END AS p,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE len(list_filter(words, x -> list_contains(['the','a','of','and','is'], x))) * 1.0 / len(words)
         END AS sw
  FROM feat
), scored AS (
  SELECT n_chars,
         round(0.4 * len_score + 0.3 * (1.0 - p)
               + 0.3 * (CASE WHEN sw >= 0.02 AND sw <= 0.6 THEN 1.0 ELSE 0.5 END), 6) AS s
  FROM comp
), thr AS (
  SELECT list_transform(
           quantile_cont(s, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           t -> round(t, 6)) AS arr
  FROM scored
)
SELECT CAST(len(list_filter(thr.arr, t -> scored.s > t)) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(scored.s), 6) AS avg_quality,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM scored CROSS JOIN thr
GROUP BY 1
ORDER BY decile
"""


REGISTRY_LLM4 = {
    "doc_chunking": (q_doc_chunking, SQL_DOC_CHUNKING),
    "bigram_vocab": (q_bigram_vocab, SQL_BIGRAM_VOCAB),
    "embedding_quantize": (q_embedding_quantize, SQL_EMBEDDING_QUANTIZE),
    "dedup_survivors": (q_dedup_survivors, SQL_DEDUP_SURVIVORS),
    "quota_sample_docs": (q_quota_sample_docs, SQL_QUOTA_SAMPLE_DOCS),
    "token_length_buckets": (q_token_length_buckets, SQL_TOKEN_LENGTH_BUCKETS),
    "quality_curriculum": (q_quality_curriculum, SQL_QUALITY_CURRICULUM),
}
