"""LLM-data batch 12 (round 4 cont.): winnowing document fingerprints
and chunk-overlap auditing.

- ``winnow_fingerprints`` — the MOSS/winnowing fingerprint scheme: hash
  every char k-gram, keep the MINIMUM hash in each sliding window of w
  consecutive k-grams, dedupe. Winnowing guarantees any shared
  substring of length ≥ k + w − 1 contributes at least one shared
  fingerprint, at a ~2/(w+1) selection density — the principled
  fingerprinting scheme behind plagiarism/near-dup detectors. The whole
  selection is ONE in-row Column expression (no explode until the tiny
  selected-fingerprint set); cross-doc candidate pairs come from a
  df-bounded blocking join exactly like the other candidate engines.
- ``chunk_overlap_audit`` — reconstructs ``doc_chunking``'s 64-char /
  48-stride chunks and detects their 16-char overlaps from CONTENT
  alone (tail-16 = head-16 key join), then reconciles detected pairs
  against the positionally-expected adjacency count. This is the audit
  a RAG/packing pipeline runs to prove its chunker's overlap invariant
  survived a distributed rewrite — and the tail/head key join is the
  boilerplate-boundary detector for free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

_WK = 8  # k-gram length (chars)
_WW = 4  # winnowing window (k-grams); guarantee threshold = k + w - 1 = 11
_W_DF_MIN = 2
_W_DF_MAX = 10


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by count of shared winnowing fingerprints
    (k=8 chars, w=4). Fingerprint selection is in-row; only the
    selected set (≈2/(w+1) of k-grams) explodes. Blocking keeps only
    DISTINCTIVE fingerprints (2 ≤ df ≤ 10) so the pair space is
    Σ df² — bounded per fingerprint, never |docs|²."""
    docs = _t(spark, sf_dir, "documents")
    fps = F.expr(
        f"""
        case when length(text) < {_WK + _WW - 1} then cast(array() as array<bigint>)
        else array_sort(array_distinct(
          transform(sequence(1, length(text) - {_WK + _WW - 2}),
            j -> array_min(transform(sequence(j, j + {_WW - 1}),
              i -> cast(conv(substr(md5(substr(text, i, {_WK})), 1, 8), 16, 10)
                        as bigint))))
        )) end
        """
    )
    doc_fp = docs.select("doc_id", F.explode(fps).alias("fp"))
    dfp = doc_fp.groupBy("fp").agg(F.count(F.lit(1)).alias("dfp"))
    distinctive = dfp.filter(
        (F.col("dfp") >= _W_DF_MIN) & (F.col("dfp") <= _W_DF_MAX)
    ).select("fp")
    blocked = doc_fp.join(distinctive, "fp")
    return (
        blocked.alias("a")
        .join(blocked.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .orderBy(F.desc("n_shared_fps"), "d1", "d2")
        .limit(20)
    )


SQL_WINNOW_FINGERPRINTS = f"""
WITH doc_fp AS (
  SELECT doc_id, t.fp
  FROM documents,
       LATERAL (SELECT unnest(
         CASE WHEN len(text) < {_WK + _WW - 1} THEN []::BIGINT[]
         ELSE list_sort(list_distinct(
           list_transform(range(1, len(text) - {_WK + _WW - 2} + 1),
             j -> list_min(list_transform(range(j, j + {_WW}),
               i -> CAST(concat('0x', substr(md5(substr(text, i, {_WK})), 1, 8))
                         AS BIGINT))))
         )) END) AS fp) t
), dfp AS (
  SELECT fp, CAST(count(*) AS BIGINT) AS dfp FROM doc_fp GROUP BY fp
), blocked AS (
  SELECT doc_fp.doc_id, doc_fp.fp
  FROM doc_fp JOIN dfp USING (fp)
  WHERE dfp BETWEEN {_W_DF_MIN} AND {_W_DF_MAX}
)
SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_shared_fps
FROM blocked a JOIN blocked b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY n_shared_fps DESC, d1, d2
LIMIT 20
"""


_CHUNK = 64
_STRIDE = 48
_OVL = _CHUNK - _STRIDE  # 16-char overlap


def q_chunk_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row reconciliation of content-detected chunk overlaps vs the
    positional adjacency the 64/48 chunker guarantees: every FULL chunk
    shares its 16-char tail with the next chunk's head. ``n_detected ≥
    n_expected`` always (equality unless distinct positions happen to
    carry identical 16-char keys); ``n_cross_doc`` counts detections
    joining chunks of different documents — boilerplate boundaries."""
    docs = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_STRIDE)
    )
    chunks = (
        docs.select("doc_id", F.explode(starts).alias("start"), "text")
        .select(
            "doc_id",
            "start",
            F.substring("text", F.col("start"), _CHUNK).alias("chunk"),
        )
        .select(
            "doc_id",
            "start",
            F.length("chunk").alias("clen"),
            F.substring("chunk", 1, _OVL).alias("head_k"),
            F.when(
                F.length("chunk") == _CHUNK,
                F.substring("chunk", _CHUNK - _OVL + 1, _OVL),
            ).alias("tail_k"),
        )
        .localCheckpoint()
    )
    n_chunks = chunks.agg(F.count(F.lit(1)).alias("n_chunks"))
    expected = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.start") == F.col("a.start") + _STRIDE),
        )
        .filter(F.col("a.tail_k").isNotNull())
        .agg(F.count(F.lit(1)).alias("n_expected"))
    )
    det = (
        chunks.filter(F.col("tail_k").isNotNull())
        .alias("a")
        .join(
            chunks.filter(F.length("head_k") == _OVL).alias("b"),
            F.col("a.tail_k") == F.col("b.head_k"),
        )
        .filter(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            | (F.col("a.start") != F.col("b.start"))
        )
        .agg(
            F.count(F.lit(1)).alias("n_detected"),
            F.sum(
                (F.col("a.doc_id") != F.col("b.doc_id")).cast("long")
            ).alias("n_cross_doc"),
        )
    )
    return (
        n_chunks.crossJoin(F.broadcast(expected))
        .crossJoin(F.broadcast(det))
        .select("n_chunks", "n_expected", "n_detected", "n_cross_doc")
    )


SQL_CHUNK_OVERLAP_AUDIT = f"""
WITH chunks AS (
  SELECT doc_id, s.start,
         substr(text, CAST(s.start AS INT), {_CHUNK}) AS chunk
  FROM documents,
       LATERAL (SELECT unnest(range(1, greatest(len(text), 1) + 1, {_STRIDE}))
                  AS start) s
), keyed AS (
  SELECT doc_id, start, len(chunk) AS clen,
         substr(chunk, 1, {_OVL}) AS head_k,
         CASE WHEN len(chunk) = {_CHUNK}
              THEN substr(chunk, {_CHUNK - _OVL + 1}, {_OVL}) END AS tail_k
  FROM chunks
), n_chunks AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks FROM keyed),
expected AS (
  SELECT CAST(count(*) AS BIGINT) AS n_expected
  FROM keyed a JOIN keyed b
    ON a.doc_id = b.doc_id AND b.start = a.start + {_STRIDE}
  WHERE a.tail_k IS NOT NULL
), det AS (
  SELECT CAST(count(*) AS BIGINT) AS n_detected,
         CAST(sum(CASE WHEN a.doc_id <> b.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cross_doc
  FROM keyed a JOIN keyed b ON a.tail_k = b.head_k
  WHERE a.tail_k IS NOT NULL AND len(b.head_k) = {_OVL}
    AND (a.doc_id <> b.doc_id OR a.start <> b.start)
)
SELECT n_chunks, n_expected, n_detected, n_cross_doc
FROM n_chunks CROSS JOIN expected CROSS JOIN det
"""


_SWEEP_TS = (0.5, 0.6, 0.7, 0.8, 0.9)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold cost/benefit curve: for τ ∈ {0.5 … 0.9}, how
    many 3-gram-Jaccard pairs clear τ and how many documents the
    min-id-survivor rule would drop. ONE pass computes the pair
    Jaccards (shared-shingle inverted-index join, bounded like
    ``ngram_jaccard``); the sweep is an in-row threshold explode over
    the tiny pair table — five dedup jobs' planning numbers for the
    price of one. The drop count uses the curation convention (a doc
    drops when a smaller-id partner exists at ≥ τ)."""
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=min(_SWEEP_TS))
    swept = pairs.select(
        "jaccard",
        "doc_b",
        F.explode(F.array(*[F.lit(t) for t in _SWEEP_TS])).alias("threshold"),
    ).filter(F.col("jaccard") >= F.col("threshold"))
    return (
        swept.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("doc_b").alias("n_docs_dropped"),
        )
        .orderBy("threshold")
    )


SQL_DEDUP_THRESHOLD_SWEEP = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), '[\s\x0b]+') AS words FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM w, unnest(range(1, len(words) - 1)) AS t(i)
  WHERE len(words) >= 3
), cnt AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT doc_b, round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 6) AS jaccard
  FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
), swept AS (
  -- ::DOUBLE[]: a bare decimal literal list realizes as DECIMAL(2,1),
  -- which the driver's type-realization-sensitive hash rejects
  SELECT t.threshold, jaccard, doc_b
  FROM jac CROSS JOIN (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[])
                         AS threshold) t
  WHERE jaccard >= t.threshold
)
SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
FROM swept
GROUP BY threshold
ORDER BY threshold
"""


REGISTRY_LLM12: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "chunk_overlap_audit": (q_chunk_overlap_audit, SQL_CHUNK_OVERLAP_AUDIT),
    "dedup_threshold_sweep": (q_dedup_threshold_sweep, SQL_DEDUP_THRESHOLD_SWEEP),
}
