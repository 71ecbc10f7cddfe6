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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t

_SPLIT_TRAIN = 90  # buckets 0-89
_SPLIT_VAL = 95  # buckets 90-94; 95-99 = test


def q_stratified_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, split) counts and observed shares for the 90/5/5
    hash split, with the target share alongside — the audit row a
    datacard quotes. One scan, one lang×3 aggregate."""
    docs = _t(spark, sf_dir, "documents")
    # NULL sentinel in the id hash (lockstep '0x'-cast parity)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>"))
                ),
                1,
                8,
            ),
            16,
            10,
        )
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
           WHEN CAST(concat('0x', substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<null>')), 1, 8))
                     AS BIGINT) % 100 < {_SPLIT_TRAIN} THEN 'train'
           WHEN CAST(concat('0x', substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<null>')), 1, 8))
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
  SELECT len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) AS n_tok,
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


def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode verified end-to-end: every 5th doc_id seeds a
    deterministic 4×4 RGB image (pixel (y,x,c) = (doc_id·31 + y·16 +
    x·4 + c) mod 256), which the UDF encodes to binary PPM, decodes
    back through the REAL numpy codec, nearest-neighbor-resizes to 2×2
    (pixel-center rows/cols 1 and 3), and summarizes as 10 features per
    image state (3 channel means, 3 channel stds, 4 luminance-bin
    shares). Because the pixels are a closed-form function of doc_id,
    the DuckDB oracle reproduces the expected features WITHOUT any
    decoding — so a hash match proves the encode→decode→resize pixel
    path is exact, not just schema-compatible. Stds use the
    sum-of-squares formula and means/counts are exact integers; the
    only float-order divergence (16-term std sums) sits ~1e-10 below
    the 6-dp round. Arrow-batched mapInPandas, one scan, output is
    (doc, kind, feature) grain."""
    from collections.abc import Iterator

    import pandas as pd

    from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    docs = _t(spark, sf_dir, "documents")
    sel = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")

    def _feats(arr) -> list[float]:
        flat = [
            (float(arr[y, x, 0]), float(arr[y, x, 1]), float(arr[y, x, 2]))
            for y in range(arr.shape[0])
            for x in range(arr.shape[1])
        ]
        n = len(flat)
        out = []
        for c in range(3):
            s = sum(p[c] for p in flat)
            s2 = sum(p[c] * p[c] for p in flat)
            out.append(s / n)
            out.append((s2 / n - (s / n) ** 2) ** 0.5)
        means = [out[0], out[2], out[4]]
        stds = [out[1], out[3], out[5]]
        bins = [0, 0, 0, 0]
        for r, g, b in flat:
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            bins[min(3, int(luma * 4 / 255.000000001))] += 1
        return means + stds + [bc / n for bc in bins]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, kinds, idxs, vals = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                arr = np.fromfunction(
                    lambda y, x, c: (did * 31 + y * 16 + x * 4 + c) % 256,
                    (4, 4, 3),
                    dtype=np.int64,
                ).astype(np.uint8)
                dec = decode_image(encode_ppm(arr))
                small = resize_nearest(dec, 2, 2)
                for kind, img in (("full", dec), ("resized", small)):
                    for i, v in enumerate(_feats(img)):
                        ids.append(did)
                        kinds.append(kind)
                        idxs.append(i)
                        vals.append(round(v, 6))
            yield pd.DataFrame(
                {"doc_id": ids, "kind": kinds, "feat_idx": idxs, "val": vals}
            )

    return (
        sel.mapInPandas(run, schema="doc_id long, kind string, feat_idx int, val double")
        .orderBy("doc_id", "kind", "feat_idx")
    )


SQL_MULTIMODAL_REAL_DECODE = """
WITH sel AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
px AS (
  SELECT s.doc_id, y.y, x.x,
         CAST((s.doc_id * 31 + y.y * 16 + x.x * 4 + 0) % 256 AS DOUBLE) AS r,
         CAST((s.doc_id * 31 + y.y * 16 + x.x * 4 + 1) % 256 AS DOUBLE) AS g,
         CAST((s.doc_id * 31 + y.y * 16 + x.x * 4 + 2) % 256 AS DOUBLE) AS b
  FROM sel s
  CROSS JOIN (SELECT unnest(range(0, 4)) AS y) y
  CROSS JOIN (SELECT unnest(range(0, 4)) AS x) x
), base AS (
  SELECT doc_id, 'full' AS kind, r, g, b FROM px
  UNION ALL
  SELECT doc_id, 'resized', r, g, b FROM px WHERE y IN (1, 3) AND x IN (1, 3)
), lumad AS (
  SELECT *, least(CAST(floor((0.299 * r + 0.587 * g + 0.114 * b) * 4
                             / 255.000000001) AS INT), 3) AS bin
  FROM base
), agg AS (
  SELECT doc_id, kind,
         avg(r) AS m0, avg(g) AS m1, avg(b) AS m2,
         sqrt(avg(r * r) - avg(r) * avg(r)) AS s0,
         sqrt(avg(g * g) - avg(g) * avg(g)) AS s1,
         sqrt(avg(b * b) - avg(b) * avg(b)) AS s2,
         sum(CASE WHEN bin = 0 THEN 1.0 ELSE 0 END) / count(*) AS h0,
         sum(CASE WHEN bin = 1 THEN 1.0 ELSE 0 END) / count(*) AS h1,
         sum(CASE WHEN bin = 2 THEN 1.0 ELSE 0 END) / count(*) AS h2,
         sum(CASE WHEN bin = 3 THEN 1.0 ELSE 0 END) / count(*) AS h3
  FROM lumad
  GROUP BY doc_id, kind
)
SELECT doc_id, kind, CAST(t.feat_idx AS INT) AS feat_idx,
       round(CASE t.feat_idx
         WHEN 0 THEN m0 WHEN 1 THEN m1 WHEN 2 THEN m2
         WHEN 3 THEN s0 WHEN 4 THEN s1 WHEN 5 THEN s2
         WHEN 6 THEN h0 WHEN 7 THEN h1 WHEN 8 THEN h2 ELSE h3 END, 6) AS val
FROM agg CROSS JOIN (SELECT unnest(range(0, 10)) AS feat_idx) t
ORDER BY doc_id, kind, feat_idx
"""


def q_audio_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode verified end-to-end (the WAV sibling of
    ``multimodal_real_decode``): every 3rd doc_id seeds 32 deterministic
    stereo PCM-16 samples (sample (i, ch) = (doc_id·7 + i·3 + ch) mod
    201 − 100), encoded to RIFF/WAVE, decoded back through the REAL
    numpy codec, and summarized channel-major as mean / RMS /
    zero-crossing rate (strict sign product < 0) / peak — the
    silence/clipping/DC screens an audio curation pass runs. The DuckDB
    oracle reproduces the expected features in closed form from doc_id
    WITHOUT decoding, so a hash match proves the WAV encode→decode
    sample path is exact. Integer sums keep mean/RMS/peak bit-stable;
    6-dp round."""
    from collections.abc import Iterator

    import pandas as pd

    from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    docs = _t(spark, sf_dir, "documents")
    sel = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, vals = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                s = np.fromfunction(
                    lambda i, ch: (did * 7 + i * 3 + ch) % 201 - 100,
                    (32, 2),
                    dtype=np.int64,
                ).astype(np.int16)
                dec, sr = decode_wav(encode_wav(s, 16_000))
                assert sr == 16_000
                for i, v in enumerate(audio_features(dec)):
                    ids.append(did)
                    idxs.append(i)
                    vals.append(round(v, 6))
            yield pd.DataFrame({"doc_id": ids, "feat_idx": idxs, "val": vals})

    return sel.mapInPandas(
        run, schema="doc_id long, feat_idx int, val double"
    ).orderBy("doc_id", "feat_idx")


SQL_AUDIO_REAL_DECODE = """
WITH sel AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
smp AS (
  SELECT s.doc_id, i.i, ch.ch,
         CAST((s.doc_id * 7 + i.i * 3 + ch.ch) % 201 - 100 AS DOUBLE) AS x
  FROM sel s
  CROSS JOIN (SELECT unnest(range(0, 32)) AS i) i
  CROSS JOIN (SELECT unnest(range(0, 2)) AS ch) ch
), lagd AS (
  SELECT *, lead(x) OVER (PARTITION BY doc_id, ch ORDER BY i) AS nxt FROM smp
), agg AS (
  SELECT doc_id, ch,
         avg(x) AS mean_x,
         sqrt(avg(x * x)) AS rms,
         sum(CASE WHEN nxt IS NOT NULL AND x * nxt < 0 THEN 1.0 ELSE 0 END)
           / (count(*) - 1) AS zcr,
         max(abs(x)) AS peak
  FROM lagd GROUP BY doc_id, ch
)
SELECT doc_id, CAST(ch * 4 + f.k AS INT) AS feat_idx,
       round(CASE f.k WHEN 0 THEN mean_x WHEN 1 THEN rms
                      WHEN 2 THEN zcr ELSE peak END, 6) AS val
FROM agg CROSS JOIN (SELECT unnest(range(0, 4)) AS k) f
ORDER BY doc_id, feat_idx
"""


REGISTRY_LLM13: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "stratified_split_assign": (q_stratified_split_assign, SQL_STRATIFIED_SPLIT_ASSIGN),
    "padding_waste_sweep": (q_padding_waste_sweep, SQL_PADDING_WASTE_SWEEP),
    "multimodal_real_decode": (q_multimodal_real_decode, SQL_MULTIMODAL_REAL_DECODE),
    "audio_real_decode": (q_audio_real_decode, SQL_AUDIO_REAL_DECODE),
}


_COV_TS = (0.5, 0.9, 0.95, 0.99)


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest top-k vocabulary whose
    cumulative occurrence share reaches 50/90/95/99% of all tokens —
    the first number a tokenizer-vocabulary plan reads (how big must
    the vocab be before <unk> is rare).

    Scale shape — count-bucket rank aggregation, NOT a per-word window:
    web-scale vocabulary is heavy-tailed and grows with the corpus
    (typos/URLs/ids), so ranking every distinct word in one global
    window is a corpus-sized single task. Instead words are grouped by
    their occurrence count n into buckets (n, #words, mass); since the
    distinct counts c₁>c₂>… satisfy Σcᵢ ≤ total_tokens, there are at
    most √(2·total_tokens) buckets — the global window runs over THAT
    provably bounded table (~3M rows even at 10¹³ tokens). Within a
    bucket all words have equal count, so the rank where cumulative
    mass crosses a threshold is closed-form:
    m = ceil((t·total − mass_before)/n), vocab_k = words_before + m,
    covered = mass_before + m·n — identical to the per-word running sum
    (the per-word tie-break can't matter when counts are equal). The
    DuckDB oracle keeps the per-word formulation, so parity checks the
    two formulations against each other. Exact integer counts; shares
    at 6 dp. Tokenization = the shared ``ascii_words`` contract
    (round-11 unicode-fuzz)."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(ascii_words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    buckets = wc.groupBy("n").agg(F.count(F.lit(1)).alias("n_words"))
    w = Window.orderBy(F.desc("n")).rowsBetween(Window.unboundedPreceding, -1)
    # total rides the SAME single-partition window pass as the running
    # sums (full-frame sum — WindowExec evaluates all three frames in
    # one pass over the bounded bucket table).  The old shape computed
    # it as a separate aggregate of `buckets`, whose second consumer
    # re-ran the corpus tokenize+explode+count subtree (2 corpus scans
    # in the audited plan; 1 after) and stitched it back with a
    # broadcast crossJoin (round-13, guide §2.4).  Same exact-integer
    # sum either way.
    wfull = Window.orderBy(F.desc("n")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = buckets.select(
        "n",
        "n_words",
        (F.col("n") * F.col("n_words")).alias("mass"),
        F.coalesce(F.sum("n_words").over(w), F.lit(0)).alias("words_before"),
        F.coalesce(F.sum(F.col("n") * F.col("n_words")).over(w), F.lit(0)).alias(
            "mass_before"
        ),
        F.sum(F.col("n") * F.col("n_words")).over(wfull).alias("total"),
    )
    need = F.col("threshold") * F.col("total")
    swept = b.select(
        "*", F.explode(F.array(*[F.lit(t) for t in _COV_TS])).alias("threshold")
    ).filter(
        (F.col("mass_before") < need)
        & (F.col("mass_before") + F.col("mass") >= need)
    )
    m = F.ceil((need - F.col("mass_before")) / F.col("n"))
    return swept.select(
        "threshold",
        (F.col("words_before") + m).alias("vocab_k"),
        F.round(
            (F.col("mass_before") + m * F.col("n")) / F.col("total"), 6
        ).alias("covered_share"),
    ).orderBy("threshold")


SQL_VOCAB_COVERAGE_CURVE = r"""
WITH wc AS (
  SELECT t.word, CAST(count(*) AS BIGINT) AS n
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
  GROUP BY t.word
), ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, word) AS rk,
         CAST(sum(n) OVER (ORDER BY n DESC, word
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM wc
), total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM wc),
swept AS (
  SELECT t.threshold, rk, cum, total.total
  FROM ranked CROSS JOIN total
  CROSS JOIN (SELECT unnest([0.5, 0.9, 0.95, 0.99]::DOUBLE[]) AS threshold) t
  WHERE cum >= t.threshold * total.total
)
SELECT threshold,
       CAST(min(rk) AS BIGINT) AS vocab_k,
       round(min_by(cum, rk) * 1.0 / any_value(total), 6) AS covered_share
FROM swept
GROUP BY threshold
ORDER BY threshold
"""

REGISTRY_LLM13["vocab_coverage_curve"] = (
    q_vocab_coverage_curve,
    SQL_VOCAB_COVERAGE_CURVE,
)
