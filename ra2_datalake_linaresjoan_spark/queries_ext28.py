"""Batch 28 (round 6): operational-scale audits — LSH bucket load,
in-session behavioral mix, and differentially-private release calibration.

- ``minhash_bucket_skew`` — per-band load audit of an md5-MinHash LSH
  banding (8 hashes, 4 bands x 2 rows): bucket count, max bucket size,
  the candidate-pair bill Σ s·(s-1)/2, and the bucket-size coefficient
  of variation. Bucket skew is THE operational risk of LSH dedup at
  100 TB (one hot bucket = one straggler task paying s² comparisons);
  this is the number you check before launching the join. Distinct from
  ``minhash_error_audit`` (sketch-vs-exact Jaccard error) — this audits
  the JOIN PLAN the buckets induce. The md5 hash family is engine-
  portable (unlike the library's xxhash64 fast path), so the whole
  banding is oracle-checkable.
- ``session_type_entropy_bands`` — histogram of per-session event-type
  mix entropy (5-minute-gap sessions, 0.25-nat bands): how focused vs
  exploratory sessions are — the behavioral-mix profile a product
  dashboard tracks. Sessionization windows are user-partitioned; the
  entropy fold runs over each session's ≤ |types| type counts sorted by
  type, so both engines execute identical float sequences and band
  floors can never disagree; band counts are exact integers.
- ``dp_count_noise_audit`` — ε = 1 Laplace-mechanism calibration for
  per-language count release: deterministic noise from an md5-derived
  uniform (inverse-CDF transform), the released (rounded, clamped ≥ 0)
  counts, per-language absolute error, and the total L1 distortion.
  This is the CALIBRATION view a privacy reviewer reads before
  approving a release (it shows true counts; the release itself ships
  only the noisy column). Lang-bounded aggregate; noise is a
  closed-form transform of identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_words

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# minhash_bucket_skew — LSH band-bucket load audit
# ---------------------------------------------------------------------------

_MBS_HASHES = 8
_MBS_BANDS = 4
_MBS_ROWS = _MBS_HASHES // _MBS_BANDS
_MBS_N = 3  # shingle width (words)


def q_minhash_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (band): bucket count, max bucket size, candidate pairs
    Σ s·(s-1)/2 the band contributes to the LSH join, and the bucket-
    size CV — the pre-join load audit for MinHash dedup. One shingle
    shuffle builds all 8 min-hashes; banding is an in-row explode; the
    per-band stats are integer moments over the (band, bucket) sizes."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.filter(ascii_words("text"), lambda x: x != "").alias(
            "w"
        ),
    )
    sh = words.filter(F.size("w") >= _MBS_N).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _MBS_N),
                    lambda j: F.concat_ws(" ", F.slice("w", j + 1, _MBS_N)),
                )
            )
        ).alias("shingle"),
    )
    min_aggs = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(i), "shingle")), 1, 8
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")
        for i in range(_MBS_HASHES)
    ]
    per_doc = sh.groupBy("doc_id").agg(*min_aggs)
    band_arr = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(b),
                *[F.col(f"h{b * _MBS_ROWS + r}") for r in range(_MBS_ROWS)],
            )
            for b in range(_MBS_BANDS)
        ]
    )
    banded = per_doc.select(
        F.posexplode(band_arr).alias("band", "bucket")
    )
    buckets = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("s")
    )
    m = buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("s").alias("max_bucket"),
        # s·(s-1) is always even: keep the sum an exact BIGINT and halve
        # with integer DIV — no double round-trip that loses exactness
        # past 2^53 at web scale
        F.sum(F.col("s") * (F.col("s") - 1)).alias("pairs2"),
        F.sum("s").alias("s1"),
        F.sum(F.col("s") * F.col("s")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_buckets")
    var = F.col("s2") / F.col("n_buckets") - mean * mean
    return m.select(
        "band",
        "n_buckets",
        "max_bucket",
        F.expr("pairs2 DIV 2").alias("candidate_pairs"),
        F.round(F.sqrt(var) / mean, 4).alias("bucket_cv"),
    ).orderBy("band")


def _mbs_sql() -> str:
    mins = ",\n         ".join(
        f"min(CAST(concat('0x', substr(md5(concat({i}, ':', shingle)), 1, 8))"
        f" AS BIGINT)) AS h{i}"
        for i in range(_MBS_HASHES)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT {b} AS band, concat({b}, ':', h{b * _MBS_ROWS}, ':', "
        f"h{b * _MBS_ROWS + 1}) AS bucket FROM per_doc"
        for b in range(_MBS_BANDS)
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                     x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - {_MBS_N - 2}),
                               j -> array_to_string(w[j:j+{_MBS_N - 1}], ' ')))
           AS shingle
  FROM w WHERE len(w) >= {_MBS_N}
), per_doc AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
), banded AS (
{bands}
), buckets AS (
  SELECT band, bucket, CAST(count(*) AS BIGINT) AS s
  FROM banded GROUP BY 1, 2
), m AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(max(s) AS BIGINT) AS max_bucket,
         CAST(sum(s * (s - 1)) // 2 AS BIGINT) AS candidate_pairs,
         CAST(sum(s) AS BIGINT) AS s1,
         CAST(sum(s * s) AS BIGINT) AS s2
  FROM buckets GROUP BY 1
)
SELECT CAST(band AS INT) AS band, n_buckets, max_bucket, candidate_pairs,
       round(sqrt(s2 * 1.0 / n_buckets
                  - (s1 * 1.0 / n_buckets) * (s1 * 1.0 / n_buckets))
             / (s1 * 1.0 / n_buckets), 4) AS bucket_cv
FROM m
ORDER BY band
"""


SQL_MINHASH_BUCKET_SKEW = _mbs_sql()


# ---------------------------------------------------------------------------
# session_type_entropy_bands — behavioral-mix entropy histogram
# ---------------------------------------------------------------------------

_STE_GAP_S = 300
_STE_BAND_NATS = 0.25


def q_session_type_entropy_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (entropy band, 0.25 nats wide): sessions whose event-type
    mix entropy falls in the band, and the session share — focused
    (H ≈ 0) vs exploratory sessions. Gaps-and-islands sessionization
    (5-minute inactivity); the entropy fold covers each session's
    ≤ |types| type counts sorted by type, so the band floor is
    engine-identical. NULL-ts rows are filtered in LOCKSTEP (round-9
    review): a NULL timestamp has no session position, and the engines
    glue it to opposite ends of the user's history (Spark windows order
    NULLS FIRST, DuckDB NULLS LAST), changing every session's mix."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = ev.select(
        "user_id",
        "event_type",
        F.sum(
            F.when(
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(w_user)
                > _STE_GAP_S,
                1,
            )
            .otherwise(0)
            .cast("long")
        )
        .over(w_user.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    counts = sess.groupBy("user_id", "sid", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_sess = counts.groupBy("user_id", "sid").agg(
        F.sum("c").alias("n"),
        F.sort_array(F.collect_list(F.struct("event_type", "c"))).alias("a"),
    )
    h = -F.aggregate(
        "a",
        F.lit(0.0),
        lambda acc, x: acc
        + (x["c"] / F.col("n")) * F.log(x["c"] / F.col("n")),
    )
    banded = per_sess.select(
        F.floor(h / F.lit(_STE_BAND_NATS)).cast("long").alias("band")
    )
    dist = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n_sessions"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        dist.select(
            "band",
            F.round(F.col("band") * _STE_BAND_NATS, 2).alias("band_lo_nats"),
            "n_sessions",
            F.round(
                F.col("n_sessions") / F.sum("n_sessions").over(w_all), 6
            ).alias("session_share"),
        )
        .orderBy("band")
    )


SQL_SESSION_TYPE_ENTROPY_BANDS = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts,  event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {_STE_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE ts IS NOT NULL
), sess AS (
  SELECT user_id, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sid
  FROM flagged
), counts AS (
  SELECT user_id, sid, event_type, CAST(count(*) AS BIGINT) AS c
  FROM sess GROUP BY 1, 2, 3
), per_sess AS (
  SELECT user_id, sid, CAST(sum(c) AS BIGINT) AS n,
         list((c, event_type) ORDER BY event_type, c) AS a
  FROM counts GROUP BY 1, 2
), ent AS (
  SELECT floor(-list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
                          list_transform(a, x -> (x[1] * 1.0 / n)
                                              * ln(x[1] * 1.0 / n))),
             (acc, t) -> acc + t) / {_STE_BAND_NATS}) AS band
  FROM per_sess
), dist AS (
  SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_sessions
  FROM ent GROUP BY 1
)
SELECT band, round(band * CAST({_STE_BAND_NATS} AS DOUBLE), 2) AS band_lo_nats,
       n_sessions,
       round(n_sessions * 1.0
             / CAST(sum(n_sessions) OVER (ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS BIGINT), 6) AS session_share
FROM dist
ORDER BY band
"""


# ---------------------------------------------------------------------------
# dp_count_noise_audit — Laplace-mechanism release calibration
# ---------------------------------------------------------------------------

_DP_EPS = 1.0
_DP_CLAMP = 1e-12


def q_dp_count_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (lang): true per-language doc count, the ε = 1 Laplace-
    released count (deterministic md5-derived uniform → inverse-CDF
    noise, rounded, clamped ≥ 0), the absolute error, and the total L1
    distortion — the calibration view a privacy reviewer reads before
    approving the release (only the released column ships). Lang-
    bounded; noise is a closed-form transform of engine-identical
    doubles (uniform clamped away from 0/1 so the log never hits -inf)."""
    docs = _t(spark, sf_dir, "documents")
    m = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    # coalesce the hash input: for a NULL lang group Spark's concat is
    # NULL (noise NULL -> released silently 0) while DuckDB's concat
    # SKIPS the NULL (hashing 'dp:') — the sentinel gives the NULL-lang
    # group real, engine-identical noise
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp:"),
                        F.coalesce(F.col("lang"), F.lit("<null>")),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    centered = u - F.lit(0.5)
    mag = F.least(
        F.greatest(F.abs(centered) * 2.0, F.lit(_DP_CLAMP)),
        F.lit(1.0 - _DP_CLAMP),
    )
    noise = (
        -F.lit(1.0 / _DP_EPS)
        * F.signum(centered)
        * F.log(F.lit(1.0) - mag)
    )
    rel = F.greatest(
        F.lit(0).cast("long"), F.round(F.col("n_true") + noise).cast("long")
    )
    out = m.select(
        "lang",
        "n_true",
        rel.alias("released"),
        F.abs(rel - F.col("n_true")).alias("abs_err"),
        F.lit(_DP_EPS).alias("epsilon"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.select(
        "lang",
        "n_true",
        "released",
        "abs_err",
        "epsilon",
        F.sum("abs_err").over(w_all).alias("total_l1_err"),
    ).orderBy("lang")


SQL_DP_COUNT_NOISE_AUDIT = f"""
WITH m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_true FROM documents GROUP BY 1
), noised AS (
  SELECT lang, n_true,
         greatest(CAST(0 AS BIGINT),
           CAST(round(n_true
             + (-{1.0 / _DP_EPS!r})
               * sign((CAST(concat('0x', substr(md5(concat('dp:', coalesce(lang, '<null>'))), 1, 8))
                            AS BIGINT) / 4294967296.0) - 0.5)
               * ln(1.0 - least(greatest(
                     abs((CAST(concat('0x', substr(md5(concat('dp:', coalesce(lang, '<null>'))), 1, 8))
                              AS BIGINT) / 4294967296.0) - 0.5) * 2.0,
                     {_DP_CLAMP!r}), {1.0 - _DP_CLAMP!r}))) AS BIGINT))
           AS released
  FROM m
)
SELECT lang, n_true, released,
       CAST(abs(released - n_true) AS BIGINT) AS abs_err,
       CAST({_DP_EPS!r} AS DOUBLE) AS epsilon,
       CAST(sum(abs(released - n_true))
            OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS total_l1_err
FROM noised
ORDER BY lang
"""


REGISTRY_EXT28: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "minhash_bucket_skew": (q_minhash_bucket_skew, SQL_MINHASH_BUCKET_SKEW),
    "session_type_entropy_bands": (
        q_session_type_entropy_bands,
        SQL_SESSION_TYPE_ENTROPY_BANDS,
    ),
    "dp_count_noise_audit": (q_dp_count_noise_audit, SQL_DP_COUNT_NOISE_AUDIT),
}
