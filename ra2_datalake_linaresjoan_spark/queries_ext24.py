"""Batch 24 (round 5 final): pre-flight estimation and EDA audits — the
numbers consulted BEFORE committing to an expensive plan or a split.

- ``join_size_sample_estimate`` — sampled join-cardinality estimation
  vs the exact count-vector formula (``join_cardinality``): KEY-hash
  correlated sampling (both sides sample the same 10% of join keys →
  within-sample size / p is low-variance and key-sum-unbiased) vs
  independent ROW sampling (a pair survives with p², so the /p² blow-up
  estimator is high-variance). The measured case for key-correlated
  sampling in join pre-flight — the sampling analog of
  ``dup_rate_sample_estimate``'s content-vs-id lesson.
- ``doc_feature_corr`` — pairwise Pearson correlations of four integer
  document features (chars, tokens, distinct tokens, max word length)
  from exact moment sums: the one-pass EDA matrix a curation plan reads
  before building quality filters. One scan, one 1-row aggregate; the
  DECIMAL(38,0) escape applies past ~10¹² docs (moment products).
- ``split_srm_check`` — sample-ratio-mismatch chi-square for the
  90/5/5 md5 split (the ``stratified_split_assign`` rule): per-split
  observed vs expected counts and chi² terms. The classic A/B-infra
  guardrail: a drifting hash or a filtered upstream shows up here
  before it poisons an experiment.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# join_size_sample_estimate — key-correlated vs row-independent sampling
# ---------------------------------------------------------------------------

_JS_MOD = 10  # 10% samples


def q_join_size_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|lineitem ⋈ part| on partkey: exact (count-vector formula), the
    key-hash sample estimate (×10), and the independent row-sample
    estimate (×100), with signed relative errors at 4 dp. All three are
    count-vector arithmetic — the join's output rows are never
    materialized."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    pt = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    khash = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _JS_MOD
        == 0
    )
    a = li.groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    b = pt.groupBy("k").agg(F.count(F.lit(1)).alias("nb"))
    joined = a.join(b, "k").select(
        "k", (F.col("na") * F.col("nb")).alias("prod"), khash.alias("in_key_sample")
    )
    exact = joined.agg(F.sum("prod").alias("exact_size"))
    key_est = joined.filter("in_key_sample").agg(
        (F.coalesce(F.sum("prod"), F.lit(0)) * _JS_MOD).alias("key_sample_est")
    )
    # independent row samples: a lineitem row survives by its own hash
    # (key + a per-row salt via monotonically-increasing id is NOT
    # deterministic across partitionings — use the row's stable business
    # key columns instead)
    # NULL key parts coalesce to a sentinel on BOTH engines: Spark's
    # concat_ws drops a NULL part AND its separator ('123') while
    # DuckDB's concat keeps the separator ('123:') — different md5s,
    # different sample membership (the ext28/ext30 sentinel convention)
    li_rows = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.coalesce(
                                F.col("l_orderkey").cast("string"),
                                F.lit("<null>"),
                            ),
                            F.coalesce(
                                F.col("l_linenumber").cast("string"),
                                F.lit("<null>"),
                            ),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _JS_MOD
            == 0
        ).alias("keep"),
    )
    pt_rows = pt.select(
        "k",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("p:"),
                            F.coalesce(
                                F.col("k").cast("string"), F.lit("<null>")
                            ),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _JS_MOD
            == 0
        ).alias("keep"),
    )
    ra = li_rows.filter("keep").groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    rb = pt_rows.filter("keep").groupBy("k").agg(F.count(F.lit(1)).alias("nb"))
    row_est = (
        ra.join(rb, "k")
        .agg(
            (
                F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
                * _JS_MOD
                * _JS_MOD
            ).alias("row_sample_est")
        )
    )
    out = exact.crossJoin(key_est).crossJoin(row_est)
    rel = lambda c: F.round(  # noqa: E731
        (F.col(c) - F.col("exact_size")) / F.col("exact_size"), 4
    )
    return out.select(
        "exact_size",
        "key_sample_est",
        rel("key_sample_est").alias("key_rel_err"),
        "row_sample_est",
        rel("row_sample_est").alias("row_rel_err"),
    )


SQL_JOIN_SIZE_SAMPLE_ESTIMATE = """
WITH a AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS na FROM lineitem GROUP BY 1),
b AS (SELECT p_partkey AS k, CAST(count(*) AS BIGINT) AS nb FROM part GROUP BY 1),
joined AS (
  SELECT k, na * nb AS prod,
         CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
           AS in_key_sample
  FROM a JOIN b USING (k)
), exact AS (SELECT CAST(sum(prod) AS BIGINT) AS exact_size FROM joined),
key_est AS (
  SELECT CAST(coalesce(sum(prod), 0) * 10 AS BIGINT) AS key_sample_est
  FROM joined WHERE in_key_sample
), ra AS (
  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS na FROM lineitem
  WHERE CAST(concat('0x', substr(md5(concat(
          coalesce(CAST(l_orderkey AS VARCHAR), '<null>'), ':',
          coalesce(CAST(l_linenumber AS VARCHAR), '<null>'))), 1, 8))
        AS BIGINT) % 10 = 0
  GROUP BY 1
), rb AS (
  SELECT p_partkey AS k, CAST(count(*) AS BIGINT) AS nb FROM part
  WHERE CAST(concat('0x', substr(md5(concat('p:',
          coalesce(CAST(p_partkey AS VARCHAR), '<null>'))), 1, 8))
        AS BIGINT) % 10 = 0
  GROUP BY 1
), row_est AS (
  SELECT CAST(coalesce(sum(na * nb), 0) * 100 AS BIGINT) AS row_sample_est
  FROM ra JOIN rb USING (k)
)
SELECT exact_size, key_sample_est,
       round((key_sample_est - exact_size) * 1.0 / exact_size, 4) AS key_rel_err,
       row_sample_est,
       round((row_sample_est - exact_size) * 1.0 / exact_size, 4) AS row_rel_err
FROM exact CROSS JOIN key_est CROSS JOIN row_est
"""


# ---------------------------------------------------------------------------
# doc_feature_corr — exact-moment feature correlation matrix
# ---------------------------------------------------------------------------

_CORR_FEATS = ("n_chars", "n_tok", "n_distinct", "max_wlen")


def q_doc_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of (chars, tokens, distinct tokens,
    max word length) per document: all moments are exact integer sums in
    ONE aggregate over one scan; the six correlations are closed-form
    doubles at 6 dp, ordered by feature-pair name. Complete cases only
    (text AND n_chars present) — a NULL text would be counted by n but
    skipped by the token-moment sums, corrupting r identically on both
    engines (the formula can even leave |r| > 1). Tokenization = the
    shared ``ascii_words`` contract (round-11 unicode-fuzz)."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    words = docs.select(
        "n_chars",
        F.filter(ascii_words(F.col("text")), lambda x: x != "").alias("w"),
    )
    feats = words.select(
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size("w").cast("long").alias("n_tok"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
        F.coalesce(
            F.array_max(F.transform("w", lambda x: F.length(x))), F.lit(0)
        ).cast("long").alias("max_wlen"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in _CORR_FEATS:
        aggs.append(F.sum(f).alias(f"s_{f}"))
        aggs.append(F.sum(F.col(f) * F.col(f)).alias(f"ss_{f}"))
    for i, fa in enumerate(_CORR_FEATS):
        for fb in _CORR_FEATS[i + 1 :]:
            aggs.append(F.sum(F.col(fa) * F.col(fb)).alias(f"sp_{fa}_{fb}"))
    m = feats.agg(*aggs)
    pair_rows = []
    for i, fa in enumerate(_CORR_FEATS):
        for fb in _CORR_FEATS[i + 1 :]:
            n = F.col("n").cast("double")
            sa, sb = F.col(f"s_{fa}").cast("double"), F.col(f"s_{fb}").cast("double")
            ssa, ssb = F.col(f"ss_{fa}").cast("double"), F.col(f"ss_{fb}").cast("double")
            sp = F.col(f"sp_{fa}_{fb}").cast("double")
            var_a = n * ssa - sa * sa
            var_b = n * ssb - sb * sb
            # zero-variance features (degenerate corpora) -> NULL, not 0/0
            r = F.when(
                (var_a != 0) & (var_b != 0),
                (n * sp - sa * sb) / F.sqrt(var_a * var_b),
            )
            pair_rows.append(
                F.struct(
                    F.lit(f"{fa}~{fb}").alias("pair"), F.round(r, 6).alias("corr")
                )
            )
    return (
        m.select(F.explode(F.array(*pair_rows)).alias("p"))
        .select("p.pair", "p.corr")
        .orderBy("pair")
    )


SQL_DOC_FEATURE_CORR = """
WITH feats AS (
  SELECT CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(w) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         CAST(coalesce(list_max(list_transform(w, x -> length(x))), 0) AS BIGINT)
           AS max_wlen
  FROM (SELECT n_chars,
               list_filter(regexp_split_to_array(
                             translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                       'abcdefghijklmnopqrstuvwxyz'),
                             '[^a-z]+'),
                           x -> x <> '') AS w
        FROM documents
        WHERE text IS NOT NULL AND n_chars IS NOT NULL)
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s_n_chars, CAST(sum(n_chars*n_chars) AS BIGINT) AS ss_n_chars,
         CAST(sum(n_tok) AS BIGINT) AS s_n_tok, CAST(sum(n_tok*n_tok) AS BIGINT) AS ss_n_tok,
         CAST(sum(n_distinct) AS BIGINT) AS s_n_distinct, CAST(sum(n_distinct*n_distinct) AS BIGINT) AS ss_n_distinct,
         CAST(sum(max_wlen) AS BIGINT) AS s_max_wlen, CAST(sum(max_wlen*max_wlen) AS BIGINT) AS ss_max_wlen,
         CAST(sum(n_chars*n_tok) AS BIGINT) AS sp_n_chars_n_tok,
         CAST(sum(n_chars*n_distinct) AS BIGINT) AS sp_n_chars_n_distinct,
         CAST(sum(n_chars*max_wlen) AS BIGINT) AS sp_n_chars_max_wlen,
         CAST(sum(n_tok*n_distinct) AS BIGINT) AS sp_n_tok_n_distinct,
         CAST(sum(n_tok*max_wlen) AS BIGINT) AS sp_n_tok_max_wlen,
         CAST(sum(n_distinct*max_wlen) AS BIGINT) AS sp_n_distinct_max_wlen
  FROM feats
), pairs AS (
  SELECT 'n_chars~n_tok' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars) = 0
                     OR (CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_chars_n_tok - CAST(s_n_chars AS DOUBLE)*s_n_tok)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars)
                           * (CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok)) END, 6) AS corr
  FROM m
  UNION ALL
  SELECT 'n_chars~n_distinct' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars) = 0
                     OR (CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_chars_n_distinct - CAST(s_n_chars AS DOUBLE)*s_n_distinct)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars)
                           * (CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct)) END, 6) AS corr
  FROM m
  UNION ALL
  SELECT 'n_chars~max_wlen' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars) = 0
                     OR (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_chars_max_wlen - CAST(s_n_chars AS DOUBLE)*s_max_wlen)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_chars - CAST(s_n_chars AS DOUBLE)*s_n_chars)
                           * (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen)) END, 6) AS corr
  FROM m
  UNION ALL
  SELECT 'n_tok~n_distinct' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok) = 0
                     OR (CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_tok_n_distinct - CAST(s_n_tok AS DOUBLE)*s_n_distinct)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok)
                           * (CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct)) END, 6) AS corr
  FROM m
  UNION ALL
  SELECT 'n_tok~max_wlen' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok) = 0
                     OR (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_tok_max_wlen - CAST(s_n_tok AS DOUBLE)*s_max_wlen)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_tok - CAST(s_n_tok AS DOUBLE)*s_n_tok)
                           * (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen)) END, 6) AS corr
  FROM m
  UNION ALL
  SELECT 'n_distinct~max_wlen' AS pair,
         round(CASE WHEN (CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct) = 0
                     OR (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen) = 0
               THEN NULL
               ELSE (CAST(n AS DOUBLE)*sp_n_distinct_max_wlen - CAST(s_n_distinct AS DOUBLE)*s_max_wlen)
                    / sqrt((CAST(n AS DOUBLE)*ss_n_distinct - CAST(s_n_distinct AS DOUBLE)*s_n_distinct)
                           * (CAST(n AS DOUBLE)*ss_max_wlen - CAST(s_max_wlen AS DOUBLE)*s_max_wlen)) END, 6) AS corr
  FROM m
)
SELECT pair, corr FROM pairs ORDER BY pair
"""


# ---------------------------------------------------------------------------
# split_srm_check — sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------

_SRM_SHARES = {"train": 0.90, "val": 0.05, "test": 0.05}


def q_split_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit of the 90/5/5 md5 split (the exact
    ``stratified_split_assign`` rule): per split, observed count and
    share vs the target, and the chi-square term (o − e)²/e. One scan
    into a 3-row aggregate. The id hashes through a NULL sentinel in
    lockstep (DuckDB's CAST(concat('0x', NULL-md5)) errors where
    Spark's conv returns NULL and silently fell to 'test')."""
    docs = _t(spark, sf_dir, "documents")
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
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per = docs.select(split.alias("split")).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = per.agg(F.sum("n_obs").alias("total"))
    # expected shares come from the one _SRM_SHARES source of truth
    exp_share = F.lit(None).cast("double")
    for name, share in _SRM_SHARES.items():
        exp_share = F.when(F.col("split") == name, F.lit(share)).otherwise(
            exp_share
        )
    e = F.col("total") * exp_share
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "split",
            "n_obs",
            F.round(exp_share, 6).alias("expected_share"),
            F.round(F.col("n_obs") / F.col("total"), 6).alias("observed_share"),
            F.round(F.pow(F.col("n_obs") - e, F.lit(2)) / e, 4).alias("chi2_term"),
        )
        .orderBy("split")
    )


SQL_SPLIT_SRM_CHECK = """
WITH assigned AS (
  SELECT CASE
           WHEN CAST(concat('0x', substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<null>')), 1, 8)) AS BIGINT)
                % 100 < 90 THEN 'train'
           WHEN CAST(concat('0x', substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<null>')), 1, 8)) AS BIGINT)
                % 100 < 95 THEN 'val'
           ELSE 'test' END AS split
  FROM documents
), per AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_obs FROM assigned GROUP BY 1
), tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM per)
SELECT split, n_obs,
       round(CAST(CASE split WHEN 'train' THEN 0.90 WHEN 'val' THEN 0.05 ELSE 0.05 END
             AS DOUBLE), 6) AS expected_share,
       round(CAST(n_obs AS DOUBLE) / total, 6) AS observed_share,
       round(power(n_obs - total * (CASE split WHEN 'train' THEN 0.90
                                    WHEN 'val' THEN 0.05 ELSE 0.05 END), 2)
             / (total * (CASE split WHEN 'train' THEN 0.90
                         WHEN 'val' THEN 0.05 ELSE 0.05 END)), 4) AS chi2_term
FROM per CROSS JOIN tot
ORDER BY split
"""


REGISTRY_EXT24: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "join_size_sample_estimate": (
        q_join_size_sample_estimate,
        SQL_JOIN_SIZE_SAMPLE_ESTIMATE,
    ),
    "doc_feature_corr": (q_doc_feature_corr, SQL_DOC_FEATURE_CORR),
    "split_srm_check": (q_split_srm_check, SQL_SPLIT_SRM_CHECK),
}
