"""Batch 22 (round 5 close): iterative linear algebra, sketch-quality
audits, interval statistics, and a trainable language-ID — rounding out
the measurement/planning layer.

- ``markov_stationary`` — stationary distribution of the event-type
  transition chain by 3 power-iteration steps (v ← vP), computed as
  |types|-sized join-aggregates (the matrix and vector never leave
  dimension-cardinality), reported against the empirical type share.
- ``cms_width_sweep`` — count-min error vs width: builds sketches for
  widths {256, 1024, 4096} in ONE pass (the (width, depth, cell)
  explode), probes every event type, and reports mean/max overestimate
  per width — the sizing table you consult before provisioning a
  sketch. All counts exact integers until the mean.
- ``wilson_ci`` — Wilson 95% score interval for the per-source share
  of English docs: the closed-form binomial interval (no bootstrap, no
  randomness), one aggregate per source.
- ``char_ngram_langid`` — char-trigram profile language-ID: per-lang
  top-30 trigram profiles (vocabulary-sized rank), docs scored by an
  INTEGER dot product of their trigram counts against each profile
  (exact ⇒ the argmax is engine/partitioning-invariant — a float score
  could tie-break differently per summation order), accuracy vs the
  labeled lang. The trainable upgrade of the stopword heuristic in
  ``lang_id_confusion``.
- ``minhash_error_audit`` — measured MinHash estimator error: exact
  3-gram Jaccard on df-capped candidate pairs vs the 16-component
  md5-minhash estimate (signatures computed IN-ROW via
  array_min/transform — no signature shuffle), reporting mean/max
  absolute and mean signed error. The audit that justifies the banded
  dedup's parameter choices with numbers instead of folklore.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_lower, ascii_words

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# markov_stationary — power iteration on the event transition chain
# ---------------------------------------------------------------------------

_MK_ITERS = 3


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution after 3 power-iteration steps
    from uniform over the event-type transition matrix, next to each
    type's empirical share. P and v are |types|-sized; every step is a
    vocabulary-keyed join-aggregate — the corpus is touched once for
    the bigram counts.

    NULL event_type/ts/event_id rows drop in lockstep BEFORE the
    sequence window: NULL ts orders FIRST in Spark but LAST in DuckDB,
    silently producing different bigrams (hence a different transition
    matrix) per engine."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    big = (
        ev.select(
            F.col("event_type").alias("w1"),
            F.lead("event_type").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = big.groupBy("w1").agg(F.sum("c").alias("rt"))
    p = big.join(row_tot, "w1").select(
        "w1", "w2", (F.col("c") / F.col("rt")).alias("p")
    ).localCheckpoint()
    types = p.select(F.col("w1").alias("t")).distinct()
    n_types = types.count()
    # max(..., 1) guards constant-folded DIVIDE_BY_ZERO under ANSI when the
    # corpus is empty (zero types -> zero rows anyway, so the value is moot).
    v = types.select(
        "t", F.lit(1.0 / float(max(n_types, 1))).alias("val")
    )
    for _ in range(_MK_ITERS):
        v = (
            p.join(v, p["w1"] == v["t"])
            .groupBy(F.col("w2").alias("t2"))
            .agg(F.sum(F.col("p") * F.col("val")).alias("val"))
            .select(F.col("t2").alias("t"), "val")
        )
    emp = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n")
    )
    emp_tot = emp.agg(F.sum("n").alias("nn"))
    return (
        v.join(emp, "t")
        .crossJoin(F.broadcast(emp_tot))
        .select(
            F.col("t").alias("event_type"),
            F.round("val", 6).alias("stationary_p"),
            F.round(F.col("n") / F.col("nn"), 6).alias("empirical_share"),
        )
        .orderBy("event_type")
    )


SQL_MARKOV_STATIONARY = """
WITH big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT event_type AS w1,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS w2
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
  ) WHERE w2 IS NOT NULL GROUP BY 1, 2
), rt AS (SELECT w1, CAST(sum(c) AS BIGINT) AS rt FROM big GROUP BY 1),
p AS (
  SELECT w1, w2, CAST(c AS DOUBLE) / rt AS p FROM big JOIN rt USING (w1)
), types AS (SELECT DISTINCT w1 AS t FROM p),
n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM types),
v0 AS (SELECT t, 1.0 / nt AS val FROM types CROSS JOIN n),
v1 AS (SELECT w2 AS t, sum(p * val) AS val FROM p JOIN v0 ON w1 = v0.t GROUP BY w2),
v2 AS (SELECT w2 AS t, sum(p * val) AS val FROM p JOIN v1 ON w1 = v1.t GROUP BY w2),
v3 AS (SELECT w2 AS t, sum(p * val) AS val FROM p JOIN v2 ON w1 = v2.t GROUP BY w2),
emp AS (SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
        GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM emp)
SELECT v3.t AS event_type,
       round(val, 6) AS stationary_p,
       round(CAST(n AS DOUBLE) / nn, 6) AS empirical_share
FROM v3 JOIN emp ON v3.t = emp.t CROSS JOIN tot
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cms_width_sweep — count-min overestimate vs width
# ---------------------------------------------------------------------------

_CMS_WIDTHS = (256, 1024, 4096)
_CMS_DEPTH = 3


def q_cms_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per sketch width: probes, exact-match probes, mean and max
    overestimate (CMS estimates are never under). All widths build in a
    single event pass (one (width, depth, cell) explode); probes are
    the distinct event types with exact counts; estimates use the
    left-join + coalesce(0) semantics of ``cms_estimate``. NULL
    event_type rows drop in lockstep — a NULL is not a sketch key, and
    DuckDB's CAST(concat('0x', md5(NULL)...) would error where Spark's
    conv returns NULL."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())

    def cell(col, w, j):
        return (
            F.conv(F.substring(F.md5(col), 1 + 8 * j, 8), 16, 10).cast("long") % w
        )

    entries = F.array(
        *[
            F.struct(
                F.lit(w).alias("w"),
                F.lit(j).alias("j"),
                cell(F.col("event_type"), w, j).alias("cell"),
            )
            for w in _CMS_WIDTHS
            for j in range(_CMS_DEPTH)
        ]
    )
    cells = (
        ev.select(F.explode(entries).alias("e"))
        .select("e.*")
        .groupBy("w", "j", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    # the same `entries` Column expression probes the sketch — build and
    # probe paths can never desynchronize
    probe_cells = exact.select(
        "event_type", "n_exact", F.explode(entries).alias("e")
    ).select("event_type", "n_exact", "e.*")
    est = (
        probe_cells.join(F.broadcast(cells), ["w", "j", "cell"], "left")
        .groupBy("event_type", "n_exact", "w")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("n_est"))
    )
    return (
        est.groupBy(F.col("w").alias("width"))
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum((F.col("n_est") == F.col("n_exact")).cast("long")).alias(
                "n_exact_probes"
            ),
            F.round(
                F.sum(F.col("n_est") - F.col("n_exact")) / F.count(F.lit(1)), 4
            ).alias("mean_overestimate"),
            F.max(F.col("n_est") - F.col("n_exact")).alias("max_overestimate"),
        )
        .orderBy("width")
    )


def _cms_sweep_sql() -> str:
    entries = ", ".join(
        f"struct_pack(w := {w}, j := {j}, "
        f"c := CAST(concat('0x', substr(md5(event_type), {1 + 8 * j}, 8)) AS BIGINT) % {w})"
        for w in _CMS_WIDTHS
        for j in range(_CMS_DEPTH)
    )
    return f"""
WITH evf AS (
  -- filter BEFORE the lateral: DuckDB evaluates the hash expressions
  -- for every joined row, so a trailing WHERE would still CAST '0x'
  SELECT event_type FROM events WHERE event_type IS NOT NULL
), ex AS (
  SELECT t.e.w AS w, t.e.j AS j, t.e.c AS cell
  FROM evf, LATERAL (SELECT unnest([{entries}]) AS e) t
), cells AS (
  SELECT w, j, cell, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY 1, 2, 3
), exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM events
  WHERE event_type IS NOT NULL GROUP BY 1
), probe AS (
  SELECT event_type, n_exact, t.e.w AS w, t.e.j AS j, t.e.c AS cell
  FROM exact, LATERAL (SELECT unnest([{entries}]) AS e) t
), est AS (
  SELECT event_type, n_exact, w,
         CAST(min(coalesce(n, 0)) AS BIGINT) AS n_est
  FROM probe LEFT JOIN cells USING (w, j, cell)
  GROUP BY 1, 2, 3
)
SELECT w AS width,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN n_est = n_exact THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_probes,
       round(CAST(sum(n_est - n_exact) AS DOUBLE) / count(*), 4)
         AS mean_overestimate,
       CAST(max(n_est - n_exact) AS BIGINT) AS max_overestimate
FROM est
GROUP BY w
ORDER BY w
"""


SQL_CMS_WIDTH_SWEEP = _cms_sweep_sql()


# ---------------------------------------------------------------------------
# wilson_ci — binomial score interval per source
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959963984540054  # 97.5th normal percentile


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for each source's share of English
    docs: closed-form, no resampling — the right uncertainty statement
    for proportions computed by a distributed count. One aggregate per
    source; identical double expression on both engines."""
    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        # when/otherwise(0): a NULL lang counts 0 like the oracle's CASE
        # ELSE 0 — a bare boolean cast poisons the sum to NULL on an
        # all-NULL group (round-8 parity audit)
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long")
        ).alias("k"),
    )
    z2 = _WILSON_Z * _WILSON_Z
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    p = k / n
    center = (p + z2 / (2 * n)) / (1 + z2 / n)
    half = (
        F.lit(_WILSON_Z)
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        / (1 + z2 / n)
    )
    return agg.select(
        "source",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    ).orderBy("source")


SQL_WILSON_CI = f"""
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents GROUP BY 1
), c AS (
  SELECT source, n, k,
         CAST(k AS DOUBLE) / n AS p,
         {_WILSON_Z * _WILSON_Z} / CAST(n AS DOUBLE) AS z2n
  FROM agg
)
SELECT source, n, k,
       round(p, 6) AS p_hat,
       round((p + z2n / 2) / (1 + z2n)
             - {_WILSON_Z} * sqrt(p * (1 - p) / n + z2n / (4 * n)) / (1 + z2n), 6)
         AS ci_lo,
       round((p + z2n / 2) / (1 + z2n)
             + {_WILSON_Z} * sqrt(p * (1 - p) / n + z2n / (4 * n)) / (1 + z2n), 6)
         AS ci_hi
FROM c
ORDER BY source
"""


# ---------------------------------------------------------------------------
# char_ngram_langid — trainable trigram-profile language ID
# ---------------------------------------------------------------------------

_LID_TOP = 30


def q_char_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram profile language-ID accuracy per labeled lang:
    per-lang top-30 trigram profiles (by corpus count), each doc scored
    by the INTEGER dot product of its trigram counts with each profile
    (exact arithmetic ⇒ partition-invariant argmax; ties break on lang
    text), predicted = argmax lang. Corpus-side tables are
    trigram-vocabulary-sized; the scoring join is trigram-keyed.

    Population = ASCII docs (shared ``ascii_text_pred``, round-12):
    both engines slice by codepoints on BMP text (probe-verified), but
    the guard future-proofs the trigram multiset against non-BMP
    segmentation (and keeps the population rule uniform with the other
    char-level metrics).  Clean-data no-op (ASCII corpus); char-trigram
    features are only engine-portable on ASCII anyway."""
    from ra2_datalake_linaresjoan_spark.operators.filters import ascii_text_pred

    docs = _t(spark, sf_dir, "documents").where(ascii_text_pred("text"))
    base = docs.select("doc_id", "lang", ascii_lower("text").alias("t")).filter(
        F.length("t") >= 3
    )
    tri = base.select(
        "doc_id",
        "lang",
        F.explode(F.expr("transform(sequence(1, length(t) - 2), i -> substr(t, i, 3))")).alias(
            "tri"
        ),
    )
    doc_cnt = tri.groupBy("doc_id", "lang", "tri").agg(
        F.count(F.lit(1)).alias("dc")
    )
    lang_cnt = tri.groupBy(F.col("lang").alias("plang"), "tri").agg(
        F.count(F.lit(1)).alias("lc")
    )
    w = Window.partitionBy("plang").orderBy(F.desc("lc"), "tri")
    profile = (
        lang_cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _LID_TOP)
        .select("plang", "tri", "lc")
    )
    scores = (
        doc_cnt.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.sum(F.col("dc") * F.col("lc")).alias("score"))
    )
    wp = Window.partitionBy("doc_id").orderBy(F.desc("score"), "plang")
    pred = (
        scores.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted"))
    )
    # CASE-ELSE-0, never a bare boolean cast (round-10 dirty audit): a
    # NULL-lang corpus slice builds a NULL profile whose prediction
    # compares NULL against every label — Spark's bare-cast sum skipped
    # those rows to NULL where the oracle's CASE yielded 0
    correct = F.sum(
        F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0)
    ).cast("long")
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            correct.alias("n_correct"),
            F.round(correct / F.count(F.lit(1)), 4).alias("accuracy"),
        )
        .orderBy("lang")
    )


SQL_CHAR_NGRAM_LANGID = r"""
WITH base AS (
  SELECT doc_id, lang, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
  WHERE text IS NOT NULL AND NOT regexp_matches(text, '[^\x00-\x7f]')
    AND length(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) >= 3
), tri AS (
  SELECT doc_id, lang, u.tri
  FROM base,
       LATERAL (SELECT unnest(list_transform(range(1, length(t) - 1),
                                             i -> substr(t, i, 3))) AS tri) u
), doc_cnt AS (
  SELECT doc_id, lang, tri, CAST(count(*) AS BIGINT) AS dc FROM tri GROUP BY 1, 2, 3
), lang_cnt AS (
  SELECT lang AS plang, tri, CAST(count(*) AS BIGINT) AS lc FROM tri GROUP BY 1, 2
), profile AS (
  SELECT plang, tri, lc FROM (
    SELECT plang, tri, lc,
           row_number() OVER (PARTITION BY plang ORDER BY lc DESC, tri) AS rn
    FROM lang_cnt
  ) WHERE rn <= 30
), scores AS (
  SELECT doc_id, lang, plang, CAST(sum(dc * lc) AS BIGINT) AS score
  FROM doc_cnt JOIN profile USING (tri)
  GROUP BY 1, 2, 3
), pred AS (
  SELECT doc_id, lang, plang AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS accuracy
FROM pred
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# minhash_error_audit — measured MinHash estimator quality
# ---------------------------------------------------------------------------

_MH_COMP = 16
_MH_DF_CAP = 20
_MH_MIN_J = 0.2


def q_minhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit: exact 3-gram-shingle Jaccard vs the
    16-component md5-minhash estimate (#matching components / 16) on
    candidate pairs. The df ≤ 20 cap is CANDIDATE GENERATION only (the
    recall dial); both the exact Jaccard (in-row intersection of the
    FULL shingle arrays) and the signatures (array_min over the full
    hashed shingle array, in-row — no signature shuffle) measure the
    same full-set statistic, so the reported error is estimator error,
    not blocking truncation. Pairs with exact J ≥ 0.2 report mean/max
    |error| and the mean signed error (≈0 for an unbiased estimator).
    The measured basis for the banded-LSH parameter choices."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.filter(ascii_words("text"), lambda x: x != "").alias("wd"),
    )
    # the shingle transform is guarded by an IN-ROW condition, not just
    # the preceding filter: sequence(0, size-3) DESCENDS when size < 3
    # (yielding slice(start=0) crashes), and plan rewrites around the
    # eager checkpoints can evaluate the projection on pre-filter rows
    # (round-9: ''-text rows hit exactly this)
    sh_arr = words.filter(F.size("wd") >= 3).select(
        "doc_id",
        F.when(
            F.size("wd") >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("wd") - 3),
                    lambda j: F.concat_ws(" ", F.slice("wd", j + 1, 3)),
                )
            ),
        ).alias("sh"),
    )
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), s)), 1, 8), 16, 10
                ).cast("long"),
            )
        ).alias(f"m{j}")
        for j in range(_MH_COMP)
    ]
    sigs = sh_arr.select(
        "doc_id", "sh", F.array(*sig_cols).alias("sig")
    ).localCheckpoint()
    # checkpointed: feeds the df build and both self-join sides
    ex = sh_arr.select("doc_id", F.explode("sh").alias("shingle")).localCheckpoint()
    df_tab = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = ex.join(df_tab.filter(F.col("df") <= _MH_DF_CAP), "shingle")
    # the df cap is CANDIDATE GENERATION only (the recall dial); both the
    # exact Jaccard and the signatures must measure the same statistic —
    # Jaccard over the FULL shingle sets — or the audit would report
    # blocking truncation as estimator error. Exact J is therefore an
    # in-row array intersection of the full sets on the candidate pairs.
    cand = (
        kept.alias("a")
        .join(kept.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sha"),
        F.col("sig").alias("siga"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("shb"),
        F.col("sig").alias("sigb"),
    )
    ns = F.size(F.array_intersect("sha", "shb"))
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            (
                ns / (F.size("sha") + F.size("shb") - ns)
            ).alias("j_exact"),
            (
                F.size(
                    F.filter(
                        F.zip_with("siga", "sigb", lambda x, y: x == y),
                        lambda b: b,
                    )
                )
                / F.lit(float(_MH_COMP))
            ).alias("j_est"),
        )
        .filter(F.col("j_exact") >= _MH_MIN_J)
    )
    err = F.col("j_est") - F.col("j_exact")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.abs(err)), 4).alias("mean_abs_err"),
        F.round(F.max(F.abs(err)), 4).alias("max_abs_err"),
        F.round(F.avg(err), 4).alias("mean_signed_err"),
    )


def _mh_audit_sql() -> str:
    sig = ", ".join(
        f"list_min(list_transform(sh, s -> CAST(concat('0x', "
        f"substr(md5(concat('{j}:', s)), 1, 8)) AS BIGINT)))"
        for j in range(_MH_COMP)
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), x -> x <> '') AS wd
  FROM documents
), sh_arr AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(wd) - 1),
                                      j -> array_to_string(wd[j:j+2], ' '))) AS sh
  FROM words WHERE len(wd) >= 3
), sigs AS (
  SELECT doc_id, sh, [{sig}] AS sig FROM sh_arr
), ex AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh_arr
), df_tab AS (
  SELECT shingle, count(*) AS df FROM ex GROUP BY 1
), kept AS (
  SELECT e.doc_id, e.shingle FROM ex e JOIN df_tab USING (shingle) WHERE df <= {_MH_DF_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
), pairs AS (
  SELECT len(list_intersect(sa.sh, sb.sh)) * 1.0
           / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS j_exact,
         len(list_filter(range(1, {_MH_COMP + 1}), i -> sa.sig[i] = sb.sig[i]))
           / {float(_MH_COMP)} AS j_est
  FROM cand
  JOIN sigs sa ON doc_a = sa.doc_id
  JOIN sigs sb ON doc_b = sb.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(j_est - j_exact)), 4) AS mean_abs_err,
       round(max(abs(j_est - j_exact)), 4) AS max_abs_err,
       round(avg(j_est - j_exact), 4) AS mean_signed_err
FROM pairs
WHERE j_exact >= {_MH_MIN_J}
"""


SQL_MINHASH_ERROR_AUDIT = _mh_audit_sql()


REGISTRY_EXT22: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "markov_stationary": (q_markov_stationary, SQL_MARKOV_STATIONARY),
    "cms_width_sweep": (q_cms_width_sweep, SQL_CMS_WIDTH_SWEEP),
    "wilson_ci": (q_wilson_ci, SQL_WILSON_CI),
    "char_ngram_langid": (q_char_ngram_langid, SQL_CHAR_NGRAM_LANGID),
    "minhash_error_audit": (q_minhash_error_audit, SQL_MINHASH_ERROR_AUDIT),
}
