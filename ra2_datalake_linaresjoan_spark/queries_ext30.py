"""Batch 30 (round 6): entity-resolution and corpus-governance layer.

The record-linkage tier a lakehouse runs when the same real-world entity
arrives from several feeds, plus the governance audits a training-data
release needs before shipping:

- ``k_anonymity_audit`` — re-identification risk of the customer table
  under a (segment, nation, balance-band) quasi-identifier: group-size
  floor, singleton/under-k counts and the row fraction at risk. Exact
  integer group sizes; one aggregate over QI groups.
- ``shard_balance_audit`` — balance of a 64-way md5 content shard of the
  document corpus (the write-path layout for a 100-TB release): shard
  count, size extremes, the exact-integer chi-square against uniform
  ((S/N)*sum(n_s^2) - N — no per-shard float subtraction), and max
  row/token shard shares. One row from a shard-grain aggregate.
- ``mixture_temperature_weights`` — temperature-scaled source mixture
  (w_s ∝ tokens^0.7, the multilingual-sampling standard): per source the
  natural share, the tempered weight, the implied epochs at a
  one-natural-epoch token budget and an upsampling flag. Weights are
  quantized to 1e-6 BEFORE normalization so every ratio is a ratio of
  exact integers (order-independent).

All three are single-aggregate plans whose group counts (QI combos,
64 shards, 20 sources) are data-bounded, so they hold at any corpus
scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t

_KA_K = 5
_KA_BAND = 1000


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: k-anonymity profile of customers under the
    QI = (mktsegment, nationkey, floor(acctbal / 1000)) key — the
    minimum group size k, how many groups/rows sit below k = 5, the
    singleton count, and the at-risk row fraction. All counts exact
    integers; the fraction is an exact-integer ratio rounded once.

    A non-finite balance gets a NULL band — same as a NULL balance: the
    QI value is unknown, but the ROW still counts toward rows_total (an
    anonymity audit must not silently drop records).  The conditional
    keeps floor(±Inf/NaN) from ever reaching the BIGINT band in either
    engine (DuckDB raises; ANSI Spark is plan-luck — round-11
    value-fuzz)."""
    cust = _t(spark, sf_dir, "customer")
    # shared finite contract (round-12 advisor: inline copies risk
    # drifting from the round-11-pinned predicate)
    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    _fin = money_pred("c_acctbal")
    groups = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.when(_fin, F.floor(F.col("c_acctbal") / _KA_BAND)).alias(
            "bal_band"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.sum("n").alias("rows_total"),
        F.count(F.lit(1)).alias("qi_groups"),
        F.min("n").alias("k_min"),
        F.sum((F.col("n") == 1).cast("long")).alias("singletons"),
        F.sum((F.col("n") < _KA_K).cast("long")).alias("groups_below_k"),
        F.sum(F.when(F.col("n") < _KA_K, F.col("n")).otherwise(0)).alias(
            "rows_below_k"
        ),
    ).select(
        "rows_total",
        "qi_groups",
        "k_min",
        "singletons",
        "groups_below_k",
        "rows_below_k",
        F.round(F.col("rows_below_k") / F.col("rows_total"), 6).alias(
            "risk_frac"
        ),
    )


SQL_K_ANONYMITY_AUDIT = f"""
WITH groups AS (
  SELECT c_mktsegment, c_nationkey,
         CASE WHEN isfinite(c_acctbal) AND abs(c_acctbal) < 9.2e16
              THEN CAST(floor(c_acctbal / {_KA_BAND}) AS BIGINT) END
           AS bal_band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
), s AS (
  SELECT CAST(sum(n) AS BIGINT) AS rows_total,
         CAST(count(*) AS BIGINT) AS qi_groups,
         CAST(min(n) AS BIGINT) AS k_min,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
         CAST(sum(CASE WHEN n < {_KA_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_below_k,
         CAST(sum(CASE WHEN n < {_KA_K} THEN n ELSE 0 END) AS BIGINT)
           AS rows_below_k
  FROM groups
)
SELECT rows_total, qi_groups, k_min, singletons, groups_below_k,
       rows_below_k,
       round(rows_below_k * 1.0 / rows_total, 6) AS risk_frac
FROM s
"""


# ---------------------------------------------------------------------------
# shard_balance_audit — 64-way content-shard layout check
# ---------------------------------------------------------------------------

_SB_SHARDS = 64


def q_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row auditing the md5 64-way shard layout of documents: shards
    used, min/max shard sizes, the chi-square statistic against uniform
    computed EXACTLY from integer moments ((S/N)·Σn² − N — no per-shard
    float error to accumulate), and the worst row / token shard shares
    as multiples of the uniform share. A real writer uses this before
    committing a bucketed layout; a skewed shard is a straggler at read
    time."""
    # a NULL doc_id has no shard (md5 of NULL is NULL) — unfiltered it
    # formed a 65th pseudo-shard counted into sum_n2/rows_total while the
    # chi-square still used S=64, biasing the statistic on both engines
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    shards = docs.groupBy(
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("s:"), F.col("doc_id"))), 1, 4),
                16,
                10,
            ).cast("long")
            % _SB_SHARDS
        ).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("tok"),
    )
    s = F.lit(float(_SB_SHARDS))
    return shards.agg(
        F.count(F.lit(1)).alias("shards_used"),
        F.sum("n").alias("rows_total"),
        F.min("n").alias("min_shard_rows"),
        F.max("n").alias("max_shard_rows"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
        F.sum("tok").alias("tok_total"),
        F.max("tok").alias("max_shard_tok"),
    ).select(
        "shards_used",
        "rows_total",
        "min_shard_rows",
        "max_shard_rows",
        F.round(
            s * F.col("sum_n2") / F.col("rows_total")
            - F.col("rows_total").cast("double"),
            4,
        ).alias("chi2_uniform"),
        F.round(
            s * F.col("max_shard_rows") / F.col("rows_total"), 4
        ).alias("max_row_share_x"),
        F.round(s * F.col("max_shard_tok") / F.col("tok_total"), 4).alias(
            "max_tok_share_x"
        ),
    )


SQL_SHARD_BALANCE_AUDIT = f"""
WITH shards AS (
  SELECT CAST(concat('0x', substr(md5(concat('s:', doc_id)), 1, 4)) AS BIGINT)
           % {_SB_SHARDS} AS shard,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS tok
  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS shards_used,
         CAST(sum(n) AS BIGINT) AS rows_total,
         CAST(min(n) AS BIGINT) AS min_shard_rows,
         CAST(max(n) AS BIGINT) AS max_shard_rows,
         CAST(sum(n * n) AS BIGINT) AS sum_n2,
         CAST(sum(tok) AS BIGINT) AS tok_total,
         CAST(max(tok) AS BIGINT) AS max_shard_tok
  FROM shards
)
SELECT shards_used, rows_total, min_shard_rows, max_shard_rows,
       round({_SB_SHARDS}.0 * sum_n2 / rows_total
             - CAST(rows_total AS DOUBLE), 4) AS chi2_uniform,
       round({_SB_SHARDS}.0 * max_shard_rows / rows_total, 4)
         AS max_row_share_x,
       round({_SB_SHARDS}.0 * max_shard_tok / tok_total, 4)
         AS max_tok_share_x
FROM s
"""


# ---------------------------------------------------------------------------
# mixture_temperature_weights — tempered source sampling plan
# ---------------------------------------------------------------------------

_MT_TAU = 0.7
_MT_Q = 1_000_000


def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token mass, natural share, the temperature-0.7
    sampling weight, the implied epochs over that source at a
    one-natural-epoch budget (weight / natural share) and whether it is
    upsampled. pow(tok, 0.7) is one double op per SOURCE (20 rows);
    weights are quantized to 1e-6 before normalization so the
    normalizing sum is an exact BIGINT and every emitted ratio is
    order-independent."""
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("tok"))
    src = src.withColumn(
        "qw",
        F.round(F.pow(F.col("tok").cast("double"), F.lit(_MT_TAU)) * _MT_Q)
        .cast("long"),
    )
    tot = src.agg(
        F.sum("tok").alias("tok_all"), F.sum("qw").alias("qw_all")
    )
    out = src.crossJoin(F.broadcast(tot))
    weight = F.col("qw") / F.col("qw_all")
    natural = F.col("tok") / F.col("tok_all")
    # DECIMAL(38,0) products: qw ~ tok^0.7 * 1e6, so qw*tok_all passes
    # 2^63 around GB-scale corpora — a raw BIGINT product wraps silently
    # in Spark and raises in DuckDB (the join_reorder_advisor rule)
    qw_d = F.col("qw").cast("decimal(38,0)")
    tok_all_d = F.col("tok_all").cast("decimal(38,0)")
    qw_all_d = F.col("qw_all").cast("decimal(38,0)")
    tok_d = F.col("tok").cast("decimal(38,0)")
    epochs = (qw_d * tok_all_d).cast("double") / (
        (qw_all_d * tok_d).cast("double")
    )
    return (
        out.select(
            "source",
            "tok",
            F.round(natural, 6).alias("natural_share"),
            F.round(weight, 6).alias("weight"),
            F.round(epochs, 4).alias("epochs"),
            (qw_d * tok_all_d > qw_all_d * tok_d).alias("upsampled"),
        )
        .orderBy("source")
    )


SQL_MIXTURE_TEMPERATURE_WEIGHTS = f"""
WITH src AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tok
  FROM documents GROUP BY 1
), q AS (
  SELECT source, tok,
         CAST(round(pow(CAST(tok AS DOUBLE), CAST({_MT_TAU!r} AS DOUBLE))
                    * {_MT_Q}) AS BIGINT) AS qw
  FROM src
), tot AS (
  SELECT CAST(sum(tok) AS BIGINT) AS tok_all,
         CAST(sum(qw) AS BIGINT) AS qw_all
  FROM q
)
SELECT source, tok,
       round(tok * 1.0 / tok_all, 6) AS natural_share,
       round(qw * 1.0 / qw_all, 6) AS weight,
       round(CAST(CAST(qw AS HUGEINT) * tok_all AS DOUBLE)
             / CAST(CAST(qw_all AS HUGEINT) * tok AS DOUBLE), 4) AS epochs,
       CAST(qw AS HUGEINT) * tok_all > CAST(qw_all AS HUGEINT) * tok
         AS upsampled
FROM q, tot
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Coordinate-sign LSH bucket (shared by the two cluster-evaluation audits):
# 6 sign bits of the leading embedding coordinates -> 64 buckets.  A fixed
# coordinate projection rather than random hyperplanes so both engines (and
# every run) agree bit-for-bit; the evaluation math is projection-agnostic.
# ---------------------------------------------------------------------------

_CS_BITS = 6
_BQ_Q = 1_000_000_000


def _sign_bucket_col():
    b = F.lit(0)
    for k in range(_CS_BITS):
        b = b + (F.col("embedding").getItem(k) >= 0).cast("int") * (1 << k)
    return b


def _sign_bucket_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{k + 1}] >= 0 THEN {1 << k} ELSE 0 END)"
        for k in range(_CS_BITS)
    )
    return f"({terms})"


def _bg_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, label) group sizes over LABELED, BUCKETABLE rows only:
    a NULL label is not a gold class (its members would otherwise count
    as pairwise matches of each other) and a NULL embedding has no
    bucket — filtering on both engines also keeps this population
    identical to bcubed_cluster_eval's, whose inner joins drop the
    same rows. The embedding side routes through the shared
    _emb_clean/EMB_CLEAN_SQL lockstep filter: an interior-NULL
    component makes the Spark sign-bucket NULL while the oracle's
    CASE ELSE 0 still buckets the row (round-8 parity audit)."""
    emb = _emb_clean(spark, sf_dir).where(F.col("label").isNotNull())
    return emb.groupBy(
        _sign_bucket_col().alias("bucket"), F.col("label")
    ).agg(F.count(F.lit(1)).alias("n_bg"))


_BG_SQL = f"""
  SELECT {_sign_bucket_sql()} AS bucket, label,
         CAST(count(*) AS BIGINT) AS n_bg
  FROM embeddings
  WHERE label IS NOT NULL AND {EMB_CLEAN_SQL}
  GROUP BY 1, 2
"""


def q_blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: pairwise quality of the sign-bucket blocking scheme
    against the label gold — candidate pairs Σ C(n_b,2), gold pairs
    Σ C(n_g,2), co-blocked gold pairs Σ C(n_bg,2), and from those the
    pairs-completeness (blocking recall), candidate precision, and
    reduction ratio vs the all-pairs quadratic.  Everything derives
    from (bucket,label) GROUP SIZES — no pair is ever materialized, so
    the audit costs one shuffle at any corpus size."""
    bg = _bg_counts(spark, sf_dir).localCheckpoint()
    b = bg.groupBy("bucket").agg(F.sum("n_bg").alias("n_b"))
    g = bg.groupBy("label").agg(F.sum("n_bg").alias("n_g"))
    # integer halving (Σn(n-1) is always even) — the minhash_bucket_skew
    # `DIV 2` discipline: a `/ 2` double round-trip loses exactness once
    # the quadratic pair count passes 2^53, which gold/candidate pair
    # counts plausibly reach at 100-TB corpus scale.
    c2 = lambda c: F.expr(f"sum({c} * ({c} - 1)) DIV 2")
    stats = (
        bg.agg(c2("n_bg").alias("hit"), F.sum("n_bg").alias("items"))
        .crossJoin(b.agg(c2("n_b").alias("cand")))
        .crossJoin(g.agg(c2("n_g").alias("gold")))
    )
    all_pairs = F.expr("items * (items - 1) DIV 2")
    # zero-denominator guards (round-9 decorrelated dirty audit): a
    # labeled population of singletons has gold = 0 (and a 1-item one
    # has no pairs at all) — DuckDB's x/0 is NULL while unguarded Spark
    # division ANSI-crashes the job
    return stats.select(
        "items",
        F.col("cand").alias("cand_pairs"),
        F.col("gold").alias("gold_pairs"),
        F.col("hit").alias("co_blocked_gold"),
        F.round(
            F.when(F.col("gold") > 0, F.col("hit") / F.col("gold")), 6
        ).alias("completeness"),
        F.round(
            F.when(F.col("cand") > 0, F.col("hit") / F.col("cand")), 6
        ).alias("cand_precision"),
        F.round(
            F.when(all_pairs > 0, F.lit(1.0) - F.col("cand") / all_pairs), 6
        ).alias("reduction_ratio"),
    )


SQL_BLOCKING_QUALITY_AUDIT = f"""
WITH bg AS ({_BG_SQL}),
s AS (
  SELECT CAST(sum(n_bg * (n_bg - 1)) // 2 AS BIGINT) AS hit,
         CAST(sum(n_bg) AS BIGINT) AS items
  FROM bg
), bs AS (
  SELECT CAST(sum(n_b * (n_b - 1)) // 2 AS BIGINT) AS cand
  FROM (SELECT bucket, CAST(sum(n_bg) AS BIGINT) AS n_b FROM bg GROUP BY 1)
), gs AS (
  SELECT CAST(sum(n_g * (n_g - 1)) // 2 AS BIGINT) AS gold
  FROM (SELECT label, CAST(sum(n_bg) AS BIGINT) AS n_g FROM bg GROUP BY 1)
)
SELECT items, cand AS cand_pairs, gold AS gold_pairs,
       hit AS co_blocked_gold,
       round(hit * 1.0 / gold, 6) AS completeness,
       round(hit * 1.0 / cand, 6) AS cand_precision,
       round(1.0 - cand * 1.0 / CAST(items * (items - 1) // 2 AS BIGINT), 6)
         AS reduction_ratio
FROM s, bs, gs
"""


def q_bcubed_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: B-cubed precision / recall / F1 of the sign-bucket
    clustering against the label gold.  B³P = (1/N)·Σ_{b,g} n_bg²/n_b
    (per-item precision averaged), B³R the same over n_g — both reduce
    to sums over the (bucket,label) CONTINGENCY TABLE, never items or
    pairs.  Each bounded-count term is quantized to 1e-9 before the
    cross-group sum so the average is an exact-integer ratio
    (order-independent); P and R then combine to F1 in-row."""
    bg = _bg_counts(spark, sf_dir).localCheckpoint()
    b = bg.groupBy("bucket").agg(F.sum("n_bg").alias("n_b"))
    g = bg.groupBy("label").agg(F.sum("n_bg").alias("n_g"))
    terms = bg.join(b, "bucket").join(g, "label")
    qp = F.round(
        F.col("n_bg") * F.col("n_bg") / F.col("n_b") * _BQ_Q
    ).cast("long")
    qr = F.round(
        F.col("n_bg") * F.col("n_bg") / F.col("n_g") * _BQ_Q
    ).cast("long")
    s = terms.agg(
        F.sum("n_bg").alias("items"),
        F.countDistinct("bucket").alias("clusters"),
        F.countDistinct("label").alias("gold_classes"),
        F.sum(qp).alias("sp"),
        F.sum(qr).alias("sr"),
    )
    p = F.col("sp") / (F.lit(float(_BQ_Q)) * F.col("items"))
    r = F.col("sr") / (F.lit(float(_BQ_Q)) * F.col("items"))
    return s.select(
        "items",
        "clusters",
        "gold_classes",
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), 6).alias("bcubed_f1"),
    )


SQL_BCUBED_CLUSTER_EVAL = f"""
WITH bg AS ({_BG_SQL}),
b AS (SELECT bucket, CAST(sum(n_bg) AS BIGINT) AS n_b FROM bg GROUP BY 1),
g AS (SELECT label, CAST(sum(n_bg) AS BIGINT) AS n_g FROM bg GROUP BY 1),
terms AS (
  SELECT n_bg,
         CAST(round(n_bg * n_bg * 1.0 / n_b * {_BQ_Q}) AS BIGINT) AS qp,
         CAST(round(n_bg * n_bg * 1.0 / n_g * {_BQ_Q}) AS BIGINT) AS qr,
         bg.bucket AS bucket, bg.label AS label
  FROM bg JOIN b USING (bucket) JOIN g USING (label)
), s AS (
  SELECT CAST(sum(n_bg) AS BIGINT) AS items,
         CAST(count(DISTINCT bucket) AS BIGINT) AS clusters,
         CAST(count(DISTINCT label) AS BIGINT) AS gold_classes,
         CAST(sum(qp) AS BIGINT) AS sp,
         CAST(sum(qr) AS BIGINT) AS sr
  FROM terms
)
SELECT items, clusters, gold_classes,
       round(sp / ({_BQ_Q}.0 * items), 6) AS bcubed_precision,
       round(sr / ({_BQ_Q}.0 * items), 6) AS bcubed_recall,
       round(2 * (sp / ({_BQ_Q}.0 * items)) * (sr / ({_BQ_Q}.0 * items))
             / (sp / ({_BQ_Q}.0 * items) + sr / ({_BQ_Q}.0 * items)), 6)
         AS bcubed_f1
FROM s
"""


# ---------------------------------------------------------------------------
# matryoshka_prefix_fidelity — cosine preservation under prefix truncation
# ---------------------------------------------------------------------------

_MP_DIMS = (8, 16, 32, 64)
_MP_Q = 1_000_000


def q_matryoshka_prefix_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per prefix dimension (8/16/32/64): over the deterministic
    consecutive-id pair set, the mean |cos_prefix − cos_full| and mean
    prefix cosine — would truncated (matryoshka-style) embeddings
    preserve similarity?  Cosines are in-row folds over index-ordered
    slices (engine-identical doubles); each pair's values quantize to
    1e-6 so the means are exact-integer ratios.  The pair set is
    id-adjacent (one 1-shifted self-join), so cost is linear in the
    corpus, not quadratic. Routes through _emb_clean/EMB_CLEAN_SQL:
    an interior-NULL component NULLs Spark's prefix dot (dropping the
    struct under the long cast) while DuckDB's list_sum skips it
    (round-8 parity audit)."""
    emb = _emb_clean(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("pid"), F.col("v").alias("va"))
    b = emb.select((F.col("vec_id") - 1).alias("pid"), F.col("v").alias("vb"))
    pairs = a.join(b, "pid")

    def cos(d: int):
        va, vb = F.slice(F.col("va"), 1, d), F.slice(F.col("vb"), 1, d)
        dot = F.aggregate(
            F.zip_with(va, vb, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.sqrt(
            F.aggregate(va, F.lit(0.0), lambda acc, v: acc + v * v)
        )
        nb = F.sqrt(
            F.aggregate(vb, F.lit(0.0), lambda acc, v: acc + v * v)
        )
        # zero-norm prefix convention: cos = 0.0 (a raw 0/0 was NaN,
        # which Spark's long cast silently turned into a perfect q_err=0
        # while DuckDB raised on CAST(NaN AS BIGINT))
        return F.when((na != 0.0) & (nb != 0.0), dot / (na * nb)).otherwise(
            F.lit(0.0)
        )

    full = cos(_MP_DIMS[-1])
    rows = pairs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("prefix_dim"),
                        F.round(F.abs(cos(d) - full) * _MP_Q)
                        .cast("long")
                        .alias("q_err"),
                        F.round(cos(d) * _MP_Q).cast("long").alias("q_cos"),
                    )
                    for d in _MP_DIMS
                ]
            )
        ).alias("m")
    ).select("m.prefix_dim", "m.q_err", "m.q_cos")
    return (
        rows.groupBy("prefix_dim")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("q_err") / (F.lit(float(_MP_Q)) * F.count(F.lit(1))), 6)
            .alias("mean_abs_err"),
            F.round(F.sum("q_cos") / (F.lit(float(_MP_Q)) * F.count(F.lit(1))), 6)
            .alias("mean_cos"),
        )
        .orderBy("prefix_dim")
    )


def _mp_cos_sql(d: int) -> str:
    dot = (
        f"list_sum(list_transform(range(1, {d} + 1), i -> va[i] * vb[i]))"
    )
    na = f"sqrt(list_sum(list_transform(range(1, {d} + 1), i -> va[i] * va[i])))"
    nb = f"sqrt(list_sum(list_transform(range(1, {d} + 1), i -> vb[i] * vb[i])))"
    # zero-norm convention mirrors the Spark side: cos = 0.0
    return (
        f"(CASE WHEN {na} <> 0 AND {nb} <> 0"
        f" THEN ({dot} / ({na} * {nb})) ELSE 0.0 END)"
    )


_MP_STRUCTS = ", ".join(
    f"struct_pack(prefix_dim := {d}, "
    f"q_err := CAST(round(abs({_mp_cos_sql(d)} - {_mp_cos_sql(_MP_DIMS[-1])})"
    f" * {_MP_Q}) AS BIGINT), "
    f"q_cos := CAST(round({_mp_cos_sql(d)} * {_MP_Q}) AS BIGINT))"
    for d in _MP_DIMS
)

SQL_MATRYOSHKA_PREFIX_FIDELITY = f"""
WITH clean AS (
  SELECT vec_id, embedding FROM embeddings WHERE {EMB_CLEAN_SQL}
), pairs AS (
  SELECT CAST(a.embedding AS DOUBLE[]) AS va,
         CAST(b.embedding AS DOUBLE[]) AS vb
  FROM clean a JOIN clean b ON b.vec_id = a.vec_id + 1
), rows_m AS (
  SELECT unnest([{_MP_STRUCTS}], recursive := true)
  FROM pairs
)
SELECT prefix_dim, CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum(q_err) / ({_MP_Q}.0 * count(*)), 6) AS mean_abs_err,
       round(sum(q_cos) / ({_MP_Q}.0 * count(*)), 6) AS mean_cos
FROM rows_m
GROUP BY prefix_dim
ORDER BY prefix_dim
"""


# ---------------------------------------------------------------------------
# fellegi_sunter_em — record-linkage match/unmatch parameter estimation
# ---------------------------------------------------------------------------
#
# The Fellegi-Sunter model (the canonical probabilistic record-linkage
# framework) fits, by EM, a two-class latent mixture over binary field-
# agreement patterns: for each compared field j, the probability m_j that
# matched pairs agree and u_j that unmatched pairs agree, plus the match
# prevalence lambda.  The distributed part is the pair generation and the
# pattern CONTINGENCY aggregation (one linear merge-join + one groupBy on a
# <=16-value key); EM itself runs on the collected <=16 pattern counts —
# a bounded table at any corpus size, so the driver loop is O(16 * iters)
# scalars, not a collect of data.  Both engines run the identical
# iteration: every parameter is quantized to 1e-12 and clamped to
# [1e-9, 1-1e-9] after each M-step, sums accumulate in fixed pattern-id
# order, so Python (Spark side) and the DuckDB recursive CTE stay
# bit-identical.

_FS_ITERS = 12
_FS_FIELDS = ("acctbal_band", "acctbal_sign", "mktsegment", "nationkey")
# bit order in the pattern id (field j contributes 2**j)
_FS_BITS = ("mktsegment", "nationkey", "acctbal_band", "acctbal_sign")
_FS_EPS = 1e-9
_FS_QF = 1e12


def _fs_qc(x: float) -> float:
    import math

    return min(max(math.floor(x * _FS_QF + 0.5) / _FS_QF, _FS_EPS), 1.0 - _FS_EPS)


def q_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per compared field (4 rows): the EM-fitted Fellegi-Sunter m/u
    probabilities, the log2 agreement / disagreement weights, the match
    prevalence lambda and the candidate-pair count.  Pairs are the
    consecutive-custkey set (one 1-shifted self-join — linear in the
    table, merge-joinable); fields are exact equality on mktsegment,
    nationkey, floor(acctbal/100) and the acctbal sign.  The EM
    runs on the collected 16-row pattern table (bounded at any scale);
    12 iterations from a fixed init with 1e-12 per-step quantization
    keep both engines bit-identical."""
    import math

    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    # bounded conditional band (round-13 finite-out-of-domain carriers):
    # Spark's floor() yields LONG and SATURATES on a huge double while
    # DuckDB's floor stays DOUBLE — the saturated longs of two different
    # huge balances compare EQUAL in Spark but different in DuckDB,
    # flipping the f2 agreement bit and every EM ratio after it.  An
    # out-of-domain balance bands to NULL on both sides (NULL-NULL is a
    # defined agreement under eqNullSafe / IS NOT DISTINCT FROM).
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.when(
            money_pred("c_acctbal"), F.floor(F.col("c_acctbal") / 100)
        ).alias("band"),
        (F.col("c_acctbal") < 0).alias("clen"),
    )
    a = cust.select(
        F.col("c_custkey").alias("pid"),
        F.col("seg").alias("seg_a"),
        F.col("nat").alias("nat_a"),
        F.col("band").alias("band_a"),
        F.col("clen").alias("clen_a"),
    )
    b = cust.select(
        (F.col("c_custkey") - 1).alias("pid"),
        F.col("seg").alias("seg_b"),
        F.col("nat").alias("nat_b"),
        F.col("band").alias("band_b"),
        F.col("clen").alias("clen_b"),
    )
    # eqNullSafe: a NULL field on either side is a defined NON-match
    # (bit 0), never a NULL pattern — a plain == propagated NULL through
    # the sum, Spark then crashed on c[None] while DuckDB's CASE dropped
    # the pair from every c_j but not from tot, biasing all EM ratios
    pattern = (
        F.col("seg_a").eqNullSafe(F.col("seg_b")).cast("int")
        + F.col("nat_a").eqNullSafe(F.col("nat_b")).cast("int") * 2
        + F.col("band_a").eqNullSafe(F.col("band_b")).cast("int") * 4
        + F.col("clen_a").eqNullSafe(F.col("clen_b")).cast("int") * 8
    )
    pat_counts = (
        a.join(b, "pid")
        .select(pattern.alias("pat"))
        .groupBy("pat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    c = [0] * 16
    for row in pat_counts:
        c[row["pat"]] = row["n"]
    tot = sum(c)
    schema = (
        "field string, m double, u double, lam double, pairs_total long"
    )
    cb = [sum(c[x] for x in range(16) if x & (1 << j)) for j in range(4)]
    p = 0.05
    m = [0.9, 0.9, 0.9, 0.9]
    u = [0.1, 0.1, 0.1, 0.1]
    for _ in range(_FS_ITERS if tot > 0 else 0):
        g = []
        for x in range(16):
            wm = p
            wu = 1.0 - p
            for j in range(4):
                if x & (1 << j):
                    wm = wm * m[j]
                    wu = wu * u[j]
                else:
                    wm = wm * (1.0 - m[j])
                    wu = wu * (1.0 - u[j])
            g.append(wm / (wm + wu))
        sp = 0.0
        for x in range(16):
            sp = sp + c[x] * g[x]
        spc = min(max(sp, _FS_EPS), tot * (1.0 - _FS_EPS))
        sm = []
        for j in range(4):
            s = 0.0
            for x in range(16):
                if x & (1 << j):
                    s = s + c[x] * g[x]
            sm.append(s)
        p = _fs_qc(spc / tot)
        m = [_fs_qc(sm[j] / spc) for j in range(4)]
        u = [_fs_qc((cb[j] - sm[j]) / (tot - spc)) for j in range(4)]

    bit_of = {name: j for j, name in enumerate(_FS_BITS)}
    rows = (
        [
            (name, m[bit_of[name]], u[bit_of[name]], p, tot)
            for name in _FS_FIELDS
        ]
        if tot > 0
        else []
    )
    raw = spark.createDataFrame(rows, schema)
    return raw.select(
        "field",
        F.round("m", 6).alias("m_prob"),
        F.round("u", 6).alias("u_prob"),
        F.round(F.log2(F.col("m") / F.col("u")), 6).alias("w_agree"),
        F.round(
            F.log2((F.lit(1.0) - F.col("m")) / (F.lit(1.0) - F.col("u"))), 6
        ).alias("w_disagree"),
        F.round("lam", 6).alias("lambda_match"),
        "pairs_total",
    ).orderBy("field")


def _fs_qc_sql(x: str) -> str:
    return (
        f"least(greatest(floor(({x}) * 1e12 + 0.5) / 1e12, 1e-9), 1.0 - 1e-9)"
    )


def _fs_g_sql(x: int) -> str:
    wm = "p"
    wu = "(1.0 - p)"
    for j in range(4):
        if x & (1 << j):
            wm = f"({wm} * m{j})"
            wu = f"({wu} * u{j})"
        else:
            wm = f"({wm} * (1.0 - m{j}))"
            wu = f"({wu} * (1.0 - u{j}))"
    return f"({wm} / ({wm} + {wu}))"


def _fs_sum_sql(bit: int | None) -> str:
    terms = [
        f"(c{x} * g{x})"
        for x in range(16)
        if bit is None or x & (1 << bit)
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = f"({expr} + {t})"
    return expr


# IS NOT DISTINCT FROM: a NULL field is a defined NON-match, mirroring
# the Spark side's eqNullSafe — a plain = left f_j NULL, which fell out
# of every CASE count but not out of tot, biasing all EM denominators
_FS_PAIR_FIELDS = """
  SELECT (a.c_mktsegment IS NOT DISTINCT FROM b.c_mktsegment) AS f0,
         (a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey) AS f1,
         ((CASE WHEN isfinite(a.c_acctbal) AND abs(a.c_acctbal) < 9.2e16
                THEN floor(a.c_acctbal / 100) END) IS NOT DISTINCT FROM
          (CASE WHEN isfinite(b.c_acctbal) AND abs(b.c_acctbal) < 9.2e16
                THEN floor(b.c_acctbal / 100) END)) AS f2,
         ((a.c_acctbal < 0) IS NOT DISTINCT FROM (b.c_acctbal < 0)) AS f3
  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
"""

_FS_COUNT_COLS = ", ".join(
    "CAST(sum(CASE WHEN "
    + " AND ".join(
        f"{'' if x & (1 << j) else 'NOT '}f{j}" for j in range(4)
    )
    + f" THEN 1 ELSE 0 END) AS BIGINT) AS c{x}"
    for x in range(16)
)

_FS_CB_COLS = ", ".join(
    f"CAST(sum(CASE WHEN f{j} THEN 1 ELSE 0 END) AS BIGINT) AS cb{j}"
    for j in range(4)
)

_FS_G_COLS = ", ".join(f"{_fs_g_sql(x)} AS g{x}" for x in range(16))

_FS_EM_COLS = "it, p, m0, m1, m2, m3, u0, u1, u2, u3"

_FS_STEP = (
    "SELECT it + 1, "
    + _fs_qc_sql("spc / tot")
    + ", "
    + ", ".join(_fs_qc_sql(f"sm{j} / spc") for j in range(4))
    + ", "
    + ", ".join(_fs_qc_sql(f"(cb{j} - sm{j}) / (tot - spc)") for j in range(4))
    + f"""
  FROM (
    SELECT it, tot, cb0, cb1, cb2, cb3,
           least(greatest({_fs_sum_sql(None)}, 1e-9), tot * (1.0 - 1e-9))
             AS spc,
           {", ".join(f"{_fs_sum_sql(j)} AS sm{j}" for j in range(4))}
    FROM (
      SELECT em.*, k.*, {_FS_G_COLS}
      FROM em, k
      WHERE em.it < {_FS_ITERS}
    )
  )"""
)

_FS_FIELD_ROWS = " UNION ALL ".join(
    f"SELECT '{name}' AS field, m{_FS_BITS.index(name)} AS m,"
    f" u{_FS_BITS.index(name)} AS u, p, tot FROM fin, k"
    for name in _FS_FIELDS
)

SQL_FELLEGI_SUNTER_EM = f"""
WITH RECURSIVE pairs AS ({_FS_PAIR_FIELDS}),
k AS (
  SELECT CAST(count(*) AS BIGINT) AS tot, {_FS_COUNT_COLS}, {_FS_CB_COLS}
  FROM pairs
  HAVING count(*) > 0
),
em({_FS_EM_COLS}) AS (
  SELECT 0, CAST(0.05 AS DOUBLE),
         {", ".join(["CAST(0.9 AS DOUBLE)"] * 4)},
         {", ".join(["CAST(0.1 AS DOUBLE)"] * 4)}
  FROM k
  UNION ALL
  {_FS_STEP}
),
fin AS (SELECT * FROM em WHERE it = {_FS_ITERS})
SELECT field, round(m, 6) AS m_prob, round(u, 6) AS u_prob,
       round(log2(m / u), 6) AS w_agree,
       round(log2((1.0 - m) / (1.0 - u)), 6) AS w_disagree,
       round(p, 6) AS lambda_match, tot AS pairs_total
FROM ({_FS_FIELD_ROWS})
ORDER BY field
"""


REGISTRY_EXT30: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "fellegi_sunter_em": (q_fellegi_sunter_em, SQL_FELLEGI_SUNTER_EM),
    "blocking_quality_audit": (
        q_blocking_quality_audit,
        SQL_BLOCKING_QUALITY_AUDIT,
    ),
    "bcubed_cluster_eval": (q_bcubed_cluster_eval, SQL_BCUBED_CLUSTER_EVAL),
    "matryoshka_prefix_fidelity": (
        q_matryoshka_prefix_fidelity,
        SQL_MATRYOSHKA_PREFIX_FIDELITY,
    ),
    "k_anonymity_audit": (q_k_anonymity_audit, SQL_K_ANONYMITY_AUDIT),
    "shard_balance_audit": (q_shard_balance_audit, SQL_SHARD_BALANCE_AUDIT),
    "mixture_temperature_weights": (
        q_mixture_temperature_weights,
        SQL_MIXTURE_TEMPERATURE_WEIGHTS,
    ),
}
