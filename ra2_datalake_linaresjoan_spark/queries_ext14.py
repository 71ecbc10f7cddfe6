"""Relational batch 14 (round 3 continuation): market-basket association
rules, duplicate-cluster demography, and conversion-latency percentiles.

- ``association_rules`` is the frequent-itemset / association-rule
  classic (support, confidence, lift) over (user, day) event baskets.
  Baskets collapse to sorted DISTINCT item arrays in one aggregate;
  pairs are generated IN-ROW from each basket's array (baskets are
  item-vocabulary-bounded, so the pair fan-out is a constant factor) —
  the a-priori candidate join never materializes basket×basket pairs.
  All metrics are ratios of exact basket counts.
- ``fingerprint_cluster_histogram`` profiles duplicate-cluster sizes
  (how many content fingerprints have 1, 2, 3… holders) — the cluster
  demography that sizes a dedup job before running it. Two aggregates,
  both shrinking (rows → fingerprints → sizes).
- ``funnel_time_to_convert`` reports per-user signup→first-purchase
  latency percentiles (exact, over integer seconds) — the
  time-dimension complement of the step-count ``funnel_steps``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# association_rules — support / confidence / lift over event baskets
# ---------------------------------------------------------------------------


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over (user, day) baskets of event types:
    support(a,b), confidence(a→b) and lift for every ORDERED pair of
    co-occurring items. Baskets aggregate once (array_sort ∘
    collect_set); each basket emits its ordered item pairs in-row; item
    marginals ride a second tiny aggregate and broadcast back. With
    |items| bounded (event vocabulary), every post-basket structure is
    vocabulary-sized however many baskets exist — the scale shape the
    a-priori family needs. Ratios of exact counts, 6 dp."""
    ev = _t(spark, sf_dir, "events")
    baskets = (
        ev.select(F.to_date("ts").alias("day"), "user_id", "event_type")
        .groupBy("user_id", "day")
        .agg(F.array_sort(F.collect_set("event_type")).alias("items"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, a ->"
                    " transform(filter(items, b -> b != a), b ->"
                    " struct(a AS ante, b AS cons))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.ante").alias("ante"), F.col("p.cons").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    a_cnt = item_counts.select(
        F.col("item").alias("ante"), F.col("n_item").alias("n_ante")
    )
    c_cnt = item_counts.select(
        F.col("item").alias("cons"), F.col("n_item").alias("n_cons")
    )
    return (
        pairs.join(F.broadcast(a_cnt), "ante")
        .join(F.broadcast(c_cnt), "cons")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "ante",
            "cons",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("n_ante"), 6).alias("confidence"),
            F.round(
                (F.col("n_pair") * F.col("n_baskets"))
                / (F.col("n_ante") * F.col("n_cons")),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


SQL_ASSOCIATION_RULES = """
WITH baskets AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         list_sort(list(DISTINCT event_type)) AS items
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM baskets
), item_counts AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item
  FROM (SELECT unnest(items) AS item FROM baskets) GROUP BY item
), pairs AS (
  SELECT ante, cons, CAST(count(*) AS BIGINT) AS n_pair
  FROM (
    SELECT a.a AS ante, b.b AS cons
    FROM baskets, unnest(items) AS a(a), unnest(items) AS b(b)
    WHERE a.a <> b.b
  ) GROUP BY ante, cons
)
SELECT ante, cons, n_pair,
       round(n_pair / CAST(n_baskets AS DOUBLE), 6) AS support,
       round(n_pair / CAST(na.n_item AS DOUBLE), 6) AS confidence,
       round((n_pair * n_baskets) / CAST(na.n_item * nc.n_item AS DOUBLE), 6)
         AS lift
FROM pairs
JOIN item_counts na ON pairs.ante = na.item
JOIN item_counts nc ON pairs.cons = nc.item
CROSS JOIN tot
ORDER BY ante, cons
"""


# ---------------------------------------------------------------------------
# fingerprint_cluster_histogram — duplicate-cluster size demography
# ---------------------------------------------------------------------------


def q_fingerprint_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of content-fingerprint cluster sizes (40-char prefix
    identity, as in the leakage/provenance queries): how many clusters
    have exactly k member documents, with the duplicate-row total each
    size class contributes. Two shrinking aggregates — docs →
    fingerprints → sizes; the output bounds the work (and the savings)
    of a full dedup before paying for one."""
    docs = _t(spark, sf_dir, "documents")
    clusters = docs.groupBy(F.substring("text", 1, 40).alias("fp")).agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        clusters.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "k",
            "n_clusters",
            (F.col("k") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("k") - 1) * F.col("n_clusters")).alias("n_removable"),
        )
        .orderBy("k")
    )


SQL_FINGERPRINT_CLUSTER_HISTOGRAM = """
WITH clusters AS (
  SELECT substr(text, 1, 40) AS fp, CAST(count(*) AS BIGINT) AS k
  FROM documents GROUP BY 1
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(k * count(*) AS BIGINT) AS n_docs,
       CAST((k - 1) * count(*) AS BIGINT) AS n_removable
FROM clusters GROUP BY k ORDER BY k
"""


# ---------------------------------------------------------------------------
# funnel_time_to_convert — signup → first purchase latency percentiles
# ---------------------------------------------------------------------------


def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per user, seconds from FIRST signup to FIRST
    purchase AFTER it; exact p25/p50/p90 over those integer latencies
    plus the converted-user count. Two min_by-free aggregates (min over
    filtered timestamps — a combine-enabled shuffle), one latency table
    users-sized, exact grouped percentiles on integers (halves at
    worst — bit-stable, cf. ``median_orders``)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    lat = (
        per_user.filter(F.col("first_signup").isNotNull())
        .join(purch, "user_id")
        .filter(F.col("pts") >= F.col("first_signup"))
        .groupBy("user_id")
        .agg(
            (
                (
                    F.unix_micros(F.min("pts"))
                    - F.unix_micros(F.first("first_signup"))
                )
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("latency_s")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile(latency_s, 0.25)").alias("p25_s"),
        F.expr("percentile(latency_s, 0.5)").alias("p50_s"),
        F.expr("percentile(latency_s, 0.9)").alias("p90_s"),
    )


SQL_FUNNEL_TIME_TO_CONVERT = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
  FROM events GROUP BY user_id
), lat AS (
  SELECT e.user_id,
         CAST((epoch_us(min(e.ts)) - epoch_us(any_value(p.first_signup)))
              // 1000000 AS BIGINT) AS latency_s
  FROM events e
  JOIN per_user p ON e.user_id = p.user_id
  WHERE e.event_type = 'purchase'
    AND p.first_signup IS NOT NULL
    AND e.ts >= p.first_signup
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(latency_s, 0.25) AS p25_s,
       quantile_cont(latency_s, 0.5) AS p50_s,
       quantile_cont(latency_s, 0.9) AS p90_s
FROM lat
"""


# ---------------------------------------------------------------------------
# exact_corr_moments — Pearson r from exact integer moments
# ---------------------------------------------------------------------------


def q_exact_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation between document length (chars)
    and vocabulary breadth (distinct words) computed from EXACT integer
    moments (n, Σx, Σy, Σxy, Σx², Σy²) — the five sums are BIGINT
    aggregates (partition-order-invariant, unlike a float ``corr()``
    whose partial accumulations drift per partitioning), and r is one
    in-row IEEE expression over them, rounded at 6 dp. The same
    partial+final shape ``regr_slope`` uses, hardened for cross-engine
    hashing. Complete cases only: a row with NULL x or NULL y is
    excluded from EVERY moment including n (per-sum null-skipping would
    mix row sets and corrupt r — it can even leave |r| > 1). The sums
    themselves stay exact in int64 to ~10¹² docs, but the FINAL
    products n·Σx² − (Σx)² widen to DECIMAL(38,0)/HUGEINT (int64 would
    overflow at ~5e6 docs per language) before the double conversion."""
    docs = _t(spark, sf_dir, "documents")
    xy = docs.where(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    ).select(
        "lang",
        F.col("n_chars").alias("x"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dec = "decimal(38,0)"
    num = (
        F.col("n").cast(dec) * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (
            F.col("n").cast(dec) * F.col("sxx")
            - F.col("sx").cast(dec) * F.col("sx")
        ).cast("double")
    ) * F.sqrt(
        (
            F.col("n").cast(dec) * F.col("syy")
            - F.col("sy").cast(dec) * F.col("sy")
        ).cast("double")
    )
    return m.select(
        "lang",
        "n",
        F.round(F.when(den != 0, num / den), 6).alias("pearson_r"),
    ).orderBy("lang")


SQL_EXACT_CORR_MOMENTS = """
WITH xy AS (
  SELECT lang, n_chars AS x,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND text IS NOT NULL
), m AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy GROUP BY lang
)
SELECT lang, n,
       round(CASE WHEN (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) = 0
                    OR (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) = 0
             THEN NULL
             ELSE CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE))) END, 6)
         AS pearson_r
FROM m ORDER BY lang
"""


REGISTRY_EXT14 = {
    "association_rules": (q_association_rules, SQL_ASSOCIATION_RULES),
    "fingerprint_cluster_histogram": (
        q_fingerprint_cluster_histogram,
        SQL_FINGERPRINT_CLUSTER_HISTOGRAM,
    ),
    "funnel_time_to_convert": (q_funnel_time_to_convert, SQL_FUNNEL_TIME_TO_CONVERT),
    "exact_corr_moments": (q_exact_corr_moments, SQL_EXACT_CORR_MOMENTS),
}
