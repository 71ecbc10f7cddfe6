"""Second batch of registered queries + DuckDB oracles.

Widens SURVEY §2 coverage with the TPC-H shapes the first batch skipped
(EXISTS semi-join aggregation, outer-join histogram, conditional ratio,
HAVING join-back, returned-items top-k), analytic window frames (running
totals, moving averages, first/last value, percent_rank/cume_dist), pivot,
deterministic hash sampling, TF-IDF, collect_set aggregation, CUBE,
GROUPING SETS, VARIANT-typed JSON access, gaps-and-islands
sessionization, and near-dup connected components. Same contract as
`queries.py`: identical
column aliases both sides, aggregate doubles rounded to 4 (rank fractions
to 6) so summation-order noise can't flip the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _t


# ---------------------------------------------------------------------------
# TPC-H shapes not in batch 1
# ---------------------------------------------------------------------------


def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-subquery → left-semi join, then grouped count
    (reference J6 semi-join + A1). The semi-join shuffles only the distinct
    order keys of the filtered lineitem side — Catalyst prunes to one column
    before the exchange."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_EXISTS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join customer→orders (keeping customers
    with zero orders), per-customer order count, then a count-of-counts
    histogram. Two shuffles (join key, then c_count) — both on already
    reduced data."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio over a broadcast join
    (promo revenue share). Single scalar row; part side broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct")
        )
    )


SQL_PROMO_REVENUE = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING on the fact, then join back to
    orders/customer. The HAVING output is tiny → both join-backs broadcast
    the filtered aggregate, so the big table is scanned exactly once."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


SQL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 4) > 300
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Aggregate lineitem first (map-side combine on l_orderkey), then join
    orders → customer → nation with the dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(rev, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_RETURNED_ITEM_CUSTOMERS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Analytic window frames (SURVEY §2.5 extension — ROWS/RANGE frames)
# ---------------------------------------------------------------------------


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user over event time (ROWS UNBOUNDED PRECEDING →
    CURRENT ROW). Deterministic accumulation order via (ts, event_id), so
    both engines sum the same sequence. Window is partitioned by user_id —
    parallel across users, no global sort."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


SQL_RUNNING_TOTALS = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


def q_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded ROWS frame (3 preceding + current) per
    user — the streaming-dashboard smoothing pattern as a batch window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w), 4).alias("ma4"),
        )
        .orderBy("user_id", "event_id")
    )


SQL_MOVING_AVG_EVENTS = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
FROM events
WHERE event_type = 'view'
ORDER BY user_id, event_id
"""


def q_first_last_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full partition frame per event_type:
    each type's earliest and latest event value (deterministic order by
    (ts, event_id)). One row per type via distinct.

    Complete-case on (ts, event_id) in lockstep (round-10 dirty audit):
    an undated event has no first/last position, and the engines order
    NULL ts on OPPOSITE ends of the frame — first_value/last_value then
    pick different rows per engine.  The frame ordering additionally
    routes through the shared ``order_nulls_last`` contract (round-11,
    ask #4)."""
    from ra2_datalake_linaresjoan_spark.operators.ordering import (
        order_nulls_last,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(order_nulls_last("ts"), order_nulls_last("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "event_type",
            F.round(F.first("value").over(w), 4).alias("first_value"),
            F.round(F.last("value").over(w), 4).alias("last_value"),
        )
        .distinct()
        .orderBy("event_type")
    )


SQL_FIRST_LAST_EVENTS = """
SELECT DISTINCT event_type,
       round(first_value(value) OVER w, 4) AS first_value,
       round(last_value(value) OVER w, 4)  AS last_value
FROM events
WHERE ts IS NOT NULL AND event_id IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY event_type
"""


def q_percentrank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of retail price within each brand —
    rank-fraction analytics (well-defined under ties, no tiebreak needed
    for the fractions themselves; row identity fixed by p_partkey).
    Complete-case on p_retailprice in LOCKSTEP (round-9 decorrelated
    dirty audit): a NULL price ranks FIRST in Spark's window but LAST
    in DuckDB's, shifting every fraction in the partition.  The window
    ordering additionally routes through the shared
    ``order_nulls_last`` contract (round-11, ask #4)."""
    from ra2_datalake_linaresjoan_spark.operators.ordering import (
        order_nulls_last,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_retailprice").isNotNull())
    w = Window.partitionBy("p_brand").orderBy(order_nulls_last("p_retailprice"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
        )
        .orderBy("p_brand", "p_partkey")
    )


SQL_PERCENTRANK_PARTS = """
SELECT p_brand, p_partkey,
       round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice), 6) AS price_pct_rank,
       round(cume_dist()    OVER (PARTITION BY p_brand ORDER BY p_retailprice), 6) AS price_cume_dist
FROM part
WHERE p_retailprice IS NOT NULL
ORDER BY p_brand, p_partkey
"""


# ---------------------------------------------------------------------------
# Pivot / CUBE / collect_set / sampling / TF-IDF
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, event_type → columns. Explicit value
    list keeps the plan static (no extra distinct-values job — at scale the
    pivot values should always be declared, not discovered)."""
    ev = _t(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    ).orderBy("user_id")


SQL_PIVOT_USER_EVENTS = """
SELECT user_id,
       count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
       count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    pass with grouping-id disambiguation (extends batch-1 ROLLUP)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


SQL_CUBE_ORDERS = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def q_sources_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted array → joined string per group (reference U3
    distinct-union of parsed values, made deterministic by sorting).
    A group with NO non-NULL sources yields a NULL string, matching
    SQL's string_agg semantics — array_join over the empty set would
    mint '' where the oracle says NULL (round-8 parity audit)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.array_sort(F.collect_set("source")).alias("_set"),
            F.countDistinct("source").alias("n_sources"),
        )
        .select(
            "lang",
            F.when(F.size("_set") > 0, F.array_join("_set", ",")).alias(
                "sources"
            ),
            "n_sources",
        )
        .orderBy("lang")
    )


SQL_SOURCES_BY_LANG = """
SELECT lang,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       count(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
ORDER BY lang
"""


def q_hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based sampling: keep a document iff the first hex
    char of md5(doc_id) is '0' or '1' (a reproducible ~12.5% sample — the
    scale-safe alternative to rand()-based sample(), stable across engines,
    partitionings, and reruns). Per-lang counts of the sample."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        docs.filter(bucket.isin("0", "1"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


SQL_HASH_SAMPLE_DOCS = """
SELECT lang, count(*) AS n_sampled
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
GROUP BY lang
ORDER BY lang
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: tokenize (lower, split on non-alpha),
    term frequency per doc, document frequency per term, tf·ln(N/df), rank
    within doc. All JVM-side expressions (explode + two aggs + window) —
    the canonical inverted-index shape that scales linearly in corpus size.

    Complete-case on doc_id in lockstep (round-11 unicode-fuzz find): a
    term appearing ONLY in NULL-id docs has countDistinct(doc_id) = 0 —
    ANSI Spark raises DIVIDE_BY_ZERO on N/df while DuckDB emits
    ln(inf) rows; an id-less doc has no ranked terms either way.
    Tokenization = the shared ``ascii_words`` contract."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    # corpus size as a lazy broadcast scalar, not an eager .count() — at
    # 100 TB a driver-side count would be a full blocking scan before the
    # plan even builds; this way it is one cheap metadata-only agg job
    # inside the same plan.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # shared ascii_words contract (round-11 unicode-fuzz): translate
    # the 26 ASCII uppercase letters to lowercase (pure char map, no
    # unicode case logic), then split on [^a-z]+
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    tokens = docs.select(
        "doc_id",
        F.explode(ascii_words(F.col("text"))).alias("term"),
    ).filter(F.length("term") >= 3)
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


SQL_TFIDF_TOP_TERMS = """
WITH tokens AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS term) t
  WHERE length(t.term) >= 3 AND doc_id IS NOT NULL
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT count(*) FROM documents WHERE doc_id IS NOT NULL) / df.df), 4) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY round(tf.tf * ln((SELECT count(*) FROM documents WHERE doc_id IS NOT NULL) / df.df), 4) DESC,
                                     tf.term) AS rk
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tfidf, rk FROM scored WHERE rk <= 3 ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# Near-dup clustering: candidate pairs → connected components
# ---------------------------------------------------------------------------


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: cosine near-dup pairs (τ=0.4) →
    connected components via iterative min-label propagation
    (`operators/components.py`). Each clustered vector gets the min vec_id
    of its component — the representative-selection step of corpus dedup."""
    from ra2_datalake_linaresjoan_spark.llmdata.similarity import cosine_neardup_pairs
    from ra2_datalake_linaresjoan_spark.operators.components import (
        connected_components,
    )
    from ra2_datalake_linaresjoan_spark.queries import _emb_clean

    emb = _emb_clean(spark, sf_dir)
    pairs = cosine_neardup_pairs(emb, threshold=0.4)
    return (
        connected_components(pairs, src="id_a", dst="id_b")
        .select(F.col("id").alias("vec_id"), "component_id")
        .orderBy("vec_id")
    )


SQL_NEARDUP_COMPONENTS = f"""
WITH RECURSIVE embc AS (
  SELECT * FROM embeddings WHERE {EMB_CLEAN_SQL}
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embc a JOIN embc b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) vs
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
)
SELECT u AS vec_id, min(r) AS component_id
FROM reach GROUP BY u ORDER BY vec_id
"""


def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse_json once,
    then typed variant_get extraction — the modern engine path for JSON
    columns (binary-encoded, no re-parse per field access), vs the string
    get_json_object path exercised by `json_props`. try_parse_json:
    a '' or malformed payload must yield a NULL variant (lenient, like
    get_json_object), not an ANSI parse crash — the oracle guards with
    json_valid in lockstep (round-9 empty-string corpus)."""
    ev = _t(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 5).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("k_bucket")
    )


SQL_PROPS_VARIANT = """
WITH p AS (
  SELECT CAST(CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS INTEGER) AS k,
         value
  FROM events
)
SELECT k % 5 AS k_bucket,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(max(value), 4) AS max_value
FROM p
GROUP BY k_bucket
ORDER BY k_bucket
"""


def q_session_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: lag() marks a session break when the
    gap to the previous event exceeds 30 min, a running sum of break flags
    numbers the sessions, then a per-session rollup. The pure-window
    formulation of what `event_sessionization` does with session_window() —
    both shapes matter (this one composes with arbitrary per-row logic).
    One shuffle on user_id; both windows share that partitioning.

    Complete-case on (ts, event_id) in lockstep (round-10 dirty audit):
    an undated event has no session position — the engines order NULL
    ts on opposite ends, renumbering every session after it."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (unix_timestamp would truncate to seconds and
    # misclassify gaps whose fractional parts straddle the 1800 s boundary)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_ord))
    is_break = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("session_no", F.sum(is_break).over(w_run))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


SQL_SESSION_ISLANDS = """
WITH flagged AS (
  SELECT user_id, value, ts,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL '1800 seconds' THEN 0 ELSE 1 END AS is_break,
         event_id
  FROM events
  WHERE ts IS NOT NULL AND event_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, value,
         CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the DataFrame API (Spark 4
    ``groupingSets``): per-status and per-priority totals in ONE scan +
    one expand — completing the multi-grouping family next to
    `rollup_orders` and `cube_orders`. At scale this replaces two separate
    groupBy jobs over the same fact."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


SQL_GROUPING_SETS_ORDERS = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY status, priority
"""


# name -> (spark_fn, oracle_sql | None)
REGISTRY_EXT: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "order_priority_exists": (q_order_priority_exists, SQL_ORDER_PRIORITY_EXISTS),
    "customer_distribution": (q_customer_distribution, SQL_CUSTOMER_DISTRIBUTION),
    "promo_revenue": (q_promo_revenue, SQL_PROMO_REVENUE),
    "large_volume_customers": (q_large_volume_customers, SQL_LARGE_VOLUME_CUSTOMERS),
    "returned_item_customers": (q_returned_item_customers, SQL_RETURNED_ITEM_CUSTOMERS),
    "running_totals": (q_running_totals, SQL_RUNNING_TOTALS),
    "moving_avg_events": (q_moving_avg_events, SQL_MOVING_AVG_EVENTS),
    "first_last_events": (q_first_last_events, SQL_FIRST_LAST_EVENTS),
    "percentrank_parts": (q_percentrank_parts, SQL_PERCENTRANK_PARTS),
    "pivot_user_events": (q_pivot_user_events, SQL_PIVOT_USER_EVENTS),
    "cube_orders": (q_cube_orders, SQL_CUBE_ORDERS),
    "sources_by_lang": (q_sources_by_lang, SQL_SOURCES_BY_LANG),
    "hash_sample_docs": (q_hash_sample_docs, SQL_HASH_SAMPLE_DOCS),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "neardup_components": (q_neardup_components, SQL_NEARDUP_COMPONENTS),
    "props_variant": (q_props_variant, SQL_PROPS_VARIANT),
    "session_islands": (q_session_islands, SQL_SESSION_ISLANDS),
    "grouping_sets_orders": (q_grouping_sets_orders, SQL_GROUPING_SETS_ORDERS),
}
