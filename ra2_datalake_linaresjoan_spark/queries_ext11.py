"""Relational batch 11 (round 3 continuation): point-in-time feature
assembly, weighted shortest paths, edit-distance record linkage, and an
l-diversity privacy audit.

- ``feature_store_pit`` is the feature-store training-set generator:
  for every label event (purchase) assemble the user's history features
  STRICTLY BEFORE the label timestamp — leakage-safe by construction.
  One window shuffle keyed by user; cumulative conditional sums replace
  the per-label point-in-time subquery a naive implementation would run
  (cf. ``purchase_attribution`` for the single-feature as-of variant).
- ``bellman_ford_routes`` relaxes min-plus distances over a weighted
  trade graph — the iterative-algorithm pattern (localCheckpoint per
  round) on a semiring the native recursive CTE (`trade_reachability`,
  hop counts) cannot express.
- ``edit_distance_match`` is char-level record linkage (complementing
  token-Jaccard ``fuzzy_join``): blocked candidate join + exact
  ``levenshtein`` verify — both engines implement the same DP metric.
- ``l_diversity`` extends the ``k_anonymity`` audit: within each
  quasi-identifier class, how many DISTINCT sensitive values protect a
  row from attribute disclosure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# feature_store_pit — leakage-safe point-in-time feature assembly
# ---------------------------------------------------------------------------


def q_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set generation: one row per purchase event carrying the
    user's as-of features — clicks/views so far, click-value sum so far
    (integer micro-units, exact), and seconds since the last click — all
    computed from STRICTLY earlier events (ROWS … 1 PRECEDING frames on
    the unique (ts, event_id) order), so no feature can leak the label
    row itself. ONE shuffle (user_id) serves every feature; the naive
    per-label correlated subquery would rescan history per purchase.
    Output aggregated per user: n purchases + checksums of the feature
    columns (training sets are row-per-label; the aggregate keeps the
    oracle output bounded while pinning every feature value)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("long").alias("micros"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = (F.col("event_type") == "click").cast("long")
    is_view = (F.col("event_type") == "view").cast("long")
    feat = base.select(
        "user_id",
        "ts",
        "event_type",
        F.coalesce(F.sum(is_click).over(w), F.lit(0)).alias("clicks_so_far"),
        F.coalesce(F.sum(is_view).over(w), F.lit(0)).alias("views_so_far"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", F.col("micros"))).over(w),
            F.lit(0),
        ).alias("click_micros_so_far"),
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_click_ts"),
    )
    labels = feat.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "clicks_so_far",
        "views_so_far",
        "click_micros_so_far",
        F.when(
            F.col("last_click_ts").isNotNull(),
            (
                F.unix_micros("ts") - F.unix_micros("last_click_ts")
            ),
        ).alias("micros_since_click"),
    )
    return (
        labels.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("clicks_so_far").alias("sum_clicks_so_far"),
            F.sum("views_so_far").alias("sum_views_so_far"),
            F.sum("click_micros_so_far").alias("sum_click_micros"),
            F.sum("micros_since_click").alias("sum_micros_since_click"),
        )
        .orderBy("user_id")
    )


SQL_FEATURE_STORE_PIT = """
WITH feat AS (
  SELECT user_id, ts, event_type,
    COALESCE(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      OVER w AS BIGINT), 0) AS clicks_so_far,
    COALESCE(CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      OVER w AS BIGINT), 0) AS views_so_far,
    COALESCE(CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(round(value * 1000000) AS BIGINT) END)
      OVER w AS BIGINT), 0) AS click_micros_so_far,
    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      OVER w AS last_click_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), labels AS (
  SELECT user_id, clicks_so_far, views_so_far, click_micros_so_far,
         CASE WHEN last_click_ts IS NOT NULL
              THEN epoch_us(ts) - epoch_us(last_click_ts) END
           AS micros_since_click
  FROM feat WHERE event_type = 'purchase'
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(clicks_so_far) AS BIGINT) AS sum_clicks_so_far,
       CAST(sum(views_so_far) AS BIGINT) AS sum_views_so_far,
       CAST(sum(click_micros_so_far) AS BIGINT) AS sum_click_micros,
       CAST(sum(micros_since_click) AS BIGINT) AS sum_micros_since_click
FROM labels GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# bellman_ford_routes — min-plus shortest paths over the trade graph
# ---------------------------------------------------------------------------

_BF_ROUNDS = 3


def q_bellman_ford_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest-route estimates from nation 0 over the directed trade
    graph (supplier nation → customer nation, edge weight = MINIMUM
    lineitem price in exact cents over all trades): _BF_ROUNDS rounds of
    Bellman-Ford min-plus relaxation. The edge list is built ONCE by the
    usual broadcast-dim reduction (lineitem⋈orders shuffle, then tiny
    nation-pair aggregate) and localCheckpointed; each round is a
    (dist ⋈ edges) min-aggregate over ≤ 25² rows. The min-plus semiring
    is exactly what hop-counting recursive CTEs (`trade_reachability`)
    cannot express. Output: nation, cheapest cost within ≤3 hops, or
    unreachable rows absent.

    money_pred on the edge-weight input (round-13 close review): the
    per-row ``CAST(round(x*100) AS BIGINT)`` ran UNGUARDED here while
    the oracle casts only AFTER the min — one NaN/±Inf/huge price in a
    surviving trade row would ANSI-raise the Spark job where the oracle
    sails past it (the exact one-poisoned-row asymmetry the advisor
    caught in bloom_join_prefilter).  The dirty audit had missed it
    only because the 60-row corpus's poisoned lineitem rows happen to
    lose the orders join.  Both sides now bound the edge population to
    the representable-cents domain — a clean-corpus no-op."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    edges = (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice")
        .where(money_pred("l_extendedprice"))
        .join(ords.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    ).localCheckpoint()
    dist = spark.createDataFrame([(0, 0)], "node int, cost long")
    for _ in range(_BF_ROUNDS):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        dist = relaxed.localCheckpoint()
    return dist.orderBy("node")


def _sql_bf() -> str:
    base = """
WITH edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(min(round(l.l_extendedprice * 100)) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey
    AND isfinite(l.l_extendedprice) AND abs(l.l_extendedprice) < 9.2e16
  GROUP BY 1, 2
), d0 AS (
  SELECT CAST(0 AS INTEGER) AS node, CAST(0 AS BIGINT) AS cost
)"""
    prev = "d0"
    for i in range(_BF_ROUNDS):
        base += f""",
d{i + 1} AS (
  SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM (
    SELECT e.dst AS node, d.cost + e.w AS cost
    FROM {prev} d JOIN edges e ON d.node = e.src
    UNION ALL
    SELECT node, cost FROM {prev}
  ) GROUP BY node
)"""
        prev = f"d{i + 1}"
    base += f"""
SELECT node, cost FROM {prev} ORDER BY node
"""
    return base


SQL_BELLMAN_FORD_ROUTES = _sql_bf()


# ---------------------------------------------------------------------------
# edit_distance_match — blocked levenshtein record linkage
# ---------------------------------------------------------------------------


def q_edit_distance_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-level entity resolution: deterministic dirty variants of the
    part-name catalog (2nd character dropped) link back to clean names
    through a BLOCKED candidate join — same first character AND length
    within ±2 — then the exact ``levenshtein`` ≤ 2 verify. Blocking
    turns the all-pairs metric join into per-block joins (the standard
    linkage plan: block → candidate → verify); both engines compute the
    identical DP edit distance. Output: every (variant, match) pair with
    its distance.

    Population = ASCII names (shared ``ascii_text_pred`` contract,
    round-12 dirty audit): DuckDB's levenshtein walks BYTES while
    Spark's walks codepoints (probe: distance('café','cafe') = 2 vs 1),
    so distances disagree the moment a name leaves ASCII.
    Clean-data no-op (part names are ASCII)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import ascii_text_pred

    part = _t(spark, sf_dir, "part")
    names = part.select("p_name").where(ascii_text_pred("p_name")).distinct()
    variants = names.select(
        F.concat(
            F.substring("p_name", 1, 1), F.expr("substr(p_name, 3)")
        ).alias("variant")
    )
    cand = variants.join(
        F.broadcast(names),
        (F.substring("variant", 1, 1) == F.substring("p_name", 1, 1))
        & (
            F.abs(F.length("variant") - F.length("p_name")) <= 2
        ),
    )
    return (
        cand.select(
            "variant",
            "p_name",
            F.levenshtein("variant", "p_name").alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .orderBy("variant", "p_name")
    )


SQL_EDIT_DISTANCE_MATCH = r"""
WITH names AS (
  SELECT DISTINCT p_name FROM part
  WHERE p_name IS NOT NULL AND NOT regexp_matches(p_name, '[^\x00-\x7f]')
), variants AS (
  SELECT substr(p_name, 1, 1) || substr(p_name, 3) AS variant FROM names
)
SELECT v.variant, n.p_name,
       CAST(levenshtein(v.variant, n.p_name) AS INTEGER) AS dist
FROM variants v
JOIN names n
  ON substr(v.variant, 1, 1) = substr(n.p_name, 1, 1)
 AND abs(len(v.variant) - len(n.p_name)) <= 2
WHERE levenshtein(v.variant, n.p_name) <= 2
ORDER BY v.variant, n.p_name
"""


# ---------------------------------------------------------------------------
# l_diversity — attribute-disclosure audit (extends k_anonymity)
# ---------------------------------------------------------------------------


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of customer: within each quasi-identifier class
    (nationkey, mktsegment), how many DISTINCT sensitive values (account
    balance in whole thousands) appear — a class where everyone shares
    one sensitive value discloses it even when k-anonymous. One groupBy
    to class level (distinct count rides the same shuffle), one
    class-level summary: min l, classes below l=3, rows in those
    classes. Integer outputs only.

    A non-finite balance bands to NULL — the sensitive value is
    unreadable, the row still counts toward k; countDistinct skips NULL
    identically in both engines, and floor(±Inf/NaN) never reaches the
    BIGINT cast (DuckDB raises on it — round-11 value-fuzz)."""
    cust = _t(spark, sf_dir, "customer")
    # shared finite contract (round-12 advisor: inline copies risk
    # drifting from the round-11-pinned predicate)
    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    _fin = money_pred("c_acctbal")
    classes = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.when(_fin, F.floor(F.col("c_acctbal") / 1000).cast("long")).alias(
            "bal_band"
        ),
    ).groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("bal_band").alias("l"),
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l").alias("min_l"),
        F.sum((F.col("l") < 3).cast("long")).alias("classes_below_3"),
        F.sum(F.when(F.col("l") < 3, F.col("k")).otherwise(F.lit(0))).alias(
            "rows_below_3"
        ),
    )


SQL_L_DIVERSITY = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT CASE WHEN isfinite(c_acctbal) AND abs(c_acctbal) < 9.2e16
                THEN CAST(floor(c_acctbal / 1000) AS BIGINT) END)
              AS BIGINT) AS l
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       min(l) AS min_l,
       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_3,
       CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
         AS rows_below_3
FROM classes
"""


# ---------------------------------------------------------------------------
# join_cardinality — join-size computation without the join
# ---------------------------------------------------------------------------


def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size statistics the optimizer way: |lineitem ⋈ orders| on the
    order key is Σ_k n_l(k)·n_o(k) over the per-key count vectors — two
    count aggregates and a key join of COUNT ROWS, never the join's
    output rows. Alongside: matched-key count, max per-key fan-out, and
    the skew ratio (max product / mean product, the quantity that
    predicts whether AQE skew-splitting will trigger). This is how a
    planner (or a pre-flight data audit) sizes a shuffle before paying
    for it; the oracle pins it against DuckDB's identical arithmetic —
    and it must equal the true join count by construction."""
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = ords.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    per_key = a.join(b, "k").select("k", (F.col("na") * F.col("nb")).alias("prod"))
    return per_key.agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.sum("prod").alias("join_rows"),
        F.max("prod").alias("max_key_fanout"),
        F.round(
            F.max("prod") / (F.sum("prod") / F.count(F.lit(1))), 4
        ).alias("skew_ratio"),
    )


SQL_JOIN_CARDINALITY = """
WITH a AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS na
  FROM lineitem GROUP BY 1
), b AS (
  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
  FROM orders GROUP BY 1
), per_key AS (
  SELECT k, na * nb AS prod FROM a JOIN b USING (k)
)
SELECT CAST(count(*) AS BIGINT) AS matched_keys,
       CAST(sum(prod) AS BIGINT) AS join_rows,
       CAST(max(prod) AS BIGINT) AS max_key_fanout,
       round(max(prod) / (sum(prod) / CAST(count(*) AS DOUBLE)), 4)
         AS skew_ratio
FROM per_key
"""


REGISTRY_EXT11 = {
    "feature_store_pit": (q_feature_store_pit, SQL_FEATURE_STORE_PIT),
    "bellman_ford_routes": (q_bellman_ford_routes, SQL_BELLMAN_FORD_ROUTES),
    "edit_distance_match": (q_edit_distance_match, SQL_EDIT_DISTANCE_MATCH),
    "l_diversity": (q_l_diversity, SQL_L_DIVERSITY),
    "join_cardinality": (q_join_cardinality, SQL_JOIN_CARDINALITY),
}
