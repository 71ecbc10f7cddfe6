"""Fifth batch of registered queries + DuckDB oracles — the operator
families the engine had not yet put on the verified surface:
second-moment statistics (corr / covar / stddev / var), robust MAD
outlier flagging, record linkage via token blocking + Levenshtein verify
(never all-pairs), one-scan table profiling, FULL OUTER feed
reconciliation, map-typed column functions, strict-order funnels, and
cohort retention.

Same contract as `queries.py`: identical aliases both sides, doubles
rounded so summation-order noise can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# stats_moments — corr / covar_samp / stddev_samp / var_samp per group
# ---------------------------------------------------------------------------


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per return flag: Pearson correlation and
    sample covariance between quantity and price, plus sample
    stddev/variance of price — all JVM-side mergeable aggregates (one
    partial+final hash agg, scan speed).  money_case over BOTH
    measurement columns: moment sums over ±Inf/NaN either NaN-poison
    (Spark) or overflow outright (DuckDB's stddev raises) — the shared
    finite-population contract (round-11 value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    li = money_case(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


SQL_STATS_MOMENTS = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 2) AS stddev_price,
       round(var_samp(l_quantity), 4) AS var_qty
FROM lineitem
WHERE (isfinite(l_quantity) AND abs(l_quantity) < 9.2e16) AND (isfinite(l_extendedprice) AND abs(l_extendedprice) < 9.2e16)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# mad_outliers — median-absolute-deviation anomaly flags per group
# ---------------------------------------------------------------------------


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order priority: median and MAD
    (median absolute deviation) of the order total, then the count of
    orders beyond 3 MADs — the data-quality monitor shape that, unlike
    z-scores, a few extreme rows can't poison. Two grouped exact
    percentiles with a broadcast join-back between them; at 100 TB the
    drop-in is ``percentile_approx`` (t-digest, one pass, mergeable).
    finite_case: the shared finite-population contract for order
    statistics (round-11 value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import finite_case

    orders = finite_case(
        _t(spark, sf_dir, "orders"), "o_totalprice"
    ).select("o_orderpriority", "o_totalprice")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("_med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        "_med",
        F.abs(F.col("o_totalprice") - F.col("_med")).alias("_adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.first("_med"), 4).alias("median_price"),
            F.round(F.first("_mad"), 4).alias("mad_price"),
            F.sum(
                (F.abs(F.col("o_totalprice") - F.col("_med")) > 3 * F.col("_mad"))
                .cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )


SQL_MAD_OUTLIERS = """
WITH fin AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE isfinite(o_totalprice)
), med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS m
  FROM fin GROUP BY o_orderpriority
), dev AS (
  SELECT o.o_orderpriority, o.o_totalprice, med.m,
         abs(o.o_totalprice - med.m) AS adev
  FROM fin o JOIN med USING (o_orderpriority)
), mad AS (
  SELECT o_orderpriority, quantile_cont(adev, 0.5) AS d
  FROM dev GROUP BY o_orderpriority
)
SELECT dev.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(any_value(dev.m), 4) AS median_price,
       round(any_value(mad.d), 4) AS mad_price,
       CAST(sum(CASE WHEN abs(dev.o_totalprice - dev.m) > 3 * mad.d
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (o_orderpriority)
GROUP BY dev.o_orderpriority
ORDER BY dev.o_orderpriority
"""


# ---------------------------------------------------------------------------
# fuzzy_join — token-blocking + Levenshtein-verify record linkage
# ---------------------------------------------------------------------------


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: a probe catalog of name VARIANTS (every 100th part,
    words reversed — 'red widget' → 'widget red') matched back against
    the part table WITHOUT all-pairs work, via DF-aware prefix-filter
    blocking: a token document-frequency aggregate over the index side
    picks each record's TWO rarest distinct tokens (global df, tie-break
    on token text) as its blocking key; candidates are the equi-join on
    that key; token-set Jaccard + Levenshtein score only the candidates.
    Matches = full DISTINCT-token overlap (jacc = 1.0), so recall for
    matches is exact: equal token sets pick the identical rarest pair
    under the same df table and tie-break. Per probe: candidates
    proposed by the rarest-pair block, matches, best (minimum) edit
    distance among matches.

    Scale shape: TPC-H part names draw 5 words from ~90 colors, so raw-
    token blocking concentrates candidates on hot keys (every record
    pairs with ~1/18 of the table). Rarest-PAIR blocking is the
    production fix (prefix filtering à la PPJoin, prefix length 2): the
    df table is vocabulary-sized (broadcast + checkpointed once for its
    two consumers), each record emits exactly ONE blocking key, and a
    cohort requires BOTH rare tokens to co-occur — candidate volume
    drops quadratically vs the single-token key (measured 359k → 25k
    candidate rows at sf0.1 on this corpus). Verification reads the
    full token sets via in-row array intersection: no second explode,
    no per-candidate shuffle, and Levenshtein runs only on match rows."""
    parts = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_name").alias("name")
    )
    probe = (
        parts.filter(F.col("p_partkey") % 100 == 0)
        .select(
            F.col("p_partkey").alias("probe_key"),
            F.concat_ws(" ", F.reverse(F.split("name", " "))).alias("variant"),
        )
    )
    p_tok = parts.select(
        "p_partkey", "name", F.explode(F.split("name", " ")).alias("tok")
    )
    # index-side token document frequency: vocabulary-sized, broadcast;
    # localCheckpoint because both blocking builds consume it
    df_tok = (
        p_tok.groupBy("tok")
        .agg(F.countDistinct("p_partkey").alias("df"))
        .localCheckpoint()
    )

    # blocking key = the record's TWO rarest distinct tokens (global df,
    # tie-break on token text), concatenated in (df, tok) order. Equal
    # token sets pick the identical pair, so recall for full-overlap
    # matches stays exact, while cohorts shrink quadratically vs a
    # single-token key (both rare tokens must co-occur). The blocking
    # tables also carry the DISTINCT token set so the verify step never
    # re-splits strings per candidate row (Spark does no CSE across
    # expression aliases in one select).
    def _block(tok_df: DataFrame, key: str, text: str) -> DataFrame:
        pair = F.concat_ws(
            "|",
            F.transform(
                F.slice(F.sort_array(F.collect_set(F.struct("df", "tok"))), 1, 2),
                lambda x: x["tok"],
            ),
        )
        return (
            tok_df.join(F.broadcast(df_tok), "tok")
            .groupBy(key, text)
            .agg(pair.alias("bkey"))
            .select(
                key,
                text,
                "bkey",
                F.array_distinct(F.split(text, " ")).alias(f"{text}_set"),
            )
        )

    p_block = _block(p_tok, "p_partkey", "name")
    b_tok = probe.select(
        "probe_key", "variant", F.explode(F.split("variant", " ")).alias("tok")
    )
    b_block = _block(b_tok, "probe_key", "variant")
    shared = b_block.join(p_block, "bkey").select(
        "probe_key",
        "p_partkey",
        "variant",
        "name",
        F.size("variant_set").alias("nv"),
        F.size("name_set").alias("np"),
        F.size(F.array_intersect("variant_set", "name_set")).alias("n_shared"),
    )
    # jacc >= 1.0 over sets  <=>  set equality  <=>  shared == |V| == |P|;
    # the integer form skips the division, and levenshtein (the costly
    # verify) runs ONLY on match rows
    is_match = (F.col("n_shared") == F.col("nv")) & (
        F.col("n_shared") == F.col("np")
    )
    scored = shared.select(
        "probe_key",
        "p_partkey",
        is_match.alias("match"),
        F.when(is_match, F.levenshtein("variant", "name")).alias("lev"),
    )
    return (
        scored.groupBy("probe_key")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.col("match").cast("long")).alias("n_matches"),
            F.min("lev").alias("best_lev"),
        )
        .orderBy("probe_key")
    )


SQL_FUZZY_JOIN = """
WITH parts AS (
  SELECT p_partkey, p_name AS name FROM part
), probe AS (
  SELECT p_partkey AS probe_key,
         array_to_string(list_reverse(string_split(name, ' ')), ' ') AS variant
  FROM parts WHERE p_partkey % 100 = 0
), p_tok AS (
  SELECT DISTINCT p_partkey, name, unnest(string_split(name, ' ')) AS tok FROM parts
), df_tok AS (
  SELECT tok, count(DISTINCT p_partkey) AS df FROM p_tok GROUP BY tok
), p_block AS (
  SELECT p_partkey, name, string_agg(tok, '|' ORDER BY df, tok) AS bkey FROM (
    SELECT p.p_partkey, p.name, p.tok, d.df,
           row_number() OVER (PARTITION BY p.p_partkey ORDER BY d.df, p.tok) AS rn
    FROM p_tok p JOIN df_tok d USING (tok)
  ) WHERE rn <= 2
  GROUP BY p_partkey, name
), b_tok AS (
  SELECT DISTINCT probe_key, variant, unnest(string_split(variant, ' ')) AS tok FROM probe
), b_block AS (
  SELECT probe_key, variant, string_agg(tok, '|' ORDER BY df, tok) AS bkey FROM (
    SELECT b.probe_key, b.variant, b.tok, d.df,
           row_number() OVER (PARTITION BY b.probe_key ORDER BY d.df, b.tok) AS rn
    FROM b_tok b JOIN df_tok d USING (tok)
  ) WHERE rn <= 2
  GROUP BY probe_key, variant
), cand AS (
  SELECT b.probe_key, b.variant, p.p_partkey, p.name
  FROM b_block b JOIN p_block p USING (bkey)
), scored AS (
  SELECT probe_key, p_partkey,
         len(list_intersect(list_distinct(string_split(variant, ' ')),
                            list_distinct(string_split(name, ' ')))) * 1.0
           / (len(list_distinct(string_split(variant, ' ')))
              + len(list_distinct(string_split(name, ' ')))
              - len(list_intersect(list_distinct(string_split(variant, ' ')),
                                   list_distinct(string_split(name, ' '))))) AS jacc,
         levenshtein(variant, name) AS lev
  FROM cand
)
SELECT probe_key,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN jacc >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
       min(CASE WHEN jacc >= 1.0 THEN lev END) AS best_lev
FROM scored
GROUP BY probe_key
ORDER BY probe_key
"""


# ---------------------------------------------------------------------------
# table_profile — per-column profiling summary (nulls / distincts / range)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary: one row per profiled column of ``orders``
    with row count, null count, distinct count, and min/max rendered as
    strings — the reference's volumetry/validator statistics
    (``validator_warehouse.py:166-248``) generalized into the standard
    profiler shape. ONE wide aggregate computes every metric in a single
    scan (no per-column count() storm — SURVEY §7.4.7), then a ``stack``
    melts the wide row."""
    orders = _t(spark, sf_dir, "orders")

    def _render(c: str, agg) -> Column:
        # doubles render via printf('%.2f') on BOTH sides (round-13):
        # a bare double->string cast is the semantics-probe formatting
        # class — Spark goes scientific at |x| >= 1e7 where DuckDB
        # stays plain, which the dirty audit only missed because the
        # fuzz corpus's ±Inf always won min/max.  Fixed-point printf is
        # byte-identical cross-engine for 2-dp money (the profiled
        # domain; exact third-decimal binary midpoints would split
        # Java's HALF_UP from glibc's half-even — no such value can
        # reach min/max of a 2-dp column).  Non-finite tokens keep the
        # round-11 canonicalization to Spark's spelling.
        if dict(orders.dtypes)[c] == "double":
            x = agg(c)
            return (
                F.when(x.isNull(), F.lit(None).cast("string"))
                .when(F.isnan(x), F.lit("NaN"))
                .when(x == F.lit(float("inf")), F.lit("Infinity"))
                .when(x == F.lit(float("-inf")), F.lit("-Infinity"))
                .otherwise(F.format_string("%.2f", x))
            )
        return agg(c).cast("string")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            _render(c, F.min).alias(f"{c}__min"),
            _render(c, F.max).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        wide.selectExpr(
            "_n AS n_rows",
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)",
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
        .orderBy("column_name")
    )


SQL_TABLE_PROFILE = """
WITH w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS s_dist,
         CAST(min(o_orderstatus) AS VARCHAR) AS s_min, CAST(max(o_orderstatus) AS VARCHAR) AS s_max,
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS p_dist,
         CAST(min(o_orderpriority) AS VARCHAR) AS p_min, CAST(max(o_orderpriority) AS VARCHAR) AS p_max,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS c_dist,
         CAST(min(o_custkey) AS VARCHAR) AS c_min, CAST(max(o_custkey) AS VARCHAR) AS c_max,
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_nulls,
         CAST(count(DISTINCT o_totalprice) AS BIGINT) AS t_dist,
         -- non-finite doubles render differently per engine ('nan'/'-inf'
         -- vs Spark's Java-style 'NaN'/'-Infinity'); the profile keeps the
         -- VALUES (a profiler exists to surface them) and canonicalizes
         -- the rendering to Spark's tokens (round-11 value-fuzz)
         CASE WHEN isnan(min(o_totalprice)) THEN 'NaN'
              WHEN min(o_totalprice) =  'infinity'::DOUBLE THEN 'Infinity'
              WHEN min(o_totalprice) = '-infinity'::DOUBLE THEN '-Infinity'
              ELSE printf('%.2f', min(o_totalprice)) END AS t_min,
         CASE WHEN isnan(max(o_totalprice)) THEN 'NaN'
              WHEN max(o_totalprice) =  'infinity'::DOUBLE THEN 'Infinity'
              WHEN max(o_totalprice) = '-infinity'::DOUBLE THEN '-Infinity'
              ELSE printf('%.2f', max(o_totalprice)) END AS t_max
  FROM orders
)
SELECT 'o_custkey' AS column_name, n_rows, c_nulls AS n_nulls, c_dist AS n_distinct,
       c_min AS min_value, c_max AS max_value FROM w
UNION ALL
SELECT 'o_orderpriority', n_rows, p_nulls, p_dist, p_min, p_max FROM w
UNION ALL
SELECT 'o_orderstatus', n_rows, s_nulls, s_dist, s_min, s_max FROM w
UNION ALL
SELECT 'o_totalprice', n_rows, t_nulls, t_dist, t_min, t_max FROM w
ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# full_outer_reconcile — FULL OUTER join reconciliation of two daily feeds
# ---------------------------------------------------------------------------


def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed reconciliation via FULL OUTER join: daily order counts vs daily
    event counts joined on the calendar day, classifying each day as
    matched / orders-only / events-only (the two feeds cover disjoint
    eras, so both outer sides are exercised for real). The join runs on
    two post-aggregation daily tables — the facts shuffle once each into
    their aggregates, never into the join."""
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    o_daily = orders.groupBy(
        F.to_date(F.date_trunc("DAY", F.col("o_orderdate"))).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    e_daily = ev.groupBy(
        F.to_date(F.date_trunc("DAY", F.col("ts"))).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    both = o_daily.join(e_daily, "day", "full_outer")
    status = (
        F.when(F.col("n_orders").isNotNull() & F.col("n_events").isNotNull(), "matched")
        .when(F.col("n_orders").isNotNull(), "orders_only")
        .otherwise("events_only")
    )
    return (
        both.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.coalesce("n_orders", F.lit(0))).alias("orders"),
            F.sum(F.coalesce("n_events", F.lit(0))).alias("events"),
        )
        .orderBy("status")
    )


SQL_FULL_OUTER_RECONCILE = """
WITH o_daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), e_daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT CASE WHEN n_orders IS NOT NULL AND n_events IS NOT NULL THEN 'matched'
            WHEN n_orders IS NOT NULL THEN 'orders_only'
            ELSE 'events_only' END AS status,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(COALESCE(n_orders, 0)) AS BIGINT) AS orders,
       CAST(sum(COALESCE(n_events, 0)) AS BIGINT) AS events
FROM o_daily FULL OUTER JOIN e_daily USING (day)
GROUP BY 1 ORDER BY status
"""


# ---------------------------------------------------------------------------
# map_ops — map-typed column functions on the verified surface
# ---------------------------------------------------------------------------


def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed operators (SURVEY §2.8 notes the reference has none —
    the engine exposes Spark's natively): per user, build a
    ``map<event_type, count>`` via ``map_from_entries(collect_list(...))``
    then consume it with ``map_keys`` / ``element_at`` / ``size``. The
    oracle pins the flattened semantics (map internals are engine-local;
    the contract is what comes out)."""
    ev = _t(spark, sf_dir, "events")
    # NULL event_type cannot be a map key (NULL_MAP_KEY under ANSI) —
    # drop it on both engines (lockstep filter in SQL_MAP_OPS).
    per_type = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("types_csv"),
    ).orderBy("user_id")


SQL_MAP_OPS = """
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(count(*) AS INT) AS n_types,
       CAST(COALESCE(max(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT)
         AS clicks,
       string_agg(event_type, ',' ORDER BY event_type) AS types_csv
FROM per_type
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# funnel_steps — strict-order event funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: per user, the first 'view', the first 'click'
    AFTER that view, the first 'purchase' AFTER that click — then one
    summary row of step conversion counts.

    ONE scan and ONE shuffle (round-3 re-plan; the earlier shape scanned
    the fact once per step with broadcast join-backs): a single per-user
    aggregate collects the first view plus the click/purchase event-time
    arrays, and the strict-order mins are array lambdas over that row.
    Per-user state is bounded by that user's click/purchase counts — the
    standard in-memory contract of warehouse funnel analysis (a user with
    millions of clicks is bot traffic you filtered earlier)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("_clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("_purchases"),
    )
    t_click = F.array_min(
        F.filter("_clicks", lambda t: F.col("t_view").isNotNull() & (t > F.col("t_view")))
    )
    with_click = per_user.select("t_view", t_click.alias("t_click"), "_purchases")
    steps = with_click.select(
        "t_view",
        "t_click",
        F.array_min(
            F.filter(
                "_purchases",
                lambda t: F.col("t_click").isNotNull() & (t > F.col("t_click")),
            )
        ).alias("t_purchase"),
    )
    counts = steps.agg(
        F.count("t_view").alias("n1"),
        F.count("t_click").alias("n2"),
        F.count("t_purchase").alias("n3"),
    )
    return (
        counts.selectExpr(
            "stack(3, '1_view', n1, '2_click_after_view', n2,"
            " '3_purchase_after_click', n3) AS (step, n_users)"
        )
        .orderBy("step")
    )


SQL_FUNNEL_STEPS = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
)
SELECT step, CAST(n_users AS BIGINT) AS n_users FROM (
  SELECT '1_view' AS step, count(DISTINCT user_id) AS n_users FROM t1
  UNION ALL
  SELECT '2_click_after_view', count(DISTINCT user_id) FROM t2
  UNION ALL
  SELECT '3_purchase_after_click', count(DISTINCT user_id) FROM t3
)
ORDER BY step
"""


# ---------------------------------------------------------------------------
# cohort_retention — first-seen cohorts x day-offset activity
# ---------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    each later activity day as an offset from their cohort day — the
    triangle every growth dashboard draws. Two shuffles total (first-day
    agg, cohort×offset agg); the cohort map joins back via broadcast."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("DAY", F.col("ts"))).alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


SQL_COHORT_RETENTION = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(datediff('day', c.cohort_day, e.day) AS INT) AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM ev e JOIN cohort c ON e.user_id = c.user_id
GROUP BY 1, 2 ORDER BY cohort_day, day_offset
"""


REGISTRY_EXT5: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "stats_moments": (q_stats_moments, SQL_STATS_MOMENTS),
    "mad_outliers": (q_mad_outliers, SQL_MAD_OUTLIERS),
    "fuzzy_join": (q_fuzzy_join, SQL_FUZZY_JOIN),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "full_outer_reconcile": (q_full_outer_reconcile, SQL_FULL_OUTER_RECONCILE),
    "map_ops": (q_map_ops, SQL_MAP_OPS),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
}
