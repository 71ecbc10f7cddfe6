"""Batch 20 (round 5): data-quality forensics, change detection, storage
layout advice, and graph structure over the relational tables.

- ``benford_digits`` — leading-digit distribution of order totals vs
  Benford's law with per-digit chi-square terms: the classic synthetic-
  data / fraud screen. One scan into a 9-row aggregate.
- ``cusum_changepoint`` — CUSUM change-point per event type over daily
  counts: argmax |Σ(xⱼ − mean)|, the standard level-shift detector.
  The cumulative statistic is computed SCALED BY n_days so it stays an
  exact integer (cum·nd − i·tot) — no float accumulation anywhere.
- ``decayed_event_counts`` — half-life-decayed event counts (7-day
  half-life to the corpus max day): the freshness-weighted volume a
  trending/decay dashboard reads. Decay is applied to the per-day
  aggregate, and the ≤days-sized per-type float fold runs over a
  SORTED array on both engines so summation order is pinned.
- ``encoding_advisor`` — per-column cardinality / top-value-share
  profile with a dictionary/RLE encoding suggestion: the storage-layout
  advisor a lakehouse compaction job consults. The columns stack into
  one (colname, value) shuffle — one scan, no per-column job storm
  (cf. ``plans/validator.py`` batched row counts).
- ``interval_union_coverage`` — per-order union length of overlapping
  [shipdate, shipdate + quantity days) service intervals (gaps-and-
  islands sweep), aggregated per priority. Windows are order-key-
  partitioned (≤7 rows per order — bounded fan-in at any scale).
- ``degree_assortativity`` — Pearson degree-degree correlation of the
  customer–supplier bipartite trade graph: do high-degree customers
  trade with high-degree suppliers? All moments accumulate in
  DECIMAL(38,0)/HUGEINT (degree sums/products are Σ deg² shaped and
  overflow int64 on hub-heavy graphs) and cast to double only for the
  final closed-form correlation, which NULLs on zero-variance graphs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# benford_digits — leading-digit law screen
# ---------------------------------------------------------------------------


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per leading digit d ∈ 1..9 of o_totalprice: observed count and
    share vs the Benford expectation log10(1 + 1/d), plus the chi-square
    term (n_d − N·p_d)²/(N·p_d). Scan → 9-row aggregate; shares at 6 dp,
    chi2 terms at 4 dp.

    Benford's law applies to positive magnitudes ≥ 1, so totals below 1
    are excluded in lockstep: a sub-unit total yields leading digit 0
    (1/digit is an ANSI DIVIDE_BY_ZERO in Spark but a NULL row in
    DuckDB) and a negative total crashes the digit cast on both
    engines.  +Inf sails past the >= 1 bound and has no leading digit
    — and a FINITE price past 2^63 splits the engines on the floor
    band itself: Spark's floor() yields LONG and silently SATURATES
    (leading digit of 1e308 reads "9" off LONG_MAX) while the oracle's
    CAST(floor(x) AS BIGINT) raises — the round-13 floor-saturation
    class, so the population is the money domain, not just finite
    (round-13 close review; clean-corpus no-op)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_pred

    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_totalprice") >= 1) & money_pred("o_totalprice")
    )
    per = (
        o.select(
            F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = per.agg(F.sum("n_orders").alias("total"))
    exp_share = F.log10(F.lit(1) + F.lit(1) / F.col("digit"))
    exp_n = F.col("total") * exp_share
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("total"), 6).alias("obs_share"),
            F.round(exp_share, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n_orders") - exp_n, F.lit(2)) / exp_n, 4
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


SQL_BENFORD_DIGITS = """
WITH per AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_totalprice >= 1 AND isfinite(o_totalprice)
    AND abs(o_totalprice) < 9.2e16 GROUP BY 1
), tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM per)
SELECT digit, n_orders,
       round(CAST(n_orders AS DOUBLE) / total, 6) AS obs_share,
       round(log10(1 + 1.0 / digit), 6) AS benford_share,
       round(power(n_orders - total * log10(1 + 1.0 / digit), 2)
             / (total * log10(1 + 1.0 / digit)), 4) AS chi2_term
FROM per CROSS JOIN tot
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# cusum_changepoint — exact-integer CUSUM level-shift detector
# ---------------------------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the day where the CUSUM statistic |Σⱼ≤ᵢ(xⱼ − x̄)|
    over daily counts peaks (earliest day on ties) and the peak value.
    Scaling by n_days keeps the statistic an exact integer:
    S_i·nd = cum_i·nd − i·tot. Events aggregate to (type, day) first —
    map-side combine — and every window runs over that bounded
    days×types table, never the event stream. NULL-ts rows drop in
    lockstep: a NULL day sorts FIRST in Spark's cumulative window but
    LAST in DuckDB's, corrupting every prefix sum after it."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    s = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("n").over(wp).alias("tot"),
        F.count(F.lit(1)).over(wp).alias("nd"),
    ).withColumn(
        "s_abs", F.abs(F.col("cum") * F.col("nd") - F.col("i") * F.col("tot"))
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("s_abs"), "day")
    )
    return (
        s.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("nd").alias("n_days"),
            F.col("day").alias("change_day"),
            F.round(F.col("s_abs") / F.col("nd"), 4).alias("cusum_max"),
        )
        .orderBy("event_type")
    )


SQL_CUSUM_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT event_type, day,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
  FROM daily
), s AS (
  SELECT *, abs(cum * nd - i * tot) AS s_abs FROM c
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY s_abs DESC, day) AS rn
  FROM s
)
SELECT event_type, nd AS n_days, day AS change_day,
       round(CAST(s_abs AS DOUBLE) / nd, 4) AS cusum_max
FROM r WHERE rn = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# decayed_event_counts — half-life-decayed freshness-weighted volume
# ---------------------------------------------------------------------------


def q_decayed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: raw count and 7-day-half-life decayed count
    (weight 0.5^(days_ago/7) to the corpus max day). Decay applies to
    the per-day AGGREGATE — the float fold touches ≤ n_days values per
    type, over a sorted array so both engines sum in the same order.
    Counts exact; decayed values at 4 dp. NULL-ts rows drop in
    lockstep: a NULL day would NULL Spark's whole fold (acc + NULL)
    while DuckDB's list_sum silently skips the element."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    mx = daily.agg(F.max("day").alias("max_day"))
    per = daily.crossJoin(F.broadcast(mx)).select(
        "event_type", "n", F.datediff("max_day", "day").alias("d")
    )
    arr = per.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("a"),
    )
    dec = F.aggregate(
        "a",
        F.lit(0.0),
        lambda acc, x: acc + x["n"] * F.pow(F.lit(0.5), x["d"] / F.lit(7.0)),
    )
    return (
        arr.select(
            "event_type",
            "n_events",
            F.round(dec, 4).alias("decayed_count"),
        )
        .withColumn(
            "freshness",
            F.round(F.col("decayed_count") / F.col("n_events"), 6),
        )
        .orderBy("event_type")
    )


SQL_DECAYED_EVENT_COUNTS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), mx AS (SELECT max(day) AS max_day FROM daily),
per AS (
  SELECT event_type, n, date_diff('day', day, max_day) AS d
  FROM daily CROSS JOIN mx
), agg AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
         list(struct_pack(d := d, n := n) ORDER BY d, n) AS a
  FROM per GROUP BY event_type
), dec AS (
  SELECT event_type, n_events,
         round(list_sum(list_transform(a,
                 x -> x.n * power(0.5, x.d / 7.0))), 4) AS decayed_count
  FROM agg
)
SELECT event_type, n_events, decayed_count,
       round(decayed_count / n_events, 6) AS freshness
FROM dec
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# encoding_advisor — storage-layout cardinality profiler
# ---------------------------------------------------------------------------

_ADVISOR_COLS = ("l_linestatus", "l_partkey", "l_quantity", "l_returnflag")


def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per profiled lineitem column: row count, exact distinct count,
    top-value share, and an encoding suggestion (≤100 distinct →
    dictionary+RLE; <1% distinct ratio → dictionary; else plain) — the
    stats a compaction/layout job reads before rewriting files. All
    columns stack into ONE (colname, value) aggregate: one scan, one
    shuffle, no per-column job storm."""
    li = _t(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("colname"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in _ADVISOR_COLS
                ]
            )
        ).alias("s")
    ).select("s.*")
    per_val = stacked.groupBy("colname", "val").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_val.groupBy("colname")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            "colname",
            "n_rows",
            "n_distinct",
            F.round(F.col("top_cnt") / F.col("n_rows"), 6).alias("top_share"),
            F.when(F.col("n_distinct") <= 100, F.lit("dictionary+rle"))
            .when(
                F.col("n_distinct") / F.col("n_rows") < 0.01, F.lit("dictionary")
            )
            .otherwise(F.lit("plain"))
            .alias("advice"),
        )
        .orderBy("colname")
    )


SQL_ENCODING_ADVISOR = """
WITH stacked AS (
  SELECT 'l_linestatus' AS colname, l_linestatus AS val FROM lineitem
  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR) FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
), per_val AS (
  SELECT colname, val, CAST(count(*) AS BIGINT) AS cnt
  FROM stacked GROUP BY 1, 2
)
SELECT colname,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_share,
       CASE WHEN count(*) <= 100 THEN 'dictionary+rle'
            WHEN count(*) * 1.0 / sum(cnt) < 0.01 THEN 'dictionary'
            ELSE 'plain' END AS advice
FROM per_val
GROUP BY colname
ORDER BY colname
"""


# ---------------------------------------------------------------------------
# interval_union_coverage — gaps-and-islands interval union per order
# ---------------------------------------------------------------------------


def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of each order's overlapping service intervals
    [shipdate, shipdate + quantity days), summarized per priority:
    orders, avg/max covered days, avg island count. The sweep window is
    order-key-partitioned — ≤7 rows per partition at any corpus size —
    and the island arithmetic is all integer day math. NULL-shipdate /
    non-finite-quantity rows drop in lockstep: a NULL interval start
    sorts FIRST in Spark's sweep window but LAST in DuckDB's, forming a
    different island count per engine, and a NaN/±Inf quantity raises
    on the day-count INT cast in both (round-11 value-fuzz)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    li = money_case(_t(spark, sf_dir, "lineitem"), "l_quantity").where(
        F.col("l_shipdate").isNotNull()
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    iv = li.select(
        "l_orderkey",
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")
        ).alias("e"),
    )
    w = Window.partitionBy("l_orderkey").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = iv.withColumn(
        "new_isl",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    ).withColumn(
        "isl", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_isl = isl.groupBy("l_orderkey", "isl").agg(
        F.datediff(F.max("e"), F.min("s")).alias("cov")
    )
    per_ord = per_isl.groupBy("l_orderkey").agg(
        F.sum("cov").alias("cov_days"), F.count(F.lit(1)).alias("n_islands")
    )
    return (
        per_ord.join(o, per_ord["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("cov_days"), 4).alias("avg_coverage_days"),
            F.max("cov_days").alias("max_coverage_days"),
            F.round(F.avg("n_islands"), 4).alias("avg_islands"),
        )
        .orderBy("o_orderpriority")
    )


SQL_INTERVAL_UNION_COVERAGE = """
WITH iv AS (
  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE) + to_days(CAST(l_quantity AS INT)) AS e
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND (isfinite(l_quantity) AND abs(l_quantity) < 9.2e16)
), flagged AS (
  SELECT l_orderkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY l_orderkey ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR s > max(e) OVER (PARTITION BY l_orderkey ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_isl
  FROM iv
), islands AS (
  SELECT *, CAST(sum(new_isl) OVER (PARTITION BY l_orderkey ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
  FROM flagged
), per_isl AS (
  SELECT l_orderkey, isl, date_diff('day', min(s), max(e)) AS cov
  FROM islands GROUP BY 1, 2
), per_ord AS (
  SELECT l_orderkey, CAST(sum(cov) AS BIGINT) AS cov_days,
         CAST(count(*) AS BIGINT) AS n_islands
  FROM per_isl GROUP BY 1
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(cov_days), 4) AS avg_coverage_days,
       CAST(max(cov_days) AS BIGINT) AS max_coverage_days,
       round(avg(n_islands), 4) AS avg_islands
FROM per_ord JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# degree_assortativity — degree-degree correlation of the trade graph
# ---------------------------------------------------------------------------


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (customer degree, supplier degree) over
    distinct customer–supplier trade edges. Degrees come from two
    aggregates of the distinct edge table, join back by key, and the
    correlation is the closed-form over five moment sums. The degree
    products accumulate in DECIMAL(38,0)/HUGEINT (an int64 cd·sd
    product overflows on hub-heavy graphs where DuckDB would silently
    promote), and a zero-variance graph (e.g. a single edge, or
    perfectly regular degrees) yields NULL assortativity in lockstep
    instead of an ANSI DIVIDE_BY_ZERO."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    cdeg = edges.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cd"))
    sdeg = edges.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("sd"))
    dec = "decimal(38,0)"
    m = (
        edges.join(cdeg, "o_custkey")
        .join(sdeg, "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Σ_edges cd = Σ_customers cd² — same overflow class as the
            # squared sums, so these widen too (DuckDB sum(BIGINT)
            # auto-promotes to HUGEINT)
            F.sum(F.col("cd").cast(dec)).alias("sx"),
            F.sum(F.col("sd").cast(dec)).alias("sy"),
            F.sum(F.col("cd").cast(dec) * F.col("sd")).alias("sxy"),
            F.sum(F.col("cd").cast(dec) * F.col("cd")).alias("sxx"),
            F.sum(F.col("sd").cast(dec) * F.col("sd")).alias("syy"),
        )
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sxx, syy = [F.col(c).cast("double") for c in ("sxy", "sxx", "syy")]
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r = F.when(den2 != 0, (n * sxy - sx * sy) / F.sqrt(den2))
    return m.select(
        F.col("n").alias("n_edges"),
        F.round(sx / n, 4).alias("avg_cust_degree"),
        F.round(sy / n, 4).alias("avg_supp_degree"),
        F.round(r, 6).alias("assortativity"),
    )


SQL_DEGREE_ASSORTATIVITY = """
WITH edges AS (
  SELECT DISTINCT o_custkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), cdeg AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cd FROM edges GROUP BY 1
), sdeg AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS sd FROM edges GROUP BY 1
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cd) AS DOUBLE) AS sx, CAST(sum(sd) AS DOUBLE) AS sy,
         CAST(sum(CAST(cd AS HUGEINT) * sd) AS DOUBLE) AS sxy,
         CAST(sum(CAST(cd AS HUGEINT) * cd) AS DOUBLE) AS sxx,
         CAST(sum(CAST(sd AS HUGEINT) * sd) AS DOUBLE) AS syy
  FROM edges JOIN cdeg USING (o_custkey) JOIN sdeg USING (l_suppkey)
)
SELECT n AS n_edges,
       round(sx / n, 4) AS avg_cust_degree,
       round(sy / n, 4) AS avg_supp_degree,
       round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
             ELSE (n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END,
             6) AS assortativity
FROM m
"""


REGISTRY_EXT20: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "benford_digits": (q_benford_digits, SQL_BENFORD_DIGITS),
    "cusum_changepoint": (q_cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    "decayed_event_counts": (q_decayed_event_counts, SQL_DECAYED_EVENT_COUNTS),
    "encoding_advisor": (q_encoding_advisor, SQL_ENCODING_ADVISOR),
    "interval_union_coverage": (
        q_interval_union_coverage,
        SQL_INTERVAL_UNION_COVERAGE,
    ),
    "degree_assortativity": (q_degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
}
