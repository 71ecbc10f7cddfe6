"""Relational batch 10 (round 3 continuation): skyline (Pareto frontier)
computation and a rank-error contract for sketch-based quantiles.

- ``skyline_pareto`` finds the non-dominated set of parts on
  (minimize price, maximize size) with two windows over integer keys —
  a RANGE frame for strictly-cheaper competitors and a per-price
  partition max for equal-price competitors — never the O(n²)
  dominance self-join. Money is compared in exact integer cents.
- ``approx_quantile_guarantee`` pins the contract of
  ``approx_percentile`` (Greenwald-Khanna): the estimate's EXACT rank
  must lie within ±accuracy⁻¹·n of the target rank. Like
  ``hll_daily_union``, the oracle verifies the exact quantities and the
  guarantee booleans — the correct way to oracle an approximate
  operator whose exact output is layout-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# skyline_pareto — non-dominated frontier via two windows
# ---------------------------------------------------------------------------


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize retail price, maximize size.
    A part is dominated iff some other part has (price ≤, size ≥) with at
    least one strict. Scale shape: first a distributed shuffle aggregate
    collapses the data to ONE row per price (max size at that price) —
    the only pass over the full table — then a single global window over
    that *price-cardinality-sized* aggregate computes the running "max
    size among strictly cheaper prices" (``ROWS UNBOUNDED PRECEDING ..
    1 PRECEDING``; one row per price makes it equivalent to the RANGE
    frame over raw rows). Spark executes a partition-less window in one
    task, so keeping its input at price cardinality (≈10⁴–10⁵ distinct
    cents values, independent of row count) is what makes the plan safe
    at 100 TB. The per-price maxima then join back to the parts (AQE
    picks broadcast when the price table is small). Dominated iff a
    strictly-cheaper price offers ≥ size, or a same-price part is
    strictly larger (identical (price, size) pairs do not dominate each
    other under standard skyline semantics). Output = frontier rows
    ordered by price; all integer comparisons. Complete-case on
    (p_retailprice, p_size) in LOCKSTEP (round-9 decorrelated dirty
    audit): a part missing either dimension is not comparable, NULL
    prices group/join/order differently per engine, and a NaN/±Inf
    price is equally incomparable — and raises on the cents cast in
    both engines (round-11 value-fuzz → money_case)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    part = money_case(_t(spark, sf_dir, "part"), "p_retailprice").where(
        F.col("p_size").isNotNull()
    )
    p = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    per_price = p.groupBy("price_cents").agg(F.max("size").alias("max_size_same"))
    w_cheaper = (
        Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = per_price.withColumn(
        "max_size_cheaper", F.max("max_size_same").over(w_cheaper)
    )
    g = p.join(pp, "price_cents").select(
        "p_partkey",
        "price_cents",
        "size",
        "max_size_cheaper",
        "max_size_same",
    )
    dominated = (
        (
            F.col("max_size_cheaper").isNotNull()
            & (F.col("max_size_cheaper") >= F.col("size"))
        )
        | (F.col("max_size_same") > F.col("size"))
    )
    return (
        g.filter(~dominated)
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


SQL_SKYLINE_PARETO = """
WITH p AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
  WHERE (isfinite(p_retailprice) AND abs(p_retailprice) < 9.2e16) AND p_size IS NOT NULL
), g AS (
  SELECT p_partkey, price_cents, size,
         max(size) OVER (ORDER BY price_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_size_cheaper,
         max(size) OVER (PARTITION BY price_cents) AS max_size_same
  FROM p
)
SELECT p_partkey, price_cents, size
FROM g
WHERE NOT ((max_size_cheaper IS NOT NULL AND max_size_cheaper >= size)
           OR (max_size_same > size))
ORDER BY price_cents, p_partkey
"""


# ---------------------------------------------------------------------------
# approx_quantile_guarantee — rank-error contract for approx_percentile
# ---------------------------------------------------------------------------

_AQ_ACC = 1000  # Greenwald-Khanna accuracy: rank error <= n / _AQ_ACC


def q_approx_quantile_guarantee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for sketch-based quantiles: per order-priority,
    ``approx_percentile(o_totalprice, {0.5, 0.9}, 1000)`` must land
    within ±n/1000 of the target RANK. The query computes each
    estimate's exact rank (a count ≤ comparison re-aggregated from the
    same scan — no sort) and emits the guarantee booleans plus the exact
    group sizes; the oracle verifies sizes exactly and pins the booleans
    TRUE — the estimate itself is partition-layout-dependent and
    therefore NOT part of the contract (cf. ``hll_daily_union``). At
    100 TB the sketch is the only viable grouped-quantile plan: fixed
    memory per group, single pass, mergeable partials."""
    # complete-case on the measured value: approx_percentile ignores NULL
    # prices, so the guarantee's population — and its exact group size n —
    # must be the NON-NULL prices on both engines (count(*) would include
    # NULL rows the sketch never saw and break the rank tolerance on
    # dirty data; identical on clean data). A NULL group KEY takes the
    # '<null>' sentinel in lockstep: the rank re-join is an equi-join
    # that would silently drop the NULL-priority group Spark's groupBy
    # (and the oracle's GROUP BY) keeps (round-9 decorrelated audit).
    ords = _t(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
    ).withColumn(
        "o_orderpriority",
        F.coalesce(F.col("o_orderpriority"), F.lit("<null>")),
    )
    est = ords.groupBy("o_orderpriority").agg(
        F.expr(
            f"approx_percentile(o_totalprice, array(0.5, 0.9), {_AQ_ACC})"
        ).alias("est"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        ords.join(
            F.broadcast(
                est.select(
                    "o_orderpriority",
                    F.col("est")[0].alias("e50"),
                    F.col("est")[1].alias("e90"),
                    "n",
                )
            ),
            "o_orderpriority",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("o_totalprice") <= F.col("e50")).cast("long")).alias("r50"),
            F.sum((F.col("o_totalprice") <= F.col("e90")).cast("long")).alias("r90"),
        )
    )
    tol = (F.col("n") / _AQ_ACC) + 1
    return ranks.select(
        "o_orderpriority",
        "n",
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= tol).alias("p50_within_rank_tol"),
        (F.abs(F.col("r90") - 0.9 * F.col("n")) <= tol).alias("p90_within_rank_tol"),
    ).orderBy("o_orderpriority")


SQL_APPROX_QUANTILE_GUARANTEE = """
SELECT coalesce(o_orderpriority, '<null>') AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       TRUE AS p50_within_rank_tol,
       TRUE AS p90_within_rank_tol
FROM orders
WHERE o_totalprice IS NOT NULL
GROUP BY 1
ORDER BY o_orderpriority
"""


REGISTRY_EXT10 = {
    "skyline_pareto": (q_skyline_pareto, SQL_SKYLINE_PARETO),
    "approx_quantile_guarantee": (
        q_approx_quantile_guarantee,
        SQL_APPROX_QUANTILE_GUARANTEE,
    ),
}
