"""Relational / pipeline queries, batch 8 (round 4): a one-pass
data-quality constraint suite, CDC snapshot reconciliation, and a BPE
pair-merge tokenizer-training step.

The reference's ``validator_warehouse.py`` runs its integrity checks as
one PostgreSQL query per check — a count() storm that rescans the fact
table once per constraint. ``dq_checks`` is the Spark-first re-plan: all
scalar constraints evaluate in a SINGLE wide aggregate over one scan
(conditional sums), with only the genuinely-join-shaped checks (FK
orphans, key uniqueness) adding their own bounded shuffles.

``snapshot_diff`` is the reconciliation primitive every incremental
pipeline needs (reference parity: the bronze extractors re-pull pages
and upsert — cf. `extractor_polymarket.py` ON CONFLICT — without ever
reporting what changed): given two keyed snapshots, classify every key
as insert / delete / update / unchanged in one full-outer shuffle join.
The "new" snapshot here is a deterministic in-query transform of orders
(drop ~1%, reprice ~9%, inject shifted-key rows) so the oracle can
reproduce it exactly from the same parquet.

``bpe_pair_merge`` is the inner loop of byte-pair-encoding vocabulary
training: count adjacent symbol pairs across the corpus (weighted by
word frequency) and surface the merge candidates — in-row pair
construction via ``transform(sequence(...))``, one aggregate shuffle, no
positional self-join (same plan discipline as ``bigram_vocab``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# dq_checks — the whole constraint suite in one scan (plus FK/unique joins)
# ---------------------------------------------------------------------------


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of lineitem as (check_name, n_violations, ok)
    rows (named ``check_name`` because ``constraint`` is reserved in
    DuckDB): null checks, domain-range checks, a composite-key uniqueness
    check, and referential checks against orders/part/supplier. The five
    scalar constraints share ONE scan and ONE aggregate (conditional
    sums → ``stack`` melt); uniqueness is one groupBy on the composite
    key; each FK check is a broadcast/shuffle anti-join semantically but
    is planned here as a null-producing left join against the distinct
    key set (dimension-sized). Nothing rescans the fact table per
    constraint — the reference's per-check query storm inverted."""
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")

    def _viol(cond) -> F.Column:
        return F.sum(cond.cast("long"))

    scalar = li.agg(
        _viol(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        _viol(F.col("l_shipdate").isNull()).alias("null_shipdate"),
        _viol(~F.col("l_quantity").between(1, 50)).alias("range_quantity"),
        _viol(~F.col("l_discount").between(0.0, 1.0)).alias("range_discount"),
        _viol(F.col("l_extendedprice") <= 0).alias("nonpositive_price"),
    ).select(
        F.expr(
            "stack(5, 'null_orderkey', null_orderkey,"
            " 'null_shipdate', null_shipdate,"
            " 'range_quantity', range_quantity,"
            " 'range_discount', range_discount,"
            " 'nonpositive_price', nonpositive_price)"
        ).alias("check_name", "n_violations")
    )
    dup = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.lit("unique_order_line").alias("check_name"),
            F.coalesce(F.sum((F.col("n") - 1)), F.lit(0)).alias("n_violations"),
        )
    )

    def _fk(child_key: str, parent: DataFrame, parent_key: str, name: str) -> DataFrame:
        keys = parent.select(F.col(parent_key).alias("_pk")).distinct()
        return (
            li.select(F.col(child_key).alias("_ck"))
            .join(F.broadcast(keys), F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.lit(name).alias("check_name"),
                F.sum(F.col("_pk").isNull().cast("long")).alias("n_violations"),
            )
        )

    out = (
        scalar.unionByName(dup)
        .unionByName(_fk("l_orderkey", ords, "o_orderkey", "fk_orderkey"))
        .unionByName(_fk("l_partkey", part, "p_partkey", "fk_partkey"))
        .unionByName(_fk("l_suppkey", sup, "s_suppkey", "fk_suppkey"))
    )
    return out.select(
        "check_name", "n_violations", (F.col("n_violations") == 0).alias("ok")
    ).orderBy("check_name")


SQL_DQ_CHECKS = """
WITH checks AS (
  SELECT 'null_orderkey' AS check_name,
         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations FROM lineitem
  UNION ALL
  SELECT 'null_shipdate',
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
  UNION ALL
  SELECT 'range_quantity',
         CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                       THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'range_discount',
         CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0
                       THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'nonpositive_price',
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
  UNION ALL
  SELECT 'unique_order_line',
         CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber)
  UNION ALL
  SELECT 'fk_orderkey',
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'fk_partkey',
         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'fk_suppkey',
         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
      ON l.l_suppkey = s.s_suppkey
)
SELECT check_name, n_violations, n_violations = 0 AS ok
FROM checks ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# snapshot_diff — CDC reconciliation between two keyed snapshots
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture classification between the orders snapshot and
    a deterministically perturbed "v2" (keys ≡ 0 mod 97 deleted, prices
    +1.00 where key ≡ 0 mod 11, shifted-key clones ≡ 0 mod 101 inserted):
    one full-outer join on the key, then exact column comparison — counts
    per change_type plus a BIGINT-cents checksum of the changed rows. At
    100 TB this is one co-partitioned shuffle join (or zero shuffles if
    both snapshots are bucketed on the key — `writers.write_bucketed`);
    comparing columns directly instead of a formatted row-hash avoids
    double-formatting divergence across engines."""
    ords = _t(spark, sf_dir, "orders")
    old = ords.select("o_orderkey", "o_totalprice", "o_orderstatus")
    base = old.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    inserts = old.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    new = base.unionByName(inserts)
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("delete"))
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    # exact_cents: the CDC classification keeps non-finite-price rows
    # (their change_type is still well-defined — Spark and DuckDB agree
    # NaN = NaN in comparisons) but their checksum contribution is NULL
    # lockstep instead of raising on the BIGINT cast (round-11
    # value-fuzz)
    from ra2_datalake_linaresjoan_spark.operators.filters import exact_cents

    price_cents = F.coalesce(
        exact_cents(F.col("n.o_totalprice")),
        exact_cents(F.col("o.o_totalprice")),
    )
    return (
        joined.select(change.alias("change_type"), price_cents.alias("cents"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("price_cents_sum"),
        )
        .orderBy("change_type")
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM old WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM old WHERE o_orderkey % 101 = 0
), joined AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_totalprice <> n.o_totalprice
                OR o.o_orderstatus <> n.o_orderstatus THEN 'update'
              ELSE 'unchanged' END AS change_type,
         COALESCE(CASE WHEN isfinite(n.o_totalprice) AND abs(n.o_totalprice) < 9.2e16
                       THEN CAST(round(n.o_totalprice * 100) AS BIGINT) END,
                  CASE WHEN isfinite(o.o_totalprice) AND abs(o.o_totalprice) < 9.2e16
                       THEN CAST(round(o.o_totalprice * 100) AS BIGINT) END)
           AS cents
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS price_cents_sum
FROM joined GROUP BY change_type ORDER BY change_type
"""


# ---------------------------------------------------------------------------
# bpe_pair_merge — the BPE vocabulary-training inner loop
# ---------------------------------------------------------------------------


def q_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge-candidate selection: aggregate the corpus
    to (word, freq) once — the shuffle shrinks to vocabulary size, Zipf's
    law's gift to tokenizer training — then build each word's adjacent
    character pairs IN the row (``transform(sequence(...))``) and weight
    pair counts by word frequency. Top-10 by (count desc, pair asc) is
    the deterministic merge-table head. Two aggregate shuffles (corpus →
    vocab, vocab → pairs), a 10-row TakeOrdered, no positional
    self-join, no Python."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, char_length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(10)
    )


SQL_BPE_PAIR_MERGE = """
WITH vocab AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) >= 2
  GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair,
         freq
  FROM vocab
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 10
"""


REGISTRY_EXT8 = {
    "dq_checks": (q_dq_checks, SQL_DQ_CHECKS),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "bpe_pair_merge": (q_bpe_pair_merge, SQL_BPE_PAIR_MERGE),
}
