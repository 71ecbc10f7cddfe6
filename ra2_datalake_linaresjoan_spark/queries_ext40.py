"""Batch 40 (round 10): HNSW-style beam-search ANN — the one round-8
registry candidate the round-9 verdict carried forward.

``hnsw_beam_ann_recall`` audits the graph-navigation ANN family
(Malkov & Yashunin, "Efficient and robust approximate nearest neighbor
search using Hierarchical Navigable Small World graphs", TPAMI 2018):
a proximity graph + greedy beam search from fixed entry points, scored
against the exact top-5 under the SAME fixed-100-query contract as
``ivfpq_ann_recall`` (md5-ordered sample, exact-integer quantized
distances, id tie-breaks — every ranking key engine-stable).

True HNSW construction is sequential-insertion; the oracle-checkable,
dataflow-native stand-in built here is a single-layer navigable graph:
each node's M nearest SAME-LSH-BUCKET neighbors (the repo's established
candidate-bounded pattern — bucket joins, never all-pairs), searched by
H rounds of frontier expansion with beam width B. The mechanics under
audit — neighbor-list quality, beam monotonicity, recall vs exact —
are the HNSW search mechanics; the layered insertion order is the only
part not modeled (it is inherently order-dependent and would pin an
arbitrary insertion sequence, not a semantics).

Reference parity note: the reference engine has no ANN surface
(SURVEY §2.8 stops at SQL aggregates); this extends the LLM-data
similarity family (`llmdata/similarity.py`) with its fourth index
shape: brute-force -> LSH -> IVF/IVF-PQ -> graph.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t
from ra2_datalake_linaresjoan_spark.queries_ext38 import (
    _IP_SUBS,
    _ip_subq,
    _ip_subq_sql,
)
from ra2_datalake_linaresjoan_spark.llmdata.similarity import (
    _bucket_ids,
    _hyperplane,
)

_HB_DIM = 64
_HB_PLANES = 6
_HB_TABLES = 4
_HB_SEED = 42
_HB_M = 6  # neighbors kept per node (the graph's out-degree)
_HB_ENTRY = 4  # fixed entry points: the lowest vec_ids
_HB_BEAM = 8  # beam width B
_HB_HOPS = 3  # frontier-expansion rounds H
_HB_K = 5
_HB_QUERIES = 100


def _dist64(vcol: str, qcol: str):
    """Quantized exact squared L2 over all 64 dims — the shared
    8-subspace BIGINT kernel (`queries_ext38._ip_subq`), so every
    comparison is an exact integer on both engines."""
    total = F.lit(0).cast("long")
    for s in range(_IP_SUBS):
        total = total + _ip_subq(s, vcol, qcol)
    return total


def q_hnsw_beam_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query (FIXED md5-ordered 100): hits of the beam-search
    top-5 against the exact top-5, and recall@5.

    The pipeline: (1) graph build — same-LSH-bucket candidate pairs
    (6 planes x 4 tables, the shared `_bucket_ids` bucketing), each
    node keeps its M = 6 nearest by quantized distance (nbr-id
    tie-break); (2) search — every query scores the 4 lowest-id entry
    points, then H = 3 rounds of {expand beam's out-neighbors, union
    with the beam, keep the best B = 8 by (distance, node_id)};
    (3) the final beam's best 5 non-self nodes vs the exact top-5.

    Scale posture: graph construction is the corpus-scale piece — one
    bucket-keyed self-join (candidate-bounded, the minhash/LSH shape;
    bucket count scales via `planes`) + one per-node window, and the
    result is the INDEX a production system materializes once
    (localCheckpoint here). Search touches |queries| x B x M rows per
    hop — corpus-size-independent once the graph exists; each hop is
    one graph join + one per-query window over <= 100 x (B + B·M)
    rows. The exact baseline is the same bounded-sample O(100·N)
    contract as ivfpq_ann_recall. Recall on these near-uniform
    synthetic vectors is graph-limited (navigable small-world
    shortcuts need structure); the audit pins the MECHANICS, and the
    (planes, M, B, H) dials are the production recall levers."""
    emb = (
        _emb_clean(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint()
    )
    # (1) graph: same-bucket pairs -> quantized distance -> top-M
    b = _bucket_ids(
        emb.select("vec_id", F.col("v").alias("embedding")),
        "vec_id",
        "embedding",
        "_bid",
        _HB_DIM,
        _HB_PLANES,
        _HB_TABLES,
        _HB_SEED,
    )
    pairs = (
        b.select(F.col("_bid").alias("node_id"), "tbl", "bucket")
        .join(
            b.select(F.col("_bid").alias("nbr_id"), "tbl", "bucket"),
            ["tbl", "bucket"],
        )
        .where(F.col("node_id") != F.col("nbr_id"))
        .select("node_id", "nbr_id")
        .distinct()
    )
    nv = emb.select(F.col("vec_id").alias("nbr_id"), F.col("v").alias("nvv"))
    sv = emb.select(F.col("vec_id").alias("node_id"), F.col("v").alias("svv"))
    w_m = Window.partitionBy("node_id").orderBy("gdq", "nbr_id")
    graph = (
        pairs.join(nv, "nbr_id")
        .join(sv, "node_id")
        .select("node_id", "nbr_id", _dist64("svv", "nvv").alias("gdq"))
        .withColumn("rk", F.row_number().over(w_m))
        .where(F.col("rk") <= _HB_M)
        .select("node_id", "nbr_id")
        .localCheckpoint()  # the materialized index: read once per hop
    )
    # (2) fixed query sample + entry points
    qids = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_HB_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .localCheckpoint()
    )
    entries = emb.orderBy("vec_id").limit(_HB_ENTRY).select("vec_id", "v")
    w_beam = Window.partitionBy("query_id").orderBy("dq", "node_id")
    beam = (
        qids.crossJoin(F.broadcast(entries))
        .select(
            "query_id",
            F.col("vec_id").alias("node_id"),
            _dist64("v", "qv").alias("dq"),
        )
        .withColumn("rk", F.row_number().over(w_beam))
        .where(F.col("rk") <= _HB_BEAM)
        .select("query_id", "node_id", "dq")
    )
    node_v = emb.select(F.col("vec_id").alias("node_id"), "v")
    for _hop in range(_HB_HOPS):
        cand = (
            beam.select("query_id", "node_id")
            .union(
                beam.join(graph, "node_id").select(
                    "query_id", F.col("nbr_id").alias("node_id")
                )
            )
            .distinct()
        )
        beam = (
            cand.join(node_v, "node_id")
            .join(F.broadcast(qids), "query_id")
            .select("query_id", "node_id", _dist64("v", "qv").alias("dq"))
            .withColumn("rk", F.row_number().over(w_beam))
            .where(F.col("rk") <= _HB_BEAM)
            .select("query_id", "node_id", "dq")
        )
    approx = (
        beam.where(F.col("node_id") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w_beam))
        .where(F.col("rk") <= _HB_K)
        .select("query_id", "node_id")
    )
    # (3) exact top-5 baseline over all vectors (bounded-sample contract)
    exact = (
        qids.crossJoin(emb)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("node_id"),
            _dist64("v", "qv").alias("dq"),
        )
        .withColumn("rk", F.row_number().over(w_beam))
        .where(F.col("rk") <= _HB_K)
        .select("query_id", "node_id")
    )
    hits = (
        approx.join(exact, ["query_id", "node_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        qids.select("query_id")
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(_HB_K)), 4
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


def _hb_bucket_sql() -> tuple[str, str]:
    """(sig column exprs, banded unnest lists) replicating `_bucket_ids`
    with the identical host-side hyperplane constants."""
    bucket_exprs = []
    for t in range(_HB_TABLES):
        terms = []
        for p in range(_HB_PLANES):
            plane = _hyperplane(_HB_DIM, t * _HB_PLANES + p, _HB_SEED)
            lit = "[" + ", ".join(str(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, {lit}) >= 0"
                f" THEN {1 << p} ELSE 0 END)"
            )
        bucket_exprs.append("(" + " + ".join(terms) + f") AS bkt{t}")
    sig = ",\n    ".join(bucket_exprs)
    tbl_list = "[" + ", ".join(str(t) for t in range(_HB_TABLES)) + "]"
    val_list = "[" + ", ".join(f"bkt{t}" for t in range(_HB_TABLES)) + "]"
    return sig, f"unnest({tbl_list}) AS tbl, unnest({val_list}) AS bucket"


def _hnsw_oracle_sql() -> str:
    sig, banded = _hb_bucket_sql()
    d_node = " + ".join(
        _ip_subq_sql(s, "sv.v", "nv.v") for s in range(_IP_SUBS)
    )
    d_query = " + ".join(
        _ip_subq_sql(s, "e.v", "q.qv") for s in range(_IP_SUBS)
    )
    d_hop = " + ".join(
        _ip_subq_sql(s, "ev.v", "q.qv") for s in range(_IP_SUBS)
    )
    hops = []
    prev = "beam0"
    for h in range(1, _HB_HOPS + 1):
        hops.append(
            f"cand{h} AS MATERIALIZED (\n"
            f"  SELECT query_id, node_id FROM {prev}\n"
            f"  UNION\n"
            f"  SELECT b.query_id, g.nbr_id AS node_id\n"
            f"  FROM {prev} b JOIN graph g ON g.node_id = b.node_id\n"
            f"), beam{h} AS MATERIALIZED (\n"
            f"  SELECT c.query_id, c.node_id, {d_hop} AS dq\n"
            f"  FROM cand{h} c\n"
            f"  JOIN emb ev ON ev.vec_id = c.node_id\n"
            f"  JOIN qids q ON q.query_id = c.query_id\n"
            f"  QUALIFY row_number() OVER (PARTITION BY c.query_id\n"
            f"                             ORDER BY dq, c.node_id) <= {_HB_BEAM}\n"
            f")"
        )
        prev = f"beam{h}"
    hops_sql = ",\n".join(hops)
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {EMB_CLEAN_SQL}
), sig AS MATERIALIZED (
  SELECT vec_id,
    {sig}
  FROM emb
), banded AS MATERIALIZED (
  SELECT vec_id, {banded} FROM sig
), pairs AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS node_id, b.vec_id AS nbr_id
  FROM banded a JOIN banded b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
), graph AS MATERIALIZED (
  SELECT node_id, nbr_id
  FROM (
    SELECT p.node_id, p.nbr_id, {d_node} AS gdq
    FROM pairs p
    JOIN emb sv ON sv.vec_id = p.node_id
    JOIN emb nv ON nv.vec_id = p.nbr_id
  )
  QUALIFY row_number() OVER (PARTITION BY node_id
                             ORDER BY gdq, nbr_id) <= {_HB_M}
), qids AS MATERIALIZED (
  SELECT vec_id AS query_id, v AS qv FROM emb
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
          <= {_HB_QUERIES}
), entries AS MATERIALIZED (
  SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {_HB_ENTRY}
), beam0 AS MATERIALIZED (
  SELECT q.query_id, e.vec_id AS node_id, {d_query} AS dq
  FROM qids q CROSS JOIN entries e
  QUALIFY row_number() OVER (PARTITION BY q.query_id
                             ORDER BY dq, e.vec_id) <= {_HB_BEAM}
),
{hops_sql},
approx AS (
  SELECT query_id, node_id FROM beam{_HB_HOPS}
  WHERE node_id <> query_id
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY dq, node_id) <= {_HB_K}
), exact AS (
  SELECT q.query_id, e.vec_id AS node_id
  FROM qids q JOIN emb e ON e.vec_id <> q.query_id
  QUALIFY row_number() OVER (PARTITION BY q.query_id
                             ORDER BY {d_query}, e.vec_id) <= {_HB_K}
), hits AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM approx JOIN exact USING (query_id, node_id)
  GROUP BY 1
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(_HB_K)!r}, 4) AS recall_at_5
FROM qids q
LEFT JOIN hits h USING (query_id)
ORDER BY q.query_id
"""


SQL_HNSW_BEAM_ANN_RECALL = _hnsw_oracle_sql()


# ---------------------------------------------------------------------------
# scd2_stream_sink_audit — the streaming SCD2 sink body, epoch-folded
# ---------------------------------------------------------------------------


def q_scd2_stream_sink_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row auditing the STREAMING-maintained SCD2 dimension: the
    event feed splits into three CDC arrival batches at exact-integer
    time terciles (the ``cdc_scd2_apply_audit`` split), and each batch
    is folded through ``streaming.scd2_sink.scd2_apply_epoch`` — the
    EXACT function body a ``foreachBatch`` micro-batch runs, including
    the parquet read-modify-write of the at-rest episodes table (epoch
    1 bootstraps via scd2_history; epochs 2-3 scd2_apply against the
    table re-READ from disk). The final at-rest table must equal the
    one-shot ``scd2_history`` rebuild row-for-row (exceptAll both ways).

    vs ``cdc_scd2_apply_audit``: that audit pins the in-memory apply
    chain; this one pins the SINK — state surviving parquet round-trips
    between epochs (schema/type fidelity at rest) and the overwrite
    discipline. A real availableNow stream through the same body is
    pinned in tests/test_round10_fixes.py.

    Scale: identical posture to the sink itself — per-epoch cost is
    |batch| + |open episodes|; the audit's one-shot rebuild is the
    O(feed) baseline, built once.  The scratch episodes table lives
    under ``spark.sql.warehouse.dir`` (a CLUSTER-visible location —
    executors write its parquet parts, so a driver-local tempdir would
    silently scatter the table across node-local disks on a real
    cluster; round-10 advisor fix) and is created/removed through the
    Hadoop FileSystem API so any warehouse scheme (file:, hdfs:,
    s3a:) works."""
    import uuid

    from ra2_datalake_linaresjoan_spark.operators.scd2 import scd2_history
    from ra2_datalake_linaresjoan_spark.streaming.scd2_sink import (
        _fs,
        scd2_apply_epoch,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("_us", F.unix_micros("ts"))
    )
    span = ev.agg(F.min("_us").alias("lo"), F.max("_us").alias("hi"))
    third = F.floor((F.col("hi") - F.col("lo")) / F.lit(3)).cast("long")
    bounded = ev.crossJoin(F.broadcast(span)).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        ((F.col("_us") - F.col("lo")) >= third).alias("_past1"),
        ((F.col("_us") - F.col("lo")) >= 2 * third).alias("_past2"),
    )
    cols = ["user_id", "event_type", "ts", "event_id"]
    batches = [
        bounded.where(~F.col("_past1")).select(*cols),
        bounded.where(F.col("_past1") & ~F.col("_past2")).select(*cols),
        bounded.where(F.col("_past2")).select(*cols),
    ]
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "file:/tmp/spark-warehouse"
    )
    scratch = wh.rstrip("/") + f"/_scd2_stream_audit_{uuid.uuid4().hex[:12]}"
    table = f"{scratch}/episodes"
    fs, jp = _fs(spark, scratch)
    ep_schema = (
        "user_id bigint, state string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean"
    )
    try:
        for b in batches:
            scd2_apply_epoch(
                spark, table, b, "user_id", "event_type", "ts", "event_id"
            )
        if fs.exists(jp(table)):
            streamed = spark.read.parquet(table).localCheckpoint()
        else:
            # an all-empty feed never creates the table: zero episodes
            streamed = spark.createDataFrame([], ep_schema)
    finally:
        fs.delete(jp(scratch), True)
    full = scd2_history(
        ev.select(*cols), "user_id", "event_type", "ts", "event_id"
    ).localCheckpoint()
    sym = (
        full.exceptAll(streamed)
        .unionByName(streamed.exceptAll(full))
        .agg(F.count(F.lit(1)).alias("sym_diff"))
    )
    # coalesce: sum over ZERO episodes (a fully-dirty feed filters every
    # row) is NULL in Spark while the oracle's count() is 0 — the exact
    # engine asymmetry the driver's hash gate fails on (round-10 review)
    stats = full.agg(
        F.count(F.lit(1)).alias("n_episodes"),
        F.coalesce(
            F.sum(F.col("is_current").cast("long")), F.lit(0).cast("long")
        ).alias("n_open"),
    )
    streamed_stats = streamed.agg(
        F.count(F.lit(1)).alias("n_episodes_streamed")
    )
    return (
        stats.crossJoin(streamed_stats)
        .crossJoin(sym)
        .select(
            F.lit(3).cast("long").alias("n_epochs"),
            "n_episodes",
            "n_open",
            "n_episodes_streamed",
            "sym_diff",
            (F.col("sym_diff") == 0).alias("table_matches_rebuild"),
        )
    )


#: The oracle derives the episode counts independently (gaps-and-islands
#: over the CDC order) and pins the sink's rebuild-equality claim as the
#: hard TRUE/0 the operator contract guarantees — the same convention as
#: SQL_CDC_SCD2_APPLY_AUDIT.
SQL_SCD2_STREAM_SINK_AUDIT = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
), ch AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM ev
), ep AS (
  SELECT user_id FROM ch WHERE prev IS NULL OR prev <> event_type
)
SELECT CAST(3 AS BIGINT) AS n_epochs,
       CAST(count(*) AS BIGINT) AS n_episodes,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_open,
       CAST(count(*) AS BIGINT) AS n_episodes_streamed,
       CAST(0 AS BIGINT) AS sym_diff,
       TRUE AS table_matches_rebuild
FROM ep
"""


REGISTRY_EXT40: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "hnsw_beam_ann_recall": (q_hnsw_beam_ann_recall, SQL_HNSW_BEAM_ANN_RECALL),
    "scd2_stream_sink_audit": (
        q_scd2_stream_sink_audit,
        SQL_SCD2_STREAM_SINK_AUDIT,
    ),
}
