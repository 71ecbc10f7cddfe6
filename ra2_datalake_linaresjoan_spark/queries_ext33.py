"""Batch 33 (round 6): storage-layout and ANN-infrastructure audits.

- ``zone_map_pruning`` — measures what min/max zone maps (parquet
  row-group stats) are worth under two layouts: the natural ingest
  order vs a sort-by-predicate-column layout.  Chunks are derived
  EXACTLY (natural: doc_id div C; sorted: global rank from per-value
  cumulative counts + intra-value id order), so both engines agree on
  every chunk boundary; the answer is the fraction of chunks a
  BETWEEN predicate can skip in each layout — the number that justifies
  (or doesn't) a re-sort of 100 TB.
- ``pq_codebook_distortion`` — product quantization, the codebook side
  of IVF-PQ ANN at scale: the 64-dim embeddings split into 8 subspaces,
  each quantized against a deterministic 16-centroid codebook (the
  first 16 vectors' subvectors — fixed seeds, no RNG), assignment by
  exact argmin with smallest-index tie-break.  Reports per-subspace
  quantized mean squared distortion and codebook utilization — the
  health check before committing a PQ index build.
- ``compaction_plan_audit`` — the OPTIMIZE planner: documents hash
  into a 1024-file synthetic ingest manifest (ragged sizes, like a
  streaming writer leaves), small files (< 3/4 of the mean, an exact
  integer inequality) coalesce into contiguous compaction groups by a
  running-size cutover at 4x the mean, and the audit reports file and
  group counts and the read-amplification win.  The manifest is
  <= 1024 rows — the driver-sized table real compaction planners
  already hold.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t

_ZM_CHUNK = 256
_ZM_LO = 500
_ZM_HI = 700


def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: zone-map effectiveness for ``n_chars BETWEEN 500 AND
    700`` under the natural layout (chunks of 256 docs in doc_id order)
    vs the sorted-by-n_chars layout.  Sorted-layout ranks are exact
    WITHOUT a global row_number: per-VALUE cumulative counts (the value
    domain is bounded) give each value its start rank, and a
    partition-bounded window orders ids within one value.  A chunk
    survives pruning iff chunk_min <= hi AND chunk_max >= lo; the
    pruned fraction under each layout is the measured value of sorting
    100 TB by its hottest filter column. NULL n_chars is filtered on
    BOTH engines: a zone map has no statistics for NULL and the two
    engines disagree on NULL placement in the start-rank window (Spark
    NULLS FIRST would shift every sorted-layout rank)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull())
        .select("doc_id", "n_chars")
    )

    nat = (
        docs.groupBy((F.col("doc_id") / _ZM_CHUNK).cast("long").alias("chunk"))
        .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    )

    vals = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    starts = vals.select(
        "n_chars", F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("start")
    )
    wi = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = docs.withColumn("intra", F.row_number().over(wi) - 1).join(
        starts, "n_chars"
    )
    srt = (
        ranked.groupBy(
            ((F.col("start") + F.col("intra")) / _ZM_CHUNK)
            .cast("long")
            .alias("chunk")
        )
        .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    )

    def overlap_stats(chunks: DataFrame, label: str) -> DataFrame:
        hit = ((F.col("mn") <= _ZM_HI) & (F.col("mx") >= _ZM_LO)).cast(
            "long"
        )
        return chunks.agg(
            F.count(F.lit(1)).alias(f"chunks_{label}"),
            F.sum(hit).alias(f"scanned_{label}"),
        )

    out = overlap_stats(nat, "natural").crossJoin(
        F.broadcast(overlap_stats(srt, "sorted"))
    )
    return out.select(
        "chunks_natural",
        "scanned_natural",
        F.round(
            1 - F.col("scanned_natural") / F.col("chunks_natural"), 6
        ).alias("pruned_frac_natural"),
        "chunks_sorted",
        "scanned_sorted",
        F.round(
            1 - F.col("scanned_sorted") / F.col("chunks_sorted"), 6
        ).alias("pruned_frac_sorted"),
    )


SQL_ZONE_MAP_PRUNING = f"""
WITH docs AS (
  SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL
), nat AS (
  SELECT CAST(count(*) AS BIGINT) AS chunks_natural,
         CAST(sum(CASE WHEN mn <= {_ZM_HI} AND mx >= {_ZM_LO}
                       THEN 1 ELSE 0 END) AS BIGINT) AS scanned_natural
  FROM (
    SELECT doc_id // {_ZM_CHUNK} AS chunk,
           min(n_chars) AS mn, max(n_chars) AS mx
    FROM docs GROUP BY 1
  )
), starts AS (
  SELECT n_chars,
         CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start
  FROM (SELECT n_chars, count(*) AS cnt FROM docs GROUP BY 1)
), ranked AS (
  SELECT d.n_chars,
         s.start + row_number() OVER (PARTITION BY d.n_chars
                                      ORDER BY d.doc_id) - 1 AS rnk
  FROM docs d JOIN starts s USING (n_chars)
), srt AS (
  SELECT CAST(count(*) AS BIGINT) AS chunks_sorted,
         CAST(sum(CASE WHEN mn <= {_ZM_HI} AND mx >= {_ZM_LO}
                       THEN 1 ELSE 0 END) AS BIGINT) AS scanned_sorted
  FROM (
    SELECT rnk // {_ZM_CHUNK} AS chunk,
           min(n_chars) AS mn, max(n_chars) AS mx
    FROM ranked GROUP BY 1
  )
)
SELECT chunks_natural, scanned_natural,
       round(1 - scanned_natural * 1.0 / chunks_natural, 6)
         AS pruned_frac_natural,
       chunks_sorted, scanned_sorted,
       round(1 - scanned_sorted * 1.0 / chunks_sorted, 6)
         AS pruned_frac_sorted
FROM nat, srt
"""


# ---------------------------------------------------------------------------
# pq_codebook_distortion — product-quantization health check
# ---------------------------------------------------------------------------

_PQ_SUBS = 8
_PQ_SUBDIM = 8
_PQ_CENTROIDS = 16
_PQ_Q = 1_000_000


def q_pq_codebook_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per subspace (8 rows): product-quantization distortion of the
    64-dim embeddings against a DETERMINISTIC 16-centroid codebook (the
    subvectors of the 16 lowest vec_ids — fixed seeds, so both engines
    and every run share the codebook; real builds would k-means these,
    the audit math is identical).  Assignment is exact argmin via a
    lexicographic ``min(struct(distance, cid))`` — identical doubles on
    both engines make the winner (and the smallest-cid tie-break)
    engine-stable.  Each winning distance quantizes to 1e-6 before the
    subspace mean, so the mean is an exact-integer ratio.  Codebook
    utilization (distinct codewords won) comes along for free — a dead
    codeword is a wasted 4-bit code.  Cost: one broadcast of a 16-row
    codebook, a 16x8 in-row expansion, one (vec, sub)-keyed reduce;
    this is the codebook side of IVF-PQ ANN at 100 TB. The scan routes
    through _emb_clean/EMB_CLEAN_SQL on BOTH engines: Spark's ORDER BY
    takes NULLS FIRST and DuckDB NULLS LAST (an unfiltered NULL id
    would seed DIFFERENT codebooks per engine), and an interior-NULL
    element poisons the subspace distances asymmetrically."""
    emb = _emb_clean(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = (
        emb.orderBy("vec_id")
        .limit(_PQ_CENTROIDS)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cid"),
            F.col("v").alias("c"),
        )
    )
    rows = emb.crossJoin(F.broadcast(seeds))

    def d2(s: int):
        lo = s * _PQ_SUBDIM
        acc = F.lit(0.0)
        for i in range(lo, lo + _PQ_SUBDIM):
            diff = F.col("v").getItem(i) - F.col("c").getItem(i)
            acc = acc + diff * diff
        return acc

    per_centroid = rows.select(
        "vec_id",
        "cid",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("sub"), d2(s).alias("d"))
                    for s in range(_PQ_SUBS)
                ]
            )
        ).alias("m"),
    ).select("vec_id", "cid", "m.sub", "m.d")
    best = per_centroid.groupBy("vec_id", "sub").agg(
        F.min(F.struct("d", "cid")).alias("b")
    )
    return (
        best.groupBy("sub")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.round(F.col("b.d") * _PQ_Q).cast("long"))
                / (F.lit(float(_PQ_Q)) * F.count(F.lit(1))),
                6,
            ).alias("mean_sq_distortion"),
            F.countDistinct("b.cid").alias("codewords_used"),
        )
        .orderBy("sub")
    )


def _pq_d2_sql(s: int) -> str:
    lo = s * _PQ_SUBDIM
    terms = " + ".join(
        f"(v[{i + 1}] - c[{i + 1}]) * (v[{i + 1}] - c[{i + 1}])"
        for i in range(lo, lo + _PQ_SUBDIM)
    )
    return f"({terms})"


_PQ_STRUCTS = ", ".join(
    f"struct_pack(sub := {s}, d := {_pq_d2_sql(s)})" for s in range(_PQ_SUBS)
)

SQL_PQ_CODEBOOK_DISTORTION = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {EMB_CLEAN_SQL}
), seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {_PQ_CENTROIDS})
), per_centroid AS (
  SELECT vec_id, cid, unnest([{_PQ_STRUCTS}], recursive := true)
  FROM emb, seeds
), best AS (
  SELECT vec_id, sub, min(struct_pack(d := d, cid := cid)) AS b
  FROM per_centroid GROUP BY 1, 2
)
SELECT sub, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(CAST(round(b.d * {_PQ_Q}) AS BIGINT))
             / ({_PQ_Q}.0 * count(*)), 6) AS mean_sq_distortion,
       CAST(count(DISTINCT b.cid) AS BIGINT) AS codewords_used
FROM best
GROUP BY sub
ORDER BY sub
"""


# ---------------------------------------------------------------------------
# compaction_plan_audit — the OPTIMIZE small-file planner
# ---------------------------------------------------------------------------

_CP_FILES = 1024  # synthetic ingest-manifest size


def q_compaction_plan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the compaction (OPTIMIZE) plan over synthetic ingest
    files — docs hash into a 1024-entry manifest (md5, so file sizes
    are realistically ragged), a file is SMALL when its rows fall below
    3/4 of the mean (rows * files * 4 < rows_total * 3 — an exact
    integer inequality, scale-invariant), and small files coalesce into
    CONTIGUOUS groups by cutting when the running row total crosses
    4x the mean — the greedy contiguous bin-packing real compactors
    run, one running-sum window over the MANIFEST (<= 1024 rows).
    Reported: file counts, planned groups, and the open-file read
    amplification before vs after.

    The hash key takes the '<null>' sentinel in LOCKSTEP (round-9
    review — the ext28/ext30 convention): Spark's concat NULL-propagates
    a NULL doc_id into its own NULL file while DuckDB's concat skips the
    NULL and hashes the literal prefix into a real bucket."""
    docs = _t(spark, sf_dir, "documents").select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("c:"),
                            F.coalesce(
                                F.col("doc_id").cast("string"),
                                F.lit("<null>"),
                            ),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CP_FILES
        ).alias("file_id")
    )
    files = docs.groupBy("file_id").agg(F.count(F.lit(1)).alias("rows"))
    tot = files.agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum("rows").alias("rows_total"),
    )
    sized = files.crossJoin(F.broadcast(tot))
    small = sized.where(
        F.col("rows") * F.col("files_total") * 4
        < F.col("rows_total") * 3
    )
    target = F.ceil(
        F.lit(4) * F.col("rows_total") / F.col("files_total")
    )
    w = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    grouped = small.select(
        "rows",
        (
            F.coalesce(F.sum("rows").over(w), F.lit(0)) / target
        )
        .cast("long")
        .alias("grp"),
    )
    plan = grouped.agg(
        F.count(F.lit(1)).alias("small_files"),
        F.countDistinct("grp").alias("compacted_groups"),
        F.sum("rows").alias("small_rows"),
    )
    return tot.crossJoin(F.broadcast(plan)).select(
        "files_total",
        "rows_total",
        "small_files",
        F.coalesce(F.col("small_rows"), F.lit(0)).alias("small_rows"),
        "compacted_groups",
        (
            F.col("files_total")
            - F.col("small_files")
            + F.col("compacted_groups")
        ).alias("files_after"),
        F.round(
            F.when(
                F.col("files_total")
                - F.col("small_files")
                + F.col("compacted_groups")
                != 0,
                F.col("files_total")
                / (
                    F.col("files_total")
                    - F.col("small_files")
                    + F.col("compacted_groups")
                ),
            ),
            4,
        ).alias("open_file_reduction_x"),
    )


SQL_COMPACTION_PLAN_AUDIT = f"""
WITH files AS (
  SELECT CAST(concat('0x', substr(md5(concat('c:',
                coalesce(CAST(doc_id AS VARCHAR), '<null>'))), 1, 8))
              AS BIGINT) % {_CP_FILES} AS file_id,
         CAST(count(*) AS BIGINT) AS rows
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS files_total,
         CAST(sum(rows) AS BIGINT) AS rows_total
  FROM files
), small AS (
  SELECT rows,
         CAST(coalesce(sum(rows) OVER (ORDER BY file_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // CAST(ceil(4 * rows_total * 1.0 / files_total) AS BIGINT)
           AS BIGINT) AS grp
  FROM files, tot
  WHERE rows * files_total * 4 < rows_total * 3
), plan AS (
  SELECT CAST(count(*) AS BIGINT) AS small_files,
         CAST(count(DISTINCT grp) AS BIGINT) AS compacted_groups,
         CAST(sum(rows) AS BIGINT) AS small_rows
  FROM small
)
SELECT files_total, rows_total, small_files,
       CAST(coalesce(small_rows, 0) AS BIGINT) AS small_rows,
       compacted_groups,
       files_total - small_files + compacted_groups AS files_after,
       round(CASE WHEN files_total - small_files + compacted_groups = 0
             THEN NULL
             ELSE files_total * 1.0
                  / (files_total - small_files + compacted_groups) END, 4)
         AS open_file_reduction_x
FROM tot, plan
"""


REGISTRY_EXT33: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "zone_map_pruning": (q_zone_map_pruning, SQL_ZONE_MAP_PRUNING),
    "pq_codebook_distortion": (
        q_pq_codebook_distortion,
        SQL_PQ_CODEBOOK_DISTORTION,
    ),
    "compaction_plan_audit": (
        q_compaction_plan_audit,
        SQL_COMPACTION_PLAN_AUDIT,
    ),
}
