"""Registry-wide DIRTY-DATA oracle parity audit.

The driver's correctness gate compares Spark vs DuckDB on CLEAN
testdata, and the universal null-riddled sweep checks only that Spark
EXECUTES on dirty data.  This tool closes the gap between them: it
builds the same null-riddled corpus the sweep uses (1-in-3 rows with
every nullable column nulled; array columns additionally get
element-interior nulls), registers DuckDB views over the SAME dirty
parquet, and runs every registered query on BOTH engines, comparing
with the driver-replica harness.

Output: one line per query —
  MATCH        engines agree on the dirty corpus
  MISMATCH     both ran, values/rows differ (cross-engine divergence)
  DUCK_ERR     the oracle SQL errors on dirty data (usually the
               '0x'-hash-cast class) while Spark runs
  SPARK_ERR    the Spark side errors (ANSI arithmetic on dirty data)
  BOTH_ERR     both error

Usage: python tools/dirty_parity_audit.py [only_csv_names]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

SF = "/root/testdata/sf0.001"

#: The round-8 audit's remaining cross-engine divergences on dirty data,
#: by query name — the documented BACKLOG this audit ratchets down each
#: round.  Every OTHER registry query must MATCH (the env-gated pytest
#: sweep in tests/test_dirty_parity_gate.py enforces it); removing a
#: name here requires its fix to show MATCH in a fresh audit run.
#: Classes: float = summation-order / float-function divergence on
#: NULL-perturbed groups; nullsem = NULL-handling semantics divergence
#: not yet lockstep-fixed; stream = streaming-shaped query whose
#: batch-parity oracle diverges on NULL ts; binary = multimodal byte
#: paths; tie = tie-break divergence exposed by NULL-induced duplicate
#: keys.
KNOWN_DIVERGENT: dict[str, str] = {
    "ab_test_readout": "nullsem",
    "approx_quantile_guarantee": "nullsem",
    "bcubed_cluster_eval": "nullsem",
    "blocking_quality_audit": "nullsem",
    "clean_string_parity": "nullsem",
    "cluster_tightness": "float",
    "corpus_datacard": "nullsem",
    "cumulative_unique_users": "nullsem",
    "dedup_survivors": "nullsem",
    "emb_norm_outliers": "float",
    "embedding_quantize": "nullsem",
    "ess_importance_weights": "float",
    "event_sessionization": "stream",
    "gini_spend": "tie",
    "hard_negative_mining": "nullsem",
    "hll_daily_union": "nullsem",
    "holt_linear_forecast": "stream",
    "jackknife_ratio_variance": "float",
    "jsonish_arrays_parity": "nullsem",
    "matryoshka_prefix_fidelity": "nullsem",
    "mmr_diverse_topk": "nullsem",
    "multimodal_features": "binary",
    "multimodal_frames": "binary",
    "multimodal_resize": "binary",
    "ntile_quartiles": "tie",
    "poisson_bootstrap_ci": "nullsem",
    "pq_codebook_distortion": "nullsem",
    "quantize_embeddings": "nullsem",
    "score_calibration_bins": "nullsem",
    "semantic_kmeans": "nullsem",
    "semantic_prune": "nullsem",
    "sliding_windows": "stream",
    "sources_by_lang": "nullsem",
    "tumbling_windows": "stream",
    "udaf_centroids": "nullsem",
    "waterfill_allocation": "nullsem",
    "watermark_late_audit": "stream",
    "wilson_ci": "float",
    "winsorized_value_stats": "nullsem",
}


def build_dirty_dir(spark: SparkSession, out_dir: str) -> str:
    for f in os.listdir(SF):
        if not f.endswith(".parquet"):
            continue
        df = spark.read.parquet(os.path.join(SF, f)).limit(60)
        nullable = [fl.name for fl in df.schema.fields if fl.nullable]

        def _nulled(fl):
            rid = F.monotonically_increasing_id()
            whole_null = F.when(
                (rid % 3 == 0) & F.lit(fl.name in nullable),
                F.lit(None).cast(fl.dataType),
            )
            if isinstance(fl.dataType, ArrayType):
                holed = F.transform(
                    F.col(fl.name),
                    lambda x, i: F.when(i % 3 == 0, F.lit(None)).otherwise(x),
                )
                return (
                    whole_null.when(rid % 3 == 1, holed)
                    .otherwise(F.col(fl.name))
                    .alias(fl.name)
                )
            return whole_null.otherwise(F.col(fl.name)).alias(fl.name)

        out = df.select(*[_nulled(fl) for fl in df.schema.fields])
        # coalesce(1): deterministic single part file per table so
        # monotonically_increasing_id row selection is reproducible
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f)
        )
    return out_dir


def main() -> int:
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dirty-parity-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_harness import compare, duck_con

    from ra2_datalake_linaresjoan_spark.queries import oracle_sql, queries

    d = build_dirty_dir(spark, tempfile.mkdtemp(prefix="dirty_parity_"))
    con = duck_con(d)
    qs, sqls = queries(), oracle_sql()
    tallies: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = sqls.get(name)
        if sql is None:
            tallies.setdefault("NO_ORACLE", []).append(name)
            print(f"{name}: NO_ORACLE")
            continue
        s_err = d_err = None
        sdf = None
        try:
            sdf = fn(spark, d)
            sdf.collect()
        except Exception as e:  # noqa: BLE001
            s_err = str(e).splitlines()[0][:140]
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # noqa: BLE001
            d_err = str(e).splitlines()[0][:140]
        if s_err and d_err:
            status, detail = "BOTH_ERR", f"spark={s_err} duck={d_err}"
        elif s_err:
            status, detail = "SPARK_ERR", s_err
        elif d_err:
            status, detail = "DUCK_ERR", d_err
        else:
            ok, msg = compare(sdf, con, sql)
            status, detail = ("MATCH", "") if ok else ("MISMATCH", msg.replace("\n", " | ")[:200])
        tallies.setdefault(status, []).append(name)
        print(f"{name}: {status}" + (f" — {detail}" if detail else ""))
    print("\n=== SUMMARY ===")
    for status in sorted(tallies):
        names = tallies[status]
        print(f"{status}: {len(names)}")
        if status != "MATCH":
            for n in sorted(names):
                marker = " (known backlog)" if n in KNOWN_DIVERGENT else ""
                print(f"  {n}{marker}")
    bad = {
        n
        for status, names in tallies.items()
        if status not in ("MATCH", "NO_ORACLE")
        for n in names
        if n not in KNOWN_DIVERGENT
    }
    fixed = sorted(
        n for n in KNOWN_DIVERGENT if n in tallies.get("MATCH", [])
    )
    if fixed:
        print(f"\nbacklog entries now MATCHING (remove from KNOWN_DIVERGENT): {fixed}")
    if bad:
        print(f"\nNEW divergences outside the backlog: {sorted(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
