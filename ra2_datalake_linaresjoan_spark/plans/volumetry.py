"""Volumetry / extraction-stats report (reference
``extractor_polymarket.py:231-364``).

The reference accumulates per-entity totals, active/closed tallies,
percentage ratios, relation-count averages/maxima and top-10s in Python
dicts row by row. Here each section is ONE aggregate job (map-side
partial + final, no count() storm — SURVEY §7.4.7) and top-10s are
TakeOrderedAndProject; the collected report is a small dict suitable for
the JSON report sink (S11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.operators.topk import top_k_groups


def entity_stats(df: DataFrame, active_col: str = "active", closed_col: str = "closed") -> dict:
    """Totals + active/closed tallies + rounded percentages
    (extractor_polymarket.py:238-299) in one aggregate."""
    aggs = [F.count(F.lit(1)).alias("total")]
    has_active = active_col in df.columns
    has_closed = closed_col in df.columns
    if has_active:
        aggs.append(
            F.sum(F.when(F.col(active_col).cast("boolean"), 1).otherwise(0)).alias("n_active")
        )
    if has_closed:
        aggs.append(
            F.sum(F.when(F.col(closed_col).cast("boolean"), 1).otherwise(0)).alias("n_closed")
        )
    row = df.agg(*aggs).collect()[0]
    out = {"total": row["total"]}
    if has_active:
        out["active"] = int(row["n_active"] or 0)
        out["pct_active"] = round(out["active"] / row["total"] * 100, 2) if row["total"] else 0.0
    if has_closed:
        out["closed"] = int(row["n_closed"] or 0)
    return out


def relation_stats(pairs: DataFrame, left_col: str, right_col: str, top_n: int = 10) -> dict:
    """Grouped relation counts: avg/max per left key + top-N keys
    (extractor_polymarket.py:303-353) — one grouped agg, one re-agg, one
    ordered limit."""
    per_key = pairs.groupBy(left_col).agg(F.count(F.lit(1)).alias("n"))
    summary = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.avg("n"), 2).alias("avg_per_key"),
        F.max("n").alias("max_per_key"),
    ).collect()[0]
    top = top_k_groups(pairs, [left_col], k=top_n, count_col="n").collect()
    return {
        "n_keys": summary["n_keys"],
        "avg_per_key": float(summary["avg_per_key"] or 0),
        "max_per_key": int(summary["max_per_key"] or 0),
        "top": [(r[left_col], r["n"]) for r in top],
    }


def volumetry_report(tables: dict[str, DataFrame], relations: dict[str, tuple[DataFrame, str, str]] = {}) -> dict:
    """Full volumetry document: per-entity stats + relation stats —
    the reference's volumetry_report.json shape."""
    report: dict = {"entities": {}, "relations": {}}
    for name, df in tables.items():
        report["entities"][name] = entity_stats(df)
    for name, (pairs, left, right) in relations.items():
        report["relations"][name] = relation_stats(pairs, left, right)
    return report
