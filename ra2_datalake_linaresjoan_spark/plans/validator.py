"""Warehouse validation suite (reference ``validator_warehouse.py:31-248``)
re-expressed over the gold DataFrames.

Checks (same semantics, Spark-native):
- table existence + row counts          (validator_warehouse.py:31-70)
- PK uniqueness per dimension           (:79-105, COUNT(DISTINCT)==COUNT(*))
- referential integrity: anti-join orphan counts must be 0 for both
  bridges and the metrics fact          (:108-162)
- descriptive statistics                (:166-248)

Scale note (SURVEY §7.4.7): each table's checks are batched into a single
multi-aggregate job instead of a count() storm; orphan checks are
left_anti + count (broadcast the dim side).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.operators.joins import anti_orphans

_PK = {
    "dim_fecha": "fecha_id",
    "dim_videojuego": "videojuego_id",
    "dim_serie_gaming": "serie_id",
    "dim_evento_gaming": "evento_id",
    "dim_tag_gaming": "tag_id",
    "dim_mercado_gaming": "mercado_id",
}


@dataclass
class ValidationReport:
    counts: dict[str, int] = field(default_factory=dict)
    uniqueness: dict[str, bool] = field(default_factory=dict)
    orphans: dict[str, int] = field(default_factory=dict)
    stats: dict[str, float] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(self.uniqueness.values()) and all(
            v == 0 for v in self.orphans.values()
        )


def validate_gold(gold: dict[str, DataFrame]) -> ValidationReport:
    report = ValidationReport()

    # counts + PK uniqueness: ONE aggregate per table
    for name, df in gold.items():
        pk = _PK.get(name)
        aggs = [F.count(F.lit(1)).alias("n")]
        if pk:
            aggs.append(F.countDistinct(pk).alias("nd"))
        row = df.agg(*aggs).collect()[0]
        report.counts[name] = row["n"]
        if pk:
            report.uniqueness[name] = row["n"] == row["nd"]

    # referential integrity: orphan counts (validator_warehouse.py:108-162)
    checks = [
        ("fact_evento_tag_gaming.evento_id", "fact_evento_tag_gaming", "dim_evento_gaming", "evento_id"),
        ("fact_evento_tag_gaming.tag_id", "fact_evento_tag_gaming", "dim_tag_gaming", "tag_id"),
        ("fact_mercado_evento_gaming.mercado_id", "fact_mercado_evento_gaming", "dim_mercado_gaming", "mercado_id"),
        ("fact_mercado_evento_gaming.evento_id", "fact_mercado_evento_gaming", "dim_evento_gaming", "evento_id"),
        ("fact_metricas_gaming.mercado_id", "fact_metricas_gaming", "dim_mercado_gaming", "mercado_id"),
        ("fact_metricas_gaming.fecha_id", "fact_metricas_gaming", "dim_fecha", "fecha_id"),
        ("dim_evento_gaming.serie_id", "dim_evento_gaming", "dim_serie_gaming", "serie_id"),
        ("dim_mercado_gaming.videojuego_id", "dim_mercado_gaming", "dim_videojuego", "videojuego_id"),
    ]
    for label, fact_name, dim_name, key in checks:
        fact = gold[fact_name]
        if label == "dim_evento_gaming.serie_id":
            fact = fact.filter(F.col("serie_id").isNotNull())
        report.orphans[label] = anti_orphans(fact, gold[dim_name], key).count()

    # descriptive statistics in one job per table (validator_warehouse.py:166-248)
    ev = gold["dim_evento_gaming"].agg(
        F.sum(F.when(F.col("es_activo"), 1).otherwise(0)).alias("eventos_activos"),
        F.countDistinct("categoria").alias("categorias_distintas"),
    ).collect()[0]
    report.stats["eventos_activos"] = float(ev["eventos_activos"] or 0)
    report.stats["categorias_distintas"] = float(ev["categorias_distintas"])

    mkt = gold["fact_metricas_gaming"].agg(
        F.coalesce(F.sum("volumen_total"), F.lit(0.0)).alias("volumen"),
        F.coalesce(F.sum("liquidez_total"), F.lit(0.0)).alias("liquidez"),
    ).collect()[0]
    report.stats["volumen_total"] = float(mkt["volumen"])
    report.stats["liquidez_total"] = float(mkt["liquidez"])
    return report
