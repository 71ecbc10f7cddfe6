"""Readers (SURVEY.md §2.1 S4 Delta read, plus parquet/csv/json).

Delta Lake is the reference's bronze format (extractor_polymarket.py:208-213);
this environment has no delta-spark, so ``format='delta'`` is gated behind a
runtime check and everything defaults to Parquet (same columnar layout,
same pushdown behavior). On a cluster with Delta available the same calls
serve Delta paths unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver's synthetic star-schema tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _delta_available(spark: SparkSession) -> bool:
    try:
        return "io.delta" in spark.conf.get("spark.sql.extensions", "")
    except Exception:
        return False


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Read a table; Delta when requested & available, else Parquet.

    CSV defaults to ``header=true`` to mirror ``write_table`` (which
    always writes a header) — without it a write/read round-trip ingests
    the header line as a data row and loses every column name. Callers
    reading headerless CSV pass ``header='false'`` explicitly."""
    if fmt == "delta" and not _delta_available(spark):
        fmt = "parquet"
    if fmt == "csv":
        options.setdefault("header", "true")
    return spark.read.format(fmt).options(**options).load(path)


def read_table_evolved(spark: SparkSession, path: str, **options) -> DataFrame:
    """Read a parquet table whose files span SCHEMA GENERATIONS (a bronze
    dir appended to while the upstream API grew columns): ``mergeSchema``
    unions every file footer's schema, so old files surface the new
    columns as NULL instead of being silently projected away or failing.

    Scale note: schema merging reads every file footer at planning time —
    fine for a bronze landing zone (thousands of files), wrong for a
    100 TB silver table, which should carry ONE authoritative schema (the
    medallion promotion step is exactly where the merge cost is paid once
    and then frozen)."""
    return (
        spark.read.format("parquet")
        .option("mergeSchema", "true")
        .options(**options)
        .load(path)
    )


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables from an sf directory as a dict of
    DataFrames. Missing files are skipped (sf dirs may lack extension
    tables)."""
    out: dict[str, DataFrame] = {}
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = spark.read.parquet(p)
    return out
