"""Calendar-part derivation (SURVEY.md §2.8 F17).

Mirrors the reference's date dimension build (``loader_NeonDB.py:277-282``),
which uses pandas conventions: day-of-week Monday=0, weekend = dow >= 5,
quarter = (month-1)//3 + 1. Spark's ``dayofweek`` is Sunday=1, so we use
``weekday()`` (Monday=0) for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def calendar_parts(date_col: Column, prefix: str = "") -> list[Column]:
    """Return the standard calendar-part columns for a date/timestamp column.

    Produces: fecha (date), anio, mes, dia, trimestre, dia_semana (Mon=0),
    es_finde (bool) — the reference's dim_fecha shape
    (loader_NeonDB.py:94-105).
    """
    d = F.to_date(date_col)
    return [
        d.alias(f"{prefix}fecha"),
        F.year(d).alias(f"{prefix}anio"),
        F.month(d).alias(f"{prefix}mes"),
        F.dayofmonth(d).alias(f"{prefix}dia"),
        F.quarter(d).alias(f"{prefix}trimestre"),
        F.weekday(d).alias(f"{prefix}dia_semana"),
        (F.weekday(d) >= 5).alias(f"{prefix}es_finde"),
    ]


def build_date_dim(df: DataFrame, date_col: str) -> DataFrame:
    """Distinct dates of ``date_col`` → date dimension with surrogate key.

    Surrogate ``fecha_id`` is a row_number over date order — deterministic,
    and cheap at dimension scale (dates are tiny even at 100 TB of facts,
    so the single-partition window is fine; facts are never windowed this
    way). Mirrors reference ``_get_or_create_fecha`` (loader_NeonDB.py:266-285)
    without the per-row SELECT/INSERT round-trips.
    """
    from pyspark.sql import Window

    # schema-tolerant like star_schema._c: a bronze feed without the date
    # column yields an EMPTY date dim (and empty date-keyed facts), not an
    # UNRESOLVED_COLUMN crash
    src = (
        F.col(date_col)
        if date_col in df.columns
        else F.lit(None).cast("timestamp")
    )
    dates = (
        df.select(F.to_date(src).alias("fecha"))
        .where(F.col("fecha").isNotNull())
        .distinct()
    )
    w = Window.orderBy("fecha")
    return dates.select(
        F.row_number().over(w).alias("fecha_id"), *calendar_parts(F.col("fecha"))
    )
