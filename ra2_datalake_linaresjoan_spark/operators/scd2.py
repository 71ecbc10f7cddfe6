"""SCD2 (slowly-changing dimension, type 2) history builder.

The reference's warehouse loader overwrites dimensions in place
(`loader_NeonDB.py` load_all path — current-state only); this extension
derives the full change history a type-2 dimension would keep:
one row per (key, state) EPISODE with ``valid_from`` / ``valid_to`` /
``is_current``, consecutive no-change rows collapsed.

Spark-first shape: two window passes over the SAME (key) partitioning and
(ts, tiebreak) ordering — Catalyst plans ONE shuffle and one sort, the
second Window reuses the child's distribution. No self-joins, no driver
loops; scales with the fact because state per key is the window buffer
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    state: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse a change feed into SCD2 episodes.

    Returns columns: ``{key}``, ``state``, ``valid_from`` (from ``ts``),
    ``valid_to`` (next episode's start, null for the open episode) and
    ``is_current``. ``tiebreak`` makes same-timestamp ordering
    deterministic.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = (
        df.withColumn("_prev_state", F.lag(state).over(w))
        .filter(
            F.col("_prev_state").isNull() | (F.col("_prev_state") != F.col(state))
        )
        .drop("_prev_state")
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        changed.withColumn("valid_to", F.lead(ts).over(w2))
        .select(
            F.col(key),
            F.col(state).alias("state"),
            F.col(ts).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
