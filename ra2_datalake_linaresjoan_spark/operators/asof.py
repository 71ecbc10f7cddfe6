"""As-of (backward temporal) join — a composition operator Spark lacks
natively (SURVEY §2.3 notes the reference has no temporal joins; this is
an engine extension for time-series workloads).

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with ``right.on <= left.on`` within the same ``by`` key.

Implementation is the union-and-carry-forward pattern, NOT a range join:
tag both sides, union, then a single window per key ordered by time where
``last(right_row_struct, ignorenulls=True)`` carries the latest right ROW
forward onto left rows. Carrying one struct (not one column at a time) is
what makes the attach ATOMIC: the output never mixes value columns from
different right rows, and a genuinely-null field in the latest right row
stays null instead of resurrecting a stale older value. Cost: ONE shuffle
on the by-key (same as any grouped op) and a linear pass per partition —
no |left|×|right| pairing, no range-condition nested loop. This is the
plan that survives 100 TB: the alternative (non-equi range join)
degenerates to broadcast-nested-loop.
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
    right side at one timestamp resolve deterministically: the row with
    the greatest whole-row fingerprint wins, so a re-run (or a different
    partitioning) always attaches the same row. The carried values are
    one STRUCT per right row — all-or-nothing, never a cross-row mix.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    rvals = F.struct(*[F.col(c) for c in value_cols])
    rt = right.select(
        F.col(by),
        F.col(on),
        rvals.alias("_rvals"),
        # deterministic tie order among equal-timestamp right rows;
        # per-column NULL tokens keep rows differing only in WHICH
        # column is null from colliding (xxhash64 skips null inputs)
        F.xxhash64(
            *[
                F.coalesce(
                    F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
                )
                for c in value_cols
            ]
        ).alias("_rfp"),
    ).withColumn("_side", F.lit(0))
    lt = left.withColumn("_side", F.lit(1))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exact-timestamp right row is visible to the left row's
    # carry-forward; among right rows at one ts the max-_rfp row sorts
    # last and therefore wins the last() below
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc(),
            F.col("_side").asc(),
            F.col("_rfp").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_rvals", ignorenulls=True).over(w).alias("_carry")
    )
    out = carried.filter(F.col("_side") == 1).drop("_side", "_rvals", "_rfp")
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("_carry").getField(c))
    return out.drop("_carry")
