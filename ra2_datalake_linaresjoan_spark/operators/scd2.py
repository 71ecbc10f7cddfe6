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


def scd2_apply(
    episodes: DataFrame,
    batch: DataFrame,
    key: str,
    state: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Incrementally apply a CDC ``batch`` to an existing SCD2
    ``episodes`` table (the output schema of :func:`scd2_history`),
    assuming CDC arrival order: every batch timestamp is ≥ every prior
    timestamp (the contract a change-data feed provides).

    The incremental invariant that makes this cheap at 100 TB: CLOSED
    episodes can never change (all new rows are later), so the merge
    touches only each key's OPEN episode — re-derive episodes from
    {open episode as a synthetic change row} ∪ {batch rows}, then union
    the untouched closed set back. Cost is |batch| + |live keys|, never
    the full history; one (key) shuffle. A same-state batch row
    collapses into the open episode (no new row) — the same no-change
    collapse rule as the one-shot builder, so
    ``scd2_apply(scd2_history(b1), b2) == scd2_history(b1 ∪ b2)``
    exactly (``cdc_scd2_apply_audit`` oracle-pins this equality).

    Tiebreak contract (the arrival-sequence invariant the equality
    depends on): a batch row that shares the open episode's ``valid_from``
    timestamp must carry a tiebreak ABOVE every row already folded into
    the history — i.e. tiebreaks are monotonically assigned in arrival
    order (a CDC sequence number). The open episode re-enters the
    rebuild with the Long.MIN_VALUE sentinel, guaranteed below any real
    domain value, so it always sorts FIRST among equal timestamps; a
    batch that violates the contract (a same-timestamp row with a
    tiebreak at/below ones already applied) reorders against the
    one-shot rebuild — by construction, not by this function's choice
    of sentinel (round-9 advisor note)."""
    closed = episodes.where(~F.col("is_current")).select(
        key, "state", "valid_from", "valid_to", "is_current"
    )
    # the open episode re-enters as a change row at its valid_from; the
    # Long.MIN_VALUE sentinel sorts below ANY real tiebreak (-1 only
    # sorted below non-negative ones), keeping it FIRST among equal
    # timestamps
    open_rows = episodes.where(F.col("is_current")).select(
        F.col(key),
        F.col("state").alias(state),
        F.col("valid_from").alias(ts),
        F.lit(-9223372036854775808).cast("long").alias(tiebreak),
    )
    fresh = batch.select(
        F.col(key),
        F.col(state),
        F.col(ts),
        F.col(tiebreak).cast("long").alias(tiebreak),
    )
    rebuilt = scd2_history(
        open_rows.unionByName(fresh), key, state, ts, tiebreak
    )
    return closed.unionByName(rebuilt)
