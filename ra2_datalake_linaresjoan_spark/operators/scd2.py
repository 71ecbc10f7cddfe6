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

Complete-case input contract (round-10 review): a change row missing
its state, ts, or tiebreak carries no episode value, position, or
order — both builders DROP such rows up front, in lockstep. Without
the shared guard the two paths diverged on NULL states: the one-shot
builder's ``prev != state`` filter dropped a NULL-state row but kept
its successor (lag saw NULL), while the incremental path never saw the
NULL row at all — silently breaking the documented
``scd2_apply(scd2_history(b1), b2) == scd2_history(b1 ∪ b2)`` equality
on dirty feeds. A NULL KEY is deliberately NOT filtered: window
PARTITION BY groups NULL keys into one group identically in Spark and
SQL engines, so NULL-key change rows form their own (degenerate but
engine-consistent) dimension member — filtering them here would
silently shrink feeds whose callers treat NULL as a real group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _complete_rows(df: DataFrame, *cols: str) -> DataFrame:
    cond = None
    for c in cols:
        term = F.col(c).isNotNull()
        cond = term if cond is None else (cond & term)
    return df.where(cond)


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
    deterministic; rows with a NULL state/ts/tiebreak are dropped and
    NULL keys form their own group (the module's complete-case
    contract — see the module docstring).
    """
    clean = _complete_rows(df, state, ts, tiebreak)
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = (
        clean.withColumn("_prev_state", F.lag(state).over(w))
        .filter(
            F.col("_prev_state").isNull() | (F.col("_prev_state") != F.col(state))
        )
        .drop("_prev_state")
    )
    # the lead() pass reuses the SAME window spec object — the one-
    # shuffle/one-sort plan guarantee depends on the two specs never
    # drifting apart
    return (
        changed.withColumn("valid_to", F.lead(ts).over(w))
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
    exactly (``cdc_scd2_apply_audit`` oracle-pins this equality; the
    module-level complete-case guard keeps it true on dirty feeds).

    Tiebreak contract (the arrival-sequence invariant the equality
    depends on): a batch row that shares the open episode's ``valid_from``
    timestamp must carry a tiebreak ABOVE every row already folded into
    the history — i.e. tiebreaks are monotonically assigned in arrival
    order (a CDC sequence number). The open episode re-enters the
    rebuild with a typed NULL sentinel: Spark's ascending windows are
    NULLS FIRST, so NULL sorts below every real value of ANY orderable
    tiebreak type (the round-9 Long.MIN_VALUE sentinel only covered
    integral domains and the long cast silently nulled string tiebreaks
    — round-10 review), and real NULL-tiebreak batch rows cannot
    collide with it because the complete-case guard drops them."""
    closed = episodes.where(~F.col("is_current")).select(
        key, "state", "valid_from", "valid_to", "is_current"
    )
    fresh = _complete_rows(batch, state, ts, tiebreak).select(
        F.col(key), F.col(state), F.col(ts), F.col(tiebreak)
    )
    # the open episode re-enters as a change row at its valid_from; the
    # typed-NULL tiebreak sorts FIRST among equal timestamps (asc =
    # NULLS FIRST) whatever the tiebreak's type
    sentinel = F.lit(None).cast(batch.schema[tiebreak].dataType)
    open_rows = episodes.where(F.col("is_current")).select(
        F.col(key),
        F.col("state").alias(state),
        F.col("valid_from").alias(ts),
        sentinel.alias(tiebreak),
    )
    # rebuild WITHOUT the complete-case guard re-applied (the sentinel
    # is deliberately NULL): inline the two window passes over the
    # already-clean union
    merged = open_rows.unionByName(fresh)
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = (
        merged.withColumn("_prev_state", F.lag(state).over(w))
        .filter(
            F.col("_prev_state").isNull() | (F.col("_prev_state") != F.col(state))
        )
        .drop("_prev_state")
    )
    rebuilt = changed.withColumn("valid_to", F.lead(ts).over(w)).select(
        F.col(key),
        F.col(state).alias("state"),
        F.col(ts).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
    return closed.unionByName(rebuilt)
