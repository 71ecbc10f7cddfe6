"""Bucketized range (interval) join — the second temporal-join extension
(with operators/asof.py) Spark lacks as a built-in.

``interval_join``: pair left rows with right rows of the same key whose
time falls in ``[left.ts - window, left.ts]``.

Naive formulations (join on key + range predicate) plan as a broadcast
nested loop or a per-key cross product — quadratic on hot keys. The
scalable pattern buckets time into window-sized cells: a right row in the
range can only live in the left row's bucket or the one before it, so the
join becomes an equi-join on (key, bucket) with the left side exploded
over 2 candidate buckets, then an exact range filter. Cost: 2× left rows
shuffled on (key, bucket) — linear, skew-safe, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    window_seconds: float,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Inner pairs (left.*, right_cols) with
    ``right.right_on ∈ [left.left_on − window, left.left_on]`` per ``by``.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (by, right_on)]
    # silent-corruption guard (round-10 review): a right value column
    # sharing a name with any left column would emit TWO columns of that
    # name — every downstream F.col() reference then throws
    # AMBIGUOUS_REFERENCE and a parquet write fails. Refuse up front
    # (asof_join renames via suffix; here the caller picks right_cols,
    # so the fix is theirs to choose).
    clash = sorted(set(right_cols) & set(left.columns))
    if clash:
        raise ValueError(
            "interval_join: right_cols %r collide with left columns — "
            "alias them on the right side first" % (clash,)
        )
    w_us = int(window_seconds * 1_000_000)
    if w_us <= 0:
        # DIV 0 is null (non-ANSI) or throws (ANSI): either way the
        # bucket equi-join silently matches nothing — refuse instead
        raise ValueError(
            "interval_join: window_seconds=%r is below 1 microsecond; "
            "for exact-timestamp pairing use an equi-join on the "
            "timestamp column" % (window_seconds,)
        )

    l_us = F.unix_micros(F.col(left_on))
    r_us = F.unix_micros(F.col(right_on))

    lt = left.withColumn("_lus", l_us).withColumn(
        "_bucket", F.explode(F.array(F.expr(f"_lus DIV {w_us}"), F.expr(f"_lus DIV {w_us} - 1")))
    )
    rt = right.select(
        F.col(by),
        r_us.alias("_rus"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_bucket", F.expr(f"_rus DIV {w_us}"))

    pairs = lt.join(rt, [by, "_bucket"]).filter(
        (F.col("_rus") >= F.col("_lus") - F.lit(w_us)) & (F.col("_rus") <= F.col("_lus"))
    )
    return pairs.drop("_bucket", "_lus", "_rus")
