"""Skew-handling join helpers (SURVEY §4: AQE + salting).

AQE's skew-join split (on in the session builder) handles most skew at
runtime. For the pathological case — a join key whose hot values overflow
even split partitions (the reference's data has one: a single tag touches
133,658 of 200k events, BASELINE.md) — ``salted_join`` spreads each hot
key over ``salt`` sub-keys: the big side gets a random salt per row, the
small side is replicated ``salt`` times. Row multiplication is limited to
the replicated (small) side; the big side never copies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(salt: int, salt_cols: Sequence[str] | None) -> F.Column:
    """Per-row salt in [0, salt). With ``salt_cols`` the salt is a hash of
    those stable row columns — identical across task retries and re-runs.
    Without, it falls back to partition/row position, which spreads rows
    fine but can re-deal them differently if a task is retried."""
    if salt_cols:
        return F.pmod(F.xxhash64(*salt_cols), F.lit(salt)).cast("int")
    return F.pmod(
        F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with salted keys: big ⋈ small on ``on`` where ``on`` is
    skewed in ``big``.

    big:   one salt per row — pass ``salt_cols`` (stable unique-ish columns
           of the big side) to make the spread deterministic under task
           retry; positional fallback otherwise.
    small: exploded over all salt values (×salt rows — fine, it's small).

    ``how`` is restricted to inner/left/left_semi: any join that can emit
    UNMATCHED small-side rows (right/full/right_anti) would emit each of
    them once PER SALT REPLICA (``salt`` null-extended copies instead of
    one) — silent row multiplication, so it raises instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            "salted_join: how=%r can emit unmatched small-side rows, which "
            "the x%d salt replication would duplicate; use inner/left/"
            "left_semi, or an unsalted join for outer semantics" % (how, salt)
        )
    b = big.withColumn("_salt", _salt_col(salt, salt_cols))
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_group_count(
    df: DataFrame,
    keys: Sequence[str],
    salt: int = 16,
    count_col: str = "n",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase grouped count for skewed keys: partial count per
    (key, salt) then re-aggregate per key — the hot key's rows split
    across ``salt`` reducers in phase 1, and phase 2 only sees ``salt``
    partial rows per key. (Spark's hash agg already does map-side partials;
    this helps when even the merged partition for one key is too big.)"""
    k = list(keys)
    salted = df.withColumn("_salt", _salt_col(salt, salt_cols))
    partial = salted.groupBy(*k, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*k).agg(F.sum("_pc").cast("long").alias(count_col))
