"""Z-order (Morton) sort keys for multi-dimensional data skipping.

The reference's PostgreSQL schema leans on B-tree indexes for its
filter columns (``loader_NeonDB.py:169-171, 200-201``). A lakehouse
replaces those with file/row-group statistics: parquet keeps min/max per
column per row group, and a scan prunes row groups whose range can't
match the filter. Sorting before writing makes those ranges tight — but
a plain sort only clusters the FIRST sort column. Z-ordering interleaves
the bits of several columns so that files are simultaneously clustered
in every dimension, which is what Delta's ``OPTIMIZE ZORDER BY`` does;
this is the same technique as a pure Column expression for plain parquet.

Implementation: each column is rank-bucketed to ``bits`` levels with an
``ntile`` window (rank-based, so skew and arbitrary value ranges don't
break the interleave), then the bucket bits are interleaved JVM-side
with ``shiftleft``/``bitwise OR`` — no UDFs, no driver work. The window
is a global ntile: acceptable because it runs ONCE at write time per
partition batch (and a 100-TB deploy substitutes a sampled-quantile
bucketizer for the ntile — the interleave math is unchanged).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Add a ``_zorder`` column interleaving ``bits`` rank-bits per column.

    Sort/repartitionByRange on ``_zorder`` before writing to cluster the
    files in all of ``cols`` at once.
    """
    out = df
    bucket_cols: list[Column] = []
    n_buckets = 1 << bits
    for c in cols:
        b = f"_zb_{c}"
        out = out.withColumn(
            b, (F.ntile(n_buckets).over(Window.orderBy(c)) - 1).cast("long")
        )
        bucket_cols.append(F.col(b))
    z = F.lit(0).cast("long")
    # interleave: bit i of column j lands at position i*len(cols)+j
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(bucket_cols) + j))
    return out.withColumn("_zorder", z).drop(*[f"_zb_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_files`` files range-partitioned on the Z-order
    key — every file covers a tight hyper-rectangle in ``cols`` space, so
    min/max statistics prune scans filtered on ANY of the dimensions."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
