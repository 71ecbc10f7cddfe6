"""Top-k operators (SURVEY.md §2.6 T1/T2).

``orderBy(...).limit(k)`` plans as TakeOrderedAndProject: each partition
keeps a k-heap, the driver merges k·P candidates — no global sort, no full
shuffle, safe at any scale. Always pass a deterministic tiebreak so the
result set is reproducible across runs and engines.

NULL ordering is EXPLICIT (round-10 dirty audit): Spark defaults to
NULLS FIRST on asc while DuckDB/ANSI engines default to NULLS LAST, so
a NULL tiebreak key at the LIMIT boundary selected DIFFERENT rows per
engine; both directions route through the SHARED
``operators.ordering.order_nulls_last`` contract (round-11), which
also keeps degenerate NULL-metric rows out of the head of a top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.operators.ordering import order_nulls_last


def top_k(
    df: DataFrame,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows by a metric (T1, reference extract_gaming_data.py:101-109
    ``nlargest(50, 'volume')``)."""
    return df.orderBy(
        order_nulls_last(order_col, ascending),
        *[order_nulls_last(t) for t in tiebreak],
    ).limit(k)


def top_k_groups(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int = 10,
    count_col: str = "n",
) -> DataFrame:
    """Top-k groups by frequency (T2, reference extractor_polymarket.py:313-352):
    groupBy → count → ordered limit, with group columns as tiebreak."""
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(count_col))
        .orderBy(
            order_nulls_last(count_col, ascending=False),
            *[order_nulls_last(c) for c in group_cols],
        )
        .limit(k)
    )
