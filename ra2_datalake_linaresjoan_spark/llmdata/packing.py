"""Sequence packing for LLM pretraining: concat-and-chunk bin assignment.

Pretraining dataloaders concatenate documents in a deterministic order and
slice the token stream into fixed-size context windows. The Spark-side
equivalent assigns each document the window ("bin") its first token lands
in: a running token sum per shard, integer-divided by the context length.

Scale shape: the running sum is a window over (shard, order) — packing is
done PER SHARD (language, source, or an explicit hash shard), never as one
global ordered window, so no single-partition exchange exists at any data
size. That mirrors real pipelines, which shard first and pack within
shards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def whitespace_tokens(text_col: str | F.Column) -> F.Column:
    """Whitespace token count — the same cheap tokenizer the text-analysis
    stats use (a BPE count is a drop-in replacement via pandas_udf)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(F.trim(c), r"\s+"))


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_count_col: str,
    capacity: int,
    shard_cols: Sequence[str],
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row the context-window index its first token falls in.

    ``bin_id = (tokens-before-this-row-in-shard) div capacity`` — exact
    integer arithmetic, no floating point, engine-portable.
    """
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0).cast("long"))
    return df.withColumn("_cum_before", cum_before).withColumn(
        bin_col, F.expr(f"_cum_before div {int(capacity)}")
    ).drop("_cum_before")
