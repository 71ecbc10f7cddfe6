"""Iterative PageRank over a weighted edge DataFrame.

The one operator class the rest of the engine doesn't exercise:
ITERATIVE computation expressed as a driver-side loop over DataFrames
(the GraphX/ALS pattern). Each iteration is one broadcast join of the
tiny rank vector against the (cached) edge table plus a groupBy — no
RDDs, no collect; the loop only composes plans.

Scale posture: the edge table is cached because every iteration reuses
it (without the cache, Spark's laziness would rebuild the whole edge
subtree — including the fact scan — once per iteration). The rank
vector is |nodes| rows, always broadcastable; a fixed iteration count
keeps the physical plan bounded (for high iteration counts, checkpoint
every ~10 iterations to cut lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank.

    ``nodes``: one column ``id``. ``edges``: ``src``, ``dst``, ``weight``.
    Per-source transition probability is ``weight / sum(weight over src)``;
    dangling mass is dropped (simplified PR: nodes with no inbound get the
    teleport term only). Returns ``id``, ``rank``.
    """
    n = nodes.count()
    if n == 0:
        # empty graph: no ranks (not a ZeroDivisionError on the teleport)
        return nodes.select(
            F.col("id"), F.lit(None).cast("double").alias("rank")
        )
    teleport = (1.0 - damping) / n
    out = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = (
        edges.join(out, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .cache()
    )
    ranks = nodes.select(F.col("id"), F.lit(1.0 / n).alias("rank"))
    try:
        for _ in range(iterations):
            contribs = (
                trans.join(F.broadcast(ranks), trans["src"] == ranks["id"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
            )
            ranks = nodes.join(
                contribs, nodes["id"] == contribs["dst"], "left"
            ).select(
                "id",
                (
                    F.lit(teleport) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        # materialize the final ranks while trans is still cached, then
        # release the cache — repeated pagerank() calls must not accumulate
        # cached transition tables in executor memory
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        trans.unpersist()
    return ranks
