"""Pandas-UDF aggregates (SURVEY §2.10 UDAF surface).

Completes the engine's UDF escape-hatch matrix: Column expressions
(default) → scalar ``pandas_udf`` → GROUPED_AGG ``pandas_udf`` (this
module) → ``applyInPandas``/``mapInPandas`` → ``applyInPandasWithState``.
Used where no built-in aggregate exists: element-wise aggregation over
array columns (embedding centroids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("array<double>")
def embedding_centroid(vectors: pd.Series) -> list[float]:
    """GROUPED_AGG: element-wise mean of an array<float|double> column —
    the per-group embedding centroid. Arrow ships each group's vectors as
    one Series; one numpy reduction per group."""
    if len(vectors) == 0:
        return []
    mat = np.stack(vectors.map(np.asarray)).astype(np.float64)
    return [float(x) for x in mat.mean(axis=0)]


def standardize_embeddings_per_label(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Grouped-map ``applyInPandas``: z-score each embedding dimension
    within its label group (per-group whitening — a common retrieval
    preprocessing step that needs the whole group in one place).

    Each label's vectors arrive as one Arrow batch; one numpy pass
    computes mean/std and emits standardized vectors. Scale: group size is
    the unit of memory — for groups beyond executor memory, pre-aggregate
    moments with ``label_centroids``-style GROUPED_AGG and broadcast them
    instead.
    """

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
        std = mat.std(axis=0)
        std[std == 0] = 1.0
        z = (mat - mat.mean(axis=0)) / std
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                label_col: pdf[label_col].to_numpy(),
                "z_embedding": [list(map(float, row)) for row in z],
            }
        )

    return df.groupBy(label_col).applyInPandas(
        standardize,
        schema=f"{id_col} long, {label_col} int, z_embedding array<double>",
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label embedding centroid + cohesion (mean cosine of members to
    their centroid would need a second pass; here: centroid norm as the
    cheap cohesion proxy)."""
    # a GROUPED_AGG pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run it alone, join the counts in
    cents = df.groupBy(label_col).agg(
        embedding_centroid(F.col(vec_col).cast("array<double>")).alias("centroid")
    )
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_vectors"))
    out = cents.join(counts, label_col)
    norm = F.sqrt(
        F.aggregate("centroid", F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return out.withColumn("centroid_norm", F.round(norm, 6))
