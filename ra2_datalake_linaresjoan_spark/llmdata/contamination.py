"""Train/benchmark contamination detection via n-gram overlap.

A training document is "contaminated" when it shares at least one n-gram
shingle with any document of a held-out benchmark set — the standard
decontamination test applied before LLM pretraining (e.g., the 13-gram
overlap checks described in the GPT-3/PaLM papers; n is a parameter).

Scale shape: an inverted-index LEFT SEMI join on the shingle — benchmark
shingles are the (small) build side, so cost is proportional to matching
shingles, never |train| × |bench| pairs. Pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.dedup import shingles


def contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Distinct train-doc ids sharing ≥1 word n-gram with the benchmark."""
    train_sh = shingles(train, id_col, text_col, n)
    bench_sh = shingles(bench, id_col, text_col, n).select("shingle").distinct()
    return (
        train_sh.join(bench_sh, "shingle", "left_semi").select(id_col).distinct()
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """One-row summary: train size, contaminated count, contamination rate."""
    import math

    n_train = train.select(id_col).distinct().count()
    n_cont = contaminated_ids(train, bench, id_col, text_col, n).count()
    # half-away-from-zero rounding (SQL round semantics, not Python's
    # banker's rounding) so the report matches engine-side arithmetic
    rate = math.floor(n_cont / n_train * 1e6 + 0.5) / 1e6 if n_train else 0.0
    spark = train.sparkSession
    return spark.createDataFrame(
        [(n_train, n_cont, rate)],
        "n_train long, n_contaminated long, contamination_rate double",
    )
