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
    # hashed=True (round-13): the contaminated-id set is
    # shingle-identity-invariant, so the semi-join probes and the
    # broadcast bench set move int64 xxhash64 keys instead of n-word
    # strings (oracle joins the exact strings — a collision surfaces
    # as a count mismatch, never silently).
    train_sh = shingles(train, id_col, text_col, n, hashed=True)
    bench_sh = (
        shingles(bench, id_col, text_col, n, hashed=True)
        .select("shingle")
        .distinct()
    )
    # benchmark shingle sets are held-out-eval-sized (orders of magnitude
    # smaller than train) — broadcast so the train shingle stream is
    # filtered map-side and only surviving ids reach the distinct shuffle
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """One-row summary: train size, contaminated count, contamination rate.

    Fully lazy — the two counts are 1-row aggregates cross-joined in ONE
    plan (no eager driver-side ``count()`` actions at build time), and the
    rate is engine-side ``round`` (half-away-from-zero in both Spark and
    DuckDB, unlike Python's banker's rounding). An EMPTY train set reports
    ``contamination_rate = 0.0`` (the pre-lazy contract), not the NULL
    that a bare engine-side division by zero would produce."""
    n_train = train.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("n_train")
    )
    n_cont = contaminated_ids(train, bench, id_col, text_col, n).agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return n_train.crossJoin(n_cont).select(
        "n_train",
        "n_contaminated",
        F.when(
            F.col("n_train") > 0,
            F.round(F.col("n_contaminated") / F.col("n_train"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination_rate"),
    )
