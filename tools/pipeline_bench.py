"""End-to-end pipeline benchmark: silver clean → gaming enrich → gold
star schema → full integrity validation, at reference-comparable volume.

BASELINE.md's headline numbers are 3-5 min end-to-end over ~452 K markets
(pandas + row-at-a-time loads, `README.md:317-322`) and ~50 K rows/s of
warehouse load throughput. This harness replays the engine's whole
medallion flow (`cli.run_pipeline` — the same function the CLI runs) on
the messy pipeline fixtures replicated to a comparable row count, and
prints ONE JSON line with wall seconds and rows/s.

Run: python tools/pipeline_bench.py [n_copies]   (default 50000 ≈ 450 K rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.cli import run_pipeline
from ra2_datalake_linaresjoan_spark.session import get_spark


def replicate(spark, rows, cols, n_copies: int, id_col: str = "id"):
    """Fan each fixture row out to ``n_copies`` rows with distinct ids —
    executor-side (crossJoin with a range), no driver-side list building."""
    base = spark.createDataFrame(rows, list(cols))
    copies = spark.range(n_copies).withColumnRenamed("id", "_copy")
    out = base.crossJoin(copies)
    return out.withColumn(
        id_col,
        F.when(
            F.col(id_col).isNotNull(),
            F.concat_ws("_", F.col(id_col), F.col("_copy")),
        ),
    ).drop("_copy")


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from tests.test_pipeline_gold import (
        EVENT_COLS,
        EVENTS,
        MARKET_COLS,
        MARKETS,
        SERIES,
        SERIES_COLS,
    )

    spark = get_spark(app_name="ra2_pipeline_bench")
    markets = replicate(spark, MARKETS, MARKET_COLS, n_copies)
    # dims stay reference-shaped (hundreds of events/series per 450 K
    # markets, volumetry_report.json:4-8 ratio) — replicate them 100×
    events = replicate(spark, EVENTS, EVENT_COLS, max(n_copies // 500, 1))
    series = replicate(spark, SERIES, SERIES_COLS, max(n_copies // 500, 1))
    n_in = markets.count() + events.count() + series.count()

    t0 = time.perf_counter()
    out = run_pipeline(spark, markets, events, series, gold_path=None)
    wall = time.perf_counter() - t0

    ok = all(v.get("ok", True) for v in out["validation"].values() if isinstance(v, dict))
    print(
        json.dumps(
            {
                "metric": "pipeline_end_to_end_sec",
                "value": round(wall, 3),
                "unit": "sec",
                "rows_in": n_in,
                "rows_per_sec": int(n_in / wall),
                "validation_clean": ok,
                "baseline_envelope_sec": "180-300 (reference 3-5 min end-to-end)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
