"""SparkSession builder with scale-aware defaults.

Mirrors the knobs the reference sets for its PySpark cleaning stage
(reference ``src/utils/spark_cleaner.py:32-47``: Arrow exchange, small
shuffle-partition count, UI off) but tuned for a real cluster posture:
AQE on (runtime coalescing + skew-join handling), UTC session timezone so
results are machine-independent, and shuffle partitions sized to the
parallelism actually available instead of the 200 default.

On a 1000-executor cluster the same builder is used with ``master`` unset
(picked up from the cluster manager) and ``shuffle_partitions`` sized to
~2-3× total cores; AQE coalesces small post-shuffle partitions at runtime
so an over-provisioned number is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ra2_datalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target the test harness (``local[$SPARK_GRAFT_CPUS]``); every
    knob is overridable so the same entry point serves a cluster deploy.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{_DEF_CPUS}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _DEF_CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split small single-file scans to the available slots: a compact
        # parquet file otherwise becomes ONE scan task, serializing every
        # scan-heavy stage (measured 7x on the bootstrap's 40x row
        # fan-out). On a real cluster inputs have >= cores splits and
        # this floor is a no-op. Round-10 A/B: a floor of 8 saved ~6%
        # scheduling overhead on light relational queries but cost the
        # text-processing family 6 s (span_dedup 0.73 -> 4.58 s — the
        # per-char shingle scans NEED the width) — 32 stays.
        .config("spark.sql.files.minPartitionNum", str(_DEF_CPUS))
        .config("spark.ui.enabled", "false")
        # local-mode note: the driver JVM runs ALL executor threads, so
        # the heap must be sized for 32 concurrent tasks — 8g was
        # GC-bound (A/B: the md5-heavy bootstrap ran 1.92s at 8g vs
        # 1.60s at 16g, min-of-3). On a cluster deploy the driver only
        # plans, and executors get their own memory settings.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
