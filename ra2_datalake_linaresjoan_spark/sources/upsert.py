"""Idempotent key-based upsert for parquet tables (Delta-MERGE parity).

The reference makes loads idempotent with ``ON CONFLICT (pk) DO NOTHING``
(loader_NeonDB.py:370,399,446,507,544,598) — insert-if-absent per key.
With Delta available this is ``MERGE WHEN NOT MATCHED THEN INSERT`` /
``WHEN MATCHED THEN UPDATE``; on plain parquet the engine provides the
same contract as read → resolve-by-key → atomic overwrite:

- mode='ignore'   — keep the existing row on key collision (the
  reference's DO NOTHING)
- mode='upsert'   — new rows win on collision (Delta MERGE UPDATE parity)

Scale note: a parquet rewrite is O(table); that is inherent to
non-transactional storage and is exactly what Delta's MERGE avoids — on a
cluster with Delta, ``write_table(fmt='delta')`` + ``DeltaTable.merge``
replaces this helper with an O(changed-files) commit. The resolve itself
is one shuffle (union + window) and holds at any size.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.operators.dedup import dedup_keep_newest


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    mode: str = "upsert",
) -> None:
    """Merge ``updates`` into the parquet table at ``path`` by key.

    Survivor per key is deterministic: a precedence column ranks
    new-over-old (upsert) or old-over-new (ignore), then the engine's W1
    dedup picks one row per key. Written to a temp dir first, then swapped
    in, so a failed job never leaves a half-written table.
    """
    if mode not in ("upsert", "ignore"):
        raise ValueError(f"unknown merge mode: {mode}")
    new_pref = 1 if mode == "upsert" else 0
    incoming = updates.withColumn("_pref", F.lit(new_pref))
    if os.path.exists(path):
        existing = spark.read.parquet(path).withColumn("_pref", F.lit(1 - new_pref))
        merged = incoming.unionByName(existing, allowMissingColumns=True)
    else:
        merged = incoming
    resolved = dedup_keep_newest(merged, keys, "_pref").drop("_pref")

    tmp = tempfile.mkdtemp(dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        resolved.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
