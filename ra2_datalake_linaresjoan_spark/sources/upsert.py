"""Idempotent key-based upsert for parquet tables (Delta-MERGE parity).

The reference makes loads idempotent with ``ON CONFLICT (pk) DO NOTHING``
(loader_NeonDB.py:370,399,446,507,544,598) — insert-if-absent per key.
With Delta available this is ``MERGE WHEN NOT MATCHED THEN INSERT`` /
``WHEN MATCHED THEN UPDATE``; on plain parquet the engine provides the
same contract as read → resolve-by-key → swap-with-backup:

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

#: suffix of the backup directory the swap leaves while replacing a table;
#: a crash between the two renames is recovered from it on the next call.
BAK_SUFFIX = ".bak"


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    mode: str = "upsert",
) -> None:
    """Merge ``updates`` into the parquet table at ``path`` by key.

    Survivor per key is deterministic EVEN when the updates batch itself
    carries duplicate keys: precedence ranks new-over-old (upsert) or
    old-over-new (ignore), and equal-precedence ties break on a
    whole-row fingerprint — so a re-delivered micro-batch (the
    foreach-sink idempotence contract) always rewrites the same row, and
    the survivor cannot flip with partition order.

    Durability: the new table is written to a temp dir, the old table is
    renamed to ``<path>.bak``, the temp dir renamed into place, and the
    backup removed. A crash at ANY point leaves either the old table at
    ``path``, or (between the two renames) the backup — which the next
    ``merge_upsert`` on the same path restores automatically before
    merging. The table is never silently lost.
    """
    if mode not in ("upsert", "ignore"):
        raise ValueError(f"unknown merge mode: {mode}")
    bak = path.rstrip("/") + BAK_SUFFIX
    if not os.path.exists(path) and os.path.exists(bak):
        # crashed between the swap renames on a previous run: the backup
        # IS the table — restore it before merging
        os.rename(bak, path)

    new_pref = 1 if mode == "upsert" else 0
    incoming = updates.withColumn("_pref", F.lit(new_pref))
    if os.path.exists(path):
        existing = spark.read.parquet(path).withColumn("_pref", F.lit(1 - new_pref))
        merged = incoming.unionByName(existing, allowMissingColumns=True)
    else:
        merged = incoming
    # whole-row fingerprint: deterministic tiebreak among equal-precedence
    # duplicates (e.g. two update rows with the same key) — without it the
    # row_number tie falls to partition-internal order and the survivor
    # can flip between runs
    data_cols = [c for c in merged.columns if c != "_pref"]
    # NULL-distinguishing per-column tokens: xxhash64 SKIPS null inputs,
    # so ('x', NULL) and (NULL, 'x') would collide and the survivor tie
    # would fall back to partition order — the nondeterminism this
    # fingerprint exists to remove (streaming/sketches.row_digest_col
    # convention).
    merged = merged.withColumn(
        "_row_fp",
        F.xxhash64(
            *[
                F.coalesce(
                    F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
                )
                for c in data_cols
            ]
        ),
    )
    resolved = dedup_keep_newest(
        merged, keys, "_pref", tiebreak=("_row_fp",)
    ).drop("_pref", "_row_fp")

    tmp = tempfile.mkdtemp(dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        resolved.write.mode("overwrite").parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # swap with backup: no window in which the table exists at neither
    # path nor bak
    if os.path.exists(bak):
        shutil.rmtree(bak)
    had_old = os.path.exists(path)
    if had_old:
        os.rename(path, bak)
    os.rename(tmp, path)
    if had_old:
        shutil.rmtree(bak)
