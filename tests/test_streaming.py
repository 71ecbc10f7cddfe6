"""Streaming-vs-batch equivalence: the streaming plans (availableNow
trigger, memory sink) must reproduce the batch window queries, and
dedup/late-data semantics must hold (SURVEY §7.4 risk 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark import queries as q
from ra2_datalake_linaresjoan_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sessionized,
    stream_dedup,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-stream sources require a directory
    d = tmp_path_factory.mktemp("events_stream")
    import shutil

    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


@pytest.fixture
def events_stream(spark, events_dir):
    return read_events_stream(spark, events_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, events_stream):
    stream_out = run_to_memory(
        tumbling_agg(events_stream), "t_tumbling", spark
    )
    batch = q.q_tumbling_windows(spark, SF)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(stream_out, cols) == _rows(batch, cols)


def test_streaming_sessions_equal_batch(spark, events_stream):
    stream_out = run_to_memory(sessionized(events_stream), "t_sessions", spark)
    batch = q.q_event_sessionization(spark, SF)
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _rows(stream_out, cols) == _rows(batch, cols)


def test_stream_dedup_drops_duplicate_ids(spark, events_stream):
    deduped = run_to_memory(
        stream_dedup(events_stream), "t_dedup", spark, output_mode="append"
    )
    n_src = spark.read.parquet(f"{SF}/events.parquet").count()
    n_out = deduped.count()
    n_ids = deduped.select("event_id").distinct().count()
    assert n_out == n_ids  # no duplicate ids survive
    assert n_out <= n_src


def test_sliding_window_each_event_in_two_windows(spark, events_stream):
    out = run_to_memory(
        tumbling_agg(events_stream, window="1 hour", slide="30 minutes"),
        "t_sliding",
        spark,
    )
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events


def test_foreach_batch_checkpoint_recovery(spark, tmp_path):
    """foreachBatch sink + checkpoint: a restarted stream must NOT
    reprocess already-committed files (exactly-once per micro-batch)."""
    import shutil

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    def run_once():
        q = (
            read_events_stream(spark, str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == 1000

    # restart with no new data: checkpoint prevents reprocessing
    run_once()
    assert spark.read.parquet(str(out)).count() == n1

    # add a second file: only the delta is processed
    shutil.copy(f"{SF}/events.parquet", src / "b.parquet")
    run_once()
    assert spark.read.parquet(str(out)).count() == 2 * n1


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Watermarked stream–stream interval join (click → purchase within
    30 min per user) must emit exactly the pairs the same join produces
    on bounded DataFrames."""
    from ra2_datalake_linaresjoan_spark.queries import _events
    from ra2_datalake_linaresjoan_spark.streaming.joins import (
        stream_stream_interval_join,
    )
    from ra2_datalake_linaresjoan_spark.streaming.windows import read_events_stream

    clicks = read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_interval_join(clicks, purchases)
    stream_out = run_to_memory(joined, "t_ssjoin", spark, output_mode="append")

    ev = _events(spark, SF)
    batch = stream_stream_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    cols = ["l_event_id", "r_event_id"]
    assert _rows(stream_out, cols) == _rows(batch, cols)
    assert stream_out.count() > 0


def test_stream_static_enrich_broadcasts(spark, events_stream):
    """Stream–static join: every stream row keeps exactly one dimension
    match; the plan on the static side is a broadcast."""
    from ra2_datalake_linaresjoan_spark.streaming.joins import stream_static_enrich

    dim = spark.createDataFrame(
        [(t, t.upper()) for t in ("click", "purchase", "view", "signup", "error")],
        ["event_type", "type_label"],
    )
    out = run_to_memory(
        stream_static_enrich(events_stream, dim, "event_type"),
        "t_ssenrich",
        spark,
        output_mode="append",
    )
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.count() == n_events
    assert out.filter(F.col("type_label").isNull()).count() == 0


def test_foreach_batch_merge_sink_idempotent(spark, events_dir, tmp_path):
    """foreachBatch MERGE sink: an update-mode aggregation streamed into a
    keyed parquet table must converge to the batch aggregate, and
    re-processing the same data (simulated redelivery with a fresh
    checkpoint) must leave the table unchanged — idempotence is what turns
    at-least-once delivery into exactly-once table state."""
    from ra2_datalake_linaresjoan_spark.queries import _events
    from ra2_datalake_linaresjoan_spark.streaming.foreach_sink import (
        stream_merge_sink,
    )

    out = str(tmp_path / "user_totals")

    def totals(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )

    def run(checkpoint: str):
        qy = stream_merge_sink(
            totals(read_events_stream(spark, events_dir)),
            out,
            keys=["user_id"],
            checkpoint_dir=str(tmp_path / checkpoint),
        )
        qy.awaitTermination(120)

    run("cp1")
    batch = totals(_events(spark, SF))
    cols = ["user_id", "n_events", "total_value"]
    first = _rows(spark.read.parquet(out), cols)
    assert first == _rows(batch, cols)

    # redelivery: same source, fresh checkpoint -> same rows, no duplicates
    run("cp2")
    assert _rows(spark.read.parquet(out), cols) == first


def test_rocksdb_state_store_tumbling_equals_batch(spark, events_dir):
    """Large-state posture: the same tumbling aggregation must run (and
    match batch) on the RocksDB state store provider — the provider a
    1000-executor deployment uses so streaming state spills to local SSD
    instead of living on the JVM heap. Skips only if this build lacks the
    bundled RocksDB native library."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        stream = read_events_stream(spark, events_dir)
        try:
            out = run_to_memory(tumbling_agg(stream), "t_rocksdb", spark)
        except Exception as exc:  # pragma: no cover — env-dependent
            pytest.skip(f"RocksDB state store unavailable: {exc}")
        batch = q.q_tumbling_windows(spark, SF)
        cols = batch.columns
        assert _rows(out.select(cols), cols) == _rows(batch, cols)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_chained_window_rollup_equals_batch(spark, events_dir):
    """Window-on-window (two stateful operators in one query): the daily
    rollup of hourly counts computed INSIDE the stream (via window_time)
    must equal the batch day/type aggregate. Append mode — the only
    defined mode over chained stateful operators — emits a window when
    the watermark passes it; availableNow over a bounded source flushes
    everything."""
    from ra2_datalake_linaresjoan_spark.streaming.windows import (
        chained_daily_rollup,
    )

    stream = read_events_stream(spark, events_dir)
    out = run_to_memory(
        chained_daily_rollup(stream), "t_chained", spark, output_mode="append"
    )
    batch_events = spark.read.parquet(f"{SF}/events.parquet")
    # batch oracle: hour counts -> day rollup (same two-level shape)
    hourly = (
        batch_events.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.window_time("w"), "1 day").alias("d"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            "event_type",
            "n_events",
            "n_hours",
        )
    )
    # append emits only windows the final watermark (max ts - 2h) has
    # passed — the still-open last day correctly stays in state
    cutoff = batch_events.agg(
        F.max(F.col("ts").cast("timestamp")) - F.expr("INTERVAL 2 HOURS")
    ).collect()[0][0]
    closed = daily.filter(
        F.col("day_start") + F.expr("INTERVAL 1 DAY") <= F.lit(cutoff)
    )
    cols = ["day_start", "event_type", "n_events", "n_hours"]
    assert _rows(out.select(cols), cols) == _rows(closed, cols)
    assert out.count() > 0


def test_streaming_cms_matches_batch_sketch(spark, events_stream):
    """The stream-maintained count-min sketch must be IDENTICAL to the
    batch-built sketch over the same data (mergeable-sketch property:
    micro-batch partials combine to the exact grid), and its state key
    domain is depth*width-bounded by construction."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        CMS_D,
        CMS_W,
        cms_cells,
        cms_estimate,
        streaming_cms,
    )

    out = run_to_memory(
        streaming_cms(events_stream, "event_type"), "t_cms", spark
    )
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = (
        cms_cells(batch, "event_type")
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(out, ["depth", "cell", "n"]) == _rows(
        expected, ["depth", "cell", "n"]
    )
    assert out.count() <= CMS_D * CMS_W

    # point estimates from the streamed sketch >= exact counts
    probes = batch.select("event_type").distinct()
    est = {
        r["event_type"]: r["n_est"]
        for r in cms_estimate(out, probes, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["cnt"]
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_streaming_bloom_matches_batch_and_probes(spark, events_stream):
    """The stream-maintained Bloom bit set must be IDENTICAL to the
    batch-built set over the same data, its state key domain is
    m-bounded by construction, and probes obey the Bloom contract: a
    seen key is ALWAYS maybe_member; an unseen key returns a row
    (not silently dropped) and — at this fill factor — false."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        BLOOM_M,
        bloom_bits,
        bloom_probe,
        streaming_bloom,
    )

    out = run_to_memory(
        streaming_bloom(events_stream, "event_type"), "t_bloom", spark
    )
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = (
        bloom_bits(batch, "event_type")
        .groupBy("bit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(out, ["bit", "n"]) == _rows(expected, ["bit", "n"])
    assert out.count() <= BLOOM_M

    probes = batch.select("event_type").distinct().union(
        spark.createDataFrame([("never-seen-type-zzz",)], ["event_type"])
    )
    got = {
        r["event_type"]: r["maybe_member"]
        for r in bloom_probe(out, probes, "event_type").collect()
    }
    assert "never-seen-type-zzz" in got
    # 5 event types x 3 bits over 2^16 positions: the unseen key's 3
    # bits all colliding is ~(15/65536)^3 — deterministic md5, so this
    # either always passes or the constants changed
    assert got["never-seen-type-zzz"] is False
    for r in batch.select("event_type").distinct().collect():
        assert got[r["event_type"]] is True


def test_streaming_hll_matches_batch_and_estimates(spark, events_stream):
    """The stream-maintained HLL registers must be IDENTICAL to the
    batch-built registers (max is the merge operator, so micro-batch
    partials combine exactly), the state is m-bounded, and the
    cardinality estimate lands within HLL's accuracy envelope of the
    exact distinct count."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        HLL_M,
        hll_estimate,
        hll_registers,
        streaming_hll,
    )

    stream_keyed = events_stream.selectExpr("CAST(user_id AS STRING) AS k")
    out = run_to_memory(streaming_hll(stream_keyed, "k"), "t_hll", spark)
    batch = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "CAST(user_id AS STRING) AS k"
    )
    expected = (
        hll_registers(batch, "k").groupBy("register").agg(F.max("rho").alias("rho"))
    )
    assert _rows(out, ["register", "rho"]) == _rows(expected, ["register", "rho"])
    assert out.count() <= HLL_M

    est = hll_estimate(out).collect()[0]["estimate"]
    exact = batch.distinct().count()
    # m = 1024 -> ~3.25% standard error; allow 4 sigma
    assert abs(est - exact) / exact < 0.13


def test_sketch_consumers_tolerate_accumulated_update_sinks(spark):
    """An update-mode sink accumulates one row per (key, micro-batch).
    bloom_probe and hll_estimate must reduce that to the latest/merged
    state instead of fanning out duplicate rows or miscounting
    registers."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        bloom_bits,
        bloom_probe,
        hll_estimate,
        hll_registers,
    )

    seen = spark.createDataFrame([("a",), ("b",)], ["k"])
    bits_once = (
        bloom_bits(seen, "k").groupBy("bit").agg(F.count(F.lit(1)).alias("n"))
    )
    # simulate 3 micro-batch rows per bit
    bits_acc = bits_once.union(bits_once).union(bits_once)
    probes = spark.createDataFrame([("a",), ("zz-unseen",)], ["k"])
    rows = bloom_probe(bits_acc, probes, "k").collect()
    assert len(rows) == 2  # one row per probe, no t^k fan-out
    got = {r["k"]: r["maybe_member"] for r in rows}
    assert got["a"] is True and got["zz-unseen"] is False

    regs_once = (
        hll_registers(seen, "k").groupBy("register").agg(F.max("rho").alias("rho"))
    )
    regs_acc = regs_once.union(regs_once).union(regs_once)
    est_once = hll_estimate(regs_once).collect()[0]
    est_acc = hll_estimate(regs_acc).collect()[0]
    assert est_once == est_acc


def test_cms_estimate_unseen_probe_returns_zero(spark):
    """A probe key absent from the stream must still produce a row: its
    untouched cells coalesce to 0, so the min-over-depths estimate is 0
    (or a small collision count), never a silently dropped row."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        cms_cells,
        cms_estimate,
    )

    seen = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    cells = (
        cms_cells(seen, "k")
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probes = spark.createDataFrame(
        [("a",), ("never-seen-key-xyz",)], ["k"]
    )
    est = {r["k"]: r["n_est"] for r in cms_estimate(cells, probes, "k").collect()}
    assert set(est) == {"a", "never-seen-key-xyz"}
    assert est["a"] >= 2
    # 3 independent 8-hex-digit hashes over a 2-key stream: a collision in
    # every depth is ~impossible, so the unseen key estimates exactly 0
    assert est["never-seen-key-xyz"] == 0


@pytest.fixture(scope="module")
def events_split_dir(spark, tmp_path_factory):
    """Events split into 4 part files so maxFilesPerTrigger=1 forces
    FOUR micro-batches — the digest must fold across all of them."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_split")
    t = pq.read_table(f"{SF}/events.parquet")
    n = t.num_rows
    step = (n + 3) // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step), str(d / f"part{i}.parquet"))
    return str(d)


def test_streaming_digest_matches_batch_across_microbatches(
    spark, events_split_dir
):
    """The stream-maintained XOR digest over four forced micro-batches
    must equal the batch digest of the same rows (and the batch
    content_fingerprint_audit's digest_full on the same column set) —
    the incremental-verification contract with single-row state."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        digest_rows,
        streaming_digest,
    )
    from ra2_datalake_linaresjoan_spark.streaming.windows import (
        read_events_stream,
    )

    stream = read_events_stream(
        spark, events_split_dir, max_files_per_trigger=1
    )
    cols = ("event_id", "event_type")
    out = run_to_memory(
        streaming_digest(stream, *cols), "t_digest", spark
    ).collect()
    assert len(out) == 1  # single-row state by construction
    batch = spark.read.parquet(events_split_dir)
    want = (
        digest_rows(batch, *cols)
        .agg(F.expr("bit_xor(h)").alias("digest"), F.count(F.lit(1)).alias("n_rows"))
        .collect()[0]
    )
    assert out[0]["digest"] == want["digest"]
    assert out[0]["n_rows"] == want["n_rows"]


def test_streaming_quantile_hist_matches_batch_and_bounds_error(
    spark, events_split_dir
):
    """The stream-maintained equi-width quantile histogram over four
    forced micro-batches must equal the batch histogram bucket-for-bucket
    (the mergeable-sketch property), and its nearest-rank quantile
    estimates must sit within ONE bucket width of the exact nearest-rank
    percentiles — the sketch's whole error contract."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        QH_BUCKETS,
        quantile_estimate,
        quantile_hist,
        streaming_quantile_hist,
    )
    from ra2_datalake_linaresjoan_spark.streaming.windows import (
        read_events_stream,
    )

    lo, hi = 0.0, 500.0
    stream = read_events_stream(
        spark, events_split_dir, max_files_per_trigger=1
    )
    out = run_to_memory(
        streaming_quantile_hist(stream, "value", lo, hi), "t_qhist", spark
    )
    batch = spark.read.parquet(events_split_dir)
    want = quantile_hist(batch, "value", lo, hi)
    got_rows = {r["bucket"]: r["n"] for r in out.collect()}
    want_rows = {r["bucket"]: r["n"] for r in want.collect()}
    assert got_rows == want_rows
    assert len(got_rows) <= QH_BUCKETS  # state bounded by construction

    qs = (0.05, 0.25, 0.5, 0.75, 0.95)
    ests = {
        r["q"]: r["est"]
        for r in quantile_estimate(want, qs, lo, hi).collect()
    }
    vals = sorted(r["value"] for r in batch.select("value").collect())
    n = len(vals)
    width = (hi - lo) / QH_BUCKETS
    for q in qs:
        import math

        exact = vals[max(0, math.ceil(q * n) - 1)]  # nearest-rank
        assert abs(ests[q] - exact) <= width + 1e-9, (q, ests[q], exact)


def test_quantile_hist_degenerate_inputs(spark):
    """Out-of-domain values clamp into the edge buckets, NULLs are
    dropped explicitly (not silently bucketed at 0 by null-skipping
    greatest()), and an EMPTY histogram yields zero estimate rows rather
    than throwing — the degenerate-partition contract."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        QH_BUCKETS,
        quantile_estimate,
        quantile_hist,
    )

    vals = spark.createDataFrame(
        [(-5.0,), (0.0,), (499.9,), (777.0,), (None,)], ["v"]
    )
    h = {r["bucket"]: r["n"] for r in
         quantile_hist(vals, "v", 0.0, 500.0).collect()}
    assert h[0] == 2  # -5.0 clamped down + 0.0
    assert h[QH_BUCKETS - 1] == 2  # 499.9 in last bucket + 777.0 clamped up
    assert sum(h.values()) == 4  # the NULL is DROPPED, not bucketed at 0

    empty = spark.createDataFrame([], "v double")
    eh = quantile_hist(empty, "v", 0.0, 500.0)
    assert quantile_estimate(eh, (0.5,), 0.0, 500.0).count() == 0


def test_rocksdb_state_store_quantile_hist_equals_batch(
    spark, events_split_dir
):
    """The quantile-histogram state store (the fifth sketch) must also
    maintain under the RocksDB provider across forced micro-batches and
    match the batch histogram bucket-for-bucket — the provider a
    1000-executor deployment runs so the 256-key sketch state lives on
    local SSD, not the JVM heap."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        quantile_hist,
        streaming_quantile_hist,
    )
    from ra2_datalake_linaresjoan_spark.streaming.windows import (
        read_events_stream,
    )

    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        stream = read_events_stream(
            spark, events_split_dir, max_files_per_trigger=1
        )
        try:
            out = run_to_memory(
                streaming_quantile_hist(stream, "value", 0.0, 500.0),
                "t_qhist_rocks",
                spark,
            )
        except Exception as exc:  # pragma: no cover — env-dependent
            pytest.skip(f"RocksDB state store unavailable: {exc}")
        batch = spark.read.parquet(events_split_dir)
        want = quantile_hist(batch, "value", 0.0, 500.0)
        assert {r["bucket"]: r["n"] for r in out.collect()} == {
            r["bucket"]: r["n"] for r in want.collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_row_digest_distinguishes_null_placement_and_delimiters(spark):
    """The integrity digest must see ('x', NULL, 'y') and ('x', 'y',
    NULL) as DIFFERENT rows (concat_ws skipped nulls and hashed both to
    'x:y'), and a value containing the old delimiter must not collide
    with the two-column split of itself."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import digest_rows

    df = spark.createDataFrame(
        [("x", None, "y"), ("x", "y", None), ("x:y", None, None)],
        "a string, b string, c string",
    )
    hs = [r["h"] for r in digest_rows(df, "a", "b", "c").collect()]
    assert len(set(hs)) == 3, f"digest collision: {hs}"
