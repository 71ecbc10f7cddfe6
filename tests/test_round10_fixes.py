"""Round-10 contract pins: the round-9 advisor fixes (ragged-vector
strategy agreement in the cosine paths, the SCD2 tiebreak sentinel) and
the perf-rewrite parity invariants (exact_dedup window shape, the
driver-side MMR greedy, the one-pass IVF-PQ quantization kernel).

Each test pins a behavior the oracle gate alone cannot see (degenerate
inputs the testdata lacks, or cross-strategy agreement inside ONE
engine).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# similarity: ragged-length vectors must not flip behavior by strategy
# ---------------------------------------------------------------------------

_RAGGED = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),  # ragged: len 4
    (4, [0.1, 0.9, 0.0, 0.0]),  # ragged: len 4 — pairs with 3 only
    (5, None),
    (6, [0.5, None, 0.5]),  # interior NULL
    (7, [0.0, 0.0, 0.0]),  # zero norm
    (None, [1.0, 1.0, 1.0]),  # NULL id
]


def _ragged_df(spark):
    return spark.createDataFrame(
        _RAGGED, "vec_id long, embedding array<double>"
    )


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t))
    )


def test_cosine_topk_numpy_matches_expr_on_ragged_corpus(spark):
    """round-9 advisor (medium): np.array on a mixed-length corpus used
    to raise ValueError under method='numpy' while method='expr'
    silently NULL-dropped the mixed pairs — auto-strategy behavior
    flipped with corpus size. Per-length matrices must agree with the
    expr path exactly, including the cross-length pair drops."""
    from ra2_datalake_linaresjoan_spark.llmdata.similarity import cosine_topk

    df = _ragged_df(spark)
    got_np = _rows(cosine_topk(df, df, k=3, method="numpy"))
    got_expr = _rows(cosine_topk(df, df, k=3, method="expr"))
    assert got_np == got_expr
    # the len-4 vectors must still find EACH OTHER (same-length pair)
    qids = {t[0] for t in got_np}
    assert 3 in qids and 4 in qids


def test_cosine_neardup_numpy_matches_expr_on_ragged_corpus(spark):
    from ra2_datalake_linaresjoan_spark.llmdata.similarity import (
        cosine_neardup_pairs,
    )

    df = _ragged_df(spark)
    got_np = _rows(cosine_neardup_pairs(df, threshold=0.8, method="numpy"))
    got_expr = _rows(cosine_neardup_pairs(df, threshold=0.8, method="expr"))
    assert got_np == got_expr
    # both same-length near-dup pairs survive, no cross-length pair does
    pairs = {(t[0], t[1]) for t in got_np}
    assert (1, 2) in pairs and (3, 4) in pairs
    assert all(
        not ((a in (1, 2)) and (b in (3, 4))) for a, b in pairs
    )


# ---------------------------------------------------------------------------
# scd2_apply: tiebreak sentinel must sit below the whole long domain
# ---------------------------------------------------------------------------


def test_scd2_apply_open_episode_wins_negative_tiebreaks(spark):
    """round-9 advisor (low): the old -1 sentinel lost to a batch row
    carrying a NEGATIVE tiebreak at the open episode's valid_from,
    breaking scd2_apply(scd2_history(b1), b2) == scd2_history(b1 ∪ b2).
    The typed-NULL sentinel (asc = NULLS FIRST) restores the equality for any real
    tiebreak domain."""
    import datetime

    from ra2_datalake_linaresjoan_spark.operators.scd2 import (
        scd2_apply,
        scd2_history,
    )

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 2)
    b1 = spark.createDataFrame(
        [(1, "a", t0, -7), (1, "b", t1, -6)],
        "k long, state string, ts timestamp, seq long",
    )
    # same timestamp as the open episode's valid_from, NEGATIVE seq
    # that is still ABOVE the prior rows' (arrival order holds)
    b2 = spark.createDataFrame(
        [(1, "c", t1, -5)], "k long, state string, ts timestamp, seq long"
    )
    inc = scd2_apply(
        scd2_history(b1, "k", "state", "ts", "seq"),
        b2,
        "k",
        "state",
        "ts",
        "seq",
    )
    full = scd2_history(b1.unionByName(b2), "k", "state", "ts", "seq")
    assert _rows(inc) == _rows(full)


# ---------------------------------------------------------------------------
# exact_dedup window shape: NULL contract unchanged by the r10 rewrite
# ---------------------------------------------------------------------------


def test_exact_dedup_null_contract_survives_window_rewrite(spark):
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "Hello!"),
            (2, "hello"),  # normalization dup of 1 — must drop
            (3, None),  # NULL text passes through
            (4, None),  # ... every one of them
            (None, "hello"),  # NULL id passes through
            (5, "unique"),
        ],
        "doc_id long, text string",
    )
    got = exact_dedup(df, "doc_id", "text")
    ids = sorted(str(r["doc_id"]) for r in got.collect())
    assert ids == ["1", "3", "4", "5", "None"]


# ---------------------------------------------------------------------------
# ivfpq quantization kernel: floor(y+0.5) == engine HALF_UP on the domain
# ---------------------------------------------------------------------------


def test_ivfpq_quantization_matches_spark_round(spark):
    """The numpy kernel quantizes with floor(acc*1e6 + 0.5); Spark used
    F.round(acc*1e6) (HALF_UP). Pin agreement on a value grid that
    includes exact .5 fractions."""
    import numpy as np

    vals = [0.0, 1e-7, 4.9999995e-7, 5.000001e-7, 0.25, 1.0 / 3.0, 2.5e-6]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r["y"]
        for r in df.select(
            F.round(F.col("x") * 1_000_000).cast("long").alias("y")
        ).collect()
    ]
    got_np = [
        int(np.floor(np.float64(v) * 1_000_000 + 0.5)) for v in vals
    ]
    assert got_spark == got_np


# ---------------------------------------------------------------------------
# streaming SCD2 sink: a REAL availableNow stream == one-shot rebuild
# ---------------------------------------------------------------------------


def test_scd2_stream_sink_equals_batch_rebuild(spark, tmp_path):
    """Three time-ordered chunk files stream through scd2_stream_sink
    (maxFilesPerTrigger=1, availableNow): the at-rest episodes table
    must equal the one-shot scd2_history over the whole feed."""
    import os
    import time

    from ra2_datalake_linaresjoan_spark.operators.scd2 import scd2_history
    from ra2_datalake_linaresjoan_spark.queries import _events
    from ra2_datalake_linaresjoan_spark.streaming.scd2_sink import (
        scd2_stream_sink,
    )
    from ra2_datalake_linaresjoan_spark.streaming.windows import (
        read_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    cols = ["user_id", "event_type", "ts", "event_id"]
    ev = (
        _events(spark, sf)
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(*cols)
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    n = len(rows)
    src = tmp_path / "feed"
    src.mkdir()
    # CDC arrival order: chunk k holds the k-th time tercile; distinct
    # mtimes make the file source process them in arrival order
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = spark.createDataFrame(
            rows[lo : lo + (n + 2) // 3], ev.schema
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            p
            for p in os.listdir(tmp_path / f"stage{i}")
            if p.endswith(".parquet")
        )
        os.rename(tmp_path / f"stage{i}" / part, src / f"chunk{i}.parquet")
        time.sleep(1.1)

    out = str(tmp_path / "episodes")
    q = scd2_stream_sink(
        read_events_stream(spark, str(src), max_files_per_trigger=1).select(
            *cols
        ),
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        key="user_id",
        state="event_type",
        ts="ts",
        tiebreak="event_id",
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    want = scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    assert _rows(got) == _rows(want)
    # and the stream really ran more than one epoch
    assert got.count() > 0


def test_scd2_apply_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an epoch (same
    batch, same epoch_id) must NOT re-apply it — the round-10 review
    showed a re-applied batch duplicates closed episodes. The batchId
    marker skips replays; a HIGHER epoch still applies."""
    import datetime

    from ra2_datalake_linaresjoan_spark.streaming.scd2_sink import (
        scd2_apply_epoch,
    )

    path = str(tmp_path / "episodes")
    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    b0 = spark.createDataFrame(
        [(1, "a", t(1), 0), (1, "b", t(2), 1)],
        "k long, state string, ts timestamp, seq long",
    )
    b1 = spark.createDataFrame(
        [(1, "c", t(3), 2)], "k long, state string, ts timestamp, seq long"
    )
    args = ("k", "state", "ts", "seq")
    scd2_apply_epoch(spark, path, b0, *args, epoch_id=0)
    first = _rows(spark.read.parquet(path))
    assert len(first) == 2
    # replay of epoch 0: table must be byte-identical (no duplicates)
    scd2_apply_epoch(spark, path, b0, *args, epoch_id=0)
    assert _rows(spark.read.parquet(path)) == first
    # a NEW epoch still applies
    scd2_apply_epoch(spark, path, b1, *args, epoch_id=1)
    assert len(_rows(spark.read.parquet(path))) == 3
    # and replaying it is again a no-op
    scd2_apply_epoch(spark, path, b1, *args, epoch_id=1)
    assert len(_rows(spark.read.parquet(path))) == 3


# ---------------------------------------------------------------------------
# second review pass: scd2 complete-case equality, typed sentinel,
# fk_resolve fan-out guard, interval_join collision guard
# ---------------------------------------------------------------------------


def test_scd2_null_state_rows_dropped_in_lockstep(spark):
    """A NULL-state change row used to be dropped by the one-shot
    builder's prev != state filter but its SUCCESSOR was kept (lag saw
    NULL), while the incremental path never saw the NULL row — the
    documented apply == rebuild equality broke on dirty feeds. The
    shared complete-case guard drops such rows in BOTH builders."""
    import datetime

    from ra2_datalake_linaresjoan_spark.operators.scd2 import (
        scd2_apply,
        scd2_history,
    )

    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    feed = [(1, "A", t(1), 1), (1, None, t(2), 2), (1, "A", t(3), 3)]
    schema = "k long, state string, ts timestamp, seq long"
    full = scd2_history(spark.createDataFrame(feed, schema), "k", "state", "ts", "seq")
    b1 = spark.createDataFrame(feed[:2], schema)
    b2 = spark.createDataFrame(feed[2:], schema)
    inc = scd2_apply(
        scd2_history(b1, "k", "state", "ts", "seq"), b2, "k", "state", "ts", "seq"
    )
    assert _rows(inc) == _rows(full)
    # the NULL-state row creates no episode: one open A episode
    assert len(_rows(full)) == 1


def test_scd2_apply_string_tiebreaks(spark):
    """The r9 sentinel cast the batch tiebreak to long, silently
    NULLing string CDC ids (which then sorted BEFORE the sentinel).
    The typed-NULL sentinel keeps any orderable tiebreak domain."""
    import datetime

    from ra2_datalake_linaresjoan_spark.operators.scd2 import (
        scd2_apply,
        scd2_history,
    )

    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    schema = "k long, state string, ts timestamp, seq string"
    b1 = spark.createDataFrame([(1, "a", t(1), "s01"), (1, "b", t(2), "s02")], schema)
    # same-timestamp row with a HIGHER string tiebreak (arrival order)
    b2 = spark.createDataFrame([(1, "c", t(2), "s03")], schema)
    inc = scd2_apply(
        scd2_history(b1, "k", "state", "ts", "seq"), b2, "k", "state", "ts", "seq"
    )
    full = scd2_history(b1.unionByName(b2), "k", "state", "ts", "seq")
    assert _rows(inc) == _rows(full)
    assert len(_rows(full)) == 3


def test_fk_resolve_duplicate_dim_keys_do_not_fan_out(spark):
    from ra2_datalake_linaresjoan_spark.operators.joins import fk_resolve

    fact = spark.createDataFrame([(1, "X"), (2, "Y")], "fid long, game string")
    dim = spark.createDataFrame(
        [("X", 10), ("X", 11), ("Y", 20)], "name string, game_id long"
    )
    out = fk_resolve(fact, dim, "game", "name", "game_id", "rid")
    rows = {(r["fid"], r["rid"]) for r in out.collect()}
    assert out.count() == 2  # no fan-out
    assert rows == {(1, 10), (2, 20)}  # deterministic min surrogate


def test_interval_join_rejects_colliding_right_cols(spark):
    import datetime

    import pytest as _pytest

    from ra2_datalake_linaresjoan_spark.operators.rangejoin import interval_join

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, 5.0)], "user_id long, ts timestamp, value double")
    right = spark.createDataFrame([(1, t, 7.0)], "user_id long, rts timestamp, value double")
    with _pytest.raises(ValueError, match="collide"):
        interval_join(left, right, by="user_id", left_on="ts", right_on="rts",
                      window_seconds=60, right_cols=["value"])
