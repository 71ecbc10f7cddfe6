"""Streaming sketch maintenance: count-min, Bloom, HyperLogLog, an XOR
content digest, and an equi-width quantile histogram — each kept up to
date by Structured Streaming's own aggregation state store.

The trick that makes this scale-safe: every sketch here is a fixed grid
of counters/bits/registers, and streaming aggregation state is keyed
storage — so keying the running aggregate by (depth, cell) / bit
position / register / bucket makes the state store ITSELF the sketch,
bounded at D·W (resp. m / registers / buckets; the digest is ONE row) no
matter how many events flow through.
No watermark is needed for state-size control (the classic unbounded-
keys hazard of complete/update aggregations does not apply when the key
domain is hash-bounded); output mode ``update`` emits only touched
cells per micro-batch.

Batch parity: the same cell expression over a batch frame produces the
identical sketch (asserted in ``tests/test_streaming.py``), so the batch
``cms_heavy_hitters`` audit can read a sketch a stream maintained — the
mergeable-sketch property that lets ingest and analytics share one
structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_W = 1024
CMS_D = 3


def _cell(col: Column, depth: int, width: int = CMS_W) -> Column:
    """Engine-portable hash row: md5 hex slice ``depth`` mod width (the
    same family bloom_dedup / cms_heavy_hitters use). md5 yields exactly
    FOUR 8-hex slices — depth >= 4 would substring past the digest, conv
    would return NULL and the whole sketch row silently collapses into
    one NULL cell (the same hazard ``_bloom_bit_positions`` guards)."""
    if depth >= 4:
        raise ValueError(
            "CMS depth index %d needs md5 slice %d, but md5 has only 4 "
            "8-hex slices (depth <= 4 rows total)" % (depth, depth)
        )
    return (
        F.conv(F.substring(F.md5(col), 1 + 8 * depth, 8), 16, 10).cast("long")
        % width
    )


def cms_cells(df: DataFrame, key_col: str, width: int = CMS_W, depth: int = CMS_D) -> DataFrame:
    """Explode each row into its ``depth`` (depth, cell) sketch
    increments. Works identically on batch and streaming frames."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"), _cell(F.col(key_col), j, width).alias("cell")
            )
            for j in range(depth)
        ]
    )
    return df.select(F.explode(rows).alias("dc")).select("dc.depth", "dc.cell")


def streaming_cms(
    stream: DataFrame, key_col: str, width: int = CMS_W, depth: int = CMS_D
) -> DataFrame:
    """Running count-min sketch over a stream: groupBy (depth, cell)
    running counts — state bounded at depth·width keys by construction.
    Pair with ``outputMode("update")`` (or complete for full-sketch
    snapshots to a memory sink)."""
    return (
        cms_cells(stream, key_col, width, depth)
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


BLOOM_M = 65536
BLOOM_K = 3


def _bloom_bit_positions(key_col: str, m: int, k: int) -> list:
    """The ``k`` Bloom bit-position expressions for a key (8-hex-char md5
    slices mod m). Shared by builder AND prober so the hash family can
    never drift between them. md5 yields exactly four 8-hex words, so
    k ≤ 4 is enforced here for both sides — a 5th slice would be the
    empty string, conv to NULL, and silently turn every probe into a
    false negative."""
    if k > 4:
        raise ValueError(
            f"bloom k={k} exceeds the 4 independent 8-hex md5 slices — "
            "re-hash with per-j salts if more hash functions are needed"
        )
    return [
        F.conv(F.substring(F.md5(F.col(key_col)), 1 + 8 * j, 8), 16, 10)
        .cast("long")
        % m
        for j in range(k)
    ]


def bloom_bits(df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Explode each row into its ``k`` Bloom bit positions (8-hex-char
    md5 slices mod m — the same family ``bloom_dedup`` uses). Works
    identically on batch and streaming frames."""
    return df.select(
        F.explode(F.array(*_bloom_bit_positions(key_col, m, k))).alias("bit")
    )


def streaming_bloom(
    stream: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Running Bloom filter over a stream: groupBy bit position — the
    aggregation state store IS the bit set, bounded at m keys by
    construction (the same hash-bounded-key-domain trick as
    ``streaming_cms``; no watermark needed). Output mode ``update``
    emits only newly-touched/incremented bits per micro-batch; the
    accumulated (bit, n) table is the standing-corpus membership state
    an incremental-ingest dedup consults."""
    return (
        bloom_bits(stream, key_col, m, k)
        .groupBy("bit")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bloom_probe(bits: DataFrame, probes: DataFrame, key_col: str,
                m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Membership probes against a materialized bit set: a key is a
    maybe-member iff ALL k of its bits are present. Left joins with a
    presence-coalesce per bit — a probe whose bits were never touched
    still returns a row (``maybe_member = false``), the same
    unseen-key contract as ``cms_estimate``. The bit table is reduced
    to distinct positions first, so an ACCUMULATED update-mode sink
    (one row per (bit, micro-batch)) probes correctly instead of
    fanning out t^k duplicate rows per key."""
    bits = bits.select("bit").distinct()
    probe_bits = probes.select(
        key_col,
        *[
            pos.alias(f"b{j}")
            for j, pos in enumerate(_bloom_bit_positions(key_col, m, k))
        ],
    )
    est = probe_bits
    for j in range(k):
        bj = bits.select(F.col("bit").alias(f"b{j}"), F.lit(True).alias(f"hit{j}"))
        est = est.join(F.broadcast(bj), f"b{j}", "left")
    all_hit = F.lit(True)
    for j in range(k):
        all_hit = all_hit & F.coalesce(F.col(f"hit{j}"), F.lit(False))
    return est.select(key_col, all_hit.alias("maybe_member"))


HLL_M = 1024  # registers (b = 10 index bits)


def hll_registers(df: DataFrame, key_col: str, m: int = HLL_M) -> DataFrame:
    """Explode each row into its HLL (register, rho) observation:
    register = first md5 word mod m, rho = leading-zero count of the
    second 32-bit md5 word + 1 (computed EXACTLY via the length of the
    binary string — no float log2 at bucket boundaries). Works
    identically on batch and streaming frames; aggregate with
    ``max(rho)`` per register."""
    h1 = F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10).cast("long")
    w = F.conv(F.substring(F.md5(F.col(key_col)), 9, 8), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(33)).otherwise(33 - F.length(F.bin(w)))
    return df.select((h1 % m).alias("register"), rho.cast("int").alias("rho"))


def streaming_hll(
    stream: DataFrame, key_col: str, m: int = HLL_M
) -> DataFrame:
    """Running HyperLogLog over a stream: groupBy register with a MAX
    aggregate — the state store is the register array, bounded at m
    keys by construction (the third member of the hash-bounded sketch
    family, after the CMS grid and the Bloom bit set). max() is the
    HLL merge operator, so micro-batch partials combine exactly."""
    return (
        hll_registers(stream, key_col, m)
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """Cardinality estimate from a materialized register table (missing
    registers count as rho = 0), with the standard small-range
    linear-counting correction. One row: n_registers_set, estimate.
    The input reduces to max(rho) per register first, so an ACCUMULATED
    update-mode sink (one row per (register, micro-batch)) estimates
    correctly — max is the HLL merge, so re-merging is free."""
    registers = registers.groupBy("register").agg(F.max("rho").alias("rho"))
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_set"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)).alias(
            "s_set"
        ),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = F.lit(m) - F.col("n_set")
    s = F.col("s_set") + zeros  # absent registers contribute 2^0 = 1
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.col("n_set").alias("n_registers_set"),
        F.round(est, 2).alias("estimate"),
    )


def cms_estimate(cells: DataFrame, probes: DataFrame, key_col: str,
                 width: int = CMS_W, depth: int = CMS_D) -> DataFrame:
    """Point-estimate lookups against a materialized sketch: min over
    depth rows of the probed cells. ``cells`` is ≤ depth·width rows and
    broadcasts; output one row per probe key.

    Left joins with a 0-coalesce per depth: a probe key hashing to a
    cell the sketch never touched (a never-seen key, or a partial
    update-mode snapshot) still returns a row — its missing cell
    contributes count 0, so ``least`` yields the correct CMS estimate
    (0 for fully unseen keys) instead of the row silently vanishing
    from an inner join. The cells table is re-merged to max(n) per
    (depth, cell) first — running totals from an ACCUMULATED update-mode
    sink (one row per cell per micro-batch) would otherwise fan out the
    per-depth joins and pair stale partial counts into the min."""
    cells = cells.groupBy("depth", "cell").agg(F.max("n").alias("n"))
    probe_cells = probes.select(
        key_col,
        *[_cell(F.col(key_col), j, width).alias(f"c{j}") for j in range(depth)],
    )
    est = probe_cells
    for j in range(depth):
        cj = cells.filter(F.col("depth") == j).select(
            F.col("cell").alias(f"c{j}"), F.col("n").alias(f"n{j}")
        )
        est = est.join(F.broadcast(cj), f"c{j}", "left")
    return est.select(
        key_col,
        F.least(
            *[F.coalesce(F.col(f"n{j}"), F.lit(0)) for j in range(depth)]
        ).alias("n_est"),
    )


# ---------------------------------------------------------------------------
# Streaming XOR content digest — incremental table-integrity maintenance
# ---------------------------------------------------------------------------


def row_digest_col(*cols) -> Column:
    """60-bit md5 row digest over the given columns (Column expression;
    15 hex chars keep the value positive in a BIGINT).

    Serialization is collision-hardened: each column contributes a
    FIXED-WIDTH token — ``'n'`` for NULL, ``'v' + md5(value)``
    otherwise — so an integrity digest distinguishes ('x', NULL, 'y')
    from ('x', 'y', NULL) (a plain ``concat_ws`` SKIPS nulls and both
    rows serialize identically) and no value can inject the delimiter
    (``('x:y', NULL)`` vs ``('x', 'y')``). The same per-column
    CASE/md5 construction runs verbatim in the DuckDB oracle."""
    tokens = [
        F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
        )
        if isinstance(c, str)
        else F.when(c.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.md5(c.cast("string")))
        )
        for c in cols
    ]
    return (
        F.conv(F.substring(F.md5(F.concat(*tokens)), 1, 15), 16, 10)
        .cast("long")
    )


def digest_rows(df: DataFrame, *cols: str) -> DataFrame:
    """60-bit md5 row digests over the given columns — the row-hash
    shared with the batch ``content_fingerprint_audit``
    (queries_ext36). Works identically on batch and streaming frames."""
    return df.select(row_digest_col(*cols).alias("h"))


def streaming_digest(stream: DataFrame, *cols: str) -> DataFrame:
    """Running XOR content digest over a stream: one global aggregate
    whose state is a SINGLE row (digest, n_rows) no matter how much
    data flows — XOR partials from every micro-batch fold in exactly
    (commutative, associative, subtractive), so the maintained digest
    always equals the batch digest of everything ingested so far.
    This is the streaming half of the incremental-verification
    contract ``digest(full) == digest(base) XOR digest(delta)``:
    a nightly verifier compares this running digest against the
    batch-computed one without re-reading history. Pair with
    ``outputMode("complete")`` (1-row result table)."""
    return digest_rows(stream, *cols).agg(
        F.expr("bit_xor(h)").alias("digest"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Streaming quantile histogram — mergeable equi-width bucket sketch
# ---------------------------------------------------------------------------

QH_BUCKETS = 256


def quantile_bucket(value_col: str, lo: float, hi: float,
                    buckets: int = QH_BUCKETS) -> Column:
    """Equi-width bucket index for a NON-NULL value over a FIXED
    [lo, hi) domain (production gets the domain from table statistics);
    out-of-domain values clamp into the edge buckets so the sketch
    never drops in-domain rows (callers filter NULLs — see
    ``quantile_hist``). Identical expression on batch and streaming
    frames — and trivially engine-portable (the DuckDB side is the same
    floor/clamp arithmetic)."""
    raw = F.floor(
        (F.col(value_col) - F.lit(lo)) * buckets / F.lit(hi - lo)
    )
    return F.least(
        F.lit(buckets - 1), F.greatest(F.lit(0), raw)
    ).cast("int")


def quantile_hist(df: DataFrame, value_col: str, lo: float, hi: float,
                  buckets: int = QH_BUCKETS) -> DataFrame:
    """Per-bucket counts — the whole sketch. Mergeable by construction:
    hist(A ∪ B) is the per-bucket SUM of hist(A) and hist(B), which is
    exactly the partial-aggregate combine Spark already performs, so the
    same call distributes over any partitioning and any micro-batch
    split. NULL values are dropped EXPLICITLY — without the filter,
    Spark's null-skipping ``greatest(0, NULL)`` would silently count
    every NULL row in bucket 0 (and a NULL-ordering divergence between
    engines would poison any oracle comparison downstream)."""
    return (
        df.where(F.col(value_col).isNotNull())
        .select(quantile_bucket(value_col, lo, hi, buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_quantile_hist(stream: DataFrame, value_col: str, lo: float,
                            hi: float, buckets: int = QH_BUCKETS) -> DataFrame:
    """Running quantile sketch over a stream: the aggregation state store
    IS the histogram, bounded at ``buckets`` keys no matter how much data
    flows (same hash-bounded-key-domain argument as the CMS/Bloom/HLL
    stores above — no watermark needed). Pair with
    ``outputMode("update")`` or ``complete``."""
    return quantile_hist(stream, value_col, lo, hi, buckets)


def quantile_estimate(hist: DataFrame, qs: tuple[float, ...], lo: float,
                      hi: float, buckets: int = QH_BUCKETS) -> DataFrame:
    """Nearest-rank quantile estimates from the bucket histogram: for each
    q, find the first bucket whose cumulative count reaches
    ``ceil(q · N)`` and report that bucket's UPPER edge. The true
    nearest-rank quantile provably lies inside the reported bucket, so
    the estimate error is at most one bucket width ((hi-lo)/buckets) for
    in-domain data — the contract the parity test asserts. All windows
    run over the ≤``buckets``-row histogram (state-bounded, never
    data-bounded). The histogram is re-merged to max(n) per bucket
    first: an ACCUMULATED update-mode sink holds one row per bucket per
    micro-batch with RUNNING totals, and summing those would inflate
    every cumulative rank (max-of-running-totals is the correct latest
    value, and a no-op on a clean one-row-per-bucket histogram)."""
    from pyspark.sql import Window

    hist = hist.groupBy("bucket").agg(F.max("n").alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket", "n", F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    width = (hi - lo) / buckets
    out = None
    for q in qs:
        # clamp to rank >= 1: q=0 gives ceil(0·N)=0, which every bucket's
        # cum satisfies — bucket 0's upper edge would be reported instead
        # of the minimum, outside the one-bucket-width contract
        rank = F.greatest(
            F.ceil(F.lit(q) * F.col("total")).cast("long"), F.lit(1)
        )
        hit = (
            cum.filter(F.col("cum") >= rank)
            .orderBy("bucket")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


# ---------------------------------------------------------------------------
# KS-style drift between two quantile histograms
# ---------------------------------------------------------------------------


def ks_from_joint(joint: DataFrame) -> DataFrame:
    """One-row KS distance from a JOINT per-bucket count table with
    columns ``(bucket, na, nb)`` — the shared math behind
    ``hist_ks_distance`` (two state-store histograms) and the batch
    ``quantile_drift_detect`` query (one conditional-count scan).

    D = max over bucket edges of |CDF_a − CDF_b|, computed as an
    EXACT-integer rational max |cuma·nb_tot − cumb·na_tot| before the
    single final division (engine-identical; summation-order-free).
    The count products are widened to DECIMAL(38,0) (HUGEINT in the
    DuckDB oracle) so n_a·n_b beyond 2^63 — ~3e9 rows a side, well
    inside the 100-TB envelope — cannot overflow BIGINT; the final
    division is done in double (both engines round the same way at 6
    decimals). The argmax bucket ties to the LOWEST bucket. Every
    window runs over the ≤``QH_BUCKETS``-row joint table —
    state-bounded, never data-bounded. Degenerate sides (an empty
    histogram) yield a NULL ``ks_d`` instead of 0/0."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    tot = joint.agg(
        F.coalesce(F.sum("na"), F.lit(0)).cast(dec).alias("na_tot"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast(dec).alias("nb_tot"),
    )
    cum = joint.select(
        "bucket",
        F.sum("na").over(w).cast(dec).alias("cuma"),
        F.sum("nb").over(w).cast(dec).alias("cumb"),
    ).crossJoin(F.broadcast(tot))
    gap_num = F.abs(
        F.col("cuma") * F.col("nb_tot") - F.col("cumb") * F.col("na_tot")
    )
    best = (
        cum.select("bucket", "na_tot", "nb_tot", gap_num.alias("gnum"))
        .orderBy(F.col("gnum").desc(), "bucket")
        .limit(1)
    )
    return best.select(
        F.col("na_tot").cast("long").alias("n_a"),
        F.col("nb_tot").cast("long").alias("n_b"),
        F.round(
            F.when(
                (F.col("na_tot") != 0) & (F.col("nb_tot") != 0),
                F.col("gnum").cast("double")
                / (F.col("na_tot") * F.col("nb_tot")).cast("double"),
            ),
            6,
        ).alias("ks_d"),
        F.col("bucket").alias("argmax_bucket"),
    )


def hist_ks_distance(hist_a: DataFrame, hist_b: DataFrame) -> DataFrame:
    """KS distance between two ``(bucket, n)`` quantile histograms (the
    state-store output of ``streaming_quantile_hist`` after the
    max-re-merge, or any batch ``quantile_hist``): full-outer join on
    bucket (≤QH_BUCKETS rows a side), then the shared exact-integer
    rational max. Drift detection between a stream's live sketch and a
    frozen reference window costs O(buckets) — never a rescan."""
    a = hist_a.groupBy("bucket").agg(F.max("n").alias("na"))
    b = hist_b.groupBy("bucket").agg(F.max("n").alias("nb"))
    joint = (
        a.join(b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    return ks_from_joint(joint)
