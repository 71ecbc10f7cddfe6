"""LLM-data queries, batch 6 (round 3 continuation): Bloom-filter
pre-dedup, BPE encoding with a merge table, per-source corpus datacards,
and an integer power-iteration PCA.

Scale designs:

- ``bloom_dedup`` is the streaming-ingest pattern for exact dedup at
  100 TB: the standing corpus is summarized as a SET OF BIT POSITIONS
  (k·n ints, thousands of times smaller than the corpus) that
  broadcast-joins against incoming batches; only Bloom *candidates* pay
  the full fingerprint anti-join. The query also quantifies the false-
  positive rate — the quantity that sizes m/k in production.
- ``bpe_encode`` applies a merge table with priority order — the
  tokenizer-apply inner loop (the training-side pair counting is
  ``bpe_pair_merge``). Pure string ``replace`` chains, identical
  left-to-right non-overlapping semantics in both engines.
- ``corpus_datacard`` is the datasheet/data-card generator (docs,
  tokens, languages, dup rate, length stats per source) — one wide
  aggregate per source, the publishing step of every corpus release.
- ``pca_power_iteration`` runs 3 unrolled power-iteration steps of
  x ↦ Xᵀ(Xv) on micro-quantized integer embeddings with integer
  rescaling after each step — every intermediate is an exact BIGINT
  (products bounded: |x|≤525 · |v|≤1024 · dim 64 · n rows ≪ 2^63), so
  the dominant eigenvector direction is bit-identical across engines
  with NO float tolerance. The matrix-vector products are
  join-aggregates (the SpMM pattern); v is a 64-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# bloom_dedup — Bloom-filter membership pre-filter for cross-batch dedup
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 16  # bits
_BLOOM_K = 3  # hash functions (md5 hex slices)


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup audit: the standing corpus publishes its k=3
    bit positions (8-hex-char md5 slices mod 2^16); an incoming batch —
    a re-ingested corpus slice (doc_id ≡ 3 mod 10: true duplicates, the
    at-least-once redelivery case) plus genuinely new perturbed texts
    (doc_id ≡ 7 mod 10, text + " v2") — flags a document as a
    *candidate* duplicate when ALL its positions are set; the exact
    fingerprint join then resolves truth. Reports candidates / true
    duplicates / false positives / the measured FP rate (the quantity
    that sizes m and k in production). Perturbed probes take the
    synthetic id ``-doc_id - 1`` — strictly negative, so it can never
    collide with a redelivered probe's real (non-negative) id at ANY
    corpus scale (an additive offset would collide once doc_id reached
    the offset). The bit table is
    position-distinct (≤ 2^16 rows regardless of corpus size) and
    broadcasts; only candidates reach the exact join — the standing
    corpus is never rescanned per batch."""
    docs = _t(spark, sf_dir, "documents")

    def _pos(df: DataFrame) -> DataFrame:
        return df.withColumns(
            {
                f"p{j}": F.conv(F.substring("h", 1 + 8 * j, 8), 16, 10).cast("long")
                % _BLOOM_M
                for j in range(_BLOOM_K)
            }
        )

    # NULL-text rows drop in lockstep: md5(NULL) is not a filter key and
    # DuckDB's CAST(concat('0x', NULL-md5)) errors where Spark's conv
    # returns NULL
    docs = docs.where(F.col("text").isNotNull())
    # localCheckpoint (round-13, guide §2.4): the md5 digests are the
    # expensive per-row work here, and both digest tables have multiple
    # consumers — corpus h feeds the bit build AND the exact-truth
    # distinct, probes feed the bit probe, the candidate semi-join and
    # the n_probes count.  Without the checkpoints every consumer
    # re-scanned documents and re-hashed the full text (5 corpus md5
    # passes in the audited 555-line plan; 2 after).  Both tables are
    # (id, 32-hex) narrow — the text payload never materializes.
    corpus_h = docs.select(F.md5("text").alias("h")).localCheckpoint()
    corpus = _pos(corpus_h)
    batch = docs.filter(F.col("doc_id") % 10 == 3).select(
        "doc_id", F.col("text").alias("btext")
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 7).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" v2")).alias("btext"),
        )
    )
    probes = _pos(
        batch.select("doc_id", F.md5("btext").alias("h")).localCheckpoint()
    )

    bits = (
        corpus.select(F.explode(F.array(*[F.col(f"p{j}") for j in range(_BLOOM_K)])).alias("bit"))
        .distinct()
    )
    probe_bits = probes.select(
        "doc_id", F.explode(F.array(*[F.col(f"p{j}") for j in range(_BLOOM_K)])).alias("bit")
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("set_bits"))
        .filter(F.col("set_bits") == _BLOOM_K)
        .select("doc_id")
    )
    candidates = probes.join(hits, "doc_id", "left_semi")
    truth = candidates.join(
        corpus.select("h").distinct().withColumn("_m", F.lit(1)),
        "h",
        "left",
    ).select("doc_id", F.col("_m").isNotNull().alias("is_dup"))
    n_probes = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    return (
        truth.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.col("is_dup").cast("long")).alias("n_true_dups"),
            F.sum((~F.col("is_dup")).cast("long")).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_probes))
        .select(
            "n_probes",
            "n_candidates",
            "n_true_dups",
            "n_false_pos",
            F.round(F.col("n_false_pos") / F.col("n_probes"), 6).alias("fp_rate"),
        )
    )


SQL_BLOOM_DEDUP = f"""
WITH corpus AS (
  SELECT md5(text) AS h,
         CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % {_BLOOM_M} AS p0,
         CAST(concat('0x', substr(md5(text), 9, 8)) AS BIGINT) % {_BLOOM_M} AS p1,
         CAST(concat('0x', substr(md5(text), 17, 8)) AS BIGINT) % {_BLOOM_M} AS p2
  FROM documents WHERE text IS NOT NULL
), batch AS (
  SELECT doc_id, text AS btext FROM documents
  WHERE doc_id % 10 = 3 AND text IS NOT NULL
  UNION ALL
  SELECT -doc_id - 1, text || ' v2' FROM documents
  WHERE doc_id % 10 = 7 AND text IS NOT NULL
), probes AS (
  SELECT doc_id, md5(btext) AS h,
         CAST(concat('0x', substr(md5(btext), 1, 8)) AS BIGINT) % {_BLOOM_M} AS p0,
         CAST(concat('0x', substr(md5(btext), 9, 8)) AS BIGINT) % {_BLOOM_M} AS p1,
         CAST(concat('0x', substr(md5(btext), 17, 8)) AS BIGINT) % {_BLOOM_M} AS p2
  FROM batch
), bits AS (
  SELECT DISTINCT bit FROM (SELECT unnest([p0, p1, p2]) AS bit FROM corpus)
), probe_bits AS (
  SELECT doc_id, unnest([p0, p1, p2]) AS bit FROM probes
), hits AS (
  SELECT doc_id FROM probe_bits b JOIN bits USING (bit)
  GROUP BY doc_id HAVING count(*) = {_BLOOM_K}
), cand AS (
  SELECT p.doc_id, p.h FROM probes p JOIN hits USING (doc_id)
), truth AS (
  SELECT c.doc_id, k.h IS NOT NULL AS is_dup
  FROM cand c LEFT JOIN (SELECT DISTINCT h FROM corpus) k
    ON c.h = k.h
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dups,
       CAST(sum(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT) AS n_false_pos,
       round(sum(CASE WHEN is_dup THEN 0 ELSE 1 END)
             / CAST((SELECT count(*) FROM probes) AS DOUBLE), 6) AS fp_rate
FROM truth
"""


# ---------------------------------------------------------------------------
# bpe_encode — apply a BPE merge table (tokenizer-apply inner loop)
# ---------------------------------------------------------------------------

#: Ordered merge table (highest priority first) — the artifact a
#: ``bpe_pair_merge`` training loop would emit for this corpus's
#: spark-flavored vocabulary. Distinct-char pairs keep the left-to-right
#: non-overlapping replace semantics engine-identical.
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "a"),   # ta (table, data)
    ("l", "e"),   # le (table, value)
    ("ta", "b"),  # tab
    ("r", "o"),   # ro (row)
    ("a", "s"),   # as (hash, fast)
)


def bpe_merge_chain(word) -> "F.Column":
    """The 5-rule BPE merge chain as a Column rewrite over one word —
    the SINGLE tokenizer-apply implementation shared by ``bpe_encode``
    and ``tokenizer_fertility`` (queries_llm9 previously carried a
    verbatim copy; a one-sided edit would have silently made the two
    queries tokenize differently while claiming one merge table —
    round-10 review)."""
    s = F.concat(F.regexp_replace(word, "(.)", " $1"), F.lit(" "))
    for a, b in _BPE_MERGES:
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return s


def sql_bpe_chain(col: str = "w") -> str:
    """The identical merge chain in DuckDB SQL (shared, see
    :func:`bpe_merge_chain`)."""
    s = f"regexp_replace({col}, '(.)', ' \\1', 'g') || ' '"
    for a, b in _BPE_MERGES:
        s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return s


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a 5-rule BPE merge table: words become
    space-separated characters, each merge rule rewrites ``" a b "`` →
    ``" ab "`` in priority order, and the surviving symbols are counted.
    Everything is in-row string rewriting over the (word, freq)
    vocabulary aggregate — the corpus shuffle happens ONCE to build the
    vocab (Zipf-shrunk), the merge chain touches only distinct words,
    and symbol counts are freq-weighted. Top-15 symbols by (count desc,
    symbol) is the oracle-pinned output."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    s = bpe_merge_chain(F.col("w"))
    sym = vocab.select(
        "freq", F.explode(F.split(F.trim(s), " ")).alias("symbol")
    ).filter(F.length("symbol") > 0)
    return (
        sym.groupBy("symbol")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "symbol")
        .limit(15)
    )


_sql_bpe_chain = sql_bpe_chain  # legacy local name used below


SQL_BPE_ENCODE = f"""
WITH vocab AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0
  GROUP BY w
), sym AS (
  SELECT freq, unnest(string_split(trim({_sql_bpe_chain()}, ' '), ' ')) AS symbol
  FROM vocab
)
SELECT symbol, CAST(sum(freq) AS BIGINT) AS n
FROM sym WHERE len(symbol) > 0
GROUP BY symbol
ORDER BY n DESC, symbol ASC
LIMIT 15
"""


# ---------------------------------------------------------------------------
# corpus_datacard — per-source datasheet statistics
# ---------------------------------------------------------------------------


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card generator: one row per source with document count,
    whitespace-token total, language breadth, exact-duplicate rate
    (1 − distinct md5 / docs), mean length, and English share — the
    summary table a corpus release publishes. ONE aggregate over one
    scan; the two COUNT(DISTINCT)s share the shuffle via Spark's Expand.
    Ratios are in-row divisions of exact integers, rounded at 6 dp."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            F.sum("n_chars").alias("sum_chars"),
            # when/otherwise(0), not a bare boolean cast: a NULL lang must
            # count as 0 (the oracle's CASE ... ELSE 0), not poison the
            # sum to NULL on an all-NULL group
            F.sum(
                F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long")
            ).alias("n_en"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            F.round(F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
            F.round(F.col("sum_chars") / F.col("n_docs"), 4).alias("mean_chars"),
            F.round(F.col("n_en") / F.col("n_docs"), 6).alias("en_share"),
        )
        .orderBy("source")
    )


SQL_CORPUS_DATACARD = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE), 6)
         AS dup_rate,
       round(sum(n_chars) / CAST(count(*) AS DOUBLE), 4) AS mean_chars,
       round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS en_share
FROM documents
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# pca_power_iteration — integer power iteration for the top component
# ---------------------------------------------------------------------------

_PCA_ITERS = 3
_PCA_VSCALE = 1024


def _pca_join_aggregate(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """The pre-round-13 join-aggregate power iteration, kept VERBATIM as
    the irregular-corpus fallback of ``q_pca_power_iteration`` (see its
    regularity-guard docstring): on corpora with ragged dims, NULL
    elements or NULL ids, this shape's data-dependent join semantics ARE
    the query's (and the oracle's) definition, and the one-scan Gram
    path cannot reproduce them with a fixed 64×64 matrix."""
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "e")
    ).select(
        "vec_id",
        (F.col("dim") + 1).alias("dim"),
        F.round(F.col("e").cast("double") * 1000).cast("long").alias("xv"),
    )
    x = x.localCheckpoint()
    v = spark.range(1, 65).select(
        F.col("id").cast("int").alias("dim"), F.lit(1).cast("long").alias("vv")
    )
    for _ in range(_PCA_ITERS):
        s = (
            x.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xv") * F.col("vv")).alias("s"))
        )
        w = (
            x.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("xv") * F.col("s")).alias("w"))
        )
        mx = w.agg(F.max(F.abs("w")).alias("mx"))
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                "dim",
                F.expr(f"(w * {_PCA_VSCALE}) DIV mx").alias("vv"),
            )
        )
    return v.select(F.col("dim"), F.col("vv").alias("v")).orderBy("dim")


def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-eigenvector estimate of the (uncentered) corpus Gram
    matrix by 3 power-iteration steps, in EXACT integer arithmetic:
    embeddings quantize to x = round(e·1000).

    Round-13 optimization (guide §1.2 "the distributed algorithm",
    §4.2): each step needs w = Xᵀ(X·v) = G·v where G = XᵀX is the
    DIM×DIM (64×64) integer Gram matrix — corpus-size-INDEPENDENT.  So
    the corpus is scanned ONCE to accumulate G (an Arrow ``mapInPandas``
    pass emitting one 4096-cell partial per batch, merged by a 4096-key
    sum aggregate), and all 3 re-quantized iterations
    v ← trunc(G·v·1024 / max|G·v|) run on the collected G with Python
    arbitrary-precision ints — the same exact integer arithmetic, in the
    same order-free summations, with trunc-toward-zero division matching
    Spark's ``DIV`` / DuckDB's ``//`` (both verified truncating: -7 DIV
    2 = -3).  The previous shape re-scanned the quantized matrix per
    join-aggregate — 28 scans / 71 exchanges / 285 plan nodes in the
    audited plan; this one is 1 scan / 1 exchange (4096-row partial-sum
    merge) + a bounded 4096-value collect, the classic "distributed
    Gram, driver-side eigensolve" layout that also widens the exact
    int64 envelope (per-cell |G_ij| ≤ n·525², exact past 10^13 rows vs
    the old per-row Xᵀs bound of ~5×10^8).

    REGULARITY GUARD (second-session dirty-audit find — the Gram pass
    shipped without re-running the dirty audit, which then flagged a
    value divergence): the join-aggregate shape this replaces has
    DATA-DEPENDENT semantics on irregular corpora that a fixed 64×64
    Gram cannot reproduce — a vector LONGER than 64 dims contributes
    its tail dims to w (and hence to mx and the output rows) from
    iteration 2 on, because v's row set becomes "every dim present in
    x" after the first re-quantization; a dim whose every element is
    NULL yields w = sum(all-NULL) = NULL and a NULL output component
    (zero-fill would print 0); and NULL-vec_id rows drop from the
    w join entirely.  So the query PROBES the corpus first (one cheap
    agg — array sizes and NULL-element existence, no value casts, so
    the probe itself cannot raise on fuzzed values): a corpus where
    every non-NULL embedding has exactly 64 dims and no NULL element
    takes the one-scan Gram path (provably identical there: every sum
    is over the identical terms in exact integer arithmetic, with
    NULL-id vectors excluded up front ≡ their old no-op contribution);
    anything irregular falls back to the verbatim join-aggregate shape
    (`_pca_join_aggregate`) — the 28-scan cost returns only for
    corpora where the fast path would change the answer.  The clean
    bench corpus always probes regular.

    NULL handling on the fast path matches the join-aggregate shape:
    a NULL embedding produces no matrix rows (posexplode-skip ≡ zero
    contribution) and a NULL vec_id contributes to no w sum (the old
    shape's s⋈x join dropped it).  Empty input returns the empty frame
    (the v-chain collapsed to zero rows); an all-zero corpus (mx = 0)
    raises like the ANSI DIV-by-zero both engines threw before."""
    emb = _t(spark, sf_dir, "embeddings")
    irregular = (
        emb.agg(
            F.sum(
                F.when(
                    F.col("embedding").isNotNull()
                    & (
                        (F.size("embedding") != 64)
                        | F.exists("embedding", lambda x: x.isNull())
                    ),
                    1,
                ).otherwise(0)
            ).alias("n")
        ).collect()[0]["n"]
        or 0
    )
    if irregular:
        return _pca_join_aggregate(spark, emb)
    emb = emb.where(F.col("vec_id").isNotNull())
    xq = emb.select(
        F.transform(
            F.coalesce(F.col("embedding"), F.array()),
            lambda e: F.round(e.cast("double") * 1000).cast("long"),
        ).alias("xq")
    ).where(F.size("xq") > 0)

    dim = 64

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        g = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            rows = pdf["xq"]
            mat = np.zeros((len(rows), dim), dtype=np.int64)
            for i, r in enumerate(rows):
                # NULL elements arrive as None in object lists OR as NaN
                # in float64 ndarrays (Arrow widens a long array that
                # carries nulls to float) — both mean "NULL long", i.e.
                # zero contribution, exactly like the join-aggregate
                # shape's NULL-skipping sums.  float64 is exact for the
                # quantized |x| ≤ ~10^6 « 2^53, so the round-trip through
                # float loses nothing.
                a = np.asarray(r, dtype=np.float64)
                a = np.where(np.isnan(a), 0.0, a).astype(np.int64)
                mat[i, : min(a.size, dim)] = a[:dim]
            g += mat.T @ mat
            seen = True
        if seen:
            yield pd.DataFrame(
                {"k": np.arange(dim * dim, dtype=np.int32), "g": g.ravel()}
            )

    g_rows = (
        xq.mapInPandas(gram_partials, schema="k int, g long")
        .groupBy("k")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    if not g_rows:
        return spark.createDataFrame([], "dim int, v bigint")

    g = [[0] * dim for _ in range(dim)]
    for r in g_rows:
        g[r["k"] // dim][r["k"] % dim] = r["g"]

    def trunc_div(a: int, b: int) -> int:
        # trunc-toward-zero ≡ Spark DIV ≡ DuckDB // (b > 0 here)
        return a // b if a >= 0 else -((-a) // b)

    v = [1] * dim
    for _ in range(_PCA_ITERS):
        w = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            raise ArithmeticError(
                "pca_power_iteration: zero Gram matrix (DIV by zero)"
            )
        v = [trunc_div(wi * _PCA_VSCALE, mx) for wi in w]
    # Inline VALUES (not createDataFrame) so the returned plan is a pure
    # LocalTableScan — createDataFrame round-trips through an RDD and
    # plans as Scan ExistingRDD with a needless serialization hop.
    vals = ", ".join(
        f"({i + 1}, CAST({int(v[i])} AS BIGINT))" for i in range(dim)
    )
    return spark.sql(
        f"SELECT dim, v FROM (VALUES {vals}) AS t(dim, v) ORDER BY dim"
    )


def _sql_pca() -> str:
    base = f"""
WITH x AS (
  SELECT vec_id, CAST(i AS INTEGER) AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xv
  FROM embeddings, generate_series(1, 64) AS t(i)
), v0 AS (
  SELECT CAST(i AS INTEGER) AS dim, CAST(1 AS BIGINT) AS vv
  FROM generate_series(1, 64) AS t(i)
)"""
    prev = "v0"
    for it in range(_PCA_ITERS):
        base += f""",
s{it} AS (
  SELECT x.vec_id, CAST(sum(x.xv * v.vv) AS BIGINT) AS s
  FROM x JOIN {prev} v USING (dim) GROUP BY x.vec_id
),
w{it} AS (
  SELECT x.dim, CAST(sum(x.xv * s{it}.s) AS BIGINT) AS w
  FROM x JOIN s{it} USING (vec_id) GROUP BY x.dim
),
v{it + 1} AS (
  SELECT dim,
         CAST((w * {_PCA_VSCALE}) // (SELECT max(abs(w)) FROM w{it}) AS BIGINT)
           AS vv
  FROM w{it}
)"""
        prev = f"v{it + 1}"
    base += f"""
SELECT dim, vv AS v FROM {prev} ORDER BY dim
"""
    return base


SQL_PCA_POWER_ITERATION = _sql_pca()


REGISTRY_LLM6 = {
    "bloom_dedup": (q_bloom_dedup, SQL_BLOOM_DEDUP),
    "bpe_encode": (q_bpe_encode, SQL_BPE_ENCODE),
    "corpus_datacard": (q_corpus_datacard, SQL_CORPUS_DATACARD),
    "pca_power_iteration": (q_pca_power_iteration, SQL_PCA_POWER_ITERATION),
}
