"""LLM batch 14 (round 5): boilerplate detection, asymmetric containment,
ranking-quality audit, collocation mining, weighted sampling, and
heavy-tail estimation — the next ring of training-data curation ops.

- ``boilerplate_blocks`` — cross-document repeated 3-word blocks
  (non-overlapping), the fixed-window cousin of sentence-level
  boilerplate removal (C4/RefinedWeb-style): a block appearing in ≥3
  distinct docs is boilerplate; report per-source block counts, share,
  and affected docs. Block assembly is a doc-partitioned window +
  per-block aggregate; the df table is block-vocabulary-sized.
- ``containment_pairs`` — asymmetric shingle containment
  C(A→B) = |S(A)∩S(B)| / |S(A)| over df-capped 4-gram shingles: finds
  documents mostly CONTAINED in another (quote farms, wrappers) that
  symmetric Jaccard under-scores when |B| ≫ |A|. Inverted-index
  candidates with df ≤ 20 blocking — the recall dial every
  inverted-index dedup in this repo uses; sizes are computed over the
  same df-capped shingle space so the statistic is self-consistent.
- ``auc_quality_score`` — AUC of a quality signal (doc length) against
  a binary label (lang = 'en') WITHOUT a corpus-sized rank window: the
  rank-sum reduces over per-distinct-score buckets (pos/neg counts +
  running negatives), so the only window runs over the distinct-score
  table — same bounded-window discipline as ``vocab_coverage_curve``.
  The numerator 2·Σ pos_b·(2·negs_below + neg_b) stays an exact
  integer; AUC = num / (2·P·N) in double only at the end.
- ``pmi_phrases`` — top collocations by pointwise mutual information
  over adjacent word pairs (min pair count 5): the phrase-mining pass
  a tokenizer-vocabulary plan runs. Marginals are vocabulary-keyed
  aggregates of the bigram table; PMI is computed as
  ln(c12)+ln(N)−ln(c1)−ln(c2) — a fixed-order 4-term float expression
  (identical on both engines) that never forms an overflowable
  integer product.
- ``weighted_sample_topk`` — deterministic weighted sampling without
  replacement (Efraimidis–Spirakis): key = ln(u)/w with u an
  md5-uniform of doc_id and w = n_chars; top-k by key IS a weighted
  sample, and TakeOrderedAndProject makes it a scan + bounded heap —
  the scale-correct way to draw a quality-weighted subset. Fully
  reproducible: re-ingestion draws the identical sample.
- ``hill_tail_index`` — Hill estimator of the document-length tail
  exponent from the top k+1 order statistics (k = 100): a bounded
  TakeOrdered, then one closed-form aggregate
  (Σln xᵢ − (k+1)·ln x₍ₖ₊₁₎)/k that is tie-placement-invariant.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_words

from ra2_datalake_linaresjoan_spark.queries import _t


# ---------------------------------------------------------------------------
# boilerplate_blocks — repeated fixed-window block detection
# ---------------------------------------------------------------------------

_BLK = 3
_BLK_DF = 3


def q_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: complete 3-word blocks, blocks repeated in ≥3 distinct
    docs (boilerplate), boilerplate share (6 dp), and docs containing
    any. Word indexes come from a doc-partitioned row_number (split
    positions can be non-contiguous after the empty-token filter);
    block text assembles from a sorted in-group array.

    Complete-case on doc_id in lockstep (round-10 dirty audit): block
    indexes come from row_number over (doc_id, pos) and all NULL-id
    docs merge into one tied-pos partition, interleaving words across
    documents nondeterministically (the bigram_lm_perplexity class)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(ascii_words("text")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    idx = tok.withColumn("i", F.row_number().over(w) - 1)
    blocks = (
        idx.groupBy("doc_id", "source", F.floor(F.col("i") / _BLK).alias("blk"))
        .agg(
            F.count(F.lit(1)).alias("nw"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "word"))),
                    lambda x: x["word"],
                ),
            ).alias("btext"),
        )
        .filter(F.col("nw") == _BLK)
    )
    bdf = blocks.groupBy("btext").agg(F.countDistinct("doc_id").alias("bdf"))
    marked = blocks.join(bdf, "btext").withColumn(
        "is_b", (F.col("bdf") >= _BLK_DF).cast("long")
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("is_b").alias("n_boilerplate"),
            F.round(F.sum("is_b") / F.count(F.lit(1)), 6).alias(
                "boilerplate_share"
            ),
            F.countDistinct(
                F.when(F.col("is_b") == 1, F.col("doc_id"))
            ).alias("n_docs_hit"),
        )
        .orderBy("source")
    )


SQL_BOILERPLATE_BLOCKS = """
WITH tok AS (
  SELECT doc_id, source, t.pos, t.word
  FROM documents,
       LATERAL (SELECT generate_subscripts(
                         regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), 1) AS pos,
                       unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> '' AND doc_id IS NOT NULL
), idx AS (
  SELECT doc_id, source, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS i
  FROM tok
), blocks AS (
  SELECT doc_id, source, i // 3 AS blk, count(*) AS nw,
         string_agg(word, ' ' ORDER BY i) AS btext
  FROM idx GROUP BY 1, 2, 3
  HAVING count(*) = 3
), bdf AS (
  SELECT btext, count(DISTINCT doc_id) AS bdf FROM blocks GROUP BY 1
), marked AS (
  SELECT b.source, b.doc_id, CASE WHEN bdf >= 3 THEN 1 ELSE 0 END AS is_b
  FROM blocks b JOIN bdf USING (btext)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(is_b) AS BIGINT) AS n_boilerplate,
       round(sum(is_b) * 1.0 / count(*), 6) AS boilerplate_share,
       CAST(count(DISTINCT CASE WHEN is_b = 1 THEN doc_id END) AS BIGINT) AS n_docs_hit
FROM marked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# containment_pairs — asymmetric shingle containment
# ---------------------------------------------------------------------------

_CONT_DF_CAP = 20
_CONT_T = 0.6
_CONT_N = 4


def _cont_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) posting list with int64 ``xxhash64`` shingle
    keys — the pre-checkpoint stage of ``q_containment_pairs``, exposed
    so tests/test_plans.py can guard ITS physical plan (the
    localCheckpoint in the query body hides this subplan from the final
    explain)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    words = docs.select(
        "doc_id",
        F.filter(
            ascii_words("text"), lambda x: x != ""
        ).alias("w"),
    )
    return words.filter(F.size("w") >= _CONT_N).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _CONT_N),
                    lambda j: F.xxhash64(F.slice("w", j + 1, _CONT_N)),
                )
            )
        ).alias("shingle"),
    )


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (doc_a contained-in doc_b) pairs by containment
    C = |S(A)∩S(B)|/|S(A)| ≥ 0.6 over df-capped distinct 4-gram
    shingles; ties break on (doc_a, doc_b). Shingling is in-row (the
    words array is projected ONCE, then sliced — no lambda
    re-materialization); candidates come only from the inverted-index
    equi-join on df ≤ 20 shingles. Shingle width 4 is the measured
    specificity knee on this corpus: identical ≥0.6 yield as 3-grams
    with 29× fewer candidate pairs (Σ df² 2.76M → 0.36M at sf0.1) —
    the width IS the blocking-selectivity dial. The shingle table is
    localCheckpointed once for its two consumers (df build, df join),
    and the df-capped posting list is checkpointed again for ITS three
    (sizes, both self-join sides) — see the inline round-13 note.

    The engine-side shingle key is ``xxhash64`` of the 4-word slice
    (round-11 A/B, round-10 verdict ask #2): the df count, the
    checkpoint, and the inverted-index self-join then move over int64
    instead of ~25-byte strings — smaller state, cheaper shuffle
    hashing, no concat materialization.  The OUTPUT
    (doc_a, doc_b, n_shared, containment) is hash-invariant, so the
    DuckDB oracle keeps verifying on the actual shingle strings — a
    64-bit collision (p ≈ 10⁻⁹ at this cardinality; it would need two
    distinct shingles colliding within one df-capped posting set to
    change a count) would surface as an oracle mismatch, not pass
    silently.

    Complete-case on doc_id in lockstep (round-10 review): the oracle's
    global SELECT DISTINCT collapses identical (NULL, shingle) rows
    from DIFFERENT NULL-id docs while Spark's per-row array_distinct
    keeps one per doc — df counts then differ and shingles flip across
    the df cap. The threshold compares the 6-dp ROUNDED containment on
    BOTH engines (was raw in the oracle — one-sided at the boundary)."""
    sh = _cont_shingles(spark, sf_dir).localCheckpoint()
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # Round-13 (guide §2.4 "remove shuffles outright"): `kept` has THREE
    # consumers (sizes, self-join side a, self-join side b) and Spark
    # plans no ReusedExchange across them — the audited plan ran the
    # df-count HashAggregate+Exchange and the df⋈postings join 3×.
    # Checkpointing the df-capped posting list (narrower than `sh`: the
    # hot shingles are gone) runs that subtree ONCE; the self-join and
    # the sizes aggregate then read the materialized (shingle, doc_id)
    # pairs. Row-identical: localCheckpoint only materializes.
    # round-14 (ADVICE): project BEFORE materializing — the consumers
    # only read (shingle, doc_id), so storing the df int64 would widen
    # every checkpointed posting for nothing
    kept = (
        sh.join(df_tab.filter(F.col("df") <= _CONT_DF_CAP), "shingle")
        .select("shingle", "doc_id")
        .localCheckpoint()
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    shared = (
        kept.alias("a")
        .join(kept.alias("b"), "shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, shared["doc_a"] == sizes["doc_id"])
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("sz"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= _CONT_T)
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
        .limit(20)
    )


SQL_CONTAINMENT_PAIRS = """
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                     x -> x <> '') AS w
  FROM documents
  WHERE doc_id IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 2),
                               j -> array_to_string(w[j:j+3], ' '))) AS shingle
  FROM words WHERE len(w) >= 4
), df_tab AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
), kept AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN df_tab USING (shingle)
  WHERE df <= 20
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       round(n_shared * 1.0 / sz, 6) AS containment
FROM shared JOIN sizes ON doc_a = sizes.doc_id
WHERE round(n_shared * 1.0 / sz, 6) >= 0.6
ORDER BY containment DESC, doc_a, doc_b
LIMIT 20
"""


# ---------------------------------------------------------------------------
# auc_quality_score — bucket-aggregated rank-sum AUC
# ---------------------------------------------------------------------------


def q_auc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of n_chars as a classifier score for lang = 'en' (ties get the
    standard ½ credit). One (score → pos, neg) aggregate; the running-
    negatives window covers only the distinct-score table; the rank-sum
    numerator stays an exact integer until the final division.

    Scale note: the numerator Σ pos·(2·neg_below + neg) is
    O(n_pos·n_neg) ≈ n²/4 and overflows BIGINT past ~6·10⁹ docs — the
    DECIMAL(38,0) escape applies (cast the summand to decimal(38,0) on
    both engines), exactly as documented for the moment sums in
    ``doc_feature_corr`` / ``degree_assortativity``.

    Complete-case on n_chars in lockstep (round-10 dirty audit): a NULL
    score cannot rank — Spark's cumulative window put the NULL bucket
    FIRST (its negatives counted below every real score) while DuckDB
    put it LAST, shifting the whole rank-sum (the statsnull recipe)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    buckets = docs.groupBy("n_chars").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("pos"),
        F.sum((F.col("lang") != "en").cast("long")).alias("neg"),
    )
    w = Window.orderBy("n_chars")
    b = buckets.withColumn(
        "neg_below",
        F.coalesce(
            F.sum("neg").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    return b.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_scores"),
        F.round(
            F.when(
                (F.sum("pos") != 0) & (F.sum("neg") != 0),
                F.sum(
                    F.col("pos")
                    * (F.lit(2) * F.col("neg_below") + F.col("neg"))
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.sum("pos").cast("double")
                    * F.sum("neg").cast("double")
                ),
            ),
            6,
        ).alias("auc"),
    )


SQL_AUC_QUALITY_SCORE = """
WITH buckets AS (
  SELECT n_chars,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS neg
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
), b AS (
  SELECT *,
         CAST(coalesce(sum(neg) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_below
  FROM buckets
)
SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       CAST(count(*) AS BIGINT) AS n_scores,
       round(CASE WHEN sum(pos) = 0 OR sum(neg) = 0 THEN NULL
             ELSE CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)
                  / (2.0 * sum(pos) * sum(neg)) END, 6) AS auc
FROM b
"""


# ---------------------------------------------------------------------------
# pmi_phrases — collocation mining by pointwise mutual information
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


def q_pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent word pairs by PMI (pair count ≥ 5), ties on
    (w1, w2). Marginals are positional (w1 as first / w2 as second of a
    bigram) so they sum to N exactly; PMI is the 4-term log expression
    — no integer products that could overflow at corpus scale.

    Complete-case on doc_id in lockstep (round-10 dirty audit): the
    adjacency chain is lead() over (doc_id, pos); NULL-id docs merge
    into one tied-pos partition with nondeterministic bigrams polluting
    the global c12/c1/c2 tables (the bigram_lm_perplexity class)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tok = docs.select(
        "doc_id",
        F.posexplode(ascii_words("text")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            F.col("word").alias("w1"), F.lead("word").over(w).alias("w2")
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = big.agg(F.sum("c12").alias("nb"))
    pmi = (
        F.log(F.col("c12").cast("double"))
        + F.log(F.col("nb").cast("double"))
        - F.log(F.col("c1").cast("double"))
        - F.log(F.col("c2").cast("double"))
    )
    return (
        big.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c12", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


SQL_PMI_PHRASES = """
WITH tok AS (
  SELECT doc_id, t.pos, t.word
  FROM documents,
       LATERAL (SELECT generate_subscripts(
                         regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), 1) AS pos,
                       unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> '' AND doc_id IS NOT NULL
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
    SELECT word AS w1,
           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL GROUP BY 1, 2
), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM big GROUP BY 1),
n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM big)
SELECT w1, w2, c12,
       round(ln(CAST(c12 AS DOUBLE)) + ln(CAST(nb AS DOUBLE))
             - ln(CAST(c1 AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)), 4) AS pmi
FROM big JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
WHERE c12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""


# ---------------------------------------------------------------------------
# weighted_sample_topk — Efraimidis–Spirakis weighted sampling
# ---------------------------------------------------------------------------

_WS_K = 50


def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample of 50 docs, P(select) ∝ n_chars:
    key = ln(u)/w with u = md5-uniform(doc_id) ∈ (0,1); top-k by key is
    exactly Efraimidis–Spirakis sampling without replacement. The plan
    is a scan + TakeOrderedAndProject (bounded heap per partition) —
    no global sort, no shuffle of the corpus.

    Complete-case on doc_id in lockstep (round-10 dirty audit): the
    sampling key is md5(doc_id) — no identity, no draw — and the
    oracle's '0x' || substr(md5(NULL)) previously went through
    NULL-SKIPPING concat(), minting a bare '0x' that crashed the
    BIGINT cast (the known '0x'-hash class; || propagates NULL)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars")).alias("es_key"),
    ).filter(F.col("n_chars") > 0)
    top = keyed.orderBy(F.desc("es_key"), "doc_id").limit(_WS_K)
    rk = Window.orderBy(F.desc("es_key"), "doc_id")
    return top.select(
        F.row_number().over(rk).alias("sample_rank"),
        "doc_id",
        "n_chars",
        F.round("es_key", 6).alias("es_key"),
    ).orderBy("sample_rank")


SQL_WEIGHTED_SAMPLE_TOPK = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             + 0.5) / 4294967296.0) / n_chars AS es_key
  FROM documents WHERE n_chars > 0 AND doc_id IS NOT NULL
), top AS (
  SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT 50
)
SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INT) AS sample_rank,
       doc_id, n_chars, round(es_key, 6) AS es_key
FROM top
ORDER BY sample_rank
"""


# ---------------------------------------------------------------------------
# hill_tail_index — heavy-tail exponent from top order statistics
# ---------------------------------------------------------------------------

_HILL_K = 100


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator over the top k+1 = 101 document lengths:
    γ̂ = (Σᵢ≤ₖ₊₁ ln xᵢ − (k+1)·ln x₍ₖ₊₁₎)/k (tie-placement-invariant
    algebraic form), α̂ = 1/γ̂. TakeOrdered bounds the driver-side data
    at k+1 rows at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    top = (
        docs.select(F.col("n_chars").cast("double").alias("x"))
        .filter(F.col("x") > 0)
        .orderBy(F.desc("x"))
        .limit(_HILL_K + 1)
    )
    a = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.log("x")).alias("s"),
        F.min("x").alias("xk1"),
    ).filter(F.col("n") > 0)  # empty corpus -> empty result, not a k=-1 row
    num = F.col("s") - F.col("n") * F.log("xk1")
    # degenerate guards (ANSI mode raises on /0): a single row has no
    # tail pairs (n = 1), and an all-equal sample has num = 0 exactly on
    # both engines — alpha is undefined (null) in either case
    return a.select(
        (F.col("n") - 1).alias("k"),
        F.col("xk1").cast("long").alias("x_k_plus_1"),
        F.round(
            F.when(F.col("n") > 1, num / (F.col("n") - 1)), 4
        ).alias("hill_gamma"),
        # same float path as the oracle: (n-1)/num, not 1/gamma (double
        # rounding could diverge in the last ulp)
        F.round(
            F.when((F.col("n") > 1) & (num != 0), (F.col("n") - 1) / num), 4
        ).alias("tail_alpha"),
    )


SQL_HILL_TAIL_INDEX = """
WITH top AS (
  SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
  WHERE n_chars > 0
  ORDER BY x DESC LIMIT 101
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(ln(x)) AS s, min(x) AS xk1
  FROM top
  HAVING count(*) > 0
)
SELECT n - 1 AS k,
       CAST(xk1 AS BIGINT) AS x_k_plus_1,
       round(CASE WHEN n > 1 THEN (s - n * ln(xk1)) / (n - 1) END, 4) AS hill_gamma,
       round(CASE WHEN n > 1 AND s - n * ln(xk1) <> 0
                  THEN (n - 1) / (s - n * ln(xk1)) END, 4) AS tail_alpha
FROM a
"""


REGISTRY_LLM14: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "boilerplate_blocks": (q_boilerplate_blocks, SQL_BOILERPLATE_BLOCKS),
    "containment_pairs": (q_containment_pairs, SQL_CONTAINMENT_PAIRS),
    "auc_quality_score": (q_auc_quality_score, SQL_AUC_QUALITY_SCORE),
    "pmi_phrases": (q_pmi_phrases, SQL_PMI_PHRASES),
    "weighted_sample_topk": (q_weighted_sample_topk, SQL_WEIGHTED_SAMPLE_TOPK),
    "hill_tail_index": (q_hill_tail_index, SQL_HILL_TAIL_INDEX),
}
