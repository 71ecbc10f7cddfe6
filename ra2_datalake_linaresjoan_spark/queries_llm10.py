"""LLM-data batch 10 (round 4): retrieval scoring, mergeable count
sketches, mixture re-balancing, fair token allocation, normalization-class
dedup, in-row entropy screens, shard assignment, and vocabulary-tail
statistics — the curation/composition surface a 100-TB training-data
pipeline runs between ingest and tokenization.

Scale notes (see SCALE.md for the full table):

- ``bm25_topk`` is inverted-index shaped: the corpus shuffles once into
  (doc, word) postings; per-term statistics (df) and collection
  statistics (N, avgdl) are vocabulary-/1-row-sized and broadcast back.
  Never a query×doc cross join.
- ``cms_heavy_hitters`` builds a count-min sketch as ROWS ((depth, cell)
  partial sums — the mergeable-sketch property is literally the
  map-side-combine the aggregate already does) and audits estimate vs
  exact count for the head words.
- ``char_entropy_filter`` computes per-document character entropy as a
  PURE in-row Column expression: ONE run-length fold over the sorted
  char array (O(n log n) per row). Zero shuffles, no explode: the
  corpus is scanned once and never re-keyed. Folding runs in sorted
  order makes the float summation order identical to the oracle's
  sorted-distinct sum, so the 4-dp round compares bit-stable values.
- ``waterfill_allocation`` runs the classic water-filling fair-share
  algorithm entirely with windows over a SOURCE-CARDINALITY aggregate
  (~10¹–10³ rows at any data scale): ascending-capacity cumulative sums
  produce per-rank waterline candidates; the first feasible candidate is
  the exact waterline.
- Everything else is counts and ratios of counts over shrinking
  aggregates (docs → sources/langs/shards).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_lower, ascii_words

from ra2_datalake_linaresjoan_spark.queries import _spread, _t


# ---------------------------------------------------------------------------
# bm25_topk — BM25-ranked retrieval over an inverted-index shape
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "query", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, tf_0..tf_2): the one-scan doc-grain BM25 inputs —
    the pre-checkpoint stage of ``bm25_scores``, exposed so
    tests/test_plans.py can guard ITS physical plan (the
    localCheckpoint in the scoring body hides this subplan from the
    final explain).  No explode, no shuffle: dl and each fixed term's
    tf are in-row functions of the words array."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents")
    # two-step projection (the char_entropy_filter convention): the
    # words array is named once, then the four counts derive from the
    # named column — higher-order functions sit outside codegen CSE,
    # and CollapseProject keeps the non-cheap split materialized.
    words = docs.select(
        "doc_id",
        F.filter(ascii_words(F.col("text")), lambda x: x != "").alias("w"),
    )
    def tf_of(term: str) -> Column:
        # NB: a one-arg lambda per term — a `lambda x, t=t:` two-arg
        # form would be read by the higher-order-function binder as the
        # (element, index) signature and compare against the array index
        return F.coalesce(
            F.size(F.filter(F.col("w"), lambda x: x == F.lit(term))),
            F.lit(0),
        ).cast("long")

    return words.select(
        "doc_id",
        F.coalesce(F.size("w"), F.lit(0)).cast("long").alias("dl"),
        *[tf_of(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25): every matching document's BM25 score for the
    fixed term set (k1=1.2, b=0.75), 4-dp rounded — THE scoring
    contract. Shared by ``q_bm25_topk`` and ``queries_llm15``'s MMR
    candidate pool so a tuning change can never silently diverge the
    two (round-9 review: the pool used to carry a verbatim copy).

    Round-13 one-scan shape (guide §2.3 "aggregate before you
    shuffle" / §2.4 "remove shuffles outright"): the old plan
    tokenized the corpus THREE times (dl, n_tok, tf — each consumer
    of ``tok`` re-ran the regexp split + explode) and re-joined the
    doc-grain dl onto tf through a hash shuffle.  But every per-doc
    input to BM25 — dl and tf per fixed term — is an IN-ROW function
    of the words array, so one projection computes (doc_id, dl,
    tf_<term>...) with no explode and no doc-keyed shuffle at all.
    The narrow per-doc table (4 longs + id — the lightweight proxy
    of guide §8) is localCheckpointed once for its two consumers:
    the 1-row collection-stats aggregate (n_docs, n_tok, df per
    term — partial-agg combine, ~40 bytes per partition) and the
    final scoring projection, which broadcasts the stats row back
    and emits each doc's score as a fixed-order sum over the ≤3
    term scores.  Corpus tokenized ONCE; zero data-sized exchanges.

    Value parity with the old shape: dl counts non-empty tokens
    (size of the filtered array = count of exploded non-empty
    words); docs with no matching term produced no tf rows before
    and are filtered out (tf_any > 0) now; df = count of docs with
    tf ≥ 1; n_docs/n_tok include token-less docs identically
    (coalesce 0). Per-term scores are the identical float expression
    on identical integer inputs; the final sum adds ≤3 doubles in
    fixed term order vs the old hash-agg arrival order — both 4-dp
    rounded, same cross-engine tolerance class as the oracle's own
    summation order (verified tri-scale against the unchanged DuckDB
    oracle).
    Tokenization = the shared ``ascii_words`` contract (round-11
    unicode-fuzz: lower-then-split token sets diverge per engine the
    moment text leaves ASCII)."""
    per_doc = _bm25_per_doc(spark, sf_dir).localCheckpoint()
    # df parity with the old postings shape under dirty ids: groupBy
    # doc_id merged ALL NULL-id docs into ONE group (df counted it
    # once) and the tf⋈dl equi-join then dropped it from the scored
    # output — so df = |non-null docs with the term| + (1 if ANY
    # NULL-id doc has it), and scoring keeps non-null ids only.
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("n_tok"),
        *[
            (
                F.sum(
                    (
                        F.col("doc_id").isNotNull() & (F.col(f"tf_{i}") > 0)
                    ).cast("long")
                )
                + F.coalesce(
                    F.max(
                        F.when(
                            F.col("doc_id").isNull() & (F.col(f"tf_{i}") > 0),
                            F.lit(1).cast("long"),
                        )
                    ),
                    F.lit(0).cast("long"),
                )
            ).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def term_score(i: int) -> Column:
        tf, df_ = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log((F.col("n_docs") - df_ + 0.5) / (df_ + 0.5) + 1.0)
        denom = tf + _BM25_K1 * (
            1.0
            - _BM25_B
            + _BM25_B * F.col("dl") / (F.col("n_tok") / F.col("n_docs"))
        )
        # tf = 0 contributes an exact 0.0 (numerator tf·(k1+1) = 0 over
        # a positive denominator) — identical to the old shape's absent
        # tf row
        return idf * (tf * (_BM25_K1 + 1.0)) / denom

    scored = (
        per_doc.filter(
            F.col("doc_id").isNotNull()
            & (
                sum(
                    (F.col(f"tf_{i}") for i in range(1, len(_BM25_TERMS))),
                    F.col("tf_0"),
                )
                > 0
            )
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                sum(
                    (term_score(i) for i in range(1, len(_BM25_TERMS))),
                    term_score(0),
                ),
                4,
            ).alias("bm25"),
        )
    )
    return scored


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 score — the retrieval-grade upgrade of
    ``tfidf_top_terms``: IDF saturation plus document-length
    normalization, via the shared ``bm25_scores`` contract."""
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


SQL_BM25_TOPK = r"""
WITH tok AS (
  SELECT doc_id, t.word
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), coll AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM tok) AS n_tok
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE word IN ('spark', 'query', 'window')
  GROUP BY doc_id, word
), df AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
)
SELECT tf.doc_id,
       round(sum(
         ln((coll.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75
                           + 0.75 * dl.dl / (CAST(coll.n_tok AS DOUBLE) / coll.n_docs)))
       ), 4) AS bm25
FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN coll
GROUP BY tf.doc_id
ORDER BY bm25 DESC, tf.doc_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters — count-min sketch estimate audit
# ---------------------------------------------------------------------------

_CMS_W = 1024  # cells per row
_CMS_D = 3  # depth (independent hash rows: md5 hex slices)


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit: build a D=3 × W=1024 sketch of word
    occurrences (hash rows = md5 hex slices mod W — the same
    engine-portable hash family as ``bloom_dedup``), then report the
    top-15 words by EXACT count next to their CMS estimate
    (min over depth of the hashed cell's sum) and the overestimate.
    The sketch is a (depth, cell) aggregate — ≤ D·W rows regardless of
    corpus size, and the partial-sum combine IS the CMS merge property
    that makes the sketch distributable. Estimates are ≥ exact by
    construction; the overestimate column is the collision cost that
    sizes W in production. All-integer arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(ascii_words("text")).alias("word"))
        .filter(F.length("word") >= 3)
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_exact"))
    # localCheckpoint (round-13, guide §2.4): the hashed word-count
    # table is VOCABULARY-sized, but it has four consumers (the three
    # per-depth cell aggregates and the estimate join chain) — without
    # the checkpoint each one re-ran the corpus tokenize+explode+count
    # subtree (4 corpus scans in the audited plan; 1 after).
    hashed = wc.withColumns(
        {
            f"p{j}": F.conv(F.substring(F.md5("word"), 1 + 8 * j, 8), 16, 10).cast(
                "long"
            )
            % _CMS_W
            for j in range(_CMS_D)
        }
    ).localCheckpoint()
    est = None
    for j in range(_CMS_D):
        cells = hashed.groupBy(f"p{j}").agg(F.sum("n_exact").alias(f"s{j}"))
        est = (hashed if est is None else est).join(F.broadcast(cells), f"p{j}")
    return (
        est.select(
            "word",
            "n_exact",
            F.least(*[F.col(f"s{j}") for j in range(_CMS_D)]).alias("n_est"),
        )
        .withColumn("overestimate", F.col("n_est") - F.col("n_exact"))
        .orderBy(F.desc("n_exact"), "word")
        .limit(15)
    )


SQL_CMS_HEAVY_HITTERS = f"""
WITH words AS (
  SELECT t.word
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE length(t.word) >= 3
), wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_exact FROM words GROUP BY word
), hashed AS (
  SELECT word, n_exact,
         CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % {_CMS_W} AS p0,
         CAST(concat('0x', substr(md5(word), 9, 8)) AS BIGINT) % {_CMS_W} AS p1,
         CAST(concat('0x', substr(md5(word), 17, 8)) AS BIGINT) % {_CMS_W} AS p2
  FROM wc
), c0 AS (SELECT p0, sum(n_exact) AS s0 FROM hashed GROUP BY p0),
   c1 AS (SELECT p1, sum(n_exact) AS s1 FROM hashed GROUP BY p1),
   c2 AS (SELECT p2, sum(n_exact) AS s2 FROM hashed GROUP BY p2)
SELECT word, n_exact,
       CAST(least(s0, s1, s2) AS BIGINT) AS n_est,
       CAST(least(s0, s1, s2) - n_exact AS BIGINT) AS overestimate
FROM hashed JOIN c0 USING (p0) JOIN c1 USING (p1) JOIN c2 USING (p2)
ORDER BY n_exact DESC, word
LIMIT 15
"""


# ---------------------------------------------------------------------------
# domain_balance_weights — target-mixture sampling weights
# ---------------------------------------------------------------------------

_MAX_WEIGHT = 8.0


def q_domain_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights that re-balance the token mixture
    toward UNIFORM across sources (the DoReMi-style static reweighting a
    mixture trainer starts from): weight = target_share / actual_share,
    capped at 8× so tail sources don't explode the sampler. Two
    shrinking aggregates (docs → sources, then a 1-row total that
    broadcasts back); token counts are whitespace tokens, exact
    integers; shares and weights are 6-dp ratios."""
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("total_tokens")
    target = F.lit(1.0) / F.col("n_sources")
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(target, 6).alias("target_share"),
            F.round(F.least(target / share, F.lit(_MAX_WEIGHT)), 6).alias(
                "sampling_weight"
            ),
        )
        .orderBy("source")
    )


SQL_DOMAIN_BALANCE_WEIGHTS = r"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), totals AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         count(*) AS n_sources
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS token_share,
       round(1.0 / n_sources, 6) AS target_share,
       round(least((1.0 / n_sources) / (CAST(n_tokens AS DOUBLE) / total_tokens),
                   8.0), 6) AS sampling_weight
FROM per_src CROSS JOIN totals
ORDER BY source
"""


# ---------------------------------------------------------------------------
# waterfill_allocation — exact water-filling of a token budget
# ---------------------------------------------------------------------------

_WF_MAX_EPOCHS = 4
_WF_BUDGET_FRAC = 0.6


def q_waterfill_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fair token-budget allocation across sources by exact water-filling:
    each source's capacity is ``tokens × 4`` (a 4-epoch repetition cap),
    the budget is 60% of total capacity, and every source receives
    ``min(capacity, L)`` where the waterline L makes allocations sum to
    the budget. L is found in closed form over the ASC-sorted capacity
    table: with ``cum_prev`` the capacity of all strictly-smaller
    sources and ``k`` the rank, candidate ``(B - cum_prev)/(S - k + 1)``
    is the waterline iff it does not exceed the rank's own capacity —
    the FIRST feasible rank wins (all earlier ranks saturate). Windows
    and the 1-row candidate scan run over the source-cardinality
    aggregate (~10¹–10³ rows at any corpus size). Allocations at 2 dp,
    epochs at 4 dp.

    Complete-case on (source, text): a NULL source/capacity row cannot
    receive an allocation, and its NULL cap sorts first in Spark's
    waterline window but last in DuckDB's, shifting every rank
    (round-8 parity audit)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import complete_case

    docs = complete_case(_t(spark, sf_dir, "documents"), "source", "text")
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tokens")
    )
    caps = per_src.select(
        "source", "n_tokens", (F.col("n_tokens") * _WF_MAX_EPOCHS).alias("cap")
    )
    totals = caps.agg(
        F.floor(F.sum("cap") * _WF_BUDGET_FRAC).cast("long").alias("budget"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    w_asc = Window.orderBy("cap", "source")
    ranked = caps.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_tokens",
        "cap",
        "budget",
        "n_sources",
        F.row_number().over(w_asc).alias("k"),
        F.coalesce(
            F.sum("cap").over(w_asc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_prev"),
    )
    cand = ranked.withColumn(
        "cand",
        (F.col("budget") - F.col("cum_prev"))
        / (F.col("n_sources") - F.col("k") + 1),
    )
    line = (
        cand.filter(F.col("cand") <= F.col("cap"))
        .orderBy("k")
        .limit(1)
        .select(F.col("cand").alias("waterline"))
    )
    alloc = F.least(F.col("cap").cast("double"), F.col("waterline"))
    return (
        cand.crossJoin(F.broadcast(line))
        .select(
            "source",
            "n_tokens",
            "cap",
            F.round(alloc, 2).alias("alloc_tokens"),
            F.round(alloc / F.col("n_tokens"), 4).alias("epochs"),
            (F.col("cap") <= F.col("waterline")).alias("saturated"),
        )
        .orderBy("source")
    )


SQL_WATERFILL_ALLOCATION = r"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+'))) AS BIGINT) AS n_tokens
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY source
), caps AS (
  SELECT source, n_tokens, n_tokens * 4 AS cap FROM per_src
), totals AS (
  SELECT CAST(floor(sum(cap) * 0.6) AS BIGINT) AS budget, count(*) AS n_sources
  FROM caps
), ranked AS (
  SELECT source, n_tokens, cap, budget, n_sources,
         row_number() OVER (ORDER BY cap, source) AS k,
         CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM caps CROSS JOIN totals
), cand AS (
  SELECT *, CAST(budget - cum_prev AS DOUBLE) / (n_sources - k + 1) AS cand
  FROM ranked
), line AS (
  SELECT cand AS waterline FROM cand WHERE cand <= cap ORDER BY k LIMIT 1
)
SELECT source, n_tokens, cap,
       round(least(CAST(cap AS DOUBLE), waterline), 2) AS alloc_tokens,
       round(least(CAST(cap AS DOUBLE), waterline) / n_tokens, 4) AS epochs,
       cap <= waterline AS saturated
FROM cand CROSS JOIN line
ORDER BY source
"""


# ---------------------------------------------------------------------------
# canonical_text_dedup — normalization-class duplicate groups
# ---------------------------------------------------------------------------


def q_canonical_text_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups under CANONICAL text equality: case-folded,
    punctuation stripped, whitespace collapsed, then md5-fingerprinted —
    the normalization class between byte-exact dedup
    (``exact_dedup_docs``) and MinHash near-dedup. The corpus is unioned
    with a noisy re-ingest of every 7th doc (uppercased, punctuation
    appended, synthetic id ``-doc_id - 1`` — strictly negative, so
    collision-free at any scale) that canonicalization MUST collapse
    onto its original: byte-exact dedup would miss all of these. One
    shuffle on the canonical fingerprint; survivors are the min doc_id
    per group (the deterministic-keeper convention the exact path
    uses). Reports each multi-member group's fingerprint, size, and
    keeper.

    Case handling is ASCII-scoped in LOCKSTEP (round-11 unicode-fuzz):
    the noisy re-ingest uppercases via ``translate`` (a pure char map —
    Java's upper('ß') = 'SS' while utf8proc yields 'ẞ', so the two
    engines would synthesize DIFFERENT noisy docs), and the canon
    strips non-[A-Za-z0-9] BEFORE folding so lower() only ever sees
    ASCII.  Identical on ASCII corpora."""
    _AZ = "abcdefghijklmnopqrstuvwxyz"
    docs = _t(spark, sf_dir, "documents")
    noisy = docs.filter(F.col("doc_id") % 7 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.translate("text", _AZ, _AZ.upper()), F.lit("!!")).alias(
            "text"
        ),
    )
    both = docs.select("doc_id", "text").unionByName(noisy)
    key = F.md5(
        F.trim(ascii_lower(F.regexp_replace("text", "[^A-Za-z0-9]+", " ")))
    ).alias("canon_fp")
    return (
        both.select(key, "doc_id")
        .groupBy("canon_fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canon_fp")
    )


SQL_CANONICAL_TEXT_DEDUP = """
WITH both_sets AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -doc_id - 1,
         translate(text, 'abcdefghijklmnopqrstuvwxyz',
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || '!!'
  FROM documents WHERE doc_id % 7 = 0
)
SELECT md5(trim(translate(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'),
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          'abcdefghijklmnopqrstuvwxyz'), ' ')) AS canon_fp,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper_id
FROM both_sets
GROUP BY 1
HAVING count(*) > 1
ORDER BY canon_fp
"""


# ---------------------------------------------------------------------------
# char_entropy_filter — in-row character-entropy quality screen
# ---------------------------------------------------------------------------

_ENTROPY_MIN = 3.0  # nats


def char_entropy_col():
    """Rounded per-row character entropy of ``text`` as a pure Column
    expression (see ``q_char_entropy_filter`` for the contract); shared
    with the scale probe.

    Shape: ONE run-length fold over the SORTED char array — O(n log n)
    per row. The naive per-distinct-char ``size(filter(chars, ...))``
    formulation is O(n·|alphabet|) *per evaluation* and, because Spark
    does no common-subexpression elimination inside lambda bodies, the
    char array literally re-materializes for every distinct character —
    the scale probe measured it at ~21 ms/doc (107 s for 5 K docs)
    vs ~0.1 ms/doc for this fold. Runs accumulate in sorted-char order,
    the same order DuckDB's sorted-distinct oracle sums, so the 4-dp
    values stay bit-identical. ``split(text, '')`` builds the char array
    in one native call (3× faster than a transform of substr calls).
    The length guard keeps zero-length text out of the fold."""
    return F.expr(
        """
        case when length(text) = 0 then 0.0 else
        round(aggregate(
          array_sort(split(text, '')),
          struct(cast(null as string) as prev,
                 cast(0 as bigint) as run,
                 cast(0.0 as double) as h),
          (acc, c) -> case
            when acc.prev is null or c = acc.prev
              then struct(c as prev, acc.run + 1 as run, acc.h as h)
            else struct(c as prev, cast(1 as bigint) as run,
                        acc.h + (cast(acc.run as double) / length(text))
                              * ln(cast(acc.run as double) / length(text)) as h)
            end,
          acc -> -(acc.h + (cast(acc.run as double) / length(text))
                         * ln(cast(acc.run as double) / length(text)))
        ), 4)
        end
        """
    )


def q_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-entropy quality screen (low entropy ⇒
    repetitive/degenerate text — the classic cheap garbage detector).
    Entropy is ONE in-row Column expression — a run-length fold over the
    sorted char array (see ``char_entropy_col``) — no explode, no
    shuffle, corpus scanned exactly once. The DuckDB oracle keeps the
    naive per-distinct-char formulation (oracle cost is irrelevant;
    only values must match). Flags docs below 3.0 nats.

    Entropy is row-local (no cross-row aggregate at all), so the
    ``_spread`` guard is unconditionally result-invariant here; it took
    the sf0.1 single-file scan from one core grinding every byte to a
    full-width stage (A/B measured 2.89 s -> 0.85 s at sf0.1 on local[32];
    this query is the one heavy-map pipeline with NO downstream shuffle,
    which is exactly when the guard pays)."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    # two-step projection on purpose: deriving the flag from the ALIASED
    # column keeps the fold evaluated once — higher-order functions fall
    # outside whole-stage codegen's subexpression elimination, so naming
    # the expression twice in one select would run it twice (measured 2×
    # wall time at sf0.1); CollapseProject keeps non-cheap expressions
    # in their own projection, preserving the single evaluation
    return (
        docs.select(
            "doc_id",
            "lang",
            F.length("text").alias("n_chars_total"),
            char_entropy_col().alias("char_entropy"),
        )
        .select(
            "doc_id",
            "lang",
            "n_chars_total",
            "char_entropy",
            (F.col("char_entropy") < _ENTROPY_MIN).alias("low_entropy"),
        )
        .orderBy("doc_id")
    )


SQL_CHAR_ENTROPY_FILTER = """
WITH e AS (
  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars_total,
         CASE WHEN length(text) = 0 THEN 0.0 ELSE
         round(-list_sum(list_transform(
           list_sort(list_distinct(list_transform(range(1, len(text) + 1),
                                                  i -> substr(text, i, 1)))),
           d -> (CAST(len(list_filter(list_transform(range(1, len(text) + 1),
                                                     i -> substr(text, i, 1)),
                                      c -> c = d)) AS DOUBLE) / len(text))
                * ln(CAST(len(list_filter(list_transform(range(1, len(text) + 1),
                                                         i -> substr(text, i, 1)),
                                          c -> c = d)) AS DOUBLE) / len(text))
         )), 4) END AS char_entropy
  FROM documents
)
SELECT doc_id, lang, n_chars_total, char_entropy,
       char_entropy < 3.0 AS low_entropy
FROM e
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# training_shard_assign — deterministic hash sharding with balance audit
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def q_training_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5(doc_id) mod
    16 (engine-portable hash — the property that lets a re-run or a
    different engine reproduce the exact same shards), with a per-shard
    balance audit: doc count, token count, and skew ratio vs the ideal
    uniform shard. One doc-grain scan, one 16-row aggregate."""
    # the id hashes through a NULL sentinel in lockstep (DuckDB's
    # CAST(concat('0x', NULL-md5)) errors where Spark's conv returns a
    # NULL shard)
    docs = _t(spark, sf_dir, "documents")
    assigned = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.coalesce(
                            F.col("doc_id").cast("string"), F.lit("<null>")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            % _N_SHARDS
        ).alias("shard"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    total = per_shard.agg(F.sum("n_docs").alias("total_docs"))
    return (
        per_shard.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_docs") / (F.col("total_docs") / F.lit(float(_N_SHARDS))), 4
            ).alias("skew_ratio"),
        )
        .orderBy("shard")
    )


SQL_TRAINING_SHARD_ASSIGN = rf"""
WITH assigned AS (
  SELECT CAST(concat('0x', substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<null>')), 1, 8)) AS BIGINT)
           % {_N_SHARDS} AS shard,
         len(regexp_split_to_array(trim(text, ' '), '[\s\x0b]+')) AS n_tok
  FROM documents
), per_shard AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY shard
), total AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM per_shard)
SELECT shard, n_docs, n_tokens,
       round(n_docs / (CAST(total_docs AS DOUBLE) / {_N_SHARDS}), 4) AS skew_ratio
FROM per_shard CROSS JOIN total
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# hapax_rate — vocabulary-tail statistics per language
# ---------------------------------------------------------------------------


def q_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-tail profile: vocabulary size, hapax
    legomena count (words occurring exactly once), hapax share of the
    vocabulary, and the head token's share of all occurrences — the
    frequency-spectrum endpoints a tokenizer-vocabulary plan reads
    first. Two shrinking aggregates: occurrences → (lang, word) counts →
    per-lang spectrum. Tokenization = the shared ``ascii_words``
    contract (round-11 unicode-fuzz)."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "lang", F.explode(ascii_words(F.col("text"))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        wc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
            F.round(
                F.sum((F.col("n") == 1).cast("long")) / F.count(F.lit(1)), 6
            ).alias("hapax_share"),
            F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"),
        )
        .orderBy("lang")
    )


SQL_HAPAX_RATE = r"""
WITH wc AS (
  SELECT lang, t.word, CAST(count(*) AS BIGINT) AS n
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
  GROUP BY lang, t.word
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS hapax_share,
       round(max(n) * 1.0 / sum(n), 6) AS top1_share
FROM wc
GROUP BY lang
ORDER BY lang
"""


REGISTRY_LLM10: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "cms_heavy_hitters": (q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "domain_balance_weights": (q_domain_balance_weights, SQL_DOMAIN_BALANCE_WEIGHTS),
    "waterfill_allocation": (q_waterfill_allocation, SQL_WATERFILL_ALLOCATION),
    "canonical_text_dedup": (q_canonical_text_dedup, SQL_CANONICAL_TEXT_DEDUP),
    "char_entropy_filter": (q_char_entropy_filter, SQL_CHAR_ENTROPY_FILTER),
    "training_shard_assign": (q_training_shard_assign, SQL_TRAINING_SHARD_ASSIGN),
    "hapax_rate": (q_hapax_rate, SQL_HAPAX_RATE),
}
