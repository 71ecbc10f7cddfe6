"""LLM batch 15 (round 6): retrieval composition — Maximal Marginal
Relevance (MMR) diverse re-ranking, the greedy submodular selection
operator RAG retrieval stacks run between "rank by relevance" and "put
in the context window". Spark has no native greedy-selection operator;
this one composes the repo's BM25 ranking with embedding similarity:

    pick_i = argmax over remaining candidates of
             λ·relevance − (1−λ)·max_{s ∈ selected} sim(candidate, s)

Parity discipline (the whole reason this is oracle-checkable): the
greedy argmax compares SCORES, and a 1-ulp float divergence can flip a
pick, so every input to the comparison is derived from exact integers —
relevance is the (pool_size+1 − rank)/pool_size rational of the BM25
rank (BM25 itself is rounded at 4 dp before ranking, the proven-stable
``bm25_topk`` contract), and similarity numerators are integer dot
products of 127-scaled quantized embeddings (the ``embedding_quantize``
trick); the only floats are correctly-rounded sqrt/divide of identical
integers, bit-equal on both engines. Ties break on doc_id.

Scale: the candidate pool is a TakeOrderedAndProject top-50 (never a
global sort), the pool joins its vectors once, and the greedy loop is
in-row over one 50-element array — O(K·pool·dim) scalar work on one
row. The DuckDB oracle unrolls the K = 10 picks as chained CTEs (each
a LIMIT-1 argmax over the not-yet-picked pool) because recursive CTEs
cannot aggregate over the recursive reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _emb_clean, _t
from ra2_datalake_linaresjoan_spark.queries_llm10 import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    bm25_scores,
)

_MMR_K = 10
_MMR_POOL = 50
_MMR_LAMBDA = 0.7
_MMR_QSCALE = 127

def _bm25_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`_MMR_POOL` docs by the SHARED ``bm25_scores`` contract
    (4-dp-rounded score, doc_id tie-break), with their pool rank —
    one scoring implementation for bm25_topk AND this pool (round-9
    review de-duplication)."""
    top = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_MMR_POOL)
    )
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return top.select("doc_id", "bm25", F.row_number().over(w).alias("rank"))


def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (pick 1..10): MMR-selected diverse top-k from the BM25
    top-50 pool (λ = 0.7), with each pick's rank-based relevance and
    its MMR score at selection time. Docs without a vector drop from
    the pool (inner join) but keep their BM25 rank for relevance.
    The vector side routes through _emb_clean/EMB_CLEAN_SQL in
    lockstep (round-8 parity audit: dirty vectors flipped pick order)."""
    pool = _bm25_pool(spark, sf_dir)
    emb = _emb_clean(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.transform(
            "embedding",
            lambda x: F.round(x * _MMR_QSCALE).cast("int"),
        ).alias("q"),
    )

    def idot_expr(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")

    cand = pool.join(emb, "doc_id").select(
        "doc_id",
        (
            (F.lit(_MMR_POOL + 1) - F.col("rank")) / F.lit(float(_MMR_POOL))
        ).alias("rel"),
        "q",
        F.sqrt(idot_expr(F.col("q"), F.col("q"))).alias("nrm"),
    )
    # BOUNDED collect (<= pool = 50 rows at any corpus size; the
    # quantization, norm, and rel rational stay Spark-side above) and a
    # driver-side greedy loop: the K = 10 picks are O(K·pool·dim)
    # scalar work on ONE bounded row whichever engine runs them, and
    # the r9 in-row F.aggregate-over-sequence form paid whole-stage-
    # codegen compile for its 10x-nested expression tree every call
    # (round-10 A/B sf0.1: 1.68 -> 1.53 min-of-5 ab_bench; 1.22
    # min-of-3 idle — the residual floor is the shared bm25_scores
    # scan at ~0.65-0.77 s, not the greedy). Float
    # parity is unchanged: integer dot products, and Python's IEEE
    # double *, /, sqrt are the same correctly-rounded ops the JVM and
    # DuckDB execute on the identical integer inputs.
    rows = cand.collect()
    pool_py = [
        (r["doc_id"], r["rel"], r["q"], r["nrm"]) for r in rows
    ]
    selected: list[tuple[int, float, float]] = []  # (doc_id, rel, mmr)
    sel_vecs: list[tuple[list[int], float]] = []
    remaining = dict((d, (rel, qv, nrm)) for d, rel, qv, nrm in pool_py)
    for _pick in range(min(_MMR_K, len(pool_py))):
        best = None
        for d in remaining:
            rel, qv, nrm = remaining[d]
            if sel_vecs:
                maxsim = max(
                    (
                        sum(x * y for x, y in zip(qv, sq)) / (nrm * snrm)
                        if nrm > 0 and snrm > 0
                        else 0.0
                    )
                    for sq, snrm in sel_vecs
                )
            else:
                maxsim = 0.0
            m = _MMR_LAMBDA * rel - (1.0 - _MMR_LAMBDA) * maxsim
            key = (m, -d)
            if best is None or key > best[0]:
                best = (key, d, rel, m)
        _, d, rel, m = best
        _rel, qv, nrm = remaining.pop(d)
        selected.append((d, rel, m))
        sel_vecs.append((qv, nrm))
    out = spark.createDataFrame(
        [
            (i + 1, int(d), float(rel), float(m))
            for i, (d, rel, m) in enumerate(selected)
        ],
        "pick int, doc_id bigint, rel double, mmr_score double",
    )
    # final 6-dp rounding stays Spark-side: F.round is the same
    # HALF_UP both engines already agree on (Python's round() is
    # banker's and would diverge on ties)
    return out.select(
        "pick",
        "doc_id",
        F.round("rel", 6).alias("rel"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


def _mmr_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)

    def sim(p: str) -> str:
        return (
            f"CASE WHEN c.nrm > 0 AND {p}.nrm > 0 THEN "
            f"CAST(list_sum(list_transform(range(1, len(c.q) + 1), "
            f"i -> c.q[i] * {p}.q[i])) AS DOUBLE) / (c.nrm * {p}.nrm) "
            f"ELSE CAST(0.0 AS DOUBLE) END"
        )

    lam = f"CAST({_MMR_LAMBDA!r} AS DOUBLE)"
    one_m_lam = f"CAST({1.0 - _MMR_LAMBDA!r} AS DOUBLE)"
    picks = [
        f"pick_1 AS MATERIALIZED (\n"
        f"  SELECT c.doc_id, c.rel, c.q, c.nrm, {lam} * c.rel AS mmr\n"
        f"  FROM cands c ORDER BY {lam} * c.rel DESC, c.doc_id LIMIT 1\n)"
    ]
    for k in range(2, _MMR_K + 1):
        prev = [f"pick_{j}" for j in range(1, k)]
        froms = ", ".join(["cands c"] + [f"{p} {p}" for p in prev])
        notin = ", ".join(f"{p}.doc_id" for p in prev)
        sims = ", ".join(sim(p) for p in prev)
        maxsim = sims if len(prev) == 1 else f"greatest({sims})"
        picks.append(
            f"pick_{k} AS MATERIALIZED (\n"
            f"  SELECT c.doc_id, c.rel, c.q, c.nrm,\n"
            f"         {lam} * c.rel - {one_m_lam} * ({maxsim}) AS mmr\n"
            f"  FROM {froms}\n"
            f"  WHERE c.doc_id NOT IN ({notin})\n"
            f"  ORDER BY mmr DESC, c.doc_id LIMIT 1\n)"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS pick, doc_id, round(rel, 6) AS rel, "
        f"round(mmr, 6) AS mmr_score FROM pick_{k}"
        for k in range(1, _MMR_K + 1)
    )
    picks_sql = ",\n".join(picks)
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, t.word
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
), dl AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), coll AS MATERIALIZED (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM tok) AS n_tok
), tf AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE word IN ({terms})
  GROUP BY doc_id, word
), df AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), bm AS MATERIALIZED (
  SELECT tf.doc_id,
         round(sum(
           ln((coll.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1!r} + 1.0))
           / (tf.tf + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                     + {_BM25_B!r} * dl.dl
                       / (CAST(coll.n_tok AS DOUBLE) / coll.n_docs)))
         ), 4) AS bm25
  FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN coll
  GROUP BY tf.doc_id
), pool AS MATERIALIZED (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_MMR_POOL})
), cands AS MATERIALIZED (
  SELECT pool.doc_id,
         CAST({_MMR_POOL + 1} - rank AS DOUBLE) / {_MMR_POOL} AS rel,
         list_transform(embedding,
                        x -> CAST(round(x * {_MMR_QSCALE}) AS INT)) AS q,
         sqrt(CAST(list_sum(list_transform(embedding,
              x -> CAST(round(x * {_MMR_QSCALE}) AS INT)
                   * CAST(round(x * {_MMR_QSCALE}) AS INT))) AS DOUBLE)) AS nrm
  FROM pool
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE {EMB_CLEAN_SQL})
    AS embeddings ON pool.doc_id = embeddings.vec_id
), {picks_sql}
SELECT * FROM (
{unions}
) ORDER BY pick
"""


SQL_MMR_DIVERSE_TOPK = _mmr_sql()


REGISTRY_LLM15: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "mmr_diverse_topk": (q_mmr_diverse_topk, SQL_MMR_DIVERSE_TOPK),
}
