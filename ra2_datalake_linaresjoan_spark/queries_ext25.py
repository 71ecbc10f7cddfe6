"""Batch 25 (round 5 extra): method-comparison and composition audits.

- ``dedup_method_venn`` — Venn counts of three dedup policies over the
  same corpus (exact md5, canonicalized md5, 3-gram Jaccard ≥ 0.5
  near-dup): how many docs each flags and every overlap combination.
  The comparison a curation plan runs before picking its dedup tier —
  each flag is the min-id-survivor convention, all three computed with
  the repo's standard shapes (fingerprint shuffles + df-capped
  inverted-index candidates).
- ``mutual_knn_rate`` — mutuality of the 5-NN cosine graph over a
  vector sample: directed top-k edges, mutual pairs, and the mutuality
  rate — the graph-quality statistic that predicts whether
  SemDeDup-style neighborhood pruning is stable. Brute-force scorer is
  the sampled baseline; ANN buckets are the documented scale path.
- ``crosslang_oov_matrix`` — token-occurrence coverage of language B's
  text by language A's vocabulary, for every ordered (A, B) pair: the
  cross-lingual transfer/OOV audit for shared-vocabulary decisions.
  Everything after the postings shuffle is vocabulary-sized.
- ``laspeyres_price_index`` — classic fixed-basket (base-year
  quantities) price index per ship year over the lineitem table:
  Σ pₜ·q₀ / Σ p₀·q₀. Prices are ratios of exact integer cents/quantity
  sums; one scan into part×year aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import ascii_lower

from ra2_datalake_linaresjoan_spark.queries import EMB_CLEAN_SQL, _t


# ---------------------------------------------------------------------------
# dedup_method_venn — policy-overlap audit
# ---------------------------------------------------------------------------

_VENN_J = 0.5
_VENN_DF_CAP = 20


def q_dedup_method_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per combination of (exact, canonical, neardup) duplicate flags:
    doc count. A doc is flagged by a method when a SMALLER-id doc
    matches it under that method (the survivor convention all dedup
    queries share). Near-dup candidates come from the df-capped 3-gram
    inverted index; exact Jaccard ≥ 0.5 verifies. NULL-text docs all
    share a NULL md5 fingerprint — unrelated failed extractions must
    never flag each other, so every dup flag requires a NON-NULL
    fingerprint (lockstep on both engines)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", ascii_lower("text").alias("t"))
    fp_exact = base.select("doc_id", F.md5("t").alias("fp"))
    canon = F.md5(F.trim(F.regexp_replace("t", "[^a-z0-9]+", " ")))
    fp_canon = base.select("doc_id", canon.alias("fp"))

    def dup_flag(fp: DataFrame, name: str) -> DataFrame:
        w = Window.partitionBy("fp")
        return fp.select(
            "doc_id",
            (
                F.col("fp").isNotNull()
                & (F.col("doc_id") > F.min("doc_id").over(w))
            ).alias(name),
        )

    ex = dup_flag(fp_exact, "exact")
    ca = dup_flag(fp_canon, "canonical")

    # df cap = candidate generation only; exact Jaccard runs over the
    # FULL shingle sets via in-row intersection (the same self-
    # consistency discipline as minhash_error_audit)
    words = base.select(
        "doc_id", F.filter(F.split("t", "[^a-z]+"), lambda x: x != "").alias("w")
    )
    sh_arr = (
        words.filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 3),
                    lambda j: F.concat_ws(" ", F.slice("w", j + 1, 3)),
                )
            ).alias("sh"),
        )
        .localCheckpoint()
    )
    sh = sh_arr.select("doc_id", F.explode("sh").alias("shingle"))
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(df_tab.filter(F.col("df") <= _VENN_DF_CAP), "shingle")
    cand = (
        kept.alias("a")
        .join(kept.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh_arr.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = sh_arr.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    ns = F.size(F.array_intersect("sha", "shb"))
    near_pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(ns / (F.size("sha") + F.size("shb") - ns) >= _VENN_J)
    )
    near_docs = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    ne = docs.select("doc_id").join(
        near_docs.withColumn("neardup", F.lit(True)), "doc_id", "left"
    ).select("doc_id", F.coalesce("neardup", F.lit(False)).alias("neardup"))

    return (
        ex.join(ca, "doc_id")
        .join(ne, "doc_id")
        .groupBy("exact", "canonical", "neardup")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("exact", "canonical", "neardup")
    )


SQL_DEDUP_METHOD_VENN = """
WITH base AS (
  SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
), ex AS (
  SELECT doc_id,
         t IS NOT NULL
         AND doc_id > min(doc_id) OVER (PARTITION BY md5(t)) AS exact
  FROM base
), ca AS (
  SELECT doc_id,
         t IS NOT NULL
         AND doc_id > min(doc_id) OVER (
           PARTITION BY md5(trim(regexp_replace(t, '[^a-z0-9]+', ' ', 'g'), ' '))
         ) AS canonical
  FROM base
), words AS (
  SELECT doc_id, list_filter(regexp_split_to_array(t, '[^a-z]+'), x -> x <> '') AS w
  FROM base
), sh_arr AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      j -> array_to_string(w[j:j+2], ' '))) AS sh
  FROM words WHERE len(w) >= 3
), sh AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh_arr
), df_tab AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
), kept AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN df_tab USING (shingle) WHERE df <= 20
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
), near_docs AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM cand
  JOIN sh_arr sa ON doc_a = sa.doc_id
  JOIN sh_arr sb ON doc_b = sb.doc_id
  WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
), flags AS (
  SELECT ex.doc_id, ex.exact, ca.canonical,
         coalesce(nd.doc_id IS NOT NULL, FALSE) AS neardup
  FROM ex JOIN ca USING (doc_id)
  LEFT JOIN near_docs nd USING (doc_id)
)
SELECT exact, canonical, neardup, CAST(count(*) AS BIGINT) AS n_docs
FROM flags
GROUP BY 1, 2, 3
ORDER BY exact, canonical, neardup
"""


# ---------------------------------------------------------------------------
# mutual_knn_rate — neighborhood-graph mutuality
# ---------------------------------------------------------------------------


def q_mutual_knn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutuality of the 5-NN cosine graph over the every-5th-vector
    sample: directed edges where BOTH endpoints are sampled, mutual
    (A↔B) pairs among them, and the mutuality rate. High mutuality ⇒
    stable neighborhoods ⇒ SemDeDup-style pruning is well-posed."""
    from ra2_datalake_linaresjoan_spark.llmdata.similarity import cosine_topk

    from ra2_datalake_linaresjoan_spark.queries import _emb_clean

    emb = _emb_clean(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") % 5 == 0)
    top = cosine_topk(qs, emb, k=5).filter(F.col("neighbor_id") % 5 == 0)
    edges = top.select("query_id", "neighbor_id").localCheckpoint()
    rev = edges.select(
        F.col("neighbor_id").alias("query_id"), F.col("query_id").alias("neighbor_id")
    )
    mutual = edges.join(rev, ["query_id", "neighbor_id"]).filter(
        F.col("query_id") < F.col("neighbor_id")
    )
    n_vec = qs.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_directed_edges"))
    n_mutual = mutual.agg(F.count(F.lit(1)).alias("n_mutual_pairs"))
    return (
        n_vec.crossJoin(n_edges)
        .crossJoin(n_mutual)
        .select(
            "n_vectors",
            "n_directed_edges",
            "n_mutual_pairs",
            F.round(
                F.when(
                    F.col("n_directed_edges") != 0,
                    F.lit(2.0)
                    * F.col("n_mutual_pairs")
                    / F.col("n_directed_edges"),
                ),
                4,
            ).alias("mutuality_rate"),
        )
    )


SQL_MUTUAL_KNN_RATE = f"""
WITH embc AS (SELECT * FROM embeddings WHERE {EMB_CLEAN_SQL}),
top AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embc q JOIN embc c ON q.vec_id <> c.vec_id
  WHERE q.vec_id % 5 = 0
  QUALIFY row_number() OVER (PARTITION BY q.vec_id
                             ORDER BY cos_sim DESC, c.vec_id ASC) <= 5
), edges AS (
  SELECT query_id, neighbor_id FROM top WHERE neighbor_id % 5 = 0
), mutual AS (
  SELECT e.query_id, e.neighbor_id
  FROM edges e JOIN edges r
    ON e.query_id = r.neighbor_id AND e.neighbor_id = r.query_id
  WHERE e.query_id < e.neighbor_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embc WHERE vec_id % 5 = 0)
         AS n_vectors,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_directed_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM mutual) AS n_mutual_pairs,
       round(CASE WHEN (SELECT count(*) FROM edges) = 0 THEN NULL
             ELSE 2.0 * (SELECT count(*) FROM mutual)
                  / (SELECT count(*) FROM edges) END, 4) AS mutuality_rate
"""


# ---------------------------------------------------------------------------
# crosslang_oov_matrix — cross-lingual vocabulary coverage
# ---------------------------------------------------------------------------


def q_crosslang_oov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ordered language pair (vocab_lang, text_lang): the share
    of text_lang's token OCCURRENCES covered by vocab_lang's vocabulary.
    Diagonal = 1 by construction; off-diagonal is the transfer/OOV
    read. Postings shuffle once; the coverage join is
    vocabulary-keyed. Tokenization = the shared ``ascii_words``
    contract (round-11 unicode-fuzz)."""
    from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
        ascii_words,
    )

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(ascii_words(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    wc = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    # (lang, word) is already unique after the groupBy — no distinct needed
    vocab = wc.select(F.col("lang").alias("vocab_lang"), "word")
    totals = wc.groupBy("lang").agg(F.sum("n").alias("total"))
    covered = (
        wc.join(vocab, "word")
        .groupBy("vocab_lang", F.col("lang").alias("text_lang"))
        .agg(F.sum("n").alias("cov"))
    )
    # full ordered grid so fully-OOV pairs report 0.0 instead of
    # silently vanishing from the matrix
    langs = totals.select("lang")
    grid = langs.select(F.col("lang").alias("vocab_lang")).crossJoin(
        langs.select(F.col("lang").alias("text_lang"))
    )
    return (
        grid.join(covered, ["vocab_lang", "text_lang"], "left")
        .join(totals, grid["text_lang"] == totals["lang"])
        .select(
            "vocab_lang",
            "text_lang",
            F.round(
                F.coalesce(F.col("cov"), F.lit(0)) / F.col("total"), 6
            ).alias("covered_share"),
        )
        .orderBy("vocab_lang", "text_lang")
    )


SQL_CROSSLANG_OOV_MATRIX = """
WITH tok AS (
  SELECT lang, t.word
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word) t
  WHERE t.word <> ''
), wc AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2
), vocab AS (
  SELECT lang AS vocab_lang, word FROM wc
), totals AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS total FROM wc GROUP BY 1
), covered AS (
  SELECT v.vocab_lang, w.lang AS text_lang, CAST(sum(w.n) AS BIGINT) AS cov
  FROM wc w JOIN vocab v USING (word)
  GROUP BY 1, 2
), grid AS (
  SELECT a.lang AS vocab_lang, b.lang AS text_lang
  FROM totals a CROSS JOIN totals b
)
SELECT g.vocab_lang, g.text_lang,
       round(CAST(coalesce(cov, 0) AS DOUBLE) / total, 6) AS covered_share
FROM grid g
LEFT JOIN covered c ON g.vocab_lang = c.vocab_lang AND g.text_lang = c.text_lang
JOIN totals t ON g.text_lang = t.lang
ORDER BY g.vocab_lang, g.text_lang
"""


# ---------------------------------------------------------------------------
# laspeyres_price_index — fixed-basket price index by ship year
# ---------------------------------------------------------------------------


def q_laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship year (base = earliest year):
    L_t = Σ pₜ(part)·q₀(part) / Σ p₀(part)·q₀(part) over parts traded in
    both the base year and year t; p = total cents / total quantity per
    (part, year) — exact integer sums, float only in the final ratios.
    Index at 4 dp alongside the basket size.

    Row hygiene in lockstep: rows missing shipdate/quantity/price drop
    up front (a NULL quantity would add cents to c but nothing to q,
    silently inflating the unit price on both engines), zero-quantity
    (part, year) cells have no defined price and are excluded, an
    all-zero base basket yields a NULL index instead of ANSI DIV/0,
    and NaN/±Inf quantities/prices raise on the integer casts in both
    engines (round-11 value-fuzz → money_case)."""
    from ra2_datalake_linaresjoan_spark.operators.filters import money_case

    li = money_case(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    ).where(F.col("l_shipdate").isNotNull())
    py = (
        li.select(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("l_partkey", "yr")
        .agg(F.sum("cents").alias("c"), F.sum("qty").alias("q"))
    ).localCheckpoint().where(F.col("q") != 0)
    base_yr = py.agg(F.min("yr").alias("yr0"))
    base = (
        py.join(F.broadcast(base_yr), py["yr"] == base_yr["yr0"])
        .select(
            "l_partkey",
            (F.col("c").cast("double") / F.col("q")).alias("p0"),
            F.col("q").alias("q0"),
        )
    )
    cur = py.select(
        "l_partkey",
        "yr",
        (F.col("c").cast("double") / F.col("q")).alias("pt"),
    )
    j = cur.join(base, "l_partkey")
    return (
        j.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_basket_parts"),
            F.round(
                F.when(
                    F.sum(F.col("p0") * F.col("q0")) != 0,
                    F.sum(F.col("pt") * F.col("q0"))
                    / F.sum(F.col("p0") * F.col("q0")),
                ),
                4,
            ).alias("laspeyres_index"),
        )
        .orderBy("yr")
    )


SQL_LASPEYRES_PRICE_INDEX = """
WITH py0 AS (
  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND (isfinite(l_quantity) AND abs(l_quantity) < 9.2e16)
    AND (isfinite(l_extendedprice) AND abs(l_extendedprice) < 9.2e16)
  GROUP BY 1, 2
), py AS (SELECT * FROM py0 WHERE q <> 0),
base_yr AS (SELECT min(yr) AS yr0 FROM py),
base AS (
  SELECT l_partkey, CAST(c AS DOUBLE) / q AS p0, q AS q0
  FROM py CROSS JOIN base_yr WHERE yr = yr0
), cur AS (
  SELECT l_partkey, yr, CAST(c AS DOUBLE) / q AS pt FROM py
)
SELECT yr, CAST(count(*) AS BIGINT) AS n_basket_parts,
       round(CASE WHEN sum(p0 * q0) = 0 THEN NULL
             ELSE sum(pt * q0) / sum(p0 * q0) END, 4) AS laspeyres_index
FROM cur JOIN base USING (l_partkey)
GROUP BY yr
ORDER BY yr
"""


REGISTRY_EXT25: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "dedup_method_venn": (q_dedup_method_venn, SQL_DEDUP_METHOD_VENN),
    "mutual_knn_rate": (q_mutual_knn_rate, SQL_MUTUAL_KNN_RATE),
    "crosslang_oov_matrix": (q_crosslang_oov_matrix, SQL_CROSSLANG_OOV_MATRIX),
    "laspeyres_price_index": (q_laspeyres_price_index, SQL_LASPEYRES_PRICE_INDEX),
}
