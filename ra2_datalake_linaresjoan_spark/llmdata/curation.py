"""End-to-end training-corpus curation — the composite LLM-data pipeline
the individual llmdata operators exist for.

``curate_corpus``: documents → exact dedup (md5 fingerprint, min-id
survivor) → near-duplicate removal (drop any doc with a smaller-id
neighbor at Jaccard ≥ τ) → quality floor → language allowlist → curated
rows with quality/token metadata.

Order is fixed and documented (exact dedup first, near-dup pairs computed
over the full corpus so removal is independent of the exact-dedup pass,
then scalar filters). Every stage is a DataFrame op; at 100 TB swap the
exact-Jaccard pair stage for ``minhash_lsh_candidates`` (same output
contract, LSH cost profile) via ``use_lsh=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
    quality_score,
    whitespace_token_count,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    shingle_n: int = 3,
    use_lsh: bool = False,
) -> DataFrame:
    """Curated corpus rows: (id, lang, quality, ws_tokens).

    Stage ORDER matters: scalar filters (quality floor, language
    allowlist) run BEFORE near-dup removal. The min-id near-dup rule is
    quality-blind — with the old dedup-first order, a high-quality doc
    could be dropped for near-duplicating a LOWER-quality smaller-id doc
    that the quality floor then removed anyway, erasing the content from
    the corpus entirely. Filtering first also shrinks the expensive
    pair-generation input (cheaper at any scale)."""
    # 1. exact dedup — deterministic min-id survivor (exact copies have
    # identical text, hence identical quality: no cross-quality loss here)
    survivors = exact_dedup(docs, id_col, text_col)

    # 2. scalar filters + metadata (pure expressions, scan-speed)
    scored = survivors.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(text_col),
        quality_score(F.col(text_col)).alias("quality"),
        whitespace_token_count(F.col(text_col)).alias("ws_tokens"),
    ).filter(F.col("quality") >= min_quality)
    if langs:
        scored = scored.filter(F.col(lang_col).isin(*langs))

    # 3. near-dup removal among the REMAINING docs: any doc with a
    # smaller-id near-duplicate that also passed the filters drops
    pair_fn = minhash_lsh_candidates if use_lsh else ngram_jaccard_pairs
    pairs = pair_fn(
        scored, id_col, text_col, n=shingle_n, threshold=jaccard_threshold
    )
    dropped = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return scored.join(dropped, id_col, "left_anti").select(
        id_col, lang_col, "quality", "ws_tokens"
    )
