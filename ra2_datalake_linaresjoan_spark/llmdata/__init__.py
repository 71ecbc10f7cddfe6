"""LLM-training-data pipeline operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, incremental batch-vs-corpus), similarity search
over embedding columns, text analysis (language-ID, quality scoring,
token counting, fingerprinting, PII redaction), corpus composition
(sequence packing, benchmark contamination, domain mixing), and
multimodal binary-column plumbing — all designed as distributed
DataFrame plans that hold at 100 TB.
"""

from ra2_datalake_linaresjoan_spark.llmdata.text_analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    pii_counts,
    quality_score,
    redact_pii,
    whitespace_token_count,
)
from ra2_datalake_linaresjoan_spark.llmdata.dedup import (
    exact_dedup,
    incremental_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from ra2_datalake_linaresjoan_spark.llmdata.similarity import (
    cosine_topk,
    lsh_bucket_ann,
)
from ra2_datalake_linaresjoan_spark.llmdata.packing import pack_sequences
from ra2_datalake_linaresjoan_spark.llmdata.contamination import (
    contaminated_ids,
    contamination_report,
)

__all__ = [
    "bpe_ish_token_count",
    "doc_fingerprint",
    "language_id",
    "pii_counts",
    "quality_score",
    "redact_pii",
    "whitespace_token_count",
    "exact_dedup",
    "incremental_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash",
    "cosine_topk",
    "lsh_bucket_ann",
    "pack_sequences",
    "contaminated_ids",
    "contamination_report",
]
