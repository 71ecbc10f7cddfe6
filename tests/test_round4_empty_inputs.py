"""Empty-input robustness for the round-4 batches (LLM batch 10 +
relational batch 15): every new query must execute (not raise) over
structurally-identical EMPTY tables — the degenerate partition every
100-TB job eventually meets."""

from __future__ import annotations

import os

import pytest

from ra2_datalake_linaresjoan_spark import queries as q

SF = "/root/testdata/sf0.001"

ROUND4_QUERIES = [
    "bm25_topk",
    "cms_heavy_hitters",
    "domain_balance_weights",
    "waterfill_allocation",
    "canonical_text_dedup",
    "char_entropy_filter",
    "training_shard_assign",
    "hapax_rate",
    "event_trigram_paths",
    "revenue_decile_lift",
    "dow_seasonality",
    # batch 2 (LLM batch 11 + relational batch 16)
    "kl_divergence_sources",
    "bigram_lm_perplexity",
    "tfidf_cosine_pairs",
    "robust_scaler_embeddings",
    "chi2_independence",
    "nation_jaccard",
    "zipf_fit",
    "gini_spend",
    # batch 3 (LLM batch 12)
    "winnow_fingerprints",
    "chunk_overlap_audit",
    "dedup_threshold_sweep",
    # batch 4 (LLM batch 13 + relational batch 17)
    "stratified_split_assign",
    "padding_waste_sweep",
    "skew_diagnosis",
    "multimodal_real_decode",
    "audio_real_decode",
    "vocab_coverage_curve",
    "session_survival_curve",
    "dup_inflation_by_source",
    # batch 19 (round-4 close)
    "ngram_entropy_rate",
    "inter_event_time_dist",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf_r4")
    for f in os.listdir(SF):
        if f.endswith(".parquet"):
            df = spark.read.parquet(os.path.join(SF, f))
            df.limit(0).write.mode("overwrite").parquet(str(d / f))
    return str(d)


@pytest.mark.parametrize("name", ROUND4_QUERIES)
def test_round4_query_survives_empty_tables(spark, empty_sf, name):
    n = q.queries()[name](spark, empty_sf).count()
    assert n >= 0


def test_char_entropy_zero_length_text(spark, tmp_path):
    """Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — the
    length guard must keep zero-length texts at entropy 0.0 instead of
    dividing by zero (DuckDB's range(1,1) is empty, so without the
    shared guard the engines would diverge)."""
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "", "en", "s0", 0), (2, "aaab", "en", "s0", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in q.queries()["char_entropy_filter"](spark, d).collect()
    }
    assert rows[1]["char_entropy"] == 0.0
    assert rows[2]["char_entropy"] > 0.5 and rows[2]["low_entropy"]
