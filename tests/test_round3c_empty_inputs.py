"""Empty-input robustness for the round-3-continuation operators: every
new query must execute (not raise) over structurally-identical EMPTY
tables — the degenerate partition every 100-TB job eventually meets
(empty date partition, freshly-truncated table, all-rows-filtered
branch)."""

from __future__ import annotations

import os

import pytest

from ra2_datalake_linaresjoan_spark import queries as q

SF = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "ohlc_bars",
    "linear_interp_gaps",
    "markov_transitions",
    "k_anonymity",
    "zorder_layout",
    "event_rate_anomaly",
    "spmm_topics",
    "bloom_dedup",
    "bpe_encode",
    "corpus_datacard",
    "pca_power_iteration",
    "skyline_pareto",
    "approx_quantile_guarantee",
    "vocab_oov_rate",
    "split_leakage_audit",
    "emb_norm_outliers",
    "feature_store_pit",
    "bellman_ford_routes",
    "edit_distance_match",
    "l_diversity",
    "ngram_novelty",
    "cross_source_dups",
    "join_cardinality",
    "time_travel_scd2",
    "linear_attribution",
    "ab_test_readout",
    "ks_distance",
    "code_switch_score",
    "tokenizer_fertility",
    "association_rules",
    "fingerprint_cluster_histogram",
    "funnel_time_to_convert",
    "exact_corr_moments",
    # round-4 additions: queries whose implementation changed (the
    # contamination lazy rewrite's empty-train contract is exactly what
    # this suite exists to pin)
    "contamination",
]


def test_contamination_empty_train_rate_is_zero(spark, empty_sf):
    """The lazy rewrite must keep the pre-lazy contract: an empty train
    set reports contamination_rate 0.0, not NULL (bare engine-side
    division by zero yields NULL in both Spark and DuckDB)."""
    row = q.queries()["contamination"](spark, empty_sf).collect()[0]
    assert row["n_train"] == 0
    assert row["contamination_rate"] == 0.0


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for f in os.listdir(SF):
        if f.endswith(".parquet"):
            df = spark.read.parquet(os.path.join(SF, f))
            df.limit(0).write.mode("overwrite").parquet(str(d / f))
    return str(d)


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_new_query_survives_empty_tables(spark, empty_sf, name):
    # bellman_ford seeds node 0 itself; everything else must yield an
    # empty (or seed-only) frame without raising
    n = q.queries()[name](spark, empty_sf).count()
    assert n >= 0
