"""Semantic invariants of the round-4 operators — properties the oracle
parity check cannot express (it only proves Spark == DuckDB, not that
both are RIGHT). Each test pins a mathematical contract of the operator
on real testdata."""

from __future__ import annotations

import math

import pytest

from ra2_datalake_linaresjoan_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_waterfill_conserves_budget_and_caps(spark):
    """Water-filling must (a) never allocate past a source's capacity,
    (b) spend the whole budget when budget ≤ Σ caps, (c) saturate
    exactly the sources whose capacity is below the waterline."""
    rows = q.queries()["waterfill_allocation"](spark, SF).collect()
    assert rows
    total_cap = sum(r["cap"] for r in rows)
    budget = math.floor(total_cap * 0.6)
    for r in rows:
        assert r["alloc_tokens"] <= r["cap"] + 1e-6
        assert (r["alloc_tokens"] >= r["cap"] - 0.01) == r["saturated"]
    # conservation: rounded per-source allocations sum to the budget
    # within n_sources cents of rounding slack
    assert abs(sum(r["alloc_tokens"] for r in rows) - budget) <= len(rows) * 0.01


def test_cms_never_underestimates(spark):
    """Count-min sketches overestimate, never underestimate — the min
    over depth rows is still the sum of the word's own count plus
    non-negative collision mass."""
    rows = q.queries()["cms_heavy_hitters"](spark, SF).collect()
    assert rows
    assert all(r["n_est"] >= r["n_exact"] for r in rows)
    assert all(r["overestimate"] == r["n_est"] - r["n_exact"] for r in rows)


def test_char_entropy_bounds(spark):
    """0 ≤ H ≤ ln(alphabet size): character entropy can never exceed
    the uniform bound over the observed alphabet."""
    df = q.queries()["char_entropy_filter"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows[:50]:
        assert -1e-9 <= r["char_entropy"] <= math.log(128) + 1e-9


def test_gini_in_unit_interval(spark):
    row = q.queries()["gini_spend"](spark, SF).collect()[0]
    assert 0.0 <= row["gini"] < 1.0


def test_revenue_deciles_partition_and_monotone(spark):
    """Deciles must cover all customers, revenue shares sum to 1, and
    cumulative share is monotone with decile 1 the largest spender
    bucket (ntile ordered desc)."""
    rows = sorted(
        q.queries()["revenue_decile_lift"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    shares = [r["revenue_share"] for r in rows]
    assert shares[0] == max(shares)
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6


def test_bm25_scores_positive_and_ranked(spark):
    rows = q.queries()["bm25_topk"](spark, SF).collect()
    assert rows
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_kl_nonnegative(spark):
    """KL(P‖Q) ≥ 0 (Gibbs) — a negative value means the implementation
    is not a divergence."""
    rows = q.queries()["kl_divergence_sources"](spark, SF).collect()
    assert rows
    assert all(r["kl_nats"] >= -1e-4 for r in rows)


def test_canonical_dedup_catches_noisy_reingest(spark):
    """Every noisy re-ingested doc (uppercased + punctuation) must land
    in a group with its original: groups == count of doc_id % 7 == 0
    docs (absent organic canonical dups, each group has exactly 2
    members and a NEGATIVE keeper id)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_sevens = docs.filter("doc_id % 7 = 0").count()
    rows = q.queries()["canonical_text_dedup"](spark, SF).collect()
    assert len(rows) == n_sevens
    assert all(r["n_copies"] == 2 and r["keeper_id"] < 0 for r in rows)


def test_jaccard_bounds_and_symmetric_pairs(spark):
    rows = q.queries()["nation_jaccard"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n1"] < r["n2"]


def test_zipf_slope_negative(spark):
    """Rank-frequency slope must be negative for any text where
    frequencies decrease with rank."""
    rows = q.queries()["zipf_fit"](spark, SF).collect()
    assert rows
    assert all(r["zipf_slope"] < 0 for r in rows)


def test_chi2_nonnegative_dof(spark):
    row = q.queries()["chi2_independence"](spark, SF).collect()[0]
    assert row["chi2"] >= 0
    assert row["dof"] > 0
    assert row["n_cells"] <= row["n_events"]


def test_shard_assign_covers_all_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = q.queries()["training_shard_assign"](spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(0 <= r["shard"] < 16 for r in rows)


def test_trigram_path_count_consistency(spark):
    """Total trigram occurrences = Σ_user max(0, n_events_user - 2);
    the top-20 cannot exceed that total."""
    ev_counts = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
        .collect()
    )
    total_trigrams = sum(max(0, r["count"] - 2) for r in ev_counts)
    rows = q.queries()["event_trigram_paths"](spark, SF).collect()
    assert sum(r["n_paths"] for r in rows) <= total_trigrams


def test_winnow_guarantee_shared_substring(spark, tmp_path):
    """Winnowing's contract: two documents sharing a substring of length
    ≥ k + w - 1 (= 11 chars) MUST share at least one fingerprint."""
    shared = "zqxwvutsrqpo"  # 12 chars, unlikely elsewhere
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee", "en", "s0", 40),
            (2, "ffff gggg " + shared + " hhhh iiii jjjj", "en", "s0", 40),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    rows = q.queries()["winnow_fingerprints"](spark, d).collect()
    assert any(r["d1"] == 1 and r["d2"] == 2 and r["n_shared_fps"] >= 1 for r in rows)


def test_chunk_overlap_detected_covers_expected(spark):
    """Content detection must find every positionally-adjacent overlap
    (the chunker's invariant); extras are accidental key collisions or
    cross-doc boilerplate."""
    row = q.queries()["chunk_overlap_audit"](spark, SF).collect()[0]
    assert row["n_expected"] > 0
    assert row["n_detected"] >= row["n_expected"]
    assert row["n_cross_doc"] <= row["n_detected"] - 0


def test_split_assign_partitions_corpus(spark):
    """Splits must cover every doc exactly once per language, shares sum
    to 1, and the hash assignment is deterministic across runs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = q.queries()["stratified_split_assign"](spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["observed_share"]
    assert all(abs(s - 1.0) < 1e-4 for s in by_lang.values())
    again = q.queries()["stratified_split_assign"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_padding_sweep_conservation_and_monotone(spark):
    """tokens_kept + tokens_truncated must equal the corpus total at
    every L, and kept/utilization move monotonically with L."""
    rows = sorted(
        q.queries()["padding_waste_sweep"](spark, SF).collect(),
        key=lambda r: r["max_len"],
    )
    totals = {r["max_len"]: r["tokens_kept"] + r["tokens_truncated"] for r in rows}
    assert len(set(totals.values())) == 1  # same corpus total at every L
    kept = [r["tokens_kept"] for r in rows]
    assert kept == sorted(kept)
    for r in rows:
        assert 0.0 < r["utilization"] <= 1.0
        assert r["padding_waste"] == r["n_docs"] * r["max_len"] - r["tokens_kept"]


def test_skew_diagnosis_invariants(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = {r["table_name"]: r for r in q.queries()["skew_diagnosis"](spark, SF).collect()}
    assert rows["lineitem"]["n_rows"] == li.count()
    for r in rows.values():
        assert r["skew_factor"] >= 1.0
        assert r["max_freq"] >= r["p99_freq"] >= 0
        assert r["n_keys"] <= r["n_rows"]


def test_dedup_sweep_monotone_in_threshold(spark):
    """Raising the threshold can only shrink both the pair set and the
    dropped-doc set."""
    rows = sorted(
        q.queries()["dedup_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    pairs = [r["n_pairs"] for r in rows]
    dropped = [r["n_docs_dropped"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert dropped == sorted(dropped, reverse=True)


def test_winnow_recall_of_exact_neardups(spark):
    """Winnowing's candidate ranking must recover the exact-Jaccard
    near-duplicate pairs: at sf0.001 the top-20 shared-fingerprint
    pairs should contain well over half of the exact 3-gram-Jaccard
    >= 0.8 pairs (the guarantee makes misses possible only when a pair
    ranks below the cap, not invisible)."""
    from ra2_datalake_linaresjoan_spark.llmdata.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    assert exact
    winnow = {
        (r["d1"], r["d2"])
        for r in q.queries()["winnow_fingerprints"](spark, SF).collect()
    }
    cap = min(len(winnow), len(exact))
    assert len(exact & winnow) >= 0.6 * cap


def test_survival_curve_monotone(spark):
    """Raising the duration threshold can only shrink the surviving set;
    shares live in [0, 1]."""
    rows = sorted(
        q.queries()["session_survival_curve"](spark, SF).collect(),
        key=lambda r: r["threshold_min"],
    )
    assert rows
    surv = [r["n_surviving"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert all(0.0 <= r["survival_share"] <= 1.0 for r in rows)
    assert len({r["n_sessions_total"] for r in rows}) == 1


def test_dup_inflation_consistent_with_exact_dedup(spark):
    """Σ copies across sources must equal total docs minus distinct
    fingerprints (the exact-dedup survivor count)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_fps = docs.selectExpr("md5(text) AS fp").distinct().count()
    rows = q.queries()["dup_inflation_by_source"](spark, SF).collect()
    assert sum(r["n_copies"] for r in rows) == n_docs - n_fps
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_conditional_entropy_never_exceeds_unigram(spark):
    """Conditioning never increases entropy: H(w2|w1) <= H(w) per
    language, both nonnegative."""
    rows = q.queries()["ngram_entropy_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["bigram_cond_entropy"] <= r["unigram_entropy"] + 1e-9


def test_inter_event_percentiles_ordered(spark):
    rows = q.queries()["inter_event_time_dist"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p50_s"] <= r["p90_s"] <= r["p99_s"]
