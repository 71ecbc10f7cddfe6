"""Round-6 targeted pins: degenerate-input semantics for the batch-26
sketch kernels (round-5 verdict ask #5), the shared Bloom hash-family
guard (ADVICE r5), and the deduped-quantile decile contract of
``revenue_decile_lift``'s large path (ADVICE r5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.streaming.sketches import (
    bloom_bits,
    bloom_probe,
    hll_estimate,
)


# ---------------------------------------------------------------------------
# HLL: zero observations
# ---------------------------------------------------------------------------


def test_hll_estimate_zero_events_is_zero(spark):
    """No observations → no registers set → linear counting gives
    m·ln(m/m) = 0 exactly; the estimate must be 0, not NaN/None."""
    regs = spark.createDataFrame([], schema="register long, rho int")
    row = hll_estimate(regs).collect()[0]
    assert row["n_registers_set"] == 0
    assert row["estimate"] == 0.0


# ---------------------------------------------------------------------------
# Bloom: empty bit set, builder/prober agreement, shared k-guard
# ---------------------------------------------------------------------------


def test_bloom_probe_empty_bitset_all_false(spark):
    """Probing an EMPTY filter must report maybe_member = false for
    every key (an empty corpus contains nothing) — never null, never a
    crash. This is the empty-fingerprint-corpus case of the membership
    audit."""
    bits = spark.createDataFrame([], schema="bit long")
    probes = spark.createDataFrame([(f"k{i}",) for i in range(5)], ["k"])
    rows = bloom_probe(bits, probes, "k").collect()
    assert len(rows) == 5
    assert all(r["maybe_member"] is False for r in rows)


def test_bloom_no_false_negatives_roundtrip(spark):
    """Every inserted key must probe as maybe-member (the Bloom
    guarantee) — pinned through the SHARED bit-position helper so the
    builder and prober hash families can never drift."""
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(50)], ["k"])
    bits = bloom_bits(keys, "k").groupBy("bit").agg(F.count(F.lit(1)).alias("n"))
    rows = bloom_probe(bits, keys, "k").collect()
    assert len(rows) == 50
    assert all(r["maybe_member"] is True for r in rows)


def test_bloom_probe_rejects_k_above_md5_slices(spark):
    """bloom_probe must raise on k > 4 exactly like bloom_bits: a 5th
    8-hex md5 slice is empty, conv yields NULL bit columns, and every
    probe would silently report false (false negatives)."""
    bits = spark.createDataFrame([(1,)], ["bit"])
    probes = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError, match="md5 slices"):
        bloom_probe(bits, probes, "k", k=5)
    with pytest.raises(ValueError, match="md5 slices"):
        bloom_bits(probes, "k", k=5)


def test_bloom_probe_k4_is_the_last_valid_slice(spark):
    """k = 4 uses the final full 8-hex md5 word and must still satisfy
    the no-false-negative roundtrip."""
    keys = spark.createDataFrame([(f"k4-{i}",) for i in range(20)], ["k"])
    bits = bloom_bits(keys, "k", k=4).groupBy("bit").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = bloom_probe(bits, keys, "k", k=4).collect()
    assert all(r["maybe_member"] is True for r in rows)


def test_bloom_membership_audit_empty_corpus_well_defined(spark, tmp_path):
    """Empty documents table → the audit still returns its one summary
    row (null counts, no crash) — the degenerate partition contract."""
    import os

    from ra2_datalake_linaresjoan_spark.queries_ext26 import (
        q_bloom_membership_audit,
    )

    src = "/root/testdata/sf0.001"
    d = tmp_path / "empty_sf"
    os.makedirs(d, exist_ok=True)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    docs.limit(0).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = q_bloom_membership_audit(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["n_false_positives"] in (None, 0)


# ---------------------------------------------------------------------------
# batch 27/28 semantic invariants (sf0.01)
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.01"


def _q(spark, name):
    from ra2_datalake_linaresjoan_spark import queries as q

    return q.queries()[name](spark, SF).collect()


def test_neyman_allocation_sums_to_budget(spark):
    rows = _q(spark, "neyman_allocation")
    assert sum(r["alloc"] for r in rows) == 1000
    assert all(r["alloc"] >= 0 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_poisson_bootstrap_ci_brackets_mean(spark):
    row = _q(spark, "poisson_bootstrap_ci")[0]
    assert row["n_boot"] == 40
    assert row["ci_lo_cents"] <= row["mean_cents"] <= row["ci_hi_cents"]
    # CI of a mean over thousands of orders is tight: within ±5 %
    assert row["ci_hi_cents"] - row["ci_lo_cents"] < 0.1 * row["mean_cents"]


def test_jsd_within_ln2(spark):
    import math

    row = _q(spark, "js_divergence_splits")[0]
    assert -1e-9 <= row["jsd_nats"] <= math.log(2) + 1e-9


def test_acf_bounds(spark):
    rows = _q(spark, "acf_daily_events")
    assert rows
    assert all(-1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6 for r in rows)


def test_burstiness_and_simpson_bounds(spark):
    for r in _q(spark, "burstiness_fano"):
        assert r["fano"] > 0
        assert -1.0 - 1e-9 <= r["burstiness"] <= 1.0 + 1e-9
    for r in _q(spark, "simpson_source_diversity"):
        assert 0.0 <= r["simpson"] < 1.0
        assert 1.0 - 1e-9 <= r["effective_sources"] <= r["n_sources"] + 1e-9


def test_gopher_any_rule_dominates(spark):
    rows = {r["rule"]: r for r in _q(spark, "gopher_quality_rules")}
    assert set(rows) == {
        "word_count_range",
        "mean_word_length",
        "type_token_ratio",
        "stopword_presence",
        "any_rule",
    }
    singles = [v["n_fail"] for k, v in rows.items() if k != "any_rule"]
    assert rows["any_rule"]["n_fail"] >= max(singles)
    assert rows["any_rule"]["n_fail"] <= sum(singles)
    assert all(0.0 <= v["fail_rate"] <= 1.0 for v in rows.values())


def test_holt_forecast_is_level_plus_trend(spark):
    row = _q(spark, "holt_linear_forecast")[0]
    assert (
        abs(row["forecast_cents"] - (row["level_cents"] + row["trend_cents"]))
        <= 0.02
    )


def test_runs_test_counts_consistent(spark):
    row = _q(spark, "runs_test_revenue")[0]
    assert 1 <= row["n_runs"] <= row["n_up"] + row["n_down"]
    assert row["expected_runs"] >= 1.0


def test_minhash_bucket_skew_pair_bounds(spark):
    rows = _q(spark, "minhash_bucket_skew")
    assert [r["band"] for r in rows] == [0, 1, 2, 3]
    for r in rows:
        mx = r["max_bucket"]
        # the max bucket alone contributes C(mx, 2); all buckets together
        # can't exceed n_buckets * C(mx, 2)
        assert r["candidate_pairs"] >= mx * (mx - 1) // 2
        assert r["candidate_pairs"] <= r["n_buckets"] * mx * (mx - 1) // 2
        assert r["bucket_cv"] >= 0.0


def test_session_entropy_bands_reconcile_with_sessionization(spark):
    bands = _q(spark, "session_type_entropy_bands")
    assert abs(sum(r["session_share"] for r in bands) - 1.0) < 1e-4
    assert all(r["band"] >= 0 for r in bands)
    # same 5-minute-gap session definition as event_sessionization:
    # session totals must reconcile exactly across the two operators
    n_sessions = sum(r["n_sessions"] for r in bands)
    assert n_sessions == len(_q(spark, "event_sessionization"))


def test_dp_release_nonnegative_l1_consistent(spark):
    rows = _q(spark, "dp_count_noise_audit")
    assert all(r["released"] >= 0 for r in rows)
    assert all(r["epsilon"] == 1.0 for r in rows)
    l1 = sum(r["abs_err"] for r in rows)
    assert all(r["total_l1_err"] == l1 for r in rows)


def test_bh_fdr_ranks_and_prefix(spark):
    rows = _q(spark, "bh_fdr_daily_anomalies")
    assert [r["bh_rank"] for r in rows] == list(range(1, len(rows) + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(r["z"] >= 0.0 for r in rows)
    # BH discoveries form a prefix of the p-ascending order
    flags = [r["discovered"] for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_calibration_bins_wilson_brackets(spark):
    rows = _q(spark, "score_calibration_bins")
    assert rows
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["wilson_lo"] - 1e-9 <= r["pos_rate"] <= r["wilson_hi"] + 1e-9
        assert r["pos"] <= r["n"]
    import pyspark.sql.functions as F  # noqa: N812

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs


def test_power_analysis_consistent(spark):
    row = _q(spark, "power_analysis_arms")[0]
    assert row["x0"] <= row["n0"] and row["x1"] <= row["n1"]
    assert 0.0 <= row["p0"] <= 1.0 and 0.0 <= row["p1"] <= 1.0
    assert abs(row["observed_lift"] - abs(row["p0"] - row["p1"])) < 2e-6
    if row["observed_lift"] > 0:
        assert row["n_required_per_arm"] >= 1
        assert row["powered_now"] == (
            min(row["n0"], row["n1"]) >= row["n_required_per_arm"]
        )


def test_mmr_picks_distinct_and_greedy_consistent(spark):
    rows = _q(spark, "mmr_diverse_topk")
    assert [r["pick"] for r in rows] == list(range(1, len(rows) + 1))
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "MMR re-picked a document"
    # first pick has no diversity penalty: mmr = lambda * rel exactly
    assert abs(rows[0]["mmr_score"] - 0.7 * rows[0]["rel"]) < 2e-6
    # cosine is signed, so the diversity term can add as well as
    # subtract — but it is bounded: |mmr − λ·rel| ≤ (1−λ)·|cos| ≤ 0.3
    for r in rows[1:]:
        assert abs(r["mmr_score"] - 0.7 * r["rel"]) <= 0.3 + 2e-6
    # relevance values are the rank rational: in (0, 1]
    assert all(0.0 < r["rel"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# containment_pairs: df-cap candidate bound under engineered skew
# ---------------------------------------------------------------------------


def test_containment_pairs_df_cap_bounds_skewed_shingle(spark, tmp_path):
    """Skew-stress the inverted-index blocking (r4/r5 verdict ask,
    mirroring the fuzzy_join skew test): one shingle shared by exactly
    df = 21 docs (one past the cap) must contribute ZERO candidate
    pairs, while a shingle at exactly df = 20 (the cap) still yields
    its full 20·19 candidate cohort — the cap is the candidate bound,
    inclusive at the boundary."""
    from ra2_datalake_linaresjoan_spark.queries_llm14 import (
        _CONT_DF_CAP,
        q_containment_pairs,
    )

    assert _CONT_DF_CAP == 20  # the fixture sizes below straddle this cap
    over = [(i, "alpha beta gamma delta") for i in range(21)]  # df 21
    at_cap = [(100 + i, "omega psi chi phi") for i in range(20)]  # df 20
    docs = spark.createDataFrame(
        [(i, t, "en", "fixture", len(t)) for i, t in over + at_cap],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "skew_sf"
    docs.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    rows = q_containment_pairs(spark, str(d)).collect()
    # only the at-cap cohort can pair: full containment, top-20 of the
    # 380 ordered candidate pairs
    assert len(rows) == 20
    assert all(r["containment"] == 1.0 for r in rows)
    assert all(r["doc_a"] >= 100 and r["doc_b"] >= 100 for r in rows)
    # over-cap docs appear in NO pair — the skewed shingle was dropped
    assert not any(r["doc_a"] < 100 or r["doc_b"] < 100 for r in rows)


# ---------------------------------------------------------------------------
# revenue_decile_lift: quantile path under heavy ties
# ---------------------------------------------------------------------------


def test_revenue_deciles_quantile_path_contiguous_under_ties(spark, tmp_path):
    """Force the approxQuantile path (exact_threshold=0) on a corpus with
    only 3 distinct spend values (70/25/5 split). approxQuantile repeats
    boundaries under ties; un-deduped, the when-chain double-increments
    past a repeated boundary and skips interior decile numbers (the
    ADVICE r5 finding). Deduped boundaries must yield a CONTIGUOUS
    populated decile range starting at 1, covering all customers."""
    from ra2_datalake_linaresjoan_spark.queries_ext15 import (
        q_revenue_decile_lift,
    )

    rows_in = (
        [(i, 10.0) for i in range(70)]
        + [(i, 50.0) for i in range(70, 95)]
        + [(i, 100.0) for i in range(95, 100)]
    )
    orders = spark.createDataFrame(rows_in, ["o_custkey", "o_totalprice"])
    d = tmp_path / "ties_sf"
    orders.write.mode("overwrite").parquet(str(d / "orders.parquet"))

    out = sorted(
        q_revenue_decile_lift(spark, str(d), exact_threshold=0).collect(),
        key=lambda r: r["decile"],
    )
    deciles = [r["decile"] for r in out]
    # contiguous from 1 — under 3 distinct values at most 3 buckets exist
    assert deciles == list(range(1, len(deciles) + 1))
    assert len(deciles) <= 3
    assert sum(r["n_customers"] for r in out) == 100
    # decile 1 = top spenders; shares sum to 1
    shares = [r["revenue_share"] for r in out]
    assert shares[0] == max(shares)
    assert abs(sum(shares) - 1.0) < 1e-4
