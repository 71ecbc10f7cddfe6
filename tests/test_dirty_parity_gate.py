"""Ratchet gate for the dirty-data oracle parity audit.

``tools/dirty_parity_audit.py`` runs every registered query on a
NULL-riddled corpus on BOTH engines and compares results — the class of
defect the clean-data driver gate and the Spark-only null-riddled sweep
are each blind to.  Round 8's first full audit found 49 divergent
queries; 10 were fixed in-round, and round 9 fixed the remaining 39 —
``KNOWN_DIVERGENT`` is now EMPTY and must stay that way: a new
divergence is a regression to fix, not a backlog entry to declare.

Two enforcement layers:

1. (always) the backlog declaration itself is audited — every name must
   resolve in the registry, and no query fixed this round may reappear.
2. (env-gated, ``RA2_DIRTY_PARITY=1`` — ~15 min) the full audit runs
   and asserts zero divergences outside the declared backlog.  Run it
   before the round-close snapshot; shrink the backlog every round.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "dirty_parity_audit", os.path.join(REPO, "tools", "dirty_parity_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_backlog_names_resolve_and_fixed_queries_stay_fixed():
    from ra2_datalake_linaresjoan_spark.queries import queries

    mod = _audit_mod()
    names = set(queries().keys())
    unknown = sorted(set(mod.KNOWN_DIVERGENT) - names)
    assert not unknown, f"backlog names not in registry: {unknown}"
    # queries whose dirty-parity fix landed in round 8 must never
    # re-enter the backlog silently
    fixed_r8 = {
        "ann_ivf", "ann_lsh", "bloom_dedup", "cosine_neardup",
        "cosine_topk", "mutual_knn_rate", "neardup_components",
        "split_leakage_audit", "stratified_split_assign",
        "training_shard_assign", "knn_accuracy", "ks_distance",
        "event_trigram_paths", "exact_corr_moments", "zipf_fit",
        "chi2_independence", "markov_stationary", "markov_absorption",
        "cms_width_sweep", "cusum_changepoint", "decayed_event_counts",
        "benford_digits", "interval_union_coverage",
        "degree_assortativity", "hll_register_estimate",
        "dup_inflation_by_source", "quality_survivor_dedup",
        "dedup_method_venn", "dup_rate_sample_estimate",
        "split_srm_check", "doc_feature_corr", "laspeyres_price_index",
        "bloom_membership_audit", "ngram_contamination", "ndcg_eval",
    }
    regressed = sorted(fixed_r8 & set(mod.KNOWN_DIVERGENT))
    assert not regressed, f"fixed queries re-listed as divergent: {regressed}"
    # round 9 drained the backlog entirely — it must stay empty
    assert not mod.KNOWN_DIVERGENT, (
        "the dirty-parity backlog was emptied in round 9; fix new "
        f"divergences instead of declaring them: {sorted(mod.KNOWN_DIVERGENT)}"
    )


@pytest.mark.skipif(
    not os.environ.get("RA2_DIRTY_PARITY"),
    reason="full dirty-parity audit is opt-in (RA2_DIRTY_PARITY=1, ~15 min)",
)
def test_full_dirty_parity_audit_has_no_new_divergences():
    mod = _audit_mod()
    assert mod.main() == 0
