"""Property-based checks for the round-5 statistics operators: each
distributed formulation must agree with an independent brute-force Python
statement of the same statistic on arbitrary inputs."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from ra2_datalake_linaresjoan_spark import queries as q

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmpdir, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{tmpdir}/documents.parquet"
    )
    return str(tmpdir)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 200), st.booleans()),
        min_size=2,
        max_size=40,
    ).filter(lambda xs: any(p for _, p in xs) and any(not p for _, p in xs))
)
def test_auc_matches_brute_force(spark, tmp_path_factory, samples):
    """Bucket-aggregated rank-sum AUC == O(n·m) pairwise definition
    P(s⁺ > s⁻) + ½·P(s⁺ = s⁻), for arbitrary score/label data."""
    d = str(tmp_path_factory.mktemp("auc_prop"))
    rows = [
        (i, "t", "en" if pos else "xx", "s0", score)
        for i, (score, pos) in enumerate(samples)
    ]
    _write_docs(spark, d, rows)
    got = q.queries()["auc_quality_score"](spark, d).collect()[0]["auc"]
    pos = [s for s, p in samples if p]
    neg = [s for s, p in samples if not p]
    num = sum(1.0 if sp > sn else 0.5 if sp == sn else 0.0 for sp in pos for sn in neg)
    want = num / (len(pos) * len(neg))
    assert got == pytest.approx(want, abs=1e-6)


def _wilson(n: int, k: int, z: float = 1.959963984540054):
    p = k / n
    z2n = z * z / n
    center = (p + z2n / 2) / (1 + z2n)
    half = z * math.sqrt(p * (1 - p) / n + z2n / (4 * n)) / (1 + z2n)
    return center - half, center + half


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.booleans(), min_size=1, max_size=60),
)
def test_wilson_ci_matches_closed_form(spark, tmp_path_factory, labels):
    d = str(tmp_path_factory.mktemp("wilson_prop"))
    rows = [
        (i, "t", "en" if b else "xx", "s0", 10) for i, b in enumerate(labels)
    ]
    _write_docs(spark, d, rows)
    r = q.queries()["wilson_ci"](spark, d).collect()[0]
    lo, hi = _wilson(len(labels), sum(labels))
    assert r["ci_lo"] == pytest.approx(lo, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(hi, abs=1e-6)
    assert r["ci_lo"] <= r["p_hat"] <= r["ci_hi"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 30)),  # (start offset, length)
        min_size=1,
        max_size=7,
    )
)
def test_interval_union_matches_python_sweep(spark, tmp_path_factory, ivs):
    """The gaps-and-islands union length must equal an independent
    Python interval-union computation for one arbitrary order."""
    import datetime

    d = str(tmp_path_factory.mktemp("union_prop"))
    base = datetime.datetime(1995, 1, 1)
    li_rows = [
        (
            1,
            1,
            1,
            i,
            float(length),
            1.0,
            0.0,
            0.0,
            "N",
            "O",
            base + datetime.timedelta(days=off),
        )
        for i, (off, length) in enumerate(ivs)
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 1, "O", 1.0, base, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    r = q.queries()["interval_union_coverage"](spark, d).collect()[0]
    # independent sweep over [off, off+len) day intervals
    spans = sorted((off, off + length) for off, length in ivs)
    covered, cur_s, cur_e = 0, None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    assert r["n_orders"] == 1
    assert r["avg_coverage_days"] == pytest.approx(covered)
    assert r["max_coverage_days"] == covered


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(1, 10_000), min_size=5, max_size=50))
def test_hill_estimator_matches_numpy(spark, tmp_path_factory, lengths):
    """With fewer than 101 docs the estimator uses all n order stats;
    it must equal the direct numpy formulation."""
    import numpy as np

    d = str(tmp_path_factory.mktemp("hill_prop"))
    rows = [(i, "t", "en", "s0", x) for i, x in enumerate(lengths)]
    _write_docs(spark, d, rows)
    r = q.queries()["hill_tail_index"](spark, d).collect()[0]
    xs = np.sort(np.array(lengths, dtype=np.float64))[::-1]
    n = len(xs)
    xk1 = xs[-1]
    gamma = (np.log(xs).sum() - n * math.log(xk1)) / (n - 1)
    assert r["k"] == n - 1
    assert r["x_k_plus_1"] == int(xk1)
    if gamma > 0:
        assert r["hill_gamma"] == pytest.approx(gamma, abs=1e-4)
