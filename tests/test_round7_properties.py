"""Round-7 property tests (hypothesis): the quantile-histogram sketch's
contracts over arbitrary generated data."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st



# ---------------------------------------------------------------------------
# round 7: quantile histogram sketch — error contract over arbitrary data
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(min_value=-50.0, max_value=550.0,
                      allow_nan=False, allow_infinity=False),
            st.none(),
        ),
        min_size=1,
        max_size=200,
    ).filter(lambda xs: any(x is not None for x in xs))
)
def test_quantile_sketch_error_bound_any_data(spark, values):
    """For ARBITRARY value lists (nulls, out-of-domain included): the
    histogram mass equals the non-null count, and for every in-domain
    dataset each nearest-rank estimate sits within one bucket width of
    the exact nearest-rank percentile (the sketch's contract). Out-of-
    domain values void the bound (clamping moves mass) but never the
    mass-conservation invariant."""
    from ra2_datalake_linaresjoan_spark.streaming.sketches import (
        QH_BUCKETS,
        quantile_estimate,
        quantile_hist,
    )

    lo, hi = 0.0, 500.0
    df = spark.createDataFrame([(v,) for v in values], "v double")
    hist = quantile_hist(df, "v", lo, hi)
    rows = hist.collect()
    nonnull = [v for v in values if v is not None]
    assert sum(r["n"] for r in rows) == len(nonnull)
    assert all(0 <= r["bucket"] < QH_BUCKETS for r in rows)

    if all(lo <= v < hi for v in nonnull):
        qs = (0.1, 0.5, 0.9)
        ests = {
            r["q"]: r["est"]
            for r in quantile_estimate(hist, qs, lo, hi).collect()
        }
        svals = sorted(nonnull)
        width = (hi - lo) / QH_BUCKETS
        for q in qs:
            exact = svals[max(0, math.ceil(q * len(svals)) - 1)]
            assert abs(ests[q] - exact) <= width + 1e-9, (q, ests[q], exact)
