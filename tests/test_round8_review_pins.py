"""Round-8 adversarial-review pins for the batch-13..16 fixes — the
defect classes the DuckDB oracle gate is blind to (lockstep bugs and
inputs the synthetic testdata never contains):

1. zipf_fit: a single-word vocabulary makes the least-squares
   denominator exactly 0 — NULL slope, never an ANSI DIVIDE_BY_ZERO.
2. chi2_independence: unobserved (type, weekday) cells must contribute
   their (0-exp)^2/exp = exp term — the observed-cells-only sum
   understated Pearson's statistic in BOTH engines.
3. ks_distance: NULL-text rows are dropped in lockstep (Spark's
   cumulative window orders a NULL group FIRST, DuckDB LAST — every
   CDF value after it diverged).
4. event_trigram_paths: a NULL event_type must never yield a 2-token
   path (Spark concat_ws silently skips NULL args).
5. exact_corr_moments: complete cases only — a row with NULL text must
   not count toward n while being absent from the y-moments.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixdir(spark, tmp_path_factory):
    """One tmp sf_dir with tiny documents + events tables exercising
    exactly the dirty inputs the pins need."""
    d = tmp_path_factory.mktemp("r8_review_pins")
    docs = spark.createDataFrame(
        [
            # lang 'xx': single-word vocabulary (zipf denominator = 0)
            Row(doc_id=1, lang="xx", source="src0",
                text="hello hello hello", n_chars=17),
            # lang 'yy': normal vocabulary, one NULL-text row and one
            # NULL-n_chars row (corr complete-case pin)
            Row(doc_id=2, lang="yy", source="src0",
                text="a b c d", n_chars=7),
            Row(doc_id=3, lang="yy", source="src1",
                text="a b b c e f", n_chars=11),
            Row(doc_id=4, lang="yy", source="src1", text=None, n_chars=99),
            Row(doc_id=5, lang="yy", source="src0",
                text="g h i j k", n_chars=None),
            Row(doc_id=6, lang="yy", source="src1",
                text="a a b c", n_chars=7),
        ]
    )
    docs.write.parquet(str(d / "documents.parquet"))
    events = spark.createDataFrame(
        [
            # user 1: NULL event_type mid-sequence — with the NULL row
            # dropped the only trigram is view>click>buy
            Row(event_id=1, user_id=1, event_type="view",
                ts="2024-01-01 10:00:00", value=1.0),
            Row(event_id=2, user_id=1, event_type=None,
                ts="2024-01-01 10:01:00", value=1.0),
            Row(event_id=3, user_id=1, event_type="click",
                ts="2024-01-01 10:02:00", value=1.0),
            Row(event_id=4, user_id=1, event_type="buy",
                ts="2024-01-02 10:03:00", value=1.0),
            Row(event_id=5, user_id=1, event_type="view",
                ts="2024-01-02 10:04:00", value=1.0),
            # user 2: 'buy' never occurs on Jan 1 (chi2 zero cell comes
            # from the type x weekday grid over these two days)
            Row(event_id=6, user_id=2, event_type="view",
                ts="2024-01-01 09:00:00", value=1.0),
            Row(event_id=7, user_id=2, event_type="view",
                ts="2024-01-02 09:00:00", value=1.0),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    events.write.parquet(str(d / "events.parquet"))
    return str(d)


def test_zipf_fit_single_word_vocabulary_null_slope(spark, fixdir):
    from ra2_datalake_linaresjoan_spark.queries_ext16 import q_zipf_fit

    rows = {r["lang"]: r for r in q_zipf_fit(spark, fixdir).collect()}
    assert rows["xx"]["n_vocab"] == 1
    assert rows["xx"]["zipf_slope"] is None  # 0/0 -> NULL, no ANSI crash
    assert rows["yy"]["zipf_slope"] is not None


def test_chi2_counts_unobserved_cells(spark, fixdir):
    """Monday has no 'buy' and no NULL-type events: the grid must still
    carry those cells, n_cells = r*c, and chi2 must equal the
    hand-computed complete-grid Pearson statistic."""
    from ra2_datalake_linaresjoan_spark.queries_ext16 import (
        q_chi2_independence,
    )

    r = q_chi2_independence(spark, fixdir).collect()[0]
    # observed grid: types {view, click, buy} x days {Mon, Tue}
    # (2024-01-01 = Monday); the NULL-type event is excluded in
    # lockstep. 'click' on Tue and 'buy' on Mon are the zero cells.
    obs = {
        ("view", 1): 2, ("view", 2): 2,
        ("click", 1): 1,
        ("buy", 2): 1,
    }
    types = {"view", "click", "buy"}
    dows = {1, 2}
    n = sum(obs.values())
    row_n = {t: sum(v for (tt, _), v in obs.items() if tt == t) for t in types}
    col_n = {d: sum(v for (_, dd), v in obs.items() if dd == d) for d in dows}
    chi2 = 0.0
    for t in types:
        for d in dows:
            exp = row_n[t] * col_n[d] / n
            o = obs.get((t, d), 0)
            chi2 += (o - exp) ** 2 / exp
    assert r["n_events"] == n
    assert r["n_cells"] == len(types) * len(dows)  # complete grid
    assert r["dof"] == (len(types) - 1) * (len(dows) - 1)
    assert math.isclose(r["chi2"], round(chi2, 4), abs_tol=1e-4)


def test_ks_distance_drops_null_text_in_lockstep(spark, fixdir):
    from ra2_datalake_linaresjoan_spark.queries_ext13 import q_ks_distance

    r = q_ks_distance(spark, fixdir).collect()[0]
    # src0 non-null word counts: {3, 4} (doc5 has NULL n_chars but real
    # text -> counts; doc2 'a b c d' = 4, doc5 = 5, doc1 = 3) ...
    # assert structurally: the NULL-text doc4 (src1) is excluded
    assert r["na"] == 3  # docs 1, 2, 5
    assert r["nb"] == 2  # docs 3, 6 — doc4's NULL text excluded
    assert r["ks_d"] is not None


def test_event_trigram_paths_never_two_token_paths(spark, fixdir):
    from ra2_datalake_linaresjoan_spark.queries_ext15 import (
        q_event_trigram_paths,
    )

    rows = q_event_trigram_paths(spark, fixdir).collect()
    paths = {r["path"]: r["n_paths"] for r in rows}
    for p in paths:
        assert p.count(">") == 2, f"malformed path {p!r}"
    # with the NULL row dropped, user 1's sequence is view>click>buy>view
    assert paths == {"view>click>buy": 1, "click>buy>view": 1}


def test_exact_corr_moments_complete_cases_only(spark, fixdir):
    """n for lang 'yy' must count only rows with BOTH n_chars and text
    present, and r must equal the complete-case Pearson correlation."""
    from ra2_datalake_linaresjoan_spark.queries_ext14 import (
        q_exact_corr_moments,
    )

    rows = {r["lang"]: r for r in q_exact_corr_moments(spark, fixdir).collect()}
    # yy complete cases: doc2 (7 chars, 4 distinct), doc3 (11, 5),
    # doc6 (7, 3) — docs 4 (NULL text) and 5 (NULL n_chars) excluded
    assert rows["yy"]["n"] == 3
    xs, ys = [7, 11, 7], [4, 5, 3]
    nn = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want = (nn * sxy - sx * sy) / (
        math.sqrt(nn * sxx - sx * sx) * math.sqrt(nn * syy - sy * sy)
    )
    assert math.isclose(rows["yy"]["pearson_r"], round(want, 6), abs_tol=1e-6)
