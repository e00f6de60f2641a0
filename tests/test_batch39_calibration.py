"""Batch-39 ops: Nelson-Aalen, difference-in-differences, IPF
matrix balancing."""

import pytest

from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# nelson_aalen
# ---------------------------------------------------------------------------


def test_nelson_aalen_textbook_steps(spark):
    # 4 subjects: events at t=5 (2 of 4 at risk), censor at 7,
    # event at 9 (1 of 1 at risk) -> H = 0.5 then 1.5
    df = spark.createDataFrame(
        [(5, 1), (5, 1), (7, 0), (9, 1)], ["dur", "event"]
    )
    out = sorted(
        ops_temporal.nelson_aalen(df, duration="dur").collect(),
        key=lambda r: r.t,
    )
    assert [(r.t, r.n_risk, r.h) for r in out] == [
        (5, 4, 0.5), (9, 1, 1.5)
    ]


def test_nelson_aalen_censoring_shrinks_risk_only(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1)], ["dur", "event"]
    )
    out = sorted(
        ops_temporal.nelson_aalen(df, duration="dur").collect(),
        key=lambda r: r.t,
    )
    # censor at 1 never emits a row but shrinks later risk sets
    assert [(r.t, r.n_risk) for r in out] == [(2, 2), (3, 1)]


# ---------------------------------------------------------------------------
# diff_in_diff
# ---------------------------------------------------------------------------


def test_did_recovers_planted_effect(spark):
    rows = []
    for g in (0, 1):
        for p in (0, 1):
            base = 10 + 3 * g + 2 * p  # parallel trends
            effect = 7 if (g == 1 and p == 1) else 0
            rows += [(g, p, base + effect)] * 4
    df = spark.createDataFrame(rows, ["treated", "post", "y"])
    r = ops_stats.diff_in_diff(df).collect()[0]
    assert r.did == pytest.approx(7.0, abs=1e-12)


def test_did_missing_cell_null(spark):
    rows = [(0, 0, 1), (0, 1, 2), (1, 0, 3)]  # no treated-post
    df = spark.createDataFrame(rows, ["treated", "post", "y"])
    r = ops_stats.diff_in_diff(df).collect()[0]
    assert r.did is None


# ---------------------------------------------------------------------------
# ipf_balance
# ---------------------------------------------------------------------------


def test_ipf_converges_to_marginals(spark):
    seed = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 1, 1)],
        ["i", "j", "t"],
    )
    rt = spark.createDataFrame([(0, 30), (1, 70)], ["i", "target"])
    ct = spark.createDataFrame([(0, 40), (1, 60)], ["j", "target"])
    out = ops_h3.ipf_balance(seed, rt, ct, rounds=4).collect()
    rows = {(r.i, r.j): r.t_fit for r in out}
    # independent seed -> exact product-form solution r_i * c_j / N
    for (i, j), v in rows.items():
        expect = [30, 70][i] * [40, 60][j] / 100.0
        assert v == pytest.approx(expect, rel=1e-4)


def test_ipf_row_sums_match_after_row_sweep(spark):
    seed = spark.createDataFrame(
        [(0, 0, 3), (0, 1, 1), (1, 0, 2), (1, 1, 2)],
        ["i", "j", "t"],
    )
    rt = spark.createDataFrame([(0, 10), (1, 90)], ["i", "target"])
    ct = spark.createDataFrame([(0, 50), (1, 50)], ["j", "target"])
    out = ops_h3.ipf_balance(seed, rt, ct, rounds=3).collect()
    col_sums = {}
    for r in out:
        col_sums[r.j] = col_sums.get(r.j, 0.0) + r.t_fit
    # the LAST sweep is the column sweep: column marginals exact
    assert col_sums[0] == pytest.approx(50.0, rel=1e-4)
    assert col_sums[1] == pytest.approx(50.0, rel=1e-4)
