"""Batch-35 ops: Kulldorff space-time scan, query-likelihood
retrieval, Hoover index, Theil's T."""

import math

import pytest

from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import stats as ops_stats
from pdal_spark.sqlgen import qcell_pack


def _cell(ix, iy, res=4):
    return int(eval(qcell_pack(str(ix), str(iy), res)))

# ---------------------------------------------------------------------------
# spacetime_scan
# ---------------------------------------------------------------------------


def test_scan_finds_planted_cluster(spark):
    # uniform background 1/cell/day; the planted cell concentrates
    # ALL its mass in one day (a space-time INTERACTION — the
    # permutation indicator detects burstiness beyond marginals, so
    # a cell that is simply big in both marginals scores low)
    rows = []
    for ix in range(6):
        if ix == 1:
            continue
        for d in range(5):
            rows.append((_cell(ix, 0), d, 1))
    rows.append((_cell(1, 0), 2, 10))
    df = spark.createDataFrame(rows, ["cell", "tbin", "n"])
    out = ops_pp.spacetime_scan(
        df, res=4, max_k=1, max_len=2, min_n=3
    ).collect()
    best = max(out, key=lambda r: (r.llr, -r.k, -r.win_len))
    assert best.center == _cell(1, 0)
    assert best.k == 0 and best.n_obs >= 10
    assert best.llr > 2.0


def test_scan_uniform_surface_quiet(spark):
    rows = [(_cell(ix, iy), d, 5)
            for ix in range(3) for iy in range(3) for d in range(3)]
    df = spark.createDataFrame(rows, ["cell", "tbin", "n"])
    out = ops_pp.spacetime_scan(
        df, res=4, max_k=1, max_len=2, min_n=3
    ).collect()
    # perfectly uniform: every cylinder has n == E -> filtered out
    # (edge cylinders differ slightly; allow tiny residual llr)
    assert all(r.llr < 0.7 for r in out)


# ---------------------------------------------------------------------------
# qlm_topk
# ---------------------------------------------------------------------------


def test_qlm_ranks_matching_doc_first(spark):
    rows = (
        [(1, w) for w in "spark join window spark".split()]
        + [(2, w) for w in "cat dog mouse fish".split()]
        + [(3, w) for w in "spark cat dog fish".split()]
    )
    toks = spark.createDataFrame(rows, ["doc_id", "word"])
    out = ops_sim.qlm_topk(
        toks, terms=["spark", "join"], k=3, mu=10
    ).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.doc_id for r in ranked] == [1, 3, 2]


def test_qlm_smoothing_scores_absent_terms(spark):
    # doc 2 has NO query terms but still gets a (low) score through
    # the collection-model smoothing
    rows = [(1, "a"), (1, "q"), (2, "b"), (2, "c")]
    toks = spark.createDataFrame(rows, ["doc_id", "word"])
    out = {r.doc_id: r.score_q for r in ops_sim.qlm_topk(
        toks, terms=["q"], k=5, mu=4).collect()}
    assert set(out) == {1, 2}
    assert out[1] > out[2]


def test_qlm_corpus_absent_term_ignored(spark):
    rows = [(1, "a"), (2, "b")]
    toks = spark.createDataFrame(rows, ["doc_id", "word"])
    out = ops_sim.qlm_topk(toks, terms=["zzz"], k=5, mu=4).collect()
    assert out == []


# ---------------------------------------------------------------------------
# hoover_index / theil_inequality
# ---------------------------------------------------------------------------


def _one_cell_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_hoover_uniform_zero(spark):
    r = ops_stats.hoover_index(_one_cell_df(spark, [5, 5, 5, 5]))
    assert r.collect()[0].hoover == 0.0


def test_hoover_all_in_one_cell(spark):
    r = ops_stats.hoover_index(
        _one_cell_df(spark, [12, 0, 0, 0])).collect()[0]
    # H = (n-1)/n for total concentration
    assert r.hoover == pytest.approx(0.75, abs=1e-12)


def test_theil_uniform_zero_and_concentration_lnn(spark):
    r0 = ops_stats.theil_inequality(
        _one_cell_df(spark, [7, 7, 7])).collect()[0]
    assert r0.theil_t == pytest.approx(0.0, abs=1e-6)
    r1 = ops_stats.theil_inequality(
        _one_cell_df(spark, [9, 0, 0])).collect()[0]
    assert r1.theil_t == pytest.approx(math.log(3), abs=1e-5)
