"""Batch-51 op: Benjamini-Hochberg FDR."""

from pdal_spark.operators import stats as ops_stats

Q = ops_stats.BH_Q


def _df(spark, ps):
    return spark.createDataFrame(
        [(i, int(p * Q)) for i, p in enumerate(ps)], ["id", "p_q"]
    )


def test_bh_textbook_selection(spark):
    # classic example (q = 0.05, m = 10): sorted p-values
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216]
    out = {r.rank: r for r in ops_stats.bh_fdr(
        _df(spark, ps), q_pct=5).collect()}
    # thresholds k*0.005: p_(4)=0.041 > 0.020? reject set = largest
    # k with p_(k) <= 0.005k -> k=2? p2=0.008 <= 0.010 yes;
    # p3=0.039 > 0.015, p4=0.041 > 0.02, p5=0.042 > 0.025 ->
    # k_sel = 2
    assert out[1].k_sel == 2
    assert out[1].reject and out[2].reject
    assert not out[3].reject


def test_bh_step_up_rescues_earlier_failures(spark):
    # the step-up property: a later rank passing rescues ALL
    # smaller ranks even if they individually failed
    ps = [0.004, 0.0049, 0.005, 0.015]  # m=4, q=0.05
    # thresholds: 0.0125, 0.025, 0.0375, 0.05: all four pass at
    # k=4 (0.015 <= 0.05)
    out = ops_stats.bh_fdr(_df(spark, ps), q_pct=5).collect()
    assert all(r.reject for r in out)


def test_bh_nothing_rejected(spark):
    ps = [0.9, 0.95, 0.99]
    out = ops_stats.bh_fdr(_df(spark, ps), q_pct=5).collect()
    assert all(not r.reject for r in out)
    assert out[0].k_sel == 0
