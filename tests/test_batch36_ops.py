"""Evaluation/monitoring batch: RBO properties, Wilson interval
sanity, streaming Welford anomaly detector."""

import pandas as pd

from pdal_spark.operators.similarity import RBO_Q, rbo_overlap
from pdal_spark.operators.stats import wilson_interval


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def test_rbo_identical_and_disjoint(spark):
    a = _ranking(spark, [(1, d, r + 1) for r, d in
                         enumerate([10, 11, 12])])
    out = rbo_overlap(a, a, k=3, p=0.9).collect()[0]
    # identical rankings: truncated RBO@3 =
    # (1-p) * sum_{d<=3} p^(d-1) * d/d = 0.1 * (1 + .9 + .81)
    rbo = (1 - 0.9) * out.rbo_q / RBO_Q
    assert abs(rbo - 0.271) < 1e-6
    b = _ranking(spark, [(1, d, r + 1) for r, d in
                         enumerate([20, 21, 22])])
    assert rbo_overlap(a, b, k=3, p=0.9).count() == 0


def test_rbo_top_weighted(spark):
    # agreement at rank 1 beats agreement at rank 3
    a = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                         (2, 10, 1), (2, 11, 2), (2, 12, 3)])
    b = _ranking(spark, [(1, 10, 1), (1, 21, 2), (1, 22, 3),
                         (2, 20, 1), (2, 21, 2), (2, 12, 3)])
    out = {r.query_id: r.rbo_q
           for r in rbo_overlap(a, b, k=3, p=0.9).collect()}
    assert out[1] > out[2]


def test_wilson_interval_brackets_rate(spark):
    df = spark.createDataFrame(
        [("a", float(100 + (i % 2))) for i in range(100)]
        + [("b", 200.0)],
        "grp string, value double",
    )
    out = {r.grp: r for r in wilson_interval(
        df, "grp", "value > 100.5").collect()}
    a = out["a"]  # 50/100 successes
    assert a.x == 50 and a.n == 100
    assert a.lo < 0.5 < a.hi and a.hi - a.lo < 0.2
    b = out["b"]  # 1/1 success: interval wide but within [0,1]
    assert b.lo > 0.0 and b.hi <= 1.0


def test_anomaly_stream_flags_spikes_across_runs(spark, tmp_path):
    from pdal_spark.streaming.sessions import run_anomaly

    src = tmp_path / "src"
    src.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    # wave 1: key 1 stable around 10 +-1 (8 points), no anomaly yet
    wave1 = [(i, 1, 10.0 + (i % 2)) for i in range(8)]
    spark.createDataFrame(
        wave1, "event_id long, user_id long, value double"
    ).write.parquet(str(src / "w0.parquet"))
    run_anomaly(spark, f"{src}/*", ckpt, out, threshold=3.0)
    assert not pd.read_parquet(out).shape[0]

    # wave 2: a 100.0 spike (state recovered across runs), then the
    # detector absorbs it — a second normal point does not alarm
    wave2 = [(100, 1, 100.0), (101, 1, 10.0)]
    spark.createDataFrame(
        wave2, "event_id long, user_id long, value double"
    ).write.parquet(str(src / "w1.parquet"))
    run_anomaly(spark, f"{src}/*", ckpt, out, threshold=3.0)
    got = pd.read_parquet(out)
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r.akey), float(r.value), int(r.n_seen)) \
        == (1, 100.0, 8)
    assert r.z > 3.0
