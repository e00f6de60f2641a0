"""Stateful streaming stay-point detection: closed dwell segments
must match the batch stay_points computation, INCLUDING a dwell
spanning two availableNow runs (state recovered from checkpoint)."""

import pandas as pd

from pdal_spark.streaming.sessions import run_dwell

T2 = 100 * 100


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "key long, ts_s double, mx long, my long"
    ).coalesce(1).write.mode("append").parquet(path)


def test_dwell_stream_matches_batch_and_survives_restart(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # batch 1: key 1 dwells at ~0 then jumps to 5000 (closing the
    # first segment); the second segment stays OPEN
    _write(spark, src, [
        (1, 1.0, 0, 0), (1, 2.0, 10, 0), (1, 3.0, 20, 0),
        (1, 4.0, 5000, 0),
    ])
    run_dwell(spark, src, ckpt, out, t2=T2)
    got = pd.read_parquet(out).sort_values("t_start")
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.key, r.n, r.t_start, r.t_end, r.cx) == (1, 3, 1.0, 3.0, 10)

    # batch 2: continue the open dwell at 5000, then jump again ->
    # the spanning segment closes with pings from BOTH runs
    _write(spark, src, [
        (1, 5.0, 5010, 0), (1, 6.0, 9000, 0),
    ])
    run_dwell(spark, src, ckpt, out, t2=T2)
    got = pd.read_parquet(out).sort_values("t_start")
    assert len(got) == 2
    r2 = got.iloc[1]
    assert (r2.n, r2.t_start, r2.t_end, r2.cx) == (2, 4.0, 5.0, 5005)


def test_dwell_stream_min_n_suppresses_singletons(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    # every ping far from the previous: only singleton segments,
    # none emitted
    _write(spark, src, [
        (7, 1.0, 0, 0), (7, 2.0, 10_000, 0), (7, 3.0, 20_000, 0),
    ])
    run_dwell(spark, src, ckpt, out, t2=T2)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    if files:
        assert len(pd.read_parquet(out)) == 0
