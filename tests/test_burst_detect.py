"""burst_detect behavior: burst segmentation vs per-gap thresholds,
penalty extremes, and partitioning invariance."""

from pdal_spark.operators.temporal import BURST_Q, burst_detect


def _ev(spark, ts_list, key=1):
    return spark.createDataFrame(
        [(key, int(t)) for t in ts_list], ["k", "tus"]
    )


def _states(df):
    rows = sorted(df.collect(), key=lambda r: r.ts_us)
    return [r.state for r in rows]


def test_burst_run_detected_and_not_split_by_one_slow_gap(spark):
    # base-rate gaps of 100, a burst of gaps of 10 with ONE 40-gap
    # inside it: a per-gap threshold splits the burst at the 40;
    # the switch penalty keeps it one contiguous burst.
    gaps = [100] * 5 + [10, 10, 10, 40, 10, 10, 10] + [100] * 5
    ts, t = [0], 0
    for g in gaps:
        t += g
        ts.append(t)
    out = burst_detect(
        _ev(spark, ts), "k", "tus", s_num=3, s_den=1,
        penalty_q=2 * BURST_Q,
    )
    st = _states(out)
    assert st[:5] == [0] * 5 and st[-5:] == [0] * 5
    assert st[5:12] == [1] * 7  # the 40-gap does not split the burst


def test_huge_penalty_means_no_state_change(spark):
    gaps = [100] * 5 + [5] * 5 + [100] * 5
    ts, t = [0], 0
    for g in gaps:
        t += g
        ts.append(t)
    out = burst_detect(
        _ev(spark, ts), "k", "tus", penalty_q=10**15
    )
    assert len(set(_states(out))) == 1


def test_single_event_key_emits_no_gaps(spark):
    df = spark.createDataFrame([(1, 100), (2, 50), (2, 60)],
                               ["k", "tus"])
    rows = burst_detect(df, "k", "tus").collect()
    assert {r.k for r in rows} == {2} and len(rows) == 1


def test_partitioning_invariance(spark):
    gaps = [100] * 4 + [10] * 6 + [100] * 4
    ts, t = [0], 0
    for g in gaps:
        t += g
        ts.append(t)
    df = _ev(spark, ts)
    a = sorted(map(tuple, burst_detect(df, "k", "tus").collect()))
    b = sorted(map(tuple, burst_detect(
        df.repartition(13), "k", "tus").collect()))
    assert a == b
