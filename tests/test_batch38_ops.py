"""Time-series batch: EWMA integer recurrence properties, rolling
median spike resistance."""

from pdal_spark.operators.temporal import (
    EWMA_Q,
    ewma_smooth,
    rolling_median,
)


def test_ewma_converges_and_is_partition_stable(spark):
    # constant series: ewma == the constant exactly (fixed point of
    # the recurrence: (2c + 8c)/10 = c)
    rows = [(1, i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, o long, v double")
    out = ewma_smooth(df, "k", "o", "v", num=2, den=10).collect()
    assert all(r.ewma_q == 5 * EWMA_Q for r in out)
    # step series: smoothed value moves 20% toward the new level
    rows = [(2, 0, 0.0), (2, 1, 10.0)]
    df = spark.createDataFrame(rows, "k long, o long, v double")
    out = {r.ord: r.ewma_q
           for r in ewma_smooth(df, "k", "o", "v").collect()}
    assert out[0] == 0
    assert out[1] == (2 * 10 * EWMA_Q) // 10
    # determinism under repartitioning
    big = spark.createDataFrame(
        [(i % 3, i, float((i * 37) % 11)) for i in range(60)],
        "k long, o long, v double",
    )
    a = sorted(map(tuple, ewma_smooth(big, "k", "o", "v").collect()))
    b = sorted(map(tuple, ewma_smooth(
        big.repartition(13), "k", "o", "v").collect()))
    assert a == b


def test_rolling_median_resists_spikes(spark):
    rows = [(1, i, 10.0) for i in range(6)] + [(1, 6, 1000.0)] + [
        (1, i, 10.0) for i in range(7, 12)
    ]
    df = spark.createDataFrame(rows, "k long, o long, v double")
    out = {r.o: r.med for r in rolling_median(
        df, "k", "o", "v", width=5).collect()}
    # the spike never becomes the median of any trailing-5 window
    assert all(m == 10.0 for o, m in out.items() if o != 6)
    assert out[6] == 10.0
    # warmup windows use the lower median of what exists
    two = spark.createDataFrame(
        [(1, 0, 4.0), (1, 1, 8.0)], "k long, o long, v double"
    )
    got = {r.o: r.med for r in rolling_median(
        two, "k", "o", "v", width=5).collect()}
    assert got[0] == 4.0 and got[1] == 4.0  # lower median of {4,8}
