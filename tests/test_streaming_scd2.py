"""Online SCD2 (CDC apply): the change log accrues only REAL
changes across micro-batch boundaries, and the fold-on-read view
equals the batch scd2_intervals over the full stream."""

import pandas as pd

from pdal_spark.streaming.ingest import read_scd2, streaming_scd2


def _run(spark, tmp_path):
    streaming_scd2(
        spark,
        f"{tmp_path}/src/*",
        str(tmp_path / "dest"),
        str(tmp_path / "ckpt"),
        key="user_id", ts_us="event_id", value="event_type",
    )


def test_streaming_scd2_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    wave1 = [(10, 1, "a"), (20, 1, "a"), (30, 1, "b"),
             (5, 2, "x")]
    spark.createDataFrame(
        wave1, "event_id long, user_id long, event_type string"
    ).write.parquet(str(src / "w1.parquet"))
    _run(spark, tmp_path)

    log = pd.read_parquet(f"{tmp_path}/dest/changes")
    # the (20, a) no-op never entered the log
    assert sorted(zip(log.user_id, log.valid_from)) \
        == [(1, 10), (1, 30), (2, 5)]

    # wave 2: user 1 repeats 'b' (no-op vs the LOGGED last value of
    # an EARLIER batch -> dropped), then changes to 'c'; user 2 real
    wave2 = [(40, 1, "b"), (50, 1, "c"), (60, 2, "y")]
    spark.createDataFrame(
        wave2, "event_id long, user_id long, event_type string"
    ).write.parquet(str(src / "w2.parquet"))
    _run(spark, tmp_path)

    dim = {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to,
                                    r.is_current)
        for r in read_scd2(spark, f"{tmp_path}/dest").collect()
    }
    assert dim[(1, 10)] == ("a", 30, 0)
    assert dim[(1, 30)] == ("b", 50, 0)
    assert dim[(1, 50)] == ("c", None, 1)
    assert dim[(2, 5)] == ("x", 60, 0)
    assert dim[(2, 60)] == ("y", None, 1)
    assert len(dim) == 5  # the cross-batch no-op opened NO version

    # matches the batch operator over the same full stream
    from pdal_spark.operators.temporal import scd2_intervals

    full = spark.createDataFrame(
        wave1 + wave2,
        "event_id long, user_id long, event_type string",
    )
    batch = {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to,
                                    r.is_current)
        for r in scd2_intervals(
            full, "user_id", "event_id", "event_type").collect()
    }
    assert dim == batch

    # exactly-once rerun
    _run(spark, tmp_path)
    assert len(pd.read_parquet(f"{tmp_path}/dest/changes")) == 5
