"""Batch-21: robust_zscore + streaming geofence transitions."""

import time

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import stats as ops_stats


def test_robust_zscore_flags_outlier_not_dragged(spark):
    # bulk spread 9.8..10.2 (MAD ~0.1), one wild outlier
    rows = [(i, "a", 10.0 + (i % 5 - 2) * 0.1) for i in range(10)]
    rows += [(102, "a", 1000.0)]
    df = spark.createDataFrame(rows, ["event_id", "g", "value"])
    out = {r.event_id: r.z for r in
           ops_stats.robust_zscore(df, "g", "value").collect()}
    assert out[102] > 100  # the outlier scores huge
    assert abs(out[2]) < 1e-9  # the bulk sits at the median
    # zero-MAD group -> NULL
    df2 = spark.createDataFrame(
        [(i, "c", 5.0) for i in range(4)], ["event_id", "g", "value"]
    )
    out2 = ops_stats.robust_zscore(df2, "g", "value").collect()
    assert all(r.z is None for r in out2)


def test_geofence_stream_transitions_and_restarts(spark, tmp_path):
    from pdal_spark.streaming.sessions import geofence_stream

    fences = [(7, 0.0, 10.0, 0.0, 10.0)]
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def wave(name, rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s double, lat double, lon double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def run():
        stream = (
            spark.readStream.schema(
                "user_id long, ts_s double, lat double, lon double"
            ).option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            geofence_stream(stream, fences)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: user 1 enters then exits; user 2 stays outside
    wave("w1", [
        (1, 1.0, 5.0, 5.0), (1, 2.0, 5.0, 6.0), (1, 3.0, 50.0, 50.0),
        (2, 1.0, 40.0, 40.0),
    ])
    run()
    # wave 2 (after a RESTART): user 1 re-enters -> state survived
    wave("w2", [(1, 10.0, 2.0, 2.0)])
    run()
    got = sorted(
        (r.skey, r.event, r.at_ts)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [
        (1, "enter", 1.0), (1, "enter", 10.0), (1, "exit", 3.0)
    ]

def test_geofence_stream_drops_null_coordinates(spark, tmp_path):
    # a NULL lat/lon/ts row must not kill the query (ADVICE r1)
    from pdal_spark.streaming.sessions import geofence_stream

    fences = [(7, 0.0, 10.0, 0.0, 10.0)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 1.0, 5.0, 5.0), (1, None, 5.0, 5.0),
         (1, 2.0, None, 5.0), (1, 3.0, 5.0, None),
         (1, 4.0, 50.0, 50.0)],
        "user_id long, ts_s double, lat double, lon double",
    ).coalesce(1).write.parquet(f"{src}/w1")
    stream = (
        spark.readStream.schema(
            "user_id long, ts_s double, lat double, lon double"
        ).option("recursiveFileLookup", "true").parquet(str(src))
    )
    q = (
        geofence_stream(stream, fences)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.skey, r.event, r.at_ts)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(1, "enter", 1.0), (1, "exit", 4.0)]


def test_geofence_ordered_handles_cross_batch_late_event(spark, tmp_path):
    # fence [0,10]^2. True order: t=1 inside, t=2 OUTSIDE (late,
    # arrives in wave 2), t=3 inside. Correct = enter@1, exit@2,
    # enter@3. The unordered op folds t=2 after t=3 (wrong order);
    # the watermark-ordered variant buffers until the watermark
    # passes and replays in event order.
    from pdal_spark.streaming.sessions import geofence_stream_ordered

    fences = [(7, 0.0, 10.0, 0.0, 10.0)]
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def wave(name, rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s double, lat double, lon double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def run():
        stream = (
            spark.readStream.schema(
                "user_id long, ts_s double, lat double, lon double"
            ).option("recursiveFileLookup", "true").parquet(str(src))
        )
        q = (
            geofence_stream_ordered(stream, fences, delay="5 seconds")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave("w1", [(1, 1.0, 5.0, 5.0), (1, 3.0, 5.0, 5.0)])
    run()   # watermark after w1: 3 - 5 = below 0 -> nothing emitted
    wave("w2", [(1, 2.0, 50.0, 50.0), (1, 30.0, 60.0, 60.0)])
    run()   # late t=2 buffered in order; wm -> 25 releases 1,2,3
    wave("w3", [(1, 60.0, 70.0, 70.0)])
    run()   # wm -> 55; timeout flush releases t=30 -> exit
    got = sorted(
        (r.at_ts, r.event)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(1.0, "enter"), (2.0, "exit"), (3.0, "enter"),
                   (30.0, "exit")]


def test_geofence_ordered_flushes_idle_key_via_timeout(spark, tmp_path):
    # key 1 sends enter@1/exit@2 then goes silent; key 2 keeps
    # sending and advances the watermark. EventTimeTimeout must
    # re-invoke key 1 and drain its buffered transitions — with
    # NoTimeout they'd stay locked in state forever.
    from pdal_spark.streaming.sessions import geofence_stream_ordered

    fences = [(7, 0.0, 10.0, 0.0, 10.0)]
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def wave(name, rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s double, lat double, lon double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def run():
        stream = (
            spark.readStream.schema(
                "user_id long, ts_s double, lat double, lon double"
            ).option("recursiveFileLookup", "true").parquet(str(src))
        )
        q = (
            geofence_stream_ordered(stream, fences, delay="5 seconds")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave("w1", [(1, 1.0, 5.0, 5.0), (1, 2.0, 50.0, 50.0)])
    run()   # wm below 0 -> key 1 buffered, nothing out
    wave("w2", [(2, 100.0, 70.0, 70.0)])
    run()   # wm -> 95; key 1 got NO data this wave
    wave("w3", [(2, 101.0, 70.0, 70.0)])
    run()   # timeout fires for key 1 once wm has advanced
    got = sorted(
        (r.skey, r.at_ts, r.event)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(1, 1.0, "enter"), (1, 2.0, "exit")]
