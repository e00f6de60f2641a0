"""Batch-17 ops: crawl_schedule, burstiness, trajectory_bearings."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text


def test_crawl_schedule_slots_per_host(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x"),
            (2, "https://a.com/y"),
            (3, "https://B.com/z"),
        ],
        ["doc_id", "url"],
    )
    out = {r.doc_id: r for r in
           ops_text.crawl_schedule(df, delay_ms=500).collect()}
    assert out[1].host == "a.com" and out[1].slot == 0
    assert out[2].slot == 1 and out[2].t_offset_ms == 500
    assert out[3].host == "b.com" and out[3].slot == 0


def test_burstiness_metronome_vs_bursty(spark):
    rows = []
    # metronome: exact 60s gaps -> sigma 0 -> B = -1
    for i in range(20):
        rows.append((i, 1, f"2024-01-01 00:{i:02d}:00"))
    # bursty: 19 tiny gaps then one huge gap
    for i in range(19):
        rows.append((100 + i, 2, f"2024-01-01 00:00:{i:02d}"))
    rows.append((119, 2, "2024-01-03 00:00:00"))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r.b for r in
           ops_temporal.burstiness(df).collect()}
    assert out[1] == pytest.approx(-1.0)
    assert out[2] > 0.5


def test_bearings_cardinal_directions(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
            (2, 1, "2024-01-01 00:01:00", 10.0, 0.0),   # due north
            (3, 1, "2024-01-01 00:02:00", 10.0, 10.0),  # roughly east
        ],
        ["event_id", "user_id", "ts", "lat", "lon"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r.bearing for r in
           ops_temporal.trajectory_bearings(df).collect()}
    assert out[1] == pytest.approx(0.0, abs=1e-6)
    assert 85.0 < out[2] < 90.0  # great-circle east drifts slightly
    assert 3 not in out  # last point has no leg
