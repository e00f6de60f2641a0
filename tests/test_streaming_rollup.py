"""Streaming continuous aggregate: the folded state must equal the
batch time_rollup over everything consumed so far — across waves,
and unchanged under a replayed run (idempotent batch partitions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from pdal_spark.operators.temporal import time_rollup
from pdal_spark.streaming.rollup import (
    read_time_rollup,
    streaming_time_rollup,
)

_T0 = dt.datetime(2026, 3, 1)
WIDTHS = [60, 3600]


def _rows(ids):
    return [
        Row(
            event_id=i,
            ts=_T0 + dt.timedelta(seconds=i * 77),
            value=float(i % 5) - 2.0,
        )
        for i in ids
    ]


def _snap(df):
    return sorted(
        (r["width_s"], r["bucket_start_s"], r["n"], r["value_q_sum"])
        for r in df.collect()
    )


def test_streaming_rollup_equals_batch_across_waves(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    wave1, wave2 = _rows(range(0, 120)), _rows(range(120, 300))
    spark.createDataFrame(wave1).write.mode("append").parquet(src)
    streaming_time_rollup(
        spark, src, state, ckpt, widths_s=WIDTHS
    )
    got1 = _snap(read_time_rollup(spark, state))
    want1 = _snap(
        time_rollup(spark.read.parquet(src), widths_s=WIDTHS)
    )
    assert got1 == want1

    spark.createDataFrame(wave2).write.mode("append").parquet(src)
    streaming_time_rollup(
        spark, src, state, ckpt, widths_s=WIDTHS
    )
    got2 = _snap(read_time_rollup(spark, state))
    want2 = _snap(
        time_rollup(spark.read.parquet(src), widths_s=WIDTHS)
    )
    assert got2 == want2 and got2 != got1

    # a third run with nothing new must change nothing (file
    # tracking) — and since every batch id overwrites its own
    # partition, a replay can never double-count
    streaming_time_rollup(
        spark, src, state, ckpt, widths_s=WIDTHS
    )
    assert _snap(read_time_rollup(spark, state)) == got2


def test_streaming_rollup_replayed_batch_is_idempotent(
    spark, tmp_path
):
    # simulate a replay: re-write the same batch id's partials twice;
    # the fold must count them once
    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    part = time_rollup(
        spark.createDataFrame(_rows(range(50))), widths_s=WIDTHS
    ).withColumn("batch", F.lit(0))
    for _ in range(2):
        (
            part.write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(state)
        )
    got = _snap(read_time_rollup(spark, state))
    want = _snap(
        time_rollup(
            spark.createDataFrame(_rows(range(50))), widths_s=WIDTHS
        )
    )
    assert got == want
