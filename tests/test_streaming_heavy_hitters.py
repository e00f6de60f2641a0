"""Streaming heavy hitters: counts accumulate across micro-batches
and across RUNS via the staged counter partitions; alerts fire when
the running estimate crosses the threshold; replay never
double-counts."""

import pandas as pd
from pyspark.sql import functions as F

from pdal_spark.streaming.ingest import streaming_heavy_hitters


def _run(spark, tmp_path, threshold=10):
    streaming_heavy_hitters(
        spark,
        f"{tmp_path}/src/*",
        str(tmp_path / "dest"),
        str(tmp_path / "ckpt"),
        elem_col="e",
        d=4,
        w=64,
        threshold=threshold,
    )


def _write_wave(spark, src, name, counts):
    rows = [(e,) for e, c in counts.items() for _ in range(c)]
    spark.createDataFrame(rows, "e long").coalesce(1).write.parquet(
        str(src / name)
    )


def test_cross_batch_accumulation_and_alerts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    # wave 1: key 7 at 6 < threshold 10 -> no alert yet
    _write_wave(spark, src, "w1.parquet", {7: 6, 8: 2})
    _run(spark, tmp_path)
    alerts = pd.read_parquet(f"{tmp_path}/dest/alerts")
    assert len(alerts) == 0

    # wave 2: 5 more of key 7 -> running est 11 >= 10 -> alert;
    # key 9 appears 12 times in ONE batch -> alerts immediately
    _write_wave(spark, src, "w2.parquet", {7: 5, 9: 12})
    _run(spark, tmp_path)
    alerts = pd.read_parquet(f"{tmp_path}/dest/alerts")
    got = {int(r.e): int(r.cms_est) for _, r in alerts.iterrows()}
    assert got.get(7, 0) >= 11 and got.get(9, 0) >= 12
    assert 8 not in got

    # the staged sketch total counts every element exactly once
    sk = pd.read_parquet(f"{tmp_path}/dest/sketch")
    per_row = sk.groupby("row")["cnt"].sum()
    assert set(per_row) == {25}  # 8 + 17 elements, every depth row


def test_replay_never_double_counts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_wave(spark, src, "w1.parquet", {1: 4})
    _run(spark, tmp_path)
    # replay batch 0 by hand: overwrite its own partition
    from pdal_spark.operators.sketch import cms_build

    b = spark.read.parquet(str(src / "w1.parquet"))
    sk = cms_build(b, "e", d=4, w=64).withColumn("batch", F.lit(0))
    (
        sk.write.partitionBy("batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(f"{tmp_path}/dest/sketch")
    )
    sk2 = pd.read_parquet(f"{tmp_path}/dest/sketch")
    assert sk2.groupby("row")["cnt"].sum().max() == 4
