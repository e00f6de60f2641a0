"""Streaming continuous aggregate — the incremental twin of
`operators.temporal.time_rollup` (TimescaleDB's continuous-aggregate
contract over Structured Streaming).

The batch op's output is pure mergeable counters: (n, value_q_sum)
per (width, bucket[, group]), with value_q_sum an int64 fixed-point
sum — so a stream maintains the aggregate by writing each
micro-batch's PARTIAL counter table and folding partials on read.

Exactly-once without a transactional sink: each micro-batch's
partials land in a `batch=<id>` partition via dynamic partition
overwrite — a replayed batch (failure between sink write and
checkpoint commit) REPLACES its own partition instead of
double-counting. This is the standard idempotent-foreachBatch
pattern (the batch id is stable across replays); on Iceberg/Delta
the same merge is a MERGE INTO keyed by batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_time_rollup(
    spark: SparkSession,
    src_path: str,
    state_path: str,
    checkpoint: str,
    widths_s: list[int] | None = None,
    ts: str = "ts",
    value: str = "value",
    group_col: str | None = None,
    schema=None,
    max_files_per_batch: int = 64,
) -> None:
    """Consume all new files under src_path (availableNow), fold each
    micro-batch through the batch `time_rollup`, and persist the
    per-batch partial counters idempotently under state_path.

    Restart-safe: the checkpoint tracks consumed files; a replayed
    micro-batch overwrites its own `batch=` partition. State volume
    is counter-sized (buckets, not rows); `compact_time_rollup`
    folds old partials when batch count grows.
    """
    from pdal_spark.operators.temporal import time_rollup

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(src_path)
    )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        part = time_rollup(
            batch_df, widths_s=widths_s, ts=ts, value=value,
            group_col=group_col,
        ).withColumn("batch", F.lit(int(batch_id)))
        (
            part.write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(state_path)
        )

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_time_rollup(
    spark: SparkSession,
    state_path: str,
    group_col: str | None = None,
) -> DataFrame:
    """Serve the continuous aggregate: fold all per-batch partials
    into the final (width_s, bucket_start_s[, group], n, value_q_sum)
    table. Counter-sized work — integer sums merge exactly in any
    order, so the result is identical to running the batch
    `time_rollup` over everything consumed so far (tested)."""
    keys = ["width_s", "bucket_start_s"] + (
        [group_col] if group_col else []
    )
    return (
        spark.read.parquet(state_path)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_q_sum").alias("value_q_sum"),
        )
    )


def compact_time_rollup(
    spark: SparkSession,
    state_path: str,
    compacted_path: str,
    group_col: str | None = None,
) -> None:
    """Fold every partial into a single `batch=-1` baseline partition
    at compacted_path (plus nothing else) — run periodically so the
    partial count stays bounded; the streaming job keeps appending
    new batch partitions next to the baseline."""
    out = read_time_rollup(spark, state_path, group_col).withColumn(
        "batch", F.lit(-1)
    )
    out.write.partitionBy("batch").mode("overwrite").parquet(
        compacted_path
    )
