"""Watermarked stream-stream joins — the event-time join shape the
reference's chunked stream mode cannot express at all (a PDAL stream
stage sees one buffer; a stream-stream join needs BOTH sides'
unmatched rows buffered in the state store until their watermark
passes).

The canonical instance here is impression->click attribution: clicks
join the impression they follow within an attribution window, state
is bounded by the watermarks (Spark evicts impressions once no
in-window click can still arrive), and a click later than its side's
watermark is dropped rather than joined — exactly-once, restart-safe
semantics come from the checkpoint like the other streaming ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    imp_ts: str = "imp_ts",
    clk_ts: str = "clk_ts",
    within: str = "10 minutes",
    imp_watermark: str = "30 minutes",
    clk_watermark: str = "30 minutes",
) -> DataFrame:
    """Inner event-time interval join: each click attributes to any
    impression of the same key with imp_ts <= clk_ts <= imp_ts +
    `within`. Both inputs are STREAMING DataFrames; watermarks bound
    the join state on both sides (impressions evict `within` +
    watermark after their event time).

    Output: (key, imp_id, click_id, imp_ts, clk_ts, lag_s).
    """
    i = (
        impressions.withWatermark(imp_ts, imp_watermark)
        .select(
            F.col(key).alias("__k"),
            F.col("imp_id"),
            F.col(imp_ts).alias("__its"),
        )
    )
    c = (
        clicks.withWatermark(clk_ts, clk_watermark)
        .select(
            F.col(key).alias("__ck"),
            F.col("click_id"),
            F.col(clk_ts).alias("__cts"),
        )
    )
    cond = (
        (F.col("__k") == F.col("__ck"))
        & (F.col("__cts") >= F.col("__its"))
        & (F.col("__cts") <= F.col("__its") + F.expr(
            f"INTERVAL {within}"))
    )
    return i.join(c, cond, "inner").select(
        F.col("__k").alias(key),
        "imp_id",
        "click_id",
        F.col("__its").alias(imp_ts),
        F.col("__cts").alias(clk_ts),
        (F.unix_micros("__cts") - F.unix_micros("__its"))
        .alias("lag_us"),
    )


def run_attribution(
    spark,
    imp_path: str,
    clk_path: str,
    checkpoint: str,
    out_path: str,
    within: str = "10 minutes",
    schema_imp: str = "imp_id long, user_id long, imp_ts timestamp",
    schema_clk: str = "click_id long, user_id long, clk_ts timestamp",
) -> None:
    """One availableNow attribution pass over growing impression and
    click directories; join state (unmatched rows within watermark)
    recovers from the checkpoint across runs."""
    imps = spark.readStream.schema(schema_imp).parquet(imp_path)
    clks = spark.readStream.schema(schema_clk).parquet(clk_path)
    out = attribution_join(imps, clks, within=within)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
