"""Incremental ingest — the engine's counterpart of PDAL stream mode.

PDAL's "stream mode" is chunked pipelined batch (SURVEY.md §2.10): a
10,000-point FixedPointTable is filled by the reader, every filter's
processOne runs per point with a skip-mask, repeat until exhausted
(pdal/Streamable.cpp:192-281). There are no watermarks or event-time
semantics to port. The honest Spark mapping is Structured Streaming
over a growing file directory with the `availableNow` trigger:

- each micro-batch ≙ one FixedPointTable pass (Arrow batches inside
  are even sized like PDAL's buffer — session.ARROW_BATCH_ROWS);
- the transformation chain is EXACTLY the batch operators, applied
  via foreachBatch — stream/standard equivalence by construction
  (the reference tests this equivalence in StreamingTest.cpp);
- the checkpointLocation gives exactly-once file tracking, the
  streaming analog of plans.job's snapshot manifests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_ingest(
    spark: SparkSession,
    src_path: str,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    schema=None,
    max_files_per_batch: int = 64,
) -> None:
    """Process all files currently in src_path (and any that appeared
    since the last run) exactly once, then stop (availableNow).

    transform: batch-operator chain (DataFrame -> DataFrame).
    sink: called per micro-batch with the transformed frame + batch id
    (e.g. lambda df, i: TileJob(...).run(spark, df)).
    """
    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(src_path)
    )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        sink(transform(batch_df), batch_id)

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_exact_dedup(
    spark: SparkSession,
    src_path: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    key: str = "text_hash",
    text: str = "text",
    event_time: str | None = None,
    watermark: str = "10 minutes",
    schema=None,
) -> None:
    """Streaming exact dedup of incoming pages: the first page with a
    given content hash passes, later copies are dropped — ACROSS
    micro-batches and restarts (state store + checkpoint), the
    streaming form of `operators.dedup.exact_dedup`.

    With `event_time` set, uses dropDuplicatesWithinWatermark so the
    dedup state is bounded: duplicates are suppressed within the
    watermark horizon and state older than it is evicted — the only
    form that survives 10^12-row streams (unbounded dropDuplicates
    state would grow forever). Without it, state is unbounded exact
    (small/finite backfills only)."""
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(src_path)
        .withColumn(key, F.md5(F.col(text)))
    )
    if event_time is not None:
        deduped = stream.withWatermark(
            event_time, watermark
        ).dropDuplicatesWithinWatermark([key])
    else:
        deduped = stream.dropDuplicates([key])
    q = (
        deduped.writeStream.foreachBatch(
            lambda df, i: sink(df, i)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_warc_ingest(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    max_files_per_batch: int = 16,
) -> None:
    """Exactly-once WARC ingest of a GROWING segment directory — the
    production arrival pattern (new CC segments land continuously):
    readStream over binaryFile tracks which segments were consumed in
    the checkpoint; each micro-batch parses its files row-locally
    (sources.warc pattern: one file per task) and appends extracted
    pages to `dest`. Re-running after a crash (or on a schedule, via
    availableNow) processes only NEW segments — the streaming twin of
    `scripts/warc_ingest_submit.py`.
    """
    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import extract_text
    from pdal_spark.sources.warc import read_warc  # noqa: F401 (doc)
    from pdal_spark.sources.warc import WARC_SCHEMA, _parse_warc_bytes

    stream = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed but streaming sources must
        # state it explicitly
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("maxFilesPerTrigger", max_files_per_batch)
        .load(src_path)
    )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        def parse(batches):
            for pdf in batches:
                rows = []
                for content in pdf["content"]:
                    rows.extend(_parse_warc_bytes(bytes(content)))
                out = pd.DataFrame(
                    rows, columns=["url", "warc_ts", "record_type",
                                   "payload"],
                )
                yield out[out.record_type == "response"]

        recs = batch_df.select("content").mapInPandas(
            parse, WARC_SCHEMA
        )
        pages = extract_text(recs, html="payload", out="text").select(
            "url",
            F.col("warc_ts").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            "text",
        )
        pages.write.mode("append").parquet(dest)

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
