"""The pages-table source: Common-Crawl-style web pages -> points.

BASELINE.json input_hint: an Iceberg table with columns
(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string). `read_pages` scans it (Iceberg catalog table name or a
parquet path — this sandbox has no Iceberg jars, so parquet carries
the identical layout semantics) and geocodes each page to a point
record via xxhash64(url), preserving `text` BYTE-IDENTICAL per url
(the per-row invariant vs the reference: the engine only ever adds
columns, never rewrites payload ones).

`synth_pages` deterministically synthesizes a table of exactly that
shape at small scale for tests/benchmarks (no external data), per
the driver instruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.operators.h3 import geocode_url

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    spark: SparkSession,
    source: str,
    count: int | None = None,
    geocode: bool = True,
) -> DataFrame:
    """Scan the pages table. `source` is an Iceberg table name
    (catalog.db.table) or a parquet path. Reader `count` = limit
    (pdal/Reader.cpp count option)."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.table(source)  # Iceberg via catalog when present
    if count is not None:
        df = df.limit(count)
    if geocode:
        df = geocode_url(df, "url")
    return df


_LANGS = ["en", "de", "fr", "es", "zh"]


def synth_pages(
    spark: SparkSession,
    count: int = 10_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic pages table of the input_hint shape:
    (url, warc_ts, html, text, lang) + nothing else. All columns are
    pure functions of the row id, so any two runs (and any two
    engines mirroring the arithmetic) agree byte-for-byte."""
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, count, 1, numPartitions=parts)
    url = F.concat(
        F.lit("https://site-"),
        (F.col("id") % 1000).cast("string"),
        F.lit(".example.com/page/"),
        F.col("id").cast("string"),
    )
    text = F.concat(
        F.lit("word"), (F.col("id") % 97).cast("string"),
        F.lit(" body "),
        F.repeat(
            F.concat(F.lit("tok"), (F.col("id") % 13).cast("string"),
                     F.lit(" ")),
            (F.col("id") % 20 + 1).cast("int"),
        ),
    )
    return df.select(
        url.alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("id") % 31536000
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), text, F.lit("</html>")),
                 "utf-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in _LANGS]),
            (F.col("id") % len(_LANGS) + 1).cast("int"),
        ).alias("lang"),
    )
