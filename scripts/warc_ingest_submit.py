#!/usr/bin/env python
"""Cluster entrypoint for WARC ingest: Common-Crawl-style WARC
segments -> the engine's pages table (url, warc_ts, html, text,
lang) as hash-sharded parquet, ready for CorpusJob / TileJob.

Package and submit:

    cd /root/repo && zip -r /tmp/pdal_spark.zip pdal_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/pdal_spark.zip \
        scripts/warc_ingest_submit.py \
        --src  <dir of .warc segments> \
        --dest <pages parquet root> \
        [--shards 4096]

Scale design: `binaryFile` gives ONE TASK PER SEGMENT (the ~1 GB
unit CC ships), record parsing and HTML->text extraction are
row-local, and the only shuffle is the final repartition into
`--shards` hash shards for balanced downstream reads. lang is the
engine's n-gram heuristic (operators.textops.lang_id-compatible
stopword signal), kept deliberately cheap at ingest.

Local smoke (this sandbox):
    python scripts/warc_ingest_submit.py --demo /tmp/warc_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="directory of .warc segments")
    ap.add_argument("--dest", help="output parquet root")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--demo", default=None,
                    help="write a demo WARC + run ingest under DIR")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import extract_text
    from pdal_spark.session import get_spark
    from pdal_spark.sources.warc import read_warc, write_warc_file

    if args.demo:
        os.makedirs(args.demo, exist_ok=True)
        src = os.path.join(args.demo, "segments")
        os.makedirs(src, exist_ok=True)
        write_warc_file(
            os.path.join(src, "seg-00000.warc"),
            [(f"https://demo.org/p{i}", "2026-01-01T00:00:00Z",
              "response",
              f"<html><body><p>the demo page {i} of and to"
              f"</p></body></html>".encode())
             for i in range(100)],
        )
        args.src, args.dest = src, os.path.join(args.demo, "pages")
    if not (args.src and args.dest):
        ap.error("--src and --dest required (or --demo)")

    spark = get_spark("pdal_spark-warc-ingest")
    recs = read_warc(spark, args.src, record_type="response")
    pages = extract_text(recs, html="payload", out="text").select(
        "url",
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.col("payload").alias("html"),
        "text",
        # cheap ingest-time lang signal: English stopword hit-rate
        F.when(
            F.size(
                F.array_intersect(
                    F.split(F.lower("text"), " "),
                    F.array(*[F.lit(w) for w in
                              ("the", "and", "of", "to", "in")]),
                )
            ) >= 2,
            F.lit("en"),
        ).otherwise(F.lit("und")).alias("lang"),
    )
    (
        pages.repartition(args.shards, "url")
        .write.mode("overwrite").parquet(args.dest)
    )
    out = spark.read.parquet(args.dest)
    print(json.dumps({
        "pages": out.count(),
        "langs": {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(
                      F.count(F.lit(1)).alias("n")).collect()},
        "dest": args.dest,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
