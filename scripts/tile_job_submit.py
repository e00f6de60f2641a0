#!/usr/bin/env python
"""Cluster entrypoint for the flagship tile job (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package and submit:

    cd /root/repo && zip -r /tmp/pdal_spark.zip pdal_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/pdal_spark.zip \
        scripts/tile_job_submit.py \
        --src  <pages table or parquet path> \
        --dest <output root> \
        --length 5.0 --origin-x -180 --origin-y -85 [--buffer 0.5] \
        [--resume]

The job geocodes pages to points (xxhash64(url) — byte-identical
`text` is never touched), tiles them with the buffered splitter, and
writes partitioned parquet plus per-partition metrics and lineage
tables with snapshot checkpointing; a re-run with --resume skips
committed tiles (pdal_spark.plans.job.TileJob).

Local smoke (this sandbox): python scripts/tile_job_submit.py --synth
20000 --dest /tmp/tiles_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs from any cwd; under spark-submit --py-files the package
# is already on the path and this is a no-op
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="pages table name or parquet path")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N pages instead of reading --src")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--length", type=float, default=5.0)
    ap.add_argument("--origin-x", type=float, default=-180.0)
    ap.add_argument("--origin-y", type=float, default=-85.0)
    ap.add_argument("--buffer", type=float, default=0.0)
    ap.add_argument("--resume", action="store_true",
                    help="(informational; resume is automatic — "
                         "committed tiles are always skipped)")
    args = ap.parse_args()

    from pdal_spark.plans.job import TileJob
    from pdal_spark.session import get_spark
    from pdal_spark.sources.pages import read_pages, synth_pages
    from pdal_spark.operators.h3 import geocode_url

    spark = get_spark("pdal_spark-tile-job")
    if args.synth:
        pages = geocode_url(synth_pages(spark, args.synth), "url")
    else:
        pages = read_pages(spark, args.src)

    job = TileJob(
        args.dest, length=args.length,
        origin_x=args.origin_x, origin_y=args.origin_y,
        buffer=args.buffer, text_col="text",
    )
    result = job.run(spark, pages)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
