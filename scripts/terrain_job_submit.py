#!/usr/bin/env python
"""Cluster entrypoint for the terrain-hydrology chain (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Package and submit:

    zip -r /tmp/pdal_spark.zip pdal_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/pdal_spark.zip \
        scripts/terrain_job_submit.py \
        --src  <cell elevation parquet (cell, x)> \
        --dest <output root> --res 6

Runs the resumable fill -> resolve-flats -> {accumulation, Strahler,
watershed} chain (pdal_spark.plans.terrain.TerrainJob) with stage
checkpoints, atomic snapshot markers, and a metrics/lineage table; a
re-launched run resumes from the last committed stage (no --src
needed once `cells` is committed).

Local smoke (this sandbox): python scripts/terrain_job_submit.py
--synth 4000 --res 5 --dest /tmp/terrain_demo
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
    ap.add_argument("--src", help="cell elevation parquet (cell, x)")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N event-derived cells instead")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--res", type=int, required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdal_spark.plans.terrain import TerrainJob
    from pdal_spark.session import get_spark

    spark = get_spark("pdal_spark-terrain-job")
    job = TerrainJob(args.dest, res=args.res)

    cells = None
    if "cells" not in job.committed_stages():
        if args.synth:
            from pdal_spark import sqlgen as G

            pts = spark.range(args.synth).select(
                F.expr(G.geo_lon("id")).alias("lon"),
                F.expr(G.geo_lat("id")).alias("lat"),
            )
            cells = pts.select(
                F.expr(G.qcell("lat", "lon", args.res)).alias("cell")
            ).groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
        elif args.src:
            cells = spark.read.parquet(args.src)
        else:
            ap.error("--src or --synth required on the first run")

    result = job.run(spark, cells)
    print(json.dumps({
        "stages": sorted(job.committed_stages()),
        "rows": {k: v.count() for k, v in result.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
