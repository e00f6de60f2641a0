#!/usr/bin/env python
"""Cluster entrypoint for the movement-analysis chain (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Package and submit:

    cd /root/repo && zip -r /tmp/pdal_spark.zip pdal_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/pdal_spark.zip \
        scripts/movement_job_submit.py \
        --src  <ping table or parquet path with key/ts/mx/my> \
        --dest <output root> \
        [--t2 400000000] [--min-n 2] [--zone-q 20000] \
        [--tbin-q 3600] [--min-run 2]

The job runs the resumable stay-point -> OD-flow -> flock chain
(pdal_spark.plans.movement.MovementJob): each stage checkpoints to
parquet with an atomic snapshot marker and a metrics/lineage row; a
re-launched run resumes from the last committed stage (no --src
needed once the `points` stage is committed).

Local smoke (this sandbox): python scripts/movement_job_submit.py
--synth 5000 --dest /tmp/movement_demo
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
    ap.add_argument("--src", help="ping parquet path (key, ts, mx, my)")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N pings instead of reading --src")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--t2", type=int, default=400_000_000,
                    help="squared stay-step threshold (grid units^2)")
    ap.add_argument("--min-n", type=int, default=2)
    ap.add_argument("--zone-q", type=int, default=20_000)
    ap.add_argument("--tbin-q", type=int, default=3600)
    ap.add_argument("--min-run", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdal_spark.plans.movement import MovementJob
    from pdal_spark.session import get_spark

    spark = get_spark("pdal_spark-movement-job")
    job = MovementJob(
        args.dest, key="key", ts="ts", t2=args.t2,
        min_n=args.min_n, zone_q=args.zone_q, tbin_q=args.tbin_q,
        min_run=args.min_run,
    )

    points = None
    if "points" not in job.committed_stages():
        if args.synth:
            from pdal_spark import sqlgen as G

            points = spark.range(args.synth).select(
                (F.col("id") % 97).alias("key"),
                F.col("id").alias("ts"),
                # slow drift (+30 grid units per own ping) with a
                # periodic wrap jump: dwell segments + real moves
                F.expr(
                    f"cast(floor(({G.geo_lon('id % 97')}) * 1000.0e0"
                    " + 0.5e0) as bigint) + (id % 2000) * 30"
                ).alias("mx"),
                F.expr(
                    f"cast(floor(({G.geo_lat('id % 97')}) * 1000.0e0"
                    " + 0.5e0) as bigint)"
                ).alias("my"),
            )
        elif args.src:
            points = spark.read.parquet(args.src)
        else:
            ap.error("--src or --synth required on the first run")

    result = job.run(spark, points)
    print(json.dumps({
        "stages": sorted(job.committed_stages()),
        "rows": {k: v.count() for k, v in result.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
