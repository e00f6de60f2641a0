"""`pdal`-style command line — the apps/kernels surface
(apps/pdal.cpp dispatching kernels/*.cpp). A reference user runs
`pdal <kernel> ...`; here it is `python -m pdal_spark.cli <kernel>
...` (or spark-submit the same module). Thin by design: every
subcommand parses args, calls the engine operator, and prints ONE
JSON line with the outcome — all heavy lifting stays in the
distributed operators.

| reference kernel | subcommand |
|---|---|
| kernels/PipelineKernel.cpp  | pipeline <json-file>            |
| kernels/TranslateKernel.cpp | translate <in> <out> [--json S] |
| kernels/InfoKernel.cpp      | info <in> [--dims a,b]          |
| kernels/TileKernel.cpp      | tile <in> <outdir> --length L   |
| kernels/DensityKernel.cpp   | density <in> --res R            |
| kernels/DeltaKernel.cpp / Chamfer / Hausdorff | delta <src> <cand> |
| kernels/MergeKernel.cpp     | merge <out> <in...>             |
| kernels/SortKernel.cpp      | sort <in> <out> --dims a,b      |
| kernels/RandomKernel.cpp    | random <out> --count N [--mode] |
| kernels/SplitKernel.cpp     | split <in> <outdir> --capacity N|
| kernels/EvalKernel.cpp      | eval <in> --predicted --truth   |
| kernels/GroundKernel.cpp    | ground <in> <out> --method smrf |
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from pdal_spark.session import get_spark

    return get_spark(
        "pdal_spark-cli", master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def _emit(obj) -> None:
    print(json.dumps(obj, sort_keys=True))


def cmd_pipeline(args) -> None:
    from pdal_spark.plans import Pipeline

    with open(args.json) as f:
        spec = json.load(f)
    p = Pipeline(spec)
    df = p.execute(_spark(args))
    _emit({"kernel": "pipeline", "rows": df.count()})


def cmd_translate(args) -> None:
    from pdal_spark.plans import Pipeline

    stages: list[dict] = [
        {"type": "readers.parquet", "filename": args.input}
    ]
    if args.json:
        extra = json.loads(args.json)
        stages.extend(extra if isinstance(extra, list) else [extra])
    stages.append({"type": "writers.parquet", "filename": args.output,
                   "mode": "overwrite"})
    df = Pipeline(stages).execute(_spark(args))
    _emit({"kernel": "translate", "rows": df.count(),
           "output": args.output})


def cmd_info(args) -> None:
    from pdal_spark.operators.stats import stats

    # `pdal info --summary` analog for COPC/EPT containers: header
    # + hierarchy metadata only, no point reads, no Spark session
    if args.input.endswith(".copc.laz"):
        from pdal_spark.sources.copc import copc_quickinfo

        qi = copc_quickinfo(args.input)
        _emit({"kernel": "info", "container": "copc", **qi})
        return
    if args.input.endswith(".slpk"):
        from pdal_spark.sources.slpk import slpk_quickinfo

        qi = slpk_quickinfo(args.input)
        _emit({"kernel": "info", "container": "slpk", **qi})
        return
    if args.input.endswith(".e57"):
        from pdal_spark.sources.e57 import e57_quickinfo

        qi = e57_quickinfo(args.input)
        _emit({"kernel": "info", "container": "e57", **qi})
        return
    if args.input.endswith(".ntf") or args.input.endswith(".nitf"):
        from pdal_spark.sources.nitf import nitf_quickinfo

        qi = nitf_quickinfo(args.input)
        _emit({"kernel": "info", "container": "nitf", **qi})
        return
    import os

    if os.path.isfile(os.path.join(args.input, "ept.json")):
        from pdal_spark.sources.ept import read_ept_info

        info = read_ept_info(args.input)
        _emit({"kernel": "info", "container": "ept",
               "point_count": info["points"],
               "bounds": info["bounds"],
               "dataType": info["dataType"],
               "span": info.get("span"),
               "dims": [f["name"] for f in info["schema"]]})
        return

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    dims = (
        args.dims.split(",") if args.dims
        else [f.name for f in df.schema.fields
              if f.dataType.typeName() in
              ("double", "float", "long", "integer")]
    )
    out = {
        "kernel": "info", "rows": df.count(),
        "schema": [f"{f.name}:{f.dataType.simpleString()}"
                   for f in df.schema.fields],
        "stats": [
            {k: (row[k] if not hasattr(row[k], "__float__")
                 else float(row[k]))
             for k in ("dimension", "cnt", "minimum", "maximum",
                       "average")}
            for row in stats(df, dims).collect()
        ],
    }
    _emit(out)


def cmd_tile(args) -> None:
    from pdal_spark.plans.job import TileJob

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    job = TileJob(
        args.outdir, length=args.length, x=args.x, y=args.y,
        origin_x=args.origin_x, origin_y=args.origin_y,
    )
    res = job.run(spark, df)
    _emit({"kernel": "tile", **res})


def cmd_curate(args) -> None:
    from pdal_spark.plans.corpus import CorpusJob

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval_set) if args.eval_set else None
    job = CorpusJob(
        args.outdir,
        min_words=args.min_words,
        max_punct_ratio=args.max_punct_ratio,
        jaccard_threshold=args.jaccard,
        n_shards=args.shards,
    )
    res = job.run(spark, df, eval_df=ev)
    _emit({"kernel": "curate", **res})


def cmd_ingest(args) -> None:
    """WARC segments -> pages parquet (url, warc_ts, html, text)."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import extract_text
    from pdal_spark.sources.warc import read_warc

    spark = _spark(args)
    recs = read_warc(spark, args.input, record_type="response")
    pages = extract_text(recs, html="payload", out="text").select(
        "url",
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.col("payload").alias("html"),
        "text",
    )
    pages.repartition(args.shards, "url").write.mode(
        "overwrite"
    ).parquet(args.outdir)
    _emit({
        "kernel": "ingest",
        "pages": spark.read.parquet(args.outdir).count(),
    })


def cmd_density(args) -> None:
    from pdal_spark.operators.hexbin import h3bin

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    cells = h3bin(df, lat=args.y, lon=args.x, res=args.res)
    if args.output:
        cells.write.mode("overwrite").parquet(args.output)
    _emit({"kernel": "density", "cells": cells.count()})


def cmd_delta(args) -> None:
    from pdal_spark.operators.knn import cloud_compare

    spark = _spark(args)
    src = spark.read.parquet(args.src)
    cand = spark.read.parquet(args.candidate)
    row = cloud_compare(
        src, cand, x=args.x, y=args.y,
        id_left=args.id, id_right=args.id, cell=args.cell,
    ).collect()[0]
    _emit({"kernel": args.kernel,
           **{k: float(row[k]) for k in row.asDict()}})


def cmd_merge(args) -> None:
    from functools import reduce

    spark = _spark(args)
    dfs = [spark.read.parquet(p) for p in args.inputs]
    out = reduce(lambda a, b: a.unionByName(b), dfs)
    out.write.mode("overwrite").parquet(args.output)
    _emit({"kernel": "merge", "rows": out.count(),
           "inputs": len(args.inputs)})


def cmd_sort(args) -> None:
    from pdal_spark.operators.rowops import sort as op_sort

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    out = op_sort(
        df, [(d.strip(), "asc") for d in args.dims.split(",")]
    )
    out.write.mode("overwrite").parquet(args.output)
    _emit({"kernel": "sort", "rows": out.count()})


def cmd_random(args) -> None:
    from pdal_spark.sources.faux import faux_reader

    spark = _spark(args)
    out = faux_reader(
        spark, args.count, args.mode,
        ([args.minx, args.miny], [args.maxx, args.maxy]),
    )
    out.write.mode("overwrite").parquet(args.output)
    _emit({"kernel": "random", "rows": args.count})


def cmd_split(args) -> None:
    from pdal_spark.operators.rowops import divider

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    out = divider(
        df, mode="partition", capacity=args.capacity,
        order=args.order,
    )
    (
        out.repartition("group_id").write.mode("overwrite")
        .partitionBy("group_id").parquet(args.outdir)
    )
    _emit({"kernel": "split", "rows": df.count()})


def cmd_eval(args) -> None:
    from pdal_spark.operators.stats import eval_classification

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    rows = eval_classification(
        df, args.predicted, args.truth
    ).collect()
    _emit({
        "kernel": "eval",
        "labels": [
            {k: (int(r[k]) if k in ("label", "tp", "fp", "fn", "tn")
                 else float(r[k]))
             for k in ("label", "tp", "fp", "fn", "tn", "precision",
                       "recall", "f1", "accuracy")}
            for r in rows
        ],
        "overall_accuracy": (
            sum(int(r["tp"]) for r in rows)
            / sum(int(r["tp"]) + int(r["fn"]) for r in rows)
        ),
    })


def cmd_ground(args) -> None:
    from pdal_spark.operators import ground as G

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    fn = {"smrf": G.smrf, "pmf": G.pmf, "csf": G.csf}[args.method]
    kw = dict(x=args.x, y=args.y, z=args.z, id_col=args.id)
    if args.method == "smrf":
        out = fn(df, cell=args.cell, **kw)
    elif args.method == "pmf":
        out = fn(df, cell_size=args.cell, **kw)
    else:
        out = fn(df, resolution=args.cell, **kw)
    out.write.mode("overwrite").parquet(args.output)
    from pyspark.sql import functions as F

    n_ground = out.where(F.col("cls") == 2).count()
    _emit({"kernel": "ground", "method": args.method,
           "rows": df.count(), "ground": n_ground})


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="pdal_spark")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    sub = ap.add_subparsers(dest="kernel", required=True)

    p = sub.add_parser("pipeline")
    p.add_argument("json")
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("translate")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--json", default=None,
                   help="JSON list of filter stages")
    p.set_defaults(fn=cmd_translate)

    p = sub.add_parser("info")
    p.add_argument("input")
    p.add_argument("--dims", default=None)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("tile")
    p.add_argument("input")
    p.add_argument("outdir")
    p.add_argument("--length", type=float, default=10.0)
    p.add_argument("--x", default="x")
    p.add_argument("--y", default="y")
    p.add_argument("--origin-x", type=float, default=-180.0)
    p.add_argument("--origin-y", type=float, default=-90.0)
    p.set_defaults(fn=cmd_tile)

    p = sub.add_parser("curate")
    p.add_argument("input")
    p.add_argument("outdir")
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.3)
    p.add_argument("--jaccard", type=float, default=0.5)
    p.add_argument("--eval-set", default=None)
    p.add_argument("--shards", type=int, default=16)
    p.set_defaults(fn=cmd_curate)

    p = sub.add_parser("ingest")
    p.add_argument("input", help="directory of .warc segments")
    p.add_argument("outdir")
    p.add_argument("--shards", type=int, default=16)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("density")
    p.add_argument("input")
    p.add_argument("--res", type=int, default=7)
    p.add_argument("--x", default="lon")
    p.add_argument("--y", default="lat")
    p.add_argument("--output", default=None)
    p.set_defaults(fn=cmd_density)

    # chamfer / hausdorff are the same symmetric NN summary with a
    # different headline metric (ChamferKernel.cpp, HausdorffKernel.cpp)
    for kern in ("delta", "chamfer", "hausdorff"):
        p = sub.add_parser(kern)
        p.add_argument("src")
        p.add_argument("candidate")
        p.add_argument("--x", default="lon")
        p.add_argument("--y", default="lat")
        p.add_argument("--id", default="pid")
        p.add_argument("--cell", type=float, default=8.0)
        p.set_defaults(fn=cmd_delta)

    p = sub.add_parser("merge")
    p.add_argument("output")
    p.add_argument("inputs", nargs="+")
    p.set_defaults(fn=cmd_merge)

    p = sub.add_parser("sort")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--dims", required=True)
    p.set_defaults(fn=cmd_sort)

    p = sub.add_parser("random")
    p.add_argument("output")
    p.add_argument("--count", type=int, default=1000)
    p.add_argument("--mode", default="uniform")
    p.add_argument("--minx", type=float, default=0.0)
    p.add_argument("--miny", type=float, default=0.0)
    p.add_argument("--maxx", type=float, default=100.0)
    p.add_argument("--maxy", type=float, default=100.0)
    p.set_defaults(fn=cmd_random)

    p = sub.add_parser("eval")
    p.add_argument("input")
    p.add_argument("--predicted", default="cls")
    p.add_argument("--truth", default="truth")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("ground")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--method", default="smrf",
                   choices=["smrf", "pmf", "csf"])
    p.add_argument("--cell", type=float, default=1.0)
    p.add_argument("--x", default="x")
    p.add_argument("--y", default="y")
    p.add_argument("--z", default="z")
    p.add_argument("--id", default="pid")
    p.set_defaults(fn=cmd_ground)

    p = sub.add_parser("split")
    p.add_argument("input")
    p.add_argument("outdir")
    p.add_argument("--capacity", type=int, required=True)
    p.add_argument("--order", default="pid")
    p.set_defaults(fn=cmd_split)

    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
