"""readers.tindex analog — tile-index manifest scan.

Reference: io/TIndexReader.cpp reads a vector file whose features
carry (location, extent geometry), selects features intersecting the
query geometry, then reads the referenced point files. The Spark
shape is a manifest DataFrame of (path, xmin, xmax, ymin, ymax)
filtered by bbox intersection, then a union of parquet scans of the
matching paths — the same file-skipping idea Iceberg min/max stats
give for free on a partitioned layout (SURVEY.md §4 pushdown row).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tindex(
    spark: SparkSession,
    manifest: DataFrame,
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """manifest columns: path, xmin, xmax, ymin, ymax. bounds =
    (xmin, xmax, ymin, ymax) query window; None = read everything."""
    m = manifest
    if bounds is not None:
        qx0, qx1, qy0, qy1 = (float(v) for v in bounds)
        m = m.where(
            (F.col("xmax") >= qx0) & (F.col("xmin") <= qx1)
            & (F.col("ymax") >= qy0) & (F.col("ymin") <= qy1)
        )
    paths = [r["path"] for r in m.select("path").distinct().collect()]
    if not paths:
        raise ValueError("tindex: no tiles intersect the query bounds")
    scans = [spark.read.parquet(p) for p in paths]
    return reduce(lambda a, b: a.unionByName(b), scans)


def copc_tindex(spark: SparkSession, path: str) -> DataFrame:
    """Build a tile-index manifest over a directory/glob of COPC
    tiles (e.g. a write_copc output tree): one header+info-VLR read
    per file (copc_quickinfo — no hierarchy pages, no point bytes),
    yielding (path, minx..maxz, point_count, spacing). Persist it
    (parquet/Iceberg) and the per-query planning cost at 100 TB is a
    manifest scan instead of a million header reads."""
    import glob as _glob
    import os

    from pdal_spark.sources.copc import copc_quickinfo

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.laz"),
                                  recursive=True))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise ValueError(f"copc_tindex: no files match {path!r}")
    rows = []
    for fp in files:
        qi = copc_quickinfo(fp)
        e = qi["root_extent"]
        rows.append((fp, float(e[0]), float(e[1]), float(e[2]),
                     float(e[3]), float(e[4]), float(e[5]),
                     int(qi["point_count"]), float(qi["spacing"])))
    return spark.createDataFrame(
        rows, "path string, minx double, miny double, minz double, "
              "maxx double, maxy double, maxz double, "
              "point_count long, spacing double")


def plan_copc_tindex(manifest, bounds=None, polygon=None) -> dict:
    """Level-1 (whole-file) pruning of a copc_tindex manifest:
    returns {"paths": surviving, "files_total": n, "files_pruned":
    k}. Bounds prune on the root-cube extent; polygons prune with
    the same conservative rect-vs-polygon test the node-level walk
    uses (boundary contact = overlap)."""
    from pdal_spark.sources.copc import (
        _normalize_polys,
        _rect_intersects_polygon,
        normalize_bounds,
    )

    rows = (manifest.collect()
            if isinstance(manifest, DataFrame) else list(manifest))
    nb = normalize_bounds(bounds)
    polys = _normalize_polys(polygon)
    keep = []
    for r in rows:
        e = (r["minx"], r["miny"], r["minz"],
             r["maxx"], r["maxy"], r["maxz"])
        if nb is not None:
            if e[3] < nb[0] or e[0] > nb[3] \
                    or e[4] < nb[1] or e[1] > nb[4]:
                continue
            if nb[2] is not None and (e[5] < nb[2] or e[2] > nb[5]):
                continue
        if polys is not None:
            rect = (e[0], e[1], e[3], e[4])
            if not any(_rect_intersects_polygon(rect, rings)
                       for _, rings in polys):
                continue
        keep.append(r["path"])
    return {"paths": keep, "files_total": len(rows),
            "files_pruned": len(rows) - len(keep)}


def read_copc_tindex(spark: SparkSession, manifest, bounds=None,
                     resolution=None, polygon=None,
                     with_node_key: bool = False) -> DataFrame:
    """Two-level pruned read over a COPC tile set: level 1 drops
    whole files via the manifest (no I/O on pruned files at all),
    level 2 is readers.copc's octree-node pruning + point-level
    filters within each surviving file."""
    from pdal_spark.sources.copc import read_copc

    plan = plan_copc_tindex(manifest, bounds=bounds, polygon=polygon)
    if not plan["paths"]:
        # derive schema from any file in the manifest (header-only)
        rows = (manifest.collect()
                if isinstance(manifest, DataFrame) else list(manifest))
        if not rows:
            raise ValueError("read_copc_tindex: empty manifest")
        df = read_copc(spark, rows[0]["path"],
                       bounds=(1e30, 1e30, 1.1e30, 1.1e30),
                       with_node_key=with_node_key)
        return df
    dfs = [read_copc(spark, fp, bounds=bounds, resolution=resolution,
                     polygon=polygon, with_node_key=with_node_key)
           for fp in plan["paths"]]
    return reduce(lambda a, b: a.unionByName(b), dfs)
