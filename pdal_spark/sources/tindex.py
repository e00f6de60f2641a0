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
