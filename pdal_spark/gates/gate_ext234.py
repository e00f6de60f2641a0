"""Gate registry extension 234 — GEOGRAPHIC H3 on real ids
(VERDICT r3 #4): latLngToCell from the spec-derived icosahedral
gnomonic kernel (operators.h3geo), no h3-py. The kernel cannot be
expressed in DuckDB SQL (argmax over 20 face dot products + the
aperture-7 digit walk), so these gates are rows-only; value-level
evidence lives in tests/test_h3geo.py (H3 docs literal cells,
published per-resolution cell counts 122/842/5882, 320k-point
round-trip sweeps) and the ORACLED h3_algebra family shares the
same bit layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _points, gate
from pdal_spark.operators import h3lib


@gate("h3_encode_real", None)
def h3_encode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real H3 ids at res 9 for the geocoded pages — the
    filters.h3 H3:uint64 dimension (H3Filter.cpp:96-130) with
    spec-derived encoding."""
    pts = _points(spark, sf_dir)
    return (
        h3lib.h3_encode_spec(pts, "lat", "lon", 9, "h3_real")
        .select("event_id", "h3_real")
        .orderBy("event_id")
        .limit(10000)
    )


@gate("h3bin_real", None)
def h3bin_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hexbin on REAL H3 cells (HexBinFilter.cpp h3_grid analog):
    encode -> groupBy cell -> count, the canonical tiling rollup,
    now on genuine H3 boundaries."""
    pts = _points(spark, sf_dir)
    enc = h3lib.h3_encode_spec(pts, "lat", "lon", 5, "h3_real")
    return (
        enc.groupBy("h3_real")
        .agg(F.count("*").alias("n"))
        .orderBy("h3_real")
    )
