"""Density tessellation — filters.hexbin re-expressed as groupBy.

Reference: filters/HexBinFilter.cpp streams points into a hex grid
(:170-177 processOne) or H3 grid, then at done() (:224-301) emits
per-cell counts, the dense-cell boundary, density = count/area and
avg point spacing. PDAL's auto-edge sampling of the first 5000 points
(:76-77,132-155) is order-dependent, so this engine requires an
explicit ``size`` / ``res`` (SURVEY.md §7 risks).

Spark shape: one hash-aggregate with map-side partial aggregation —
the cheapest possible distributed plan (one shuffle of partial
counts, not points). At 100 TB the shuffle volume is O(#cells), not
O(#rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def hexbin(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    size: float = 0.25,
    threshold: int = 1,
    with_centers: bool = True,
) -> DataFrame:
    """Per-hex-cell counts + density; cells below threshold dropped.

    Output: hex_id, cnt, density (+ hex_x, hex_y centers).
    """
    out = (
        df.select(F.expr(G.hexcell(f"`{x}`", f"`{y}`", size)).alias("hex_id"))
        .groupBy("hex_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if threshold > 1:
        out = out.where(F.col("cnt") >= threshold)
    # exact double division (no rounding needed for oracle parity:
    # cnt and the area constant are identical on both sides).
    out = out.withColumn(
        "density", F.col("cnt") / F.lit(G.hex_area(size))
    )
    if with_centers:
        out = out.withColumn(
            "hex_x", F.expr(G.hexcell_center_x("`hex_id`", size, _D))
        ).withColumn(
            "hex_y", F.expr(G.hexcell_center_y("`hex_id`", size, _D))
        )
    return out


def h3bin(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    threshold: int = 1,
) -> DataFrame:
    """H3-grid variant (HexBinFilter h3_grid mode): counts per qcell."""
    out = (
        df.select(
            F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res)).alias("h3_cell")
        )
        .groupBy("h3_cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if threshold > 1:
        out = out.where(F.col("cnt") >= threshold)
    return out


def density_summary(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    threshold: int = 1,
) -> DataFrame:
    """hexbin's done() metadata as a 1-row DataFrame: total points in
    dense cells, dense-cell count, avg density (HexBinFilter.cpp:224+)."""
    cells = h3bin(df, lat, lon, res, threshold)
    return cells.agg(
        F.sum("cnt").alias("dense_points"),
        F.count(F.lit(1)).alias("dense_cells"),
        F.avg("cnt").alias("avg_cnt"),
    )
