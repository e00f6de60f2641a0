"""Coordinate / value transforms (SURVEY.md §2.2): the
filters.transformation / reprojection / gpstimeconvert / colorinterp
/ separatescanline family — all pure Catalyst column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def transformation(
    df: DataFrame,
    matrix: list[float],
    dims: tuple[str, str, str] = ("x", "y", "z"),
    invert: bool = False,
) -> DataFrame:
    """filters.transformation (TransformationFilter.cpp:186): apply a
    row-major 4x4 affine matrix to the coordinate dims. `invert`
    applies the inverse (computed on the driver — the matrix is tiny;
    reference option at TransformationFilter.cpp `invert`)."""
    if len(matrix) != 16:
        raise ValueError("matrix must be 16 row-major values")
    m = [matrix[i * 4:(i + 1) * 4] for i in range(4)]
    if invert:
        import numpy as np

        m = np.linalg.inv(np.array(m)).tolist()
    x, y, z = (F.col(d) for d in dims)
    new = [
        x * float(r[0]) + y * float(r[1]) + z * float(r[2]) + float(r[3])
        for r in m[:3]
    ]
    out = df
    for d, col in zip(dims, new):
        out = out.withColumn(f"__t_{d}", col)
    for d in dims:
        out = out.withColumn(d, F.col(f"__t_{d}")).drop(f"__t_{d}")
    return out


def reproject_mercator(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    out_x: str = "x_3857",
    out_y: str = "y_3857",
    inverse: bool = False,
) -> DataFrame:
    """filters.reprojection for the one built-in CRS pair
    (EPSG:4326 <-> EPSG:3857 Web-Mercator closed form,
    ReprojectionFilter.cpp semantics). Arbitrary CRS pairs would use
    a pyproj pandas UDF — pyproj is not in this container, so only
    the closed-form pair ships (import-gated extension point)."""
    if inverse:
        return df.withColumn(
            lon, F.expr(G.inv_mercator_lon(f"`{out_x}`"))
        ).withColumn(lat, F.expr(G.inv_mercator_lat(f"`{out_y}`")))
    return df.withColumn(
        out_x, F.expr(G.mercator_x(f"`{lon}`"))
    ).withColumn(out_y, F.expr(G.mercator_y(f"`{lat}`", _D)))


_GPS_WEEK = 604800
_GPS_ADJ = 1_000_000_000


def gpstime_convert(
    df: DataFrame,
    conversion: str,
    time_col: str = "gps_time",
    week: int = 0,
) -> DataFrame:
    """filters.gpstimeconvert (GpsTimeConvert.cpp): convert between
    GPS week-seconds ('ws'), day-seconds handled as ws, adjusted
    standard GPS time ('gst' = seconds since GPS epoch - 1e9), and
    full GPS seconds ('gt'). The reference's monotonicity-aware week
    rollover applies to its ordered streams; the distributed form
    takes the week explicitly (order-dependence pinned, SURVEY.md §7)."""
    c = F.col(time_col)
    if conversion in ("ws2gt", "ws2gst"):
        out = c + F.lit(float(week * _GPS_WEEK))
        if conversion == "ws2gst":
            out = out - F.lit(float(_GPS_ADJ))
    elif conversion in ("gt2ws", "gst2ws"):
        base = c if conversion == "gt2ws" else c + F.lit(float(_GPS_ADJ))
        out = base - F.floor(base / _GPS_WEEK) * F.lit(float(_GPS_WEEK))
    elif conversion == "gt2gst":
        out = c - F.lit(float(_GPS_ADJ))
    elif conversion == "gst2gt":
        out = c + F.lit(float(_GPS_ADJ))
    else:
        raise ValueError(f"unknown conversion '{conversion}'")
    return df.withColumn(time_col, out)


def colorinterp(
    df: DataFrame,
    dimension: str,
    minimum: float,
    maximum: float,
    ramp: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """filters.colorinterp (ColorinterpFilter.cpp): map a dimension
    through a color ramp into Red/Green/Blue by min/max scaling —
    bucket = floor((v - min) / (max - min) * n) clamped to [0, n-1]."""
    if ramp is None:  # a small blue->red default ramp
        ramp = [(0, 0, 255), (0, 128, 192), (0, 255, 128),
                (128, 255, 0), (192, 128, 0), (255, 0, 0)]
    n = len(ramp)
    v = F.col(dimension)
    bucket = F.floor(
        (v - F.lit(minimum)) / F.lit(maximum - minimum) * F.lit(n)
    ).cast("int")
    bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(n - 1))
    out = df.withColumn("__b", bucket)
    for i, ch in enumerate(["red", "green", "blue"]):
        arr = F.array(*[F.lit(int(c[i])) for c in ramp])
        out = out.withColumn(ch, F.element_at(arr, F.col("__b") + 1))
    return out.drop("__b")


def separate_scanline(
    df: DataFrame,
    flag: str,
    order: str,
    groupby: int = 1,
    out: str = "line_id",
) -> DataFrame:
    """filters.separatescanline (SeparateScanLineFilter.cpp): start a
    new scan line at every row where `flag` != 0 (EdgeOfFlightLine
    transition), emit one group per `groupby` consecutive lines.
    Sessionization: running flag count over the pinned order —
    distributed prefix sums (functions.rank), no global window."""
    from pdal_spark.functions.rank import scalable_prefix_sums

    t = scalable_prefix_sums(
        df, [order],
        {"__line": F.when(F.col(flag) != 0, 1).otherwise(0)},
        dec="decimal(38,0)",
    )
    return t.withColumn(
        out,
        F.floor(F.col("__line").cast("long") / F.lit(groupby))
        .cast("long"),
    ).drop("__line", "__rn")


def colorinterp_auto(
    df: DataFrame,
    dimension: str,
    k: float = 2.0,
    mad_multiplier: float = 1.4862,
    ramp: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """filters.colorinterp MAD mode (ColorinterpFilter.cpp:125-129,
    :209-211): ramp bounds derived from the data as
    median ± (MAD * mad_multiplier * k) instead of explicit min/max.

    Median and MAD are exact order statistics (no float accumulation),
    so unlike the stddev mode the derived bounds — and every bucket
    assignment — are bit-reproducible across engines. Two tiny
    driver-side scalars (two aggregations), then the same codegen'd
    bucket arithmetic as `colorinterp`."""
    med = float(
        df.agg(F.median(dimension).alias("m")).collect()[0]["m"]
    )
    mad = float(
        df.agg(
            F.median(F.abs(F.col(dimension) - F.lit(med))).alias("m")
        ).collect()[0]["m"]
    )
    threshold = mad * mad_multiplier * k
    return colorinterp(
        df, dimension, med - threshold, med + threshold, ramp
    )


def snap_to_lines(
    df: DataFrame,
    lines: list[tuple[int, list[tuple[float, float]]]],
    x: str = "lon",
    y: str = "lat",
    max_dist: float | None = None,
) -> DataFrame:
    """Snap every point to the NEAREST of a small polyline set (GPS
    trace -> road/track matching, the map-matching primitive;
    filters.geomdistance's ring mode generalized to open line
    features and an argmin across features). Each line's clamped
    point-to-segment distance unrolls to a pure-Catalyst expression
    (+,-,*,/,sqrt — IEEE-exact, oracle-mirrorable); the argmin is a
    CASE chain with ties to the LOWER line id. Optional max_dist
    drops points snapping farther than the threshold.

    Scale: the line set rides the PLAN as literals (the overlay/crop
    broadcast convention — right for 10^1..10^3 features; a line
    TABLE at higher cardinality goes through the bbox_join/celljoin
    path instead); points never shuffle.
    """
    from pdal_spark import sqlgen as G

    if not lines:
        raise ValueError("need >= 1 polyline")
    dists = {
        int(lid): G.polyline_segdist(f"`{x}`", f"`{y}`", pts)
        for lid, pts in lines
    }
    lids = sorted(dists)
    best = f"least({', '.join(dists[i] for i in lids)})" \
        if len(lids) > 1 else dists[lids[0]]
    arg = "CASE"
    for lid in lids:
        arg += f" WHEN {dists[lid]} = __snap_d THEN {lid}"
    arg += " END"
    out = (
        df.withColumn("__snap_d", F.expr(best))
        .withColumn("line_id", F.expr(arg))
        .withColumnRenamed("__snap_d", "snap_dist")
    )
    if max_dist is not None:
        out = out.where(F.col("snap_dist") <= float(max_dist))
    return out
