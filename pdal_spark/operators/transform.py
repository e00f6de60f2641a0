"""Coordinate / value transforms (SURVEY.md §2.2): the
filters.transformation / reprojection / gpstimeconvert / colorinterp
/ separatescanline family — all pure Catalyst column arithmetic.
"""

from __future__ import annotations

import math

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


def reproject_utm(
    df: DataFrame,
    zone: int,
    lat: str = "lat",
    lon: str = "lon",
    south: bool = False,
    out_x: str = "easting",
    out_y: str = "northing",
    inverse: bool = False,
) -> DataFrame:
    """filters.reprojection to/from UTM (EPSG:326xx north / 327xx
    south) — the most-used projected CRS family, closed-form via the
    Karney/Krueger transverse-Mercator series (sub-mm inside a zone;
    ReprojectionFilter.cpp:199-220 semantics without PROJ). Forward
    adds easting/northing metres; ``inverse=True`` reads out_x/out_y
    and adds lat/lon degrees. Pure Catalyst column arithmetic —
    whole-stage codegen, zero shuffle, zero Python.

    For arbitrary CRS pairs beyond 3857 (reproject_mercator) and UTM,
    the extension point remains a pyproj pandas UDF (pyproj absent in
    this container).
    """
    if not 1 <= int(zone) <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    if inverse:
        la, lo = G.utm_inverse(f"`{out_x}`", f"`{out_y}`", int(zone),
                               _D, south)
        return df.withColumn(lat, F.expr(la)).withColumn(lon, F.expr(lo))
    e, n = G.utm_xy(f"`{lat}`", f"`{lon}`", int(zone), _D, south)
    return df.withColumn(out_x, F.expr(e)).withColumn(out_y, F.expr(n))


_GPS_WEEK = 604800
_GPS_ADJ = 1_000_000_000


def gps_week_day(start_date: str) -> tuple[int, int]:
    """GPS week number and day-of-week (0=Sunday) for a YYYY-MM-DD
    date — the filters.gpstimeconvert `start_date` resolution
    (GpsTimeConvert.cpp start-date handling; GPS epoch is Sunday
    1980-01-06)."""
    import datetime as _dt

    d = _dt.date.fromisoformat(start_date)
    days = (d - _dt.date(1980, 1, 6)).days
    if days < 0:
        raise ValueError("gpstimeconvert: start_date before the "
                         "GPS epoch (1980-01-06)")
    return days // 7, days % 7


def gpstime_convert(
    df: DataFrame,
    conversion: str,
    time_col: str = "gps_time",
    week: int = 0,
    start_date: str | None = None,
    wrapped: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """filters.gpstimeconvert (GpsTimeConvert.cpp): convert between
    GPS week-seconds ('ws'), day-seconds ('ds'), adjusted standard
    GPS time ('gst' = seconds since GPS epoch - 1e9), and full GPS
    seconds ('gt').

    `start_date` (YYYY-MM-DD) resolves the week (and for 'ds' the
    day) like the reference option; `week` is the lower-level
    alternative. With ``wrapped=True`` the reference's
    monotonicity-aware rollover applies: whenever the time value
    DECREASES along the stream order, the week (or day) increments
    — order-dependent, so the distributed form requires an explicit
    ``order_col`` (file/point sequence; a window over that order
    mirrors the reference's single-stream scan)."""
    c = F.col(time_col)
    day = 0
    if start_date is not None:
        week, day = gps_week_day(start_date)
    if conversion in ("ws2gt", "ws2gst", "ds2gt", "ds2gst"):
        is_day = conversion.startswith("ds")
        period = 86400.0 if is_day else float(_GPS_WEEK)
        base = float(week * _GPS_WEEK) + (
            float(day * 86400) if is_day else 0.0)
        out = c + F.lit(base)
        if wrapped:
            if order_col is None:
                raise ValueError(
                    "gpstimeconvert: wrapped=True needs order_col "
                    "(the reference's rollover is stream-ordered)")
            from pyspark.sql import Window

            worder = Window.orderBy(order_col)
            wcum = worder.rowsBetween(Window.unboundedPreceding, 0)
            tmp = df.withColumn(
                "__gps_drop",
                F.when(c < F.lag(c, 1).over(worder), F.lit(1))
                .otherwise(F.lit(0)))
            out = (c + F.lit(base)
                   + F.sum("__gps_drop").over(wcum)
                   * F.lit(period))
            if conversion.endswith("gst"):
                out = out - F.lit(float(_GPS_ADJ))
            return (tmp.withColumn(time_col, out)
                    .drop("__gps_drop"))
        if conversion.endswith("gst"):
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
    span = maximum - minimum
    if span == 0:  # degenerate range (e.g. constant column under
        # stddev auto-bounds): everything lands in the first bucket
        bucket = F.lit(0)
    else:
        bucket = F.floor(
            (v - F.lit(minimum)) / F.lit(span) * F.lit(n)
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


def colorinterp_stddev(
    df: DataFrame,
    dimension: str,
    k: float = 2.0,
    ramp: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """filters.colorinterp k-stddev mode (ColorinterpFilter.cpp:129,
    :205-208): ramp bounds = mean ± k * stddev (population), the
    reference's third auto-bounds mode next to min/max and MAD
    (VERDICT r1 #10).

    Exactness: the two aggregates are exact decimal sums; the scalar
    bound arithmetic then runs in a FIXED operation order
    (mean = s/n; var = ss/n - mean*mean; std = sqrt(var)) so an
    oracle spelling the same shape lands on identical IEEE doubles —
    integer-valued dimensions make the whole gate hash-exact.
    One tiny driver aggregate + the same codegen'd bucket pass as
    `colorinterp`."""
    dec = "decimal(30,10)"
    v = F.col(dimension)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast(dec)).cast("double").alias("s"),
        F.sum((v * v).cast(dec)).cast("double").alias("ss"),
    ).collect()[0]
    n = float(row["n"])
    mean = row["s"] / n
    var = row["ss"] / n - mean * mean
    std = math.sqrt(var) if var > 0 else 0.0
    return colorinterp(
        df, dimension, mean - k * std, mean + k * std, ramp
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


VW_COORD_Q = 1 << 20
VW_BIG = 1 << 62


def simplify_polyline(
    df: DataFrame,
    eps_area2_q: int,
    rounds: int = 2,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Visvalingam-Whyatt polyline simplification, parallel-round
    form: per round, every INTERIOR point whose (doubled, quantized-
    integer) triangle area is below `eps_area2_q` AND is a strict
    lexicographic (area, position) local minimum among its surviving
    neighbors is removed — the local-minimum rule prevents adjacent
    simultaneous removals, making each round order-free and
    deterministic (the serial VW heap removes one point at a time;
    this is its standard parallelization, converging to the same
    epsilon-simplification). Endpoints never drop. The cartographic
    generalization op next to trajectory_resample's densification —
    the two are inverses of a zoom pipeline.

    All integer: coordinates quantize once to the 2^-20 grid; the
    doubled triangle area is an exact int64 cross product
    (|coord_q| <= 2^28 -> area2 <= 2^59).

    Scale: R rounds x ONE key-window pass each (lag/lead of
    coordinates, then lag/lead of the area tuple) — no joins;
    lineage cut per round.
    """
    from pyspark.sql import Window

    from pdal_spark import sqlgen as G

    q = VW_COORD_Q
    cur = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.expr(f"cast(floor(`{lon}` * {q}) as bigint)").alias("__xq"),
        F.expr(f"cast(floor(`{lat}` * {q}) as bigint)").alias("__yq"),
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("__k").orderBy(
        F.col("__ts").asc(), F.col("__id").asc()
    )
    for _ in range(int(rounds)):
        stepped = (
            cur.withColumn("__pos", F.row_number().over(w))
            .withColumn("__px", F.lag("__xq").over(w))
            .withColumn("__py", F.lag("__yq").over(w))
            .withColumn("__nx", F.lead("__xq").over(w))
            .withColumn("__ny", F.lead("__yq").over(w))
            .withColumn(
                "__a2",
                F.expr(
                    "CASE WHEN __px IS NULL OR __nx IS NULL"
                    f" THEN cast({VW_BIG} as bigint) ELSE"
                    " abs((__nx - __px) * (__yq - __py)"
                    " - (__ny - __py) * (__xq - __px)) END"
                ),
            )
        )
        judged = (
            stepped.withColumn("__la", F.lag("__a2").over(w))
            .withColumn("__lp", F.lag("__pos").over(w))
            .withColumn("__na", F.lead("__a2").over(w))
            .withColumn("__np", F.lead("__pos").over(w))
            .withColumn(
                "__rm",
                F.expr(
                    f"__a2 < {int(eps_area2_q)}"
                    " AND (__la IS NULL OR __a2 < __la"
                    "      OR (__a2 = __la AND __pos < __lp))"
                    " AND (__na IS NULL OR __a2 < __na"
                    "      OR (__a2 = __na AND __pos < __np))"
                ),
            )
        )
        cur = judged.where(~F.col("__rm")).select(
            "__k", "__ts", "__id", "__xq", "__yq"
        ).localCheckpoint(eager=False)
    return cur.select(
        F.col("__k").alias(key_col),
        F.col("__id").alias(id_col),
        F.col("__xq").alias("xq"),
        F.col("__yq").alias("yq"),
    )


def straighten(
    df: DataFrame,
    polyline: list[tuple[float, float]],
    x: str = "lon",
    y: str = "lat",
    s_out: str = "s",
    t_out: str = "t",
    offset: float = 0.0,
    unstraighten: bool = False,
) -> DataFrame:
    """filters.straighten (StraightenFilter.cpp; planar polyline
    form — the reference's optional per-vertex roll/spline is a
    documented extension): unroll a corridor along a polyline into
    curvilinear coordinates — s = arc length of the nearest-segment
    projection (+ ``offset``), t = signed lateral offset (left of
    travel positive). ``unstraighten=True`` inverts: reads
    ``s_out``/``t_out`` and adds x/y back.

    The polyline rides the plan as literals (the snap_to_lines /
    overlay broadcast convention — right for <= ~32 segments; a
    segment TABLE at higher cardinality belongs in bbox_join). Pure
    Catalyst +,-,*,/,sqrt with an O(segments^2) nearest-segment CASE
    chain, ties to the smaller segment index — whole-stage codegen,
    zero shuffle, oracle-mirrorable text.
    """
    if unstraighten:
        sx = f"(`{s_out}` - {G.fnum(float(offset))})"
        ex, ey = G.unstraighten_xy(sx, f"`{t_out}`", polyline)
        return df.withColumn(x, F.expr(ex)).withColumn(y, F.expr(ey))
    es, et = G.straighten_st(f"`{x}`", f"`{y}`", polyline)
    return df.withColumn(
        s_out, F.expr(es) + F.lit(float(offset))
    ).withColumn(t_out, F.expr(et))


def reproject_utm_auto(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    out_zone: str = "utm_zone",
    out_x: str = "easting",
    out_y: str = "northing",
) -> DataFrame:
    """Auto-zone UTM: global tables span all 60 zones, so each row
    projects into its OWN zone's CRS (EPSG:326xx north / 327xx south
    by hemisphere) and carries the zone column — the standard layout
    for worldwide per-zone processing (a single fixed zone, see
    reproject_utm, only serves regional extracts). Same Karney
    series, pure codegen, zero shuffle."""
    e, n = G.utm_xy_auto(f"`{lat}`", f"`{lon}`", _D)
    return (
        df.withColumn(out_zone, F.expr(G.utm_zone_expr(f"`{lon}`")))
        .withColumn(out_x, F.expr(e))
        .withColumn(out_y, F.expr(n))
    )


def georeference(
    points: DataFrame,
    trajectory: DataFrame,
    scan2imu: list[float] | None = None,
    coordinate_system: str = "NED",
    time_offset: float = 0.0,
    time_col: str = "gps_time",
    x: str = "x",
    y: str = "y",
    z: str = "z",
    traj_time: str = "time",
    traj_lon: str = "x",
    traj_lat: str = "y",
    traj_z: str = "z",
    roll: str = "roll",
    pitch: str = "pitch",
    azimuth: str = "azimuth",
    wander: str = "wander_angle",
) -> DataFrame:
    """filters.georeference (GeoreferenceFilter.cpp:154-241):
    scanner-frame points -> ECEF (EPSG:4978) world coordinates via a
    time-indexed trajectory.

    Per point: (1) bracket gps_time + time_offset between two
    trajectory samples (Trajectory.cpp:109-146 — points outside the
    trajectory's time range are DROPPED, matching processOne's false
    return); (2) interpolate roll/pitch/azimuth/wander and the
    trajectory lon/lat (RADIANS) angularly on the circle, z linearly
    (correctly weighted — the reference's scalar getValue overload
    inverts the z/time weights, a documented deviation, see
    sqlgen.interp_linear); (3) rotate the scan2imu-transformed point
    by R(roll, pitch, yaw=azimuth-wander) (Utils.hpp:112-137);
    (4) NED: (x,y,z) <- (ned_y, ned_x, -ned_z) to get ENU
    (GeoreferenceFilter.cpp:225-239); (5) local ENU at the
    interpolated trajectory origin -> ECEF (LocalCartesian.cpp's
    +proj=topocentric inverse, closed form in sqlgen.ecef_from_enu).

    The ``reverse`` and ``transform_beam`` reference options are not
    implemented (beam dims are absent from our data model).

    Scale: the trajectory is an IMU track — thousands-to-millions of
    rows, small next to the cloud — so its consecutive-sample pairs
    ride a BROADCAST range join (one interval matches per point; the
    single-partition lead() window is driver-bounded by the same
    smallness). All math is Catalyst sin/cos/atan2 — whole-stage
    codegen, no Python.
    """
    cs = coordinate_system.upper()
    if cs not in ("NED", "ENU"):
        raise ValueError(
            f"coordinate_system must be NED or ENU, got {cs!r}")
    tw = Window.orderBy(F.col("__t1"))
    base = trajectory.select(
        F.col(traj_time).cast("double").alias("__t1"),
        F.col(traj_lon).cast("double").alias("__lon1"),
        F.col(traj_lat).cast("double").alias("__lat1"),
        F.col(traj_z).cast("double").alias("__z1"),
        F.col(roll).cast("double").alias("__r1"),
        F.col(pitch).cast("double").alias("__p1"),
        F.col(azimuth).cast("double").alias("__a1"),
        (F.col(wander) if wander in trajectory.columns
         else F.lit(0.0)).cast("double").alias("__w1"),
    )
    pairs = base.select(
        "*",
        *[F.lead(c).over(tw).alias(c.replace("1", "2"))
          for c in ("__t1", "__lon1", "__lat1", "__z1",
                    "__r1", "__p1", "__a1", "__w1")],
    ).where(F.col("__t2").isNotNull())

    pt = (F.col(time_col).cast("double")
          + F.lit(float(time_offset))).alias("__pt")
    joined = points.withColumn("__pt", pt).join(
        F.broadcast(pairs),
        (F.col("__t1") < F.col("__pt"))
        & (F.col("__pt") <= F.col("__t2")),
        "inner",
    )

    frac = "((__pt - __t1) / (__t2 - __t1))"
    interp = joined.select(
        "*",
        F.expr(G.interp_angle("__r1", "__r2", frac)).alias("__roll"),
        F.expr(G.interp_angle("__p1", "__p2", frac)).alias("__pitch"),
        (F.expr(G.interp_angle("__a1", "__a2", frac))
         - F.expr(G.interp_angle("__w1", "__w2", frac))).alias("__yaw"),
        F.expr(G.interp_angle("__lon1", "__lon2", frac)).alias("__tlon"),
        F.expr(G.interp_angle("__lat1", "__lat2", frac)).alias("__tlat"),
        F.expr(G.interp_linear("__z1", "__z2", frac)).alias("__th"),
    )

    if scan2imu is None:
        qx, qy, qz = f"`{x}`", f"`{y}`", f"`{z}`"
    else:
        if len(scan2imu) != 16:
            raise ValueError("scan2imu must be a row-major 4x4 "
                             f"(16 floats), got {len(scan2imu)}")
        m = [G.fnum(float(v)) for v in scan2imu]
        px, py, pz = f"`{x}`", f"`{y}`", f"`{z}`"

        def _row(i):
            return (f"({m[4*i]} * {px} + {m[4*i+1]} * {py}"
                    f" + {m[4*i+2]} * {pz} + {m[4*i+3]})")

        qx, qy, qz = _row(0), _row(1), _row(2)
    R = G.rot_rpy("__roll", "__pitch", "__yaw")
    nx = f"({R[0]} * {qx} + {R[1]} * {qy} + {R[2]} * {qz})"
    ny = f"({R[3]} * {qx} + {R[4]} * {qy} + {R[5]} * {qz})"
    nz = f"({R[6]} * {qx} + {R[7]} * {qy} + {R[8]} * {qz})"
    rotated = interp.select(
        "*",
        F.expr(nx).alias("__nx"),
        F.expr(ny).alias("__ny"),
        F.expr(nz).alias("__nz"),
    )
    if cs == "NED":
        e_, n_, u_ = "__ny", "__nx", "(-__nz)"
    else:
        e_, n_, u_ = "__nx", "__ny", "__nz"
    X, Y, Z = G.ecef_from_enu(e_, n_, u_, "__tlat", "__tlon", "__th")
    out = rotated.withColumn(x, F.expr(X)).withColumn(
        y, F.expr(Y)).withColumn(z, F.expr(Z))
    return out.drop(*[c for c in out.columns if c.startswith("__")])


def _parse_proj_steps(coord_op: str) -> list[dict]:
    """Split a PROJ-style string into step dicts of {param: value}."""
    toks = coord_op.split()
    if not all(t.startswith("+") for t in toks):
        raise ValueError(
            f"projpipeline: malformed token in {coord_op!r} "
            "(every token must start with '+')")
    kvs = []
    for t in toks:
        k, _, v = t[1:].partition("=")
        kvs.append((k, v))
    if kvs and kvs[0] == ("proj", "pipeline"):
        steps, cur = [], None
        for k, v in kvs[1:]:
            if k == "step":
                if cur:
                    steps.append(cur)
                cur = {}
            elif cur is None:
                raise ValueError(
                    "projpipeline: parameters before the first +step")
            else:
                cur[k] = v
        if cur:
            steps.append(cur)
        return steps
    return [dict(kvs)]


def projpipeline(
    df: DataFrame,
    coord_op: str,
    reverse: bool = False,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """filters.projpipeline (ProjPipelineFilter.cpp:70-120): apply a
    PROJ pipeline string to the (x, y) columns.

    The reference hands `coord_op` to PROJ; this engine interprets
    the pipeline grammar over its own closed-form step library (the
    documented no-pyproj subset — everything else raises):

    - ``+proj=axisswap +order=2,1`` — swap x/y
    - ``+proj=unitconvert +xy_in=deg|rad +xy_out=deg|rad``
    - ``+proj=webmerc`` — x=lon_deg, y=lat_deg -> EPSG:3857 meters
    - ``+proj=utm +zone=N [+south]`` — x=lon_deg, y=lat_deg -> E/N
      (Karney series, sqlgen.utm_xy; degrees in, matching the
      library convention — use unitconvert for radian inputs)
    - ``+proj=lcc +lat_1 +lat_2 [+lat_0 +lon_0 +ellps]`` — Lambert
      conformal conic, forward (Snyder closed form, mm-rounded)
    - ``+proj=aea +lat_1 +lat_2 [+lat_0 +lon_0 +ellps]`` — Albers
      equal-area conic, forward (ellipsoidal, mm-rounded)
    - ``+proj=affine +s11..+s22 +xoff +yoff`` — 2D affine
    - ``+proj=hgridshift +grids=<file.gsb>`` — NTv2 datum-shift
      grid, bilinear, densest-subgrid rule (r5; the one non-closed-
      form step — a broadcast-grid numpy lookup, still shuffle-free)
    - ``+proj=longlat`` / ``+proj=latlong`` — no-op markers
    - any step may carry ``+inv`` to run inverted

    ``reverse=True`` runs the whole pipeline backwards with each
    step's direction flipped (PROJ semantics). Each step is one
    staged select of pure Catalyst arithmetic — whole-stage codegen,
    zero shuffle, oracle-mirrorable.
    """
    steps = _parse_proj_steps(coord_op)
    if reverse:
        steps = [dict(s, inv=("" if "inv" not in s else None))
                 for s in reversed(steps)]
        for s in steps:
            if s.get("inv") is None:
                del s["inv"]
    out = df
    for s in steps:
        name = s.get("proj")
        inv = "inv" in s
        cx, cy = f"`{x}`", f"`{y}`"
        if name in ("longlat", "latlong", "noop"):
            continue
        elif name == "axisswap":
            if s.get("order", "2,1") != "2,1":
                raise ValueError(
                    f"projpipeline: only +order=2,1 supported, got "
                    f"+order={s.get('order')}")
            ex, ey = cy, cx
        elif name == "unitconvert":
            u_in = s.get("xy_in", "deg")
            u_out = s.get("xy_out", "deg")
            if inv:
                u_in, u_out = u_out, u_in
            scale = {("deg", "rad"): G.RAD, ("rad", "deg"): G.DEG,
                     ("deg", "deg"): 1.0, ("rad", "rad"): 1.0}.get(
                         (u_in, u_out))
            if scale is None:
                raise ValueError(
                    f"projpipeline: unitconvert {u_in}->{u_out} "
                    "not supported (deg/rad only)")
            ex = f"({cx} * {G.fnum(scale)})"
            ey = f"({cy} * {G.fnum(scale)})"
        elif name == "webmerc":
            if inv:
                ex = G.inv_mercator_lon(cx)
                ey = G.inv_mercator_lat(cy)
            else:
                ex = G.mercator_x(cx)
                ey = G.mercator_y(cy, _D)
        elif name == "utm":
            zone = int(s["zone"])
            south = "south" in s
            if inv:
                lat_e, lon_e = G.utm_inverse(cx, cy, zone, _D,
                                             south=south)
                ex, ey = lon_e, lat_e
            else:
                ex, ey = G.utm_xy(cy, cx, zone, _D, south=south)
        elif name in ("lcc", "aea"):
            # conic closed forms (r3): forward only — the inverse
            # needs the iterative chi-series, outside the closed-
            # form subset, so +inv raises rather than approximating
            if inv:
                raise ValueError(
                    f"projpipeline: +proj={name} +inv is not in "
                    "the closed-form subset (forward only)")
            ellps = s.get("ellps", "WGS84")
            if ellps in ("clrk66", "clark66"):
                a_, e2_ = CLARKE1866
            elif ellps in ("WGS84", "GRS80"):
                a_, e2_ = WGS84_A, WGS84_E2
            else:
                raise ValueError(
                    f"projpipeline: +ellps={ellps} unsupported "
                    "(WGS84/GRS80/clrk66)")
            builder = lcc_sql if name == "lcc" else (
                albers_ellipsoidal_sql)
            ex, ey = builder(
                cy, cx,
                float(s["lat_1"]), float(s["lat_2"]),
                float(s.get("lat_0", "0") or 0),
                float(s.get("lon_0", "0") or 0),
                a_, e2_,
            )
        elif name == "tmerc":
            if inv:
                raise ValueError(
                    "projpipeline: +proj=tmerc +inv is not in the "
                    "closed-form subset (forward only)")
            ellps = s.get("ellps", "WGS84")
            if ellps in ("airy",):
                a_, f_ = AIRY1830
            elif ellps in ("WGS84", "GRS80"):
                a_, f_ = WGS84_A, WGS84_F
            else:
                raise ValueError(
                    f"projpipeline: +ellps={ellps} unsupported for "
                    "tmerc (WGS84/GRS80/airy)")
            ex, ey = G.tmerc_xy(
                cy, cx,
                float(s.get("lat_0", "0") or 0),
                float(s.get("lon_0", "0") or 0),
                float(s.get("k", s.get("k_0", "1")) or 1),
                float(s.get("x_0", "0") or 0),
                float(s.get("y_0", "0") or 0),
                a_, f_, _D)
        elif name == "stere":
            # polar aspect only (r4): +lat_0=+/-90 with +lat_ts
            if inv:
                raise ValueError(
                    "projpipeline: +proj=stere +inv is not in the "
                    "closed-form subset (forward only)")
            lat0s = float(s.get("lat_0", "90") or 90)
            if abs(lat0s) != 90.0:
                raise ValueError(
                    "projpipeline: +proj=stere supports the POLAR "
                    "aspect only (+lat_0=90 or -90)")
            lat_ts = float(s.get("lat_ts", lat0s) or lat0s)
            if lat0s < 0 and lat_ts > 0:
                lat_ts = -lat_ts
            ex, ey = polar_stereographic_sql(
                cy, cx, lat_ts,
                float(s.get("lon_0", "0") or 0),
            )
        elif name == "hgridshift":
            # +proj=hgridshift +grids=<file.gsb> [+inv] — NTv2
            # datum-shift grid (r5, operators/datumshift.py). This
            # step is a DataFrame-level broadcast-grid lookup, not a
            # closed-form expression: apply and continue.
            from pdal_spark.operators.datumshift import hgridshift

            if "grids" not in s:
                raise ValueError(
                    "projpipeline: +proj=hgridshift needs +grids=")
            out = hgridshift(out, s["grids"], inverse=inv,
                             lon=x, lat=y)
            continue
        elif name == "affine":
            m = [float(s.get(k, d)) for k, d in
                 (("s11", 1.0), ("s12", 0.0), ("s21", 0.0),
                  ("s22", 1.0), ("xoff", 0.0), ("yoff", 0.0))]
            if inv:
                det = m[0] * m[3] - m[1] * m[2]
                if det == 0.0:
                    raise ValueError(
                        "projpipeline: affine step is singular")
                m = [m[3] / det, -m[1] / det, -m[2] / det,
                     m[0] / det,
                     (m[1] * m[5] - m[3] * m[4]) / det,
                     (m[2] * m[4] - m[0] * m[5]) / det]
            ex = (f"({G.fnum(m[0])} * {cx} + {G.fnum(m[1])} * {cy}"
                  f" + {G.fnum(m[4])})")
            ey = (f"({G.fnum(m[2])} * {cx} + {G.fnum(m[3])} * {cy}"
                  f" + {G.fnum(m[5])})")
        else:
            raise ValueError(
                f"projpipeline: unsupported +proj={name!r} (closed-"
                "form subset: axisswap/unitconvert/webmerc/utm/"
                "lcc/aea/tmerc/stere/affine/hgridshift/longlat)")
        others = [c for c in out.columns if c not in (x, y)]
        out = out.select(
            *others,
            F.expr(ex).alias(x),
            F.expr(ey).alias(y),
        )
    return out.select(*df.columns)


def segment_intersection_join(
    a: DataFrame,
    b: DataFrame,
    cell: int = 64,
    id_a: str = "a_id",
    id_b: str = "b_id",
) -> DataFrame:
    """Exact 2D segment-intersection join — the vector-overlay
    primitive (road/route crossing detection; the polyline analog of
    filters.crop's point-in-polygon join). Inputs carry INTEGER
    endpoint columns (x1, y1, x2, y2) plus an id; output is the
    (id_a, id_b) pairs whose segments share at least one point
    (proper crossings, endpoint touches and collinear overlap — the
    CLRS 33.1 predicate, int64-exact so the join is deterministic on
    any engine).

    Scale: each segment explodes to the grid cells its bbox covers
    (fan-out = O(length/cell) — pick `cell` near the median segment
    length); candidates meet in ONE hash join on the cell key and a
    pair is tested exactly once — in the lexicographically-first
    cell both bboxes share (responsibility assignment: no distinct,
    no post-dedup shuffle). The exact predicate is codegen'd integer
    algebra. The same two-level shape as crop_celljoin: candidates
    ~ density * cell-area, never |A| x |B|.
    """
    c = int(cell)

    def cells(df, idc, tag):
        lo_x = F.least("x1", "x2")
        hi_x = F.greatest("x1", "x2")
        lo_y = F.least("y1", "y2")
        hi_y = F.greatest("y1", "y2")
        return (
            df.select(
                F.col(idc),
                F.col("x1").cast("long").alias(f"{tag}x1"),
                F.col("y1").cast("long").alias(f"{tag}y1"),
                F.col("x2").cast("long").alias(f"{tag}x2"),
                F.col("y2").cast("long").alias(f"{tag}y2"),
                F.floor(lo_x / c).alias("__lx"),
                F.floor(hi_x / c).alias("__hx"),
                F.floor(lo_y / c).alias("__ly"),
                F.floor(hi_y / c).alias("__hy"),
            )
            .withColumn(
                "cx", F.explode(F.sequence("__lx", "__hx"))
            )
            .withColumn(
                "cy", F.explode(F.sequence("__ly", "__hy"))
            )
        )

    ca = cells(a, id_a, "a")
    cb = cells(b, id_b, "b")
    j = ca.join(cb, on=["cx", "cy"])
    # responsibility: test only in the first shared cell of the two
    # bbox cell-ranges (their overlap is a rectangle; its min corner
    # is greatest(lo_a, lo_b) per axis)
    resp = (
        (F.col("cx") == F.greatest(ca["__lx"], cb["__lx"]))
        & (F.col("cy") == F.greatest(ca["__ly"], cb["__ly"]))
    )
    pred = G.seg_intersect_pred("a", "b")
    for src, dst in [("ax1", "a.x1"), ("ay1", "a.y1"),
                     ("ax2", "a.x2"), ("ay2", "a.y2"),
                     ("bx1", "b.x1"), ("by1", "b.y1"),
                     ("bx2", "b.x2"), ("by2", "b.y2")]:
        pred = pred.replace(dst, src)
    return (
        j.where(resp)
        .where(F.expr(pred))
        .select(id_a, id_b)
    )


def segment_radius_join(
    points: DataFrame,
    segments: DataFrame,
    radius: int,
    cell: int = 64,
    id_p: str = "p_id",
    id_s: str = "seg_id",
) -> DataFrame:
    """Corridor query: (point, segment) pairs whose exact point-to-
    segment distance is <= `radius` — route-proximity joins (events
    near a road, pages geocoded near a pipeline corridor), the
    polyline sibling of the circle radius join. INTEGER-exact
    predicate (squared/cross-multiplied comparisons, no sqrt — see
    sqlgen.point_segment_within_pred), so the join is deterministic
    on any engine.

    Scale: each segment explodes to the grid cells of its bbox
    EXPANDED by the radius (fan-out O((len+r)/cell)); each point has
    exactly ONE cell, so a candidate pair materializes at most once
    — no dedup pass at all. One hash join on the cell key, then the
    codegen'd exact predicate. Same candidate discipline as
    crop_celljoin / segment_intersection_join.
    """
    c, r = int(cell), int(radius)

    pc = points.select(
        F.col(id_p),
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        F.floor(F.col("px") / c).alias("cx"),
        F.floor(F.col("py") / c).alias("cy"),
    )
    sc = (
        segments.select(
            F.col(id_s),
            F.col("x1").cast("long").alias("x1"),
            F.col("y1").cast("long").alias("y1"),
            F.col("x2").cast("long").alias("x2"),
            F.col("y2").cast("long").alias("y2"),
            F.floor((F.least("x1", "x2") - r) / c).alias("__lx"),
            F.floor((F.greatest("x1", "x2") + r) / c).alias("__hx"),
            F.floor((F.least("y1", "y2") - r) / c).alias("__ly"),
            F.floor((F.greatest("y1", "y2") + r) / c).alias("__hy"),
        )
        .withColumn("cx", F.explode(F.sequence("__lx", "__hx")))
        .withColumn("cy", F.explode(F.sequence("__ly", "__hy")))
        .drop("__lx", "__hx", "__ly", "__hy")
    )
    pred = G.point_segment_within_pred("p", "s", r)
    for src, dst in [("px", "p.px"), ("py", "p.py"),
                     ("x1", "s.x1"), ("y1", "s.y1"),
                     ("x2", "s.x2"), ("y2", "s.y2")]:
        pred = pred.replace(dst, src)
    return (
        pc.join(sc, on=["cx", "cy"])
        .where(F.expr(pred))
        .select(id_p, id_s)
    )


MM_EQ = 1 << 20  # map_match emission quantizer (squared degrees)


def viterbi_path(E, pen: int):
    """Shared int64 Viterbi kernel over an (n_steps x k_states)
    emission-cost matrix with a constant switch penalty: the
    stay-vs-jump collapse dp'[j] = e[j] + min(dp[j], min_all + P)
    makes each step O(k); first-minimal-index tie-breaks keep the
    decode bit-reproducible. Used by map_match (k = roads) and
    temporal.burst_detect (k = 2 rate states)."""
    import numpy as np

    n, k = E.shape
    idx = np.arange(k)
    dp = E[0].copy()
    prev = np.zeros((n, k), dtype=np.int64)
    for t in range(1, n):
        am = int(np.argmin(dp))
        jump = dp[am] + int(pen)
        stay = dp <= jump
        prev[t] = np.where(stay, idx, am)
        dp = E[t] + np.where(stay, dp, jump)
    path = np.empty(n, dtype=np.int64)
    path[-1] = int(np.argmin(dp))
    for t in range(n - 2, -1, -1):
        path[t] = prev[t + 1, path[t + 1]]
    return path


def map_match(
    df: DataFrame,
    lines: list[tuple[int, list[tuple[float, float]]]],
    switch_penalty_q: int,
    key_col: str = "user_id",
    order_col: str = "event_id",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """HMM map-matching (Newson & Krumm 2009, fixed-point form):
    assign every point of every trajectory the polyline (road) of
    the GLOBALLY most likely sequence — per-point emission cost =
    quantized squared snap distance, plus a constant transition
    penalty per line SWITCH. Where snap_to_lines answers "what is
    nearest at this instant", map_match smooths through noise: one
    outlier mid-trajectory no longer flips the road.

    Determinism: emission e_q = floor(d2 * MM_EQ + 0.5) over the
    IEEE-exact squared segdist chain — identical in both engines;
    the Viterbi DP is pure int64 with first-minimal-index
    tie-breaks, so the matched sequence is bit-reproducible under
    any partitioning. The stay/jump structure collapses transitions
    to dp'[j] = e[j] + min(dp[j], min_all + P) — O(k) per step, no
    k x k matrix.

    Scale: emissions are row-local Catalyst codegen (the line set
    rides the plan as literals, snap_to_lines' broadcast
    convention); the sequential DP runs per trajectory in ONE
    applyInPandas pass — parallelism = number of trajectories, state
    = k int64 per step. Output: (key, order, line_id).

    Reference analog: the trajectory-conditioned assignment step of
    filters/GeoreferenceFilter.cpp:154-241 (per-point nearest with
    temporal coherence), generalized to the HMM decode.
    """
    import numpy as np
    import pandas as pd

    from pdal_spark import sqlgen as G

    if not lines:
        raise ValueError("need >= 1 polyline")
    lids = sorted(int(lid) for lid, _ in lines)
    by_id = {int(lid): pts for lid, pts in lines}
    ecols = []
    out = df
    for j, lid in enumerate(lids):
        d2 = G.polyline_segdist2(f"`{x}`", f"`{y}`", by_id[lid])
        out = out.withColumn(
            f"__e{j}",
            F.expr(
                f"CAST(floor(({d2}) * {MM_EQ} + 0.5e0) AS BIGINT)"
            ),
        )
        ecols.append(f"__e{j}")
    k = len(lids)
    pen = int(switch_penalty_q)
    lid_arr = lids

    key_t = df.schema[key_col].dataType.simpleString()
    ord_t = df.schema[order_col].dataType.simpleString()
    schema = (
        f"`{key_col}` {key_t}, `{order_col}` {ord_t}, line_id int"
    )

    def _viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        E = pdf[ecols].to_numpy(dtype=np.int64)
        path = viterbi_path(E, pen)
        return pd.DataFrame({
            key_col: pdf[key_col].to_numpy(),
            order_col: pdf[order_col].to_numpy(),
            "line_id": np.asarray(lid_arr, dtype=np.int64)[path]
            .astype(np.int32),
        })

    return (
        out.select(key_col, order_col, *ecols)
        .groupBy(key_col)
        .applyInPandas(_viterbi, schema=schema)
    )


def chaikin_smooth(
    df: DataFrame,
    rounds: int = 2,
    key_col: str = "user_id",
    order_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    coord_q: int = 1 << 20,
) -> DataFrame:
    """Chaikin corner-cutting polyline smoothing (Chaikin 1974 —
    the cartographic smoother dual to simplify_polyline's
    Visvalingam THINNER): each round replaces every edge (a, b)
    with the quarter points q = (3a + b)/4 and r = (a + 3b)/4,
    keeping the open-polyline endpoints; the limit curve is a
    quadratic B-spline.

    EXACT integers: coords quantized to floor(v * coord_q) then
    pre-scaled by 4^rounds, so every quarter-point division is exact
    (inputs stay divisible by the remaining 4-powers) — no floor/
    truncate cross-engine hazard at all. Output coords are on the
    coord_q * 4^rounds grid.

    Output: (key, seq, xq, yq) — seq is the smoothed order.

    Scale: per round ONE lead() window + one 2-row explode + the
    endpoint union — all per-key windows, parallelism = keys; rows
    double per round (bounded: rounds is 2-3 in practice).
    """
    scale = 4 ** int(rounds)
    pts = df.select(
        F.col(key_col).alias("k"),
        (F.floor(F.col(lon) * float(coord_q)).cast("long")
         * scale).alias("x"),
        (F.floor(F.col(lat) * float(coord_q)).cast("long")
         * scale).alias("y"),
        F.col(order_col).alias("o"),
    )
    w = Window.partitionBy("k").orderBy("o")
    cur = pts.select(
        "k", "x", "y",
        (F.row_number().over(w) - 1).cast("long").alias("seq"),
    )
    for _ in range(int(rounds)):
        wseq = Window.partitionBy("k").orderBy("seq")
        mx = Window.partitionBy("k")
        e = cur.select(
            "k", "seq", "x", "y",
            F.lead("x").over(wseq).alias("nx"),
            F.lead("y").over(wseq).alias("ny"),
            F.max("seq").over(mx).alias("last"),
        )
        mids = (
            e.where(F.col("nx").isNotNull())
            .select(
                "k",
                F.explode(F.array(
                    F.struct(
                        (F.col("seq") * 2 + 1).alias("seq"),
                        F.expr("(3 * x + nx) div 4").alias("x"),
                        F.expr("(3 * y + ny) div 4").alias("y"),
                    ),
                    F.struct(
                        (F.col("seq") * 2 + 2).alias("seq"),
                        F.expr("(x + 3 * nx) div 4").alias("x"),
                        F.expr("(y + 3 * ny) div 4").alias("y"),
                    ),
                )).alias("p"),
            )
            .select("k", F.col("p.seq").alias("seq"),
                    F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        )
        ends = e.where(
            (F.col("seq") == 0) | (F.col("seq") == F.col("last"))
        ).select(
            "k",
            F.when(F.col("seq") == 0, F.lit(0).cast("long"))
            .otherwise(F.col("seq") * 2 + 1).alias("seq"),
            "x", "y",
        )
        cur = mids.unionByName(ends)
    return cur.select(
        F.col("k").alias(key_col), "seq",
        F.col("x").alias("xq"), F.col("y").alias("yq"),
    )


def geodesic_destination(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    bearing: str = "bearing",
    dist_km: str = "dist_km",
) -> DataFrame:
    """Direct geodesic problem on the sphere: destination point from
    (start, initial bearing, distance) — the forward complement of
    trajectory_bearings' inverse form (dead reckoning, route
    projection, buffer rays):

        phi2 = asin(sin phi1 cos d + cos phi1 sin d cos theta)
        lam2 = lam1 + atan2(sin theta sin d cos phi1,
                            cos d - sin phi1 sin phi2)

    with d = dist / R (R = 6371.0088 km). Trig-derived: outputs
    round(6) on both sides; longitude normalizes to [-180, 180).

    Scale: fully row-local codegen projection, zero shuffle.
    """
    from pdal_spark import sqlgen as G

    rad = G.fnum(3.141592653589793 / 180.0)
    deg = G.fnum(180.0 / 3.141592653589793)
    p1 = f"(`{lat}` * {rad})"
    th = f"(`{bearing}` * {rad})"
    dd = f"(`{dist_km}` / {G.fnum(6371.0088)})"
    sp2 = (
        f"(sin({p1}) * cos({dd})"
        f" + cos({p1}) * sin({dd}) * cos({th}))"
    )
    lat2 = f"(asin(greatest(least({sp2}, {G.fnum(1.0)}), {G.fnum(-1.0)})) * {deg})"
    lam2 = (
        f"(`{lon}` + atan2(sin({th}) * sin({dd}) * cos({p1}),"
        f" cos({dd}) - sin({p1}) * {sp2}) * {deg})"
    )
    lon2 = (
        f"({lam2} - {G.fnum(360.0)}"
        f" * floor((({lam2}) + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
    )
    return df.withColumn(
        "lat2", F.expr(f"round({lat2}, 6)")
    ).withColumn(
        "lon2", F.expr(f"round({lon2}, 6)")
    )


def cross_track_sql(
    lat: str,
    lon: str,
    lat1: float,
    lon1: float,
    lat2: float,
    lon2: float,
) -> tuple[str, str]:
    """Dialect-neutral SQL fragments for the spherical cross-track /
    along-track problem (see :func:`cross_track_distance`). Returns
    (dxt_km_expr, dat_km_expr), each already rounded to 6 decimals —
    `lat`/`lon` are spliced verbatim (pass plain identifiers or
    dialect-neutral expressions; no backtick quoting, so the SAME
    string runs in Spark and DuckDB) —
    the shared-formula convention that lets a DuckDB oracle run the
    IDENTICAL expression tree (sqlgen.py docstring: trig outputs
    round(6) on both sides).
    """
    from pdal_spark import sqlgen as G

    rad = G.fnum(3.141592653589793 / 180.0)
    R = G.fnum(6371.0088)
    p1, l1 = G.fnum(float(lat1)), G.fnum(float(lon1))
    p2, l2 = G.fnum(float(lat2)), G.fnum(float(lon2))
    phi1 = f"({p1} * {rad})"
    phi3 = f"(({lat}) * {rad})"
    dl13 = f"((({lon}) - {l1}) * {rad})"
    # angular distance start->point (haversine, asin form)
    hav = (
        f"(sin(({phi3} - {phi1}) / 2) * sin(({phi3} - {phi1}) / 2)"
        f" + cos({phi1}) * cos({phi3})"
        f" * sin({dl13} / 2) * sin({dl13} / 2))"
    )
    d13 = (
        f"(2 * asin(sqrt(greatest(least({hav}, {G.fnum(1.0)}),"
        f" {G.fnum(0.0)}))))"
    )
    # initial bearings start->point and start->end
    th13 = (
        f"atan2(sin({dl13}) * cos({phi3}),"
        f" cos({phi1}) * sin({phi3})"
        f" - sin({phi1}) * cos({phi3}) * cos({dl13}))"
    )
    phi2 = f"({p2} * {rad})"
    dl12 = f"(({l2} - {l1}) * {rad})"
    th12 = (
        f"atan2(sin({dl12}) * cos({phi2}),"
        f" cos({phi1}) * sin({phi2})"
        f" - sin({phi1}) * cos({phi2}) * cos({dl12}))"
    )
    sxt = f"(sin({d13}) * sin({th13} - {th12}))"
    axt = (
        f"asin(greatest(least({sxt}, {G.fnum(1.0)}),"
        f" {G.fnum(-1.0)}))"
    )
    dxt = f"round({axt} * {R}, 6)"
    # along-track magnitude: acos(cos d13 / cos dxt_angle)
    cat_ = f"(cos({d13}) / cos({axt}))"
    dat = (
        f"round(acos(greatest(least({cat_}, {G.fnum(1.0)}),"
        f" {G.fnum(-1.0)})) * {R}, 6)"
    )
    return dxt, dat


def cross_track_distance(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    lat1: float = 0.0,
    lon1: float = 0.0,
    lat2: float = 0.0,
    lon2: float = 90.0,
) -> DataFrame:
    """Spherical cross-track distance (Bowditch's navigation
    classic): signed distance from each point to the great-circle
    ROUTE through (lat1,lon1)->(lat2,lon2), plus the along-track
    distance from the route start to the point's projection —

        dxt = asin(sin(d13) * sin(th13 - th12)) * R
        dat = acos(cos(d13) / cos(dxt / R)) * R

    (d13 = angular distance start->point, th13/th12 = initial
    bearings start->point / start->end, R = 6371.0088 km). The
    corridor screen trajectory pipelines run ("how far off the route
    is every ping"); geom_distance's great-circle sibling. Sign
    (the aviation-formulary convention): positive = RIGHT of the
    route looking along it, negative = left. dat is the unsigned
    magnitude.

    Trig-derived: both outputs round(6) km on both sides.

    Scale: fully row-local codegen projection, zero shuffle.
    """
    dxt, dat = cross_track_sql(lat, lon, lat1, lon1, lat2, lon2)
    return df.withColumn("dxt_km", F.expr(dxt)).withColumn(
        "dat_km", F.expr(dat)
    )


def albers_sql(
    lat: str,
    lon: str,
    phi1: float,
    phi2: float,
    lat0: float,
    lon0: float,
) -> tuple[str, str]:
    """Dialect-neutral SQL fragments for the spherical Albers
    equal-area conic projection (see :func:`reproject_albers`).
    Returns (x_expr, y_expr) in metres, rounded to 3 decimals (mm);
    identifiers/expressions splice verbatim (no quoting) so the SAME
    string runs in Spark and DuckDB."""
    import math

    from pdal_spark import sqlgen as G

    R = 6371008.8
    n = (math.sin(math.radians(phi1))
         + math.sin(math.radians(phi2))) / 2.0
    C = (math.cos(math.radians(phi1)) ** 2
         + 2.0 * n * math.sin(math.radians(phi1)))
    rho0 = R / n * math.sqrt(
        C - 2.0 * n * math.sin(math.radians(lat0))
    )
    rad = G.fnum(math.pi / 180.0)
    nf, cf = G.fnum(n), G.fnum(C)
    rn = G.fnum(R / n)
    rho = (
        f"({rn} * sqrt(greatest({cf}"
        f" - {G.fnum(2.0 * n)} * sin(({lat}) * {rad}),"
        f" {G.fnum(0.0)})))"
    )
    # wrap dlon into (-180, 180] so theta stays in the cone
    dl = (
        f"((({lon}) - {G.fnum(float(lon0))}) - {G.fnum(360.0)}"
        f" * floor(((({lon}) - {G.fnum(float(lon0))})"
        f" + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
    )
    th = f"({nf} * {dl} * {rad})"
    xe = f"round({rho} * sin({th}), 3)"
    ye = f"round({G.fnum(rho0)} - {rho} * cos({th}), 3)"
    return xe, ye


def reproject_albers(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    phi1: float = 29.5,
    phi2: float = 45.5,
    lat0: float = 23.0,
    lon0: float = -96.0,
) -> DataFrame:
    """filters.reprojection, Albers equal-area conic (spherical
    form; ReprojectionFilter.cpp:199-220 via PROJ `aea` — the
    projection every US-national-extent analysis uses, e.g. EPSG:
    5070's defaults, which this op's defaults mirror): the
    equal-area complement of reproject_mercator (conformal) and
    reproject_utm (transverse cylindrical);

        n    = (sin p1 + sin p2) / 2
        C    = cos^2 p1 + 2 n sin p1
        rho  = R/n sqrt(C - 2 n sin phi)
        x    = rho sin(n (lam - lam0))
        y    = rho0 - rho cos(n (lam - lam0))

    Constants fold at plan-build time (driver-side math on the fixed
    parallels); per-row work is sin/cos/sqrt. Trig-derived: x/y
    round to millimetres on both sides.

    Scale: fully row-local codegen projection, zero shuffle.
    """
    xe, ye = albers_sql(lat, lon, phi1, phi2, lat0, lon0)
    return df.withColumn("x_aea", F.expr(xe)).withColumn(
        "y_aea", F.expr(ye)
    )


def slerp_sql(
    lat1: str, lon1: str, lat2: str, lon2: str, f: str
) -> tuple[str, str]:
    """Dialect-neutral SQL fragments for spherical linear
    interpolation along the great circle (see
    :func:`route_waypoints`): returns (lat_expr, lon_expr) at
    fraction ``f`` in [0, 1], rounded to 6 decimals. Expressions
    splice verbatim (no identifier quoting) so the SAME strings run
    in Spark and DuckDB. Coincident endpoints (angular distance 0)
    return the start point."""
    from pdal_spark import sqlgen as G

    rad = G.fnum(3.141592653589793 / 180.0)
    deg = G.fnum(180.0 / 3.141592653589793)
    p1, l1 = f"(({lat1}) * {rad})", f"(({lon1}) * {rad})"
    p2, l2 = f"(({lat2}) * {rad})", f"(({lon2}) * {rad})"
    hav = (
        f"(sin(({p2} - {p1}) / 2) * sin(({p2} - {p1}) / 2)"
        f" + cos({p1}) * cos({p2})"
        f" * sin(({l2} - {l1}) / 2) * sin(({l2} - {l1}) / 2))"
    )
    d = (
        f"(2 * asin(sqrt(greatest(least({hav}, {G.fnum(1.0)}),"
        f" {G.fnum(0.0)}))))"
    )
    a = f"(sin((1 - ({f})) * {d}) / sin({d}))"
    b = f"(sin(({f}) * {d}) / sin({d}))"
    x = (
        f"({a} * cos({p1}) * cos({l1})"
        f" + {b} * cos({p2}) * cos({l2}))"
    )
    y = (
        f"({a} * cos({p1}) * sin({l1})"
        f" + {b} * cos({p2}) * sin({l2}))"
    )
    z = f"({a} * sin({p1}) + {b} * sin({p2}))"
    lat = (
        f"round(case when {d} = 0 then ({lat1}) else"
        f" atan2({z}, sqrt({x} * {x} + {y} * {y})) * {deg} end, 6)"
    )
    lon = (
        f"round(case when {d} = 0 then ({lon1}) else"
        f" atan2({y}, {x}) * {deg} end, 6)"
    )
    return lat, lon


def route_waypoints(
    routes: DataFrame,
    n: int = 8,
    lat1: str = "lat1",
    lon1: str = "lon1",
    lat2: str = "lat2",
    lon2: str = "lon2",
) -> DataFrame:
    """Great-circle waypoint interpolation (spherical slerp): n+1
    evenly spaced points along each route — flight-path rendering,
    corridor sampling at route resolution (pair with
    cross_track_distance for the distance-off-route screen), and
    the geodesic complement of trajectory_resample's time-domain
    form.

    Trig-derived: waypoint lat/lon round(6) both sides; coincident
    endpoints degenerate to the start point (documented in
    :func:`slerp_sql`).

    Scale: one row-local sequence explode per route, zero shuffle.
    """
    fexpr = f"(cast(i as double) / cast({int(n)} as double))"
    latw, lonw = slerp_sql(lat1, lon1, lat2, lon2, fexpr)
    return routes.select(
        "*",
        F.expr(f"explode(sequence(0, {int(n)}))").alias("i"),
    ).select(
        "*",
        F.expr(latw).alias("wlat"),
        F.expr(lonw).alias("wlon"),
    )


def rhumb_line(
    df: DataFrame,
    lat1: str = "lat1",
    lon1: str = "lon1",
    lat2: str = "lat2",
    lon2: str = "lon2",
) -> DataFrame:
    """Rhumb-line (loxodrome) distance and constant bearing — the
    navigation complement of the great-circle family (haversine /
    cross_track / slerp): the course you can STEER without turning,
    slightly longer than the geodesic but constant-heading.

        dpsi = ln( tan(pi/4 + p2/2) / tan(pi/4 + p1/2) )
        brg  = atan2(dlam, dpsi)            (dlam wrapped short way)
        dist = sqrt(dphi^2 + q^2 dlam^2) * R,
        q    = dphi/dpsi (or cos(p1) when dphi ~ 0)

    Trig/ln-derived: dist_km and bearing_deg round(6) on both
    sides; equal-latitude legs take the cos(p1) limit via a CASE on
    dphi = 0 exactly (the formula's standard guard).

    Scale: fully row-local codegen, zero shuffle.
    """
    import math

    from pdal_spark import sqlgen as G

    rad = G.fnum(math.pi / 180.0)
    deg = G.fnum(180.0 / math.pi)
    R = G.fnum(6371.0088)
    p1 = f"(({lat1}) * {rad})"
    p2 = f"(({lat2}) * {rad})"
    dphi = f"({p2} - {p1})"
    dl = (
        f"((({lon2}) - ({lon1})) - {G.fnum(360.0)}"
        f" * floor(((({lon2}) - ({lon1})) + {G.fnum(180.0)})"
        f" / {G.fnum(360.0)}))"
    )
    dlam = f"({dl} * {rad})"
    qp = G.fnum(math.pi / 4.0)
    dpsi = (
        f"ln(tan({qp} + {p2} / 2) / tan({qp} + {p1} / 2))"
    )
    qfac = (
        f"(case when {dphi} = 0 then cos({p1})"
        f" else {dphi} / ({dpsi}) end)"
    )
    dist = (
        f"round(sqrt({dphi} * {dphi}"
        f" + ({qfac}) * ({qfac}) * {dlam} * {dlam}) * {R}, 6)"
    )
    brg_raw = f"(atan2({dlam}, {dpsi}) * {deg})"
    brg = (
        f"round({brg_raw} - {G.fnum(360.0)}"
        f" * floor({brg_raw} / {G.fnum(360.0)}), 6)"
    )
    return df.withColumn("rhumb_km", F.expr(dist)).withColumn(
        "rhumb_brg", F.expr(brg)
    )


def solar_position(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    day_of_year: str = "doy",
    hour_utc: str = "hour_utc",
) -> DataFrame:
    """Approximate solar position (Cooper declination + hour-angle
    zenith — the standard engineering approximation, ~1 degree): the
    illumination-QA input for imagery and the sun vector hillshade
    wants (was this tile shot at grazing light; is a solar panel /
    shadow analysis plausible):

        decl  = 23.45 sin(2 pi (284 + doy) / 365)
        H     = 15 (hour_utc + lon/15 - 12)       [degrees]
        cos z = sin(lat) sin(decl)
                + cos(lat) cos(decl) cos(H)

    Outputs decl_deg, hour_angle_deg, cos_zenith, elev_deg —
    trig-derived, round(6) both sides, then ``+ 0.0`` to normalize
    NEGATIVE ZERO (DuckDB round keeps -0.0, Spark does not; the
    dtype-sensitive hash tells them apart).

    Scale: fully row-local codegen, zero shuffle.
    """
    import math

    from pdal_spark import sqlgen as G

    rad = G.fnum(math.pi / 180.0)
    deg = G.fnum(180.0 / math.pi)
    decl = (
        f"({G.fnum(23.45)} * sin({G.fnum(2.0 * math.pi / 365.0)}"
        f" * (284 + ({day_of_year}))))"
    )
    ha = (
        f"({G.fnum(15.0)} * (({hour_utc}) + ({lon})"
        f" / {G.fnum(15.0)} - {G.fnum(12.0)}))"
    )
    cosz = (
        f"(sin(({lat}) * {rad}) * sin({decl} * {rad})"
        f" + cos(({lat}) * {rad}) * cos({decl} * {rad})"
        f" * cos({ha} * {rad}))"
    )
    return (
        df.withColumn(
            "decl_deg", F.expr(f"round({decl}, 6) + 0.0e0")
        )
        .withColumn(
            "hour_angle_deg", F.expr(f"round({ha}, 6) + 0.0e0")
        )
        .withColumn(
            "cos_zenith", F.expr(f"round({cosz}, 6) + 0.0e0")
        )
        .withColumn(
            "elev_deg",
            F.expr(
                f"round(asin(greatest(least({cosz}, {G.fnum(1.0)}),"
                f" {G.fnum(-1.0)})) * {deg}, 6) + 0.0e0"
            ),
        )
    )


def stereographic_sql(
    lat: str,
    lon: str,
    lon0: float = 0.0,
) -> tuple[str, str]:
    """Dialect-neutral SQL fragments for the north-polar
    stereographic projection (spherical, k0 = 1 — the PROJ `stere
    +lat_0=90` family every polar chart uses):

        rho = 2 R tan(pi/4 - phi/2)
        x   = rho sin(lam - lam0)
        y   = -rho cos(lam - lam0)

    Returns (x_expr, y_expr) in metres rounded to mm with -0.0
    normalized (`+ 0.0e0` — the solar_position round-trap), same
    string for both engines."""
    import math

    from pdal_spark import sqlgen as G

    R = 6371008.8
    rad = G.fnum(math.pi / 180.0)
    rho = (
        f"({G.fnum(2.0 * R)} * tan({G.fnum(math.pi / 4.0)}"
        f" - (({lat}) * {rad}) / {G.fnum(2.0)}))"
    )
    dl = f"((({lon}) - {G.fnum(float(lon0))}) * {rad})"
    xe = f"(round({rho} * sin({dl}), 3) + 0.0e0)"
    ye = f"(round({G.fnum(0.0)} - {rho} * cos({dl}), 3) + 0.0e0)"
    return xe, ye


def reproject_stereographic(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    lon0: float = 0.0,
) -> DataFrame:
    """filters.reprojection, polar stereographic (spherical; the
    conformal azimuthal complement of reproject_albers /
    reproject_mercator / reproject_utm — PROJ `stere +lat_0=90`,
    the EPSG:3413/3976-family shape). Trig-derived x/y round to
    millimetres on both sides, -0.0 normalized.

    Scale: fully row-local codegen projection, zero shuffle.
    """
    xe, ye = stereographic_sql(lat, lon, lon0)
    return df.withColumn("x_ste", F.expr(xe)).withColumn(
        "y_ste", F.expr(ye)
    )


def tissot_mercator(
    df: DataFrame,
    lat: str = "lat",
    zoom: int = 10,
) -> DataFrame:
    """Tissot distortion factors for Web-Mercator (the map-scale
    honesty check behind every slippy-tile readout): at latitude
    phi the conformal point scale is k = h = sec(phi), areal
    exaggeration k^2, and the zoom-z ground resolution

        res_z = 156543.03392... * cos(phi) / 2^z   [m/pixel]

    (the EPSG:3857 constant 2 pi R / 256). Trig-derived outputs
    round (k/area to 6dp, res to mm); all strictly positive for
    |phi| < 90 so no -0.0 trap. Output adds (k_r, area_r, res_r).

    Scale: row-local codegen, zero shuffle.
    """
    import math

    from pdal_spark import sqlgen as G

    rad = G.fnum(math.pi / 180.0)
    c0 = G.fnum(2.0 * math.pi * 6378137.0 / 256.0)
    k = f"({G.fnum(1.0)} / cos(({lat}) * {rad}))"
    res = f"({c0} * cos(({lat}) * {rad}) / {G.fnum(float(1 << int(zoom)))})"
    return (
        df.withColumn("k_r", F.expr(f"round({k}, 6)"))
        .withColumn("area_r", F.expr(f"round({k} * {k}, 6)"))
        .withColumn("res_r", F.expr(f"round({res}, 3)"))
    )


def affine_from_gcps(
    df: DataFrame,
    sx: str = "x",
    sy: str = "y",
    tx: str = "tx",
    ty: str = "ty",
) -> DataFrame:
    """Least-squares 6-parameter affine georeference from ground
    control points (the gdal_translate -gcp / filters.transformation
    calibration step: fit (tx, ty) ~ affine(x, y) from matched
    pairs):

        tx = a x + b y + c ,  ty = d x + e y + f

    solved by Cramer's rule on the 3x3 normal-equation matrix whose
    entries are EXACT int64 moments (Sxx, Sxy, Syy, Sx, Sy, n and
    the 6 cross moments); determinants evaluate as one fixed IEEE
    chain from those integers (deterministic cross-engine — the
    moments are the hash-compared essence, the doubles their fixed
    readout). NULL coefficients on a degenerate (collinear) GCP
    set. Output one row: the 7 moments + (a, b, c, d, e, f).

    Scale: ONE moment aggregation pass over the GCP table.
    """
    base = df.select(
        F.col(sx).cast("long").alias("px"),
        F.col(sy).cast("long").alias("py"),
        F.col(tx).cast("long").alias("qx"),
        F.col(ty).cast("long").alias("qy"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("px").alias("sx"),
        F.sum("py").alias("sy"),
        F.sum(F.expr("px * px")).alias("sxx"),
        F.sum(F.expr("px * py")).alias("sxy"),
        F.sum(F.expr("py * py")).alias("syy"),
        F.sum("qx").alias("stx"),
        F.sum("qy").alias("sty"),
        F.sum(F.expr("px * qx")).alias("sxtx"),
        F.sum(F.expr("py * qx")).alias("sytx"),
        F.sum(F.expr("px * qy")).alias("sxty"),
        F.sum(F.expr("py * qy")).alias("syty"),
    )

    def d(v: str) -> str:
        return f"cast({v} as double)"

    det = (
        f"({d('sxx')} * ({d('syy')} * {d('n')}"
        f" - {d('sy')} * {d('sy')})"
        f" - {d('sxy')} * ({d('sxy')} * {d('n')}"
        f" - {d('sy')} * {d('sx')})"
        f" + {d('sx')} * ({d('sxy')} * {d('sy')}"
        f" - {d('syy')} * {d('sx')}))"
    )

    def coefs(r1: str, r2: str, r3: str) -> tuple[str, str, str]:
        # replace each column of M with the RHS vector in turn
        da = (
            f"({d(r1)} * ({d('syy')} * {d('n')}"
            f" - {d('sy')} * {d('sy')})"
            f" - {d('sxy')} * ({d(r2)} * {d('n')}"
            f" - {d('sy')} * {d(r3)})"
            f" + {d('sx')} * ({d(r2)} * {d('sy')}"
            f" - {d('syy')} * {d(r3)}))"
        )
        db = (
            f"({d('sxx')} * ({d(r2)} * {d('n')}"
            f" - {d(r3)} * {d('sy')})"
            f" - {d(r1)} * ({d('sxy')} * {d('n')}"
            f" - {d('sy')} * {d('sx')})"
            f" + {d('sx')} * ({d('sxy')} * {d(r3)}"
            f" - {d(r2)} * {d('sx')}))"
        )
        dc = (
            f"({d('sxx')} * ({d('syy')} * {d(r3)}"
            f" - {d(r2)} * {d('sy')})"
            f" - {d('sxy')} * ({d('sxy')} * {d(r3)}"
            f" - {d(r2)} * {d('sx')})"
            f" + {d(r1)} * ({d('sxy')} * {d('sy')}"
            f" - {d('syy')} * {d('sx')}))"
        )
        return da, db, dc

    ax, bx, cx = coefs("sxtx", "sytx", "stx")
    ay, by, cy = coefs("sxty", "syty", "sty")
    g = f"case when {det} <> 0.0e0 then "
    return m.select(
        "n", "sx", "sy", "sxx", "sxy", "syy",
        "stx", "sty", "sxtx", "sytx", "sxty", "syty",
        F.expr(f"{g}{ax} / {det} end").alias("a"),
        F.expr(f"{g}{bx} / {det} end").alias("b"),
        F.expr(f"{g}{cx} / {det} end").alias("c"),
        F.expr(f"{g}{ay} / {det} end").alias("d"),
        F.expr(f"{g}{by} / {det} end").alias("e"),
        F.expr(f"{g}{cy} / {det} end").alias("f"),
    )


GEOMID_Q = 1_000_000_000


def geographic_midpoint(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Geographic midpoint of a point set via the 3-D unit-vector
    mean (the correct "center" on the sphere — planar averaging of
    longitudes breaks at the antimeridian; sd_ellipse's spherical
    sibling): each point's (x, y, z) = (cos lat cos lon, cos lat
    sin lon, sin lat) quantizes to integer nano-units (round(9)
    first — the circular_stats convention), the sums are exact
    int64 folds, and the midpoint closes out with atan2 chains
    rounded to 6dp (-0.0 normalized). Output one row: (n, sx, sy,
    sz, mid_lat_r, mid_lon_r).

    Scale: ONE map-side-combined aggregation.
    """
    import math

    from pdal_spark import sqlgen as G

    rad = G.fnum(math.pi / 180.0)
    deg = G.fnum(180.0 / math.pi)
    qf = G.fnum(float(GEOMID_Q))

    def _q(e: str) -> str:
        return (
            f"cast(floor(round({e}, 9) * {qf} + 0.5e0) as bigint)"
        )

    x = _q(f"cos(({lat}) * {rad}) * cos(({lon}) * {rad})")
    y = _q(f"cos(({lat}) * {rad}) * sin(({lon}) * {rad})")
    z = _q(f"sin(({lat}) * {rad})")
    agg = df.select(
        F.expr(x).alias("xq"), F.expr(y).alias("yq"),
        F.expr(z).alias("zq"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").alias("sx"), F.sum("yq").alias("sy"),
        F.sum("zq").alias("sz"),
    )
    hyp = (
        "sqrt(cast(sx as double) * cast(sx as double)"
        " + cast(sy as double) * cast(sy as double))"
    )
    return agg.select(
        "n", "sx", "sy", "sz",
        F.expr(
            "case when n > 0 then"
            " round(atan2(cast(sz as double), " + hyp + ")"
            f" * {deg}, 6) + 0.0e0 end"
        ).alias("mid_lat_r"),
        F.expr(
            "case when n > 0 then"
            " round(atan2(cast(sy as double),"
            " cast(sx as double))"
            f" * {deg}, 6) + 0.0e0 end"
        ).alias("mid_lon_r"),
    )


def grid_convergence(
    df: DataFrame,
    zone: int,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Meridian (grid) convergence angle for a UTM zone — the
    correction between GRID north and TRUE north every azimuth
    measured on a projected map needs (completes reproject_utm /
    utm_auto_zone; spherical closed form):

        gamma = atan( tan(lon - lon0) * sin(lat) )

    Trig-derived -> round(6) degrees with -0.0 normalized. Output
    adds gamma_r.

    Scale: row-local codegen, zero shuffle.
    """
    import math

    from pdal_spark import sqlgen as G
    from pdal_spark.sqlgen import utm_lon0

    rad = G.fnum(math.pi / 180.0)
    deg = G.fnum(180.0 / math.pi)
    l0 = G.fnum(float(utm_lon0(int(zone))))
    g = (
        f"atan(tan((({lon}) - {l0}) * {rad})"
        f" * sin(({lat}) * {rad}))"
    )
    return df.withColumn(
        "gamma_r",
        F.expr(f"(round({g} * {deg}, 6) + 0.0e0)"),
    )


# ---------------------------------------------------------------------------
# Conic + ECEF closed-form reprojection family (VERDICT r2 #5):
# ellipsoidal Lambert conformal conic, ellipsoidal Albers, and
# geodetic <-> ECEF — the dominant remaining projected-CRS families
# after 3857/UTM (ReprojectionFilter.cpp:199 covers any PROJ pair;
# these are the closed forms from Snyder, "Map Projections — A
# Working Manual", USGS PP 1395, with its own published numeric
# examples pinned in tests/test_published_vectors.py).
# ---------------------------------------------------------------------------

# Clarke 1866 (Snyder's example ellipsoid) and WGS84
CLARKE1866 = (6378206.4, 0.00676866)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)


def _wrap_dlon(lon: str, lon0: float) -> str:
    """(-180, 180]-wrapped (lon - lon0) in degrees, splice-safe."""
    return (
        f"((({lon}) - {G.fnum(float(lon0))}) - {G.fnum(360.0)}"
        f" * floor(((({lon}) - {G.fnum(float(lon0))})"
        f" + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
    )


def lcc_sql(
    lat: str,
    lon: str,
    phi1: float,
    phi2: float,
    lat0: float,
    lon0: float,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> tuple[str, str]:
    """Dialect-neutral (x, y) fragments for the ellipsoidal Lambert
    conformal conic, 2 standard parallels (Snyder eq. 15-1..15-10):

        m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi)
        t(phi) = tan(pi/4 - phi/2)
                   / ((1 - e sin phi)/(1 + e sin phi))^(e/2)
        n   = (ln m1 - ln m2) / (ln t1 - ln t2)
        F   = m1 / (n t1^n);  rho = a F t^n;  theta = n dlam
        x   = rho sin theta;  y = rho0 - rho cos theta

    n/F/rho0 fold driver-side; per-row work is tan/power/sin/cos.
    Trig+pow chains are INEXACT cross-engine in the last ulps, so
    outputs round to millimetres on both sides (house convention)."""
    import math

    e = math.sqrt(e2)

    def _m(p):
        return math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

    def _t(p):
        return math.tan(math.pi / 4 - p / 2) / (
            ((1 - e * math.sin(p)) / (1 + e * math.sin(p))) ** (e / 2)
        )

    p1, p2, p0 = (math.radians(v) for v in (phi1, phi2, lat0))
    n = (math.log(_m(p1)) - math.log(_m(p2))) / (
        math.log(_t(p1)) - math.log(_t(p2))
    )
    Fc = _m(p1) / (n * _t(p1) ** n)
    rho0 = a * Fc * _t(p0) ** n
    rad = G.fnum(math.pi / 180.0)
    phir = f"(({lat}) * {rad})"
    esin = f"({G.fnum(e)} * sin({phir}))"
    t_row = (
        f"(tan({G.fnum(math.pi / 4.0)} - {phir} / {G.fnum(2.0)})"
        f" / power(({G.fnum(1.0)} - {esin})"
        f" / ({G.fnum(1.0)} + {esin}), {G.fnum(e / 2.0)}))"
    )
    rho = f"({G.fnum(a * Fc)} * power({t_row}, {G.fnum(n)}))"
    th = f"({G.fnum(n)} * {_wrap_dlon(lon, lon0)} * {rad})"
    xe = f"round({rho} * sin({th}), 3) + 0.0e0"
    ye = f"round({G.fnum(rho0)} - {rho} * cos({th}), 3) + 0.0e0"
    return xe, ye


def reproject_lcc(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    phi1: float = 33.0,
    phi2: float = 45.0,
    lat0: float = 23.0,
    lon0: float = -96.0,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
    out_x: str = "x_lcc",
    out_y: str = "y_lcc",
) -> DataFrame:
    """filters.reprojection, ellipsoidal Lambert conformal conic —
    the projection behind most US State Plane zones and national
    grids (ReprojectionFilter.cpp:199 via PROJ `lcc`). Closed form,
    pure Catalyst, zero shuffle; mm-rounded outputs."""
    xe, ye = lcc_sql(lat, lon, phi1, phi2, lat0, lon0, a, e2)
    return df.withColumn(out_x, F.expr(xe)).withColumn(
        out_y, F.expr(ye)
    )


def albers_ellipsoidal_sql(
    lat: str,
    lon: str,
    phi1: float,
    phi2: float,
    lat0: float,
    lon0: float,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> tuple[str, str]:
    """Dialect-neutral (x, y) for the ELLIPSOIDAL Albers equal-area
    conic (Snyder eq. 14-12..14-21 / 3-12; the spherical form ships
    as :func:`albers_sql`):

        q(phi) = (1-e^2)[ sin phi/(1-e^2 sin^2 phi)
                  - (1/2e) ln((1-e sin phi)/(1+e sin phi)) ]
        n = (m1^2 - m2^2)/(q2 - q1);  C = m1^2 + n q1
        rho = a sqrt(C - n q)/n;  x = rho sin(n dlam)
        y = rho0 - rho cos(n dlam)
    """
    import math

    e = math.sqrt(e2)

    def _m(p):
        return math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

    def _q(p):
        s = math.sin(p)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    p1, p2, p0 = (math.radians(v) for v in (phi1, phi2, lat0))
    n = (_m(p1) ** 2 - _m(p2) ** 2) / (_q(p2) - _q(p1))
    C = _m(p1) ** 2 + n * _q(p1)
    rho0 = a * math.sqrt(C - n * _q(p0)) / n
    rad = G.fnum(math.pi / 180.0)
    phir = f"(({lat}) * {rad})"
    s = f"sin({phir})"
    esin = f"({G.fnum(e)} * {s})"
    q_row = (
        f"({G.fnum(1.0 - e2)} * ({s} / ({G.fnum(1.0)}"
        f" - {G.fnum(e2)} * {s} * {s})"
        f" - {G.fnum(1.0 / (2.0 * e))}"
        f" * ln(({G.fnum(1.0)} - {esin})"
        f" / ({G.fnum(1.0)} + {esin}))))"
    )
    rho = (
        f"({G.fnum(a / n)} * sqrt(greatest({G.fnum(C)}"
        f" - {G.fnum(n)} * {q_row}, {G.fnum(0.0)})))"
    )
    th = f"({G.fnum(n)} * {_wrap_dlon(lon, lon0)} * {rad})"
    xe = f"round({rho} * sin({th}), 3) + 0.0e0"
    ye = f"round({G.fnum(rho0)} - {rho} * cos({th}), 3) + 0.0e0"
    return xe, ye


def reproject_albers_ellipsoidal(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    phi1: float = 29.5,
    phi2: float = 45.5,
    lat0: float = 23.0,
    lon0: float = -96.0,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
    out_x: str = "x_aea_e",
    out_y: str = "y_aea_e",
) -> DataFrame:
    """filters.reprojection, ellipsoidal Albers equal-area conic —
    EPSG:5070 (CONUS Albers) semantics when called with WGS84/GRS80
    parameters. Closed form, pure Catalyst, zero shuffle."""
    xe, ye = albers_ellipsoidal_sql(
        lat, lon, phi1, phi2, lat0, lon0, a, e2
    )
    return df.withColumn(out_x, F.expr(xe)).withColumn(
        out_y, F.expr(ye)
    )


def polar_stereographic_sql(
    lat: str,
    lon: str,
    lat_ts: float = -71.0,
    lon0: float = 0.0,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> tuple[str, str]:
    """Dialect-neutral (x, y) for the ELLIPSOIDAL polar
    stereographic with a standard parallel (Snyder PP-1395 eq.
    21-33/21-34 with t from 15-9 and m from 14-15) — the
    projection behind EPSG:3031/3976 (Antarctic, lat_ts=-71) and
    EPSG:3413 (NSIDC Arctic, lat_ts=70):

        t(phi) = tan(pi/4 - phi/2)
                   / ((1 - e sin phi)/(1 + e sin phi))^(e/2)
        rho = a m(phi_c) t(phi') / t(phi_c)   (phi_c = |lat_ts|)
        x = rho sin(dlam);  y = s * rho cos(dlam)

    with phi' = s*phi, s = +1 for the south aspect (lat_ts < 0),
    -1 north (Snyder's sign-reversal rule folded in). At a true
    pole (|lat_ts| = 90) the k0 form rho = 2 a t /
    sqrt((1+e)^(1+e) (1-e)^(1-e)) applies. Constants fold
    driver-side; outputs mm-rounded (house convention — trig/pow
    differ cross-engine in last ulps)."""
    import math

    e = math.sqrt(e2)

    def _m(p):
        return math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

    def _t(p):
        return math.tan(math.pi / 4 - p / 2) / (
            ((1 - e * math.sin(p)) / (1 + e * math.sin(p)))
            ** (e / 2))

    south = lat_ts < 0
    pc = math.radians(abs(lat_ts))
    if abs(lat_ts) >= 90.0:
        factor = (2.0 * a
                  / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)))
    else:
        factor = a * _m(pc) / _t(pc)
    rad = G.fnum(math.pi / 180.0)
    # phi' = sgn'*phi where the aspect flips latitude: south uses -phi
    phir = f"(({lat}) * {G.fnum(-math.pi / 180.0 if south else math.pi / 180.0)})"
    esin = f"({G.fnum(e)} * sin({phir}))"
    t_row = (
        f"(tan({G.fnum(math.pi / 4.0)} - {phir} / {G.fnum(2.0)})"
        f" / power(({G.fnum(1.0)} - {esin})"
        f" / ({G.fnum(1.0)} + {esin}), {G.fnum(e / 2.0)}))"
    )
    rho = f"({G.fnum(factor)} * {t_row})"
    dl = f"({_wrap_dlon(lon, lon0)} * {rad})"
    xe = f"round({rho} * sin({dl}), 3) + 0.0e0"
    ye = (f"round({G.fnum(1.0 if south else -1.0)} * {rho}"
          f" * cos({dl}), 3) + 0.0e0")
    return xe, ye


def reproject_polar_stereographic(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    lat_ts: float = -71.0,
    lon0: float = 0.0,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
    out_x: str = "x_ps",
    out_y: str = "y_ps",
) -> DataFrame:
    """filters.reprojection, ellipsoidal polar stereographic —
    EPSG:3031 semantics with the defaults (ReprojectionFilter.cpp:
    199 via PROJ `stere` polar aspect). Closed form, pure Catalyst,
    zero shuffle; mm-rounded."""
    xe, ye = polar_stereographic_sql(lat, lon, lat_ts, lon0, a, e2)
    return df.withColumn(out_x, F.expr(xe)).withColumn(
        out_y, F.expr(ye)
    )


def ecef_sql(
    lat: str,
    lon: str,
    h: str = "0.0e0",
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> tuple[str, str, str]:
    """Dialect-neutral geodetic -> ECEF (EPSG:4979 -> EPSG:4978):

        N = a / sqrt(1 - e^2 sin^2 phi)
        X = (N + h) cos phi cos lam;  Y = (N + h) cos phi sin lam
        Z = (N (1 - e^2) + h) sin phi

    mm-rounded (trig chain)."""
    import math

    rad = G.fnum(math.pi / 180.0)
    phir = f"(({lat}) * {rad})"
    lamr = f"(({lon}) * {rad})"
    s = f"sin({phir})"
    nn = (
        f"({G.fnum(a)} / sqrt({G.fnum(1.0)}"
        f" - {G.fnum(e2)} * {s} * {s}))"
    )
    xe = (
        f"round(({nn} + ({h})) * cos({phir}) * cos({lamr}), 3)"
        " + 0.0e0"
    )
    ye = (
        f"round(({nn} + ({h})) * cos({phir}) * sin({lamr}), 3)"
        " + 0.0e0"
    )
    ze = (
        f"round(({nn} * {G.fnum(1.0 - e2)} + ({h})) * {s}, 3)"
        " + 0.0e0"
    )
    return xe, ye, ze


def geodetic_to_ecef(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    h: str | None = None,
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> DataFrame:
    """Geodetic -> ECEF as a named reprojection op (the georeference
    family's output frame, EPSG:4978; sqlgen.ecef_from_enu composes
    with this for sensor-frame chains). Adds ecef_x/y/z metres
    (mm-rounded). Pure Catalyst, zero shuffle."""
    he = f"`{h}`" if h is not None else "0.0e0"
    xe, ye, ze = ecef_sql(f"`{lat}`", f"`{lon}`", he, a, e2)
    return (
        df.withColumn("ecef_x", F.expr(xe))
        .withColumn("ecef_y", F.expr(ye))
        .withColumn("ecef_z", F.expr(ze))
    )


def ecef_to_geodetic(
    df: DataFrame,
    x: str = "ecef_x",
    y: str = "ecef_y",
    z: str = "ecef_z",
    a: float = WGS84_A,
    e2: float = WGS84_E2,
) -> DataFrame:
    """ECEF -> geodetic via Bowring's single-shot closed form (no
    iteration; sub-mm for terrestrial points):

        p = sqrt(x^2 + y^2);  u = atan2(z a, p b)
        phi = atan2(z + e'^2 b sin^3 u, p - e^2 a cos^3 u)
        lam = atan2(y, x);  h = p / cos phi - N(phi)

    Adds lat/lon degrees (round 9 ~ 0.1 mm) and h metres (round 3).
    Pure Catalyst, zero shuffle."""
    import math

    b = a * math.sqrt(1.0 - e2)
    ep2 = e2 / (1.0 - e2)
    deg = G.fnum(180.0 / math.pi)
    xx, yy, zz = f"(`{x}`)", f"(`{y}`)", f"(`{z}`)"
    p = f"sqrt({xx} * {xx} + {yy} * {yy})"
    u = f"atan2({zz} * {G.fnum(a)}, {p} * {G.fnum(b)})"
    su, cu = f"sin({u})", f"cos({u})"
    phi = (
        f"atan2({zz} + {G.fnum(ep2 * b)} * {su} * {su} * {su},"
        f" {p} - {G.fnum(e2 * a)} * {cu} * {cu} * {cu})"
    )
    s = f"sin({phi})"
    nn = (
        f"({G.fnum(a)} / sqrt({G.fnum(1.0)}"
        f" - {G.fnum(e2)} * {s} * {s}))"
    )
    lat_e = f"round({phi} * {deg}, 9) + 0.0e0"
    lon_e = f"round(atan2({yy}, {xx}) * {deg}, 9) + 0.0e0"
    h_e = f"round({p} / cos({phi}) - {nn}, 3) + 0.0e0"
    return (
        df.withColumn("lat", F.expr(lat_e))
        .withColumn("lon", F.expr(lon_e))
        .withColumn("h", F.expr(h_e))
    )


# Airy 1830 (OSGB36's ellipsoid) for national-grid callers
AIRY1830 = (6377563.396, 1.0 - (6356256.909 / 6377563.396))


def reproject_tmerc(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    lat0: float = 0.0,
    lon0: float = 0.0,
    k0: float = 1.0,
    x0: float = 0.0,
    y0: float = 0.0,
    a: float = None,
    f: float = None,
    out_x: str = "x_tm",
    out_y: str = "y_tm",
) -> DataFrame:
    """filters.reprojection, GENERAL transverse Mercator — the
    projection behind OSGB (EPSG:27700), NZTM, Gauss-Krueger zones
    and most non-UTM national grids (ReprojectionFilter.cpp:199 via
    PROJ `tmerc`). Karney-series closed form (sqlgen.tmerc_xy),
    pure Catalyst, zero shuffle; defaults to WGS84 when a/f are
    omitted. mm-rounded outputs (house convention)."""
    if a is None:
        a = WGS84_A
    if f is None:
        f = WGS84_F
    xe, ye = G.tmerc_xy(f"`{lat}`", f"`{lon}`", lat0, lon0, k0,
                        x0, y0, a, f, _D)
    return (df.withColumn(out_x,
                          F.expr(f"round({xe}, 3) + 0.0e0"))
            .withColumn(out_y,
                        F.expr(f"round({ye}, 3) + 0.0e0")))
