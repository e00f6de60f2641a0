"""Raster <-> vector conversion (SURVEY.md §2.8 / M5).

writers.gdal analog (io/GDALWriter.cpp:63-106, io/private/
GDALGrid.cpp): rasterize points onto a fixed grid where each point
updates every cell whose CENTER (origin + (i+.5)*edge,
Raster.hpp:172-176) lies strictly within ``radius``
(GDALGrid.cpp:224-274); per-cell stats min/max/mean/count/stdev and
IDW = sum(z/d^p)/sum(1/d^p) with a zero-distance short-circuit
(GDALGrid.cpp:461-473); optional window-fill of empty cells from
neighbors within a Chebyshev window, weighted 1/celldist
(GDALGrid.cpp:563-608).

Spark shape: PDAL's quadrant walk (per-point mutable grid) becomes
"explode point -> candidate cell offsets, filter by center distance,
one hash aggregate". Shuffle volume is O(points x offsets) partials
combined map-side; the grid itself never materializes on the driver.

readers.gdal analog (io/GDALReader.cpp:134-143): raster -> one point
per cell, X/Y at cell center, one column per band.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rasterize(
    df: DataFrame,
    resolution: float,
    origin_x: float,
    origin_y: float,
    width: int,
    height: int,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    radius: float | None = None,
    power: float = 1.0,
    with_stdev: bool = True,
    deterministic: bool = False,
) -> DataFrame:
    """Point cloud -> cell grid DataFrame with
    (cell_i, cell_j, cnt, zmin, zmax, zmean, zidw[, zstdev]).

    deterministic=True quantizes the mean/IDW accumulation terms to
    2^20 fixed point BEFORE summing, making results bit-identical
    regardless of aggregation order (for oracle checks and
    reproducible lineage); error vs float IDW is ~1e-6 relative.
    Requires |z| and 1/d^p to stay < ~2^42 (holds whenever points are
    not essentially on top of cell centers — exact hits take the
    zero-distance path).
    """
    if radius is None:
        radius = resolution * math.sqrt(2.0)  # GDALWriter default
    k = int(math.ceil(radius / resolution))
    res, ox, oy = float(resolution), float(origin_x), float(origin_y)

    base_i = F.floor((F.col(x) - ox) / res).cast("long")
    base_j = F.floor((F.col(y) - oy) / res).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in range(-k, k + 1)
            for dj in range(-k, k + 1)
        ]
    )
    pts = df.select(
        F.col(x).alias("px"), F.col(y).alias("py"),
        F.col(z).cast("double").alias("pz"),
        base_i.alias("bi"), base_j.alias("bj"),
        F.explode(offsets).alias("o"),
    )
    ci = (F.col("bi") + F.col("o.di")).alias("cell_i")
    cj = (F.col("bj") + F.col("o.dj")).alias("cell_j")
    cells = pts.select("px", "py", "pz", ci, cj)
    cx = ox + (F.col("cell_i") + 0.5) * res
    cy = oy + (F.col("cell_j") + 0.5) * res
    d = F.sqrt(
        (cx - F.col("px")) * (cx - F.col("px"))
        + (cy - F.col("py")) * (cy - F.col("py"))
    )
    contrib = cells.withColumn("d", d).where(
        (F.col("d") < float(radius))
        & (F.col("cell_i") >= 0) & (F.col("cell_i") < width)
        & (F.col("cell_j") >= 0) & (F.col("cell_j") < height)
    )
    # IDW terms; p=1 uses plain division (pow() differs across
    # engines in the last ulp).
    wterm = (
        1.0 / F.col("d") if power == 1.0
        else F.lit(1.0) / F.pow("d", float(power))
    )
    zterm = F.col("pz") * wterm
    zero_val = F.min(F.when(F.col("d") == 0.0, F.col("pz")))
    if deterministic:
        q = 1048576.0  # 2^20 fixed point
        zq = F.round(F.col("pz") * q).cast("long")
        ztq = F.round(zterm * q).cast("long")
        wtq = F.round(wterm * q).cast("long")
        mean_expr = (F.sum(zq).cast("double") / q) / F.count(F.lit(1))
        idw_expr = (
            F.sum(F.when(F.col("d") > 0.0, ztq)).cast("double")
            / F.sum(F.when(F.col("d") > 0.0, wtq)).cast("double")
        )
    else:
        mean_expr = F.avg("pz")
        idw_expr = F.sum(F.when(F.col("d") > 0.0, zterm)) / F.sum(
            F.when(F.col("d") > 0.0, wterm)
        )
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.min("pz").alias("zmin"),
        F.max("pz").alias("zmax"),
        mean_expr.alias("zmean"),
        idw_expr.alias("__idw_sum"),
        zero_val.alias("__zero"),
    ]
    if with_stdev:
        aggs.append(F.stddev_samp("pz").alias("zstdev"))
    out = contrib.groupBy("cell_i", "cell_j").agg(*aggs)
    return out.withColumn(
        "zidw", F.coalesce(F.col("__zero"), F.col("__idw_sum"))
    ).drop("__idw_sum", "__zero")


def rasterize_binmode(
    df: DataFrame,
    resolution: float,
    origin_x: float,
    origin_y: float,
    width: int,
    height: int,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    percentiles: tuple[int, ...] = (25, 50, 75),
    deterministic: bool = False,
) -> DataFrame:
    """writers.gdal ``binmode=true`` + ``p<N>`` output types: each
    point updates ONLY the cell containing it (GDALGrid.cpp:257-274
    skips the quadrant walk in bin mode, d = 0), and per-cell
    percentiles are linear-interpolated order statistics over the
    cell's values (GDALGrid::fillPercentiles, GDALGrid.cpp:480-503:
    idx = (p/100)*(n-1), v[floor] + frac*(v[floor+1]-v[floor]) —
    the same interpolation as SQL percentile_cont).

    Spark shape: zero fan-out (no radius explode) — one hash
    aggregate on (cell_i, cell_j); min/max/count/mean combine
    map-side, the exact percentile buffers per-cell value multisets
    (bounded by cell point counts, not dataset size — cells are the
    partitioning unit, so this scales with the densest cell, the
    same skew the salted tile layout already handles).

    deterministic=True quantizes z to a 2^20 fixed-point grid before
    the percentile so the interpolated value is exactly representable
    for percentiles that are multiples of 25 (frac in {0,.25,.5,.75}
    scales integers exactly) — bit-identical across engines and
    aggregation orders; error vs float path <= 2^-21 in z units.
    """
    res, ox, oy = float(resolution), float(origin_x), float(origin_y)
    pts = df.select(
        F.col(z).cast("double").alias("pz"),
        F.floor((F.col(x) - ox) / res).cast("long").alias("cell_i"),
        F.floor((F.col(y) - oy) / res).cast("long").alias("cell_j"),
    ).where(
        (F.col("cell_i") >= 0) & (F.col("cell_i") < width)
        & (F.col("cell_j") >= 0) & (F.col("cell_j") < height)
    )
    q = 1048576.0  # 2^20
    if deterministic:
        pts = pts.withColumn("pzq", F.round(F.col("pz") * q).cast("long"))
        pcol, mean_expr = "pzq", (
            F.sum("pzq").cast("double") / q / F.count(F.lit(1))
        )
    else:
        pcol, mean_expr = "pz", F.avg("pz")
    paggs = [
        (
            F.percentile(pcol, p / 100.0) / (q if deterministic else 1.0)
        ).alias(f"p{p}")
        for p in percentiles
    ]
    return pts.groupBy("cell_i", "cell_j").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("pz").alias("zmin"),
        F.max("pz").alias("zmax"),
        mean_expr.alias("zmean"),
        *paggs,
    )


def window_fill(
    cells: DataFrame,
    width: int,
    height: int,
    window_size: int,
    value_cols: tuple[str, ...] = ("zmean", "zidw"),
) -> DataFrame:
    """Fill empty grid cells from non-empty neighbors within a
    Chebyshev window, weighted 1/celldist (GDALGrid::windowFill).
    Returns the full dense grid (filled cells get cnt = 0)."""
    spark = cells.sparkSession
    grid = (
        spark.range(width).select(F.col("id").alias("cell_i"))
        .crossJoin(spark.range(height).select(F.col("id").alias("cell_j")))
    )
    dense = grid.join(cells, on=["cell_i", "cell_j"], how="left")
    empty = dense.where(F.col("cnt").isNull()).select("cell_i", "cell_j")
    offs = [
        (di, dj)
        for di in range(-window_size, window_size + 1)
        for dj in range(-window_size, window_size + 1)
        if not (di == 0 and dj == 0)
    ]
    pairs = empty.select(
        "cell_i", "cell_j",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cell_i") + di).alias("si"),
                        (F.col("cell_j") + dj).alias("sj"),
                        F.lit(float(max(abs(di), abs(dj)))).alias("cd"),
                    )
                    for di, dj in offs
                ]
            )
        ).alias("o"),
    ).select(
        "cell_i", "cell_j",
        F.col("o.si").alias("si"), F.col("o.sj").alias("sj"),
        F.col("o.cd").alias("cd"),
    )
    src = cells.select(
        F.col("cell_i").alias("si"), F.col("cell_j").alias("sj"),
        *[F.col(c).alias(f"src_{c}") for c in value_cols],
    )
    joined = pairs.join(src, on=["si", "sj"])
    aggs = [
        (
            F.sum(F.col(f"src_{c}") / F.col("cd"))
            / F.sum(1.0 / F.col("cd"))
        ).alias(c)
        for c in value_cols
    ]
    filled = joined.groupBy("cell_i", "cell_j").agg(*aggs).withColumn(
        "cnt", F.lit(0).cast("long")
    )
    return dense.where(F.col("cnt").isNotNull()).unionByName(
        filled, allowMissingColumns=True
    )


def raster_to_points(
    spark: SparkSession,
    cells: DataFrame,
    resolution: float,
    origin_x: float,
    origin_y: float,
    width: int,
    height: int,
    bands: tuple[str, ...] = ("zmean",),
) -> DataFrame:
    """readers.gdal analog (GDALReader.cpp:134-143): one point per
    grid cell (count = width*height), X/Y at cell centers, one column
    per band; cells absent from `cells` yield null bands."""
    grid = (
        spark.range(width).select(F.col("id").alias("cell_i"))
        .crossJoin(spark.range(height).select(F.col("id").alias("cell_j")))
    )
    out = grid.join(
        cells.select("cell_i", "cell_j", *bands),
        on=["cell_i", "cell_j"], how="left",
    )
    return out.withColumn(
        "x", origin_x + (F.col("cell_i") + 0.5) * float(resolution)
    ).withColumn(
        "y", origin_y + (F.col("cell_j") + 0.5) * float(resolution)
    )


def colorize(
    df: DataFrame,
    raster: list[list[float]],
    resolution: float,
    origin_x: float,
    origin_y: float,
    x: str = "lon",
    y: str = "lat",
    out: str = "band_1",
    scale: float = 1.0,
) -> DataFrame:
    """filters.colorization analog (ColorizationFilter.cpp:202):
    sample a (small) raster at each point as a BROADCAST HASH JOIN
    against the raster's cell table — pure Catalyst (cell ids via
    floor arithmetic, JVM codegen), no Python evaluator, and the
    raster ships once per executor instead of riding a UDF closure
    per task. Points never shuffle. Out-of-raster points sample NaN
    (the reference's no-data). Rasters too big to broadcast belong
    in a raster TABLE joined via raster_to_points instead."""
    arr = np.asarray(raster, dtype=np.float64)  # [row=j][col=i]
    h, w = arr.shape
    cells = df.sparkSession.createDataFrame(
        [
            (i, j, float(arr[j, i]) * scale)
            for j in range(h)
            for i in range(w)
        ],
        "__ci int, __cj int, __rv double",
    )
    pts = df.withColumn(
        "__ci",
        F.floor(
            (F.col(x) - F.lit(float(origin_x)))
            / F.lit(float(resolution))
        ).cast("int"),
    ).withColumn(
        "__cj",
        F.floor(
            (F.col(y) - F.lit(float(origin_y)))
            / F.lit(float(resolution))
        ).cast("int"),
    )
    joined = pts.join(F.broadcast(cells), on=["__ci", "__cj"],
                      how="left")
    return joined.withColumn(
        out, F.coalesce(F.col("__rv"), F.lit(float("nan")))
    ).drop("__ci", "__cj", "__rv")


def dem_filter(
    df: DataFrame,
    raster: list[list[float]],
    resolution: float,
    origin_x: float,
    origin_y: float,
    limits: tuple[float, float],
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
) -> DataFrame:
    """filters.dem (DEMFilter.cpp): keep rows whose `z` is within
    [dem+limits[0], dem+limits[1]] of the sampled surface."""
    tmp = colorize(
        df, raster, resolution, origin_x, origin_y, x=x, y=y, out="__dem"
    )
    keep = (F.col(z) >= F.col("__dem") + float(limits[0])) & (
        F.col(z) <= F.col("__dem") + float(limits[1])
    )
    return tmp.where(keep).drop("__dem")


def hag_dem(
    df: DataFrame,
    raster: list[list[float]],
    resolution: float,
    origin_x: float,
    origin_y: float,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    out: str = "height_above_ground",
) -> DataFrame:
    """filters.hag_dem (HagDemFilter.cpp): HAG = z - DEM(x, y)."""
    tmp = colorize(
        df, raster, resolution, origin_x, origin_y, x=x, y=y, out="__dem"
    )
    return tmp.withColumn(out, F.col(z) - F.col("__dem")).drop("__dem")


HAG_Z_Q = 1000  # millis — the house quantized-elevation convention


def hag_nn(
    df: DataFrame,
    count: int = 1,
    cell: float = 8.0,
    ground_class: int = 2,
    max_distance: float = 0.0,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    cls: str = "classification",
    id_col: str = "pid",
) -> DataFrame:
    """filters.hag_nn (HagNnFilter.cpp:127-205): height above ground
    from the k=count nearest GROUND-classified points in 2D.

    Reference semantics: ground rows get HAG = 0; a non-ground row
    whose nearest ground point shares its exact x/y (dist == 0), or
    when count == 1, takes that point's z as ground (z1 = z_nn1);
    otherwise z1 = IDW over the count neighbors with w = 1/d^2
    (neighbor_interp_ground, HagNnFilter.cpp:49-71), dropping
    neighbors beyond max_distance when set (> 0); if every neighbor
    is dropped, z1 = z0 (HAG = 0). HAG = z0 - z1.

    Fixed point: neighbor z in mills, w_q = floor(IDW_W_Q/d^2) capped
    — the idw_at_points convention, so the fold is exact under any
    partitioning and the mm output hash-compares against a pairwise
    SQL oracle. Output: df columns + hag_mm (bigint) + hag (double).

    Scale: one knn_join (supercell cogrouped kernel, top-k-only
    shuffle) + one map-side-combined groupBy; ground table typically
    ~half the input — same partitioning as the join.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.knn import knn_join

    is_ground = F.col(cls) == int(ground_class)
    zq = (
        f"cast(floor(cast(`{z}` as double)"
        f" * {G.fnum(float(HAG_Z_Q))} + {G.fnum(0.5)}) as bigint)"
    )
    ground = df.where(is_ground).withColumn("__zq", F.expr(zq))
    nong = df.where(~is_ground)
    nn = knn_join(
        nong, ground, k=int(count), cell=cell, x=x, y=y,
        id_left=id_col, id_right=id_col,
        right_cols=["__zq"], include_self=True,
    )
    in_range = (
        "true" if max_distance <= 0
        else f"dist * dist <= {G.fnum(float(max_distance) ** 2)}"
    )
    wq = (
        f"CASE WHEN NOT ({in_range}) THEN cast(0 as bigint)"
        f" WHEN dist = 0.0e0 THEN cast({IDW_W_CAP} as bigint)"
        f" ELSE least(cast({IDW_W_CAP} as bigint),"
        f" cast(floor({G.fnum(float(IDW_W_Q))} / (dist * dist))"
        " as bigint)) END"
    )
    agg = (
        nn.withColumn("__wq", F.expr(wq))
        .groupBy(F.col("src_id").alias(id_col))
        .agg(
            F.min(F.when(F.col("nn_rank") == 1, F.col("dist")))
            .alias("__d1"),
            F.min(F.when(F.col("nn_rank") == 1, F.col("nb___zq")))
            .alias("__z1q"),
            F.sum(F.expr("__wq * nb___zq")).alias("__num"),
            F.sum("__wq").alias("__den"),
        )
    )
    z0q = F.expr(zq)
    ground_zq = (
        F.when(F.col("__z1q").isNull(), z0q)
        .when((F.col("__d1") == 0.0) | F.lit(int(count) == 1),
              F.col("__z1q"))
        .when(F.col("__den") > 0, F.expr("__num div __den"))
        .otherwise(z0q)
    )
    # LEFT join: a non-ground point with no ground neighbor at all
    # (empty ground class, or beyond the join's reach) falls through
    # every branch to z1 = z0 -> hag 0, the reference's no-neighbor
    # rule — it must NOT silently vanish from the output
    out_ng = (
        nong.join(agg, on=id_col, how="left")
        .withColumn("hag_mm", z0q - ground_zq)
        .drop("__d1", "__z1q", "__num", "__den")
    )
    out_g = ground.drop("__zq").withColumn("hag_mm", F.lit(0).cast("long"))
    return (
        out_ng.unionByName(out_g)
        .withColumn(
            "hag",
            F.col("hag_mm").cast("double") / float(HAG_Z_Q),
        )
    )


def kde_rasterize(
    df: DataFrame,
    resolution: float,
    origin_x: float,
    origin_y: float,
    width: int,
    height: int,
    bandwidth: float,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Kernel-density-estimate surface (heatmap): each point spreads
    an Epanechnikov kernel w = 1 - (d/h)^2 over every cell center
    within bandwidth h — the same quadrant-walk update pattern as
    writers.gdal's radius rasterization (GDALGrid.cpp:224-274) with
    a distance-weighted kernel instead of raw z. Epanechnikov (not
    gaussian) keeps the arithmetic IEEE-exact: one subtract, one
    multiply, one divide — no exp()/libm, so the oracle hash-compares
    bit-for-bit.

    Kernel weights accumulate in 2^20 fixed point (order-independent
    sums, the deterministic-rasterize convention). Plan shape:
    row-local explode of ~(2k+1)^2 candidate offsets, one map-side-
    combined hash aggregate on (cell_i, cell_j); the grid never
    materializes on the driver. Output:
    (cell_i, cell_j, n_points, density).
    """
    res, ox, oy = float(resolution), float(origin_x), float(origin_y)
    h = float(bandwidth)
    k = int(math.ceil(h / res))
    base_i = F.floor((F.col(x) - ox) / res).cast("long")
    base_j = F.floor((F.col(y) - oy) / res).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in range(-k, k + 1)
            for dj in range(-k, k + 1)
        ]
    )
    pts = df.select(
        F.col(x).alias("px"), F.col(y).alias("py"),
        base_i.alias("bi"), base_j.alias("bj"),
        F.explode(offsets).alias("o"),
    )
    cells = pts.select(
        "px", "py",
        (F.col("bi") + F.col("o.di")).alias("cell_i"),
        (F.col("bj") + F.col("o.dj")).alias("cell_j"),
    )
    cx = ox + (F.col("cell_i") + 0.5) * res
    cy = oy + (F.col("cell_j") + 0.5) * res
    d2 = (cx - F.col("px")) * (cx - F.col("px")) + (
        cy - F.col("py")
    ) * (cy - F.col("py"))
    w = F.lit(1.0) - d2 / F.lit(h * h)
    q = 1048576.0
    wq = F.round(w * q).cast("long")
    contrib = cells.withColumn("__wq", wq).where(
        (d2 < F.lit(h * h))
        & (F.col("cell_i") >= 0) & (F.col("cell_i") < int(width))
        & (F.col("cell_j") >= 0) & (F.col("cell_j") < int(height))
    )
    return contrib.groupBy("cell_i", "cell_j").agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.sum("__wq").cast("double") / F.lit(q)).alias("density"),
    )


IDW_W_Q = 1 << 20
IDW_W_CAP = 1 << 30
IDW_V_Q = 1000


def idw_at_points(
    queries: DataFrame,
    samples: DataFrame,
    radius: float,
    value: str = "value",
    x: str = "lon",
    y: str = "lat",
    id_query: str = "qid",
    id_sample: str = "sid",
) -> DataFrame:
    """Inverse-distance-weighted interpolation at ARBITRARY probe
    points (writers.gdal's IDW update pattern, decoupled from the
    raster grid — the "estimate the field here" query): for each
    query point, idw = sum(w_i * v_i) / sum(w_i) over samples within
    `radius`, w = 1/d^2. Integer fixed point end to end: w_q =
    floor(IDW_W_Q / d2) capped (coincident samples dominate, as they
    should), v_q = value mills — the fold is exact under any
    partitioning. Output: (qid, n_samples, idw_q = weighted value in
    mills, idw as double).

    Scale: rides the cell-bucketed radius_join (two narrow shuffles);
    the weighted fold is one map-side-combined groupBy on the query.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.knn import radius_join

    sm = samples.withColumn(
        "__vq",
        F.expr(
            f"cast(floor(cast(`{value}` as double)"
            f" * {G.fnum(float(IDW_V_Q))} + {G.fnum(0.5)}) as bigint)"
        ),
    )
    pairs = radius_join(
        queries, sm, radius, x=x, y=y,
        id_left=id_query, id_right=id_sample,
        right_cols=["__vq"], include_self=True,
    )
    wq = (
        f"CASE WHEN dist = 0.0e0 THEN cast({IDW_W_CAP} as bigint)"
        f" ELSE least(cast({IDW_W_CAP} as bigint),"
        f" cast(floor({G.fnum(float(IDW_W_Q))} / (dist * dist))"
        " as bigint)) END"
    )
    agg = (
        pairs.withColumn("__wq", F.expr(wq))
        .groupBy(F.col("src_id").alias(id_query))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.expr("__wq * nb___vq")).alias("__num"),
            F.sum("__wq").alias("__den"),
        )
        .where(F.col("__den") > 0)
    )
    return agg.select(
        id_query, "n_samples",
        F.expr("__num div __den").alias("idw_q"),
        F.expr(
            "cast(__num div __den as double)"
            f" / {G.fnum(float(IDW_V_Q))}"
        ).alias("idw"),
    )


FOCAL_Q = 1 << 20


def focal_mean(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """3x3 focal mean over the cell lattice — the GIS smoothing
    convolution (writers.gdal's `window_size` fill generalized to a
    first-class raster op): per cell, the mean of its queen
    neighborhood INCLUDING itself, over observed cells only (the
    sparse-raster convention — absent cells contribute nothing).
    mean_q = (sum * FOCAL_Q) div n — exact integer fixed point.

    Scale: grid_disk ring<=1 explode + ONE hash join on the cell key
    over the cell AGGREGATE (same economics as morans_i/getis_ord).
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    nbrs = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).select("c", "nc")
    return (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("xv").alias("xj")),
            on="nc",
        )
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_nbrs"),
             F.sum("xj").alias("nbr_sum"))
        .select(
            F.col("c").alias(cell), "n_nbrs", "nbr_sum",
            F.expr(f"(nbr_sum * {FOCAL_Q}) div n_nbrs").alias(
                "mean_q"
            ),
        )
    )


def focal_gradient(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Central-difference gradient over the cell lattice (the
    slope/aspect kernel of terrain analysis, on any cell-aggregated
    field — density, elevation, dwell time): gx2 = E - W, gy2 = N - S
    (x2 fixed point: no division, exact ints; magnitude/aspect are
    the caller's sqrt/atan2). Cells missing a neighbor on either side
    of an axis emit NULL for that axis (one-sided differences would
    bias the boundary — the standard nodata rule).

    Scale: two 1-offset neighbor joins on the cell key over the
    AGGREGATE (E/W and N/S resolved from one grid_disk ring).
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    disk = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    )
    # recover the (dx, dy) offset of each neighbor from the packed ids
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_n, iy_n = G.qcell_deconstruct("nc", G.SPARK)
    n = 1 << res
    tagged = disk.select(
        "c", "nc",
        F.expr(
            f"cast(pmod(({ix_n}) - ({ix_c}) + {n // 2}, {n})"
            f" as int) - {n // 2}"
        ).alias("dx"),
        F.expr(f"cast(({iy_n}) - ({iy_c}) as int)").alias("dy"),
    )
    j = tagged.join(
        base.select(F.col("c").alias("nc"), F.col("xv").alias("xj")),
        on="nc",
    )
    agg = j.groupBy("c").agg(
        F.max(F.when((F.col("dx") == 1) & (F.col("dy") == 0),
                     F.col("xj"))).alias("e"),
        F.max(F.when((F.col("dx") == -1) & (F.col("dy") == 0),
                     F.col("xj"))).alias("w"),
        F.max(F.when((F.col("dx") == 0) & (F.col("dy") == 1),
                     F.col("xj"))).alias("n_"),
        F.max(F.when((F.col("dx") == 0) & (F.col("dy") == -1),
                     F.col("xj"))).alias("s"),
    )
    return agg.select(
        F.col("c").alias(cell),
        F.expr("e - w").alias("gx2"),
        F.expr("n_ - s").alias("gy2"),
    )


def focal_minmax(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """3x3 focal min and max over the cell lattice — grayscale
    EROSION and DILATION, the morphology primitives (filters.smrf's
    progressive opening is exactly erosion-then-dilation on its own
    grid; exposed here as first-class ops over ANY cell field, e.g.
    despeckling a density surface before boundary extraction).
    Observed-cells-only neighborhoods (sparse-raster convention).

    Scale: one grid_disk ring explode + ONE hash join over the cell
    AGGREGATE — identical economics to focal_mean.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    nbrs = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).select("c", "nc")
    return (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("xv").alias("xj")),
            on="nc",
        )
        .groupBy("c")
        .agg(
            F.min("xj").alias("eroded"),
            F.max("xj").alias("dilated"),
        )
        .withColumnRenamed("c", cell)
    )


def hillshade_expr(
    azimuth_deg: float, altitude_deg: float, z_scale: float
) -> str:
    """The hillshade SQL chain over integer gx2/gy2 columns — ONE
    shared string for the operator and its oracle. The only trig is
    Python-side (light-vector components become plan literals):
    L = (sinZ sinAz, sinZ cosAz, cosZ), normal ∝ (-p, -q, 1), shade
    = max(0, L·n) with p = z_scale*gx2/2, q = z_scale*gy2/2."""
    import math

    from pdal_spark import sqlgen as G

    zen = math.radians(90.0 - float(altitude_deg))
    az = math.radians(float(azimuth_deg))
    lx = G.fnum(math.sin(zen) * math.sin(az))
    ly = G.fnum(math.sin(zen) * math.cos(az))
    lz = G.fnum(math.cos(zen))
    k = G.fnum(float(z_scale) / 2.0)
    p = f"({k} * cast(gx2 as double))"
    q = f"({k} * cast(gy2 as double))"
    raw = (
        f"(({lz} - {lx} * {p} - {ly} * {q})"
        f" / sqrt(1.0e0 + {p} * {p} + {q} * {q}))"
    )
    return (
        "CASE WHEN gx2 IS NULL OR gy2 IS NULL THEN NULL"
        f" ELSE greatest(0.0e0, {raw}) END"
    )


def hillshade(
    cells: DataFrame,
    res: int,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_scale: float = 1.0,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """gdaldem-hillshade analog over the cell lattice (the classic
    terrain-visualization derivative of the writers.gdal raster
    family): illumination of the surface whose height field is any
    cell-aggregated value (elevation, density, dwell). Boundary
    cells with an undefined central-difference gradient emit NULL
    (nodata), matching focal_gradient's rule.

    Output: (cell, shade round 9 in [0,1], shade255 int).

    Scale: focal_gradient's two 1-offset neighbor joins over the
    aggregate; the shading itself is row-local codegen (+,*,/,sqrt
    — deterministic IEEE; trig happened in Python).
    """
    g = focal_gradient(cells, res, cell, value)
    sh = hillshade_expr(azimuth_deg, altitude_deg, z_scale)
    return g.select(
        cell,
        F.expr(f"round({sh}, 9)").alias("shade"),
        F.expr(
            f"cast(floor(({sh}) * 255e0 + 0.5e0) as int)"
        ).alias("shade255"),
    )


def aspect_octant_sql(u: str, v: str) -> str:
    """Integer octant (0=E,1=NE,...,7=SE) of the nonzero integer
    vector (u, v) — pure comparisons, engine-exact; NULL when both
    components are zero (flat) or either is NULL."""
    return f"""CASE
      WHEN {u} IS NULL OR {v} IS NULL THEN NULL
      WHEN {u} = 0 AND {v} = 0 THEN NULL
      WHEN {u} > 0 AND {v} >= 0 AND {v} < {u} THEN 0
      WHEN {v} > 0 AND {u} > 0 AND {u} <= {v} THEN 1
      WHEN {v} > 0 AND {u} <= 0 AND -({u}) < {v} THEN 2
      WHEN {u} < 0 AND {v} > 0 AND {v} <= -({u}) THEN 3
      WHEN {u} < 0 AND {v} <= 0 AND -({v}) < -({u}) THEN 4
      WHEN {v} < 0 AND {u} < 0 AND -({u}) <= -({v}) THEN 5
      WHEN {v} < 0 AND {u} >= 0 AND {u} < -({v}) THEN 6
      ELSE 7 END"""


def slope_aspect(
    cells: DataFrame,
    res: int,
    z_scale: float = 1.0,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """gdaldem-slope/aspect analog over the cell lattice. Slope is
    emitted as the TANGENT (sqrt(p^2 + q^2) — no atan, whose last
    ulps differ across engines; the angle is the caller's atan).
    Aspect is the integer OCTANT of the steepest-descent direction
    (0=E counterclockwise to 7=SE; NULL on flats/boundaries) —
    exact comparisons, no trig at all.

    Output: (cell, slope_tan round 9, octant int).
    """
    from pdal_spark import sqlgen as G

    g = focal_gradient(cells, res, cell, value)
    k = G.fnum(float(z_scale) / 2.0)
    p = f"({k} * cast(gx2 as double))"
    q = f"({k} * cast(gy2 as double))"
    slope = (
        "CASE WHEN gx2 IS NULL OR gy2 IS NULL THEN NULL"
        f" ELSE round(sqrt({p} * {p} + {q} * {q}), 9) END"
    )
    octant = aspect_octant_sql("(-gx2)", "(-gy2)")
    return g.select(
        cell,
        F.expr(slope).alias("slope_tan"),
        F.expr(f"cast({octant} as int)").alias("octant"),
    )


def contour_case_exprs(iso: float) -> tuple[str, dict]:
    """Marching-squares expression builder shared by
    :func:`contour_segments` and its oracle. Over columns ix, iy
    (ints) and v00, v10, v01, v11 (corner values, castable to
    double) it returns (case_id_expr, coords) where coords maps
    (seg_idx, endpoint, axis) -> a CASE chain yielding the segment
    coordinate in lattice units or NULL when that (case, seg) emits
    nothing. iso must NOT be attainable by the integer field (use a
    .5 value) so strict comparisons never hit a zero denominator.
    """
    from pdal_spark import sqlgen as G

    i = G.fnum(float(iso))
    vd = {c: f"cast({c} as double)" for c in
          ("v00", "v10", "v01", "v11")}
    tb = f"(({i} - {vd['v00']}) / ({vd['v10']} - {vd['v00']}))"
    tr = f"(({i} - {vd['v10']}) / ({vd['v11']} - {vd['v10']}))"
    tt = f"(({i} - {vd['v01']}) / ({vd['v11']} - {vd['v01']}))"
    tl = f"(({i} - {vd['v00']}) / ({vd['v01']} - {vd['v00']}))"
    edge = {
        "b": (f"(ix + {tb})", "(iy + 0.0e0)"),
        "r": ("(ix + 1.0e0)", f"(iy + {tr})"),
        "t": (f"(ix + {tt})", "(iy + 1.0e0)"),
        "l": ("(ix + 0.0e0)", f"(iy + {tl})"),
    }
    center = (
        f"(({vd['v00']} + {vd['v10']} + {vd['v01']} + {vd['v11']})"
        " / 4.0e0)"
    )
    plain = {
        1: ("l", "b"), 2: ("b", "r"), 3: ("l", "r"),
        4: ("t", "r"), 6: ("b", "t"), 7: ("l", "t"),
        8: ("l", "t"), 9: ("b", "t"), 11: ("t", "r"),
        12: ("l", "r"), 13: ("b", "r"), 14: ("l", "b"),
    }
    # saddle resolution by the center average (the standard rule)
    saddle = {
        5: ((("l", "t"), ("b", "r")), (("l", "b"), ("t", "r"))),
        10: ((("l", "b"), ("t", "r")), (("l", "t"), ("b", "r"))),
    }
    case_id = (
        f"(cast({vd['v00']} > {i} as int)"
        f" + 2 * cast({vd['v10']} > {i} as int)"
        f" + 4 * cast({vd['v11']} > {i} as int)"
        f" + 8 * cast({vd['v01']} > {i} as int))"
    )
    coords = {}
    for s in (0, 1):
        for ep in (1, 2):
            for ax in (0, 1):
                whens = []
                for cid, (e1, e2) in plain.items():
                    if s == 1:
                        continue
                    e = e1 if ep == 1 else e2
                    whens.append(
                        f"WHEN case_id = {cid} THEN {edge[e][ax]}"
                    )
                for cid, (hi, lo) in saddle.items():
                    eh = hi[s][0] if ep == 1 else hi[s][1]
                    el = lo[s][0] if ep == 1 else lo[s][1]
                    whens.append(
                        f"WHEN case_id = {cid} THEN CASE WHEN"
                        f" {center} > {i} THEN {edge[eh][ax]}"
                        f" ELSE {edge[el][ax]} END"
                    )
                coords[(s, ep, ax)] = (
                    "CASE " + " ".join(whens) + " ELSE NULL END"
                )
    return case_id, coords


def contour_segments(
    cells: DataFrame,
    res: int,
    iso: float,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """gdal_contour analog: marching-squares iso-line segments over
    the sparse cell lattice (contours of density / elevation / dwell
    fields; the interpolating sibling of hexbin's dissolved binary
    boundary). Each 2x2 corner block with ALL four corners observed
    (sparse-raster nodata rule) classifies into the 16-case table;
    crossings interpolate linearly along edges; the two saddle cases
    resolve by the center average. iso must be non-attainable by the
    integer field (x.5) so strict comparisons are unambiguous and no
    crossed edge has a zero denominator.

    Output: (ix, iy, seg_idx, x1, y1, x2, y2) in lattice units
    (round 9; planar lattice — no antimeridian wrap, the raster
    convention).

    Scale: three 1-offset hash joins on integer lattice keys over
    the AGGREGATE (same family as focal_gradient), then row-local
    codegen'd CASE interpolation. Segments per cell <= 2.
    """
    from pdal_spark import sqlgen as G

    ixe, iye = G.qcell_deconstruct(cell, G.SPARK)
    base = cells.select(
        F.expr(ixe).cast("long").alias("ix"),
        F.expr(iye).cast("long").alias("iy"),
        F.col(value).cast("long").alias("v"),
    )

    def corner(nm, dx, dy):
        return base.select(
            (F.col("ix") - dx).alias("ix"),
            (F.col("iy") - dy).alias("iy"),
            F.col("v").alias(nm),
        )

    j = (
        base.withColumnRenamed("v", "v00")
        .join(corner("v10", 1, 0), on=["ix", "iy"])
        .join(corner("v01", 0, 1), on=["ix", "iy"])
        .join(corner("v11", 1, 1), on=["ix", "iy"])
    )
    case_id, coords = contour_case_exprs(iso)
    j = j.withColumn("case_id", F.expr(case_id))
    segs = j.join(
        j.sparkSession.createDataFrame(
            [(0,), (1,)], "seg_idx int"
        ),
        how="cross",
    )
    out = segs.select(
        "ix", "iy", "seg_idx",
        F.expr(f"round({coords[(0, 1, 0)]}, 9)").alias("__x1a"),
        F.expr(f"round({coords[(0, 1, 1)]}, 9)").alias("__y1a"),
        F.expr(f"round({coords[(0, 2, 0)]}, 9)").alias("__x2a"),
        F.expr(f"round({coords[(0, 2, 1)]}, 9)").alias("__y2a"),
        F.expr(f"round({coords[(1, 1, 0)]}, 9)").alias("__x1b"),
        F.expr(f"round({coords[(1, 1, 1)]}, 9)").alias("__y1b"),
        F.expr(f"round({coords[(1, 2, 0)]}, 9)").alias("__x2b"),
        F.expr(f"round({coords[(1, 2, 1)]}, 9)").alias("__y2b"),
    ).select(
        "ix", "iy", "seg_idx",
        F.when(F.col("seg_idx") == 0, F.col("__x1a"))
        .otherwise(F.col("__x1b")).alias("x1"),
        F.when(F.col("seg_idx") == 0, F.col("__y1a"))
        .otherwise(F.col("__y1b")).alias("y1"),
        F.when(F.col("seg_idx") == 0, F.col("__x2a"))
        .otherwise(F.col("__x2b")).alias("x2"),
        F.when(F.col("seg_idx") == 0, F.col("__y2a"))
        .otherwise(F.col("__y2b")).alias("y2"),
    )
    return out.where(F.col("x1").isNotNull())


# ---------------------------------------------------------------------------
# D8 hydrology over the cell lattice: flow direction + flow accumulation
# ---------------------------------------------------------------------------

D8_RT2_Q = 1482910  # floor(sqrt(2) * 2^20 + 0.5): diagonal-distance weight


def d8_code_sql(dx: str, dy: str) -> str:
    """ESRI D8 direction code from a unit grid offset (+dy = north):
    E=1 SE=2 S=4 SW=8 W=16 NW=32 N=64 NE=128. Identical text in both
    SQL dialects (the aspect_octant_sql convention)."""
    return (
        f"CASE WHEN ({dx}) = 1 AND ({dy}) = 0 THEN 1"
        f" WHEN ({dx}) = 1 AND ({dy}) = -1 THEN 2"
        f" WHEN ({dx}) = 0 AND ({dy}) = -1 THEN 4"
        f" WHEN ({dx}) = -1 AND ({dy}) = -1 THEN 8"
        f" WHEN ({dx}) = -1 AND ({dy}) = 0 THEN 16"
        f" WHEN ({dx}) = -1 AND ({dy}) = 1 THEN 32"
        f" WHEN ({dx}) = 0 AND ({dy}) = 1 THEN 64"
        f" ELSE 128 END"
    )


def flow_direction(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """D8 flow direction over the cell lattice (O'Callaghan & Mark
    1984 — the gdaldem/hydrology primitive the terrain family was
    missing): each cell drains to the steepest-descent neighbor of
    its queen neighborhood, diagonal drops divided by sqrt(2).

    Exact integer form: steepness is compared as
    drop * D8_RT2_Q (cardinal) vs drop * 2^20 (diagonal) — the
    cross-multiplied drop/dist ordering on the 2^-20 grid, all int64
    (drop <= 2^40 safe). Only strictly positive drops onto OBSERVED
    cells count (sparse-raster convention); ties break to the
    smallest direction code. Pits and flats emit d8 = 0 with
    down_cell = the cell itself (the self-loop convention keeps the
    column non-null — no NaN dtype hazards downstream).

    Scale: one 3x3 offset explode + ONE hash join on the cell key
    over the cell AGGREGATE + one per-cell window — the focal_mean
    economics.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.h3 import grid_disk
    from pyspark.sql import Window

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    )
    disk = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).where(F.col("ring") == 1)
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_n, iy_n = G.qcell_deconstruct("nc", G.SPARK)
    n = 1 << res
    tagged = disk.select(
        "c", "nc",
        F.expr(
            f"cast(pmod(({ix_n}) - ({ix_c}) + {n // 2}, {n})"
            f" as int) - {n // 2}"
        ).alias("dx"),
        F.expr(f"cast(({iy_n}) - ({iy_c}) as int)").alias("dy"),
    )
    cand = (
        tagged.join(base, on="c")
        .join(
            base.select(F.col("c").alias("nc"),
                        F.col("zv").alias("zn")),
            on="nc",
        )
        .where(F.col("zv") > F.col("zn"))
        .select(
            "c", "nc",
            (F.col("zv") - F.col("zn")).alias("drop"),
            F.expr(d8_code_sql("dx", "dy")).alias("d8c"),
            (
                (F.col("zv") - F.col("zn"))
                * F.expr(
                    f"CASE WHEN dx = 0 OR dy = 0 THEN {D8_RT2_Q}"
                    f" ELSE {FOCAL_Q} END"
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("c").orderBy(
        F.col("score").desc(), F.col("d8c").asc()
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c", "nc", "d8c", "drop")
    )
    return base.join(best, on="c", how="left").select(
        F.col("c").alias(cell),
        F.coalesce("d8c", F.lit(0)).cast("int").alias("d8"),
        F.coalesce("nc", F.col("c")).alias("down_cell"),
        F.coalesce("drop", F.lit(0)).cast("long").alias("zdrop"),
    )


def flow_accumulation(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 64,
    load: str | None = None,
    flow: DataFrame | None = None,
) -> DataFrame:
    """D8 flow accumulation: per cell, the COUNT of upstream cells
    whose steepest-descent path drains through it (ESRI convention —
    the cell itself excluded; acc = 0 on ridges). Watersheds,
    channel extraction, and drainage-area thresholds all read off
    this surface.

    With `load` set (an integer column of `cells`), accumulates the
    upstream LOAD instead of the count — acc(v) = sum of
    (load_u + acc_u) over in-edges — the pollutant-budget / traffic-
    volume form (r.watershed's `flow` weighting).

    The D8 graph is functional and strictly downhill (drop > 0), so
    it is acyclic and accumulation satisfies
    acc(v) = sum over in-edges u->v of (1 + acc(u)) — iterated as a
    frontier-free Bellman-Ford-style fixpoint: each round is ONE
    edge hash join + ONE hash aggregate over the |cells|-row edge
    table; converged when the total stops rising (the total is
    monotone). Rounds = longest flow-path length (tiny on real
    terrain); lineage rides as localCheckpoints (repo-wide iterative
    convention) and a loud warning fires on a forced exit.
    """
    import warnings

    fd = (flow if flow is not None
          else flow_direction(cells, res, cell=cell, value=value))
    e = fd.where(F.col("d8") != 0).select(
        F.col(cell).alias("u"), F.col("down_cell").alias("v")
    )
    if load is not None:
        e = e.join(
            cells.select(F.col(cell).alias("u"),
                         F.col(load).cast("long").alias("ld")),
            on="u",
        )
    else:
        e = e.withColumn("ld", F.lit(1).cast("long"))
    edges = e.localCheckpoint(eager=False)
    acc = fd.select(
        F.col(cell).alias("c"), F.lit(0).cast("long").alias("acc")
    ).localCheckpoint(eager=False)
    prev_total = -1
    for _ in range(max_rounds):
        pushed = (
            edges.join(
                acc.select(F.col("c").alias("u"), "acc"), on="u"
            )
            .groupBy("v")
            .agg(F.sum(F.col("acc") + F.col("ld")).alias("up"))
        )
        acc = (
            acc.select("c").join(
                pushed.select(F.col("v").alias("c"), "up"),
                on="c", how="left",
            )
            .select("c", F.coalesce("up", F.lit(0)).alias("acc"))
            .localCheckpoint(eager=False)
        )
        total = acc.agg(F.sum("acc")).collect()[0][0]
        if total == prev_total:
            break
        prev_total = total
    else:
        warnings.warn(
            f"flow_accumulation: not converged in {max_rounds} "
            "rounds (flow path longer than max_rounds); counts "
            "below the true accumulation on the unfinished paths",
            stacklevel=2,
        )
    return acc.select(F.col("c").alias(cell), "acc")


def watershed_label(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 40,
    flow: DataFrame | None = None,
) -> DataFrame:
    """D8 watershed delineation: label every cell with the terminal
    PIT its steepest-descent path drains into (gdaldem / r.watershed
    basin analog) — the per-basin key for zonal rollups of drainage
    area, pollutant budgets, or per-catchment page clustering.

    The D8 pointer graph is functional with self-loops exactly at
    pits, so the basin label is the pointer-graph fixpoint — reached
    by POINTER DOUBLING: p' = p(p(.)), each round ONE self hash-join
    on the cell key, converging in ceil(log2(longest path)) rounds
    (vs path-length rounds for naive following). Convergence is
    detected when a round changes nothing (pits' self-loops make
    doubling idempotent at the fixpoint). Lineage rides as
    localCheckpoints (repo iterative convention).
    """
    import warnings

    fd = (flow if flow is not None
          else flow_direction(cells, res, cell=cell, value=value))
    p = fd.select(
        F.col(cell).alias("c"), F.col("down_cell").alias("nxt")
    ).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        p2 = (
            p.alias("a")
            .join(
                p.select(F.col("c").alias("nxt"),
                         F.col("nxt").alias("nxt2")).alias("b"),
                on="nxt",
            )
            .select("c", F.col("nxt2").alias("nxt"))
            .localCheckpoint(eager=False)
        )
        changed = (
            p2.join(p.select("c", F.col("nxt").alias("old")), on="c")
            .where(F.col("nxt") != F.col("old"))
            .limit(1)
            .count()
        )
        p = p2
        if changed == 0:
            break
    else:
        warnings.warn(
            f"watershed_label: not converged in {max_rounds} "
            "doubling rounds (flow path longer than 2^rounds)",
            stacklevel=2,
        )
    return p.select(F.col("c").alias(cell), F.col("nxt").alias("basin"))


def terrain_indices(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Classic terrain-shape indices over the 3x3 queen neighborhood
    (gdaldem TPI/TRI/roughness; Riley et al. 1999, Wilson & Gallant
    2000), sparse-raster convention (observed neighbors only):

      tpi_q    = z*Q - (sum(zn)*Q div n)   [z minus NEIGHBOR mean,
                                            center excluded; 2^-20
                                            fixed point]
      tri_ssq  = sum((z - zn)^2)           [Riley TRI squared — the
                                            sqrt is monotone, kept
                                            integer-exact]
      rough    = max(z, zn...) - min(z, zn...)   [3x3 incl. center]

    All int64 (|z| <= 2^20 keeps tri_ssq under 2^63 at 8 neighbors).
    Scale: the focal_mean economics — ring-1 disk explode + ONE hash
    join + ONE hash aggregate; no window, no driver state.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    )
    nbrs = (
        grid_disk(base.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    joined = nbrs.join(
        base.select(F.col("c").alias("nc"), F.col("zv").alias("zn")),
        on="nc",
    ).join(base, on="c")
    agg = joined.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.sum("zn").alias("zn_sum"),
        F.sum((F.col("zv") - F.col("zn"))
              * (F.col("zv") - F.col("zn"))).alias("tri_ssq"),
        F.max("zn").alias("zn_max"),
        F.min("zn").alias("zn_min"),
    )
    return (
        base.join(agg, on="c", how="inner")
        .select(
            F.col("c").alias(cell),
            "n_nbrs",
            F.expr(
                f"zv * {FOCAL_Q} - (zn_sum * {FOCAL_Q}) div n_nbrs"
            ).alias("tpi_q"),
            F.col("tri_ssq"),
            (F.greatest("zn_max", "zv")
             - F.least("zn_min", "zv")).alias("rough"),
        )
    )


VIEW_SHIFT = 1 << 24  # |z - z0| bound making LOS slope numerators
#                       non-negative (Spark div truncates toward 0,
#                       DuckDB // floors — they agree only there)


def viewshed_transect(
    cells: DataFrame,
    res: int,
    origin: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Line-of-sight viewshed along the 8 D8 transects from an
    origin cell (the r.los / gdal viewshed primitive restricted to
    the cardinal + diagonal rays, where LOS is exactly 1-D): a cell
    at Chebyshev distance d on a ray is VISIBLE iff its sight-line
    slope from the origin is >= every nearer ray cell's slope —
    i.e. slope >= running max. Unobserved cells are transparent
    (sparse-raster convention).

    Integer-exact slope ordering: slope_q(d) =
    ((z - z0 + VIEW_SHIFT*d) * Q) div d — the VIEW_SHIFT*d term
    keeps the numerator non-negative (floor == truncate there, so
    Spark `div` and DuckDB `//` agree) and adds the CONSTANT
    VIEW_SHIFT*Q to every slope, preserving order. |z| must stay
    under VIEW_SHIFT; products stay < 2^63 for d <= 2^15.

    Output: (cell, ray D8 code, d, slope_q, visible). Origin row
    excluded; the nearest cell of each ray is visible by definition.

    Scale: pure-Catalyst ray predicate off the qcell bit layout +
    ONE window per ray — no join at all. Ray parallelism is 8; at
    scale run per-origin batches (origins x rays partitions).
    """
    from pdal_spark import sqlgen as G
    from pyspark.sql import Window

    n = 1 << res
    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    )
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_o, iy_o = G.qcell_deconstruct(str(int(origin)), G.SPARK)
    rays = base.select(
        "c", "zv",
        F.expr(
            f"cast(pmod(({ix_c}) - ({ix_o}) + {n // 2}, {n})"
            f" as bigint) - {n // 2}"
        ).alias("dx"),
        F.expr(f"cast(({iy_c}) - ({iy_o}) as bigint)").alias("dy"),
    ).where(
        ((F.col("dx") != 0) | (F.col("dy") != 0))
        & ((F.col("dx") == 0) | (F.col("dy") == 0)
           | (F.abs("dx") == F.abs("dy")))
    )
    zo = base.where(F.col("c") == int(origin)).select(
        F.col("zv").alias("z0")
    )
    scored = rays.crossJoin(F.broadcast(zo)).select(
        "c",
        F.expr(d8_code_sql("sign(dx)", "sign(dy)")).cast("int")
        .alias("ray"),
        F.greatest(F.abs("dx"), F.abs("dy")).alias("d"),
        F.expr(
            f"((zv - z0 + {VIEW_SHIFT} * greatest(abs(dx), abs(dy)))"
            f" * {FOCAL_Q}) div greatest(abs(dx), abs(dy))"
        ).alias("slope_q"),
    )
    w = (
        Window.partitionBy("ray").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return scored.select(
        F.col("c").alias(cell), "ray", "d", "slope_q",
        (F.col("slope_q")
         >= F.coalesce(F.max("slope_q").over(w),
                       F.lit(-(1 << 62)))).alias("visible"),
    )


def cost_distance(
    cells: DataFrame,
    res: int,
    sources: list[int],
    cell: str = "cell",
    value: str = "x",
    rounds: int = 48,
) -> DataFrame:
    """Multi-source least-cost distance over the 8-connected cell
    lattice with per-cell friction (GRASS r.cost / ArcGIS
    CostDistance): the accumulated cost to the cheapest source,
    where stepping u -> v costs avg(f_u, f_v) * step_length.
    Unobserved cells are barriers (sparse-raster convention).

    Integer-exact scaling: returned dist is 2 * 2^20 x the classic
    value — cardinal edge = (f_u + f_v) * FOCAL_Q, diagonal =
    (f_u + f_v) * D8_RT2_Q (= the same *2Q with the sqrt(2) folded
    in on the 2^-20 grid). A constant positive factor preserves all
    orderings/paths; everything stays int64 (friction sums < 2^40).

    Scale: ONE ring-1 explode + two friction joins build the edge
    table; the relaxation is graph.weighted_sssp's frontier
    Bellman-Ford — per round only improved cells re-join, integer
    mins bit-reproducible. `rounds` >= max hop count of any least-
    cost path makes it exact (monotone — extra rounds are no-ops).

    Output: (seed, cell, dist) per reachable cell.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.graph import weighted_sssp
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("fv")
    )
    disk = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).where(F.col("ring") == 1)
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_n, iy_n = G.qcell_deconstruct("nc", G.SPARK)
    n = 1 << res
    tagged = disk.select(
        "c", "nc",
        F.expr(
            f"cast(pmod(({ix_n}) - ({ix_c}) + {n // 2}, {n})"
            f" as int) - {n // 2}"
        ).alias("dx"),
        F.expr(f"cast(({iy_n}) - ({iy_c}) as int)").alias("dy"),
    )
    edges = (
        tagged.join(base, on="c")
        .join(base.select(F.col("c").alias("nc"),
                          F.col("fv").alias("fn")), on="nc")
        .select(
            F.col("c").alias("src"), F.col("nc").alias("dst"),
            (
                (F.col("fv") + F.col("fn"))
                * F.expr(
                    f"CASE WHEN dx = 0 OR dy = 0 THEN {FOCAL_Q}"
                    f" ELSE {D8_RT2_Q} END"
                )
            ).alias("w"),
        )
    )
    out = weighted_sssp(edges, sources=sources, rounds=rounds,
                        weight="w")
    return out.select("seed", F.col("node").alias(cell), "dist")


def strahler_order(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    rounds: int = 12,
    flow: DataFrame | None = None,
) -> DataFrame:
    """Strahler stream order over the D8 drainage tree (Strahler
    1957 — the stream-magnitude hierarchy: headwaters = 1, two
    merging order-k streams make k+1): per cell, the order induced
    by its upstream children (cells draining INTO it) —

        order(v) = 1                      (no children)
                 = mx + 1                 (>= 2 children at mx)
                 = mx                     (one child at mx)

    iterated update-all from all-ones: order is MONOTONE
    nondecreasing and stabilizes at the true Strahler order after
    depth(tree) rounds; with a fixed `rounds` budget the result is
    exact whenever rounds >= drainage depth (extra rounds are
    no-ops — the weighted_sssp fixed-budget convention).

    Scale: per round ONE child-order hash join + ONE max agg + ONE
    count-at-max join over the |cells|-row edge table; lineage cut
    per round.
    """
    fd = (flow if flow is not None
          else flow_direction(cells, res, cell=cell, value=value))
    edges = (
        fd.where(F.col("d8") != 0)
        .select(F.col(cell).alias("u"), F.col("down_cell").alias("v"))
        .localCheckpoint(eager=False)
    )
    allc = fd.select(F.col(cell).alias("c")).localCheckpoint(
        eager=False)
    o = allc.select("c", F.lit(1).cast("long").alias("ord"))
    for _ in range(int(rounds)):
        child = edges.join(
            o.select(F.col("c").alias("u"), "ord"), on="u"
        ).select(F.col("v").alias("c"), "ord")
        mx = child.groupBy("c").agg(F.max("ord").alias("mx"))
        cnt = (
            child.join(mx, on="c")
            .where(F.col("ord") == F.col("mx"))
            .groupBy("c")
            .agg(F.count(F.lit(1)).alias("cm"))
        )
        o = (
            allc.join(mx, on="c", how="left")
            .join(cnt, on="c", how="left")
            .select(
                "c",
                F.when(F.col("mx").isNull(), F.lit(1))
                .when(F.col("cm") >= 2, F.col("mx") + 1)
                .otherwise(F.col("mx")).cast("long").alias("ord"),
            )
            .localCheckpoint(eager=False)
        )
    return o.select(F.col("c").alias(cell), F.col("ord").alias("order"))


FILL_INF = 1 << 40  # "flooded from infinity" start level


def fill_depressions(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 64,
) -> DataFrame:
    """Depression filling (Priority-Flood; Barnes et al. 2014 — the
    hydrology PREPROCESSING step: raise every interior pit to its
    spill level so D8 drainage reaches the raster edge instead of
    terminating in spurious pits).

    The serial priority-queue algorithm has a clean distributed
    FIXPOINT: with boundary cells pinned at their own elevation,

        F(v) = max(z(v), min over queen neighbors n of F(n))

    iterated from F = +inf on interior cells. F is MONOTONE
    NONINCREASING and converges to the spill-level surface in at
    most lattice-diameter rounds (each round ONE hash join + ONE
    min agg + one max vs z). Boundary = cells with < 8 observed
    neighbors (the sparse-raster edge — water escapes through
    unobserved cells). Convergence is detected when the total stops
    falling; lineage cut per round, loud warning on a forced exit.

    Output: (cell, z, fill) with fill >= z; fill > z exactly on
    filled depressions.
    """
    import warnings

    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    ).localCheckpoint(eager=False)
    nbrs = (
        grid_disk(base.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .join(base.select(F.col("c").alias("nc")), on="nc")
        .select("c", "nc")
        .localCheckpoint(eager=False)
    )
    deg = nbrs.groupBy("c").agg(F.count(F.lit(1)).alias("n_obs"))
    fl = (
        base.join(deg, on="c", how="left")
        .select(
            "c", "zv",
            F.when(F.coalesce("n_obs", F.lit(0)) < 8, F.col("zv"))
            .otherwise(F.lit(FILL_INF)).cast("long").alias("f"),
        )
        .localCheckpoint(eager=False)
    )
    prev_total = None
    for _ in range(int(max_rounds)):
        nmin = (
            nbrs.join(fl.select(F.col("c").alias("nc"),
                                F.col("f").alias("fn")), on="nc")
            .groupBy("c")
            .agg(F.min("fn").alias("nm"))
        )
        fl = (
            fl.join(nmin, on="c", how="left")
            .select(
                "c", "zv",
                F.greatest(
                    "zv", F.least("f", F.coalesce("nm", F.col("f")))
                ).alias("f"),
            )
            .localCheckpoint(eager=False)
        )
        total = fl.agg(F.sum("f")).collect()[0][0]
        if total == prev_total:
            break
        prev_total = total
    else:
        warnings.warn(
            f"fill_depressions: not converged in {max_rounds} "
            "rounds; interior fills may still be above spill level",
            stacklevel=2,
        )
    return fl.select(F.col("c").alias(cell), F.col("zv").alias("z"),
                     F.col("f").alias("fill"))


def cost_path_tree(
    cells: DataFrame,
    res: int,
    source: int,
    cell: str = "cell",
    value: str = "x",
    rounds: int = 48,
) -> DataFrame:
    """Least-cost PREDECESSOR TREE from one source over the friction
    lattice — the distributed route artifact: pred(v) is the
    neighbor u whose settled cost proves dist(v) (dist(u) + w(u,v)
    == dist(v), ties to the smallest u), so walking pred from ANY
    target yields its least-cost path in path-length steps while the
    tree itself is built with NO per-target work.

    Scale: cost_distance's frontier Bellman-Ford + ONE edge join
    re-checking the optimality equation + one per-cell window.
    Output: (cell, dist, pred) with pred NULL exactly at the source.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.h3 import grid_disk
    from pyspark.sql import Window

    dist = cost_distance(cells, res, sources=[int(source)],
                         cell=cell, value=value, rounds=rounds)
    d = dist.select(F.col(cell).alias("c"), "dist")
    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("fv")
    )
    disk = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).where(F.col("ring") == 1)
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_n, iy_n = G.qcell_deconstruct("nc", G.SPARK)
    n = 1 << res
    tagged = disk.select(
        "c", "nc",
        F.expr(
            f"cast(pmod(({ix_n}) - ({ix_c}) + {n // 2}, {n})"
            f" as int) - {n // 2}"
        ).alias("dx"),
        F.expr(f"cast(({iy_n}) - ({iy_c}) as int)").alias("dy"),
    )
    edges = (
        tagged.join(base, on="c")
        .join(base.select(F.col("c").alias("nc"),
                          F.col("fv").alias("fn")), on="nc")
        .select(
            F.col("nc").alias("u"), F.col("c").alias("v"),
            (
                (F.col("fv") + F.col("fn"))
                * F.expr(
                    f"CASE WHEN dx = 0 OR dy = 0 THEN {FOCAL_Q}"
                    f" ELSE {D8_RT2_Q} END"
                )
            ).alias("w"),
        )
    )
    cand = (
        edges
        .join(d.select(F.col("c").alias("u"),
                       F.col("dist").alias("du")), on="u")
        .join(d.select(F.col("c").alias("v"),
                       F.col("dist").alias("dv")), on="v")
        .where(F.col("du") + F.col("w") == F.col("dv"))
    )
    w = Window.partitionBy("v").orderBy(F.col("u").asc())
    pred = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("v").alias("c"), F.col("u").alias("pred"))
    )
    return (
        d.join(pred, on="c", how="left")
        .select(F.col("c").alias(cell), "dist", "pred")
    )


def resolve_flats(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 32,
) -> DataFrame:
    """Flat-drainage resolution over a (typically filled) surface
    (Barnes et al. 2014 companion step): cells on a FLAT (no lower
    neighbor, at least one equal-height neighbor) get a direction
    toward the flat's spill exits — BFS hop distance to the nearest
    cell that drains (computed over the equal-height adjacency),
    each flat cell draining to its equal-height neighbor with the
    smallest distance (ties to the smallest D8 code). Composed with
    fill_depressions + flow_direction this makes every non-true-pit
    cell drain, which TerrainJob's watershed/accumulation stages
    need for physically meaningful basins.

    Output: flow_direction's schema with flats resolved — d8 = the
    chosen code, down_cell = the chosen neighbor, zdrop = 0 on
    resolved flats. True pits (no equal, no lower neighbor, or flats
    with NO reachable exit) keep the self-loop.

    Scale: flow_direction + per-round ONE equal-height-edge join +
    min agg (rounds = flat diameter, usually tiny); lineage cut per
    round.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.h3 import grid_disk
    from pyspark.sql import Window

    fd = flow_direction(cells, res, cell=cell, value=value)
    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    )
    disk = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).where(F.col("ring") == 1)
    ix_c, iy_c = G.qcell_deconstruct("c", G.SPARK)
    ix_n, iy_n = G.qcell_deconstruct("nc", G.SPARK)
    n = 1 << res
    eq_edges = (
        disk.join(base, on="c")
        .join(base.select(F.col("c").alias("nc"),
                          F.col("zv").alias("zn")), on="nc")
        .where(F.col("zv") == F.col("zn"))
        .select(
            "c", "nc",
            F.expr(d8_code_sql(
                f"cast(pmod(({ix_n}) - ({ix_c}) + {n // 2}, {n})"
                f" as int) - {n // 2}",
                f"cast(({iy_n}) - ({iy_c}) as int)",
            )).cast("int").alias("d8c"),
        )
        .localCheckpoint(eager=False)
    )
    # exits: cells that already drain (d8 != 0)
    dist = (
        fd.where(F.col("d8") != 0)
        .select(F.col(cell).alias("c"), F.lit(0).cast("long")
                .alias("bd"))
        .localCheckpoint(eager=False)
    )
    for _ in range(int(max_rounds)):
        nxt = (
            eq_edges.join(
                dist.select(F.col("c").alias("nc"), "bd"), on="nc"
            )
            .groupBy("c")
            .agg((F.min("bd") + 1).alias("bd"))
        )
        merged = (
            dist.unionByName(nxt)
            .groupBy("c")
            .agg(F.min("bd").alias("bd"))
            .localCheckpoint(eager=False)
        )
        if merged.count() == dist.count():
            dist = merged
            break
        dist = merged
    # each flat cell -> equal neighbor with min bd (tie: min d8c)
    cand = (
        fd.where(F.col("d8") == 0)
        .select(F.col(cell).alias("c"))
        .join(eq_edges, on="c")
        .join(dist.select(F.col("c").alias("nc"), "bd"), on="nc")
    )
    w = Window.partitionBy("c").orderBy(
        F.col("bd").asc(), F.col("d8c").asc()
    )
    pick = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c", F.col("nc").alias("fnc"),
                F.col("d8c").alias("fd8"))
    )
    return (
        fd.join(pick, on=fd[cell] == F.col("c"), how="left")
        .select(
            fd[cell],
            F.coalesce(F.when(fd["d8"] == 0, F.col("fd8")),
                       fd["d8"]).cast("int").alias("d8"),
            F.coalesce(F.when(fd["d8"] == 0, F.col("fnc")),
                       fd["down_cell"]).alias("down_cell"),
            fd["zdrop"],
        )
    )


def channel_network(
    cells: DataFrame,
    res: int,
    acc_threshold: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 64,
) -> DataFrame:
    """Stream/channel network extraction (O'Callaghan & Mark 1984
    step 3): the D8 edges whose UPSTREAM endpoint has flow
    accumulation >= acc_threshold — the drainage-network vector
    layer (rivers from a DEM; demand corridors from a density
    surface).

    Scale: flow_accumulation + ONE semi-join + ONE edge projection.
    Output: (cell, down_cell, acc) — one row per channel edge.
    """
    fd = flow_direction(cells, res, cell=cell, value=value)
    acc = flow_accumulation(cells, res, cell=cell, value=value,
                            max_rounds=max_rounds)
    return (
        fd.where(F.col("d8") != 0)
        .join(acc, on=cell)
        .where(F.col("acc") >= int(acc_threshold))
        .select(cell, "down_cell", "acc")
    )


def focal_weighted(
    cells: DataFrame,
    res: int,
    weights: tuple[int, ...] = (4, 2, 1),
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Ring-weighted focal smoothing — the discrete-Gaussian
    generalization of focal_mean's 3x3 box: neighbor values weighted
    by integer ring weights (weights[r] for Chebyshev ring r,
    k = len(weights) - 1), sparse-raster convention.

        wsum   = sum over observed disk cells of w_ring * x
        wtot   = sum of applied weights
        wmean_q = (wsum * FOCAL_Q) div wtot   [exact fixed point]

    Scale: ONE grid_disk(k) explode + ONE hash join over the cell
    AGGREGATE + ONE agg — focal_mean economics at (2k+1)^2 fan-out.
    """
    from pdal_spark.operators.h3 import grid_disk

    k = len(weights) - 1
    wcase = "CASE " + " ".join(
        f"WHEN ring = {r} THEN {int(wgt)}"
        for r, wgt in enumerate(weights)
    ) + " END"
    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    nbrs = grid_disk(
        base.select("c"), "c", res=res, k=k, out="nc",
        ring_out="ring",
    )
    return (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("xv").alias("xn")), on="nc",
        )
        .select("c", F.expr(wcase).alias("w"), "xn")
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.col("w") * F.col("xn")).alias("wsum"),
            F.sum("w").alias("wtot"),
        )
        .select(
            F.col("c").alias(cell), "n_terms", "wsum", "wtot",
            F.expr(f"(wsum * {FOCAL_Q}) div wtot").alias("wmean_q"),
        )
    )


def isochrone_cells(
    cells: DataFrame,
    res: int,
    sources: list[int],
    band_q: int,
    n_bands: int,
    cell: str = "cell",
    value: str = "x",
    rounds: int = 48,
) -> DataFrame:
    """Isochrone banding over the friction lattice: every cell
    reachable under n_bands * band_q accumulated cost, labeled with
    its cost band (band = dist div band_q) — the service-area /
    reachability-contour artifact (drive-time rings; crawl-budget
    reach from seed hosts).

    Scale: cost_distance's frontier Bellman-Ford + ONE row-local
    projection; band edges are exact integer divisions of the
    2*2^20-scaled cost.
    """
    d = cost_distance(cells, res, sources=sources, cell=cell,
                      value=value, rounds=rounds)
    bq = int(band_q)
    return (
        d.where(F.col("dist") < bq * int(n_bands))
        .select(
            "seed", cell, "dist",
            F.expr(f"dist div {bq}").cast("int").alias("band"),
        )
    )


def distance_transform(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    max_rounds: int = 32,
) -> DataFrame:
    """Chebyshev distance transform over the cell lattice: for every
    cell of the bounding region (the grid_disk(max_rounds) envelope
    of the OCCUPIED set), the grid distance to the nearest occupied
    cell — coverage-gap mapping, largest-empty-site selection, and
    the morphology base under dilation by r.

    On the Chebyshev metric the ring number of grid_disk IS the
    distance, so the transform is ONE (2k+1)^2 offset explode + ONE
    min aggregate — no iteration at all. Cost is
    O(occupied x (2k+1)^2): right for moderate horizons (k <= ~32);
    beyond that, run the fill_depressions-style BFS fixpoint
    (per-round join) instead. Cells further than max_rounds from any
    occupied cell are not emitted — the documented horizon. Exact
    integers, bit-reproducible.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(F.col(cell).alias("c")).distinct()
    # candidate envelope: all cells within max_rounds of occupied
    env = (
        grid_disk(base, "c", res=res, k=int(max_rounds),
                  out="nc", ring_out="ring")
        .groupBy(F.col("nc").alias("c"))
        .agg(F.min("ring").alias("dt"))
    )
    return env.select(F.col("c").alias(cell),
                      F.col("dt").cast("long").alias("dt"))


def flow_path_length(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_rounds: int = 40,
) -> DataFrame:
    """Flow-path length to the terminal pit along the D8 pointer
    (r.stream.distance / ArcGIS FlowLength "downstream"): per cell,
    the number of steps its steepest-descent path takes to reach its
    basin's pit — time-of-concentration proxies and stream-distance
    normalization read off this surface.

    POINTER DOUBLING WITH ADDITIVE CARRY (the watershed_label
    machinery, plus a distance): maintain (next, len); each round
    composes (next', len') = (next(next), len + len(next)) — the
    path collapses in ceil(log2(length)) rounds of ONE self
    hash-join each; pits' self-loops contribute len 0, so the sum
    stabilizes at the true path length. Lineage cut per round.
    """
    import warnings

    fd = flow_direction(cells, res, cell=cell, value=value)
    p = fd.select(
        F.col(cell).alias("c"), F.col("down_cell").alias("nxt"),
        F.when(F.col("d8") != 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("ln"),
    ).localCheckpoint(eager=False)
    for _ in range(int(max_rounds)):
        p2 = (
            p.alias("a")
            .join(
                p.select(F.col("c").alias("nxt"),
                         F.col("nxt").alias("nxt2"),
                         F.col("ln").alias("ln2")).alias("b"),
                on="nxt",
            )
            .select("c", F.col("nxt2").alias("nxt"),
                    (F.col("ln") + F.col("ln2")).alias("ln"))
            .localCheckpoint(eager=False)
        )
        changed = (
            p2.join(p.select("c", F.col("ln").alias("old")), on="c")
            .where(F.col("ln") != F.col("old"))
            .limit(1)
            .count()
        )
        p = p2
        if changed == 0:
            break
    else:
        warnings.warn(
            f"flow_path_length: not converged in {max_rounds} "
            "doubling rounds",
            stacklevel=2,
        )
    return p.select(F.col("c").alias(cell),
                    F.col("ln").alias("path_len"),
                    F.col("nxt").alias("outlet"))


def basin_stats(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Per-basin elevation summary over the watershed labeling
    (the hypsometric rollup: basin area, relief, total mass) — the
    zonal-statistics composition every drainage analysis ends with.

    Scale: watershed_label's pointer doubling + ONE hash join + ONE
    hash aggregate.
    """
    lab = watershed_label(cells, res, cell=cell, value=value)
    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("zv")
    )
    return (
        lab.select(F.col(cell).alias("c"), "basin")
        .join(base, on="c")
        .groupBy("basin")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.min("zv").alias("z_min"),
            F.max("zv").alias("z_max"),
            F.sum("zv").alias("z_sum"),
            (F.max("zv") - F.min("zv")).alias("relief"),
        )
    )


def idw_loocv(
    samples: DataFrame,
    radius: float,
    value: str = "value",
    x: str = "lon",
    y: str = "lat",
    id_col: str = "sid",
) -> DataFrame:
    """Leave-one-out cross-validation of IDW interpolation: each
    sample is re-estimated from its OTHER neighbors within `radius`
    and compared to its observed value — the model-selection /
    sensor-QA readout for the writers.gdal IDW family (is this
    radius/power actually predictive, which stations disagree with
    their neighborhood). Same fixed-point arithmetic as
    :func:`idw_at_points` (w_q = floor(IDW_W_Q / d^2) capped, values
    in mills), with the self-pair excluded by id.

    Output per sample with >= 1 in-radius neighbor: (sid, n_nbrs,
    loo_q, vq, err_q = |loo_q - vq|) — all exact int64. Isolated
    samples (no neighbor in radius) drop, documented: they have no
    LOO estimate.

    Scale: one cell-bucketed radius_join + one map-side-combined
    groupBy — never points^2.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.knn import radius_join

    sm = samples.withColumn(
        "__vq",
        F.expr(
            f"cast(floor(cast(`{value}` as double)"
            f" * {G.fnum(float(IDW_V_Q))} + {G.fnum(0.5)}) as bigint)"
        ),
    )
    pairs = radius_join(
        sm, sm, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=["__vq"], include_self=False,
    )
    wq = (
        f"CASE WHEN dist = 0.0e0 THEN cast({IDW_W_CAP} as bigint)"
        f" ELSE least(cast({IDW_W_CAP} as bigint),"
        f" cast(floor({G.fnum(float(IDW_W_Q))} / (dist * dist))"
        " as bigint)) END"
    )
    agg = (
        pairs.withColumn("__wq", F.expr(wq))
        .groupBy(F.col("src_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum(F.expr("__wq * nb___vq")).alias("__num"),
            F.sum("__wq").alias("__den"),
        )
        .where(F.col("__den") > 0)
        .withColumn("loo_q", F.expr("__num div __den"))
    )
    return (
        agg.join(sm.select(id_col, "__vq"), on=id_col)
        .select(
            id_col, "n_nbrs", "loo_q",
            F.col("__vq").alias("vq"),
            F.abs(F.col("loo_q") - F.col("__vq")).alias("err_q"),
        )
    )


def bilinear_at_points(
    cells: DataFrame,
    points: DataFrame,
    sub: int = 1000,
    cell_x: str = "gx",
    cell_y: str = "gy",
    value: str = "z",
) -> DataFrame:
    """Bilinear interpolation of a gridded field at query points —
    the raster-sampling sibling of idw_at_points (idw samples from
    scattered points; this samples from a LATTICE, the writers.gdal
    inverse: raster values back onto point records, reference
    ColorizationFilter.cpp's band sampling).

    Points carry subcell-resolution integer coordinates (px, py) in
    units of 1/``sub`` cell: gx = px div sub, fx = px - gx*sub
    (coordinates must be non-negative — shift first; keeps div/%
    sign-trap-free). The interpolated value

        v_q = (sub-fx)(sub-fy) v00 + fx(sub-fy) v10
            + (sub-fx)fy v01 + fx fy v11

    is an EXACT int64 (|v| * sub^2 bound documented below); v is the
    one IEEE division v_q / sub^2. Points whose 2x2 neighborhood is
    incomplete are dropped (no extrapolation).

    Overflow bound: |v| * sub^2 * 4 < 2^63 -> |z| < 2.3e12 at the
    default sub=1000.

    Scale: 4 row-local corner keys per point (posexplode of a
    literal 2x2 offset array) + ONE hash equi-join against the cell
    table + ONE map-side-combined aggregate; grid cells join by key,
    never scanned per point.
    """
    pts = points.select(
        "*",
        F.expr(f"px div {int(sub)}").alias("__gx"),
        F.expr(f"py div {int(sub)}").alias("__gy"),
        F.expr(f"px % {int(sub)}").alias("__fx"),
        F.expr(f"py % {int(sub)}").alias("__fy"),
    )
    four = pts.select(
        "*",
        F.posexplode(
            F.expr("array(struct(0 as ox, 0 as oy),"
                   " struct(1 as ox, 0 as oy),"
                   " struct(0 as ox, 1 as oy),"
                   " struct(1 as ox, 1 as oy))")
        ).alias("__i", "__o"),
    ).select(
        "*",
        (F.col("__gx") + F.col("__o.ox")).alias("__cx"),
        (F.col("__gy") + F.col("__o.oy")).alias("__cy"),
        F.expr(
            f"(case when __o.ox = 0 then {int(sub)} - __fx"
            " else __fx end)"
            f" * (case when __o.oy = 0 then {int(sub)} - __fy"
            " else __fy end)"
        ).alias("__w"),
    ).drop("__i", "__o")
    g = cells.select(
        F.col(cell_x).alias("__cx"),
        F.col(cell_y).alias("__cy"),
        F.col(value).cast("long").alias("__v"),
    )
    keys = [c for c in points.columns]
    joined = four.join(g, on=["__cx", "__cy"])
    s2 = int(sub) * int(sub)
    return (
        joined.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.expr("__w * __v")).alias("v_q"),
        )
        .where(F.col("__n") == 4)
        .drop("__n")
        .withColumn(
            "v",
            F.expr(f"cast(v_q as double) / cast({s2} as double)"),
        )
    )


def focal_curvature(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Second-derivative focal terms over the cell lattice — the
    curvature kernel completing focal_gradient's first-derivative
    pair (Zevenbergen & Thorne 1987's D..I coefficients, kept in
    integer fixed point): ridge/valley and saddle detection on any
    cell-aggregated field.

        lap4  = E + W + N + S - 4*C          (4x the Laplacian)
        dxx   = E + W - 2*C,  dyy = N + S - 2*C
        dxy4  = NE + SW - NW - SE            (4x the cross term)

    All outputs exact int64 — NO division anywhere (the x4/x2
    scalings ride along like focal_gradient's x2 convention). Cells
    missing any of the 8 neighbors are dropped (interior-only, the
    standard DEM edge policy).

    Scale: one row-local explode of the 9 literal offsets + ONE hash
    aggregate on the center key — focal_mean's exact plan shape.
    """
    from pdal_spark import sqlgen as G

    ix, iy = G.qcell_deconstruct("__c", G.SPARK)
    n = 1 << int(res)
    nine = cells.select(
        F.col(cell).alias("__c"),
        F.col(value).cast("long").alias("__v"),
        F.posexplode(
            F.expr(
                "array(" + ", ".join(
                    f"struct({dx} as dx, {dy} as dy)"
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                ) + ")"
            )
        ).alias("__i", "__o"),
    ).select(
        # scatter each value to the 9 centers it contributes to;
        # x wraps around the antimeridian ((v+n)%n stays in range
        # since ix+dx >= -1), y does not (polar rows stay interior-
        # only; phantom iy=-1 centers can't collide with real ids)
        F.expr(
            G.qcell_pack(
                f"((({ix}) + __o.dx + {n}) % {n})",
                f"(({iy}) + __o.dy)",
                int(res),
            )
        ).alias("__ctr"),
        F.col("__o.dx").alias("dx"),
        F.col("__o.dy").alias("dy"),
        "__v",
    )
    return (
        nine.groupBy("__ctr")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.expr(
                    "case when dx = 0 and dy = 0 then -4 * __v"
                    " when dx * dy = 0 then __v else 0 end"
                )
            ).alias("lap4"),
            F.sum(
                F.expr(
                    "case when dy = 0 and dx <> 0 then __v"
                    " when dx = 0 and dy = 0 then -2 * __v"
                    " else 0 end"
                )
            ).alias("dxx"),
            F.sum(
                F.expr(
                    "case when dx = 0 and dy <> 0 then __v"
                    " when dx = 0 and dy = 0 then -2 * __v"
                    " else 0 end"
                )
            ).alias("dyy"),
            F.sum(
                F.expr(
                    "case when dx * dy = 1 then __v"
                    " when dx * dy = -1 then -__v else 0 end"
                )
            ).alias("dxy4"),
        )
        .where(F.col("__n") == 9)
        .select(
            F.col("__ctr").alias(cell),
            "lap4", "dxx", "dyy", "dxy4",
        )
    )


def dda_cells(
    segments: DataFrame,
    seg_id: str = "seg_id",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
) -> DataFrame:
    """Integer DDA line rasterization: the grid cells visited by
    each segment, one sample per major-axis step — the vector->
    raster conversion for LINES (writers.gdal handles points;
    faceraster_tin handles surfaces). Route coverage, corridor
    heatmaps, fiber/road cell budgets.

        steps = max(|dx|, |dy|)
        off_i = sign * ((2 * |d| * i + steps) div (2 * steps))

    — round-half-up of d*i/steps computed with NON-NEGATIVE operands
    only, so integer division is engine-identical (the div-vs-//
    negative-truncation trap never fires). Every step lands on or
    adjacent to the ideal line (classic DDA guarantee); zero-length
    segments emit their single cell. Output one row per (segment,
    step): (seg_id, step, cx, cy).

    Scale: fully row-local — one explode of sequence(0, steps) per
    segment, zero shuffle; steps is data-bounded (clip monster
    segments upstream).
    """
    base = segments.select(
        F.col(seg_id).alias("__sid"),
        F.col(x1).cast("long").alias("ax"),
        F.col(y1).cast("long").alias("ay"),
        F.col(x2).cast("long").alias("bx"),
        F.col(y2).cast("long").alias("by"),
    ).withColumn(
        "steps",
        F.expr("greatest(abs(bx - ax), abs(by - ay))"),
    )
    off = (
        "case when steps = 0 then 0 else"
        " (case when {d} >= 0 then 1 else -1 end)"
        " * ((2 * abs({d}) * i + steps) div (2 * steps)) end"
    )
    return base.select(
        F.col("__sid").alias(seg_id),
        F.expr("explode(sequence(0, steps))").alias("i"),
        "ax", "ay", "bx", "by", "steps",
    ).select(
        seg_id,
        F.col("i").alias("step"),
        F.expr("ax + " + off.format(d="(bx - ax)")).alias("cx"),
        F.expr("ay + " + off.format(d="(by - ay)")).alias("cy"),
    )


def line_density(
    segments: DataFrame,
    seg_id: str = "seg_id",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
) -> DataFrame:
    """Line-density raster: per grid cell, how many distinct
    segments pass through it and how many DDA samples land in it —
    the road-density / route-corridor readout over
    :func:`dda_cells`.

    Scale: the row-local DDA explode + ONE map-side-combined hash
    aggregate (distinct segment count via a (cell, seg) pre-dedup).
    """
    cells = dda_cells(segments, seg_id, x1, y1, x2, y2)
    per = cells.groupBy("cx", "cy", seg_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_samples")
    )
    return per.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("n_samples").alias("n_samples"),
    )


def route_profile(
    routes: DataFrame,
    cells: DataFrame,
    n: int = 8,
    sub: int = 1000,
    cell_x: str = "gx",
    cell_y: str = "gy",
    value: str = "z",
    lat1: str = "lat1",
    lon1: str = "lon1",
    lat2: str = "lat2",
    lon2: str = "lon2",
) -> DataFrame:
    """Terrain/field profile along great-circle routes — the classic
    "elevation along the flight path" product, composed from this
    repo's own operators: slerp waypoints
    (:func:`pdal_spark.operators.transform.route_waypoints`) sampled
    against a gridded field (:func:`bilinear_at_points`). Shows the
    engine's ops COMPOSE: the waypoint lon/lat (round(6), engine-
    identical) quantizes onto the lattice's 1/``sub`` subcell grid
    and feeds the bilinear kernel unchanged.

    The lattice is indexed by (gx, gy) with gx covering longitude
    [-180, 180) across the grid width and gy latitude [-90, 90) —
    px = floor((wlon + 180) * W * sub / 360) for a W-column grid
    (W/H derived from the cells table extents; pass a COMPLETE
    lattice — incomplete neighborhoods drop, the bilinear rule).

    Scale: route_waypoints' row-local explode + bilinear's 4-corner
    equi-join; nothing new shuffles.
    """
    from pdal_spark.operators.transform import route_waypoints

    ext = cells.agg(
        (F.max(cell_x) + 1).alias("w"),
        (F.max(cell_y) + 1).alias("h"),
    ).collect()[0]
    w_grid, h_grid = int(ext.w), int(ext.h)
    wp = route_waypoints(
        routes, n=n, lat1=lat1, lon1=lon1, lat2=lat2, lon2=lon2
    )
    pts = wp.select(
        "*",
        F.expr(
            f"cast(floor((wlon + 180.0e0) * {w_grid * sub}"
            " / 360.0e0) as bigint)"
        ).alias("px"),
        F.expr(
            f"cast(floor((wlat + 90.0e0) * {h_grid * sub}"
            " / 180.0e0) as bigint)"
        ).alias("py"),
    )
    return bilinear_at_points(
        cells, pts, sub=sub, cell_x=cell_x, cell_y=cell_y,
        value=value,
    )


def cut_fill(
    before: DataFrame,
    after: DataFrame,
    cell: str = "cell",
    value: str = "x",
    cell_area: float = 1.0,
) -> DataFrame:
    """Cut/fill volume change between two gridded surfaces (the
    gdal_calc / two-epoch-survey earthworks readout — writers.gdal's
    DEM diffed across time, the volumetric sibling of m3c2_compare):
    FULL-outer join the two cell grids (absent cell = 0), then

        cut  = sum max(0, z_before - z_after)   [material removed]
        fill = sum max(0, z_after - z_before)   [material added]

    Exact integer sums over quantized heights; volumes are the one
    multiplication by cell_area. Output one row: (n_cells, cut_q,
    fill_q, net_q, cut_vol, fill_vol).

    Scale: ONE hash full-outer join on the cell id (AQE-coalesced)
    + ONE fold — no neighborhood explode at all.
    """
    a = before.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("za"),
    )
    b = after.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("zb"),
    )
    j = a.join(b, on="c", how="full_outer").select(
        F.expr("coalesce(za, cast(0 as bigint))").alias("za"),
        F.expr("coalesce(zb, cast(0 as bigint))").alias("zb"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.expr("greatest(za - zb, cast(0 as bigint))"))
        .alias("cut_q"),
        F.sum(F.expr("greatest(zb - za, cast(0 as bigint))"))
        .alias("fill_q"),
    )
    ca = float(cell_area)
    return agg.select(
        "n_cells", "cut_q", "fill_q",
        F.expr("fill_q - cut_q").alias("net_q"),
        F.expr(f"cast(cut_q as double) * {ca!r}e0")
        .alias("cut_vol"),
        F.expr(f"cast(fill_q as double) * {ca!r}e0")
        .alias("fill_vol"),
    )


def focal_majority(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
    max_cat: int = 1024,
) -> DataFrame:
    """Focal majority (mode) filter over the 3x3 cell neighborhood —
    the categorical-raster smoother (gdal_sieve / ArcGIS Majority
    Filter shape) next to the numeric focal_mean/focal_minmax:
    each cell takes the most frequent category among its ring-1
    neighbors PRESENT in the grid (self included); ties break to
    the SMALLEST category (deterministic). Categories must be
    integers in [0, max_cat).

    The argmax encodes as one bounded int64 — votes * max_cat +
    (max_cat - 1 - cat) — so max() picks (most votes, smallest
    cat) in a single hash agg, no window.

    Scale: ring-1 explode (<= 9 rows/cell) + one equi-join on the
    neighbor id + TWO hash aggs — the focal_mean plan with an
    encoded max instead of a sum.
    """
    from pdal_spark.operators.h3 import grid_disk

    mc = int(max_cat)
    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("v"),
    )
    nbrs = grid_disk(
        base.select("c"), "c", res=res, k=1,
        out="nc", ring_out="ring",
    ).select("c", "nc")
    votes = (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("v").alias("nv")),
            on="nc",
        )
        .groupBy("c", "nv")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    enc = votes.select(
        "c",
        F.expr(
            f"votes * {mc} + ({mc} - 1 - nv)"
        ).alias("pick"),
    )
    out = enc.groupBy("c").agg(F.max("pick").alias("mx"))
    return out.select(
        "c",
        F.expr(f"{mc} - 1 - (mx % {mc})").alias("cat_maj"),
        F.expr(f"mx div {mc}").alias("n_votes"),
    )


def histogram_equalize(
    cells: DataFrame,
    cell: str = "cell",
    value: str = "x",
    levels: int = 256,
) -> DataFrame:
    """Histogram equalization of a gridded value (the gdaldem /
    image contrast-stretch primitive; colorinterp's rank-based
    sibling): each cell's value maps to its CDF level

        level = (c_prev * levels) div n

    where c_prev = number of cells with a strictly smaller value —
    ties share a level, output spans [0, levels). Exact integers
    throughout. Output: (cell, v, level).

    Scale: one distinct-value agg + prefix window over DISTINCT
    values (ks_test plan) + an equi-join back — never sorts the
    full grid.
    """
    from pyspark.sql import Window

    lv = int(levels)
    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("v"),
    )
    per = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    w_run = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per.withColumn(
        "cprev", F.sum("t").over(w_run) - F.col("t")
    ).withColumn("n", F.sum("t").over(
        w_run.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)))
    lvl = ranked.select(
        "v", F.expr(f"(cprev * {lv}) div n").alias("level")
    )
    return base.join(lvl, on="v").select("c", "v", "level")


def wetness_index(
    cells: DataFrame,
    res: int,
    z_scale: float = 1.0,
    cell: str = "cell",
    value: str = "x",
    min_tan: float = 0.001,
) -> DataFrame:
    """Topographic wetness index (Beven & Kirkby 1979) — THE
    saturation/soil-moisture proxy, composing the engine's two D8
    terrain primitives exactly as hydrology does:

        TWI = ln( (acc + 1) / max(tan beta, min_tan) )

    with acc the D8 flow accumulation (upslope cell count; +1 for
    the cell's own area) and tan beta the central-difference slope
    tangent (slope_aspect's round-9 value — re-used verbatim so the
    composed oracle IS the two oracles joined). Flats clamp at
    `min_tan` instead of diverging. ln is trig-family -> round(6)
    + 0.0 on both sides. Output: (cell, acc, slope_tan, twi_r).

    Scale: the two inputs' plans (recursive-free iterative D8 walk
    + one ring join) + ONE equi-join — nothing new shuffles.
    """
    from pdal_spark import sqlgen as G

    acc = flow_accumulation(cells, res, cell=cell, value=value)
    slp = slope_aspect(cells, res, z_scale=z_scale, cell=cell,
                       value=value).select(cell, "slope_tan")
    j = acc.join(slp, on=cell)
    mt = G.fnum(float(min_tan))
    return j.select(
        cell, "acc", "slope_tan",
        F.expr(
            "case when slope_tan is not null then"
            " round(ln((cast(acc as double) + 1.0e0)"
            f" / greatest(slope_tan, {mt})), 6) + 0.0e0 end"
        ).alias("twi_r"),
    )


def block_terrain_summary(
    cells: DataFrame,
    res: int,
    parent_res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Per-block terrain summary over parent cells (the multi-scale
    zonal view the focal terrain_indices cannot give): for each
    parent block at `parent_res`,

        relief = z_max - z_min
        hypso  = (z_mean - z_min) / relief   [hypsometric/
                 elevation-relief ratio: >0.5 young convex
                 terrain, <0.5 dissected]

    z_mean carried as the exact rational sum/n inside one IEEE
    chain. Output per block: (parent, n_cells, z_min, z_max,
    relief, hypso).

    Scale: one parent rollup (the cell_pyramid plan).
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.sqlgen import SPARK

    base = cells.select(
        F.expr(
            G.qcell_parent(cell, int(res), int(parent_res), SPARK)
        ).alias("parent"),
        F.col(value).cast("long").alias("z"),
    )
    agg = base.groupBy("parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
        F.sum("z").alias("z_sum"),
    )
    return agg.select(
        "parent", "n_cells", "z_min", "z_max",
        (F.col("z_max") - F.col("z_min")).alias("relief"),
        F.expr(
            "case when z_max > z_min then"
            " (cast(z_sum as double) / cast(n_cells as double)"
            " - cast(z_min as double))"
            " / cast(z_max - z_min as double) end"
        ).alias("hypso"),
    )


def threshold_area_share(
    cells: DataFrame,
    res: int,
    parent_res: int,
    thresholds: list[int],
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Share of each parent block's cells at-or-above an elevation
    /density threshold ladder (snow-line / floodable-area /
    coverage-above-cutoff per tile): exact integer counts per
    (block, threshold); the share one division. Output per
    (parent, thr): (parent, thr, n_cells, n_above, share).

    Scale: one parent rollup with a |thresholds| explode.
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.sqlgen import SPARK

    ts = sorted(int(t) for t in thresholds)
    base = cells.select(
        F.expr(
            G.qcell_parent(cell, int(res), int(parent_res), SPARK)
        ).alias("parent"),
        F.col(value).cast("long").alias("z"),
    )
    ladder = base.select(
        "parent", "z",
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("thr"),
    )
    agg = ladder.groupBy("parent", "thr").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(
            F.expr("case when z >= thr then 1 else 0 end")
        ).cast("long").alias("n_above"),
    )
    return agg.select(
        "parent", F.col("thr").cast("long").alias("thr"),
        "n_cells", "n_above",
        F.expr(
            "cast(n_above as double) / cast(n_cells as double)"
        ).alias("share"),
    )
