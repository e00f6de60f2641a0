"""Voxel / cell dedup-sampling ops (SURVEY.md §2.3).

The reference's voxel family keeps one representative point per grid
cell; all variants are one window or one agg+join in Spark:

- filters.voxeldownsize (VoxelDownsizeFilter.cpp:122-157): FIRST point
  per voxel. PDAL's "first" is scan order and its origin defaults to
  the first point (order-sensitive, SURVEY.md §7) -> we require an
  explicit origin and an explicit order column.
- filters.voxelcenternearestneighbor: point nearest the voxel center.
- filters.voxelcentroidnearestneighbor: point nearest the voxel
  centroid (two-phase agg like Spark's partial/final hash-agg).
- filters.elm (ELMFilter.cpp): flag lowest point per cell as noise if
  below the neighborhood by a threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _voxel_cols(df, dims, cell, origin):
    out = []
    for i, d in enumerate(dims):
        o = origin[i] if origin else 0.0
        out.append(
            F.floor((F.col(d) - F.lit(float(o))) / F.lit(float(cell)))
            .alias(f"__v{i}")
        )
    return out


def voxel_downsize(
    df: DataFrame,
    cell: float,
    dims: tuple[str, ...] = ("x", "y", "z"),
    order: str = "pid",
    origin: tuple[float, ...] | None = None,
    mode: str = "first",
) -> DataFrame:
    """One row per voxel: the first by `order` (mode='first') or with
    coordinates snapped to the voxel center (mode='center'),
    mirroring VoxelDownsizeFilter's two modes."""
    vox = _voxel_cols(df, dims, cell, origin)
    keyed = df.select("*", *vox)
    vnames = [f"__v{i}" for i in range(len(dims))]
    w = Window.partitionBy(*vnames).orderBy(F.col(order))
    kept = keyed.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    ).drop("__rn")
    if mode == "center":
        for i, d in enumerate(dims):
            o = float(origin[i]) if origin else 0.0
            kept = kept.withColumn(
                d, (F.col(f"__v{i}") + 0.5) * float(cell) + o
            )
    return kept.drop(*vnames)


def voxel_center_nn(
    df: DataFrame,
    cell: float,
    dims: tuple[str, ...] = ("x", "y", "z"),
    origin: tuple[float, ...] | None = None,
    order: str | None = None,
) -> DataFrame:
    """filters.voxelcenternearestneighbor: keep the point nearest the
    voxel center (deterministic tie-break on `order` if given)."""
    vox = _voxel_cols(df, dims, cell, origin)
    keyed = df.select("*", *vox)
    vnames = [f"__v{i}" for i in range(len(dims))]
    d2 = F.lit(0.0)
    for i, d in enumerate(dims):
        o = float(origin[i]) if origin else 0.0
        center = (F.col(f"__v{i}") + 0.5) * float(cell) + o
        d2 = d2 + (F.col(d) - center) * (F.col(d) - center)
    orders = [d2.asc()] + ([F.col(order)] if order else [])
    w = Window.partitionBy(*vnames).orderBy(*orders)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", *vnames)
    )


def voxel_centroid_nn(
    df: DataFrame,
    cell: float,
    dims: tuple[str, ...] = ("x", "y", "z"),
    origin: tuple[float, ...] | None = None,
    order: str | None = None,
) -> DataFrame:
    """filters.voxelcentroidnearestneighbor: two-phase — per-voxel
    centroid agg (map-side partial), then rank-1 by distance to it."""
    vox = _voxel_cols(df, dims, cell, origin)
    keyed = df.select("*", *vox)
    vnames = [f"__v{i}" for i in range(len(dims))]
    # decimal-routed mean: float avg is partial-agg-order dependent
    # (nondeterministic across partitionings); decimal sums are exact
    cents = keyed.groupBy(*vnames).agg(
        *[
            (
                F.sum(F.col(d).cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias(f"__c_{d}")
            for d in dims
        ]
    )
    joined = keyed.join(cents, on=vnames)
    d2 = F.lit(0.0)
    for d in dims:
        d2 = d2 + (F.col(d) - F.col(f"__c_{d}")) * (
            F.col(d) - F.col(f"__c_{d}")
        )
    orders = [d2.asc()] + ([F.col(order)] if order else [])
    w = Window.partitionBy(*vnames).orderBy(*orders)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", *vnames, *[f"__c_{d}" for d in dims])
    )


def elm(
    df: DataFrame,
    cell: float = 10.0,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    threshold: float = 1.0,
    noise_class: int = 7,
    cls: str = "classification",
) -> DataFrame:
    """filters.elm (ELMFilter.cpp): within each grid cell, the lowest
    point is noise if it sits more than `threshold` below the cell's
    second-lowest (extended local minimum test)."""
    vx = F.floor(F.col(x) / float(cell))
    vy = F.floor(F.col(y) / float(cell))
    keyed = df.withColumn("__vx", vx).withColumn("__vy", vy)
    w = Window.partitionBy("__vx", "__vy").orderBy(F.col(z).asc())
    ranked = keyed.withColumn("__rz", F.row_number().over(w)).withColumn(
        "__z2", F.lead(z).over(w)
    )
    is_noise = (
        (F.col("__rz") == 1)
        & F.col("__z2").isNotNull()
        & (F.col("__z2") - F.col(z) > threshold)
    )
    return (
        ranked.withColumn(
            cls, F.when(is_noise, noise_class).otherwise(F.col(cls))
        )
        .drop("__vx", "__vy", "__rz", "__z2")
    )


def grid_decimation(
    df: DataFrame,
    resolution: float,
    output_type: str = "max",
    assign_col: str = "classification",
    assign_value: int = 2,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    order: str = "pid",
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """filters.griddecimation (GridDecimationFilter.cpp:103-186):
    grid of `resolution` over the view bounds; in each cell the point
    with the max (or min) Z gets the assign statement applied
    (classification tagging of grid-extreme points); everything else
    passes through unchanged. Ties keep the FIRST point in view
    order (the reference only replaces on strict compare) — `order`
    pins that order deterministically.

    Scale shape: one global min-bounds aggregate (broadcast scalars),
    then a single per-cell window rank — no joins. The reference's
    division-edge adjustment (width-- / width++ when x lands exactly
    on a cell boundary, :114-118) is mirrored op-for-op so cell ids
    are bit-identical with the SQL oracle."""
    if output_type not in ("max", "min"):
        raise ValueError("output_type must be 'max' or 'min'")
    if bounds is None:
        b = df.agg(
            F.min(x).alias("minx"), F.min(y).alias("miny")
        ).collect()[0]
        minx, miny = float(b["minx"]), float(b["miny"])
    else:
        minx, miny = float(bounds[0]), float(bounds[1])
    r = float(resolution)

    def cell_of(c, mn):
        w0 = F.floor((F.col(c) - mn) / r)
        w1 = F.when(F.col(c) < mn + w0 * r, w0 - 1).otherwise(w0)
        return F.when(
            F.col(c) >= mn + (w1 + 1) * r, w1 + 1
        ).otherwise(w1).cast("long")

    if assign_col not in df.columns:
        # the reference assigns into a pre-registered dimension
        # (Classification defaults to 0); create it when absent
        df = df.withColumn(assign_col, F.lit(0))
    zo = F.col(z).desc() if output_type == "max" else F.col(z).asc()
    ranked = df.withColumn("__gx", cell_of(x, minx)).withColumn(
        "__gy", cell_of(y, miny)
    ).withColumn(
        "__gr",
        F.row_number().over(
            Window.partitionBy("__gx", "__gy").orderBy(
                zo, F.col(order).asc()
            )
        ),
    )
    return ranked.withColumn(
        assign_col,
        F.when(F.col("__gr") == 1, F.lit(assign_value))
        .otherwise(F.col(assign_col)),
    ).drop("__gx", "__gy", "__gr")
