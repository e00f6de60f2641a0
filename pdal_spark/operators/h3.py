"""Cell-index encoding ops — the filters.h3 analog.

Reference: filters/H3Filter.cpp:91-130 adds an ``H3:uint64`` dimension
= latLngToCell(lat, lng, resolution), requiring EPSG:4326 input
(:137-143). Our engine's cell index is the closed-form "qcell"
(pdal_spark.sqlgen) — hierarchical quadtree cell packed into int64 —
which is also THE partitioning key of the tile layout (SURVEY.md §7).

All ops here are pure Catalyst expressions: no shuffle, no Python,
fully pipelined into the scan by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def h3_encode(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    out: str = "h3_cell",
) -> DataFrame:
    """Add the cell-index column (filters.h3 analog)."""
    return df.withColumn(out, F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res)))


def h3_parent(
    df: DataFrame, cell: str, res: int, parent_res: int, out: str | None = None
) -> DataFrame:
    """Coarsen a cell column (H3 cellToParent analog) for rollups."""
    out = out or f"{cell}_r{parent_res}"
    return df.withColumn(
        out, F.expr(G.qcell_parent(f"`{cell}`", res, parent_res, _D))
    )


def h3_center(
    df: DataFrame, cell: str, res: int, lat_out: str = "cell_lat",
    lon_out: str = "cell_lon",
) -> DataFrame:
    return df.withColumn(
        lat_out, F.expr(G.qcell_center_lat(f"`{cell}`", res, _D))
    ).withColumn(lon_out, F.expr(G.qcell_center_lon(f"`{cell}`", res, _D)))


def morton_encode(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 26,
    out: str = "morton_key",
) -> DataFrame:
    """Z-order key (filters.mortonorder analog; MortonOrderFilter.cpp:217).

    Used as the physical clustering/sort key on write so parquet
    row-group min/max stats prune spatial range scans.
    """
    return df.withColumn(
        out, F.expr(G.morton_from_lonlat(f"`{lat}`", f"`{lon}`", res, _D))
    )


def geocode(
    df: DataFrame,
    id_col: str,
    lat_out: str = "lat",
    lon_out: str = "lon",
) -> DataFrame:
    """Deterministic geocode of an int64 id (FIXTURES.md F1 rule).

    Web pages -> point records: the engine's ingestion step. For
    string urls use geocode_url (xxhash64-based, Spark-side only).
    """
    return df.withColumn(
        lat_out, F.expr(G.geo_lat(f"`{id_col}`"))
    ).withColumn(lon_out, F.expr(G.geo_lon(f"`{id_col}`")))


def geocode_url(
    df: DataFrame,
    url_col: str = "url",
    lat_out: str = "lat",
    lon_out: str = "lon",
) -> DataFrame:
    """Geocode a string key via xxhash64 (JVM-side, no Python).

    Not oracle-checkable (DuckDB lacks xxhash64) — used by the real
    pages pipeline; correctness-gate queries use integer-id geocode.
    """
    # reduce into [0, 2^31-1) first: the Lehmer rounds multiply by
    # 48271 and ANSI int64 arithmetic overflows beyond ~1.9e14
    h = F.pmod(F.xxhash64(F.col(url_col)), F.lit(G.M31))
    df = df.withColumn("__gh", h)
    out = df.withColumn(
        lat_out, F.expr(G.geo_lat("`__gh`"))
    ).withColumn(lon_out, F.expr(G.geo_lon("`__gh`")))
    return out.drop("__gh")


def cell_pyramid(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    min_res: int = 2,
    max_res: int = 8,
) -> DataFrame:
    """Per-cell point counts at EVERY resolution in [min_res, max_res]
    from one pass — the resolution-pyramid that readers.copc/ept
    queries are pruned against (CopcReader.cpp:684-754 walks octree
    LEVELS; EptReader.cpp `resolution` option picks a depth): serving
    a `resolution=r` query from the pyramid is one metadata-pruned
    scan of the `res = r` slice.

    Scale: encode once at max_res (codegen'd arithmetic, no shuffle),
    explode the parent ladder (max_res-min_res+1 rows per point —
    bounded, column-pruned to one long), then ONE map-side-combined
    groupBy (res, cell). Partial aggregation eats the explode factor
    before the shuffle, so shuffled bytes are ~the distinct-cell
    count per level, not points x levels.
    """
    enc = h3_encode(df, lat, lon, res=max_res, out="__c")
    rungs = [
        F.struct(
            F.lit(r).alias("res"),
            F.expr(G.qcell_parent("`__c`", max_res, r, _D)).alias("cell"),
        )
        for r in range(min_res, max_res + 1)
    ]
    return (
        enc.select(F.explode(F.array(*rungs)).alias("rc"))
        .select("rc.res", "rc.cell")
        .groupBy("res", "cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def slippy_encode(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    zoom: int = 6,
    quantize: int = 2,
) -> DataFrame:
    """Web-mercator slippy-map tile encode: adds tile_x, tile_y,
    tile_morton, quadkey for the given zoom — the z/x/y + quadkey
    addressing that rasterized output (writers.gdal analog) is
    published under. `quantize` rounds the mercator y to that many
    decimals (default cm) before the tile floor so the index is
    reproducible across float libms; at any zoom <= 26 a tile edge is
    >= 0.6 m, so cm quantization never moves a point more than one
    ulp-adjacent boundary it was already on.

    Pure Catalyst arithmetic — no shuffle, pipelined into the scan;
    tile_morton is the clustering key for range-partitioned writes
    (same role as morton_order/hilbert for the qcell layout).
    """
    return (
        df.withColumn("tile_x", F.expr(G.slippy_tx(f"`{lon}`", zoom)))
        .withColumn(
            "tile_y", F.expr(G.slippy_ty(f"`{lat}`", zoom, _D, quantize))
        )
        .withColumn(
            "tile_morton",
            F.expr(G.morton_key("`tile_x`", "`tile_y`", _D)),
        )
        .withColumn(
            "quadkey",
            F.expr(G.quadkey_from_morton("`tile_morton`", zoom, _D)),
        )
    )


def geohash_encode(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    precision: int = 8,
    with_center: bool = False,
) -> DataFrame:
    """Geohash cell encode (filters.h3 stage pattern on the public
    base-32 grid; H3Filter.cpp:96-130 adds one cell dim per point the
    same way). Adds ``geohash_key`` (int64 bit form — the clustering
    / join / rollup key) and ``geohash`` (base-32 string — the
    interchange form). Geohash is a PREFIX code: ``substring(geohash,
    1, k)`` IS the precision-k cell, so coarser rollups and prefix
    range scans never re-encode (sqlgen.geohash_int notes).

    Pure Catalyst integer arithmetic — no shuffle, no Python,
    pipelined into the scan by whole-stage codegen; with_center adds
    the cell-center lat/lon from the same grid floor (no inverse
    interleave).
    """
    la, lo = f"`{lat}`", f"`{lon}`"
    out = df.withColumn(
        "geohash_key", F.expr(G.geohash_int(la, lo, precision, _D))
    ).withColumn(
        "geohash", F.expr(G.geohash_str("`geohash_key`", precision, _D))
    )
    if with_center:
        out = out.withColumn(
            "gh_lat", F.expr(G.geohash_center_lat(la, lo, precision))
        ).withColumn(
            "gh_lon", F.expr(G.geohash_center_lon(la, lo, precision))
        )
    return out


def slippy_pyramid(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    min_zoom: int = 2,
    max_zoom: int = 8,
    quantize: int = 2,
) -> DataFrame:
    """Per-tile point counts at EVERY zoom in [min_zoom, max_zoom]
    from one pass — the XYZ serving pyramid (each zoom's slice is the
    tile manifest a map server reads). A parent tile's morton key is
    the child's shifted right two bits per level, so the ladder is
    pure bit arithmetic on the max-zoom encode; one explode + one
    map-side-combined groupBy, the cell_pyramid pattern on the
    web-mercator grid.
    """
    enc = slippy_encode(df, lat, lon, zoom=max_zoom, quantize=quantize)
    rungs = [
        F.struct(
            F.lit(z).alias("zoom"),
            F.shiftright(
                F.col("tile_morton"), 2 * (max_zoom - z)
            ).alias("tile_morton"),
        )
        for z in range(min_zoom, max_zoom + 1)
    ]
    return (
        enc.select(F.explode(F.array(*rungs)).alias("zt"))
        .select("zt.zoom", "zt.tile_morton")
        .groupBy("zoom", "tile_morton")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
