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

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def h3_encode(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    out: str = "h3_cell",
    backend: str = "qcell",
) -> DataFrame:
    """Add the cell-index column (filters.h3 analog).

    backend:
      - "qcell" (default): the closed-form quadtree cell — pure
        Catalyst, oracle-able, THE tile-layout partitioning key.
      - "h3": GENUINE H3 ids (H3Filter.cpp:126 uint64 semantics) —
        via h3-py when importable, else the SPEC-DERIVED gnomonic
        forward (operators.h3geo — same ids, no dependency). Note
        H3 `res` is 0..15 hex levels, not the qcell 0..30 quadtree
        levels.
      - "spec": force the spec-derived kernel (vectorized numpy in
        an Arrow batch) even when h3-py is present.
      - "auto": "h3" ids when encoding for external interop, i.e.
        identical to "h3" now that the spec kernel removes the
        dependency — kept for call-site compatibility.
    """
    if backend not in ("qcell", "h3", "spec", "auto"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend != "qcell":
        from pdal_spark.operators import h3lib

        if backend != "spec" and h3lib.HAS_H3:
            return h3lib.h3_encode_lib(df, lat, lon, res, out)
        return h3lib.h3_encode_spec(df, lat, lon, res, out)
    return df.withColumn(out, F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res)))


def h3_parent(
    df: DataFrame, cell: str, res: int, parent_res: int,
    out: str | None = None, backend: str = "qcell",
) -> DataFrame:
    """Coarsen a cell column (H3 cellToParent analog) for rollups.
    backend="h3" operates on genuine H3 ids (see h3_encode)."""
    out = out or f"{cell}_r{parent_res}"
    if backend != "qcell":
        from pdal_spark.operators import h3lib

        if backend == "h3" or h3lib.HAS_H3:
            return h3lib.h3_parent_lib(df, cell, parent_res, out)
    return df.withColumn(
        out, F.expr(G.qcell_parent(f"`{cell}`", res, parent_res, _D))
    )


def h3_center(
    df: DataFrame, cell: str, res: int, lat_out: str = "cell_lat",
    lon_out: str = "cell_lon", backend: str = "qcell",
) -> DataFrame:
    if backend != "qcell":
        from pdal_spark.operators import h3lib

        if backend == "h3" or h3lib.HAS_H3:
            return h3lib.h3_center_lib(df, cell, lat_out, lon_out)
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


# ---------------------------------------------------------------------------
# Polygon -> covering cell set (H3 polygonToCells / compact /
# uncompact analogs) and the readers.copc/ept `polygon` pushdown
# (CopcReader.cpp:684-754 prunes octree nodes against a query
# polygon before reading; EptReader.cpp `polygon` option does the
# same on EPT tiles). In the qcell layout the same capability is a
# driver-computed covering cell list used as a partition-pruning
# IN-list / broadcast prefilter ahead of the exact PIP test.
# ---------------------------------------------------------------------------


def _grid_ix(lon: float, res: int) -> int:
    n = 1 << res
    return min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)


def _grid_iy(lat: float, res: int) -> int:
    n = 1 << res
    return min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)


def _poly_grid_bounds(
    rings: list[list[tuple[float, float]]], res: int
) -> tuple[int, int, int, int]:
    """(ix0, ix1, iy0, iy1) inclusive candidate-grid bounds of the
    polygon bbox at ``res`` (vertices are (lon, lat) pairs)."""
    lons = [v[0] for r in rings for v in r]
    lats = [v[1] for r in rings for v in r]
    return (
        _grid_ix(min(lons), res), _grid_ix(max(lons), res),
        _grid_iy(min(lats), res), _grid_iy(max(lats), res),
    )


def polyfill(
    spark: SparkSession,
    rings: list[list[tuple[float, float]]],
    res: int,
    out: str = "cell",
    backend: str = "qcell",
) -> DataFrame:
    """Covering cells of a polygon at ``res`` — H3 polygonToCells
    analog (center-containment rule, like H3's default mode); the
    inverse of hexbin's cells->boundary direction.

    Scale: the candidate grid is bbox-bounded and synthesized from
    ONE spark.range (no data scan, no cross join); the even-odd
    ray-cast over cell centers is codegen'd Catalyst arithmetic
    (sqlgen.raycast_pip), so the whole op is a single narrow stage
    whose row count is the bbox cell count, independent of any data
    table size.

    backend="h3": genuine H3 polygonToCells on the OUTER ring via the
    h3 library (holes not supported on that path).
    """
    if backend != "qcell":
        from pdal_spark.operators import h3lib

        if backend == "h3" or h3lib.HAS_H3:
            out_df = h3lib.polyfill_lib(spark, rings[0], res)
            return out_df.select(F.col("h3_cell").alias(out))
    ix0, ix1, iy0, iy1 = _poly_grid_bounds(rings, res)
    ny = iy1 - iy0 + 1
    g = spark.range((ix1 - ix0 + 1) * ny).select(
        F.expr(f"id div {ny} + {ix0}").alias("__ix"),
        F.expr(f"id % {ny} + {iy0}").alias("__iy"),
    )
    g = g.withColumn(
        "__clon", F.expr(G.ix_center_lon("`__ix`", res))
    ).withColumn("__clat", F.expr(G.iy_center_lat("`__iy`", res)))
    g = g.where(F.expr(G.raycast_pip("`__clon`", "`__clat`", rings)))
    return g.select(
        F.expr(G.qcell_pack("`__ix`", "`__iy`", res)).alias(out)
    )


def _py_raycast(px: float, py: float,
                rings: list[list[tuple[float, float]]]) -> bool:
    """Driver-side mirror of sqlgen.raycast_pip (same division-free
    even-odd form, same IEEE double ops)."""
    crossings = 0
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = (float(v) for v in ring[i])
            x2, y2 = (float(v) for v in ring[(i + 1) % n])
            if y1 == y2:
                continue
            if (y1 > py) != (y2 > py):
                lhs = (px - x1) * (y2 - y1)
                rhs = (py - y1) * (x2 - x1)
                if (lhs < rhs) == (y2 > y1):
                    crossings += 1
    return crossings % 2 == 1


def _seg_intersects_box(
    x1: float, y1: float, x2: float, y2: float,
    bx0: float, by0: float, bx1: float, by1: float,
) -> bool:
    """Closed segment vs closed axis-aligned box (slab clipping)."""
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x1 - bx0), (dx, bx1 - x1),
                 (-dy, y1 - by0), (dy, by1 - y1)):
        if p == 0.0:
            if q < 0.0:
                return False
            continue
        t = q / p
        if p < 0.0:
            if t > t1:
                return False
            t0 = max(t0, t)
        else:
            if t < t0:
                return False
            t1 = min(t1, t)
    return t0 <= t1


def polyfill_cells(
    rings: list[list[tuple[float, float]]],
    res: int,
    mode: str = "center",
) -> list[int]:
    """Driver-side covering cell list (the partition-pruning IN-list;
    coarse ``res`` keeps it small — res 7 is a 128x128 world grid).

    mode="center": H3 polygonToCells rule (cell center inside).
    mode="covering": conservative superset for pruning — center-in
    cells PLUS every cell whose closed bbox the boundary crosses,
    dilated by one ring so float boundary ties can never drop a
    matching point's cell. Guarantees: every point inside the polygon
    has its qcell in the list.
    """
    ix0, ix1, iy0, iy1 = _poly_grid_bounds(rings, res)
    dlon, dlat = 360.0 / (1 << res), 180.0 / (1 << res)
    cells: set[tuple[int, int]] = set()
    for ix in range(ix0, ix1 + 1):
        clon = (ix + 0.5) * dlon - 180.0
        for iy in range(iy0, iy1 + 1):
            clat = (iy + 0.5) * dlat - 90.0
            if _py_raycast(clon, clat, rings):
                cells.add((ix, iy))
            elif mode == "covering":
                bx0, by0 = ix * dlon - 180.0, iy * dlat - 90.0
                for ring in rings:
                    n = len(ring)
                    if any(
                        _seg_intersects_box(
                            ring[i][0], ring[i][1],
                            ring[(i + 1) % n][0], ring[(i + 1) % n][1],
                            bx0, by0, bx0 + dlon, by0 + dlat,
                        )
                        for i in range(n)
                    ):
                        cells.add((ix, iy))
                        break
    if mode == "covering":
        nmax = (1 << res) - 1
        dilated = set()
        for ix, iy in cells:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    jx, jy = ix + dx, iy + dy
                    if 0 <= jx <= nmax and 0 <= jy <= nmax:
                        dilated.add((jx, jy))
        cells = dilated
    base = res * (1 << G.QCELL_RES_SHIFT)
    return sorted(
        base + ix * (1 << G.QCELL_IX_SHIFT) + iy for ix, iy in cells
    )


def cell_compact(
    df: DataFrame, res: int, min_res: int = 0, cell: str = "cell"
) -> DataFrame:
    """H3 compact analog: replace every complete quadruple of sibling
    cells with their parent, recursively up to ``min_res``. Input is
    a set of cells at uniform ``res``; output is the equivalent
    minimal mixed-resolution set (resolution stays readable from the
    id — qcell packs it).

    Scale: per level, ONE map-side-combined groupBy over the
    (shrinking) cell set finds complete parents; survivors are
    removed with a broadcast anti-join (the complete-parent set is
    strictly smaller than the level's cell set / 4). res - min_res
    bounded levels, each a narrow agg on an already-small table.
    """
    levels: list[DataFrame] = []
    cur = df.select(F.col(cell).alias("cell"))
    for r in range(res, min_res, -1):
        withp = cur.withColumn(
            "__p", F.expr(G.qcell_parent("`cell`", r, r - 1, _D))
        )
        complete = (
            withp.groupBy("__p")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") == 4)
            .select("__p")
        )
        levels.append(
            withp.join(F.broadcast(complete), on="__p", how="left_anti")
            .select("cell")
        )
        cur = complete.select(F.col("__p").alias("cell"))
    levels.append(cur)
    out = levels[0]
    for x in levels[1:]:
        out = out.unionByName(x)
    return out


def cell_uncompact(
    df: DataFrame, to_res: int, cell: str = "cell"
) -> DataFrame:
    """H3 uncompact analog: expand a mixed-resolution cell set to the
    full set of ``to_res`` descendants (a res-r cell yields
    4^(to_res - r) children — exact inverse of cell_compact over a
    compacted set). Row-local explode of two bounded integer
    sequences; no shuffle.
    """
    ix, iy = G.qcell_deconstruct(f"`{cell}`", _D)
    r = G.qcell_res(f"`{cell}`", _D)
    e = (
        df.withColumn("__k", F.expr(f"{to_res} - {r}"))
        .withColumn("__ix", F.expr(ix))
        .withColumn("__iy", F.expr(iy))
        .withColumn(
            "__dx", F.explode(F.expr("sequence(0, shiftleft(1, __k) - 1)"))
        )
        .withColumn(
            "__dy", F.explode(F.expr("sequence(0, shiftleft(1, __k) - 1)"))
        )
    )
    child = G.qcell_pack(
        "(shiftleft(`__ix`, `__k`) + `__dx`)",
        "(shiftleft(`__iy`, `__k`) + `__dy`)",
        to_res,
    )
    return e.select(F.expr(child).alias(cell))


def zorder_key_col(
    df: DataFrame,
    cols: list[tuple[str, float, float]],
    bits: int = 8,
    out: str = "z_key",
) -> DataFrame:
    """Generic N-column Z-order clustering key (the multi-dimension
    generalization of morton_encode, which covers the 2D lat/lon
    case): `cols` is [(column, lo, hi), ...] with explicit bounds
    (the PDAL-style explicit-origin convention — no data-dependent
    scan, so plans and oracles are static). Sort or
    repartitionByRange on the result before writing and parquet/
    Iceberg min-max stats prune range predicates on every
    participating column at once — the layout half of the
    predicate-pushdown story for multi-attribute scans.
    """
    spec = [(f"`{c}`", float(lo), float(hi)) for c, lo, hi in cols]
    return df.withColumn(
        out, F.expr(G.zorder_key(spec, int(bits), _D))
    )


def grid_disk(
    df: DataFrame,
    cell: str = "h3_cell",
    res: int = 12,
    k: int = 1,
    out: str = "disk_cell",
    ring_out: str = "ring",
    backend: str = "qcell",
) -> DataFrame:
    """H3 gridDisk(cell, k) analog on the qcell grid: every cell
    within Chebyshev grid distance k, tagged with its ring number
    (ring 0 = the cell itself; ring r has <= 8r cells). The radius-
    query / halo-materialization primitive: pre-exploding a disk
    turns "within r cells" probes into plain hash equi-joins.

    Row-local: one (2k+1)^2 offset explode + pure-Catalyst neighbor
    arithmetic (longitude wraps mod 2^res, rows past the poles drop),
    no shuffle — the same explode-bounded pattern as cell_uncompact.

    backend="h3": genuine hex gridDisk on REAL H3 ids — via h3-py
    when importable, else the spec-derived pentagon-safe traversal
    (h3geo.grid_disk_real; backend="spec" forces it). No ring
    column — H3 rings are hex-distance, exposed separately.
    """
    if backend not in ("qcell", "h3", "spec"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend != "qcell":
        from pdal_spark.operators import h3lib

        if backend != "spec" and h3lib.HAS_H3:
            return h3lib.grid_disk_lib(df, cell, k, out)
        return h3lib.grid_disk_spec(df, cell, k, out)
    span = f"sequence({-k}, {k})"
    e = (
        df.withColumn("__dx", F.explode(F.expr(span)))
        .withColumn("__dy", F.explode(F.expr(span)))
        .where(F.expr(G.qcell_neighbor_valid(f"`{cell}`", "`__dy`", res, _D)))
    )
    return (
        e.withColumn(
            out,
            F.expr(G.qcell_neighbor(f"`{cell}`", "`__dx`", "`__dy`", res, _D)),
        )
        .withColumn(ring_out, F.expr("greatest(abs(__dx), abs(__dy))"))
        .drop("__dx", "__dy")
    )


def _py_grid_index(coord: float, lo: float, span: float, res: int) -> int:
    """Driver-side mirror of sqlgen._grid_index (same IEEE ops)."""
    n = 1 << res
    raw = int(math.floor(((coord - lo) / span) * float(n)))
    return min(max(raw, 0), n - 1)


def morton_ranges(
    spark: SparkSession,
    lon0: float,
    lon1: float,
    lat0: float,
    lat1: float,
    res: int = 12,
) -> DataFrame:
    """Scan-range planner: the minimal set of CONTIGUOUS Morton-key
    ranges covering a bbox at resolution `res` — what a Morton/
    Z-order-clustered layout (morton_encode / zorder_key_col sort
    order) turns a spatial window query into. Feed the ranges to
    parquet row-group / Iceberg file pruning as
    `morton_key BETWEEN start AND end` disjuncts: the fraction of
    ranges vs cells is exactly the seek-vs-scan tradeoff Moon et al.
    2001 analyze.

    Data-independent (a pure function of the bbox — no table scan):
    the cell grid enumerates from spark.range, codegen interleaves
    the keys, and consecutive keys fold into ranges via the
    islands-and-gaps trick. The one global window sorts only the
    bbox's cell keys (bounded by the query window, NOT the dataset;
    cap res so (2k+1)^2-style cell counts stay planner-sized).
    Output: (range_start, range_end, n_cells) sorted.
    """
    ix0 = _py_grid_index(min(lon0, lon1), -180.0, 360.0, res)
    ix1 = _py_grid_index(max(lon0, lon1), -180.0, 360.0, res)
    iy0 = _py_grid_index(min(lat0, lat1), -90.0, 180.0, res)
    iy1 = _py_grid_index(max(lat0, lat1), -90.0, 180.0, res)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    grid = spark.range(nx * ny).select(
        F.expr(f"{ix0} + id % {nx}").alias("ix"),
        F.expr(f"{iy0} + id div {nx}").alias("iy"),
    )
    coded = grid.select(
        F.expr(G.morton_key("ix", "iy", _D)).alias("code")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("code").asc())
    island = coded.withColumn(
        "__isl", F.col("code") - F.row_number().over(w)
    )
    return (
        island.groupBy("__isl")
        .agg(
            F.min("code").alias("range_start"),
            F.max("code").alias("range_end"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .drop("__isl")
        .orderBy("range_start")
    )


def cell_area_km2(
    df: DataFrame,
    cell: str = "h3_cell",
    res: int = 12,
    out: str = "area_km2",
) -> DataFrame:
    """True spherical area of each qcell in km^2 — the density
    normalizer hexbin/h3bin need for per-km^2 rates (equirectangular
    cells shrink toward the poles; planar-area densities overstate
    polar cells by 1/cos(lat)). Closed form for a lon/lat-bounded
    cell: A = R^2 * dlambda * (sin(lat2) - sin(lat1)).

    Trig-derived -> INEXACT: round(6) on both sides (the repo's
    haversine convention). Pure row-local codegen, no shuffle.
    """
    from pdal_spark import sqlgen as G

    n = 1 << res
    _, iy = G.qcell_deconstruct(f"`{cell}`", _D)
    lat1 = f"(cast({iy} as double) * {G.fnum(180.0 / n)} - {G.fnum(90.0)})"
    lat2 = f"({lat1} + {G.fnum(180.0 / n)})"
    r_km = 6371.0088
    dlam = 2.0 * math.pi / n
    a = (
        f"round({G.fnum(r_km * r_km * dlam)}"
        f" * (sin({lat2} * {G.fnum(G.RAD)})"
        f" - sin({lat1} * {G.fnum(G.RAD)})), 6)"
    )
    return df.withColumn(out, F.expr(a))


def od_flows(
    df: DataFrame,
    key: str,
    order: str,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Origin-destination flow matrix over the cell lattice: per
    key (user/vehicle/session), origin = the cell of its FIRST point
    and destination = the cell of its LAST point (by `order`), then
    count trips per (origin, destination) cell pair — the OD-matrix
    primitive of mobility analytics and crawl session flow maps.

    Ties on `order` break by the larger struct comparison (max_by /
    min_by semantics — deterministic when (order, cell) pairs are
    distinct; pass a unique order column for full determinism).

    Scale: ONE hash aggregate per key (min_by/max_by are map-side
    combinable — no window, no sort) + ONE (o, d) aggregate.
    """
    enc = h3_encode(df, lat, lon, res=res, out="__cell").select(
        F.col(key).alias("k"), F.col(order).alias("o"), "__cell"
    )
    ends = enc.groupBy("k").agg(
        F.min_by("__cell", "o").alias("o_cell"),
        F.max_by("__cell", "o").alias("d_cell"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    return (
        ends.groupBy("o_cell", "d_cell")
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )


HOUGH_Q = 1 << 20
HOUGH_RSHIFT = 1 << 33  # shifts rho non-negative before binning so
#                         div == // across engines


def hough_theta_table(n_thetas: int) -> list[tuple[int, int, int]]:
    """(k, cos_q, sin_q) literals for theta = pi*k/n on the 2^-20
    grid — PYTHON-computed constants shared verbatim by the Spark
    plan and the SQL oracle, so no engine trig is ever compared."""
    import math

    q = HOUGH_Q
    return [
        (k,
         int(round(math.cos(math.pi * k / n_thetas) * q)),
         int(round(math.sin(math.pi * k / n_thetas) * q)))
        for k in range(int(n_thetas))
    ]


def hough_lines(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    n_thetas: int = 16,
    rho_bin_q: int = 1 << 21,
    coord_q: int = 1 << 10,
    top_n: int = 25,
) -> DataFrame:
    """Hough-transform line detection over a point set (Duda & Hart
    1972) — dominant alignments (roads, shorelines, scan artifacts,
    synthetic-grid fingerprints) pop out as high-vote (theta, rho)
    accumulator cells that no density/cluster op can see.

    Integer voting: rho_q = xq*cos_q + yq*sin_q on the quantized
    grids (exact int64), binned as (rho_q + HOUGH_RSHIFT) div
    rho_bin_q — the shift keeps the numerator non-negative where
    both engines' integer division agree. Ties in the top-n break
    (votes desc, theta asc, bin asc): fully deterministic.

    Scale: ONE n_thetas-way literal explode + ONE hash aggregate +
    TakeOrderedAndProject — no join, no UDF, no driver state.
    """
    table = hough_theta_table(n_thetas)
    pts = df.select(
        F.floor(F.col(x) * float(coord_q)).cast("long").alias("xq"),
        F.floor(F.col(y) * float(coord_q)).cast("long").alias("yq"),
    )
    votes = pts.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(k).alias("k"),
                ((F.col("xq") * c + F.col("yq") * s + HOUGH_RSHIFT)
                 .cast("long")).alias("rs"),
            )
            for k, c, s in table
        ])).alias("v")
    ).select(
        F.col("v.k").alias("theta_k"),
        F.expr(f"v.rs div {int(rho_bin_q)}").alias("rho_bin"),
    )
    agg = votes.groupBy("theta_k", "rho_bin").agg(
        F.count(F.lit(1)).alias("votes")
    )
    return agg.orderBy(
        F.col("votes").desc(), F.col("theta_k").asc(),
        F.col("rho_bin").asc(),
    ).limit(int(top_n))


GRAV_Q = 1 << 20


def gravity_residuals(
    df: DataFrame,
    key: str,
    order: str,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Gravity spatial-interaction model readout over the OD flow
    matrix (Zipf 1946 gravity law): expected flow between cells i, j
    is proportional to O_i * D_j / d_ij^2 — comparing observed trips
    against it surfaces over/under-served corridors.

    Per observed (o, d) pair: exact integers n_trips, o_tot (trips
    originating at o), d_tot (ending at d), d2 (squared cell-index
    distance, x wrap-aware), and expect_q = (o_tot * d_tot * Q) div
    d2 for d2 > 0 (self-flows emit expect_q NULL — the model is
    undefined at zero distance). The caller's single normalization
    constant (total trips) scales expect_q to trips.

    Scale: od_flows' two aggregates + two tiny re-aggregations of
    the FLOW table joined back — everything O(|flows|), x-wrap
    distance pure codegen off the qcell bit layout.
    """
    from pdal_spark import sqlgen as G

    flows = od_flows(df, key=key, order=order, res=res,
                     lat=lat, lon=lon)
    o_tot = flows.groupBy("o_cell").agg(
        F.sum("n_trips").alias("o_tot"))
    d_tot = flows.groupBy("d_cell").agg(
        F.sum("n_trips").alias("d_tot"))
    ix_o, iy_o = G.qcell_deconstruct("o_cell", G.SPARK)
    ix_d, iy_d = G.qcell_deconstruct("d_cell", G.SPARK)
    n = 1 << res
    dxw = (f"least(pmod(({ix_o}) - ({ix_d}), {n}),"
           f" pmod(({ix_d}) - ({ix_o}), {n}))")
    dy = f"(({iy_o}) - ({iy_d}))"
    return (
        flows.join(o_tot, on="o_cell").join(d_tot, on="d_cell")
        .withColumn(
            "d2",
            F.expr(f"({dxw}) * ({dxw}) + ({dy}) * ({dy})")
            .cast("long"),
        )
        .select(
            "o_cell", "d_cell", "n_trips", "o_tot", "d_tot", "d2",
            F.expr(
                f"CASE WHEN d2 > 0 THEN"
                f" (o_tot * d_tot * {GRAV_Q}) div d2 END"
            ).alias("expect_q"),
        )
    )


def cell_jaccard_pairs(
    df: DataFrame,
    key: str,
    block: str,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Spatial co-visitation similarity between per-key point sets:
    Jaccard of the VISITED-CELL sets at `res` for every key pair
    sharing a block — the "do these two users/crawlers cover the
    same places" measure (contact-pattern mining, bot-twin
    detection), robust to visit counts where trajectory distances
    are not.

    Output: (key_a, key_b, n_inter, n_a, n_b, jaccard) — set sizes
    exact ints, jaccard ONE IEEE division.

    Scale: distinct (key, cell) table; intersections via ONE hash
    self-join on (block, cell) — pair volume tracks SHARED cells,
    never the key-pair cross product; sizes join back broadcastable.
    """
    enc = (
        h3_encode(df, lat, lon, res=res, out="__cell")
        .select(F.col(key).alias("k"), F.col(block).alias("b"),
                "__cell")
        .distinct()
    )
    sizes = enc.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        enc.alias("x")
        .join(enc.select(F.col("k").alias("k2"), F.col("b"),
                         F.col("__cell")).alias("y"),
              on=["b", "__cell"])
        .where(F.col("k") < F.col("k2"))
        .groupBy("k", "k2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("k"), F.col("n").alias("n_a")),
              on="k")
        .join(sizes.select(F.col("k").alias("k2"),
                           F.col("n").alias("n_b")), on="k2")
        .select(
            F.col("k").alias("key_a"), F.col("k2").alias("key_b"),
            "n_inter", "n_a", "n_b",
            F.expr("cast(n_inter as double)"
                   " / cast(n_a + n_b - n_inter as double)")
            .alias("jaccard"),
        )
    )


def geo_k_anonymize(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    k: int = 10,
    max_res: int = 12,
) -> DataFrame:
    """Adaptive-resolution geo-masking (spatial k-anonymity): each
    point is generalized to the FINEST qcell resolution at which its
    cell still holds >= k points — dense urban cells publish fine,
    sparse rural cells coarsen automatically. The location-privacy
    dual of cell_pyramid: publish (res_used, cell) instead of
    coordinates and no published cell isolates fewer than k people.

    Output: (id, res_used, cix, ciy). res_used = -1 (cells NULL)
    when even resolution 0 fails (total population < k).

    Scale: ONE row-local ladder explode (max_res + 1 rows per
    point), ONE map-side-combined count per (res, cell), ONE hash
    join back + max agg. Cell coordinates re-derive from the max
    res by integer shifts (shift table rides the plan as literals —
    no float pow anywhere); no arg_max needed.
    """
    R = int(max_res)
    base = df.select(
        F.col(id_col).alias("pid"),
        F.expr(G.qcell_ix(f"`{x}`", R)).alias("ix"),
        F.expr(G.qcell_iy(f"`{y}`", R)).alias("iy"),
    )
    rungs = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 F.lit(1 << (R - r)).alias("sh"))
        for r in range(R + 1)
    ])
    ladder = base.select(
        "pid", "ix", "iy", F.explode(rungs).alias("o")
    ).select(
        "pid", F.col("o.r").alias("r"),
        F.expr("ix div o.sh").alias("cx"),
        F.expr("iy div o.sh").alias("cy"),
    )
    counts = ladder.groupBy("r", "cx", "cy").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = (
        ladder.join(counts, on=["r", "cx", "cy"])
        .where(F.col("cnt") >= int(k))
        .groupBy("pid")
        .agg(F.max("r").alias("ru"))
    )
    out = base.join(best, on="pid", how="left")
    shift_case = "CASE ru " + " ".join(
        f"WHEN {r} THEN {1 << (R - r)}" for r in range(R + 1)
    ) + " END"
    return out.select(
        F.col("pid").alias(id_col),
        F.coalesce(F.col("ru"), F.lit(-1)).cast("long")
        .alias("res_used"),
        F.expr(f"ix div ({shift_case})").alias("cix"),
        F.expr(f"iy div ({shift_case})").alias("ciy"),
    )


IPF_Q = 1 << 20


def ipf_balance(
    seed: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 2,
    i: str = "i",
    j: str = "j",
    t: str = "t",
    target: str = "target",
) -> DataFrame:
    """Iterative proportional fitting / RAS matrix balancing (Deming
    & Stephan 1940) — calibrate a seed OD/interaction matrix to
    known row and column marginals: the step after gravity_residuals
    when real trip-end totals exist (also the classic survey/
    dataset reweighting kernel).

    State is carried in 2^-20 fixed point; each half-round rescales

        t_q' = (t_q * target_i * q) div rowsum_q

    — one exact integer division per cell per half-round (the
    truncation is deterministic and engine-identical; the divisor
    keeps FULL fixed-point precision, so the per-half-round relative
    loss is <= 2^-20 — truncating the divisor instead loses up to
    1/(sum div q), percent-level on small marginals). Cells,
    targets, and sums are exact int64 throughout; ``rounds`` full
    row+column sweeps unroll statically, so the oracle mirrors with
    one CTE per half-round. Marginal sums converge geometrically for
    strictly-positive-connected seeds (the classical IPF result).

    Overflow bound: t_q * target * q < 2^63; since t_q converges to
    target-scale * q, that is roughly target^2 * q^2 < 2^63 —
    targets up to ~3e3 at q = 2^20 (rescale targets or shrink q for
    bigger marginals).

    Scale: per half-round ONE map-side-combined marginal aggregate +
    ONE hash equi-join back on the margin key (the margin tables are
    |rows|/|cols|-sized, broadcast-eligible under AQE). No driver
    loop state beyond the static round count.
    """
    q = IPF_Q
    cur = seed.select(
        F.col(i).alias("__i"),
        F.col(j).alias("__j"),
        (F.col(t).cast("long") * q).alias("t_q"),
    )
    rt = row_targets.select(
        F.col(i).alias("__i"),
        F.col(target).cast("long").alias("__rt"),
    )
    ct = col_targets.select(
        F.col(j).alias("__j"),
        F.col(target).cast("long").alias("__ct"),
    )
    for _ in range(int(rounds)):
        rs = cur.groupBy("__i").agg(F.sum("t_q").alias("__rs"))
        cur = (
            cur.join(rs, on="__i")
            .join(rt, on="__i")
            .select(
                "__i", "__j",
                F.expr(
                    "case when __rs > 0 then"
                    f" (t_q * __rt * {q}) div __rs"
                    " else 0 end"
                ).alias("t_q"),
            )
        )
        cs = cur.groupBy("__j").agg(F.sum("t_q").alias("__cs"))
        cur = (
            cur.join(cs, on="__j")
            .join(ct, on="__j")
            .select(
                "__i", "__j",
                F.expr(
                    "case when __cs > 0 then"
                    f" (t_q * __ct * {q}) div __cs"
                    " else 0 end"
                ).alias("t_q"),
            )
        )
    return cur.select(
        F.col("__i").alias(i),
        F.col("__j").alias(j),
        "t_q",
        F.expr(
            f"cast(t_q as double) / cast({q} as double)"
        ).alias("t_fit"),
    )


OLC_ALPHABET = "23456789CFGHJMPQRVWX"


def olc_encode(
    df: DataFrame, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Open Location Code (Google Plus Codes) 10-character encode —
    the OTHER interop cell id next to geohash/slippy/qcell: the
    public, offline-computable street-level code (1/8000-degree
    cells, ~14 m) printed on real-world addresses.

    Pure integer arithmetic on the quantized grid: latv = floor((lat
    + 90) * 8000) clamped to the valid range, lonv likewise (+180,
    wrapped), then five base-20 digit pairs high-to-low through the
    standard alphabet, '+' after the 8th character. floor() of the
    input doubles is engine-identical; everything after is exact
    int64 — hash-exact, no library.

    Scale: fully row-local codegen string build, zero shuffle.
    """
    from pdal_spark import sqlgen as G

    a = OLC_ALPHABET
    latv = (
        f"least(cast(floor((({lat}) + 90.0e0) * 8000.0e0)"
        " as bigint), 1439999)"
    )
    lonv = (
        f"cast(floor(((({lon}) + 180.0e0)"
        f" - 360.0e0 * floor((({lon}) + 180.0e0) / 360.0e0))"
        " * 8000.0e0) as bigint)"
    )
    parts = []
    for i in range(5):
        shift = 20 ** (4 - i)
        for v in ("__la", "__lo"):
            parts.append(
                f"substring('{a}',"
                f" cast(({v} div {shift}) % 20 as int) + 1, 1)"
            )
        if i == 3:
            parts.append("'+'")
    code = "concat(" + ", ".join(parts) + ")"
    return df.withColumn("__la", F.expr(latv)).withColumn(
        "__lo", F.expr(lonv)
    ).withColumn("olc", F.expr(code)).drop("__la", "__lo")


def maidenhead_encode(
    df: DataFrame, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Maidenhead grid locator (6-character, e.g. JN47ak) — the
    amateur-radio / propagation-report cell code, completing the
    interop family (geohash, slippy, OLC, qcell): field (base-18
    letters), square (digits), subsquare (base-24 letters) over a
    2x1-degree -> 5'x2.5' ladder.

    Pure integer arithmetic on the quantized 1/24-degree-pair grid:
    lonv = floor((lon + 180) * 12), latv = floor((lat + 90) * 24)
    (wrapped/clamped), digits extracted by exact div/mod — engine-
    identical, no library. Uppercase fields, lowercase subsquares
    (the conventional casing).

    Scale: row-local codegen string build, zero shuffle.
    """
    lonv = (
        f"least(cast(floor(((({lon}) + 180.0e0)"
        f" - 360.0e0 * floor((({lon}) + 180.0e0) / 360.0e0))"
        " * 12.0e0) as bigint), 4319)"
    )
    latv = (
        f"least(cast(floor((({lat}) + 90.0e0) * 24.0e0)"
        " as bigint), 4319)"
    )
    code = (
        "concat("
        "substring('ABCDEFGHIJKLMNOPQR',"
        " cast(__mlo div 240 as int) + 1, 1),"
        "substring('ABCDEFGHIJKLMNOPQR',"
        " cast(__mla div 240 as int) + 1, 1),"
        "cast((__mlo % 240) div 24 as string),"
        "cast((__mla % 240) div 24 as string),"
        "substring('abcdefghijklmnopqrstuvwx',"
        " cast(__mlo % 24 as int) + 1, 1),"
        "substring('abcdefghijklmnopqrstuvwx',"
        " cast(__mla % 24 as int) + 1, 1))"
    )
    return df.withColumn("__mlo", F.expr(lonv)).withColumn(
        "__mla", F.expr(latv)
    ).withColumn("maidenhead", F.expr(code)).drop("__mlo", "__mla")
