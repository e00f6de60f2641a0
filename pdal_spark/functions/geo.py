"""Column-level spatial functions (all pure Catalyst, JVM-side).

Each function renders a formula from pdal_spark.sqlgen for the Spark
dialect and wraps it in ``F.expr`` — so the engine's arithmetic is the
*same text* the DuckDB oracle runs. No Python executes per row; every
expression participates in whole-stage codegen and predicate pushdown.

Reference parity:
- geocode        <- FIXTURES.md F1 deterministic geocode rule
- qcell          <- filters.h3 (filters/H3Filter.cpp:96-130): cell
                    index column from lat/lon at a resolution
- hex_cell       <- filters.hexbin grid assignment
                    (filters/HexBinFilter.cpp:170-177)
- tile_cell      <- filters.splitter squareContains
                    (filters/SplitterFilter.cpp:218-227)
- morton_key     <- filters.mortonorder (MortonOrderFilter.cpp:217)
- mercator/inv   <- filters.reprojection built-in pair
- haversine_m    <- filters.geomdistance point-distance core
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def _c(col: Column | str) -> str:
    """Render a column reference for embedding in an expr string."""
    if isinstance(col, Column):
        # Column -> SQL text; safe for simple refs/arithmetic built here.
        return str(col._jc.toString())  # type: ignore[attr-defined]
    return f"`{col}`" if not col.startswith("(") else col


def geocode(id_col: Column | str) -> tuple[Column, Column]:
    """Deterministic (lat, lon) from a non-negative int64 id."""
    e = _c(id_col)
    return F.expr(G.geo_lat(e)), F.expr(G.geo_lon(e))


def qcell(lat: Column | str, lon: Column | str, res: int) -> Column:
    return F.expr(G.qcell(_c(lat), _c(lon), res))


def qcell_parent(cell: Column | str, res: int, parent_res: int) -> Column:
    return F.expr(G.qcell_parent(_c(cell), res, parent_res, _D))


def qcell_center(cell: Column | str, res: int) -> tuple[Column, Column]:
    e = _c(cell)
    return (
        F.expr(G.qcell_center_lat(e, res, _D)),
        F.expr(G.qcell_center_lon(e, res, _D)),
    )


def morton_key(lat: Column | str, lon: Column | str, res: int = 26) -> Column:
    return F.expr(G.morton_from_lonlat(_c(lat), _c(lon), res, _D))


def hex_cell(x: Column | str, y: Column | str, size: float) -> Column:
    return F.expr(G.hexcell(_c(x), _c(y), size))


def hex_center(cell: Column | str, size: float) -> tuple[Column, Column]:
    e = _c(cell)
    return (
        F.expr(G.hexcell_center_x(e, size, _D)),
        F.expr(G.hexcell_center_y(e, size, _D)),
    )


def tile_cell(
    x: Column | str, y: Column | str, ox: float, oy: float, length: float
) -> Column:
    return F.expr(G.tile_id(_c(x), _c(y), ox, oy, length))


def mercator(lat: Column | str, lon: Column | str) -> tuple[Column, Column]:
    return (
        F.expr(G.mercator_x(_c(lon))),
        F.expr(G.mercator_y(_c(lat), _D)),
    )


def inv_mercator(mx: Column | str, my: Column | str) -> tuple[Column, Column]:
    return (
        F.expr(G.inv_mercator_lat(_c(my))),
        F.expr(G.inv_mercator_lon(_c(mx))),
    )


def haversine_m(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    return F.expr(G.haversine_m(_c(lat1), _c(lon1), _c(lat2), _c(lon2)))
