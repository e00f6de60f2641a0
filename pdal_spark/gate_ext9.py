"""Gate registry extension 9 — polygon->cell covering family:
polyfill (H3 polygonToCells analog), cell compact/uncompact (H3
compact analogs), and the polygon-pushdown crop (readers.copc/ept
`polygon` option: prune the cell layout against the query geometry
before the exact PIP test; CopcReader.cpp:684-754). All integer /
IEEE-exact, full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, gate
from pdal_spark.gate_ext4 import _ARROW
from pdal_spark.operators import h3 as ops_h3

DK = G.DUCKDB

_PF_RES = 6  # 64x32-cell world grid: arrow bbox -> ~375 candidates


def _polyfill_sql(
    rings: list[list[tuple[float, float]]], res: int
) -> str:
    """DuckDB mirror of operators.h3.polyfill: bbox candidate grid
    from range() x range(), center-containment ray cast, packed cell
    ids — same sqlgen fragments, so ids hash-match bit-for-bit."""
    ix0, ix1, iy0, iy1 = ops_h3._poly_grid_bounds(rings, res)
    return f"""
    SELECT {G.qcell_pack('ix', 'iy', res)} AS cell
    FROM (
      SELECT a.range AS ix, b.range AS iy,
             {G.ix_center_lon('a.range', res)} AS clon,
             {G.iy_center_lat('b.range', res)} AS clat
      FROM range({ix0}, {ix1 + 1}) a, range({iy0}, {iy1 + 1}) b
    ) g
    WHERE {G.raycast_pip('clon', 'clat', rings)}
    """


def _compact_sql(base_sql: str, res: int, min_res: int) -> str:
    """Unrolled per-level compact: complete sibling quadruples fold
    into their parent, survivors keep their resolution."""
    ctes = [f"c{res} AS MATERIALIZED ({base_sql})"]
    selects = []
    for r in range(res, min_res, -1):
        parent = G.qcell_parent("cell", r, r - 1, DK)
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT {parent} AS cell FROM c{r}"
            f" GROUP BY 1 HAVING count(*) = 4)"
        )
        ctes.append(
            f"k{r} AS (SELECT cell FROM c{r}"
            f" WHERE {parent} NOT IN (SELECT cell FROM p{r}))"
        )
        ctes.append(f"c{r - 1} AS (SELECT cell FROM p{r})")
        selects.append(f"SELECT cell FROM k{r}")
    selects.append(f"SELECT cell FROM c{min_res}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


_ARROW_RINGS = [_ARROW]
_ARROW_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _ARROW + [_ARROW[0]])
    + "))"
)


# H3 polygonToCells analog (inverse of hexbin's cells->boundary)
@gate("h3_polyfill", _polyfill_sql(_ARROW_RINGS, _PF_RES))
def q_h3_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)


# H3 compact analog over the polyfill covering set
@gate(
    "cell_compact",
    _compact_sql(_polyfill_sql(_ARROW_RINGS, _PF_RES), _PF_RES, 2),
)
def q_cell_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)
    return ops_h3.cell_compact(cov, _PF_RES, min_res=2)


# H3 uncompact analog: uncompact(compact(S)) == S, so the oracle is
# the polyfill itself — the round trip must reproduce it exactly.
@gate("cell_uncompact", _polyfill_sql(_ARROW_RINGS, _PF_RES))
def q_cell_uncompact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)
    comp = ops_h3.cell_compact(cov, _PF_RES, min_res=2)
    return ops_h3.cell_uncompact(comp, _PF_RES)


# readers.copc/ept `polygon` pushdown: covering-cell IN-list prune
# ahead of the exact PIP — row-identical to the plain concave crop,
# so the oracle is the plain PIP select.
@gate(
    "polygon_prune",
    f"""
    SELECT event_id, 0 AS geom_id FROM {_PTS}
    WHERE {G.raycast_pip('lon', 'lat', [_ARROW])}
    """,
)
def q_polygon_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.crop import crop_polygons_pruned

    pts = _points(spark, sf_dir)
    out = crop_polygons_pruned(
        pts, [(0, _ARROW_WKT)], prune_res=7, x="lon", y="lat"
    )
    return out.select("event_id", "geom_id")
