"""Correctness-gate registry: paired (Spark query, DuckDB oracle SQL).

Consumed by ``__spark_entry__.queries()`` / ``oracle_sql()``. Each
gate runs the REAL engine path (operator functions from
pdal_spark.operators) on the driver's parquet tables, and ships an
ANSI-SQL oracle built from the same pdal_spark.sqlgen formula strings
(DuckDB dialect), so value-hash comparison is exact.

Conventions:
- every computed column aliased identically on both sides;
- only IEEE-exact arithmetic in hash-compared float outputs
  (+,-,*,/ and sqrt); trig-derived outputs are rounded on both sides;
- tables available: region nation customer supplier part orders
  lineitem events documents embeddings (driver-registered views in
  DuckDB; parquet files under sf_dir for Spark).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import hexbin as ops_hexbin
from pdal_spark.operators import splitter as ops_splitter

DK = G.DUCKDB


@dataclass
class Gate:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> rows-only check (non-SQL-expressible)


GATES: dict[str, Gate] = {}


def gate(name: str, sql: str | None):
    def deco(fn):
        GATES[name] = Gate(fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The geocoded pages/points table: events ids -> (lat, lon).

    This is the engine's ingestion step (web pages -> point records,
    BASELINE.json north_star); deterministic per FIXTURES.md F1.
    """
    return ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")


# SQL fragment mirrors of _points' derived columns:
_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")
_PTS = f"(SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events) pts"


# ---------------------------------------------------------------------------
# filters.h3 — cell encoding (H3Filter.cpp:96-130)
# ---------------------------------------------------------------------------
@gate(
    "h3_encode",
    f"SELECT event_id, {G.qcell('lat', 'lon', 12)} AS h3_cell FROM {_PTS}",
)
def q_h3_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.h3_encode(pts, "lat", "lon", res=12).select(
        "event_id", "h3_cell"
    )


# ---------------------------------------------------------------------------
# filters.mortonorder — Z-order key (MortonOrderFilter.cpp:217)
# ---------------------------------------------------------------------------
@gate(
    "morton_key",
    f"SELECT event_id, {G.morton_from_lonlat('lat', 'lon', 20, DK)} "
    f"AS morton_key FROM {_PTS}",
)
def q_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.morton_encode(pts, "lat", "lon", res=20).select(
        "event_id", "morton_key"
    )


# ---------------------------------------------------------------------------
# filters.hexbin — density tessellation (HexBinFilter.cpp:170-301)
# ---------------------------------------------------------------------------
_HEX_SIZE = 12.0
_HEX_THRESH = 5


@gate(
    "hexbin_density",
    f"""
    SELECT hex_id, cnt,
           cnt / {G.fnum(G.hex_area(_HEX_SIZE))} AS density,
           {G.hexcell_center_x('hex_id', _HEX_SIZE, DK)} AS hex_x,
           {G.hexcell_center_y('hex_id', _HEX_SIZE, DK)} AS hex_y
    FROM (
      SELECT {G.hexcell('lon', 'lat', _HEX_SIZE)} AS hex_id,
             count(*) AS cnt
      FROM {_PTS}
      GROUP BY 1
    ) c WHERE cnt >= {_HEX_THRESH}
    """,
)
def q_hexbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_hexbin.hexbin(
        pts, x="lon", y="lat", size=_HEX_SIZE, threshold=_HEX_THRESH
    )


# ---------------------------------------------------------------------------
# hexbin h3_grid mode + rollup to parent cells (H3 cellToParent analog)
# ---------------------------------------------------------------------------
@gate(
    "h3bin_rollup",
    f"""
    SELECT {G.qcell_parent(G.qcell('lat', 'lon', 12), 12, 6, DK)} AS cell_r6,
           count(*) AS cnt
    FROM {_PTS} GROUP BY 1
    """,
)
def q_h3bin_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    enc = ops_h3.h3_encode(pts, "lat", "lon", res=12)
    enc = ops_h3.h3_parent(enc, "h3_cell", 12, 6, out="cell_r6")
    return enc.groupBy("cell_r6").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# filters.crop bbox mode (CropFilter.cpp:264-281)
# ---------------------------------------------------------------------------
_BBOX = {"lon": (-60.0, 60.0), "lat": (-30.0, 30.0)}


@gate(
    "crop_bbox",
    f"""
    SELECT event_id, lat, lon FROM {_PTS}
    WHERE lon BETWEEN {G.fnum(-60.0)} AND {G.fnum(60.0)}
      AND lat BETWEEN {G.fnum(-30.0)} AND {G.fnum(30.0)}
    """,
)
def q_crop_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_crop.crop_bbox(pts, _BBOX).select("event_id", "lat", "lon")


@gate(
    "crop_bbox_outside",
    f"""
    SELECT event_id FROM {_PTS}
    WHERE NOT (lon BETWEEN {G.fnum(-60.0)} AND {G.fnum(60.0)}
           AND lat BETWEEN {G.fnum(-30.0)} AND {G.fnum(30.0)})
    """,
)
def q_crop_bbox_outside(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_crop.crop_bbox(pts, _BBOX, outside=True).select("event_id")


# ---------------------------------------------------------------------------
# filters.crop circle mode (CropFilter.cpp:339-361) — planar distance
# ---------------------------------------------------------------------------
_CC, _CR = (10.0, 20.0), 45.0  # center (lon, lat), radius deg


@gate(
    "crop_circle",
    f"""
    SELECT event_id FROM {_PTS}
    WHERE lon BETWEEN {G.fnum(_CC[0] - _CR)} AND {G.fnum(_CC[0] + _CR)}
      AND lat BETWEEN {G.fnum(_CC[1] - _CR)} AND {G.fnum(_CC[1] + _CR)}
      AND ((lon - {G.fnum(_CC[0])}) * (lon - {G.fnum(_CC[0])})
         + (lat - {G.fnum(_CC[1])}) * (lat - {G.fnum(_CC[1])}))
          <= {G.fnum(_CR)} * {G.fnum(_CR)}
    """,
)
def q_crop_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_crop.crop_circle(
        pts, center=_CC, distance=_CR, dims=("lon", "lat")
    ).select("event_id")


# ---------------------------------------------------------------------------
# filters.crop polygon mode — convex polygon, engine runs the numpy
# ray-cast kernel, oracle runs the half-plane SQL predicate.
# ---------------------------------------------------------------------------
# CCW convex pentagon over mid-latitudes.
_PENTA = [(-40.0, -20.0), (30.0, -35.0), (55.0, 10.0), (5.0, 40.0), (-45.0, 15.0)]
_PENTA_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _PENTA + [_PENTA[0]])
    + "))"
)


@gate(
    "crop_polygon",
    f"""
    SELECT event_id, 0 AS geom_id FROM {_PTS}
    WHERE {G.convex_pip('lon', 'lat', _PENTA)}
    """,
)
def q_crop_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_crop.crop_polygons(
        pts, [(0, _PENTA_WKT)], x="lon", y="lat"
    ).select("event_id", "geom_id")


# ---------------------------------------------------------------------------
# filters.splitter (SplitterFilter.cpp:175-227) — tile counts
# ---------------------------------------------------------------------------
_TL, _TOX, _TOY = 5.0, -180.0, -85.0


@gate(
    "splitter_tiles",
    f"""
    SELECT {G.tile_id('lon', 'lat', _TOX, _TOY, _TL)} AS tile_id,
           count(*) AS cnt
    FROM {_PTS} GROUP BY 1
    """,
)
def q_splitter_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    tiled = ops_splitter.splitter(
        pts, x="lon", y="lat", length=_TL, origin_x=_TOX, origin_y=_TOY
    )
    return tiled.groupBy("tile_id").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# filters.splitter with buffer — duplicated edge membership
# (SplitterFilter.cpp:195-214)
# ---------------------------------------------------------------------------
_TBUF = 0.5


def _buffer_union_sql() -> str:
    base, branches = G.splitter_parts("lon", "lat", _TOX, _TOY, _TL, _TBUF)
    selects = [f"SELECT event_id, {base} AS tile_id FROM {_PTS}"]
    for cond, tile in branches:
        selects.append(
            f"SELECT event_id, {tile} AS tile_id FROM {_PTS} WHERE {cond}"
        )
    return " UNION ALL ".join(selects)


@gate("splitter_buffered", _buffer_union_sql())
def q_splitter_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_splitter.splitter(
        pts,
        x="lon",
        y="lat",
        length=_TL,
        origin_x=_TOX,
        origin_y=_TOY,
        buffer=_TBUF,
    ).select("event_id", "tile_id")
