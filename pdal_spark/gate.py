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


# ===========================================================================
# M1 — row ops / expression language / stats (SURVEY.md §2.2/2.3/2.6)
# ===========================================================================

from pdal_spark.functions.dimrange import compile_ranges  # noqa: E402
from pdal_spark.functions.expr import compile_expression  # noqa: E402
from pdal_spark.operators import rowops as ops_row  # noqa: E402
from pdal_spark.operators import stats as ops_stats  # noqa: E402
from pdal_spark.operators import voxel as ops_voxel  # noqa: E402

# deterministic unique order key for lineitem (l_linenumber < 10)
_ORD = "(l_orderkey * 10 + l_linenumber)"

_RANGES = ["l_quantity[10:20]", "l_quantity[45:]", "l_discount[0.02:0.07)"]


# filters.range (RangeFilter.cpp:97; DimRange.cpp:186-212)
@gate(
    "range_filter",
    f"SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem"
    f" WHERE {compile_ranges(_RANGES, DK)}",
)
def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return ops_row.range_filter(li, _RANGES).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


_EXPR = (
    "(l_quantity > 30 && l_discount <= 0.05) ||"
    " (l_tax == 0.0 && floor(l_quantity / 7) == 3)"
)


# filters.expression (ExpressionFilter.cpp:110; expr grammar
# filters/private/expr/Expression.hpp:18-38)
@gate(
    "expression_filter",
    f"SELECT l_orderkey, l_linenumber FROM lineitem"
    f" WHERE {compile_expression(_EXPR, DK)}",
)
def q_expression_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return ops_row.expression_filter(li, _EXPR).select(
        "l_orderkey", "l_linenumber"
    )


_ASSIGN_EXPR = "floor(sqrt(l_quantity) * 10) + abs(l_discount - 0.05)"
_ASSIGN_COND = "l_quantity > 25"


# filters.assign (AssignFilter.cpp:172-197) + filters.ferry
@gate(
    "assign_ferry",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty_copy,
           CASE WHEN {compile_expression(_ASSIGN_COND, DK)}
                THEN {compile_expression(_ASSIGN_EXPR, DK)}
                ELSE NULL END AS qscore
    FROM lineitem
    """,
)
def q_assign_ferry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li = ops_row.ferry(li, ["l_quantity => qty_copy"])
    li = ops_row.assign(li, [f"qscore = {_ASSIGN_EXPR} WHERE {_ASSIGN_COND}"])
    return li.select("l_orderkey", "l_linenumber", "qty_copy", "qscore")


# filters.head / filters.decimation (HeadFilter.cpp:82,
# DecimationFilter.cpp:94-103) over an explicit order column
@gate(
    "head_decimation",
    f"""
    SELECT ord FROM (
      SELECT {_ORD} AS ord,
             row_number() OVER (ORDER BY {_ORD}) - 1 AS idx
      FROM lineitem
    ) t WHERE idx < 5000 AND idx >= 3 AND (idx - 3) % 7 = 0
    """,
)
def q_head_decimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ord", F.expr(_ORD)
    )
    headed = ops_row.head(li, 5000, order="ord")
    return ops_row.decimation(headed, step=7, order="ord", offset=3).select(
        "ord"
    )


# filters.locate (LocateFilter.cpp:72-103) — value of the located row
@gate(
    "locate_max",
    "SELECT max(l_extendedprice) AS located_price FROM lineitem",
)
def q_locate_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return ops_row.locate(li, "l_extendedprice", "max").select(
        F.col("l_extendedprice").alias("located_price")
    )


# filters.stats (StatsFilter.hpp:60-210) — grouped moments, TPC-H Q1
# shape. Money sums go through decimal so both engines add exactly.
@gate(
    "stats_grouped",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double)
               AS sum_price,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*)
               AS avg_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_stats_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(dq).cast("double").alias("sum_qty"),
        F.sum(dp).cast("double").alias("sum_price"),
        (F.sum(dq).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
    )


_ESTAT_EXPRS = ["l_quantity > 40", "l_discount == 0.0"]


# filters.expressionstats (ExpressionStatsFilter.cpp)
@gate(
    "expression_stats",
    f"""
    SELECT l_returnflag, count(*) AS total,
           sum(CASE WHEN {compile_expression(_ESTAT_EXPRS[0], DK)}
               THEN 1 ELSE 0 END) AS pass_0,
           sum(CASE WHEN {compile_expression(_ESTAT_EXPRS[1], DK)}
               THEN 1 ELSE 0 END) AS pass_1
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_expression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return ops_stats.expression_stats(li, "l_returnflag", _ESTAT_EXPRS)


# filters.voxeldownsize mode=first (VoxelDownsizeFilter.cpp:122-157)
# over the geocoded point table (2D voxels, explicit origin + order)
_VOX = 3.0


@gate(
    "voxel_downsize",
    f"""
    SELECT event_id FROM (
      SELECT event_id,
             row_number() OVER (
               PARTITION BY
                 floor((lon - {G.fnum(-180.0)}) / {G.fnum(_VOX)}),
                 floor((lat - {G.fnum(-90.0)}) / {G.fnum(_VOX)})
               ORDER BY event_id
             ) AS rn
      FROM {_PTS}
    ) t WHERE rn = 1
    """,
)
def q_voxel_downsize(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_voxel.voxel_downsize(
        pts, cell=_VOX, dims=("lon", "lat"), order="event_id",
        origin=(-180.0, -90.0),
    ).select("event_id")


# filters.label_duplicates (LabelDuplicatesFilter.cpp)
@gate(
    "label_duplicates",
    f"""
    SELECT ord, CASE WHEN l_partkey = lag(l_partkey) OVER (ORDER BY ord)
                      AND l_suppkey = lag(l_suppkey) OVER (ORDER BY ord)
                THEN true ELSE false END AS is_duplicate
    FROM (SELECT {_ORD} AS ord, l_partkey, l_suppkey FROM lineitem) t
    """,
)
def q_label_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    return ops_row.label_duplicates(
        li, ["l_partkey", "l_suppkey"], order="ord"
    ).select("ord", "is_duplicate")


# filters.divider round_robin (DividerFilter.cpp:112-190)
@gate(
    "divider_round_robin",
    f"""
    SELECT group_id, count(*) AS cnt FROM (
      SELECT (row_number() OVER (ORDER BY {_ORD}) - 1) % 5 AS group_id
      FROM lineitem
    ) t GROUP BY group_id
    """,
)
def q_divider(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    divided = ops_row.divider(li, count=5, order="ord")
    return divided.groupBy("group_id").agg(F.count(F.lit(1)).alias("cnt"))


# ===========================================================================
# M4 — neighborhood / kNN joins (SURVEY.md §2.7)
# ===========================================================================

from pdal_spark.operators import knn as ops_knn  # noqa: E402

_CLAT = G.geo_lat("c_custkey")
_CLON = G.geo_lon("c_custkey")
_CPTS = (
    f"(SELECT c_custkey, {_CLAT} AS lat, {_CLON} AS lon,"
    f" c_nationkey % 5 AS cls FROM customer)"
)


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pts = ops_h3.geocode(cust, "c_custkey")
    return pts.select(
        "c_custkey", "lat", "lon",
        (F.col("c_nationkey") % 5).alias("cls"),
    )


_KNN_DIST = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)


# filters.neighborclassifier kNN core / kernels.delta NN join
# (NeighborClassifierFilter.cpp:160-196, KDIndex.hpp:55-124)
@gate(
    "knn_join",
    f"""
    SELECT src_id, nb_id, dist, nn_rank FROM (
      SELECT a.c_custkey AS src_id, b.c_custkey AS nb_id,
             {_KNN_DIST} AS dist,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {_KNN_DIST} ASC, b.c_custkey ASC
             ) AS nn_rank
      FROM {_CPTS} a, {_CPTS} b
      WHERE a.c_custkey <> b.c_custkey
    ) t WHERE nn_rank <= 3
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    return ops_knn.knn_join(
        pts, pts, k=3, cell=8.0, x="lon", y="lat",
        id_left="c_custkey", id_right="c_custkey", include_self=False,
    ).select("src_id", "nb_id", "dist", "nn_rank")


_RJ_RADIUS = 15.0


# filters.radiusassign / outlier radius core: neighbor count within r
# (RadiusAssignFilter.cpp:106-109, OutlierFilter.cpp radius mode)
@gate(
    "radius_neighbor_count",
    f"""
    SELECT a.c_custkey AS src_id, count(b.c_custkey) AS nb_cnt
    FROM {_CPTS} a JOIN {_CPTS} b
      ON a.c_custkey <> b.c_custkey
     AND ((a.lon - b.lon) * (a.lon - b.lon)
        + (a.lat - b.lat) * (a.lat - b.lat))
         <= {G.fnum(_RJ_RADIUS * _RJ_RADIUS)}
    GROUP BY 1
    """,
)
def q_radius_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    pairs = ops_knn.radius_join(
        pts, pts, _RJ_RADIUS, x="lon", y="lat",
        id_left="c_custkey", id_right="c_custkey", include_self=False,
    )
    return pairs.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("nb_cnt")
    )


# filters.neighborclassifier majority vote end-to-end
# (NeighborClassifierFilter.cpp:114-139: winner > k/2, deferred
# update, smallest class wins ties, self included in self-mode)
@gate(
    "neighbor_classifier",
    f"""
    WITH nn AS (
      SELECT src_id, nb_cls FROM (
        SELECT a.c_custkey AS src_id, b.cls AS nb_cls,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_KNN_DIST} ASC, b.c_custkey ASC
               ) AS nn_rank
        FROM {_CPTS} a, {_CPTS} b
      ) t WHERE nn_rank <= 5
    ), votes AS (
      SELECT src_id, nb_cls, count(*) AS v FROM nn GROUP BY 1, 2
    ), winner AS (
      SELECT src_id, nb_cls, v FROM (
        SELECT src_id, nb_cls, v, row_number() OVER (
          PARTITION BY src_id ORDER BY v DESC, nb_cls ASC
        ) AS r, sum(v) OVER (PARTITION BY src_id) AS tot
        FROM votes
      ) w WHERE r = 1 AND v * 2 > tot
    )
    SELECT c.c_custkey,
           CASE WHEN w.nb_cls IS NOT NULL AND w.nb_cls <> c.cls
                THEN w.nb_cls ELSE c.cls END AS cls
    FROM {_CPTS} c
    LEFT JOIN winner w ON w.src_id = c.c_custkey
    """,
)
def q_neighbor_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.neighbor_classifier(
        pts, k=5, dimension="cls", x="lon", y="lat",
        id_col="c_custkey", cell=8.0,
    )
    return out.select("c_custkey", "cls")


# filters.nndistance (NNDistanceFilter.cpp) — avg distance to 4 NN
@gate(
    "nn_distance",
    f"""
    SELECT src_id, round(avg(dist), 9) AS nn_distance FROM (
      SELECT a.c_custkey AS src_id, {_KNN_DIST} AS dist,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {_KNN_DIST} ASC, b.c_custkey ASC
             ) AS nn_rank
      FROM {_CPTS} a, {_CPTS} b
      WHERE a.c_custkey <> b.c_custkey
    ) t WHERE nn_rank <= 4 GROUP BY src_id
    """,
)
def q_nn_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    nn = ops_knn.knn_join(
        pts, pts, k=4, cell=8.0, x="lon", y="lat",
        id_left="c_custkey", id_right="c_custkey", include_self=False,
    )
    return nn.groupBy("src_id").agg(F.round(F.avg("dist"), 9).alias("nn_distance"))


# ===========================================================================
# M5 — raster<->vector (writers.gdal / readers.gdal analogs)
# ===========================================================================

from pdal_spark.operators import raster as ops_raster  # noqa: E402

_RES, _ROX, _ROY = 10.0, -180.0, -90.0
_RW, _RH = 36, 18
_RRAD = 14.142135623730951  # resolution * sqrt(2), GDALWriter default


def _raster_cells_sql() -> str:
    """Oracle mirror of ops_raster.rasterize over geocoded events
    (GDALGrid.cpp:224-274 radius update + :461-473 IDW)."""
    return f"""
    SELECT cell_i, cell_j, count(*) AS cnt,
           min(pz) AS zmin, max(pz) AS zmax,
           (cast(sum(cast(round(pz * {G.fnum(1048576.0)}) as bigint))
                 as double) / {G.fnum(1048576.0)}) / count(*) AS zmean,
           coalesce(
             min(CASE WHEN d = {G.fnum(0.0)} THEN pz END),
             cast(sum(CASE WHEN d > {G.fnum(0.0)} THEN
                  cast(round((pz / d) * {G.fnum(1048576.0)}) as bigint)
                  END) as double)
               / cast(sum(CASE WHEN d > {G.fnum(0.0)} THEN
                  cast(round(({G.fnum(1.0)} / d) * {G.fnum(1048576.0)})
                       as bigint) END) as double)
           ) AS zidw
    FROM (
      SELECT bi + di AS cell_i, bj + dj AS cell_j, pz,
             sqrt((({G.fnum(_ROX)} + ((bi + di + {G.fnum(0.5)})
                     * {G.fnum(_RES)})) - px)
                * (({G.fnum(_ROX)} + ((bi + di + {G.fnum(0.5)})
                     * {G.fnum(_RES)})) - px)
                + (({G.fnum(_ROY)} + ((bj + dj + {G.fnum(0.5)})
                     * {G.fnum(_RES)})) - py)
                * (({G.fnum(_ROY)} + ((bj + dj + {G.fnum(0.5)})
                     * {G.fnum(_RES)})) - py)) AS d
      FROM (
        SELECT lon AS px, lat AS py, value AS pz,
               cast(floor((lon - {G.fnum(_ROX)}) / {G.fnum(_RES)})
                    as bigint) AS bi,
               cast(floor((lat - {G.fnum(_ROY)}) / {G.fnum(_RES)})
                    as bigint) AS bj
        FROM (SELECT event_id, value, {_LAT} AS lat, {_LON} AS lon
              FROM events) e
      ) p
      CROSS JOIN (SELECT a.range AS di, b.range AS dj
                  FROM range(-2, 3) a, range(-2, 3) b) o
    ) q
    WHERE d < {G.fnum(_RRAD)}
      AND cell_i >= 0 AND cell_i < {_RW}
      AND cell_j >= 0 AND cell_j < {_RH}
    GROUP BY cell_i, cell_j
    """


def _event_points_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_h3.geocode(ev, "event_id").select("event_id", "lat", "lon",
                                                 "value")


@gate("rasterize_idw", _raster_cells_sql())
def q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points_z(spark, sf_dir)
    cells = ops_raster.rasterize(
        pts, resolution=_RES, origin_x=_ROX, origin_y=_ROY,
        width=_RW, height=_RH, x="lon", y="lat", z="value",
        radius=_RRAD, with_stdev=False, deterministic=True,
    )
    return cells.select(
        "cell_i", "cell_j", "cnt", "zmin", "zmax", "zmean", "zidw"
    )


@gate(
    "raster_to_points",
    f"""
    SELECT g.cell_i, g.cell_j,
           ({G.fnum(_ROX)} + ((g.cell_i + {G.fnum(0.5)}) * {G.fnum(_RES)}))
             AS x,
           ({G.fnum(_ROY)} + ((g.cell_j + {G.fnum(0.5)}) * {G.fnum(_RES)}))
             AS y,
           c.zmean
    FROM (SELECT a.range AS cell_i, b.range AS cell_j
          FROM range(0, {_RW}) a, range(0, {_RH}) b) g
    LEFT JOIN ({_raster_cells_sql()}) c
      ON c.cell_i = g.cell_i AND c.cell_j = g.cell_j
    """,
)
def q_raster_to_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points_z(spark, sf_dir)
    cells = ops_raster.rasterize(
        pts, resolution=_RES, origin_x=_ROX, origin_y=_ROY,
        width=_RW, height=_RH, x="lon", y="lat", z="value",
        radius=_RRAD, with_stdev=False, deterministic=True,
    )
    out = ops_raster.raster_to_points(
        spark, cells, _RES, _ROX, _ROY, _RW, _RH, bands=("zmean",)
    )
    return out.select("cell_i", "cell_j", "x", "y", "zmean")


# ===========================================================================
# Webtext training-data ops — dedup / text analysis / similarity /
# multimodal (BASELINE.json payload: webtext)
# ===========================================================================

from pdal_spark.operators import dedup as ops_dedup  # noqa: E402
from pdal_spark.operators import multimodal as ops_mm  # noqa: E402
from pdal_spark.operators import similarity as ops_sim  # noqa: E402
from pdal_spark.operators import textops as ops_text  # noqa: E402

# DuckDB token/vocab building blocks (engine mirrors are the
# operators in pdal_spark.operators.textops — same arithmetic).
_TOKS = """
  (SELECT doc_id, unnest(ws) AS word,
          unnest(range(0, len(ws))) AS pos
   FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d)
"""
_VOCAB = """
  (SELECT word, row_number() OVER (ORDER BY word) AS word_id
   FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
         FROM documents) w)
"""
_TIDS = f"""
  (SELECT t.doc_id, t.pos, v.word_id
   FROM {_TOKS} t JOIN {_VOCAB} v USING (word))
"""


# exact dedup: hash-groupBy on md5(text)
@gate(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
           count(*) AS dup_cnt
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_dedup.exact_dedup(docs)


# token counting + quality scoring
@gate(
    "token_quality",
    f"""
    SELECT t.doc_id, count(*) AS n_tokens,
           cast(sum(length(word)) as double) / cast(count(*) as double)
             AS avg_token_len,
           cast(count(DISTINCT word) as double) / cast(count(*) as double)
             AS uniq_ratio,
           any_value(length(d.text)) AS n_chars_calc
    FROM {_TOKS} t JOIN documents d USING (doc_id)
    GROUP BY t.doc_id
    """,
)
def q_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.token_quality(docs).select(
        "doc_id", "n_tokens", "avg_token_len", "uniq_ratio", "n_chars_calc"
    )


# language-ID heuristic (argmax of group hits, smallest-group ties)
@gate(
    "lang_id",
    f"""
    SELECT doc_id, grp AS pred_lang FROM (
      SELECT doc_id, grp, row_number() OVER (
               PARTITION BY doc_id ORDER BY hits DESC, grp ASC
             ) AS r
      FROM (
        SELECT doc_id, ((word_id - 1) % 5) AS grp, count(*) AS hits
        FROM {_TIDS} GROUP BY 1, 2
      ) c
    ) w WHERE r = 1
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_text.lang_id(docs, v)


# order-sensitive document fingerprint
@gate(
    "fingerprint",
    f"""
    SELECT doc_id,
           sum((pos + 1) * word_id) % {ops_text.FP_MOD} AS fingerprint
    FROM {_TIDS} GROUP BY doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_text.fingerprint(docs, v)


def _shingle_sql() -> str:
    """3-gram shingle hashes from word ids (mirror of
    ops_dedup.shingles): ((w1*8191 + w2)*8191 + w3) % M31."""
    return f"""
      (SELECT doc_id,
              ((((w1 * 8191 + w2) % {G.M31}) * 8191 + w3) % {G.M31})
                AS shingle
       FROM (
         SELECT doc_id, word_id AS w1,
                lead(word_id, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                  AS w2,
                lead(word_id, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                  AS w3
         FROM {_TIDS}
       ) s WHERE w2 IS NOT NULL AND w3 IS NOT NULL)
    """


def _minhash_sql() -> str:
    cols = ", ".join(
        f"min((shingle * {a} + {b}) % {G.M31}) AS sig_{i}"
        for i, (a, b) in enumerate(ops_dedup.PERMS)
    )
    return f"SELECT doc_id, {cols} FROM {_shingle_sql()} GROUP BY doc_id"


# MinHash signatures (16 Lehmer permutations over 3-gram shingles)
@gate("minhash_signatures", _minhash_sql())
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    sh = ops_dedup.shingles(docs, 3, vocab_df=v)
    return ops_dedup.minhash_signatures(sh)


def _lsh_pairs_sql() -> str:
    band_exprs = []
    for bnd in range(4):
        e = "0"
        for r in range(4):
            e = f"(({e} * 8191 + sig_{bnd * 4 + r}) % {1 << 45})"
        band_exprs.append(
            f"SELECT doc_id AS doc, {bnd} AS band, {e} AS bsig FROM sigs"
        )
    bands_sql = " UNION ALL ".join(band_exprs)
    return f"""
    WITH sigs AS ({_minhash_sql()}),
    bands AS ({bands_sql}),
    cand AS (
      SELECT DISTINCT l.doc AS a, r.doc AS b
      FROM bands l JOIN bands r USING (band, bsig)
      WHERE l.doc < r.doc
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()}),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT c.a, c.b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.a
      JOIN sh sb ON sb.doc_id = c.b AND sa.shingle = sb.shingle
      GROUP BY c.a, c.b
    )
    SELECT c.a, c.b,
           cast(coalesce(i.n_inter, 0) as double)
             / cast(za.sz + zb.sz - coalesce(i.n_inter, 0) as double)
             AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN sz za ON za.doc_id = c.a
    JOIN sz zb ON zb.doc_id = c.b
    """


# MinHash + LSH banding + exact Jaccard verification of candidates
@gate("minhash_lsh_pairs", _lsh_pairs_sql())
def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.minhash_lsh_dedup(docs, threshold=0.0, vocab_df=v)


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(({G.lehmer2(f'(word_id * 131 + {b})')} % 2) * 2 - 1)"
        f" AS s{b}"
        for b in range(ops_dedup.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(ops_dedup.SIMHASH_BITS)
    )
    return f"""
    SELECT doc_id, ({sig}) AS simhash
    FROM (SELECT doc_id, {sums} FROM {_TIDS} GROUP BY doc_id) p
    """


# SimHash (bit-majority over Lehmer token-bit hashes)
@gate("simhash", _simhash_sql())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.simhash(docs, vocab_df=v)


_COS = (
    "list_dot_product(qv, cv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


# similarity search: brute-force cosine top-k baseline.
# cosine rounded(9) on both sides: the engine's batched matmul kernel
# sums in SIMD/pairwise order, the oracle's list_dot_product folds
# left-to-right — last-ulp difference is expected.
@gate(
    "cosine_topk",
    f"""
    SELECT query_id, nb_id, round(cosine, 9) AS cosine, sim_rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
             {_COS} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id ASC
             ) AS sim_rank
      FROM (SELECT vec_id, cast(embedding as double[]) AS qv
            FROM embeddings WHERE vec_id < 20) q,
           (SELECT vec_id, cast(embedding as double[]) AS cv
            FROM embeddings) c
      WHERE q.vec_id <> c.vec_id
    ) t WHERE sim_rank <= 3
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = ops_sim.cosine_topk(
        emb.where(F.col("vec_id") < 20), emb, k=3
    )
    return out.select(
        "query_id", "nb_id",
        F.round("cosine", 9).alias("cosine"), "sim_rank",
    )


# multimodal plumbing: binary attach + stub decode via mapInPandas
@gate(
    "multimodal_meta",
    """
    SELECT doc_id, length(text) AS byte_len,
           cast(length(text) % 640 + 1 as int) AS width,
           cast(length(text) % 480 + 1 as int) AS height,
           3 AS n_channels
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    with_bin = ops_mm.attach_binary(docs)
    return ops_mm.decode_image_meta(with_bin)


# ---------------------------------------------------------------------------
# extended registry (round-1 coverage push) — must stay the LAST line
# ---------------------------------------------------------------------------
from pdal_spark import gate_ext  # noqa: E402,F401
