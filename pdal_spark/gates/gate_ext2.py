"""Gate registry extension 2 — samplers, LOF, raster lookups, delta,
pipeline-level gate, and rows-only checks for order-dependent ops.
Imported from gate_ext (end of chain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import (
    DK, _CPTS, _PTS, _cust_points, _points, _t, gate,
)
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import rowops as ops_row
from pdal_spark.operators import sampling as ops_sample
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators.cluster import dbscan, kmeans, radius_assign
from pdal_spark.operators.splitter import chipper

_ORD = "(l_orderkey * 10 + l_linenumber)"
_D2 = (
    "((a.lon - b.lon) * (a.lon - b.lon)"
    " + (a.lat - b.lat) * (a.lat - b.lat))"
)
_KNN_D = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)


# ===========================================================================
# filters.lof (LOFFilter.cpp) — full LOF chain, decimal-exact sums
# ===========================================================================
_LOF_K = 4


@gate(
    "lof",
    f"""
    WITH nn AS (
      SELECT src_id, nb_id, dist FROM (
        SELECT a.c_custkey AS src_id, b.c_custkey AS nb_id,
               {_KNN_D} AS dist,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_KNN_D} ASC, b.c_custkey ASC
               ) AS r
        FROM {_CPTS} a, {_CPTS} b WHERE a.c_custkey <> b.c_custkey
      ) t WHERE r <= {_LOF_K}
    ),
    kd AS (SELECT src_id, max(dist) AS kdist FROM nn GROUP BY 1),
    reach AS (
      SELECT n.src_id, greatest(k.kdist, n.dist) AS reach
      FROM nn n JOIN kd k ON k.src_id = n.nb_id
    ),
    lrd AS (
      SELECT src_id,
             count(*) / cast(sum(cast(reach as decimal(38,15)))
                             as double) AS lrd
      FROM reach GROUP BY 1
    ),
    lo AS (
      SELECT n.src_id,
             cast(sum(cast(r2.lrd as decimal(38,15))) as double)
               / count(*) AS alrd
      FROM nn n JOIN lrd r2 ON r2.src_id = n.nb_id GROUP BY n.src_id
    )
    SELECT lo.src_id AS c_custkey, kd.kdist AS nn_distance,
           round(lrd.lrd, 9) AS local_reachability_distance,
           round(lo.alrd / lrd.lrd, 9) AS local_outlier_factor
    FROM lo JOIN lrd USING (src_id) JOIN kd USING (src_id)
    """,
)  # round(9): decimal->double conversion rounds differently in the
#    last ulp between the JVM (BigDecimal) and DuckDB
def q_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.lof(
        pts, _LOF_K, x="lon", y="lat", id_col="c_custkey", cell=8.0
    )
    return out.select(
        "c_custkey", "nn_distance",
        F.round("local_reachability_distance", 9).alias(
            "local_reachability_distance"
        ),
        F.round("local_outlier_factor", 9).alias(
            "local_outlier_factor"
        ),
    )


# ===========================================================================
# kernels.delta — NN join between TWO datasets (DeltaKernel.cpp)
# ===========================================================================
_SLAT = G.geo_lat("s_suppkey")
_SLON = G.geo_lon("s_suppkey")
_SPTS = (
    f"(SELECT s_suppkey, {_SLAT} AS lat, {_SLON} AS lon FROM supplier)"
)


@gate(
    "delta_nn",
    f"""
    SELECT src_id, nb_id, dist FROM (
      SELECT a.c_custkey AS src_id, b.s_suppkey AS nb_id,
             {_KNN_D} AS dist,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {_KNN_D} ASC, b.s_suppkey ASC
             ) AS r
      FROM {_CPTS} a, {_SPTS} b
    ) t WHERE r = 1
    """,
)
def q_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    cust = _cust_points(spark, sf_dir)
    supp = ops_h3.geocode(
        _t(spark, sf_dir, "supplier"), "s_suppkey"
    ).select("s_suppkey", "lat", "lon")
    nn = ops_knn.knn_join(
        cust, supp, k=1, cell=12.0, x="lon", y="lat",
        id_left="c_custkey", id_right="s_suppkey", include_self=True,
    )
    return nn.select("src_id", "nb_id", "dist")


# ===========================================================================
# filters.radiusassign (RadiusAssignFilter.cpp:45-115)
# ===========================================================================
_RA_R = 10.0


@gate(
    "radius_assign",
    f"""
    SELECT c.c_custkey,
           CASE WHEN c.cls >= 0 AND c.cls <= 1 AND m.src IS NOT NULL
                THEN 9 ELSE c.cls END AS cls
    FROM {_CPTS} c
    LEFT JOIN (
      SELECT DISTINCT a.c_custkey AS src
      FROM {_CPTS} a JOIN {_CPTS} b
        ON a.c_custkey <> b.c_custkey
       AND b.cls = 4
       AND a.cls >= 0 AND a.cls <= 1
       AND {_D2} <= {G.fnum(_RA_R * _RA_R)}
    ) m ON m.src = c.c_custkey
    """,
)
def q_radius_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = radius_assign(
        pts, _RA_R, src_domain=["cls[0:1]"],
        reference_domain=["cls[4:4]"], update=["cls = 9"],
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select("c_custkey", "cls")


# ===========================================================================
# raster lookups (filters.colorization / dem / hag_dem) over an
# arithmetic raster the oracle can regenerate: dem[j][i] = j*37 + i*13
# ===========================================================================
_RR, _ROX2, _ROY2, _RW2, _RH2 = 10.0, -180.0, -90.0, 36, 18
_RASTER = [[float(j * 37 + i * 13) for i in range(_RW2)]
           for j in range(_RH2)]
_DEM_SQL = (
    f"(floor((lat - {G.fnum(_ROY2)}) / {G.fnum(_RR)}) * 37"
    f" + floor((lon - {G.fnum(_ROX2)}) / {G.fnum(_RR)}) * 13)"
    f" * {G.fnum(1.0)}"
)


@gate(
    "colorize_lookup",
    f"SELECT event_id, {_DEM_SQL} AS band_1 FROM {_PTS}",
)
def q_colorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_raster.colorize(
        pts, _RASTER, _RR, _ROX2, _ROY2, x="lon", y="lat"
    )
    return out.select("event_id", "band_1")


@gate(
    "dem_filter",
    f"""
    SELECT event_id FROM (
      SELECT event_id, value * {G.fnum(1000.0)} AS z, {_DEM_SQL} AS dem
      FROM (SELECT event_id, value, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) p
    ) t
    WHERE z >= dem + {G.fnum(-200.0)} AND z <= dem + {G.fnum(200.0)}
    """,
)
def q_dem_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn(
        "z", F.col("value") * F.lit(1000.0)
    )
    out = ops_raster.dem_filter(
        pts, _RASTER, _RR, _ROX2, _ROY2, limits=(-200.0, 200.0),
        x="lon", y="lat", z="z",
    )
    return out.select("event_id")


@gate(
    "hag_dem",
    f"""
    SELECT event_id, (value * {G.fnum(1000.0)}) - {_DEM_SQL}
             AS height_above_ground
    FROM (SELECT event_id, value, {G.geo_lat('event_id')} AS lat,
                 {G.geo_lon('event_id')} AS lon FROM events) p
    """,
)
def q_hag_dem(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn(
        "z", F.col("value") * F.lit(1000.0)
    )
    out = ops_raster.hag_dem(
        pts, _RASTER, _RR, _ROX2, _ROY2, x="lon", y="lat", z="z"
    )
    return out.select("event_id", "height_above_ground")


# ===========================================================================
# writers.gdal window_fill (GDALGrid::windowFill) on the rasterize
# output — weighted by 1/chebyshev-dist, round(9) (tiny float sums)
# ===========================================================================
from pdal_spark.gate import _raster_cells_sql  # noqa: E402
from pdal_spark.gate import _event_points_z  # noqa: E402
from pdal_spark.gate import _RES, _ROX, _ROY, _RW, _RH, _RRAD  # noqa: E402


@gate(
    "window_fill",
    f"""
    WITH cells AS ({_raster_cells_sql()}),
    grid AS (
      SELECT a.range AS cell_i, b.range AS cell_j
      FROM range(0, {_RW}) a, range(0, {_RH}) b
    ),
    empty AS (
      SELECT g.cell_i, g.cell_j FROM grid g
      LEFT JOIN cells c USING (cell_i, cell_j) WHERE c.cnt IS NULL
    ),
    offs AS (
      SELECT a.range AS di, b.range AS dj,
             greatest(abs(a.range), abs(b.range)) * {G.fnum(1.0)} AS cd
      FROM range(-2, 3) a, range(-2, 3) b
      WHERE NOT (a.range = 0 AND b.range = 0)
    ),
    filled AS (
      SELECT e.cell_i, e.cell_j,
             round(sum(c.zmean / o.cd) / sum({G.fnum(1.0)} / o.cd), 9)
               AS zmean,
             round(sum(c.zidw / o.cd) / sum({G.fnum(1.0)} / o.cd), 9)
               AS zidw
      FROM empty e JOIN offs o ON true
      JOIN cells c ON c.cell_i = e.cell_i + o.di
                  AND c.cell_j = e.cell_j + o.dj
      GROUP BY e.cell_i, e.cell_j
    )
    SELECT cell_i, cell_j, cnt, round(zmean, 9) AS zmean,
           round(zidw, 9) AS zidw FROM cells
    UNION ALL
    SELECT cell_i, cell_j, 0 AS cnt, zmean, zidw FROM filled
    """,
)
def q_window_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points_z(spark, sf_dir)
    cells = ops_raster.rasterize(
        pts, resolution=_RES, origin_x=_ROX, origin_y=_ROY,
        width=_RW, height=_RH, x="lon", y="lat", z="value",
        radius=_RRAD, with_stdev=False, deterministic=True,
    )
    out = ops_raster.window_fill(cells, _RW, _RH, 2)
    return out.select(
        "cell_i", "cell_j", "cnt",
        F.round("zmean", 9).alias("zmean"),
        F.round("zidw", 9).alias("zidw"),
    )


# ===========================================================================
# filters.stats single-dim summary rows (StatsFilter.cpp:198-220)
# ===========================================================================
@gate(
    "stats_dims",
    f"""
    SELECT 'l_quantity' AS dimension, count(l_quantity) AS cnt,
           min(l_quantity) AS minimum, max(l_quantity) AS maximum,
           round(avg(l_quantity), 6) AS average
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(l_discount), min(l_discount),
           max(l_discount), round(avg(l_discount), 6)
    FROM lineitem
    """,
)
def q_stats_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = ops_stats.stats(li, ["l_quantity", "l_discount"])
    return out.select(
        "dimension", "cnt", "minimum", "maximum",
        F.round("average", 6).alias("average"),
    )


# ===========================================================================
# filters.randomize (RandomizeFilter.cpp) — reorder only; the hash
# compare is order-insensitive so set-equality IS the semantics check
# ===========================================================================
@gate("randomize", "SELECT event_id FROM events")
def q_randomize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_row.randomize(ev, seed=42).select("event_id")


# ===========================================================================
# filters.returns (ReturnsFilter.cpp:73)
# ===========================================================================
@gate(
    "returns_split",
    f"""
    SELECT ord,
           CASE WHEN n = 1 THEN 'only'
                WHEN r = 1 THEN 'first'
                WHEN r = n THEN 'last'
                ELSE 'intermediate' END AS return_class
    FROM (
      SELECT {_ORD} AS ord, l_linenumber AS r,
             max(l_linenumber) OVER (PARTITION BY l_orderkey) AS n
      FROM lineitem
    ) t
    """,
)
def q_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    li = li.withColumn(
        "number_of_returns",
        F.max("l_linenumber").over(
            Window.partitionBy("l_orderkey")
        ),
    )
    out = ops_row.returns_split(
        li, return_num="l_linenumber", num_returns="number_of_returns"
    )
    return out.select("ord", "return_class")


# ===========================================================================
# filters.divider capacity mode (DividerFilter.cpp)
# ===========================================================================
@gate(
    "divider_capacity",
    f"""
    SELECT group_id, count(*) AS cnt FROM (
      SELECT cast(floor((row_number() OVER (ORDER BY {_ORD}) - 1)
                        / 7000.0) as int) AS group_id
      FROM lineitem
    ) t GROUP BY group_id
    """,
)
def q_divider_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    out = ops_row.divider(li, capacity=7000, order="ord",
                          mode="partition")
    return out.groupBy("group_id").agg(F.count(F.lit(1)).alias("cnt"))


# ===========================================================================
# pipeline-level gate: the JSON compiler end-to-end (SURVEY.md §3.1)
# ===========================================================================
@gate(
    "pipeline_json",
    f"""
    SELECT event_id, {G.qcell('lat', 'lon', 8)} AS h3_cell
    FROM {_PTS}
    WHERE lon BETWEEN {G.fnum(-60.0)} AND {G.fnum(60.0)}
      AND lat BETWEEN {G.fnum(-30.0)} AND {G.fnum(30.0)}
    """,
)
def q_pipeline_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.plans import Pipeline

    p = Pipeline([
        {"type": "readers.parquet",
         "filename": f"{sf_dir}/events.parquet"},
        {"type": "filters.geocode", "column": "event_id"},
        {"type": "filters.crop", "x": "lon", "y": "lat",
         "bounds": {"lon": [-60.0, 60.0], "lat": [-30.0, 30.0]}},
        {"type": "filters.h3", "resolution": 8},
    ])
    return p.execute(spark).select("event_id", "h3_cell")


# ===========================================================================
# rows-only checks (order-dependent / approximate / stub ops):
# the driver records row-count + schema stability for these
# ===========================================================================
@gate("chipper_chips", None)
def q_chipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = chipper(pts, capacity=500, lat="lat", lon="lon")
    return out.select("event_id", "chip_id")


@gate("sample_poisson", None)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_sample.sample_poisson(
        pts, 8.0, x="lon", y="lat", id_col="c_custkey"
    )
    return out.select("c_custkey")


_FPS_N = 8


def _fps_sql() -> str:
    """FPS is sequential greedy — but fully deterministic, so the
    oracle unrolls all rounds: round r picks the argmax of the
    running min-squared-distance (ties by id), exactly the engine's
    F.least chain (exact *,+,- doubles, no sqrt)."""
    d2 = (
        "((w.px - s.px) * (w.px - s.px)"
        " + (w.py - s.py) * (w.py - s.py))"
    )
    ctes = [
        f"p0 AS MATERIALIZED (SELECT c_custkey AS pid, lon AS px,"
        f" lat AS py FROM {_CPTS} c)",
        "s0 AS MATERIALIZED (SELECT pid, px, py FROM p0"
        " ORDER BY pid LIMIT 1)",
        f"""w1 AS MATERIALIZED (
      SELECT w.pid, w.px, w.py, {d2} AS mind
      FROM p0 w CROSS JOIN s0 s WHERE w.pid <> s.pid)""",
    ]
    for r in range(1, _FPS_N):
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT pid, px, py FROM w{r} "
            f"ORDER BY mind DESC, pid ASC LIMIT 1)"
        )
        if r < _FPS_N - 1:
            ctes.append(
                f"""w{r+1} AS MATERIALIZED (
      SELECT w.pid, w.px, w.py, least(w.mind, {d2}) AS mind
      FROM w{r} w CROSS JOIN s{r} s WHERE w.pid <> s.pid)"""
            )
    sel = " UNION ALL ".join(
        f"SELECT pid FROM s{r}" for r in range(_FPS_N)
    )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT c.c_custkey, c.lat, c.lon
    FROM {_CPTS} c JOIN ({sel}) k ON k.pid = c.c_custkey
    """


@gate("fps_sample", _fps_sql())
def q_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_sample.fps(pts, _FPS_N, x="lon", y="lat",
                         id_col="c_custkey")
    return out.select("c_custkey", "lat", "lon")


_DB_EPS, _DB_MIN = 5.0, 4


# filters.dbscan (DBSCANFilter.cpp) — deterministic min-label DBSCAN:
# core iff >= min_points neighbors within eps (self included), core
# clusters = CC min-label, border -> min core-neighbor component
@gate(
    "dbscan_labels",
    f"""
    WITH RECURSIVE
    pts AS (SELECT c_custkey AS pid, lat, lon FROM {_CPTS} c),
    pairs AS (
      SELECT a.pid AS pa, b.pid AS pb
      FROM pts a JOIN pts b
        ON ((a.lon - b.lon) * (a.lon - b.lon)
          + (a.lat - b.lat) * (a.lat - b.lat))
           <= {G.fnum(_DB_EPS * _DB_EPS)}
    ),
    core AS (
      SELECT pa AS pid FROM pairs GROUP BY 1
      HAVING count(*) >= {_DB_MIN}
    ),
    ce AS (
      SELECT p.pa, p.pb FROM pairs p
      JOIN core c1 ON c1.pid = p.pa
      JOIN core c2 ON c2.pid = p.pb
      WHERE p.pa <> p.pb
    ),
    reach(pid, lbl) AS (
      SELECT pid, pid FROM core
      UNION
      SELECT ce.pb, r.lbl FROM reach r JOIN ce ON ce.pa = r.pid
    ),
    comp AS (SELECT pid, min(lbl) AS component FROM reach GROUP BY 1),
    border AS (
      SELECT p.pa AS pid, min(c.component) AS component
      FROM pairs p JOIN comp c ON c.pid = p.pb
      WHERE p.pa NOT IN (SELECT pid FROM core)
      GROUP BY 1
    ),
    lab AS (SELECT * FROM comp UNION ALL SELECT * FROM border)
    SELECT pts.pid AS c_custkey,
           coalesce(l.component, -1) AS cluster_id
    FROM pts LEFT JOIN lab l USING (pid)
    """,
)
def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = dbscan(
        pts, eps=_DB_EPS, min_points=_DB_MIN, x="lon", y="lat",
        id_col="c_custkey",
    )
    return out.select("c_custkey", "cluster_id")


@gate("kmeans_labels", None)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = kmeans(pts, k=8, dims=("lon", "lat"))
    return out.select("c_custkey", "cluster_id")


@gate(
    "info_summary",
    f"""
    SELECT 'lat' AS dimension, count(lat) AS cnt,
           min(lat) AS minimum, max(lat) AS maximum FROM {_PTS}
    UNION ALL
    SELECT 'lon', count(lon), min(lon), max(lon) FROM {_PTS}
    UNION ALL
    SELECT 'value', count(value), min(value), max(value)
    FROM events
    """,
)  # the oracle checks the exact bbox essence (count/min/max);
#    average/variance are float sums whose partial-agg order is
#    nondeterministic, so they stay out of the hash
def q_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_stats.info(pts.select("lat", "lon", "value"))
    return out.select("dimension", "cnt", "minimum", "maximum")


@gate(
    "mm_features",
    """
    WITH n8 AS (SELECT unnest(generate_series(0, 7)) AS dim),
    ch AS (
      SELECT doc_id, ascii(unnest(string_split(text, ''))) % 8
               AS dim,
             length(text) AS n
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, dim, count(*) AS c, any_value(n) AS n
      FROM ch GROUP BY 1, 2
    ),
    docs AS (SELECT doc_id, length(text) AS n FROM documents)
    SELECT d.doc_id, n8.dim,
           cast(coalesce(cnt.c, 0) as double)
             / cast(greatest(d.n, 1) as double) AS value
    FROM docs d CROSS JOIN n8
    LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.dim = n8.dim
    """,
)  # oracle valid because the synthetic documents are pure ASCII
#    (UTF-8 bytes == char codes; the engine op itself handles any
#    bytes — int/int divisions are IEEE-identical in both engines)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import multimodal as ops_mm

    docs = _t(spark, sf_dir, "documents")
    with_bin = ops_mm.attach_binary(docs)
    out = ops_mm.extract_features(with_bin, codec="fake")
    return out.select(
        "doc_id", F.posexplode("feature").alias("dim", "value")
    )


_MM_EVERY = 200


@gate(
    "mm_frames",
    f"""
    SELECT d.doc_id, cast(g.fidx as int) AS frame_idx,
           least({_MM_EVERY}, d.blen - g.fidx * {_MM_EVERY})
             AS frame_byte_len
    FROM (SELECT doc_id, octet_length(encode(text)) AS blen
          FROM documents) d,
         LATERAL (SELECT unnest(generate_series(0,
                    cast(greatest(1, d.blen // {_MM_EVERY})
                         as bigint) - 1)) AS fidx) g
    """,
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import multimodal as ops_mm

    docs = _t(spark, sf_dir, "documents")
    with_bin = ops_mm.attach_binary(docs)
    return ops_mm.sample_frames(with_bin, every=_MM_EVERY, codec="fake")
