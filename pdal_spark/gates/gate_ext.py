"""Gate registry extension — round-1 coverage push (SURVEY.md §2).

Imported by pdal_spark.gate at the END of its module body; uses the
same @gate decorator so the driver sees one flat registry. Split out
only to keep file sizes reviewable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.functions.mongo import compile_mongo
from pdal_spark.gate import (
    DK, _CPTS, _PENTA, _PTS, _cust_points, _points, _t, gate,
)
from pdal_spark.operators import features as ops_feat
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import rowops as ops_row
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import transform as ops_tf
from pdal_spark.operators import voxel as ops_voxel
from pdal_spark.operators.cluster import cluster_euclidean
from pdal_spark.operators.crop import geom_distance
from pdal_spark.operators.overlay import overlay as ops_overlay

_ORD = "(l_orderkey * 10 + l_linenumber)"


# ===========================================================================
# §2.5 sorts / §2.3 limits
# ===========================================================================

# filters.sort + filters.head composed: top-100 by (qty DESC, ord)
@gate(
    "sort_head",
    f"""
    SELECT ord, l_quantity FROM (
      SELECT {_ORD} AS ord, l_quantity FROM lineitem
      ORDER BY l_quantity DESC, ord ASC LIMIT 100
    ) t
    """,
)
def q_sort_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    # PDAL dim order: LAST listed dim is the primary key
    # (SortFilter.cpp:80-120; see ops_row.sort docstring)
    s = ops_row.sort(li, [("ord", "ASC"), ("l_quantity", "DESC")])
    return s.limit(100).select("ord", "l_quantity")


# filters.tail (TailFilter.cpp)
@gate(
    "tail_rows",
    f"""
    SELECT ord FROM (
      SELECT {_ORD} AS ord,
             row_number() OVER (ORDER BY {_ORD} DESC) AS rn
      FROM lineitem
    ) t WHERE rn <= 500
    """,
)
def q_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    return ops_row.tail(li, 500, order="ord").select("ord")


# filters.merge (MergeFilter.cpp:51-76)
@gate(
    "merge_views",
    f"""
    SELECT {_ORD} AS ord FROM lineitem WHERE l_quantity < 10
    UNION ALL
    SELECT {_ORD} AS ord FROM lineitem WHERE l_quantity >= 45
    """,
)
def q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    a = li.where(F.col("l_quantity") < 10).select("ord")
    b = li.where(F.col("l_quantity") >= 45).select("ord")
    return ops_row.merge([a, b])


# filters.groupby (GroupByFilter.cpp:72-90) — view-per-value modeled
# as partitioning; gate proves the repartition preserves the data
@gate(
    "groupby_views",
    "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1",
)
def q_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = ops_row.groupby_views(li, "l_returnflag")
    return parts.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ===========================================================================
# §2.2 row transforms
# ===========================================================================

_MONGO = {
    "l_quantity": {"$gte": 30},
    "$or": [{"l_discount": {"$lte": 0.02}}, {"l_tax": {"$gt": 0.05}}],
    "l_returnflag": {"$in": ["A", "R"]},
}


# filters.mongo (MongoExpressionFilter.cpp)
@gate(
    "mongo_filter",
    f"SELECT {_ORD} AS ord FROM lineitem"
    f" WHERE {compile_mongo(_MONGO, DK)}",
)
def q_mongo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.expr(compile_mongo(_MONGO, G.SPARK))).select(
        F.expr(_ORD).alias("ord")
    )


_AFF = [0.5, 0.0, 0.0, 10.0,
        0.0, 2.0, 0.0, -5.0,
        0.0, 0.0, 1.0, 0.25,
        0.0, 0.0, 0.0, 1.0]


# filters.transformation (TransformationFilter.cpp:186)
@gate(
    "transformation_affine",
    f"""
    SELECT event_id,
           ((lon * {G.fnum(0.5)}) + (lat * {G.fnum(0.0)})
            + (value * {G.fnum(0.0)}) + {G.fnum(10.0)}) AS lon,
           ((lon * {G.fnum(0.0)}) + (lat * {G.fnum(2.0)})
            + (value * {G.fnum(0.0)}) + {G.fnum(-5.0)}) AS lat,
           ((lon * {G.fnum(0.0)}) + (lat * {G.fnum(0.0)})
            + (value * {G.fnum(1.0)}) + {G.fnum(0.25)}) AS value
    FROM (SELECT event_id, value, {G.geo_lat('event_id')} AS lat,
                 {G.geo_lon('event_id')} AS lon FROM events) p
    """,
)
def q_transformation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)  # geocode keeps the value column
    out = ops_tf.transformation(pts, _AFF, dims=("lon", "lat", "value"))
    return out.select("event_id", "lon", "lat", "value")


# filters.reprojection EPSG:4326 -> 3857 (ReprojectionFilter.cpp);
# ln/tan differ in final ulps between JVM and libm -> round(2) on
# metre-scale outputs on BOTH sides (sqlgen docstring policy)
@gate(
    "reproject_mercator",
    f"""
    SELECT event_id,
           round({G.mercator_x('lon')}, 2) AS mx,
           round({G.mercator_y('lat', DK)}, 2) AS my
    FROM {_PTS}
    """,
)
def q_mercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_tf.reproject_mercator(pts)
    return out.select(
        "event_id",
        F.round("x_3857", 2).alias("mx"),
        F.round("y_3857", 2).alias("my"),
    )


# filters.gpstimeconvert (GpsTimeConvert.cpp): ws -> adjusted standard
_GPS_WEEK_N = 2200


@gate(
    "gpstime_ws2gst",
    f"""
    SELECT event_id,
           ((value * {G.fnum(100000.0)})
            + {G.fnum(float(_GPS_WEEK_N * 604800))})
            - {G.fnum(1e9)} AS gps_time
    FROM events
    """,
)
def q_gpstime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "gps_time", F.col("value") * F.lit(100000.0)
    )
    out = ops_tf.gpstime_convert(ev, "ws2gst", week=_GPS_WEEK_N)
    return out.select("event_id", "gps_time")


# filters.colorinterp (ColorinterpFilter.cpp) — 6-color default ramp
def _colorinterp_sql() -> str:
    ramp = [(0, 0, 255), (0, 128, 192), (0, 255, 128),
            (128, 255, 0), (192, 128, 0), (255, 0, 0)]
    n = len(ramp)
    b = (
        f"least(greatest(cast(floor((l_quantity - {G.fnum(1.0)})"
        f" / {G.fnum(50.0)} * {n}) as int), 0), {n - 1})"
    )
    chans = []
    for i, ch in enumerate(["red", "green", "blue"]):
        cases = " ".join(
            f"WHEN {j} THEN {ramp[j][i]}" for j in range(n)
        )
        chans.append(f"(CASE {b} {cases} END) AS {ch}")
    return (
        f"SELECT {_ORD} AS ord, {', '.join(chans)} FROM lineitem"
    )


@gate("colorinterp_ramp", _colorinterp_sql())
def q_colorinterp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    out = ops_tf.colorinterp(li, "l_quantity", 1.0, 51.0)
    return out.select("ord", "red", "green", "blue")


# filters.separatescanline (SeparateScanLineFilter.cpp)
@gate(
    "scanline_sessions",
    """
    SELECT event_id,
           cast(floor(cast(sum(CASE WHEN event_id % 50 = 0 THEN 1
                                    ELSE 0 END)
                 OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) as double) / 2)
                as bigint) AS line_id
    FROM events
    """,
)
def q_scanline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "eofl", F.when(F.col("event_id") % 50 == 0, 1).otherwise(0)
    )
    out = ops_tf.separate_scanline(ev, "eofl", "event_id", groupby=2)
    return out.select("event_id", "line_id")


# ===========================================================================
# §2.6 distribution culls
# ===========================================================================

# filters.iqr (IQRFilter.cpp) — exact quantile parity
@gate(
    "iqr_filter",
    f"""
    WITH q AS (
      SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem
    )
    SELECT {_ORD} AS ord FROM lineitem, q
    WHERE l_extendedprice BETWEEN q1 - {G.fnum(1.5)} * (q3 - q1)
                              AND q3 + {G.fnum(1.5)} * (q3 - q1)
    """,
)
def q_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    return ops_stats.iqr_filter(li, "l_extendedprice", 1.5).select("ord")


# filters.mad (MADFilter.cpp)
@gate(
    "mad_filter",
    f"""
    WITH m AS (SELECT median(l_extendedprice) AS med FROM lineitem),
    d AS (SELECT median(abs(l_extendedprice - med)) AS mad
          FROM lineitem, m)
    SELECT {_ORD} AS ord FROM lineitem, m, d
    WHERE abs(l_extendedprice - med)
          <= {G.fnum(2.0)} * ({G.fnum(1.4826)} * mad)
    """,
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    return ops_stats.mad_filter(li, "l_extendedprice", 2.0).select("ord")


# filters.elm (ELMFilter.cpp) — unique z pins the within-cell order
_ELM_Z = "(value + event_id * 1e-09)"
_ELM_CELL = 10.0


@gate(
    "elm_noise",
    f"""
    SELECT event_id,
           CASE WHEN rz = 1 AND z2 IS NOT NULL
                     AND z2 - z > {G.fnum(0.05)}
                THEN 7 ELSE 0 END AS classification
    FROM (
      SELECT event_id, z,
             row_number() OVER (PARTITION BY vx, vy ORDER BY z ASC)
               AS rz,
             lead(z) OVER (PARTITION BY vx, vy ORDER BY z ASC) AS z2
      FROM (
        SELECT event_id, {_ELM_Z} AS z,
               floor(lon / {G.fnum(_ELM_CELL)}) AS vx,
               floor(lat / {G.fnum(_ELM_CELL)}) AS vy
        FROM (SELECT event_id, value, {G.geo_lat('event_id')} AS lat,
                     {G.geo_lon('event_id')} AS lon FROM events) p
      ) c
    ) r
    """,
)
def q_elm(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)  # geocode keeps the value column
    pts = pts.withColumn("z", F.expr(_ELM_Z)).withColumn(
        "classification", F.lit(0)
    )
    out = ops_voxel.elm(pts, cell=_ELM_CELL, x="lon", y="lat", z="z",
                        threshold=0.05)
    return out.select("event_id", "classification")


# filters.voxelcenternearestneighbor
_VC = 3.0


@gate(
    "voxel_center_nn",
    f"""
    SELECT event_id FROM (
      SELECT event_id, row_number() OVER (
        PARTITION BY floor((lon - {G.fnum(-180.0)}) / {G.fnum(_VC)}),
                     floor((lat - {G.fnum(-90.0)}) / {G.fnum(_VC)})
        ORDER BY
          (((lon - ((floor((lon - {G.fnum(-180.0)}) / {G.fnum(_VC)})
             + {G.fnum(0.5)}) * {G.fnum(_VC)} + {G.fnum(-180.0)}))
           * (lon - ((floor((lon - {G.fnum(-180.0)}) / {G.fnum(_VC)})
             + {G.fnum(0.5)}) * {G.fnum(_VC)} + {G.fnum(-180.0)})))
          + ((lat - ((floor((lat - {G.fnum(-90.0)}) / {G.fnum(_VC)})
             + {G.fnum(0.5)}) * {G.fnum(_VC)} + {G.fnum(-90.0)}))
           * (lat - ((floor((lat - {G.fnum(-90.0)}) / {G.fnum(_VC)})
             + {G.fnum(0.5)}) * {G.fnum(_VC)} + {G.fnum(-90.0)}))))
          ASC, event_id ASC
      ) AS rn
      FROM {_PTS}
    ) t WHERE rn = 1
    """,
)
def q_voxel_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_voxel.voxel_center_nn(
        pts, cell=_VC, dims=("lon", "lat"), origin=(-180.0, -90.0),
        order="event_id",
    )
    return out.select("event_id")


# filters.voxelcentroidnearestneighbor — centroid via decimal-exact
# mean on BOTH sides (float avg is agg-order dependent)
@gate(
    "voxel_centroid_nn",
    f"""
    WITH keyed AS (
      SELECT event_id, lon, lat,
             cast(floor((lon - {G.fnum(-180.0)}) / {G.fnum(_VC)})
                  as bigint) AS vx,
             cast(floor((lat - {G.fnum(-90.0)}) / {G.fnum(_VC)})
                  as bigint) AS vy
      FROM {_PTS}
    ), cents AS (
      SELECT vx, vy,
             cast(sum(cast(lon as decimal(30,10))) as double)
               / count(*) AS cx,
             cast(sum(cast(lat as decimal(30,10))) as double)
               / count(*) AS cy
      FROM keyed GROUP BY vx, vy
    )
    SELECT event_id FROM (
      SELECT k.event_id, row_number() OVER (
        PARTITION BY k.vx, k.vy
        ORDER BY ((k.lon - c.cx) * (k.lon - c.cx)
                + (k.lat - c.cy) * (k.lat - c.cy)) ASC,
                 k.event_id ASC
      ) AS rn
      FROM keyed k JOIN cents c ON c.vx = k.vx AND c.vy = k.vy
    ) t WHERE rn = 1
    """,
)
def q_voxel_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_voxel.voxel_centroid_nn(
        pts, cell=_VC, dims=("lon", "lat"), origin=(-180.0, -90.0),
        order="event_id",
    )
    return out.select("event_id")


# ===========================================================================
# §2.7 neighborhood aggregates
# ===========================================================================

_RD_R = 12.0
_RD_AREA = 3.141592653589793 * _RD_R * _RD_R


# filters.radialdensity (RadialDensityFilter.cpp)
@gate(
    "radial_density",
    f"""
    SELECT a.c_custkey, count(b.c_custkey) / {G.fnum(_RD_AREA)}
             AS radial_density
    FROM {_CPTS} a JOIN {_CPTS} b
      ON ((a.lon - b.lon) * (a.lon - b.lon)
        + (a.lat - b.lat) * (a.lat - b.lat))
         <= {G.fnum(_RD_R * _RD_R)}
    GROUP BY 1
    """,
)
def q_radial_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.radial_density(
        pts, _RD_R, x="lon", y="lat", id_col="c_custkey"
    )
    return out.select("c_custkey", "radial_density")


# filters.outlier method=radius (OutlierFilter.cpp)
@gate(
    "outlier_radius",
    f"""
    SELECT c.c_custkey,
           CASE WHEN coalesce(n.cnt, 0) < 3 THEN 7 ELSE c.cls END
             AS cls
    FROM {_CPTS} c
    LEFT JOIN (
      SELECT a.c_custkey AS pid, count(*) AS cnt
      FROM {_CPTS} a JOIN {_CPTS} b
        ON a.c_custkey <> b.c_custkey
       AND ((a.lon - b.lon) * (a.lon - b.lon)
          + (a.lat - b.lat) * (a.lat - b.lat))
           <= {G.fnum(_RD_R * _RD_R)}
      GROUP BY 1
    ) n ON n.pid = c.c_custkey
    """,
)
def q_outlier_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.outlier_radius(
        pts, radius=_RD_R, min_k=3, x="lon", y="lat",
        id_col="c_custkey", cls="cls",
    )
    return out.select("c_custkey", "cls")


# filters.zsmooth (ZsmoothFilter.cpp) — exact median of neighbor vals
@gate(
    "zsmooth_median",
    f"""
    SELECT a.c_custkey,
           round(quantile_cont(b.cls * {G.fnum(1.0)}, 0.5), 9)
             AS z_smooth
    FROM {_CPTS} a JOIN {_CPTS} b
      ON ((a.lon - b.lon) * (a.lon - b.lon)
        + (a.lat - b.lat) * (a.lat - b.lat))
         <= {G.fnum(_RD_R * _RD_R)}
    GROUP BY 1
    """,
)
def q_zsmooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir).withColumn(
        "zval", F.col("cls") * F.lit(1.0)
    )
    out = ops_knn.zsmooth(
        pts, _RD_R, dim="zval", x="lon", y="lat", id_col="c_custkey",
    )
    return out.select(
        "c_custkey", F.round("z_smooth", 9).alias("z_smooth")
    )


# filters.reciprocity (ReciprocityFilter.cpp)
_REC_K = 4
_KNN_D = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)


@gate(
    "reciprocity",
    f"""
    WITH nn AS (
      SELECT src_id, nb_id FROM (
        SELECT a.c_custkey AS src_id, b.c_custkey AS nb_id,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_KNN_D} ASC, b.c_custkey ASC
               ) AS r
        FROM {_CPTS} a, {_CPTS} b WHERE a.c_custkey <> b.c_custkey
      ) t WHERE r <= {_REC_K}
    )
    SELECT n.src_id AS c_custkey,
           {G.fnum(100.0)} * sum(CASE WHEN m.src_id IS NULL THEN 1
                                      ELSE 0 END) / count(*)
             AS reciprocity
    FROM nn n
    LEFT JOIN nn m ON m.src_id = n.nb_id AND m.nb_id = n.src_id
    GROUP BY 1
    """,
)
def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.reciprocity(
        pts, _REC_K, x="lon", y="lat", id_col="c_custkey", cell=8.0
    )
    return out.select("c_custkey", "reciprocity")


# covariance/eigen features family (EigenvaluesFilter.cpp,
# CovarianceFeaturesFilter.cpp) — closed-form 2x2, decimal-exact sums
_FEAT_R = 10.0


def _features_sql() -> str:
    d = "decimal(30,10)"

    def dsum(e):
        return f"cast(sum(cast({e} as {d})) as double)"

    return f"""
    WITH pairs AS (
      SELECT a.c_custkey AS src_id, b.lon AS nx, b.lat AS ny
      FROM {_CPTS} a JOIN {_CPTS} b
        ON ((a.lon - b.lon) * (a.lon - b.lon)
          + (a.lat - b.lat) * (a.lat - b.lat))
           <= {G.fnum(_FEAT_R * _FEAT_R)}
    ), s AS (
      SELECT src_id, count(*) AS n,
             {dsum('nx')} AS sx, {dsum('ny')} AS sy,
             {dsum('nx * nx')} AS sxx, {dsum('ny * ny')} AS syy,
             {dsum('nx * ny')} AS sxy
      FROM pairs GROUP BY src_id
    ), c AS (
      SELECT src_id, n,
             sxx / n - (sx / n) * (sx / n) AS cxx,
             syy / n - (sy / n) * (sy / n) AS cyy,
             sxy / n - (sx / n) * (sy / n) AS cxy
      FROM s
    ), e AS (
      SELECT src_id, n, cxx, cyy, cxy,
             ((cxx + cyy) / {G.fnum(2.0)})
               + sqrt(((cxx - cyy) / {G.fnum(2.0)})
                      * ((cxx - cyy) / {G.fnum(2.0)}) + cxy * cxy)
               AS e1,
             ((cxx + cyy) / {G.fnum(2.0)})
               - sqrt(((cxx - cyy) / {G.fnum(2.0)})
                      * ((cxx - cyy) / {G.fnum(2.0)}) + cxy * cxy)
               AS e2
      FROM c
    )
    SELECT src_id AS c_custkey, n AS n_neighbors,
           e1 AS eigenvalue_1, e2 AS eigenvalue_2,
           CASE WHEN sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx))
                     > {G.fnum(0.0)}
                THEN cxy / sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx))
                WHEN cxx <= cyy THEN {G.fnum(1.0)}
                ELSE {G.fnum(0.0)} END AS normal_x,
           CASE WHEN sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx))
                     > {G.fnum(0.0)}
                THEN (e2 - cxx)
                     / sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx))
                WHEN cxx <= cyy THEN {G.fnum(0.0)}
                ELSE {G.fnum(1.0)} END AS normal_y
    FROM e
    """


@gate("eigen_features", _features_sql())
def q_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_feat.neighborhood_features(
        pts, _FEAT_R, x="lon", y="lat", id_col="c_custkey"
    )
    return out.select(
        "c_custkey", "n_neighbors", "eigenvalue_1", "eigenvalue_2",
        "normal_x", "normal_y",
    )


# filters.cluster euclidean connected components (ClusterFilter.cpp)
# oracle: recursive CTE transitive closure with min-label
_CL_TOL = 10.0


@gate(
    "cluster_components",
    f"""
    WITH RECURSIVE
    pts AS (SELECT c_custkey AS pid, lat, lon FROM {_CPTS} c),
    edges AS (
      SELECT a.pid AS ea, b.pid AS eb
      FROM pts a JOIN pts b
        ON a.pid <> b.pid
       AND sqrt(((a.lon - b.lon) * (a.lon - b.lon))
              + ((a.lat - b.lat) * (a.lat - b.lat)))
           <= {G.fnum(_CL_TOL)}
    ),
    reach(pid, lbl) AS (
      SELECT pid, pid FROM pts
      UNION
      SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.pid
    ),
    comp AS (SELECT pid, min(lbl) AS cluster_id FROM reach GROUP BY 1),
    sizes AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1)
    SELECT c.pid AS c_custkey, c.cluster_id
    FROM comp c JOIN sizes s USING (cluster_id) WHERE s.n >= 2
    """,
)
def q_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = cluster_euclidean(
        pts, _CL_TOL, x="lon", y="lat", id_col="c_custkey",
        min_points=2,
    )
    return out.select("c_custkey", "cluster_id")


# ===========================================================================
# §2.2 spatial attribute joins
# ===========================================================================

_P2 = [(-120.0, -40.0), (-60.0, -60.0), (-50.0, 20.0), (-110.0, 30.0)]
_P2_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _P2 + [_P2[0]])
    + "))"
)
from pdal_spark.gate import _PENTA_WKT  # noqa: E402


# filters.overlay first-match attribute assign
# (OverlayFilter.cpp:172-185)
@gate(
    "overlay_first_match",
    f"""
    SELECT c_custkey,
           CASE WHEN {G.convex_pip('lon', 'lat', _PENTA)} THEN 101
                WHEN {G.convex_pip('lon', 'lat', _P2)} THEN 202
                ELSE cls END AS cls
    FROM {_CPTS}
    """,
)
def q_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_overlay(
        pts, [(_PENTA_WKT, 101), (_P2_WKT, 202)], column="cls",
        x="lon", y="lat",
    )
    return out.select("c_custkey", "cls")


def _segdist_sql(px: str, py: str, poly) -> str:
    """Mirror of functions.pip.dist_to_segments arithmetic."""
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        t = (
            f"least(greatest(((({px}) - {G.fnum(x1)}) * {G.fnum(dx)}"
            f" + (({py}) - {G.fnum(y1)}) * {G.fnum(dy)})"
            f" / {G.fnum(L2)}, {G.fnum(0.0)}), {G.fnum(1.0)})"
        )
        ax = f"(({px}) - ({G.fnum(x1)} + {t} * {G.fnum(dx)}))"
        ay = f"(({py}) - ({G.fnum(y1)} + {t} * {G.fnum(dy)}))"
        terms.append(f"({ax} * {ax} + {ay} * {ay})")
    return f"sqrt(least({', '.join(terms)}))"


# filters.geomdistance ring mode (GeomDistanceFilter.cpp)
@gate(
    "geom_distance_ring",
    f"""
    SELECT event_id,
           round({_segdist_sql('lon', 'lat', _PENTA)}, 9) AS distance
    FROM {_PTS}
    """,
)
def q_geomdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = geom_distance(pts, _PENTA_WKT, x="lon", y="lat", ring=True)
    return out.select(
        "event_id", F.round("distance", 9).alias("distance")
    )


# ===========================================================================
# webtext extras
# ===========================================================================


def _lsh_sig_sql(vec_expr: str, n_planes: int) -> str:
    from pdal_spark.operators.similarity import _plane_component

    parts = []
    for p in range(n_planes):
        consts = ", ".join(
            G.fnum(_plane_component(p, d)) for d in range(64)
        )
        proj = f"list_dot_product({vec_expr}, [{consts}])"
        parts.append(
            f"(CASE WHEN {proj} > {G.fnum(0.0)} THEN {1 << p}"
            f" ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ")"


# IVF/LSH-bucketed ANN (similarity.ivf_topk) — coarse cells = 8-bit
# hyperplane signatures; exact cosine within the probed cell
@gate(
    "ivf_topk",
    f"""
    WITH sigs AS (
      SELECT vec_id, cast(embedding as double[]) AS v,
             {_lsh_sig_sql('cast(embedding as double[])', 8)} AS cell
      FROM embeddings
    )
    SELECT query_id, nb_id, cosine, sim_rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id ASC
             ) AS sim_rank
      FROM sigs q JOIN sigs c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ) t WHERE sim_rank <= 3
    """,
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.ivf_topk(
        emb.where(F.col("vec_id") < 20), emb, k=3, n_probe_bits=8,
    )


# embedding-cosine near-dup via LSH bands (similarity.lsh_near_dup)
@gate(
    "lsh_near_dup",
    f"""
    WITH sigs AS (
      SELECT vec_id, cast(embedding as double[]) AS v,
             {_lsh_sig_sql('cast(embedding as double[])', 16)} AS sig
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id AS doc, b.band,
             sig & (15 * cast(pow(16, b.band) as bigint)) AS bsig
      FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.doc AS a, r.doc AS b
      FROM bands l JOIN bands r USING (band, bsig)
      WHERE l.doc < r.doc
    )
    SELECT c.a, c.b,
           list_dot_product(sa.v, sb.v)
             / (sqrt(list_dot_product(sa.v, sa.v))
                * sqrt(list_dot_product(sb.v, sb.v))) AS cosine
    FROM cand c
    JOIN sigs sa ON sa.vec_id = c.a
    JOIN sigs sb ON sb.vec_id = c.b
    WHERE list_dot_product(sa.v, sb.v)
            / (sqrt(list_dot_product(sa.v, sa.v))
               * sqrt(list_dot_product(sb.v, sb.v)))
          >= {G.fnum(0.15)}
    """,
)
def q_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.lsh_near_dup(emb, threshold=0.15, n_planes=16,
                                bands=4)


# simhash hamming-0 duplicate buckets (dedup.simhash_dup_buckets)
from pdal_spark.gate import _simhash_sql  # noqa: E402
from pdal_spark.operators import dedup as ops_dedup  # noqa: E402
from pdal_spark.operators import textops as ops_text  # noqa: E402


@gate(
    "simhash_buckets",
    f"""
    SELECT simhash, count(*) AS cnt, min(doc_id) AS canonical
    FROM ({_simhash_sql()}) s
    GROUP BY simhash HAVING count(*) > 1
    """,
)
def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    sims = ops_dedup.simhash(docs, vocab_df=v)
    return ops_dedup.simhash_dup_buckets(sims)
