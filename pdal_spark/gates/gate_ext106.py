"""Gate registry extension 106 — mobility/econometrics batch:
radius of gyration, bivariate Moran's I, spatial Markov transition
tally, trajectory (bigram) entropy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

DK = G.DUCKDB

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")
_MX = f"CAST(floor(({_LON}) * 1000.0 + 0.5) AS BIGINT)"
_MY = f"CAST(floor(({_LAT}) * 1000.0 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# radius_of_gyration — per-user spatial spread on the exact grid
# ---------------------------------------------------------------------------
_RG_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k, {_MX} AS mx, {_MY} AS my FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mx) AS BIGINT) AS sx,
             CAST(sum(my) AS BIGINT) AS sy,
             CAST(sum(mx * mx) AS BIGINT) AS sxx,
             CAST(sum(my * my) AS BIGINT) AS syy
      FROM pts GROUP BY k
    )
    SELECT k AS user_id, n, sx, sy,
           n * (sxx + syy) - sx * sx - sy * sy AS rg2_n2,
           sqrt(cast(n * (sxx + syy) - sx * sx - sy * sy as double))
             / cast(n as double) AS rg
    FROM agg
"""


@gate("radius_of_gyration", _RG_SQL)
def q_radius_of_gyration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _points(spark, sf_dir).select(
        F.col("user_id").alias("k"),
        F.expr("cast(floor(lon * 1000.0e0 + 0.5e0) as bigint)")
        .alias("mx"),
        F.expr("cast(floor(lat * 1000.0e0 + 0.5e0) as bigint)")
        .alias("my"),
    )
    return ops_temporal.radius_of_gyration(pts, key="k").select(
        F.col("k").alias("user_id"), "n", "sx", "sy", "rg2_n2", "rg"
    )


# ---------------------------------------------------------------------------
# bivariate_morans_i — x = event count, y = value-weight sum per
# res-4 cell, queen adjacency (the morans_i fixture, two variables)
# ---------------------------------------------------------------------------
_BM_RES = 4
_BM_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _BM_RES)} AS c,
             count(*) AS xv,
             CAST(sum(event_id % 5) AS BIGINT) AS yv
      FROM (SELECT event_id, {_LAT} AS lat, {_LON} AS lon
            FROM events) p
      GROUP BY 1
    ),
    mom AS (SELECT count(*) AS n, sum(xv) AS sx, sum(yv) AS sy
            FROM cellv),
    d AS MATERIALIZED (
      SELECT c, mom.n * xv - mom.sx AS dx, mom.n * yv - mom.sy AS dy,
             mom.n
      FROM cellv, mom
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    nbrs AS (
      SELECT d.c,
             {G.qcell_neighbor('d.c', 'offs.dx', 'offs.dy',
                               _BM_RES, DK)} AS nc
      FROM d, offs
      WHERE {G.qcell_neighbor_valid('d.c', 'offs.dy', _BM_RES, DK)}
    ),
    pairs AS (
      SELECT di.dx AS dxi, dj.dy AS dyj
      FROM nbrs
      JOIN d dj ON dj.c = nbrs.nc
      JOIN d di ON di.c = nbrs.c
    ),
    numc AS (
      SELECT CAST(count(*) AS BIGINT) AS w_pairs,
             CAST(sum(dxi * dyj) AS BIGINT) AS num FROM pairs
    ),
    denc AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(dx * dx) AS BIGINT) AS den_x,
             CAST(sum(dy * dy) AS BIGINT) AS den_y
      FROM d
    )
    SELECT n, w_pairs, num, den_x, den_y,
           CASE WHEN w_pairs > 0 AND den_x <> 0 AND den_y <> 0
             THEN (cast(n as double) * cast(num as double))
               / (cast(w_pairs as double)
                  * sqrt(cast(den_x as double))
                  * sqrt(cast(den_y as double))) END AS bv_morans_i
    FROM denc, numc
"""


@gate("bivariate_morans_i", _BM_SQL)
def q_bivariate_morans_i(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_BM_RES, out="cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.col("event_id") % 5).alias("y"),
        )
    )
    return ops_stats.bivariate_morans_i(
        cellv, res=_BM_RES, cell="cell", x="x", y="y"
    )


# ---------------------------------------------------------------------------
# spatial_markov — even/odd event snapshots of the res-4 count
# lattice, queen-mean neighbor context
# ---------------------------------------------------------------------------
_SM_RES = 4
_SM_CLS = "least(2, ({v}) // 16)"
_SM_SQL = f"""
    WITH b0 AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _SM_RES)} AS c,
             CAST(count(*) AS BIGINT) AS v0
      FROM (SELECT event_id, {_LAT} AS lat, {_LON} AS lon
            FROM events WHERE event_id % 2 = 0) p
      GROUP BY 1
    ),
    b1 AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _SM_RES)} AS c,
             CAST(count(*) AS BIGINT) AS v1
      FROM (SELECT event_id, {_LAT} AS lat, {_LON} AS lon
            FROM events WHERE event_id % 2 = 1) p
      GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    nbrs AS (
      SELECT b0.c,
             {G.qcell_neighbor('b0.c', 'offs.dx', 'offs.dy',
                               _SM_RES, DK)} AS nc
      FROM b0, offs
      WHERE {G.qcell_neighbor_valid('b0.c', 'offs.dy', _SM_RES, DK)}
    ),
    ctx AS (
      SELECT nbrs.c,
             {_SM_CLS.format(v='sum(v.v0) // count(*)')} AS nbr_class
      FROM nbrs JOIN b0 v ON v.c = nbrs.nc
      GROUP BY nbrs.c
    )
    SELECT CAST(ctx.nbr_class AS BIGINT) AS nbr_class,
           {_SM_CLS.format(v='b0.v0')} AS c0,
           {_SM_CLS.format(v='b1.v1')} AS c1,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM b0 JOIN b1 ON b1.c = b0.c JOIN ctx ON ctx.c = b0.c
    GROUP BY 1, 2, 3
"""


@gate("spatial_markov", _SM_SQL)
def q_spatial_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)

    def snap(parity: int) -> DataFrame:
        return (
            ops_h3.h3_encode(
                pts.where(F.col("event_id") % 2 == parity),
                "lat", "lon", res=_SM_RES, out="cell",
            )
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("x"))
        )

    out = ops_stats.spatial_markov(
        snap(0), snap(1), res=_SM_RES, n_classes=3, class_div=16,
        cell="cell", value="x",
    )
    return out.select(
        F.col("nbr_class").cast("long").alias("nbr_class"),
        F.col("c0").cast("long").alias("c0"),
        F.col("c1").cast("long").alias("c1"),
        "n_cells",
    )


# ---------------------------------------------------------------------------
# trajectory_entropy — bigram entropy of per-user 20-degree zone
# sequences over the jittered track fixture (ts = event_id, unique)
# ---------------------------------------------------------------------------
_TE_BLON = G.geo_lon("user_id")
_TE_BLAT = G.geo_lat("user_id")
_TE_MX = (
    f"CAST(floor(({_TE_BLON}) * 1000.0 + 0.5) AS BIGINT)"
    " + (event_id % 17) * 3000"
)
_TE_MY = (
    f"CAST(floor(({_TE_BLAT}) * 1000.0 + 0.5) AS BIGINT)"
    " + (event_id % 13) * 3000"
)
_TE_ZONE = f"(({_TE_MX}) // 20000) * 100000 + (({_TE_MY}) // 20000)"
_TE_LNQ = (
    f"cast(floor(ln(cast(c as double))"
    f" * {G.fnum(float(ops_stats.ENTROPY_Q))}"
    f" + {G.fnum(0.5)}) as bigint)"
)
_TE_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k, event_id AS tb, {_TE_ZONE} AS z
      FROM events
    ),
    hops AS (
      SELECT k, z, lag(z) OVER (PARTITION BY k ORDER BY tb) AS pz
      FROM pts
    ),
    cnt AS (
      SELECT k, pz, z, CAST(count(*) AS BIGINT) AS c
      FROM hops WHERE pz IS NOT NULL GROUP BY k, pz, z
    ),
    mom AS (
      SELECT k, CAST(sum(c) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(c * ({_TE_LNQ})) AS BIGINT) AS clnq
      FROM cnt GROUP BY k
    )
    SELECT k AS user_id, m, n_bigrams,
           round(ln(cast(m as double))
             - (cast(clnq as double)
                / {G.fnum(float(ops_stats.ENTROPY_Q))})
               / cast(m as double), 9) AS entropy
    FROM mom
"""


@gate("trajectory_entropy", _TE_SQL)
def q_trajectory_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("tb"),
        F.expr(_TE_ZONE.replace("//", "div")).alias("zone"),
    )
    out = ops_temporal.trajectory_entropy(
        pts, key="k", ts="tb", zone="zone"
    )
    return out.select(
        F.col("k").alias("user_id"),
        "m",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "entropy",
    )
