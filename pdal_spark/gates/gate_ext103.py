"""Gate registry extension 103 — local-modeling and movement batch:
geographically weighted regression, stay-point detection, flock
(co-movement) pairs, Fleiss' kappa."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")
_MX = f"CAST(floor(({_LON}) * 1000.0 + 0.5) AS BIGINT)"
_MY = f"CAST(floor(({_LAT}) * 1000.0 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# gwr_local — local slope of y ~ x at 19 target sites, integer
# Epanechnikov kernel, bandwidth 40 degrees
# ---------------------------------------------------------------------------
_GW_LON = G.geo_lon("tid * 43 + 11")
_GW_LAT = G.geo_lat("tid * 43 + 11")
_GW_H2 = 40000 * 40000
_GW_DET = (
    "(cast(sw as double) * cast(swxx as double)"
    " - cast(swx as double) * cast(swx as double))"
)
_GW_B1 = (
    "(cast(sw as double) * cast(swxy as double)"
    " - cast(swx as double) * cast(swy as double))"
    f" / {_GW_DET}"
)
_GWR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_MX} AS mx, {_MY} AS my,
             event_id % 97 AS x,
             event_id % 89 + 3 * (event_id % 97) AS y
      FROM events
    ),
    t AS MATERIALIZED (
      SELECT tid,
             CAST(floor(({_GW_LON}) * 1000.0 + 0.5) AS BIGINT)
               AS tmx,
             CAST(floor(({_GW_LAT}) * 1000.0 + 0.5) AS BIGINT)
               AS tmy
      FROM (SELECT DISTINCT user_id % 19 AS tid FROM events) u
    ),
    mom AS (
      SELECT tid, CAST(count(*) AS BIGINT) AS n_in,
             CAST(sum({_GW_H2} - ((mx - tmx) * (mx - tmx)
                  + (my - tmy) * (my - tmy))) AS BIGINT) AS sw,
             CAST(sum(({_GW_H2} - ((mx - tmx) * (mx - tmx)
                  + (my - tmy) * (my - tmy))) * x) AS BIGINT)
               AS swx,
             CAST(sum(({_GW_H2} - ((mx - tmx) * (mx - tmx)
                  + (my - tmy) * (my - tmy))) * y) AS BIGINT)
               AS swy,
             CAST(sum(({_GW_H2} - ((mx - tmx) * (mx - tmx)
                  + (my - tmy) * (my - tmy))) * x * x) AS BIGINT)
               AS swxx,
             CAST(sum(({_GW_H2} - ((mx - tmx) * (mx - tmx)
                  + (my - tmy) * (my - tmy))) * x * y) AS BIGINT)
               AS swxy
      FROM s JOIN t
        ON (mx - tmx) * (mx - tmx) + (my - tmy) * (my - tmy)
           < {_GW_H2}
      GROUP BY tid
    )
    SELECT tid, n_in, sw,
           {_GW_B1} AS beta1,
           (cast(swy as double) - ({_GW_B1})
            * cast(swx as double)) / cast(sw as double) AS beta0
    FROM mom WHERE {_GW_DET} <> 0.0
"""


@gate("gwr_local", _GWR_SQL)
def q_gwr_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    ev = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    samples = ev.select(
        F.expr("cast(floor(lon * 1000.0e0 + 0.5e0) as bigint)")
        .alias("mx"),
        F.expr("cast(floor(lat * 1000.0e0 + 0.5e0) as bigint)")
        .alias("my"),
        (F.col("event_id") % 97).alias("x"),
        (F.col("event_id") % 89 + 3 * (F.col("event_id") % 97))
        .alias("y"),
    )
    targets = (
        ev.select((F.col("user_id") % 19).alias("tid"))
        .distinct()
        .select(
            "tid",
            F.expr(
                f"cast(floor(({_GW_LON}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("mx"),
            F.expr(
                f"cast(floor(({_GW_LAT}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("my"),
        )
    )
    return ops_pp.gwr_local(samples, targets, h=40000, tid="tid")


# ---------------------------------------------------------------------------
# stay_points — dwell segments over jittered per-user tracks
# (ts = event_id: unique, so the total order is unambiguous)
# ---------------------------------------------------------------------------
_SP_BLON = G.geo_lon("user_id")
_SP_BLAT = G.geo_lat("user_id")
_SP_MX = (
    f"CAST(floor(({_SP_BLON}) * 1000.0 + 0.5) AS BIGINT)"
    " + (event_id % 17) * 3000"
)
_SP_MY = (
    f"CAST(floor(({_SP_BLAT}) * 1000.0 + 0.5) AS BIGINT)"
    " + (event_id % 13) * 3000"
)
_SP_T2 = 20000 * 20000
_STAY_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k, event_id AS tb,
             {_SP_MX} AS mx, {_SP_MY} AS my
      FROM events
    ),
    stepped AS (
      SELECT k, tb, mx, my,
             CASE WHEN lag(mx) OVER w IS NULL
                  OR (mx - lag(mx) OVER w) * (mx - lag(mx) OVER w)
                   + (my - lag(my) OVER w) * (my - lag(my) OVER w)
                   > {_SP_T2}
                  THEN 1 ELSE 0 END AS brk
      FROM pts
      WINDOW w AS (PARTITION BY k ORDER BY tb)
    ),
    segs AS (
      SELECT k, tb, mx, my,
             sum(brk) OVER (PARTITION BY k ORDER BY tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS seg
      FROM stepped
    )
    SELECT k AS user_id, CAST(seg AS BIGINT) AS seg,
           CAST(count(*) AS BIGINT) AS n,
           min(tb) AS t_start, max(tb) AS t_end,
           CAST(sum(mx) AS BIGINT) // count(*) AS cx,
           CAST(sum(my) AS BIGINT) // count(*) AS cy
    FROM segs GROUP BY k, seg HAVING count(*) >= 2
"""


@gate("stay_points", _STAY_SQL)
def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("tb"),
        F.expr(
            f"cast(floor(({_SP_BLON}) * 1000.0e0 + 0.5e0)"
            " as bigint) + (event_id % 17) * 3000"
        ).alias("mx"),
        F.expr(
            f"cast(floor(({_SP_BLAT}) * 1000.0e0 + 0.5e0)"
            " as bigint) + (event_id % 13) * 3000"
        ).alias("my"),
    )
    out = ops_temporal.stay_points(
        pts, key="key", ts="tb", t2=_SP_T2, min_n=2
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("seg").cast("long").alias("seg"),
        "n", "t_start", "t_end", "cx", "cy",
    )


# ---------------------------------------------------------------------------
# flock_pairs — sustained co-location of user cohorts across
# event_id-residue time bins, 30-degree cells off the base geocode
# ---------------------------------------------------------------------------
_FL_BLON = G.geo_lon("user_id % 59")
_FL_BLAT = G.geo_lat("user_id % 59")
_FL_CELL = (
    f"(CAST(floor(({_FL_BLON}) * 1000.0 + 0.5) AS BIGINT) // 30000)"
    " * 100 +"
    f" (CAST(floor(({_FL_BLAT}) * 1000.0 + 0.5) AS BIGINT) // 30000)"
)
_FLOCK_SQL = f"""
    WITH pres AS MATERIALIZED (
      SELECT DISTINCT user_id % 59 AS k, event_id % 8 AS tb,
             {_FL_CELL} AS c
      FROM events
    ),
    pt AS (
      SELECT DISTINCT a.k AS ka, b.k AS kb, a.tb
      FROM pres a JOIN pres b ON a.tb = b.tb AND a.c = b.c
      WHERE a.k < b.k
    ),
    isl AS (
      SELECT ka, kb, tb,
             tb - row_number() OVER (PARTITION BY ka, kb
                                     ORDER BY tb) AS grp
      FROM pt
    ),
    runs AS (
      SELECT ka, kb, grp, CAST(count(*) AS BIGINT) AS run
      FROM isl GROUP BY ka, kb, grp
    )
    SELECT ka, kb, CAST(max(run) AS BIGINT) AS max_run,
           CAST(sum(run) AS BIGINT) AS n_bins
    FROM runs GROUP BY ka, kb HAVING max(run) >= 3
"""


@gate("flock_pairs", _FLOCK_SQL)
def q_flock_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pres = ev.select(
        (F.col("user_id") % 59).alias("key"),
        (F.col("event_id") % 8).alias("tbin"),
        F.expr(_FL_CELL.replace("//", "div")).alias("cell"),
    )
    return ops_temporal.flock_pairs(
        pres, key="key", tbin="tbin", cell="cell", min_run=3
    )


# ---------------------------------------------------------------------------
# fleiss_kappa — 5 pseudo-raters per document, 4 categories
# ---------------------------------------------------------------------------
_FK_CAT = f"({G.mix_hash('doc_id * 5 + r')} % 4)"
_FLEISS_SQL = f"""
    WITH ratings AS MATERIALIZED (
      SELECT doc_id AS item, {_FK_CAT} AS cat
      FROM documents, (SELECT unnest(range(0, 5)) AS r) t
    ),
    nij AS (
      SELECT item, cat, CAST(count(*) AS BIGINT) AS n_ij
      FROM ratings GROUP BY item, cat
    ),
    per AS (
      SELECT item, CAST(sum(n_ij * n_ij) AS BIGINT) AS sq_i
      FROM nij GROUP BY item
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(sq_i) AS BIGINT) AS sum_sq
      FROM per
    ),
    ctot AS (
      SELECT CAST(sum(c_j * c_j) AS BIGINT) AS sum_cj_sq
      FROM (SELECT CAST(sum(n_ij) AS BIGINT) AS c_j
            FROM nij GROUP BY cat) s
    )
    SELECT n_items, CAST(5 AS BIGINT) AS n_raters, sum_sq,
           (cast(sum_sq as double)
            - cast(n_items as double) * cast(5 as double))
           / (cast(n_items as double) * cast(5 as double)
              * cast(4 as double)) AS po,
           cast(sum_cj_sq as double)
           / ((cast(n_items as double) * cast(5 as double))
              * (cast(n_items as double) * cast(5 as double)))
             AS pe,
           ((cast(sum_sq as double)
             - cast(n_items as double) * cast(5 as double))
            / (cast(n_items as double) * cast(5 as double)
               * cast(4 as double))
            - cast(sum_cj_sq as double)
              / ((cast(n_items as double) * cast(5 as double))
                 * (cast(n_items as double) * cast(5 as double))))
           / nullif(1.0e0 - cast(sum_cj_sq as double)
              / ((cast(n_items as double) * cast(5 as double))
                 * (cast(n_items as double) * cast(5 as double))),
              0.0e0)
             AS kappa
    FROM tot, ctot
"""


@gate("fleiss_kappa", _FLEISS_SQL)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ratings = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"),
    ).select(
        F.col("doc_id").alias("item"), F.expr(_FK_CAT).alias("cat")
    )
    return ops_stats.fleiss_kappa(ratings, item="item", cat="cat")
