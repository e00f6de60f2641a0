"""Gate registry extension 148 — raster-calibration batch: focal
majority filter, histogram equalization, affine-from-GCPs fit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _points, _t, gate
from pdal_spark.gates.gate_ext37 import _FO_CELLS, _FO_OFFS, _FO_RES
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

DK = G.DUCKDB


def _catv(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FO_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )


# ---------------------------------------------------------------------------
# focal_majority — mode of ring-1 categories (count % 5), smallest
# category wins ties
# ---------------------------------------------------------------------------
_FMJ_MC = 1024
_FMJ_SQL = f"""
    WITH {_FO_CELLS},
    cats AS MATERIALIZED (
      SELECT c, CAST(xv % 5 AS BIGINT) AS v FROM cellv
    ),
    {_FO_OFFS},
    nbrs AS (
      SELECT cats.c,
             {G.qcell_neighbor('cats.c', 'offs.dx', 'offs.dy',
                               _FO_RES, DK)} AS nc
      FROM cats, offs
      WHERE {G.qcell_neighbor_valid('cats.c', 'offs.dy', _FO_RES, DK)}
    ),
    votes AS (
      SELECT nbrs.c, v.v AS nv, CAST(count(*) AS BIGINT) AS votes
      FROM nbrs JOIN cats v ON v.c = nbrs.nc
      GROUP BY nbrs.c, v.v
    ),
    enc AS (
      SELECT c,
             CAST(max(votes * {_FMJ_MC}
               + ({_FMJ_MC} - 1 - nv)) AS BIGINT) AS mx
      FROM votes GROUP BY c
    )
    SELECT c, CAST({_FMJ_MC} - 1 - (mx % {_FMJ_MC}) AS BIGINT)
             AS cat_maj,
           CAST(mx // {_FMJ_MC} AS BIGINT) AS n_votes
    FROM enc
"""


@gate("focal_majority", _FMJ_SQL)
def q_focal_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _catv(spark, sf_dir).select(
        "cell", (F.col("x") % 5).alias("v")
    )
    return ops_raster.focal_majority(
        cells, res=_FO_RES, cell="cell", value="v",
        max_cat=_FMJ_MC,
    )


# ---------------------------------------------------------------------------
# histogram_equalize — CDF stretch of the density raster
# ---------------------------------------------------------------------------
_HEQ_SQL = f"""
    WITH {_FO_CELLS},
    per AS (
      SELECT CAST(xv AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS t
      FROM cellv GROUP BY xv
    ),
    ranked AS (
      SELECT v,
             CAST(sum(t) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS cprev,
             CAST(sum(t) OVER () AS BIGINT) AS n
      FROM per
    ),
    lvl AS (
      SELECT v, (cprev * 256) // n AS level FROM ranked
    )
    SELECT cellv.c, CAST(cellv.xv AS BIGINT) AS v,
           CAST(lvl.level AS BIGINT) AS level
    FROM cellv JOIN lvl ON CAST(cellv.xv AS BIGINT) = lvl.v
"""


@gate("histogram_equalize", _HEQ_SQL)
def q_histogram_equalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_raster.histogram_equalize(
        _catv(spark, sf_dir), cell="cell", value="x", levels=256
    )


# ---------------------------------------------------------------------------
# affine_from_gcps — recover a planted affine from hashed GCPs
# ---------------------------------------------------------------------------
_AF_PX = f"(CAST(floor({G.geo_lon('event_id')}) AS BIGINT))"
_AF_PY = f"(CAST(floor({G.geo_lat('event_id')}) AS BIGINT))"
_AF_TX = (
    f"(2 * {_AF_PX} + 3 * {_AF_PY} + 7"
    f" + CAST({G.lehmer2('event_id')} % 5 AS BIGINT))"
)
_AF_TY = (
    f"(0 - {_AF_PX} + 4 * {_AF_PY} - 11"
    f" + CAST({G.lehmer2('event_id * 3 + 1')} % 5 AS BIGINT))"
)
_AF_FILTER = "event_id % 11 = 0"


def _af_det(r1: str, r2: str, r3: str, col: int) -> str:
    def d(v: str) -> str:
        return f"cast({v} as double)"

    if col == 1:
        return (
            f"({d(r1)} * ({d('syy')} * {d('n')}"
            f" - {d('sy')} * {d('sy')})"
            f" - {d('sxy')} * ({d(r2)} * {d('n')}"
            f" - {d('sy')} * {d(r3)})"
            f" + {d('sx')} * ({d(r2)} * {d('sy')}"
            f" - {d('syy')} * {d(r3)}))"
        )
    if col == 2:
        return (
            f"({d('sxx')} * ({d(r2)} * {d('n')}"
            f" - {d(r3)} * {d('sy')})"
            f" - {d(r1)} * ({d('sxy')} * {d('n')}"
            f" - {d('sy')} * {d('sx')})"
            f" + {d('sx')} * ({d('sxy')} * {d(r3)}"
            f" - {d(r2)} * {d('sx')}))"
        )
    return (
        f"({d('sxx')} * ({d('syy')} * {d(r3)}"
        f" - {d(r2)} * {d('sy')})"
        f" - {d('sxy')} * ({d('sxy')} * {d(r3)}"
        f" - {d(r2)} * {d('sx')})"
        f" + {d(r1)} * ({d('sxy')} * {d('sy')}"
        f" - {d('syy')} * {d('sx')}))"
    )


def _affine_sql() -> str:
    det = (
        "(cast(sxx as double) * (cast(syy as double)"
        " * cast(n as double)"
        " - cast(sy as double) * cast(sy as double))"
        " - cast(sxy as double) * (cast(sxy as double)"
        " * cast(n as double)"
        " - cast(sy as double) * cast(sx as double))"
        " + cast(sx as double) * (cast(sxy as double)"
        " * cast(sy as double)"
        " - cast(syy as double) * cast(sx as double)))"
    )
    outs = []
    for name, (r1, r2, r3), col in [
        ("a", ("sxtx", "sytx", "stx"), 1),
        ("b", ("sxtx", "sytx", "stx"), 2),
        ("c", ("sxtx", "sytx", "stx"), 3),
        ("d", ("sxty", "syty", "sty"), 1),
        ("e", ("sxty", "syty", "sty"), 2),
        ("f", ("sxty", "syty", "sty"), 3),
    ]:
        expr = _af_det(r1, r2, r3, col)
        outs.append(
            f"CASE WHEN {det} <> 0.0e0 THEN {expr} / {det} END"
            f" AS {name}"
        )
    cols = ",\n           ".join(outs)
    return f"""
    WITH s AS MATERIALIZED (
      SELECT {_AF_PX} AS px, {_AF_PY} AS py,
             {_AF_TX} AS qx, {_AF_TY} AS qy
      FROM events WHERE {_AF_FILTER}
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy,
             CAST(sum(px * px) AS BIGINT) AS sxx,
             CAST(sum(px * py) AS BIGINT) AS sxy,
             CAST(sum(py * py) AS BIGINT) AS syy,
             CAST(sum(qx) AS BIGINT) AS stx,
             CAST(sum(qy) AS BIGINT) AS sty,
             CAST(sum(px * qx) AS BIGINT) AS sxtx,
             CAST(sum(py * qx) AS BIGINT) AS sytx,
             CAST(sum(px * qy) AS BIGINT) AS sxty,
             CAST(sum(py * qy) AS BIGINT) AS syty
      FROM s
    )
    SELECT n, sx, sy, sxx, sxy, syy, stx, sty, sxtx, sytx,
           sxty, syty,
           {cols}
    FROM m
    """


@gate("affine_from_gcps", _affine_sql())
def q_affine_from_gcps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_AF_FILTER).select(
        F.expr(_AF_PX).alias("px"), F.expr(_AF_PY).alias("py"),
        F.expr(_AF_TX).alias("qx"), F.expr(_AF_TY).alias("qy"),
    )
    return ops_transform.affine_from_gcps(
        ev, sx="px", sy="py", tx="qx", ty="qy"
    )
