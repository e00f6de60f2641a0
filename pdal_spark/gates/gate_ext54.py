"""Gate registry extension 54 — vector overlay + planning batch:
exact segment-intersection join (CLRS 33.1 integer predicate) and
max-min fair budget allocation (water-filling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# segment_intersections — integer segments derived from orders; the
# oracle is the brute-force cross join with the SAME shared predicate
# (proves the cell-join candidate generation lossless).
# ---------------------------------------------------------------------------

_SEG_X1 = "o_orderkey % 997"
_SEG_Y1 = "(o_orderkey * 48271) % 997"
_SEG_X2 = f"({_SEG_X1}) + (o_custkey % 31) - 15"
_SEG_Y2 = f"({_SEG_Y1}) + ((o_custkey * 7) % 29) - 14"


def _seg_src_sql(mod_val: int, idc: str) -> str:
    return f"""
      SELECT o_orderkey AS {idc},
             CAST({_SEG_X1} AS BIGINT) AS x1,
             CAST({_SEG_Y1} AS BIGINT) AS y1,
             CAST({_SEG_X2} AS BIGINT) AS x2,
             CAST({_SEG_Y2} AS BIGINT) AS y2
      FROM orders WHERE o_orderkey % 10 = {mod_val}
    """


def _seg_sql() -> str:
    return f"""
    WITH a AS MATERIALIZED ({_seg_src_sql(0, 'a_id')}),
    b AS MATERIALIZED ({_seg_src_sql(5, 'b_id')})
    SELECT a.a_id, b.b_id FROM a, b
    WHERE {G.seg_intersect_pred('a', 'b')}
    """


def _seg_df(spark: SparkSession, sf_dir: str, mod_val: int,
            idc: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").where(
        f"o_orderkey % 10 = {mod_val}"
    ).select(
        F.col("o_orderkey").alias(idc),
        F.expr(_SEG_X1).cast("long").alias("x1"),
        F.expr(_SEG_Y1).cast("long").alias("y1"),
        F.expr(_SEG_X2).cast("long").alias("x2"),
        F.expr(_SEG_Y2).cast("long").alias("y2"),
    )


@gate("segment_intersections", _seg_sql())
def q_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import (
        segment_intersection_join,
    )

    return segment_intersection_join(
        _seg_df(spark, sf_dir, 0, "a_id"),
        _seg_df(spark, sf_dir, 5, "b_id"),
        cell=64,
    )


# ---------------------------------------------------------------------------
# fair_budget — water-filling over skewed per-group demands
# (demand_g ~ n_g/(g+1)); B=400 keeps the water level interior at
# both sf0.001 and sf0.01.
# ---------------------------------------------------------------------------

_FB_B = 400

_FB_DEM_SQL = """
      SELECT user_id % 37 AS g,
             CAST(sum(CASE WHEN event_id % (1 + user_id % 37) = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events GROUP BY 1
"""


def _fair_budget_sql() -> str:
    b = _FB_B
    return f"""
    WITH dem AS MATERIALIZED ({_FB_DEM_SQL}),
    r AS (
      SELECT g, d,
             row_number() OVER (ORDER BY d ASC, g ASC) AS r,
             sum(d) OVER (ORDER BY d ASC, g ASC
                          ROWS UNBOUNDED PRECEDING) AS p,
             count(*) OVER () AS n
      FROM dem
    ),
    f AS (
      SELECT *, (d * (n - r + 1) <= {b} - (p - d)) AS sat FROM r
    ),
    s AS (
      SELECT *,
             sum(CASE WHEN sat THEN 1 ELSE 0 END) OVER () AS ns,
             sum(CASE WHEN sat THEN d ELSE 0 END) OVER () AS ps
      FROM f
    )
    SELECT g, CAST(d AS BIGINT) AS demand,
           CAST(CASE WHEN sat THEN d
                ELSE ({b} - ps) // (n - ns)
                     + CASE WHEN r - ns <= ({b} - ps) % (n - ns)
                            THEN 1 ELSE 0 END
                END AS BIGINT) AS alloc
    FROM s
    """


@gate("fair_budget", _fair_budget_sql())
def q_fair_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import fair_budget

    dem = _t(spark, sf_dir, "events").groupBy(
        (F.col("user_id") % 37).alias("g")
    ).agg(
        F.sum(
            F.when(
                F.col("event_id") % (F.col("user_id") % 37 + 1)
                == 0,
                1,
            ).otherwise(0)
        ).cast("long").alias("d")
    )
    return fair_budget(dem, group="g", demand="d", budget=_FB_B)
