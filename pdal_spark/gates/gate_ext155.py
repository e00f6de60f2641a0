"""Gate registry extension 155 — cluster-metric/geometry batch:
adjusted Rand, Calinski-Harabasz, rectangle-union area."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import crop as ops_crop

# ---------------------------------------------------------------------------
# adjusted_rand — two hashed labelings of events
# ---------------------------------------------------------------------------
_AR_A = "(user_id % 6)"
_AR_B = f"(CAST(({G.lehmer2('user_id')} % 10) AS BIGINT))"
_AR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_AR_A} AS a, {_AR_B} AS b FROM events
    ),
    nij AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY a, b
    ),
    p2 AS (
      SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS p2,
             CAST(sum(c) AS BIGINT) AS n
      FROM nij
    ),
    pa2 AS (
      SELECT CAST(sum(ca * (ca - 1)) AS BIGINT) AS pa2 FROM (
        SELECT CAST(sum(c) AS BIGINT) AS ca FROM nij GROUP BY a
      ) t
    ),
    pb2 AS (
      SELECT CAST(sum(cb * (cb - 1)) AS BIGINT) AS pb2 FROM (
        SELECT CAST(sum(c) AS BIGINT) AS cb FROM nij GROUP BY b
      ) t
    )
    SELECT n, p2, pa2, pb2,
           CASE WHEN n > 1 AND
             ((cast(pa2 as double) + cast(pb2 as double)) / 2.0e0
             - (cast(pa2 as double) * cast(pb2 as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0))))
             <> 0.0e0 THEN
             (cast(p2 as double)
             - (cast(pa2 as double) * cast(pb2 as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0))))
             / ((cast(pa2 as double) + cast(pb2 as double)) / 2.0e0
             - (cast(pa2 as double) * cast(pb2 as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0))))
             END AS ari
    FROM p2, pa2, pb2
"""


@gate("adjusted_rand", _AR_SQL)
def q_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_AR_A).alias("a"), F.expr(_AR_B).alias("b")
    )
    return ops_cluster.adjusted_rand(ev, label_a="a", label_b="b")


# ---------------------------------------------------------------------------
# calinski_harabasz — hashed 2-D points, coarse-cell labels
# ---------------------------------------------------------------------------
_CH_Q = ops_cluster.CH_Q
_CH_PX = f"(CAST(floor({G.geo_lon('event_id')}) AS BIGINT))"
_CH_PY = f"(CAST(floor({G.geo_lat('event_id')}) AS BIGINT))"
_CH_G = f"({_CH_PX} // 60)"
_CH_G_SP = f"({_CH_PX.replace('AS BIGINT', 'as bigint')} div 60)"


def _ch_qdiv(d: str, nn: str) -> str:
    return (
        f"(({d}) // ({nn})) * CAST({_CH_Q} AS BIGINT)"
        f" + ((({d}) % ({nn})) * CAST({_CH_Q} AS BIGINT))"
        f" // ({nn})"
    )


_CH_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_CH_G} AS g, {_CH_PX} AS px, {_CH_PY} AS py
      FROM events
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_c,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy,
             CAST(sum(px * px + py * py) AS BIGINT) AS ss
      FROM s GROUP BY g
    ),
    agg AS (
      SELECT CAST(sum(n_c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum({_ch_qdiv('(n_c * ss - sx * sx - sy * sy)',
                                'n_c')}) AS BIGINT) AS w_q,
             CAST(sum(sx) AS BIGINT) AS tsx,
             CAST(sum(sy) AS BIGINT) AS tsy,
             CAST(sum(ss) AS BIGINT) AS tss
      FROM grp
    ),
    tot AS (
      SELECT n, k, w_q,
             CAST({_ch_qdiv('(n * tss - tsx * tsx - tsy * tsy)',
                            'n')} AS BIGINT) AS t_q
      FROM agg
    )
    SELECT n, k, w_q, t_q,
           CASE WHEN k > 1 AND n > k AND w_q > 0 THEN
             ((cast(t_q as double) - cast(w_q as double))
             / (cast(k as double) - 1.0e0))
             / (cast(w_q as double) / (cast(n as double)
             - cast(k as double))) END AS ch
    FROM tot
"""


@gate("calinski_harabasz", _CH_SQL)
def q_calinski_harabasz(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    px = f"cast(floor({G.geo_lon('event_id')}) as bigint)"
    py = f"cast(floor({G.geo_lat('event_id')}) as bigint)"
    ev = _t(spark, sf_dir, "events").select(
        F.expr(f"({px}) div 60").alias("g"),
        F.expr(px).alias("px"),
        F.expr(py).alias("py"),
    )
    return ops_cluster.calinski_harabasz(
        ev, label="g", x="px", y="py"
    )


# ---------------------------------------------------------------------------
# rect_union_area — slab decomposition over the iou_join box set
# ---------------------------------------------------------------------------
_RU_X0 = f"CAST({G.lehmer2('event_id')} % 1000 AS BIGINT)"
_RU_Y0 = f"CAST({G.lehmer2('event_id * 7 + 2')} % 1000 AS BIGINT)"
_RU_PRED = "event_id % 17 = 0"
_RU_SQL = f"""
    WITH r AS MATERIALIZED (
      SELECT {_RU_X0} AS rx0,
             {_RU_X0} + 5 + event_id % 40 AS rx1,
             {_RU_Y0} AS ry0,
             {_RU_Y0} + 5 + user_id % 35 AS ry1
      FROM events WHERE {_RU_PRED}
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT e FROM (
        SELECT rx0 AS e FROM r UNION ALL SELECT rx1 FROM r
      ) t
    ),
    slabs AS MATERIALIZED (
      SELECT e AS xa,
             lead(e, 1) OVER (ORDER BY e ASC) AS xb
      FROM edges
      QUALIFY xb IS NOT NULL
    ),
    cov AS MATERIALIZED (
      SELECT xa, xb, ry0 AS s, ry1 AS e2
      FROM slabs JOIN r ON rx0 <= xa AND rx1 >= xb
    ),
    merged AS (
      SELECT xa, xb, island,
             CAST(min(s) AS BIGINT) AS is_s,
             CAST(max(e2) AS BIGINT) AS is_e
      FROM (
        SELECT xa, xb, s, e2,
               sum(ni) OVER (PARTITION BY xa
                 ORDER BY s ASC, e2 ASC
                 ROWS UNBOUNDED PRECEDING) AS island
        FROM (
          SELECT xa, xb, s, e2,
                 CASE WHEN max(e2) OVER (PARTITION BY xa
                   ORDER BY s ASC, e2 ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) IS NULL
                   OR s > max(e2) OVER (PARTITION BY xa
                   ORDER BY s ASC, e2 ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) THEN 1 ELSE 0 END AS ni
          FROM cov
        ) f
      ) n GROUP BY xa, xb, island
    ),
    per_slab AS (
      SELECT xa, xb, CAST(sum(is_e - is_s) AS BIGINT) AS cy
      FROM merged GROUP BY xa, xb
    ),
    nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rects FROM r)
    SELECT n_rects,
           CAST(count(*) AS BIGINT) AS n_slabs,
           CAST(sum((xb - xa) * cy) AS BIGINT) AS area
    FROM per_slab, nr GROUP BY n_rects
"""


@gate("rect_union_area", _RU_SQL)
def q_rect_union_area(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x0 = f"cast({G.lehmer2('event_id')} % 1000 as bigint)"
    y0 = f"cast({G.lehmer2('event_id * 7 + 2')} % 1000 as bigint)"
    r = _t(spark, sf_dir, "events").where(_RU_PRED).select(
        F.expr(x0).alias("x0"),
        F.expr(f"{x0} + 5 + event_id % 40").alias("x1"),
        F.expr(y0).alias("y0"),
        F.expr(f"{y0} + 5 + user_id % 35").alias("y1"),
    )
    return ops_crop.rect_union_area(r)
