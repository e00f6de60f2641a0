"""Gate registry extension 88 — hydrology completion: flat-drainage
resolution (equal-height BFS to the nearest draining exit, unrolled
min-merge rounds) and channel-network extraction (D8 edges above an
accumulation threshold, recursive path-walk accumulation oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

_RF_ROUNDS = 32


def _rf_sql(rounds: int) -> str:
    n = 1 << _FD_RES
    ix_c, iy_c = G.qcell_deconstruct("a.c", DK)
    ix_n, iy_n = G.qcell_deconstruct("b.c", DK)
    d8c = ops_raster.d8_code_sql(
        f"(((({ix_n}) - ({ix_c}) + {n // 2}) % {n} + {n}) % {n}"
        f" - {n // 2})",
        f"(({iy_n}) - ({iy_c}))",
    )
    parts = [f"""
    WITH {_fd_best_cte()},
    eq AS MATERIALIZED (
      SELECT a.c, b.c AS nc, CAST({d8c} AS INT) AS d8c
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
        AND a.zv = b.zv
    ),
    b0 AS MATERIALIZED (
      SELECT c, CAST(0 AS BIGINT) AS bd FROM best
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    b{t} AS MATERIALIZED (
      SELECT c, min(bd) AS bd FROM (
        SELECT c, bd FROM b{t - 1}
        UNION ALL
        SELECT eq.c, b.bd + 1 AS bd
        FROM eq JOIN b{t - 1} b ON b.c = eq.nc
      ) u GROUP BY c
    )""")
    parts.append(f""",
    flats AS (
      SELECT v.c FROM cellv v LEFT JOIN best ON best.c = v.c
      WHERE best.c IS NULL
    ),
    pick AS (
      SELECT c, nc AS fnc, d8c AS fd8 FROM (
        SELECT f.c, eq.nc, eq.d8c, row_number() OVER (
                 PARTITION BY f.c ORDER BY bb.bd ASC, eq.d8c ASC
               ) AS rn
        FROM flats f
        JOIN eq ON eq.c = f.c
        JOIN b{rounds} bb ON bb.c = eq.nc
      ) WHERE rn = 1
    )
    SELECT v.c AS cell,
           CAST(coalesce(
             CASE WHEN best.c IS NULL THEN pick.fd8 END,
             best.d8c, 0) AS INT) AS d8,
           coalesce(
             CASE WHEN best.c IS NULL THEN pick.fnc END,
             best.nc, v.c) AS down_cell,
           CAST(coalesce(best.zd, 0) AS BIGINT) AS zdrop
    FROM cellv v
    LEFT JOIN best ON best.c = v.c
    LEFT JOIN pick ON pick.c = v.c
    """)
    return "".join(parts)


@gate("resolve_flats", _rf_sql(_RF_ROUNDS))
def q_resolve_flats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.resolve_flats(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x", max_rounds=_RF_ROUNDS,
    )


_CN_T = 5

_CN_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    walk AS (
      SELECT c AS src, nc AS cur FROM best
      UNION ALL
      SELECT w.src, b.nc FROM walk w JOIN best b ON b.c = w.cur
    ),
    accv AS MATERIALIZED (
      SELECT v.c, CAST(coalesce(a.cnt, 0) AS BIGINT) AS acc
      FROM cellv v LEFT JOIN (
        SELECT cur, count(*) AS cnt FROM walk GROUP BY cur
      ) a ON a.cur = v.c
    )
    SELECT b.c AS cell, b.nc AS down_cell, accv.acc
    FROM best b JOIN accv ON accv.c = b.c
    WHERE accv.acc >= {_CN_T}
"""


@gate("channel_network", _CN_SQL)
def q_channel_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.channel_network(
        _fd_cells(spark, sf_dir), res=_FD_RES,
        acc_threshold=_CN_T, cell="cell", value="x",
    )

