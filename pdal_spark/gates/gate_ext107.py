"""Gate registry extension 107 — detection/retrieval/inequality
batch: Kulldorff space-time scan, query-likelihood (Dirichlet)
retrieval, Hoover index, Theil's T."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB


# ---------------------------------------------------------------------------
# spacetime_scan — res-4 cells x event days, k <= 1 disks, 1-2 day
# windows
# ---------------------------------------------------------------------------
_SS_RES = 4
_SS_E = (
    "(cast(n_zone as double) * cast(n_win as double)"
    " / cast(big_n as double))"
)
_SS_LLR = (
    f"round(cast(n_obs as double) * ln(cast(n_obs as double)"
    f" / {_SS_E})"
    " + case when n_obs < big_n then"
    " (cast(big_n as double) - cast(n_obs as double))"
    " * ln((cast(big_n as double) - cast(n_obs as double))"
    f" / (cast(big_n as double) - {_SS_E})) else 0.0e0 end, 6)"
)
_SS_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _SS_RES)} AS c,
             epoch_us(ts) // 86400000000 AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT event_id, ts, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) p
      GROUP BY 1, 2
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
    ),
    centers AS (SELECT DISTINCT c FROM base),
    disk AS (
      SELECT centers.c,
             {G.qcell_neighbor('centers.c', 'offs.dx', 'offs.dy',
                               _SS_RES, DK)} AS nc,
             greatest(abs(offs.dx), abs(offs.dy)) AS ring
      FROM centers, offs
      WHERE {G.qcell_neighbor_valid('centers.c', 'offs.dy',
                                    _SS_RES, DK)}
    ),
    zd AS MATERIALIZED (
      SELECT disk.c, k.k, b.d, CAST(sum(b.cnt) AS BIGINT) AS n_ckd
      FROM disk
      JOIN base b ON b.c = disk.nc,
      (VALUES (0), (1)) k(k)
      WHERE disk.ring <= k.k
      GROUP BY 1, 2, 3
    ),
    wins(j, len) AS (VALUES (0, 1), (0, 2), (1, 2)),
    cand AS (
      SELECT c, k, d - j AS start, len,
             CAST(sum(n_ckd) AS BIGINT) AS n_obs
      FROM zd, wins GROUP BY 1, 2, 3, 4
    ),
    nz AS (
      SELECT c, k, CAST(sum(n_ckd) AS BIGINT) AS n_zone
      FROM zd GROUP BY 1, 2
    ),
    dt AS (
      SELECT d, CAST(sum(cnt) AS BIGINT) AS n_day
      FROM base GROUP BY 1
    ),
    nt AS (
      SELECT d - j AS start, len, CAST(sum(n_day) AS BIGINT) AS n_win
      FROM dt, wins GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS big_n FROM base)
    SELECT cand.c AS center, CAST(cand.k AS BIGINT) AS k,
           cand.start, CAST(cand.len AS BIGINT) AS win_len,
           n_obs, round({_SS_E}, 6) AS e_obs, {_SS_LLR} AS llr
    FROM cand
    JOIN nz ON nz.c = cand.c AND nz.k = cand.k
    JOIN nt ON nt.start = cand.start AND nt.len = cand.len, tot
    WHERE n_obs >= 3 AND cast(n_obs as double) > {_SS_E}
"""


@gate("spacetime_scan", _SS_SQL)
def q_spacetime_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    counts = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_SS_RES, out="cell")
        .select(
            "cell",
            F.expr("unix_micros(cast(ts as timestamp))"
                   " div 86400000000").alias("day"),
        )
        .groupBy("cell", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ops_pp.spacetime_scan(
        counts, res=_SS_RES, max_k=1, max_len=2, min_n=3,
        cell="cell", tbin="day", n="n",
    )


# ---------------------------------------------------------------------------
# qlm_topk — Dirichlet query likelihood over the bm25 token fixture
# ---------------------------------------------------------------------------
_QL_TERMS = ["join", "spark", "window"]
_QL_MU = 2000
_QL_K = 10
_QL_QF = G.fnum(float(ops_sim.QLM_Q))
_QL_MUF = G.fnum(float(_QL_MU))
_QL_LNQ = (
    "cast(floor(round(ln("
    "(cast(c as double) * cast(ctot as double)"
    f" + {_QL_MUF} * cast(ctf as double))"
    f" / ((cast(dl as double) + {_QL_MUF})"
    " * cast(ctot as double))"
    f"), 9) * {_QL_QF} + {G.fnum(0.5)}) as bigint)"
)
_QLM_SQL = f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    dl AS MATERIALIZED (SELECT d, count(*) AS dl FROM t GROUP BY d),
    tot AS (SELECT count(*) AS ctot FROM t),
    terms(w) AS (VALUES {", ".join(f"({w!r})" for w in _QL_TERMS)}),
    ctf AS (
      SELECT terms.w, CAST(coalesce(x.ctf, 0) AS BIGINT) AS ctf
      FROM terms LEFT JOIN (
        SELECT w, count(*) AS ctf FROM t
        JOIN terms USING (w) GROUP BY w
      ) x ON x.w = terms.w
    ),
    post AS MATERIALIZED (
      SELECT d, w, count(*) AS tf FROM t
      JOIN terms USING (w) GROUP BY d, w
    ),
    full_f AS (
      SELECT dl.d, CAST(coalesce(post.tf, 0) AS BIGINT) AS c,
             ctf.ctf, dl.dl, tot.ctot
      FROM dl CROSS JOIN ctf
      LEFT JOIN post ON post.d = dl.d AND post.w = ctf.w, tot
    ),
    sc AS (
      SELECT d, CAST(sum({_QL_LNQ}) AS BIGINT) AS score_q
      FROM full_f WHERE c > 0 OR ctf > 0 GROUP BY d
    )
    SELECT d AS doc_id, score_q,
           CAST(row_number() OVER (
             ORDER BY score_q DESC, d ASC) AS INT) AS rank
    FROM sc ORDER BY score_q DESC, d ASC LIMIT {_QL_K}
"""


@gate("qlm_topk", _QLM_SQL)
def q_qlm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    )
    return ops_sim.qlm_topk(
        toks, terms=_QL_TERMS, k=_QL_K, mu=_QL_MU,
        doc_id="doc_id", word="word",
    )


# ---------------------------------------------------------------------------
# hoover_index / theil_inequality — res-4 count lattice
# ---------------------------------------------------------------------------
_HI_RES = 4
_HI_CELLS = f"""
    cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _HI_RES)} AS c,
             CAST(count(*) AS BIGINT) AS xv
      FROM {_PTS} GROUP BY 1
    ),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(xv) AS BIGINT) AS tot FROM cellv)
"""

_HOOVER_SQL = f"""
    WITH {_HI_CELLS}
    SELECT n, tot,
           CAST(sum(abs(n * xv - tot)) AS BIGINT) AS sum_abs,
           cast(sum(abs(n * xv - tot)) as double)
             / (2.0e0 * cast(n as double) * cast(tot as double))
             AS hoover
    FROM cellv, mom GROUP BY n, tot
"""

_TH_RATIO = (
    "(cast(n as double) * cast(xv as double) / cast(tot as double))"
)
_TH_TERM = (
    f"case when xv > 0 then cast(floor({_TH_RATIO} * ln({_TH_RATIO})"
    f" * {G.fnum(float(ops_stats.THEIL_Q))} + {G.fnum(0.5)})"
    " as bigint) else 0 end"
)
_THEIL_SQL = f"""
    WITH {_HI_CELLS}
    SELECT n, tot, CAST(sum({_TH_TERM}) AS BIGINT) AS sum_q,
           round((cast(sum({_TH_TERM}) as double)
                  / {G.fnum(float(ops_stats.THEIL_Q))})
                 / cast(n as double), 9) AS theil_t
    FROM cellv, mom GROUP BY n, tot
"""


def _hi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        ops_h3.h3_encode(pts, "lat", "lon", res=_HI_RES, out="cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )


@gate("hoover_index", _HOOVER_SQL)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.hoover_index(_hi_cells(spark, sf_dir), value="x")


@gate("theil_inequality", _THEIL_SQL)
def q_theil_inequality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_stats.theil_inequality(
        _hi_cells(spark, sf_dir), value="x"
    )
