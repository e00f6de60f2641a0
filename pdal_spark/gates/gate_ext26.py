"""Gate registry extension 26 — grouped-sketch & audit batch:
per-group HDR quantiles (the dashboard GROUP BY percentile pass),
truncated harmonic centrality of a crawl seed set (BFS-fold), and the
Benford first-digit audit (fabricated-data detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext14 import _bfs_sql
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# hdr_grouped_quantiles — per event_type percentiles of o_totalprice-
# style positive values (events.value mills).
# ---------------------------------------------------------------------------

_HG_QS = ((1, 2), (9, 10), (99, 100))
_HG_S = ops_sketch.HDR_SUB_BITS


def _hg_sql() -> str:
    b = ops_sketch.hdr_bucket_sql("v", _HG_S, DK)
    lb = ops_sketch.hdr_lb_sql("v", _HG_S, DK)
    qvals = ", ".join(f"({a}, {d})" for a, d in _HG_QS)
    return f"""
    WITH vals AS (
      SELECT event_type AS g,
             CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                  + {G.fnum(0.5)}) AS BIGINT) AS v
      FROM events
      WHERE CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                 + {G.fnum(0.5)}) AS BIGINT) >= 1
    ),
    hist AS (
      SELECT g, {b} AS bucket, min({lb}) AS lb, count(*) AS cnt
      FROM vals GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, bucket, lb,
             sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS total
      FROM hist
    ),
    q(q_num, q_den) AS (VALUES {qvals})
    SELECT g AS event_type, q_num, q_den, min(lb) AS est
    FROM cum, q
    WHERE cum >= ((q_num * total + q_den - 1) // q_den)
    GROUP BY 1, 2, 3
    """


@gate("hdr_grouped_quantiles", _hg_sql())
def q_hdr_grouped_quantiles(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.expr(
            "cast(floor(cast(value as double) * 1000.0e0"
            " + 0.5e0) as bigint)"
        ).alias("v"),
    )
    return ops_sketch.hdr_quantile_by_group(
        ev, "event_type", "v", list(_HG_QS)
    )


# ---------------------------------------------------------------------------
# harmonic_centrality — fold over the unrolled BFS oracle.
# ---------------------------------------------------------------------------

_HC_SEEDS = [0, 5]
_HC_DEPTH = 3

_HC_SQL = f"""
    WITH lv AS MATERIALIZED (
      {_bfs_sql(_HC_SEEDS, _HC_DEPTH)}
    )
    SELECT count(*) AS n_reached,
           sum(CAST({ops_graph.HC_Q} AS BIGINT) // level) AS hc_q
    FROM lv WHERE level >= 1
"""


@gate("harmonic_centrality", _HC_SQL)
def q_harmonic_centrality(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    from pdal_spark.gates.gate_ext12 import _edges

    return ops_graph.harmonic_centrality(
        _edges(spark, sf_dir), seeds=_HC_SEEDS, max_depth=_HC_DEPTH,
        directed=True,
    )


# ---------------------------------------------------------------------------
# benford_deviation — first-digit audit of events.value mills.
# ---------------------------------------------------------------------------

_BD_E = " ".join(
    f"WHEN {d} THEN {G.fnum(p)}"
    for d, p in enumerate(ops_stats.BENFORD_P, start=1)
)

_BD_SQL = f"""
    WITH vq AS (
      SELECT CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                  + {G.fnum(0.5)}) AS BIGINT) AS v
      FROM events
    ),
    obs AS (
      SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
             count(*) AS obs
      FROM vq WHERE v >= 1 GROUP BY 1
    ),
    n AS (SELECT sum(obs) AS n FROM obs)
    SELECT digit, obs,
           (CASE digit {_BD_E} END) * CAST(n AS DOUBLE) AS expected,
           (CAST(obs AS DOUBLE) - (CASE digit {_BD_E} END)
              * CAST(n AS DOUBLE))
           * (CAST(obs AS DOUBLE) - (CASE digit {_BD_E} END)
              * CAST(n AS DOUBLE))
           / ((CASE digit {_BD_E} END) * CAST(n AS DOUBLE)) AS contrib
    FROM obs, n
"""


@gate("benford_deviation", _BD_SQL)
def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.benford_deviation(ev, "value")

