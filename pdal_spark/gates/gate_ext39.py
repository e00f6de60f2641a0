"""Gate registry extension 39 — concentration & diversity batch:
per-group Gini coefficient (traffic-inequality lens on hot keys) and
categorical Shannon entropy (behavioral-diversity fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# gini — value concentration within each event_type.
# ---------------------------------------------------------------------------

_GI_VQ = (
    f"CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}"
    f" + {G.fnum(0.5)}) AS BIGINT)"
)

_GINI_SQL = f"""
    WITH ranked AS (
      SELECT event_type, {_GI_VQ} AS vq,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY {_GI_VQ} ASC, value ASC
             ) AS i
      FROM events
    ),
    mom AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(vq) AS BIGINT) AS s,
             CAST(sum(i * vq) AS BIGINT) AS iw
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n, s, iw,
           CASE WHEN s > 0 THEN
             CAST(2 * iw - (n + 1) * s AS DOUBLE)
               / CAST(n * s AS DOUBLE) END AS gini
    FROM mom
"""


@gate("gini", _GINI_SQL)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.gini(ev, "event_type", "value")


# ---------------------------------------------------------------------------
# category_entropy — event-type mix per user.
# ---------------------------------------------------------------------------

_CE_QF = G.fnum(float(ops_stats.ENTROPY_Q))
_CE_LNQ = (
    f"CAST(floor(ln(CAST(c AS DOUBLE)) * {_CE_QF} + {G.fnum(0.5)})"
    " AS BIGINT)"
)

_CE_SQL = f"""
    WITH cnt AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT user_id, sum(c) AS n, count(*) AS n_cats,
             CAST(sum(c * ({_CE_LNQ})) AS BIGINT) AS clnq
      FROM cnt GROUP BY user_id
    )
    SELECT user_id, n, n_cats,
           round(ln(CAST(n AS DOUBLE))
             - (CAST(clnq AS DOUBLE) / {_CE_QF})
               / CAST(n AS DOUBLE), 9) AS entropy
    FROM mom
"""


@gate("category_entropy", _CE_SQL)
def q_category_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.category_entropy(ev, "user_id", "event_type")

