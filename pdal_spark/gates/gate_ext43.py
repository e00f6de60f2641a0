"""Gate registry extension 43 — stay-point & contrast batch: per-cell
dwell time (visit DURATION, not ping counts) and smoothed log-odds
discriminating keywords between two corpus slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import hexbin as ops_hexbin
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# cell_dwell — gap seconds attributed to the starting cell.
# ---------------------------------------------------------------------------

_CD_RES = 5

_CD_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id, event_id, ts,
             {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon
      FROM events
    ),
    stepped AS (
      SELECT {G.qcell('lat', 'lon', _CD_RES)} AS cell,
             epoch_us(lead(ts) OVER w) // 1000000
               - epoch_us(ts) // 1000000 AS gap
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT cell, count(*) AS n_visits,
           CAST(sum(gap) AS BIGINT) AS dwell_s
    FROM stepped WHERE gap IS NOT NULL GROUP BY cell
"""


@gate("cell_dwell", _CD_SQL)
def q_cell_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_hexbin.cell_dwell(pts, res=_CD_RES)


# ---------------------------------------------------------------------------
# log_odds_keywords — English slice vs the rest of the corpus.
# ---------------------------------------------------------------------------

_LO_K = 20
_LO_P = 1
_LO_QF = G.fnum(float(ops_text.LOGODDS_Q))


def _lo_term(c: str, t: str) -> str:
    num = f"CAST({c} + {_LO_P} AS DOUBLE)"
    den = f"CAST({t} + {_LO_P} * v - {c} - {_LO_P} AS DOUBLE)"
    return (
        f"CAST(floor(ln({num} / {den}) * {_LO_QF}"
        f" + {G.fnum(0.5)}) AS BIGINT)"
    )


_LO_SQL = f"""
    WITH ta_t AS MATERIALIZED (
      SELECT word, count(*) AS ca FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE lang = 'en'
      ) t GROUP BY word
    ),
    tb_t AS MATERIALIZED (
      SELECT word, count(*) AS cb FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE lang <> 'en'
      ) t GROUP BY word
    ),
    j AS (
      SELECT coalesce(ta_t.word, tb_t.word) AS word,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM ta_t FULL OUTER JOIN tb_t ON tb_t.word = ta_t.word
    ),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS ta,
             CAST(sum(cb) AS BIGINT) AS tb,
             count(*) AS v
      FROM j
    )
    SELECT word, ca, cb,
           ({_lo_term('ca', 'ta')}) - ({_lo_term('cb', 'tb')})
             AS delta_q
    FROM j, tot
    ORDER BY delta_q DESC, word ASC LIMIT {_LO_K}
"""


@gate("log_odds_keywords", _LO_SQL)
def q_log_odds_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.log_odds_keywords(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        top_k=_LO_K, prior=_LO_P,
    )
