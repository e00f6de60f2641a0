"""Gate registry extension 58 — feature-evaluation batch: decision-
stump Gini split scoring and weight-of-evidence binning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# gini_split — feature = round(value) (bounds the threshold table),
# label = signup events. Oracle mirrors the prefix-sum form.
# ---------------------------------------------------------------------------

_GS_PRED = "event_type = 'signup'"


def _gini_sql() -> str:
    from pdal_spark.operators.stats import SPLIT_Q

    qq = SPLIT_Q
    return f"""
    WITH per AS MATERIALIZED (
      SELECT round(value) AS threshold, count(*) AS n,
             sum(CASE WHEN {_GS_PRED} THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT threshold,
             sum(n) OVER (ORDER BY threshold ASC
                          ROWS UNBOUNDED PRECEDING) AS n_l,
             sum(p) OVER (ORDER BY threshold ASC
                          ROWS UNBOUNDED PRECEDING) AS pos_l,
             sum(n) OVER () AS nt, sum(p) OVER () AS pt
      FROM per
    )
    SELECT threshold, CAST(n_l AS BIGINT) AS n_l,
           CAST(pos_l AS BIGINT) AS pos_l,
           CAST(nt - n_l AS BIGINT) AS n_r,
           CAST(pt - pos_l AS BIGINT) AS pos_r,
           CAST(({qq} * (pos_l * pos_l
                  + (n_l - pos_l) * (n_l - pos_l))) // n_l
              + ({qq} * ((pt - pos_l) * (pt - pos_l)
                  + ((nt - n_l) - (pt - pos_l))
                    * ((nt - n_l) - (pt - pos_l)))) // (nt - n_l)
             AS BIGINT) AS score_q
    FROM c WHERE nt - n_l > 0
    """


@gate("gini_split", _gini_sql())
def q_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import gini_split

    ev = _t(spark, sf_dir, "events").select(
        F.round("value").alias("f"), "event_type"
    )
    return gini_split(ev, feature="f", label_pred=_GS_PRED)


# ---------------------------------------------------------------------------
# woe_bins — value in [0, 200] x 10 bins, label = error events.
# ---------------------------------------------------------------------------

_WB_PRED = "event_type = 'error'"
_WB_LO, _WB_HI, _WB_NB = 0.0, 200.0, 10


def _woe_sql() -> str:
    from pdal_spark.operators.stats import WOE_Q

    qs = G.fnum(float(WOE_Q))
    lo, hi, nb = G.fnum(_WB_LO), G.fnum(_WB_HI), _WB_NB
    return f"""
    WITH a AS MATERIALIZED (
      SELECT CAST(least({nb - 1}, greatest(0,
               floor((value - {lo}) / ({hi} - {lo}) * {nb})))
             AS INT) AS bin,
             CAST(sum(CASE WHEN {_WB_PRED} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN {_WB_PRED} THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_neg
      FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(n_pos) + {nb} AS pt,
                   sum(n_neg) + {nb} AS nt FROM a)
    SELECT bin, n_pos, n_neg,
           CAST(CAST(floor(ln(CAST((n_pos + 1) * nt AS DOUBLE))
                * {qs} + 0.5e0) AS BIGINT)
              - CAST(floor(ln(CAST((n_neg + 1) * pt AS DOUBLE))
                * {qs} + 0.5e0) AS BIGINT) AS BIGINT) AS woe_q
    FROM a CROSS JOIN tot
    """


@gate("woe_bins", _woe_sql())
def q_woe_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import woe_bins

    return woe_bins(
        _t(spark, sf_dir, "events"), value="value",
        label_pred=_WB_PRED, lo=_WB_LO, hi=_WB_HI, n_bins=_WB_NB,
    )
