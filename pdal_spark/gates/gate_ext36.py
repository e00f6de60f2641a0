"""Gate registry extension 36 — drift-monitoring & series-compression
batch: Population Stability Index between two slices (THE production
drift monitor) and one Haar wavelet level over per-key series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# psi_drift — first-half vs second-half users of the events table.
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0.0, 500.0
_PSI_QF = G.fnum(float(ops_stats.PSI_Q))

_PSI_B = (
    f"least({_PSI_BINS - 1}, greatest(0,"
    f" CAST(floor((CAST(value AS DOUBLE) - {G.fnum(_PSI_LO)})"
    f" / {G.fnum(_PSI_HI - _PSI_LO)} * {G.fnum(float(_PSI_BINS))})"
    " AS INT)))"
)

_PSI_RATIO = (
    f"(CAST((n_a + 1) AS DOUBLE) * CAST(tb + {_PSI_BINS} AS DOUBLE))"
    f" / (CAST((n_b + 1) AS DOUBLE)"
    f" * CAST(ta + {_PSI_BINS} AS DOUBLE))"
)
_PSI_LNQ = (
    f"CAST(floor(ln({_PSI_RATIO}) * {_PSI_QF} + {G.fnum(0.5)})"
    " AS BIGINT)"
)
_PSI_DNUM = (
    f"((n_a + 1) * (tb + {_PSI_BINS})"
    f" - (n_b + 1) * (ta + {_PSI_BINS}))"
)

_PSI_SQL = f"""
    WITH ca AS (
      SELECT {_PSI_B} AS bin, count(*) AS c_a
      FROM events WHERE user_id < 75 GROUP BY 1
    ),
    cb AS (
      SELECT {_PSI_B} AS bin, count(*) AS c_b
      FROM events WHERE user_id >= 75 GROUP BY 1
    ),
    bins AS (SELECT CAST(t.i AS INT) AS bin
             FROM unnest(range({_PSI_BINS})) AS t(i)),
    j AS (
      SELECT bins.bin, coalesce(c_a, 0) AS n_a,
             coalesce(c_b, 0) AS n_b
      FROM bins LEFT JOIN ca ON ca.bin = bins.bin
      LEFT JOIN cb ON cb.bin = bins.bin
    ),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
    SELECT bin, n_a, n_b,
           {_PSI_DNUM} * {_PSI_LNQ} AS contrib_q,
           (CAST({_PSI_DNUM} AS DOUBLE)
             / (CAST(ta + {_PSI_BINS} AS DOUBLE)
                * CAST(tb + {_PSI_BINS} AS DOUBLE)))
             * (CAST({_PSI_LNQ} AS DOUBLE) / {_PSI_QF}) AS contrib
    FROM j, tot
"""


@gate("psi_drift", _PSI_SQL)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.psi_drift(
        ev.where(F.col("user_id") < 75),
        ev.where(F.col("user_id") >= 75),
        "value", _PSI_LO, _PSI_HI, n_bins=_PSI_BINS,
    )


# ---------------------------------------------------------------------------
# haar_downsample — one level over per-user value series.
# ---------------------------------------------------------------------------

_HA_QF = G.fnum(float(ops_temporal.HAAR_Q))

_HAAR_SQL = f"""
    WITH ranked AS (
      SELECT user_id,
             CAST(floor(CAST(value AS DOUBLE) * {_HA_QF}
                  + {G.fnum(0.5)}) AS BIGINT) AS vq,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) - 1 AS r
      FROM events
    ),
    g AS (
      SELECT user_id, r // 2 AS pair, count(*) AS n,
             sum(vq) AS s,
             max(CASE WHEN r % 2 = 0 THEN vq END) AS a,
             max(CASE WHEN r % 2 = 1 THEN vq END) AS b
      FROM ranked GROUP BY 1, 2
    )
    SELECT user_id, pair, n,
           CASE WHEN n = 2 THEN s ELSE 2 * s END AS approx2_q,
           CASE WHEN n = 2 THEN a - b ELSE CAST(0 AS BIGINT) END
             AS detail2_q
    FROM g
"""


@gate("haar_downsample", _HAAR_SQL)
def q_haar_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.haar_downsample(ev)

