"""Gate registry extension 121 — unseen-mass/marked-pattern batch:
capture-recapture, Chao1 richness, mark correlation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# capture_recapture — two overlapping hash "snapshots" of a
# simulated page universe
# ---------------------------------------------------------------------------
_CR_UNIV = f"({G.lehmer2('event_id')} % 4096)"
_CR_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT DISTINCT {_CR_UNIV} AS id FROM events
      WHERE event_id % 3 = 0
    ),
    b AS MATERIALIZED (
      SELECT DISTINCT {_CR_UNIV} AS id FROM events
      WHERE event_id % 3 = 1
    ),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM a),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM b),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m
          FROM a JOIN b USING (id))
    SELECT n1, n2, m,
           case when m > 0 then
             cast(n1 as double) * cast(n2 as double)
             / cast(m as double) end AS lincoln_petersen,
           (cast(n1 as double) + 1.0e0)
             * (cast(n2 as double) + 1.0e0)
             / (cast(m as double) + 1.0e0) - 1.0e0 AS chapman
    FROM n1, n2, m
"""


@gate("capture_recapture", _CR_SQL)
def q_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where("event_id % 3 = 0").select(
        F.expr(_CR_UNIV).alias("id")
    )
    b = ev.where("event_id % 3 = 1").select(
        F.expr(_CR_UNIV).alias("id")
    )
    return ops_sketch.capture_recapture(a, b, id_col="id")


# ---------------------------------------------------------------------------
# chao1_richness — unseen URL-universe size from the frequency
# profile
# ---------------------------------------------------------------------------
_C1_ELEM = f"({G.lehmer2('event_id')} % 8192)"
_C1_SQL = f"""
    WITH cnt AS MATERIALIZED (
      SELECT {_C1_ELEM} AS e, count(*) AS c
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS s_obs,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
      FROM cnt
    )
    SELECT s_obs, f1, f2,
           cast(s_obs as double)
             + cast(f1 as double) * (cast(f1 as double) - 1.0e0)
             / (2.0e0 * (cast(f2 as double) + 1.0e0)) AS chao1
    FROM agg
"""


@gate("chao1_richness", _C1_SQL)
def q_chao1_richness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_C1_ELEM).alias("elem")
    )
    return ops_sketch.chao1_richness(ev, elem="elem")


# ---------------------------------------------------------------------------
# mark_correlation — the ripleys_k point sample with value marks
# ---------------------------------------------------------------------------
_MK_MOD = 7
_MK_Q = 1 << 10
_MK_BINS = 8
_MK_BIN_Q = 1 << 10
_MK_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT event_id AS pid,
             CAST(floor(({G.geo_lon('event_id')}) * {_MK_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_MK_Q})
                  AS BIGINT) AS yq,
             event_id % 17 AS mk
      FROM events WHERE event_id % {_MK_MOD} = 0
    ),
    pr AS MATERIALIZED (
      SELECT (a.xq - b.xq) * (a.xq - b.xq)
             + (a.yq - b.yq) * (a.yq - b.yq) AS d2,
             a.mk * b.mk AS mm
      FROM pts a JOIN pts b ON a.pid < b.pid
    )
    SELECT CAST(b.b AS BIGINT) AS bin, count(*) AS n_pairs,
           CAST(sum(mm) AS BIGINT) AS sum_mm
    FROM pr, (SELECT unnest(range({_MK_BINS})) AS b) b
    WHERE pr.d2 > 0
      AND pr.d2 >= b.b * b.b * {_MK_BIN_Q * _MK_BIN_Q}
      AND pr.d2 < (b.b + 1) * (b.b + 1) * {_MK_BIN_Q * _MK_BIN_Q}
    GROUP BY 1
"""


@gate("mark_correlation", _MK_SQL)
def q_mark_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _MK_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id").select(
        "event_id", "lon", "lat",
        (F.col("event_id") % 17).alias("mk"),
    )
    out = ops_stats.mark_correlation(
        pts, mark="mk", id_col="event_id",
        bin_q=_MK_BIN_Q, n_bins=_MK_BINS, coord_q=_MK_Q,
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"), "n_pairs", "sum_mm"
    )
