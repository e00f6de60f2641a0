"""Gate registry extension 71 — WEIGHTED Count-Min sketch: the
existing cms_frequency gate counts occurrences; this one folds a
per-row integer WEIGHT into the counters (cms_build's weight_col —
bytes-per-URL / tokens-per-doc hot-key mass, not hit counts), and
point-queries the same way. Exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import sketch as ops_sketch

_CW_D = ops_sketch.CMS_D
_CW_W = ops_sketch.CMS_W
# element = user_id % 512; weight = the event's integer payload size
_CW_WT = "(1 + (event_id % 97))"


def _cms_weighted_sql() -> str:
    d, w = _CW_D, _CW_W
    idx = ", ".join(str(i) for i in range(d))
    h = G.mix_hash("(elem * 31 + i)")
    return f"""
    WITH t AS MATERIALIZED (
      SELECT user_id % 512 AS elem,
             CAST({_CW_WT} AS BIGINT) AS wt
      FROM events
    ),
    cells AS MATERIALIZED (
      SELECT i AS row, ({h} % {w}) AS col, wt
      FROM t, (SELECT unnest([{idx}]) AS i) ii
    ),
    cms AS MATERIALIZED (
      SELECT row, col, CAST(sum(wt) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    probes AS MATERIALIZED (
      SELECT elem, CAST(sum(wt) AS BIGINT) AS exact_mass
      FROM t GROUP BY 1
    ),
    pcells AS (
      SELECT elem, i AS row, ({h} % {w}) AS col
      FROM probes, (SELECT unnest([{idx}]) AS i) ii
    )
    SELECT p.elem, p.exact_mass,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p
    JOIN pcells pc USING (elem)
    LEFT JOIN cms c ON pc.row = c.row AND pc.col = c.col
    GROUP BY 1, 2
    """


@gate("cms_weighted", _cms_weighted_sql())
def q_cms_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 512).alias("elem"),
        F.expr(_CW_WT).cast("long").alias("wt"),
    )
    cms = ops_sketch.cms_build(ev, "elem", weight_col="wt")
    probes = ev.groupBy("elem").agg(
        F.sum("wt").alias("exact_mass")
    )
    est = ops_sketch.cms_estimate(
        probes.select("elem"), cms, "elem"
    )
    return probes.join(est, on="elem")

