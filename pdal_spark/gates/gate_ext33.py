"""Gate registry extension 33 — sampling/crop-completion/containment
batch: Morton systematic spatial sample (zero-shuffle thinning),
outside-form of the many-polygon cell join, and asymmetric shingle
containment pairs (Broder's resemblance-vs-containment distinction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _shingle_sql, _t, gate
from pdal_spark.gates.gate_ext21 import _cj_polys, _cj_wkt
from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import sampling as ops_sampling
from pdal_spark.operators import textops as ops_text

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# morton_sample — keep 1/7 of the key space.
# ---------------------------------------------------------------------------

_MS_NUM, _MS_DEN = 1, 7
_MS_RES = 26

_MS_SQL = f"""
    SELECT event_id FROM {_PTS}
    WHERE ({G.morton_from_lonlat('lat', 'lon', _MS_RES, DK)})
          % {_MS_DEN} < {_MS_NUM}
"""


@gate("morton_sample", _MS_SQL)
def q_morton_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_sampling.morton_sample(
        pts, _MS_NUM, _MS_DEN, res=_MS_RES
    ).select("event_id")


# ---------------------------------------------------------------------------
# crop_celljoin_outside — points in NO polygon of the table fixture.
# ---------------------------------------------------------------------------

_CO_NOT = " AND ".join(
    f"NOT ({G.raycast_pip('lon', 'lat', [ring])})"
    for _, ring in _cj_polys()
)

_CO_SQL = f"""
    SELECT event_id FROM {_PTS}
    WHERE {_CO_NOT}
"""


@gate("crop_celljoin_outside", _CO_SQL)
def q_crop_celljoin_outside(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    pts = _points(spark, sf_dir)
    polys = spark.createDataFrame(
        [(gid, _cj_wkt(ring)) for gid, ring in _cj_polys()],
        "geom_id int, wkt string",
    )
    out = ops_crop.crop_polygons_celljoin_outside(
        pts, polys, res=5, id_col="event_id"
    )
    return out.select("event_id")


# ---------------------------------------------------------------------------
# containment_pairs — asymmetric subset detection; oracle is the
# brute-force rare-shingle candidate join + exact intersection
# (identical blocking contract).
# ---------------------------------------------------------------------------

_CT_NUM, _CT_DEN = 3, 5
_CT_MAXDF = 50

_CT_SQL = f"""
    WITH sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    freq AS (
      SELECT shingle, count(*) AS df FROM sh GROUP BY 1
    ),
    rare AS (
      SELECT sh.doc_id, sh.shingle FROM sh
      JOIN freq ON freq.shingle = sh.shingle
      WHERE freq.df <= {_CT_MAXDF}
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM rare l JOIN rare r ON r.shingle = l.shingle
      WHERE l.doc_id <> r.doc_id
    ),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.a
      JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b, i.inter, za.sz AS sz_a,
           CAST(i.inter AS DOUBLE) / CAST(za.sz AS DOUBLE)
             AS containment
    FROM inter i JOIN sz za ON za.doc_id = i.a
    WHERE {_CT_DEN} * i.inter >= {_CT_NUM} * za.sz
"""


@gate("containment_pairs", _CT_SQL)
def q_containment_pairs(spark: SparkSession, sf_dir: str
                        ) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.containment_pairs(
        docs, _CT_NUM, _CT_DEN, max_df=_CT_MAXDF, vocab_df=v
    )

