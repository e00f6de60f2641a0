"""Gate registry extension 31 — prototype-classifier & geodesy-
normalization batch: per-label mean-embedding prototypes, nearest-
class-mean classification (exact integer argmin), and true spherical
cell areas (the per-km^2 density normalizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import similarity as ops_sim

# quantization (the vector_quantize/_QZ convention) with the label
# carried through
_QMAX = 127
_QZL = f"""
  (SELECT vec_id, label,
          list_transform(v, x -> round(x * {_QMAX} / m)) AS qv
   FROM (SELECT vec_id, label, v,
                list_max(list_transform(v, x -> abs(x))) AS m
         FROM (SELECT vec_id, label, cast(embedding as double[]) AS v
               FROM embeddings) r) s)
"""

_NCM_Q = ops_sim.NCM_Q

# ---------------------------------------------------------------------------
# label_centroids — trained on even vec_ids.
# ---------------------------------------------------------------------------

_LC_SQL = f"""
    WITH qz AS MATERIALIZED (SELECT * FROM {_QZL} z
                             WHERE vec_id % 2 = 0),
    e AS (
      SELECT label AS lbl, CAST(t.i AS INT) AS dim,
             CAST(qv[t.i + 1] AS BIGINT) AS vi
      FROM qz, unnest(range(len(qv))) AS t(i)
    )
    SELECT lbl AS label, dim, count(*) AS n,
           (sum(vi) * {_NCM_Q}) // count(*) AS cq
    FROM e GROUP BY lbl, dim
"""


def _spark_qz(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.quantize_vectors(emb, bits=8)


@gate("label_centroids", _LC_SQL)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    qz = _spark_qz(spark, sf_dir).where(F.col("vec_id") % 2 == 0)
    return ops_sim.label_centroids(qz, label="label", vec="qvec")


# ---------------------------------------------------------------------------
# ncm_classify — odd vec_ids classified against the even prototypes.
# ---------------------------------------------------------------------------

_NCM_SQL = f"""
    WITH qz AS MATERIALIZED (SELECT * FROM {_QZL} z),
    cent AS MATERIALIZED (
      SELECT lbl, dim, (sum(vi) * {_NCM_Q}) // count(*) AS cq
      FROM (
        SELECT label AS lbl, CAST(t.i AS INT) AS dim,
               CAST(qv[t.i + 1] AS BIGINT) AS vi
        FROM qz, unnest(range(len(qv))) AS t(i)
        WHERE vec_id % 2 = 0
      ) e GROUP BY lbl, dim
    ),
    probe AS (
      SELECT vec_id, CAST(t.i AS INT) AS dim,
             CAST(qv[t.i + 1] AS BIGINT) * {_NCM_Q} AS xq
      FROM qz, unnest(range(len(qv))) AS t(i)
      WHERE vec_id % 2 = 1
    ),
    d2 AS (
      SELECT p.vec_id, c.lbl,
             -- DuckDB sum(BIGINT) widens to HUGEINT, which pandas
             -- converts through float64 (rounds above 2^53): cast
             -- back while the true value still fits int64
             CAST(sum((p.xq - c.cq) * (p.xq - c.cq)) AS BIGINT) AS d2
      FROM probe p JOIN cent c ON c.dim = p.dim
      GROUP BY p.vec_id, c.lbl
    ),
    ranked AS (
      SELECT vec_id, lbl, d2,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY d2 ASC, lbl ASC
             ) AS rn
      FROM d2
    )
    SELECT vec_id, lbl AS pred, d2 FROM ranked WHERE rn = 1
"""


@gate("ncm_classify", _NCM_SQL)
def q_ncm_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    qz = _spark_qz(spark, sf_dir)
    cent = ops_sim.label_centroids(
        qz.where(F.col("vec_id") % 2 == 0), label="label", vec="qvec"
    )
    return ops_sim.ncm_classify(
        qz.where(F.col("vec_id") % 2 == 1), cent,
        label="label", vec="qvec",
    )


# ---------------------------------------------------------------------------
# cell_area — spherical km^2 per distinct res-6 cell.
# ---------------------------------------------------------------------------

_CA_RES = 6
_CA_N = 1 << _CA_RES

import math as _math  # noqa: E402

_CA_R2DL = 6371.0088 * 6371.0088 * (2.0 * _math.pi / _CA_N)


def _ca_sql() -> str:
    _, iy = G.qcell_deconstruct("h3_cell", G.DUCKDB)
    lat1 = (
        f"(cast({iy} as double) * {G.fnum(180.0 / _CA_N)}"
        f" - {G.fnum(90.0)})"
    )
    lat2 = f"({lat1} + {G.fnum(180.0 / _CA_N)})"
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT DISTINCT {G.qcell('lat', 'lon', _CA_RES)} AS h3_cell
      FROM {_PTS}
    )
    SELECT h3_cell,
           round({G.fnum(_CA_R2DL)}
             * (sin({lat2} * {G.fnum(G.RAD)})
                - sin({lat1} * {G.fnum(G.RAD)})), 6) AS area_km2
    FROM cells
    """


@gate("cell_area", _ca_sql())
def q_cell_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cells = ops_h3.h3_encode(pts, "lat", "lon", res=_CA_RES).select(
        "h3_cell"
    ).distinct()
    return ops_h3.cell_area_km2(cells, "h3_cell", res=_CA_RES)

