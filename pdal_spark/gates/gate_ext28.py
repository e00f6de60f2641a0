"""Gate registry extension 28 — local-hotspot & record-linkage batch:
Getis-Ord Gi* per-cell hotspot z-scores (the local complement of
Moran's I) and blocked edit-distance near-duplicate pairs (the
typo/transposition dedup MinHash's shingle view misses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# getis_ord_gi — per-cell hotspot z over res-4 event counts.
# ---------------------------------------------------------------------------

_GO_RES = 4

_GO_Z = (
    "(CAST(nbr_sum AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    " * CAST(n_i AS DOUBLE))"
    " / (sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))"
    " * sqrt((CAST(n AS DOUBLE) * CAST(n_i AS DOUBLE)"
    " - CAST(n_i AS DOUBLE) * CAST(n_i AS DOUBLE))"
    " / (CAST(n AS DOUBLE) - 1.0e0)))"
)

_GO_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _GO_RES)} AS c, count(*) AS xv
      FROM {_PTS} GROUP BY 1
    ),
    mom AS (
      SELECT count(*) AS n, sum(xv) AS sx, sum(xv * xv) AS ss
      FROM cellv
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
    ),
    nbrs AS (
      SELECT cellv.c,
             {G.qcell_neighbor('cellv.c', 'offs.dx', 'offs.dy',
                               _GO_RES, DK)} AS nc
      FROM cellv, offs
      WHERE {G.qcell_neighbor_valid('cellv.c', 'offs.dy', _GO_RES, DK)}
    ),
    per AS (
      SELECT nbrs.c, count(*) AS n_i, sum(v.xv) AS nbr_sum
      FROM nbrs JOIN cellv v ON v.c = nbrs.nc
      GROUP BY nbrs.c
    )
    SELECT per.c AS cell, n_i, nbr_sum,
           CASE WHEN n > n_i AND ss * n > sx * sx THEN {_GO_Z} END
             AS gi_z
    FROM per, mom
"""


@gate("getis_ord_gi", _GO_SQL)
def q_getis_ord_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_GO_RES, out="cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_stats.getis_ord_gi(
        cellv, res=_GO_RES, cell="cell", value="x"
    )


# ---------------------------------------------------------------------------
# edit_distance_pairs — blocked levenshtein near-dups over a short
# derived key (first 12 chars of the document text).
# ---------------------------------------------------------------------------

_ED_K = 2
_ED_P = 2

_ED_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id AS i, substr(text, 1, 12) AS ka,
             substr(text, 1, {_ED_P}) AS blk
      FROM documents WHERE length(text) >= 12
    )
    SELECT a.i AS a, b.i AS b, levenshtein(a.ka, b.ka) AS dist
    FROM s a JOIN s b ON b.blk = a.blk AND a.i < b.i
    WHERE abs(length(a.ka) - length(b.ka)) <= {_ED_K}
      AND levenshtein(a.ka, b.ka) <= {_ED_K}
"""


@gate("edit_distance_pairs", _ED_SQL)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.length("text") >= 12)
        .select("doc_id", F.expr("substr(text, 1, 12)").alias("k12"))
    )
    return ops_dedup.edit_distance_pairs(
        docs, key="k12", k=_ED_K, prefix=_ED_P, id_col="doc_id"
    )

