"""Gate registry extension 77 — partition-quality evaluation:
Newman modularity of the label_propagation communities (oracle
nests the LPA gate's unrolled-round SQL as the assignment CTE, the
prf_expansion convention) and clustering NMI between the embedding
labels and a deterministic 1-d quantization bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.gates.gate_ext13 import _LPA_ROUNDS, _lpa_sql
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators.cluster import NMI_Q, clustering_nmi

# ---------------------------------------------------------------------------
# modularity — sufficient statistics + one-division contribution per
# LPA community.
# ---------------------------------------------------------------------------


def _mod_sql() -> str:
    lpa = _lpa_sql(_LPA_ROUNDS)
    return f"""
    WITH assign AS MATERIALIZED (
      SELECT node, community AS c FROM ({lpa}) lp
    ),
    {_EDGES_SQL},
    mm AS (SELECT count(*) AS m FROM e),
    dsum AS (
      SELECT a.c, count(*) AS n_nodes,
             CAST(sum(deg.degree) AS BIGINT) AS d_c
      FROM deg JOIN assign a USING (node)
      GROUP BY 1
    ),
    intra AS (
      SELECT al.c, count(*) AS e_c
      FROM e
      JOIN assign al ON al.node = e.lo
      JOIN assign ah ON ah.node = e.hi
      WHERE al.c = ah.c
      GROUP BY 1
    )
    SELECT dsum.c AS community, dsum.n_nodes,
           CAST(coalesce(intra.e_c, 0) AS BIGINT) AS e_c,
           dsum.d_c, mm.m,
           CAST(4 * mm.m * coalesce(intra.e_c, 0)
                - dsum.d_c * dsum.d_c AS DOUBLE)
             / CAST(4 * mm.m * mm.m AS DOUBLE) AS q_contrib
    FROM dsum LEFT JOIN intra ON intra.c = dsum.c
    CROSS JOIN mm
    """


@gate("modularity", _mod_sql())
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    assign = ops_graph.label_propagation(e, rounds=_LPA_ROUNDS)
    return ops_graph.modularity(e, assign)


# ---------------------------------------------------------------------------
# clustering_nmi — embedding label vs floor(4 * first component):
# a crude 1-d quantization whose agreement with the labels is real
# but imperfect (0 < NMI < 1).
# ---------------------------------------------------------------------------

_NMI_BUCKET = "CAST(floor(embedding[{one}] * 4.0e0) AS INT)"


def _nmi_sql() -> str:
    b = _NMI_BUCKET.format(one=1)  # DuckDB lists are 1-based

    def lnq(x: str) -> str:
        return (
            f"CAST(floor(ln(CAST({x} AS DOUBLE)) * {NMI_Q}"
            " + 0.5e0) AS BIGINT)"
        )

    return f"""
    WITH pts AS MATERIALIZED (
      SELECT label AS a, {b} AS bkt FROM embeddings
    ),
    ct AS MATERIALIZED (
      SELECT a, bkt, count(*) AS n_ij FROM pts GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(sum(n_ij) AS BIGINT) AS a_i
           FROM ct GROUP BY 1),
    mb AS (SELECT bkt, CAST(sum(n_ij) AS BIGINT) AS b_j
           FROM ct GROUP BY 1),
    tot AS (SELECT CAST(sum(n_ij) AS BIGINT) AS n,
                   count(*) AS n_cells FROM ct),
    mi AS (
      SELECT CAST(sum(n_ij * ({lnq('n_ij * n')}
                   - {lnq('a_i * b_j')})) AS BIGINT) AS mi_qn
      FROM ct JOIN ma USING (a) JOIN mb USING (bkt) CROSS JOIN tot
    ),
    ha AS (
      SELECT CAST(sum(a_i * ({lnq('n')} - {lnq('a_i')}))
                  AS BIGINT) AS ha_qn
      FROM ma CROSS JOIN tot
    ),
    hb AS (
      SELECT CAST(sum(b_j * ({lnq('n')} - {lnq('b_j')}))
                  AS BIGINT) AS hb_qn
      FROM mb CROSS JOIN tot
    )
    SELECT n, n_cells, mi_qn, ha_qn, hb_qn,
           CASE WHEN ha_qn + hb_qn > 0 THEN
             2.0e0 * CAST(mi_qn AS DOUBLE)
               / CAST(ha_qn + hb_qn AS DOUBLE) END AS nmi
    FROM tot CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
    """


@gate("clustering_nmi", _nmi_sql())
def q_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("label").alias("lbl"),
        F.expr(
            "CAST(floor(element_at(embedding, 1) * 4.0e0) AS INT)"
        ).alias("bkt"),
    )
    return clustering_nmi(pts, "lbl", "bkt")

