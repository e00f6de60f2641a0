"""Gate registry extension 21 — scale-join & sequence-analytics batch:
cell-keyed many-polygon PIP join (the beyond-broadcast spatial-join
path; oracle = brute-force per-polygon ray cast), CUSUM change-point
detection (pure-integer |n*S_k - k*S_n| argmax), and MMR diversity
rerank (unrolled greedy selection over quantized-integer cosines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.gates.gate_ext7 import _QZ
from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators.similarity import _dot, _norm

# ---------------------------------------------------------------------------
# crop_celljoin — polygons as a TABLE (the 10^6-geometry path):
# covering-cell explode x point qcell equi-join + numpy refine.
# Oracle: brute-force per-polygon SQL ray cast (no cells at all) —
# hash equality proves the candidate join LOSSLESS and the refine
# exact. Fixture edges are non-axis-aligned and vertices sit off the
# millidegree point grid, so no point lies on a boundary and the
# numpy kernel's eps-boundary rule cannot diverge from the SQL cast.
# ---------------------------------------------------------------------------


def _cj_polys() -> list[tuple[int, list[tuple[float, float]]]]:
    out = []
    for g in range(12):
        h = (g * 48271 + 11) % 31
        cx = -160.0 + g * 27.37 + h * 0.113
        cy = -60.0 + ((g * 7919) % 120) * 0.93 + 0.217
        r = 3.0 + (g % 4) * 1.7
        ring = [
            (cx + r * 1.01, cy + r * 0.13),
            (cx + r * 0.21, cy + r * 1.07),
            (cx - r * 0.93, cy + r * 0.41),
            (cx - r * 0.37, cy - r * 0.89),
            (cx + r * 0.59, cy - r * 0.67),
        ]
        out.append((g, ring))
    return out


_CJ_RES = 5


def _cj_wkt(ring: list[tuple[float, float]]) -> str:
    pts = ", ".join(f"{x} {y}" for x, y in ring + [ring[0]])
    return f"POLYGON (({pts}))"


_CJ_SQL = "\nUNION ALL\n".join(
    f"""SELECT event_id, {gid} AS geom_id FROM {_PTS}
    WHERE {G.raycast_pip('lon', 'lat', [ring])}"""
    for gid, ring in _cj_polys()
)


@gate("crop_celljoin", _CJ_SQL)
def q_crop_celljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    polys = spark.createDataFrame(
        [(gid, _cj_wkt(ring)) for gid, ring in _cj_polys()],
        "geom_id int, wkt string",
    )
    out = ops_crop.crop_polygons_celljoin(pts, polys, res=_CJ_RES)
    return out.select("event_id", "geom_id")


# ---------------------------------------------------------------------------
# cusum_changepoint — per-user level-shift argmax, all int64.
# ---------------------------------------------------------------------------

_CU_Q = G.fnum(float(ops_temporal.CUSUM_Q))

_CUSUM_SQL = f"""
    WITH vq AS MATERIALIZED (
      SELECT user_id, ts, event_id,
             CAST(floor(CAST(value AS DOUBLE) * {_CU_Q}
                  + {G.fnum(0.5)}) AS BIGINT) AS vq
      FROM events
    ),
    scored AS (
      SELECT user_id, ts,
             row_number() OVER w AS k,
             sum(vq) OVER w AS sk,
             count(*) OVER (PARTITION BY user_id) AS n,
             sum(vq) OVER (PARTITION BY user_id) AS sn
      FROM vq
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    cand AS (
      SELECT user_id, n, k, ts, abs(n * sk - k * sn) AS score,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY abs(n * sk - k * sn) DESC, k ASC
             ) AS rn
      FROM scored WHERE k < n
    )
    SELECT user_id, n, k AS split_k, ts AS split_ts, score
    FROM cand WHERE rn = 1
"""


@gate("cusum_changepoint", _CUSUM_SQL)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.cusum_changepoint(ev)


# ---------------------------------------------------------------------------
# mmr_rerank — greedy diversity selection; the oracle carries the
# selected set through k unrolled CTE steps (quantized-integer dots
# keep every score — hence the SELECTION — bit-identical).
# ---------------------------------------------------------------------------

_MMR_K = 8
_MMR_LAM = 0.7
_MMR_LO, _MMR_HI = 1, 40


def _mmr_sql(k: int, lam: float) -> str:
    lam_f = G.fnum(float(lam))
    rem_f = G.fnum(1.0 - float(lam))

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    parts = [f"""
    WITH qz AS MATERIALIZED (SELECT * FROM {_QZ} z),
    cands AS MATERIALIZED (
      SELECT c.vec_id, c.qv, {cos('c.qv', 'q.qv')} AS rel
      FROM qz c, (SELECT qv FROM qz WHERE vec_id = 0) q
      WHERE c.vec_id BETWEEN {_MMR_LO} AND {_MMR_HI}
    ),
    s1 AS MATERIALIZED (
      SELECT vec_id, qv, 1 AS sel_rank, {lam_f} * rel AS mmr
      FROM cands ORDER BY {lam_f} * rel DESC, vec_id ASC LIMIT 1
    ),
    sel1 AS (SELECT vec_id, qv FROM s1)"""]
    for i in range(2, k + 1):
        parts.append(f""",
    s{i} AS MATERIALIZED (
      SELECT vec_id, qv, {i} AS sel_rank, mmr FROM (
        SELECT c.vec_id, c.qv,
               {lam_f} * c.rel
                 - {rem_f} * max({cos('c.qv', 's.qv')}) AS mmr
        FROM cands c, sel{i - 1} s
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        GROUP BY c.vec_id, c.qv, c.rel
      ) t ORDER BY mmr DESC, vec_id ASC LIMIT 1
    ),
    sel{i} AS (
      SELECT vec_id, qv FROM sel{i - 1}
      UNION ALL SELECT vec_id, qv FROM s{i}
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT vec_id, sel_rank, round(mmr, 9) AS mmr FROM s{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n    {finals}")
    return "".join(parts)


@gate("mmr_rerank", _mmr_sql(_MMR_K, _MMR_LAM))
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qz = ops_sim.quantize_vectors(emb, bits=8)
    qrow = qz.where(F.col("vec_id") == 0).select("qvec").collect()[0]
    qarr = F.array(*[F.lit(float(v)) for v in qrow["qvec"]])
    v = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    cands = qz.where(
        (F.col("vec_id") >= _MMR_LO) & (F.col("vec_id") <= _MMR_HI)
    ).select(
        "vec_id",
        F.col("qvec"),
        (_dot(v, qarr) / (_norm(v) * _norm(qarr))).alias("rel"),
    )
    out = ops_sim.mmr_rerank(
        cands, k=_MMR_K, lam=_MMR_LAM, rel="rel", vec="qvec",
        id_col="vec_id",
    )
    return out.select(
        "vec_id", "sel_rank", F.round("mmr", 9).alias("mmr")
    )

