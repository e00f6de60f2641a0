"""Gate registry extension 100 — Knox space-time interaction,
Johnson-Lindenstrauss hash-signed projection, small-group
suppression."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import textops as ops_text

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")

# ---------------------------------------------------------------------------
# knox_test — space-time interaction over the mod-17 event subset
# ---------------------------------------------------------------------------
_KX_MOD = 17
_KX_S = 20000          # 20 degrees in millidegrees
_KX_T = 86_400_000_000  # 1 day in microseconds

_KX_SQL = f"""
    WITH sub AS MATERIALIZED (
      SELECT event_id AS pid,
             CAST(floor(({_LON}) * 1000.0 + 0.5) AS BIGINT) AS mx,
             CAST(floor(({_LAT}) * 1000.0 + 0.5) AS BIGINT) AS my,
             epoch_us(ts) AS tus
      FROM events WHERE event_id % {_KX_MOD} = 0
    ),
    pr AS (
      SELECT CASE WHEN (a.mx - b.mx) * (a.mx - b.mx)
                  + (a.my - b.my) * (a.my - b.my)
                  <= {_KX_S} * {_KX_S} THEN 1 ELSE 0 END AS cs,
             CASE WHEN abs(a.tus - b.tus) <= {_KX_T}
                  THEN 1 ELSE 0 END AS ct
      FROM sub a JOIN sub b ON a.pid < b.pid
    ),
    agg AS (
      SELECT CAST(sum(cs) AS BIGINT) AS s_pairs,
             CAST(sum(ct) AS BIGINT) AS t_pairs,
             CAST(sum(cs * ct) AS BIGINT) AS st_pairs
      FROM pr
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sub)
    SELECT n, s_pairs, t_pairs, st_pairs,
           CASE WHEN s_pairs > 0 AND t_pairs > 0 THEN
             CAST(st_pairs AS DOUBLE)
             * (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0e0)
             / (CAST(s_pairs AS DOUBLE) * CAST(t_pairs AS DOUBLE))
           END AS knox_ratio
    FROM agg, nn
"""


@gate("knox_test", _KX_SQL)
def q_knox_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _KX_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id").select(
        F.col("event_id").alias("pid"), "lat", "lon", "ts"
    )
    return ops_pp.knox_test(
        pts, x="lon", y="lat", ts="ts", id_col="pid",
        space_md=_KX_S, time_us=_KX_T,
    )


# ---------------------------------------------------------------------------
# jl_projection — hash-signed JL sketch of the embeddings table.
# Oracle leads the unrolled sum with 0.0e0 so the first-term
# association matches Spark's aggregate() fold bit-for-bit.
# ---------------------------------------------------------------------------
_JL_K = 8
_JL_D = 64


def _jl_sql() -> str:
    import math

    inv = 1.0 / math.sqrt(float(_JL_K))
    cols = []
    for k in range(_JL_K):
        terms = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE)"
            f" * {G.fnum(float(ops_sim.jl_sign(d, k)) * inv)}"
            for d in range(_JL_D)
        )
        cols.append(f"({G.fnum(0.0)} + {terms}) AS j{k}")
    return (
        "SELECT vec_id, " + ",\n           ".join(cols)
        + " FROM embeddings"
    )


@gate("jl_projection", _jl_sql())
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.jl_projection(emb, out_dim=_JL_K, dims=_JL_D)


# ---------------------------------------------------------------------------
# suppress_small_groups — small-count suppression over
# (event_type, user bucket) counts
# ---------------------------------------------------------------------------
_SG_K = 25

_SG_SQL = f"""
    WITH g AS (
      SELECT event_type AS a, user_id % 64 AS b, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT CASE WHEN n < {_SG_K} THEN '__other__'
                  ELSE a END AS event_type,
             CASE WHEN n < {_SG_K} THEN '__other__'
                  ELSE CAST(b AS VARCHAR) END AS ubucket,
             n
      FROM g
    )
    SELECT event_type, ubucket, CAST(sum(n) AS BIGINT) AS n
    FROM r GROUP BY 1, 2
"""


@gate("suppress_small_groups", _SG_SQL)
def q_suppress_small_groups(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "ubucket", F.col("user_id") % 64
    )
    return ops_text.suppress_small_groups(
        ev, ["event_type", "ubucket"], k=_SG_K
    )
