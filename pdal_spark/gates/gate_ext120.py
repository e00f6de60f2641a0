"""Gate registry extension 120 — reliability batch: quadratic
weighted kappa, one-way ICC, Cronbach's alpha."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# weighted_kappa — correlated ordinal grades 0..4
# ---------------------------------------------------------------------------
_WK_A = f"({G.lehmer2('event_id')} % 5)"
_WK_B = (
    f"greatest(0, least(4, ({_WK_A})"
    f" + ({G.lehmer2('event_id * 3 + 1')} % 3) - 1))"
)
_WK_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_WK_A} AS i, {_WK_B} AS j FROM events
    ),
    obs AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS o
      FROM s GROUP BY i, j
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    ra AS (SELECT i, CAST(sum(o) AS BIGINT) AS r_i
           FROM obs GROUP BY i),
    cb AS (SELECT j, CAST(sum(o) AS BIGINT) AS c_j
           FROM obs GROUP BY j),
    num AS (SELECT CAST(sum((i - j) * (i - j) * o) AS BIGINT) AS wo
            FROM obs),
    den AS (
      SELECT CAST(sum((i - j) * (i - j) * r_i * c_j) AS BIGINT)
        AS we
      FROM ra, cb
    )
    SELECT n, wo, we,
           case when we > 0 then
             1.0e0 - cast(n as double) * cast(wo as double)
             / cast(we as double) end AS wkappa
    FROM tot, num, den
"""


@gate("weighted_kappa", _WK_SQL)
def q_weighted_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_WK_A).alias("ga"), F.expr(_WK_B).alias("gb")
    )
    return ops_stats.weighted_kappa(ev, "ga", "gb", n_levels=5)


# ---------------------------------------------------------------------------
# icc_oneway — 3 pseudo-ratings per document around a per-doc level
# ---------------------------------------------------------------------------
_IC_Y = f"(doc_id % 50 + {G.mix_hash('doc_id * 3 + r')} % 5)"
_IC_SQL = f"""
    WITH ratings AS MATERIALIZED (
      SELECT doc_id AS item, {_IC_Y} AS y
      FROM documents, (SELECT unnest(range(0, 3)) AS r) t
    ),
    per AS (
      SELECT item, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM ratings GROUP BY item
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(ss) AS BIGINT) AS sst,
             CAST(sum(s * s) AS BIGINT) AS s2
      FROM per
    )
    SELECT g, CAST(3 AS BIGINT) AS k,
           g * s2 - st * st AS ssb_q,
           3 * sst - s2 AS ssw_q,
           case when
             cast(g * s2 - st * st as double)
             / (cast(g as double) - 1.0e0)
             + (cast(3 as double) - 1.0e0)
             * cast(3 * sst - s2 as double)
             / (cast(3 as double) - 1.0e0) <> 0.0e0 then
             (cast(g * s2 - st * st as double)
              / (cast(g as double) - 1.0e0)
              - cast(3 * sst - s2 as double)
              / (cast(3 as double) - 1.0e0))
             / (cast(g * s2 - st * st as double)
                / (cast(g as double) - 1.0e0)
                + (cast(3 as double) - 1.0e0)
                * cast(3 * sst - s2 as double)
                / (cast(3 as double) - 1.0e0)) end AS icc
    FROM g
"""


@gate("icc_oneway", _IC_SQL)
def q_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ratings = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r"),
    ).select(
        F.col("doc_id").alias("item"),
        F.expr(_IC_Y).alias("y"),
    )
    return ops_stats.icc_oneway(ratings, item="item", value="y")


# ---------------------------------------------------------------------------
# cronbach_alpha — three items sharing a common per-event factor
# ---------------------------------------------------------------------------
_CA_I1 = f"(event_id % 20 + {G.lehmer2('event_id')} % 5)"
_CA_I2 = f"(event_id % 20 + {G.lehmer2('event_id * 3 + 1')} % 5)"
_CA_I3 = f"(event_id % 20 + {G.lehmer2('event_id * 5 + 2')} % 5)"
_CA_TOT = f"(({_CA_I1}) + ({_CA_I2}) + ({_CA_I3}))"
_CA_IV = " + ".join(
    f"(cast(n as double) * cast(ss{i} as double)"
    f" - cast(s{i} as double) * cast(s{i} as double))"
    for i in range(3)
)
_CA_TV = (
    "(cast(n as double) * cast(sst as double)"
    " - cast(st as double) * cast(st as double))"
)
_CA_SQL = f"""
    WITH m AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CA_I1}) AS BIGINT) AS s0,
             CAST(sum(({_CA_I1}) * ({_CA_I1})) AS BIGINT) AS ss0,
             CAST(sum({_CA_I2}) AS BIGINT) AS s1,
             CAST(sum(({_CA_I2}) * ({_CA_I2})) AS BIGINT) AS ss1,
             CAST(sum({_CA_I3}) AS BIGINT) AS s2,
             CAST(sum(({_CA_I3}) * ({_CA_I3})) AS BIGINT) AS ss2,
             CAST(sum({_CA_TOT}) AS BIGINT) AS st,
             CAST(sum(({_CA_TOT}) * ({_CA_TOT})) AS BIGINT) AS sst
      FROM events
    )
    SELECT n, 3 AS k,
           case when {_CA_TV} > 0 then
             (cast(3 as double) / (cast(3 as double) - 1.0e0))
             * (1.0e0 - ({_CA_IV}) / {_CA_TV}) end AS alpha
    FROM m
"""


@gate("cronbach_alpha", _CA_SQL)
def q_cronbach_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_CA_I1).alias("i1"),
        F.expr(_CA_I2).alias("i2"),
        F.expr(_CA_I3).alias("i3"),
    )
    return ops_stats.cronbach_alpha(ev, ["i1", "i2", "i3"])
