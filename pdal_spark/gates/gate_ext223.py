"""Gate registry extension 223 — capacity batch: prefix fan-out
and hash-collision audit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

_PF_TERM = "concat(event_type, cast(event_id % 50 as string))"
_PF_TERM_DK = "(event_type || CAST(event_id % 50 AS VARCHAR))"
_PF_ML = 4
_PF_SQL = f"""
    WITH terms AS MATERIALIZED (
      SELECT DISTINCT {_PF_TERM_DK} AS w FROM events
    ),
    ladder AS (
      SELECT CAST(t.plen AS BIGINT) AS plen,
             substring(w, 1, t.plen) AS pfx
      FROM terms,
           (SELECT unnest(range(1, {_PF_ML + 1})) AS plen) t
      WHERE length(w) >= t.plen
    ),
    per AS (
      SELECT plen, pfx, CAST(count(*) AS BIGINT) AS fanout
      FROM ladder GROUP BY plen, pfx
    )
    SELECT plen, CAST(count(*) AS BIGINT) AS n_prefixes,
           CAST(max(fanout) AS BIGINT) AS max_fanout,
           cast(sum(fanout) as double)
             / cast(count(*) as double) AS avg_fanout
    FROM per GROUP BY plen
"""


@gate("prefix_fanout", _PF_SQL)
def q_prefix_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_PF_TERM).alias("w")
    )
    return ops_text.prefix_fanout(ev, term="w", max_len=_PF_ML)


_CA_M = 64
_CA_BASE = G.fnum(1.0 - 1.0 / _CA_M)
_CA_KEY = "(event_id % 997)"
_CA_SQL = f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT CAST({_CA_KEY} AS BIGINT) AS k0 FROM events
    ),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys),
    used AS (
      SELECT CAST(count(DISTINCT ({G.mix_hash('k0')}) % {_CA_M})
               AS BIGINT) AS used_buckets
      FROM keys
    )
    SELECT n, CAST({_CA_M} AS BIGINT) AS m, used_buckets,
           CAST(n - used_buckets AS BIGINT) AS collisions,
           round(cast(n as double) - {G.fnum(float(_CA_M))}
             * (1.0e0 - power({_CA_BASE}, cast(n as double))), 6)
             + 0.0e0 AS expected_r
    FROM n_t, used
"""


@gate("collision_audit", _CA_SQL)
def q_collision_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(event_id % 997 as bigint)").alias("k0")
    )
    return ops_text.collision_audit(
        ev, key="k0", n_buckets=_CA_M
    )
