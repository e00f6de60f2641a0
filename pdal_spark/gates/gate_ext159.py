"""Gate registry extension 159 — circular batch: circular-linear
correlation and von Mises concentration."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import pointpattern as ops_pp

_RAD = G.fnum(math.pi / 180.0)

# bearings hashed from events; x carries a planted cos-dependence
_CL_B = f"(CAST({G.lehmer2('event_id')} % 360 AS BIGINT))"
_CL_X = (
    f"(CAST(floor(100.0e0 + 50.0e0 * cos({_CL_B} * {_RAD})"
    f" + CAST({G.lehmer2('event_id * 3 + 1')} % 20 AS BIGINT))"
    " AS BIGINT))"
)

_CL_QF = G.fnum(float(ops_pp.CLC_Q))
_CL_CQ = (
    f"CAST(floor(round(cos(({_CL_B}) * {_RAD}), 9)"
    f" * {_CL_QF} + 0.5e0) AS BIGINT)"
)
_CL_SQ = (
    f"CAST(floor(round(sin(({_CL_B}) * {_RAD}), 9)"
    f" * {_CL_QF} + 0.5e0) AS BIGINT)"
)


def _clc_corr(sab: str, sa: str, sb: str, saa: str,
              sbb: str) -> str:
    num = (
        f"(cast(n as double) * cast({sab} as double)"
        f" - cast({sa} as double) * cast({sb} as double))"
    )
    da = (
        f"(cast(n as double) * cast({saa} as double)"
        f" - cast({sa} as double) * cast({sa} as double))"
    )
    db = (
        f"(cast(n as double) * cast({sbb} as double)"
        f" - cast({sb} as double) * cast({sb} as double))"
    )
    return f"({num} / sqrt({da} * {db}))"


_CL_RXC = _clc_corr("sxc", "sx", "sc", "sxx", "scc")
_CL_RXS = _clc_corr("sxs", "sx", "ss", "sxx", "sss")
_CL_RCS = _clc_corr("scs", "sc", "ss", "scc", "sss")
_CL_R2 = (
    f"(({_CL_RXC} * {_CL_RXC} + {_CL_RXS} * {_CL_RXS}"
    f" - 2.0e0 * {_CL_RXC} * {_CL_RXS} * {_CL_RCS})"
    f" / (1.0e0 - {_CL_RCS} * {_CL_RCS}))"
)
_CL_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_CL_X} AS x, {_CL_CQ} AS c, {_CL_SQ} AS s
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(s) AS BIGINT) AS ss,
             CAST(sum(x * c) AS BIGINT) AS sxc,
             CAST(sum(x * s) AS BIGINT) AS sxs,
             CAST(sum(c * s) AS BIGINT) AS scs,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(c * c) AS BIGINT) AS scc,
             CAST(sum(s * s) AS BIGINT) AS sss
      FROM s
    )
    SELECT n,
           CASE WHEN n > 2 THEN {_CL_RXC} END AS r_xc,
           CASE WHEN n > 2 THEN {_CL_RXS} END AS r_xs,
           CASE WHEN n > 2 THEN {_CL_RCS} END AS r_cs,
           CASE WHEN n > 2 THEN {_CL_R2} END AS r2
    FROM m
"""


@gate("circ_linear_corr", _CL_SQL)
def q_circ_linear_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_CL_B).alias("b"), F.expr(_CL_X).alias("x")
    )
    return ops_pp.circ_linear_corr(ev, bearing="b", value="x")


# ---------------------------------------------------------------------------
# vonmises_kappa — per-user-bucket heading concentration
# ---------------------------------------------------------------------------
_VM_QF = G.fnum(float(ops_pp.CIRC_Q))
_VM_B = (
    f"(CAST({G.lehmer2('event_id')} % 120 AS BIGINT)"
    " + (user_id % 4) * 15)"
)
_VM_CQ = (
    f"CAST(floor(round(cos(({_VM_B}) * {_RAD}), 9)"
    f" * {_VM_QF} + 0.5e0) AS BIGINT)"
)
_VM_SQ = (
    f"CAST(floor(round(sin(({_VM_B}) * {_RAD}), 9)"
    f" * {_VM_QF} + 0.5e0) AS BIGINT)"
)
_VM_R = (
    "(sqrt(cast(sc as double) * cast(sc as double)"
    " + cast(ss as double) * cast(ss as double))"
    f" / (cast(n as double) * {_VM_QF}))"
)
_VM_KAPPA = (
    f"CASE WHEN {_VM_R} > 0.99999e0 THEN NULL"
    f" WHEN {_VM_R} < 0.53e0 THEN"
    f" 2.0e0 * {_VM_R} + {_VM_R} * {_VM_R} * {_VM_R}"
    f" + 5.0e0 * {_VM_R} * {_VM_R} * {_VM_R} * {_VM_R} * {_VM_R}"
    " / 6.0e0"
    f" WHEN {_VM_R} < 0.85e0 THEN"
    f" -0.4e0 + 1.39e0 * {_VM_R} + 0.43e0 / (1.0e0 - {_VM_R})"
    f" ELSE 1.0e0 / ({_VM_R} * {_VM_R} * {_VM_R}"
    f" - 4.0e0 * {_VM_R} * {_VM_R} + 3.0e0 * {_VM_R}) END"
)
_VM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 8 AS k, {_VM_CQ} AS c, {_VM_SQ} AS s
      FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(s) AS BIGINT) AS ss
      FROM s GROUP BY k
    )
    SELECT k, n, round({_VM_R}, 9) AS r_res,
           CASE WHEN n > 0 THEN round({_VM_KAPPA}, 9) END AS kappa
    FROM agg
"""


@gate("vonmises_kappa", _VM_SQL)
def q_vonmises_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("k"),
        F.expr(_VM_B).alias("b"),
    )
    return ops_pp.vonmises_kappa(ev, key="k", bearing="b")
