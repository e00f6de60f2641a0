"""Gate registry extension 108 — vector->raster lines and
heavy-tail classing: DDA line rasterization, line density,
head/tail breaks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# dda_cells / line_density — lehmer-scattered short segments
# ---------------------------------------------------------------------------
_DD_MOD = 29
_DD_X1 = f"({G.lehmer2('event_id')} % 200)"
_DD_Y1 = f"({G.lehmer2('event_id * 3 + 1')} % 200)"
_DD_X2 = f"({G.lehmer2('event_id * 5 + 2')} % 200)"
_DD_Y2 = f"({G.lehmer2('event_id * 7 + 3')} % 200)"

_DD_SEGS = f"""
    segs AS MATERIALIZED (
      SELECT event_id AS sid,
             {_DD_X1} AS ax, {_DD_Y1} AS ay,
             {_DD_X2} AS bx, {_DD_Y2} AS by,
             greatest(abs({_DD_X2} - {_DD_X1}),
                      abs({_DD_Y2} - {_DD_Y1})) AS steps
      FROM events WHERE event_id % {_DD_MOD} = 0
    ),
    stepped AS (
      SELECT sid, ax, ay, bx, by, steps,
             unnest(range(0, steps + 1)) AS i
      FROM segs
    ),
    cells AS (
      SELECT sid, i,
             ax + (CASE WHEN steps = 0 THEN 0 ELSE
               (CASE WHEN bx - ax >= 0 THEN 1 ELSE -1 END)
               * ((2 * abs(bx - ax) * i + steps) // (2 * steps))
               END) AS cx,
             ay + (CASE WHEN steps = 0 THEN 0 ELSE
               (CASE WHEN by - ay >= 0 THEN 1 ELSE -1 END)
               * ((2 * abs(by - ay) * i + steps) // (2 * steps))
               END) AS cy
      FROM stepped
    )
"""

_DDA_SQL = f"""
    WITH {_DD_SEGS}
    SELECT sid AS seg_id, CAST(i AS BIGINT) AS step, cx, cy
    FROM cells
"""

_LD_SQL = f"""
    WITH {_DD_SEGS},
    per AS (
      SELECT cx, cy, sid, CAST(count(*) AS BIGINT) AS n_samples
      FROM cells GROUP BY cx, cy, sid
    )
    SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(n_samples) AS BIGINT) AS n_samples
    FROM per GROUP BY cx, cy
"""


def _dd_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").where(
        F.col("event_id") % _DD_MOD == 0
    ).select(
        F.col("event_id").alias("seg_id"),
        F.expr(_DD_X1).alias("x1"),
        F.expr(_DD_Y1).alias("y1"),
        F.expr(_DD_X2).alias("x2"),
        F.expr(_DD_Y2).alias("y2"),
    )


@gate("dda_cells", _DDA_SQL)
def q_dda_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.dda_cells(_dd_segments(spark, sf_dir)).select(
        "seg_id", F.col("step").cast("long").alias("step"),
        "cx", "cy",
    )


@gate("line_density", _LD_SQL)
def q_line_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.line_density(_dd_segments(spark, sf_dir))


# ---------------------------------------------------------------------------
# head_tail_breaks — cubed-hash heavy tail (power-law-ish, so the
# recursion reaches several levels)
# ---------------------------------------------------------------------------
_HT_V = (
    f"(({G.lehmer2('event_id')} % 100)"
    f" * ({G.lehmer2('event_id')} % 100)"
    f" * ({G.lehmer2('event_id')} % 100))"
)
_HT_Q = ops_stats.HTB_Q
_HT_LEVELS = 6
_HT_FRAC = 400  # 0.4 * 1000


def _ht_sql() -> str:
    parts = [f"""
    WITH v0 AS MATERIALIZED (
      SELECT {_HT_V} AS v FROM events
    )"""]
    selects = []
    conds: list[str] = []
    for k in range(_HT_LEVELS):
        parts.append(f""",
    a{k} AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             (CAST(sum(v) AS BIGINT) * {_HT_Q}) // count(*)
               AS mean_q
      FROM v{k}
    ),
    h{k} AS (
      SELECT CAST(count(*) AS BIGINT) AS n_head
      FROM v{k}, a{k} WHERE v * {_HT_Q} > a{k}.mean_q
    )""")
        if k + 1 < _HT_LEVELS:
            parts.append(f""",
    v{k + 1} AS MATERIALIZED (
      SELECT v FROM v{k}, a{k} WHERE v * {_HT_Q} > a{k}.mean_q
    )""")
        where = " AND ".join(
            [f"a{k}.n >= 2"] + conds
        )
        froms = ", ".join(
            [f"a{k}", f"h{k}"]
            + [f"a{j}" for j in range(k)]
            + [f"h{j}" for j in range(k)]
        )
        # deduplicate FROM aliases already present
        froms = ", ".join(dict.fromkeys(froms.split(", ")))
        selects.append(
            f"SELECT CAST({k} AS INT) AS level, a{k}.n AS n,"
            f" h{k}.n_head AS n_head, a{k}.mean_q AS mean_q"
            f" FROM {froms} WHERE {where}"
        )
        conds.append(
            f"h{k}.n_head >= 2"
            f" AND h{k}.n_head * 1000 <= {_HT_FRAC} * a{k}.n"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@gate("head_tail_breaks", _ht_sql())
def q_head_tail_breaks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_HT_V).alias("x")
    )
    return ops_stats.head_tail_breaks(
        ev, value="x", max_levels=_HT_LEVELS, head_max_frac=0.4
    )
