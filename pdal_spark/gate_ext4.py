"""Gate registry extension 4 — ground classification
(filters.smrf / filters.pmf as sparse-grid morphology). Imported
from gate_ext3 (end of chain).

The DuckDB oracles are generated from the same driver-side parameter
series the engine uses (`ground.pmf_windows`, slope*cell*r
thresholds), and every arithmetic step mirrors the Spark expression
tree op-for-op (min/max/sub/abs/sqrt, power-of-two divisors), so the
integer class outputs hash-compare exactly with no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import ground as ops_ground

# points with an elevation payload: events.value as z
_ZPTS = _PTS.replace(
    "SELECT event_id,", "SELECT event_id, value AS z,"
)

_OFFS_SQL = "(VALUES (0,0),(1,0),(-1,0),(0,1),(0,-1)) AS o(dx, dy)"


def _morph_cte(name: str, src: str, how: str) -> str:
    """One unit diamond erosion (min) / dilation (max) over the
    occupied domain — gather formulation, equi-join on exploded
    offsets (same result as the engine's scatter + semi-join)."""
    return f"""{name} AS (
      SELECT t.cx, t.cy, {how}(s.v) AS v
      FROM (SELECT d.cx + o.dx AS scx, d.cy + o.dy AS scy, d.cx, d.cy
            FROM dom d CROSS JOIN {_OFFS_SQL}) t
      JOIN {src} s ON s.cx = t.scx AND s.cy = t.scy
      GROUP BY t.cx, t.cy)"""


_CELL = 16.0  # power of two: /cell and /2 are IEEE-exact
_SMRF_R = 3
_SMRF_SLOPE, _SMRF_SCALAR, _SMRF_THRESH = 0.15, 1.25, 5.0


def _grid_ctes() -> list[str]:
    c = G.fnum(_CELL)
    return [
        f"pts AS (SELECT event_id, z, "
        f"cast(floor(lon / {c}) as bigint) AS cx, "
        f"cast(floor(lat / {c}) as bigint) AS cy FROM {_ZPTS})",
        "g0 AS (SELECT cx, cy, min(z) AS v FROM pts GROUP BY 1, 2)",
        "dom AS (SELECT cx, cy FROM g0)",
    ]


def _smrf_sql() -> str:
    ctes = _grid_ctes()
    erosion = "g0"
    opens = []
    for r in range(1, _SMRF_R + 1):
        e = f"e{r}"
        ctes.append(_morph_cte(e, erosion, "min"))
        erosion = e
        cur = e
        for i in range(1, r + 1):
            o = f"o{r}_{i}"
            ctes.append(_morph_cte(o, cur, "max"))
            cur = o
        opens.append(cur)
    joins = " ".join(f"JOIN {o} USING (cx, cy)" for o in opens)
    scols = ", ".join(
        f"{o}.v AS s{r}" for r, o in enumerate(opens, start=1)
    )
    ctes.append(
        f"m AS (SELECT g0.cx, g0.cy, g0.v AS s0, {scols} "
        f"FROM g0 {joins})"
    )
    obj = " OR ".join(
        f"abs(s{r-1} - s{r}) > {G.fnum(_SMRF_SLOPE * _CELL * r)}"
        for r in range(1, _SMRF_R + 1)
    )
    ctes.append(
        f"zp AS (SELECT cx, cy, CASE WHEN {obj} THEN s{_SMRF_R} "
        f"ELSE s0 END AS zipro FROM m)"
    )
    ctes.append(
        f"sc AS (SELECT cx, cy, zipro, zipro / {G.fnum(_CELL)} AS s "
        f"FROM zp)"
    )
    ctes.append(
        """nb AS (
      SELECT a.cx, a.cy, a.zipro, a.s,
             xp.s AS xp, xm.s AS xm, yp.s AS yp, ym.s AS ym
      FROM sc a
      LEFT JOIN sc xp ON xp.cx = a.cx + 1 AND xp.cy = a.cy
      LEFT JOIN sc xm ON xm.cx = a.cx - 1 AND xm.cy = a.cy
      LEFT JOIN sc yp ON yp.cx = a.cx AND yp.cy = a.cy + 1
      LEFT JOIN sc ym ON ym.cx = a.cx AND ym.cy = a.cy - 1)"""
    )

    def g1(p: str, m: str) -> str:
        two = G.fnum(2.0)
        return (
            f"CASE WHEN {p} IS NOT NULL AND {m} IS NOT NULL "
            f"THEN ({p} - {m}) / {two} "
            f"WHEN {p} IS NOT NULL THEN {p} - s "
            f"WHEN {m} IS NOT NULL THEN s - {m} "
            f"ELSE {G.fnum(0.0)} END"
        )

    ctes.append(
        f"gr AS (SELECT cx, cy, zipro, {g1('xp', 'xm')} AS gx, "
        f"{g1('yp', 'ym')} AS gy FROM nb)"
    )
    ctes.append(
        f"th AS (SELECT cx, cy, zipro, {G.fnum(_SMRF_THRESH)} + "
        f"{G.fnum(_SMRF_SCALAR)} * sqrt(gx * gx + gy * gy) AS cthr "
        f"FROM gr)"
    )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT p.event_id,
           CASE WHEN abs(t.zipro - p.z) <= t.cthr THEN 2 ELSE 1 END
             AS cls
    FROM pts p JOIN th t ON t.cx = p.cx AND t.cy = p.cy
    """


@gate("smrf_ground", _smrf_sql())
def q_smrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).join(
        _t(spark, sf_dir, "events").select(
            "event_id", F.col("value").alias("z")
        ),
        on="event_id",
    )
    out = ops_ground.smrf(
        pts, cell=_CELL, slope=_SMRF_SLOPE, window=_SMRF_R * _CELL,
        scalar=_SMRF_SCALAR, threshold=_SMRF_THRESH,
        x="lon", y="lat", z="z", id_col="event_id",
    )
    return out.select("event_id", "cls")


_PMF_KW = dict(
    cell_size=_CELL, max_window=9 * _CELL, slope=0.05,
    initial_distance=8.0, max_distance=40.0, exponential=True,
)


def _pmf_sql() -> str:
    series = ops_ground.pmf_windows(
        _PMF_KW["cell_size"], _PMF_KW["max_window"], _PMF_KW["slope"],
        _PMF_KW["initial_distance"], _PMF_KW["max_distance"],
        _PMF_KW["exponential"],
    )
    ctes = _grid_ctes()
    cur = "g0"
    surfs = []
    for j, (_ws, _ht, iters) in enumerate(series):
        for i in range(iters):
            n = f"p{j}e{i}"
            ctes.append(_morph_cte(n, cur, "min"))
            cur = n
        for i in range(iters):
            n = f"p{j}d{i}"
            ctes.append(_morph_cte(n, cur, "max"))
            cur = n
        surfs.append(cur)
    joins = " ".join(f"JOIN {s} USING (cx, cy)" for s in surfs)
    zcols = ", ".join(
        f"{s}.v AS z{j}" for j, s in enumerate(surfs)
    )
    ctes.append(
        f"m AS (SELECT dom.cx, dom.cy, {zcols} FROM dom {joins})"
    )
    ground = " AND ".join(
        f"(p.z - m.z{j}) < {G.fnum(ht)}"
        for j, (_ws, ht, _it) in enumerate(series)
    )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT p.event_id,
           CASE WHEN {ground} THEN 2 ELSE 1 END AS cls
    FROM pts p JOIN m ON m.cx = p.cx AND m.cy = p.cy
    """


@gate("pmf_ground", _pmf_sql())
def q_pmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).join(
        _t(spark, sf_dir, "events").select(
            "event_id", F.col("value").alias("z")
        ),
        on="event_id",
    )
    out = ops_ground.pmf(
        pts, x="lon", y="lat", z="z", id_col="event_id", **_PMF_KW
    )
    return out.select("event_id", "cls")
