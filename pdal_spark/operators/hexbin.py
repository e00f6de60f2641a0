"""Density tessellation — filters.hexbin re-expressed as groupBy.

Reference: filters/HexBinFilter.cpp streams points into a hex grid
(:170-177 processOne) or H3 grid, then at done() (:224-301) emits
per-cell counts, the dense-cell boundary, density = count/area and
avg point spacing. PDAL's auto-edge sampling of the first 5000 points
(:76-77,132-155) is order-dependent, so this engine requires an
explicit ``size`` / ``res`` (SURVEY.md §7 risks).

Spark shape: one hash-aggregate with map-side partial aggregation —
the cheapest possible distributed plan (one shuffle of partial
counts, not points). At 100 TB the shuffle volume is O(#cells), not
O(#rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK


def hexbin(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    size: float = 0.25,
    threshold: int = 1,
    with_centers: bool = True,
) -> DataFrame:
    """Per-hex-cell counts + density; cells below threshold dropped.

    Output: hex_id, cnt, density (+ hex_x, hex_y centers).
    """
    out = (
        df.select(F.expr(G.hexcell(f"`{x}`", f"`{y}`", size)).alias("hex_id"))
        .groupBy("hex_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if threshold > 1:
        out = out.where(F.col("cnt") >= threshold)
    # exact double division (no rounding needed for oracle parity:
    # cnt and the area constant are identical on both sides).
    out = out.withColumn(
        "density", F.col("cnt") / F.lit(G.hex_area(size))
    )
    if with_centers:
        out = out.withColumn(
            "hex_x", F.expr(G.hexcell_center_x("`hex_id`", size, _D))
        ).withColumn(
            "hex_y", F.expr(G.hexcell_center_y("`hex_id`", size, _D))
        )
    return out


def h3bin(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    threshold: int = 1,
) -> DataFrame:
    """H3-grid variant (HexBinFilter h3_grid mode): counts per qcell."""
    out = (
        df.select(
            F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res)).alias("h3_cell")
        )
        .groupBy("h3_cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if threshold > 1:
        out = out.where(F.col("cnt") >= threshold)
    return out


def density_summary(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    threshold: int = 1,
) -> DataFrame:
    """hexbin's done() metadata as a 1-row DataFrame: total points in
    dense cells, dense-cell count, avg density (HexBinFilter.cpp:224+)."""
    cells = h3bin(df, lat, lon, res, threshold)
    return cells.agg(
        F.sum("cnt").alias("dense_points"),
        F.count(F.lit(1)).alias("dense_cells"),
        F.avg("cnt").alias("avg_cnt"),
    )


def density_boundary_edges(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    threshold: int = 1,
) -> DataFrame:
    """The dissolved dense-cell boundary (HexBinFilter.cpp:224-301
    writeBoundary) in exact distributed form: the set of cell edges
    NOT shared by two dense cells. Each dense cell contributes its 4
    lattice edges (H(ix,iy), H(ix,iy+1), V(ix,iy), V(ix+1,iy));
    interior edges appear twice and cancel via HAVING count = 1 — a
    groupBy dissolve, one extra shuffle of O(4 x #dense cells) edge
    keys, no geometry library.

    Output: (orient, x1, y1, x2, y2) — edge endpoints in degrees
    (exact linear lattice->degree arithmetic, oracle-checkable).
    Ring assembly into MULTIPOLYGON WKT is driver-side
    (`boundary_multipolygon`) over this already-small edge set.
    """
    cells = h3bin(df, lat, lon, res, threshold)
    ix_e, iy_e = G.qcell_deconstruct("h3_cell", _D)
    c = cells.select(
        F.expr(ix_e).alias("ix"), F.expr(iy_e).alias("iy")
    )
    edges = c.select(
        F.explode(
            F.array(
                F.struct(F.lit("H").alias("orient"),
                         F.col("ix").alias("ex"),
                         F.col("iy").alias("ey")),
                F.struct(F.lit("H").alias("orient"),
                         F.col("ix").alias("ex"),
                         (F.col("iy") + 1).alias("ey")),
                F.struct(F.lit("V").alias("orient"),
                         F.col("ix").alias("ex"),
                         F.col("iy").alias("ey")),
                F.struct(F.lit("V").alias("orient"),
                         (F.col("ix") + 1).alias("ex"),
                         F.col("iy").alias("ey")),
            )
        ).alias("e")
    ).select("e.orient", "e.ex", "e.ey")
    boundary = (
        edges.groupBy("orient", "ex", "ey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 1)
    )
    n = 1 << res
    sx = 360.0 / n
    sy = 180.0 / n
    x1 = F.lit(-180.0) + F.col("ex") * F.lit(sx)
    y1 = F.lit(-90.0) + F.col("ey") * F.lit(sy)
    return boundary.select(
        "orient",
        x1.alias("x1"), y1.alias("y1"),
        F.when(F.col("orient") == "H", x1 + F.lit(sx))
        .otherwise(x1).alias("x2"),
        F.when(F.col("orient") == "V", y1 + F.lit(sy))
        .otherwise(y1).alias("y2"),
    )


def boundary_multipolygon(edges) -> str:
    """Driver-side ring assembly of `density_boundary_edges` output
    (a pandas DataFrame or list of Rows) into MULTIPOLYGON WKT — the
    reference's boundary metadata string. Each lattice vertex of a
    dissolved cell union touches exactly 2 boundary edges (4-corner
    touches don't occur on a square lattice's edge-cancel dissolve
    only when cells meet diagonally; those vertices have 4 edges and
    are resolved by always turning consistently: pick the unused
    edge with the smallest (orient, x, y) key). Deterministic: rings
    start at their lexicographically smallest vertex, outer
    orientation as chained."""
    import pandas as pd

    if not isinstance(edges, pd.DataFrame):
        edges = pd.DataFrame([r.asDict() for r in edges])
    if len(edges) == 0:
        return "MULTIPOLYGON EMPTY"
    # adjacency: vertex -> list of (other_vertex, edge_idx)
    adj: dict[tuple, list] = {}
    for i, r in enumerate(edges.itertuples(index=False)):
        a = (round(r.x1, 12), round(r.y1, 12))
        b = (round(r.x2, 12), round(r.y2, 12))
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    used = [False] * len(edges)
    rings = []
    for start in sorted(adj):
        while True:
            nxt = [e for e in adj[start] if not used[e[1]]]
            if not nxt:
                break
            ring = [start]
            cur = start
            while True:
                options = sorted(
                    e for e in adj[cur] if not used[e[1]]
                )
                if not options:
                    break
                vertex, idx = options[0]
                used[idx] = True
                ring.append(vertex)
                cur = vertex
                if cur == start:
                    break
            if len(ring) > 2 and ring[0] == ring[-1]:
                rings.append(ring)
    parts = []
    for ring in rings:
        coords = ", ".join(f"{vx:g} {vy:g}" for vx, vy in ring)
        parts.append(f"(({coords}))")
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


def spacetime_counts(
    df: DataFrame,
    res: int,
    bucket_s: int,
    lat: str = "lat",
    lon: str = "lon",
    ts: str = "ts",
) -> DataFrame:
    """Space-time cube aggregation (the named geospatial analysis:
    where AND when): one count per (cell, time bucket) — the input of
    emerging-hotspot analysis (feed per-cell series to
    cusum_changepoint / getis_ord_gi over time slices). Bucket =
    epoch seconds div bucket_s (integer — exact both engines).

    Scale: pure row-local keys + ONE map-side-combined groupBy; the
    (cell, bucket) composite both partitions AND prunes as an
    Iceberg layout pair.
    """
    from pdal_spark import sqlgen as G

    cell = F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res))
    bucket = F.expr(
        f"unix_timestamp(cast(`{ts}` as timestamp))"
        f" div {int(bucket_s)}"
    )
    return (
        df.select(cell.alias("cell"), bucket.alias("t_bucket"))
        .groupBy("cell", "t_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def suppress_small_cells(
    df: DataFrame,
    res: int,
    k: int,
    entity_col: str = "user_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """k-anonymity suppression for published location aggregates:
    per-cell counts are released ONLY for cells with >= k DISTINCT
    entities (the standard small-cell suppression rule of official
    statistics / location-data releases — a cell any fewer people
    visit re-identifies them). Output per surviving cell:
    (cell, n_points, n_entities).

    Scale: one groupBy on the cell with a distinct-count aggregate
    (two-phase under the hood); the suppression is a post-aggregate
    filter — raw points never leave their aggregation.
    """
    from pdal_spark import sqlgen as G

    cell = F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res))
    agg = (
        df.select(cell.alias("cell"), F.col(entity_col).alias("__e"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count_distinct("__e").alias("n_entities"),
        )
    )
    return agg.where(F.col("n_entities") >= int(k))


def cell_dwell(
    df: DataFrame,
    res: int,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-cell dwell time: each inter-event gap is attributed to the
    cell where it STARTED (the standard stay-point accounting of
    mobility analytics — visit DURATION, which raw per-cell counts
    cannot see: one ping in a cell you slept in vs fifty in one you
    drove through). Output per cell: n_visits (gaps started there),
    dwell_s (integer-second total).

    Scale: one key shuffle for the lead() gap + ONE map-side-combined
    cell groupBy.
    """
    from pyspark.sql import Window

    from pdal_spark import sqlgen as G

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    stepped = (
        df.withColumn(
            "__gap",
            F.unix_timestamp(F.lead(ts).over(w).cast("timestamp"))
            - F.unix_timestamp(F.col(ts).cast("timestamp")),
        )
        .where(F.col("__gap").isNotNull())
        .withColumn(
            "cell", F.expr(G.qcell(f"`{lat}`", f"`{lon}`", res))
        )
    )
    return stepped.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("__gap").alias("dwell_s"),
    )
