"""filters.crop — keep/drop points inside geometries.

Reference semantics (filters/CropFilter.cpp):
- N bboxes, 2D/3D contains (:264-281)
- N polygons: grid-accelerated PIP (:316-321, GridPnp)
- N circles/spheres: bbox pre-reject + squared distance (:339-361)
- ``outside=true`` inverts (:155-180)
- standard mode emits ONE OUTPUT VIEW PER GEOMETRY (:235-262) —
  modeled here as an inner join producing a ``geom_id`` column
  (SURVEY.md §2.9: crop x geometry = point⋈polygon).

Spark shape: bbox/circle variants are pure Catalyst predicates
(pushed down to the parquet scan). Polygon PIP is the one Python
kernel: a vectorized numpy ray-cast pandas UDF over the broadcast
polygon list, with (a) a Catalyst union-bbox prefilter added BEFORE
the UDF so the scan still prunes, and (b) bbox pre-reject per polygon
inside the kernel. At 1000 executors the polygon list is a closure
broadcast (small side of the join), never shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdal_spark.functions import pip as _pip
from pdal_spark.functions import wkt as _wkt
from pdal_spark.sqlgen import convex_pip as G_convex_pip
from pdal_spark.sqlgen import raycast_pip as G_raycast_pip
from pdal_spark.sqlgen import segdist as G_segdist


def bbox_predicate(
    bounds: dict[str, tuple[float, float]], df_cols: dict[str, Column]
) -> Column:
    """bounds: {"x": (lo, hi), ...} -> AND of between predicates."""
    pred = F.lit(True)
    for dim, (lo, hi) in bounds.items():
        c = df_cols[dim]
        pred = pred & c.between(float(lo), float(hi))
    return pred


def crop_bbox(
    df: DataFrame,
    bounds: dict[str, tuple[float, float]],
    outside: bool = False,
) -> DataFrame:
    """2D/3D box crop (CropFilter.cpp:264-281). Pure Catalyst."""
    pred = bbox_predicate(bounds, {k: df[k] for k in bounds})
    return df.where(~pred if outside else pred)


def crop_circle(
    df: DataFrame,
    center: tuple[float, ...],
    distance: float,
    dims: tuple[str, ...] = ("x", "y"),
    outside: bool = False,
) -> DataFrame:
    """Circle/sphere crop via squared distance (CropFilter.cpp:339-361).

    Matches the reference's <= comparison on squared distance; the
    bbox pre-reject it hand-codes is subsumed by Catalyst (the d2
    predicate is sargable after AQE/pushdown of the between clauses
    we add explicitly for scan pruning).
    """
    d2 = F.lit(0.0)
    prefilter = F.lit(True)
    for c, dim in zip(center, dims):
        delta = df[dim] - float(c)
        d2 = d2 + delta * delta
        prefilter = prefilter & df[dim].between(c - distance, c + distance)
    pred = d2 <= float(distance) * float(distance)
    if outside:
        return df.where(~(prefilter & pred))
    return df.where(prefilter & pred)


def _load_polygons(
    polygons: list[str] | list[tuple[int, str]]
) -> list[tuple[int, list[np.ndarray]]]:
    out = []
    for i, p in enumerate(polygons):
        gid, wkt_txt = p if isinstance(p, tuple) else (i, p)
        out.append((int(gid), _wkt.parse_polygon(wkt_txt)))
    return out


def _union_bbox(parsed) -> tuple[float, float, float, float]:
    shells = [rings[0] for _, rings in parsed]
    x0 = min(s[:, 0].min() for s in shells)
    x1 = max(s[:, 0].max() for s in shells)
    y0 = min(s[:, 1].min() for s in shells)
    y1 = max(s[:, 1].max() for s in shells)
    return float(x0), float(y0), float(x1), float(y1)


def matching_geoms_udf(polygons: list[str] | list[tuple[int, str]]):
    """pandas UDF: (x, y) -> array<int> of ALL containing geom_ids,
    in polygon input order. The polygon list rides the closure (tiny,
    broadcast once per executor)."""
    parsed = _load_polygons(polygons)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def matches(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xv = xs.to_numpy(dtype=np.float64)
        yv = ys.to_numpy(dtype=np.float64)
        hits: list[list[int]] = [[] for _ in range(len(xv))]
        for gid, rings in parsed:
            m = _pip.polygon_contains(xv, yv, rings)
            for idx in np.nonzero(m)[0]:
                hits[idx].append(gid)
        return pd.Series(hits)

    return matches


def _ccw(ring: np.ndarray) -> np.ndarray:
    area2 = float(
        np.sum(
            ring[:, 0] * np.roll(ring[:, 1], -1)
            - np.roll(ring[:, 0], -1) * ring[:, 1]
        )
    )
    return ring[::-1] if area2 < 0 else ring


def _split_convex(parsed):
    """Partition parsed polygons into (convex single-ring, general)."""
    convex, general = [], []
    for gid, rings in parsed:
        ring = _ccw(rings[0])
        if len(rings) == 1 and _wkt.is_convex_ccw(ring):
            convex.append((gid, ring))
        else:
            general.append((gid, rings))
    return convex, general


RAYCAST_MAX_EDGES = 64


def _raycast_expr(rings, x: str, y: str) -> str:
    verts = [
        [(float(a), float(b)) for a, b in np.asarray(r)]
        for r in rings
    ]
    return G_raycast_pip(f"`{x}`", f"`{y}`", verts)


def _convex_pred(ring: np.ndarray, x: str, y: str) -> Column:
    """Half-plane predicate — the SAME sqlgen text the oracle runs,
    and a sargable pure-Catalyst expression (whole-stage codegen,
    pushdown-friendly)."""
    verts = [(float(a), float(b)) for a, b in ring]
    return F.expr(G_convex_pip(f"`{x}`", f"`{y}`", verts))


def crop_polygons(
    df: DataFrame,
    polygons: list[str] | list[tuple[int, str]],
    x: str = "lon",
    y: str = "lat",
    outside: bool = False,
    emit_geom_id: bool = True,
    prefilter: bool = True,
) -> DataFrame:
    """Polygon crop. With emit_geom_id, replicates PDAL's
    one-output-view-per-geometry (CropFilter.cpp:235-262) as an
    exploded ``geom_id`` column; points in k polygons appear k times.
    outside=True returns points in NO polygon (no geom_id).

    Physical strategy mirrors GridPnp's intent (constant-time PIP)
    with Spark-native tiering: convex single-ring polygons become
    pure Catalyst half-plane conjunctions (JVM, codegen, pushdown);
    only general polygons pay the (vectorized, bbox-prefiltered)
    numpy ray-cast UDF.
    """
    parsed = _load_polygons(polygons)
    convex, general = _split_convex(parsed)

    if outside:
        pred = F.lit(True)
        for _, ring in convex:
            pred = pred & ~_convex_pred(ring, x, y)
        for _, rings in general:
            if sum(len(r) for r in rings) <= RAYCAST_MAX_EDGES:
                pred = pred & ~F.expr(_raycast_expr(rings, x, y))
        general = [
            (g, rings) for g, rings in general
            if sum(len(r) for r in rings) > RAYCAST_MAX_EDGES
        ]
        if general:
            fn = matching_geoms_udf([(g, _wkt.polygon_wkt(r)) for g, r in general])
            hit = fn(F.col(x), F.col(y))
            x0, y0, x1, y1 = _union_bbox(general)
            inside_box = F.col(x).between(x0, x1) & F.col(y).between(y0, y1)
            pred = pred & (~inside_box | (F.size(hit) == 0))
        return df.where(pred)

    # general polygons with a bounded edge count get the pure-
    # Catalyst division-free ray cast (JVM codegen, oracle-mirrorable);
    # only very large geometries pay the numpy UDF
    small_general = [
        (g, rings) for g, rings in general
        if sum(len(r) for r in rings) <= RAYCAST_MAX_EDGES
    ]
    general = [
        (g, rings) for g, rings in general
        if sum(len(r) for r in rings) > RAYCAST_MAX_EDGES
    ]

    frames = []
    for gid, ring in convex:
        frames.append(
            df.where(_convex_pred(ring, x, y)).withColumn(
                "geom_id", F.lit(gid)
            )
        )
    for gid, rings in small_general:
        frames.append(
            df.where(F.expr(_raycast_expr(rings, x, y))).withColumn(
                "geom_id", F.lit(gid)
            )
        )
    if general:
        fn = matching_geoms_udf([(g, _wkt.polygon_wkt(r)) for g, r in general])
        hit = fn(F.col(x), F.col(y))
        gdf = df
        if prefilter:
            x0, y0, x1, y1 = _union_bbox(general)
            gdf = gdf.where(
                F.col(x).between(x0, x1) & F.col(y).between(y0, y1)
            )
        frames.append(gdf.withColumn("geom_id", F.explode(hit)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if not emit_geom_id:
        return out.drop("geom_id").dropDuplicates()
    return out


def geom_distance(
    df: DataFrame,
    polygon_wkt: str,
    x: str = "lon",
    y: str = "lat",
    out: str = "distance",
    ring: bool = False,
) -> DataFrame:
    """filters.geomdistance: new dim = 2D distance to the geometry
    (0 inside unless ring mode — GeomDistanceFilter.cpp).

    Geometries up to 64 edges use the unrolled pure-Catalyst
    point-to-segment form (and the division-free ray cast for the
    inside test) — no Python; larger ones fall back to the numpy
    kernel."""
    rings = _wkt.parse_polygon(polygon_wkt)
    if sum(len(r) for r in rings) <= RAYCAST_MAX_EDGES:
        verts = [
            [(float(a), float(b)) for a, b in np.asarray(r)]
            for r in rings
        ]
        d = F.expr(G_segdist(f"`{x}`", f"`{y}`", verts))
        if ring:
            return df.withColumn(out, d)
        inside = F.expr(G_raycast_pip(f"`{x}`", f"`{y}`", verts))
        return df.withColumn(
            out, F.when(inside, F.lit(0.0)).otherwise(d)
        )

    @F.pandas_udf(T.DoubleType())
    def dist(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xv = xs.to_numpy(dtype=np.float64)
        yv = ys.to_numpy(dtype=np.float64)
        if ring:
            d = _pip.dist_to_segments(xv, yv, rings[0])
            for h in rings[1:]:
                d = np.minimum(d, _pip.dist_to_segments(xv, yv, h))
        else:
            d = _pip.polygon_distance(xv, yv, rings)
        return pd.Series(d)

    return df.withColumn(out, dist(F.col(x), F.col(y)))


def zonal_stats(
    df: DataFrame,
    polygons: list[str] | list[tuple[int, str]],
    value: str,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Zonal statistics: per-polygon count/min/max/mean of ``value``
    over the points each polygon contains — the classic raster-
    analysis op PDAL composes from filters.crop (one view per
    geometry, CropFilter.cpp:235-262) + filters.stats
    (StatsFilter.hpp:60-210), collapsed here into one PIP join + one
    map-side-combined hash aggregate.

    The mean accumulates in 2^20 fixed point (rasterize's
    deterministic-mode convention) so the result is bit-identical
    under any partitioning/aggregation order. Output:
    (geom_id, n_points, vmin, vmax, vmean).
    """
    inside = crop_polygons(df, polygons, x=x, y=y)
    q = 1048576.0
    zq = F.round(F.col(value).cast("double") * q).cast("long")
    return inside.groupBy("geom_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min(F.col(value).cast("double")).alias("vmin"),
        F.max(F.col(value).cast("double")).alias("vmax"),
        (
            (F.sum(zq).cast("double") / F.lit(q))
            / F.count(F.lit(1)).cast("double")
        ).alias("vmean"),
    )


def crop_polygons_pruned(
    df: DataFrame,
    polygons: list[str] | list[tuple[int, str]],
    prune_res: int = 7,
    x: str = "lon",
    y: str = "lat",
    emit_geom_id: bool = True,
) -> DataFrame:
    """Polygon crop behind a cell-covering prefilter — the
    readers.copc/ept `polygon` pushdown analog (CopcReader.cpp:
    684-754 prunes octree nodes against the query polygon before any
    point is read; EptReader.cpp `polygon` option prunes tiles the
    same way).

    The driver computes the CONSERVATIVE covering cell set of the
    polygons at ``prune_res`` (operators.h3.polyfill_cells,
    mode="covering": center-in cells + boundary-crossed cells + one
    dilation ring, so no inside point's cell can be missing) and
    plants it as an IN-list on the point's qcell. Against a table
    partitioned or sorted by that cell column this IS partition /
    row-group pruning (Catalyst pushes the IN-list into the scan);
    against a raw table it still short-circuits the exact PIP test to
    the covered fraction of the world. Results are row-identical to
    crop_polygons.
    """
    from pdal_spark.operators.h3 import polyfill_cells
    from pdal_spark.sqlgen import qcell as G_qcell

    parsed = _load_polygons(polygons)
    covering: set[int] = set()
    for _, rings in parsed:
        ring_lists = [[(float(v[0]), float(v[1])) for v in r]
                      for r in rings]
        covering.update(polyfill_cells(ring_lists, prune_res, "covering"))
    cell_expr = F.expr(G_qcell(f"`{y}`", f"`{x}`", prune_res))
    pre = df.where(cell_expr.isin(sorted(covering)))
    return crop_polygons(
        pre, polygons, x=x, y=y, emit_geom_id=emit_geom_id
    )


def crop_polygons_celljoin(
    df: DataFrame,
    polys: DataFrame,
    res: int = 7,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Polygon crop where the polygons are a TABLE, not a plan
    literal — the 10^5..10^7-geometry scale path the broadcast forms
    (crop_polygons / crop_polygons_pruned) cannot take: a closure-
    captured list stops fitting in the plan/executors, and a single
    union-bbox prefilter stops pruning anything.

    Shape (the spatial-join standard: cell-bucketed candidate join +
    exact refine):
      1. polygon side maps row-locally to its CONSERVATIVE covering
         cells at ``res`` (operators.h3.polyfill_cells "covering":
         center-in + boundary-crossed + one dilation ring — no
         containing cell missing), carrying the WKT along;
      2. point side adds its qcell (pure Catalyst);
      3. hash equi-join on cell — a plain shuffle join: AQE skew
         split applies, and hot city cells can be salted exactly like
         tile_write;
      4. exact refine: vectorized numpy ray cast per (batch x
         geometry) group, with an LRU ring cache so each executor
         parses a polygon once per batch stream.

    Candidate volume = sum over cells of points_in_cell x
    polygons_covering_cell — choose ``res`` so cells are finer than
    typical polygons (the metrics table's cell histogram sizes this).
    Results are row-identical to crop_polygons on the same set
    (pytest-pinned); output adds ``geom_id``.
    """
    from pdal_spark.operators.h3 import polyfill_cells
    from pdal_spark.sqlgen import qcell as G_qcell

    def cover(it):
        for pdf in it:
            g_out, c_out, w_out = [], [], []
            for gid, wkt_txt in zip(pdf["geom_id"], pdf["wkt"]):
                rings_np = _wkt.parse_polygon(wkt_txt)
                rings = [
                    [(float(v[0]), float(v[1])) for v in r]
                    for r in rings_np
                ]
                for cell in polyfill_cells(rings, res, "covering"):
                    g_out.append(int(gid))
                    c_out.append(int(cell))
                    w_out.append(wkt_txt)
            yield pd.DataFrame(
                {"geom_id": g_out, "__cell": c_out, "wkt": w_out}
            )

    pcells = polys.select("geom_id", "wkt").mapInPandas(
        cover, "geom_id int, __cell bigint, wkt string"
    )
    pts = df.withColumn(
        "__cell", F.expr(G_qcell(f"`{y}`", f"`{x}`", res))
    )
    cand = pts.join(pcells, on="__cell")

    out_fields = [
        f for f in cand.schema.fields
        if f.name not in ("wkt", "__cell")
    ]
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def refine(it):
        cache: dict[str, list] = {}
        for pdf in it:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xv = pdf[x].to_numpy(dtype=np.float64)
            yv = pdf[y].to_numpy(dtype=np.float64)
            for wkt_txt, idx in pdf.groupby("wkt").indices.items():
                rings = cache.get(wkt_txt)
                if rings is None:
                    rings = _wkt.parse_polygon(wkt_txt)
                    if len(cache) > 4096:
                        cache.clear()
                    cache[wkt_txt] = rings
                keep[idx] = _pip.polygon_contains(
                    xv[idx], yv[idx], rings
                )
            yield pdf.loc[keep, out_cols]

    return cand.mapInPandas(refine, out_schema)


def crop_polygons_celljoin_outside(
    df: DataFrame,
    polys: DataFrame,
    res: int = 7,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """The outside=true form of crop_polygons_celljoin: points in NO
    polygon of the TABLE (CropFilter.cpp:155-180's inversion at
    10^5..10^7-geometry scale, where the broadcast crop_polygons
    outside path stops fitting). Anti-join of the cell-join matches
    back onto the points — one extra hash anti-join on the point id
    over the (bounded) match set; the candidate economics are
    identical to the inside form.
    """
    hits = crop_polygons_celljoin(
        df.select(id_col, x, y), polys, res=res, x=x, y=y
    ).select(id_col).distinct()
    return df.join(hits, on=id_col, how="left_anti")


def zonal_majority(
    df: DataFrame,
    zone: str = "zone",
    cat: str = "cat",
    max_cat: int = 1 << 20,
) -> DataFrame:
    """Zonal majority (the categorical zonal statistic next to
    zonal_stats' numeric min/max/mean): per zone, the modal category
    with a DETERMINISTIC tie-break (highest count, then smallest
    category id). Land-cover-style rollups, dominant-language-per-
    region, dominant-event-type-per-cell.

    ``cat`` must be a non-negative integer id < ``max_cat``; the pick
    is encoded as ONE bounded BIGINT ``count * max_cat + (max_cat -
    1 - cat)`` so a plain max() is order-preserving on (count, -cat)
    — the same scalar-encode convention the golden_record oracle
    uses (DuckDB arg_max needs a scalar key). Counts up to 2^42 at
    the default max_cat; raise/lower to trade range.

    Scale: groupBy(zone, cat) map-side combine + ONE max per zone —
    raw rows aggregate once, zones never join.
    """
    m = int(max_cat)
    counts = df.groupBy(zone, cat).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    enc = counts.select(
        zone,
        F.expr(
            f"n * cast({m} as bigint) + ({m} - 1 - `{cat}`)"
        ).alias("__e"),
        "n",
    )
    tot = counts.groupBy(zone).agg(F.sum("n").alias("n_zone"))
    best = enc.groupBy(zone).agg(F.max("__e").alias("__b"))
    return (
        best.join(tot, on=zone)
        .select(
            zone,
            F.expr(f"{m} - 1 - (__b % {m})").alias("majority"),
            F.expr(f"__b div {m}").alias("n_major"),
            "n_zone",
        )
    )


def rect_union_area(
    rects: DataFrame,
    x0: str = "x0",
    x1: str = "x1",
    y0: str = "y0",
    y1: str = "y1",
) -> DataFrame:
    """Exact union area of axis-aligned rectangles (the coverage /
    footprint measure: how much ground do these tiles, bboxes, or
    survey extents actually cover, double-counting nothing) by slab
    decomposition: split x at every rectangle edge, and inside each
    slab the union is a 1-D interval-merge over y (the
    interval_coverage kernel, partitioned per slab).

        area = sum over slabs (xb - xa) * covered_y(slab)

    Integer coordinates keep everything exact. Output one row:
    (n_rects, n_slabs, area).

    Scale: slabs = O(distinct edges); each rectangle joins only the
    slabs it spans (range join on the edge table — fan-out tracks
    overlap, not n^2); per-slab merge is a y-ordered window
    partitioned BY slab (parallel).
    """
    from pyspark.sql import Window

    r = rects.select(
        F.col(x0).cast("long").alias("rx0"),
        F.col(x1).cast("long").alias("rx1"),
        F.col(y0).cast("long").alias("ry0"),
        F.col(y1).cast("long").alias("ry1"),
    ).where((F.col("rx0") < F.col("rx1"))
            & (F.col("ry0") < F.col("ry1")))
    edges = (
        r.select(F.col("rx0").alias("e"))
        .unionByName(r.select(F.col("rx1").alias("e")))
        .distinct()
    )
    we = Window.orderBy(F.col("e").asc())
    slabs = (
        edges.withColumn("xb", F.lead("e", 1).over(we))
        .where(F.col("xb").isNotNull())
        .select(F.col("e").alias("xa"), "xb")
    )
    cov = slabs.join(
        r, (F.col("rx0") <= F.col("xa"))
        & (F.col("rx1") >= F.col("xb")),
    ).select("xa", "xb", F.col("ry0").alias("s"),
             F.col("ry1").alias("e2"))
    w = Window.partitionBy("xa").orderBy(
        F.col("s").asc(), F.col("e2").asc()
    )
    merged = (
        cov.withColumn(
            "pmax",
            F.max("e2").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "ni",
            F.expr(
                "case when pmax is null or s > pmax then 1"
                " else 0 end"
            ),
        )
        .withColumn(
            "island",
            F.sum("ni").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
            ),
        )
        .groupBy("xa", "xb", "island")
        .agg(F.min("s").alias("is_s"), F.max("e2").alias("is_e"))
    )
    per_slab = merged.groupBy("xa", "xb").agg(
        F.sum(F.expr("is_e - is_s")).alias("cy")
    )
    n_r = r.agg(F.count(F.lit(1)).cast("long").alias("n_rects"))
    out = per_slab.agg(
        F.count(F.lit(1)).cast("long").alias("n_slabs"),
        F.sum(F.expr("(xb - xa) * cy")).alias("area"),
    )
    return n_r.crossJoin(F.broadcast(out)).select(
        "n_rects", "n_slabs", "area"
    )
