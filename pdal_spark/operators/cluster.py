"""Clustering ops (SURVEY.md §2.7): filters.cluster, filters.dbscan,
filters.lloydkmeans, filters.radiusassign.

Connected components run as iterative min-label propagation over the
cell-bucketed radius join's edge list (small-world graphs converge in
O(diameter) rounds; lineage cut with localCheckpoint each round —
the Iceberg-snapshot analog of the reference's in-memory union-find).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import compile_ranges
from pdal_spark.operators.knn import radius_join
from pdal_spark.operators.rowops import assign as ops_assign
from pdal_spark.sqlgen import SPARK


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 40
) -> DataFrame:
    """nodes(pid), edges(src_id, nb_id) undirected ->
    (pid, component = min pid reachable): the LARGE-STAR / SMALL-STAR
    alternation (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"). Converges in O(log^2 n) rounds on ANY
    graph topology — min-label propagation (_connected_components)
    needs O(diameter) rounds and a 10^6-node path graph would never
    finish; this is the 100 TB-scale path and the default for every
    CC consumer in the engine.

    large-star: every node v > u hooks to min(N(u) + {u});
    small-star: every smaller neighbor (and u) hooks to the minimum
    of u's smaller neighborhood. Each step is one groupBy + one
    re-join per direction — shuffles keyed on node id, AQE-skew
    eligible; lineage cut per round with localCheckpoint.
    Fixpoint test: the (distinct) edge set is stable — count +
    bit_xor of pair hashes, one cheap aggregate, no sorted compare.
    """
    e = (
        edges.select(F.col("src_id").alias("u"), F.col("nb_id").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    e = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    cur = sig(e)
    for _ in range(max_iter):
        # large-star: (v, m) for v in N(u), v > u; m = min(N(u)+{u});
        # each node keeps its own hook (u, m) so no node vanishes
        mins = e.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            e.join(mins, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        le = large.unionByName(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        # small-star over edges directed toward the smaller endpoint
        small_in = le.where(F.col("v") < F.col("u"))
        smins = small_in.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_in.join(smins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # one lineage cut + ONE action per round: the sig() aggregate
        # materializes the lazy checkpoint and tests the fixpoint
        e = small.unionByName(
            small.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct().localCheckpoint(eager=False)
        nxt = sig(e)
        if nxt == cur:
            break
        cur = nxt
    roots = e.groupBy("u").agg(F.min("v").alias("component")).where(
        F.col("component") < F.col("u")
    )
    return (
        nodes.select("pid")
        .join(roots.withColumnRenamed("u", "pid"), on="pid", how="left")
        .select(
            "pid",
            F.coalesce(F.col("component"), F.col("pid")).alias("component"),
        )
    )


def _connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 200
) -> DataFrame:
    """nodes(pid), edges(src_id, nb_id) undirected ->
    (pid, component = min pid reachable)."""
    labels = nodes.select(
        F.col("pid"), F.col("pid").alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        nb_lab = (
            edges.join(
                labels.withColumnRenamed("pid", "nb_id"), on="nb_id"
            )
            .groupBy("src_id")
            .agg(F.min("component").alias("nb_min"))
            .withColumnRenamed("src_id", "pid")
        )
        new = (
            labels.join(nb_lab, on="pid", how="left")
            .select(
                "pid",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nb_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), on="pid")
            .where(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def cluster_euclidean(
    df: DataFrame,
    tolerance: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    min_points: int = 1,
    max_points: int | None = None,
    out: str = "cluster_id",
) -> DataFrame:
    """filters.cluster (ClusterFilter.cpp): euclidean connected
    components within `tolerance`; components outside
    [min_points, max_points] are dropped (PDAL culls them)."""
    edges = radius_join(
        df, df, tolerance, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    ).select("src_id", "nb_id")
    nodes = df.select(F.col(id_col).alias("pid"))
    comp = connected_components_star(nodes, edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("__n"))
    keep = sizes.where(F.col("__n") >= min_points)
    if max_points is not None:
        keep = keep.where(F.col("__n") <= max_points)
    comp = comp.join(keep.select("component"), on="component")
    return df.join(
        comp.select(
            F.col("pid").alias(id_col), F.col("component").alias(out)
        ),
        on=id_col,
        how="inner",
    )


def dbscan(
    df: DataFrame,
    eps: float,
    min_points: int,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    out: str = "cluster_id",
) -> DataFrame:
    """filters.dbscan (DBSCANFilter.cpp): core point iff >= min_points
    neighbors within eps (self included, as with nanoflann radius
    queries); clusters = CC over core-core edges; border points join
    the smallest-labeled core neighbor; noise -> cluster_id = -1."""
    pairs = radius_join(
        df, df, eps, x=x, y=y, id_left=id_col, id_right=id_col
    ).select("src_id", "nb_id")
    deg = pairs.groupBy("src_id").agg(F.count(F.lit(1)).alias("__deg"))
    core = deg.where(F.col("__deg") >= min_points).select(
        F.col("src_id").alias("pid")
    )
    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "src_id"), on="src_id")
        .join(core.withColumnRenamed("pid", "nb_id"), on="nb_id")
        .where(F.col("src_id") != F.col("nb_id"))
    )
    comp = connected_components_star(core, core_edges)
    # border points: any non-core with a core neighbor joins the min
    # component among its core neighbors.
    border = (
        pairs.join(
            comp.withColumnRenamed("pid", "nb_id"), on="nb_id"
        )
        .join(core.withColumnRenamed("pid", "src_id"), on="src_id",
              how="left_anti")
        .groupBy("src_id")
        .agg(F.min("component").alias("component"))
        .withColumnRenamed("src_id", "pid")
    )
    lab = comp.unionByName(border)
    return df.join(
        lab.select(F.col("pid").alias(id_col),
                   F.col("component").alias(out)),
        on=id_col,
        how="left",
    ).withColumn(out, F.coalesce(F.col(out), F.lit(-1)))


def kmeans(
    df: DataFrame,
    k: int,
    dims: tuple[str, ...] = ("lon", "lat"),
    max_iter: int = 10,
    seed: int = 42,
    out: str = "cluster_id",
) -> DataFrame:
    """filters.lloydkmeans (LloydKMeansFilter.cpp) via pyspark.ml."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    vec = VectorAssembler(inputCols=list(dims), outputCol="__feat")
    feat = vec.transform(df)
    model = KMeans(
        k=k, maxIter=max_iter, seed=seed, featuresCol="__feat",
        predictionCol=out,
    ).fit(feat)
    return model.transform(feat).drop("__feat")


def radius_assign(
    df: DataFrame,
    radius: float,
    src_domain: list[str],
    reference_domain: list[str],
    update: list[str],
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """filters.radiusassign (RadiusAssignFilter.cpp:45-115): rows in
    src_domain having >= 1 reference_domain neighbor within radius get
    the `update` assign statements applied."""
    src_pred = F.expr(compile_ranges(src_domain, SPARK))
    ref = df.where(F.expr(compile_ranges(reference_domain, SPARK)))
    src = df.where(src_pred)
    matched_ids = (
        radius_join(
            src, ref, radius, x=x, y=y,
            id_left=id_col, id_right=id_col, include_self=False,
        )
        .select(F.col("src_id").alias(id_col))
        .distinct()
    )
    hit = df.join(matched_ids, on=id_col, how="left_semi")
    miss = df.join(matched_ids, on=id_col, how="left_anti")
    return ops_assign(hit, update).unionByName(
        miss, allowMissingColumns=True
    )


def kmeans_exact(
    df: DataFrame,
    k: int,
    iters: int = 5,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    out: str = "cluster_id",
) -> DataFrame:
    """filters.lloydkmeans (LloydKMeansFilter.cpp) — DETERMINISTIC
    Lloyd: initial centroids are the k smallest-id points, each
    iteration assigns every point to the nearest centroid (squared
    distance, ties to the lower centroid index) and recomputes
    centroids as decimal-exact means. Unlike the pyspark.ml variant
    (seeded k-means||), every arithmetic step is IEEE-mirrorable, so
    a SQL oracle reproduces the labels bit-for-bit.

    Distributed shape: centroids are k driver-side scalars; each
    iteration is one codegen'd projection (k distance expressions,
    no join) + one k-group aggregation. Empty clusters keep their
    previous centroid (the reference keeps stale centers too).
    """
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(x).alias("px"), F.col(y).alias("py"),
    ).localCheckpoint(eager=True)
    cents = [
        (float(r["px"]), float(r["py"]))
        for r in pts.orderBy("pid").limit(k).collect()
    ]
    k = len(cents)  # fewer rows than k: every point is a centroid
    if k == 0:
        return df.withColumn(out, F.lit(None).cast("int"))
    dec = "decimal(38,15)"
    assigned = None
    for _ in range(int(iters)):
        best_d, best_i = None, None
        for i, (cx, cy) in enumerate(cents):
            d = (F.col("px") - F.lit(cx)) * (
                F.col("px") - F.lit(cx)
            ) + (F.col("py") - F.lit(cy)) * (F.col("py") - F.lit(cy))
            if best_d is None:
                best_d, best_i = d, F.lit(i)
            else:
                cond = d < best_d
                best_d = F.when(cond, d).otherwise(best_d)
                best_i = F.when(cond, F.lit(i)).otherwise(best_i)
        assigned = pts.withColumn("cid", best_i)
        upd = assigned.groupBy("cid").agg(
            F.sum(F.col("px").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("py").cast(dec)).cast("double").alias("sy"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        by_id = {int(r["cid"]): r for r in upd}
        cents = [
            (
                float(by_id[i]["sx"]) / float(by_id[i]["n"]),
                float(by_id[i]["sy"]) / float(by_id[i]["n"]),
            )
            if i in by_id else cents[i]
            for i in range(k)
        ]
    return df.join(
        assigned.select(
            F.col("pid").alias(id_col), F.col("cid").alias(out)
        ),
        on=id_col,
    )


def supervoxel(
    df: DataFrame,
    resolution: float,
    iters: int = 3,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    out: str = "cluster_id",
) -> DataFrame:
    """filters.supervoxel (SupervoxelFilter.cpp:75-160) 2D analog:
    seeds on the `resolution` grid (one per occupied cell, at the
    cell's centroid), then boundary-refining local k-means — each
    point competes only among its 3x3 neighbor-cell seeds, seeds
    re-center on their members each round (the reference's VCCS-style
    refinement additionally weights by normals; spatial-only here —
    the 2D point model has no meaningful normal field for this).
    Output: ClusterID = the winning seed's cell, encoded
    (sx << 21 | sy-offset) like the engine's other cell keys.

    Distributed shape: NO global k-means — a point only ever joins 9
    seeds (broadcast-scale per cell neighborhood), so each round is
    one explode(9) + join + argmin + seed re-centering agg. Seeds
    that lose all members keep their previous centroid. Deterministic
    (decimal means, ties to the lexicographically smallest seed), so
    the SQL oracle matches labels exactly.
    """
    from pyspark.sql import Window

    dec = "decimal(38,15)"
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(x).alias("px"), F.col(y).alias("py"),
    ).withColumn(
        "gx", F.floor(F.col("px") / resolution).cast("long")
    ).withColumn(
        "gy", F.floor(F.col("py") / resolution).cast("long")
    ).localCheckpoint(eager=True)

    def dmean(col):
        return (
            F.sum(col.cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double")
        )

    seeds = pts.groupBy(
        F.col("gx").alias("sx"), F.col("gy").alias("sy")
    ).agg(dmean(F.col("px")).alias("cx"),
          dmean(F.col("py")).alias("cy")).localCheckpoint(eager=True)

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    assigned = None
    for _ in range(int(iters)):
        cand = pts.withColumn("o", F.explode(offs)).select(
            "pid", "px", "py",
            (F.col("gx") + F.col("o.dx")).alias("sx"),
            (F.col("gy") + F.col("o.dy")).alias("sy"),
        ).join(seeds, on=["sx", "sy"])
        d = (F.col("px") - F.col("cx")) * (
            F.col("px") - F.col("cx")
        ) + (F.col("py") - F.col("cy")) * (F.col("py") - F.col("cy"))
        w = Window.partitionBy("pid").orderBy(
            d.asc(), F.col("sx").asc(), F.col("sy").asc()
        )
        assigned = (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("pid", "px", "py", "sx", "sy")
            .localCheckpoint(eager=True)
        )
        upd = assigned.groupBy("sx", "sy").agg(
            dmean(F.col("px")).alias("ncx"),
            dmean(F.col("py")).alias("ncy"),
        )
        seeds = seeds.join(upd, on=["sx", "sy"], how="left").select(
            "sx", "sy",
            F.coalesce("ncx", "cx").alias("cx"),
            F.coalesce("ncy", "cy").alias("cy"),
        ).localCheckpoint(eager=True)
    lab = assigned.select(
        F.col("pid").alias(id_col),
        ((F.col("sx") + F.lit(1 << 20)) * F.lit(1 << 21)
         + (F.col("sy") + F.lit(1 << 20))).alias(out),
    )
    return df.join(lab, on=id_col)


def silhouette_simplified(
    labeled: DataFrame,
    x: str = "px",
    y: str = "py",
    label: str = "cluster_id",
    id_col: str = "pid",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per point — the
    clustering-quality diagnostic pyspark.ml's ClusteringEvaluator
    computes, in the engine's deterministic form: a = distance to the
    OWN cluster centroid, b = min distance to any OTHER centroid,
    sil = (b - a) / greatest(a, b). Centroids are decimal-exact means
    of the labeled points (the kmeans_exact convention), collected
    driver-side (k scalars) and baked as plan literals, so the whole
    computation is one codegen'd projection — no join, no shuffle
    beyond the k-group centroid agg.

    Every arithmetic step (decimal-mean -> double, subtract, square,
    sqrt, divide) is IEEE-correctly-rounded: a SQL oracle running the
    identical expressions matches bit-for-bit. sil > 0 means the
    point sits closer to its own centroid; mean sil per cluster is
    the usual summary (aggregate downstream).
    """
    dec = "decimal(38,15)"
    cents = {
        int(r["l"]): (float(r["cx"]), float(r["cy"]))
        for r in labeled.groupBy(F.col(label).alias("l"))
        .agg(
            F.expr(
                f"cast(sum(cast(`{x}` as {dec})) as double)"
                " / cast(count(*) as double)"
            ).alias("cx"),
            F.expr(
                f"cast(sum(cast(`{y}` as {dec})) as double)"
                " / cast(count(*) as double)"
            ).alias("cy"),
        )
        .collect()
    }
    if len(cents) < 2:
        raise ValueError("silhouette needs >= 2 clusters")

    def dist(cx: float, cy: float) -> str:
        from pdal_spark import sqlgen as G

        return (
            f"sqrt((`{x}` - {G.fnum(cx)}) * (`{x}` - {G.fnum(cx)})"
            f" + (`{y}` - {G.fnum(cy)}) * (`{y}` - {G.fnum(cy)}))"
        )

    a_branches = " ".join(
        f"WHEN {i} THEN {dist(cx, cy)}" for i, (cx, cy) in cents.items()
    )
    def _min_other(i: int) -> str:
        ds = [
            dist(cx2, cy2)
            for j, (cx2, cy2) in cents.items()
            if j != i
        ]
        # Spark's least() needs >= 2 args; k=2 has one other centroid
        return ds[0] if len(ds) == 1 else f"least({', '.join(ds)})"

    b_branches = " ".join(
        f"WHEN {i} THEN {_min_other(i)}" for i in cents
    )
    a = f"(CASE `{label}` {a_branches} END)"
    b = f"(CASE `{label}` {b_branches} END)"
    return labeled.select(
        F.col(id_col),
        F.col(label),
        F.expr(
            f"({b} - {a}) / greatest({a}, {b})"
        ).alias("sil"),
    )


GM_COORD_Q = 1 << 20  # coordinate grid for geometric-median state
GM_W_Q = 1 << 20      # weight fixed point
GM_W_CAP = 1 << 24    # weight cap near-coincident points


def geometric_median(
    df: DataFrame,
    key_col: str = "user_id",
    x: str = "lon",
    y: str = "lat",
    iters: int = 3,
) -> DataFrame:
    """Per-group geometric median — Weiszfeld iterations (1937) in
    the engine's deterministic integer form: the L1-robust center a
    mean cannot give (one outlier drags a centroid; the median
    ignores it — the robust "representative point" per entity next
    to filters.info's bbox center).

    Iteration state is a per-group (cx_q, cy_q) pair on the 2^-20
    coordinate grid. Each round: w = floor(GM_W_Q / d) (planar d =
    IEEE sqrt — exact), capped at GM_W_CAP (bounds every product:
    w * |x_q| < 2^52, so int64 sums survive ~2^10 rows/group at the
    cap; coincident points get weight 0, the standard Weiszfeld
    guard), then the new center = truncating integer weighted mean.
    Every step int64/IEEE — the oracle unrolls identical CTEs.

    Scale: per iteration ONE hash join of the tiny per-group state
    onto the points + ONE map-side-combined groupBy; no windows.
    """
    from pdal_spark import sqlgen as G

    q = GM_COORD_Q
    # SHIFTED non-negative grid: Spark's `div` truncates toward zero
    # while DuckDB's `//` floors — they only agree on non-negative
    # operands, so the state arithmetic must never see a sign.
    xq = f"cast(floor((`{x}` + 180.0e0) * {q}) as bigint)"
    yq = f"cast(floor((`{y}` + 90.0e0) * {q}) as bigint)"
    pts = df.select(
        F.col(key_col).alias("__k"),
        F.expr(xq).alias("__xq"),
        F.expr(yq).alias("__yq"),
    ).localCheckpoint(eager=False)
    state = pts.groupBy("__k").agg(
        F.expr("sum(__xq) div count(*)").alias("cx_q"),
        F.expr("sum(__yq) div count(*)").alias("cy_q"),
    )
    d = (
        f"sqrt((cast(__xq - cx_q as double) / {G.fnum(float(q))})"
        f" * (cast(__xq - cx_q as double) / {G.fnum(float(q))})"
        f" + (cast(__yq - cy_q as double) / {G.fnum(float(q))})"
        f" * (cast(__yq - cy_q as double) / {G.fnum(float(q))}))"
    )
    w = (
        f"CASE WHEN {d} = 0.0e0 THEN cast(0 as bigint)"
        f" ELSE least(cast({GM_W_CAP} as bigint),"
        f" cast(floor({G.fnum(float(GM_W_Q))} / {d}) as bigint)) END"
    )
    for _ in range(int(iters)):
        weighted = pts.join(state, on="__k").select(
            "__k",
            F.expr(w).alias("__w"),
            "__xq", "__yq", "cx_q", "cy_q",
        )
        state = (
            weighted.groupBy("__k")
            .agg(
                F.sum("__w").alias("__ws"),
                F.sum(F.expr("__w * __xq")).alias("__wx"),
                F.sum(F.expr("__w * __yq")).alias("__wy"),
                F.max("cx_q").alias("__pcx"),
                F.max("cy_q").alias("__pcy"),
            )
            .select(
                "__k",
                # all-coincident group: keep the previous center
                F.expr(
                    "CASE WHEN __ws > 0 THEN __wx div __ws"
                    " ELSE __pcx END"
                ).alias("cx_q"),
                F.expr(
                    "CASE WHEN __ws > 0 THEN __wy div __ws"
                    " ELSE __pcy END"
                ).alias("cy_q"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        F.col("__k").alias(key_col),
        "cx_q", "cy_q",
        F.expr(
            f"cast(cx_q as double) / {G.fnum(float(q))} - 180.0e0"
        ).alias("gx"),
        F.expr(
            f"cast(cy_q as double) / {G.fnum(float(q))} - 90.0e0"
        ).alias("gy"),
    )


def litree(
    df: DataFrame,
    min_points: int = 10,
    min_height: float = 3.0,
    dummy_radius: float = 100.0,
    x: str = "lon",
    y: str = "lat",
    hag: str = "hag",
    id_col: str = "pid",
    cell: float | None = None,
    buffer: float = 0.0,
) -> DataFrame:
    """filters.litree (LiTreeFilter.cpp:120-296; Li, Guo, Jakubowski
    & Kelly 2012): sequential tallest-first tree segmentation over
    height-above-ground points.

    Faithful per-tile replication of the reference loop:
    - local-max precompute within radius 2.0 (strictly-higher
      neighbor disqualifies, LiTreeFilter.cpp:122-151);
    - per tree: seed t0 = highest remaining (ties to first in
      current U order, :84-104); dummy n0 = FARTHEST point within
      ``dummy_radius`` of t0 (radius list back(), :107-120; t0
      isolated -> dropped);
    - every remaining point is classified Pi/Ni IN CURRENT U ORDER:
      points with squared distance to t0 >= 100.0 go straight to Ni
      (the reference compares d^2 against 100.0 — replicated as-is,
      :245-252); otherwise nearest-set rule with the local-max
      height gate (dt = 1.5 below hag 15 else 2.0, :153-199);
    - Pi below ``min_points`` is discarded (tree_id not incremented);
      loop ends when the highest remaining hag < ``min_height`` or
      U size <= min_points (:272-296).

    Trees are meters-scale objects: ``cell`` tiles the plane so each
    tile segments independently (one shuffle + Arrow batch per tile;
    the documented splitter-style approximation at tile borders —
    ``buffer`` adds halo points that can ABSORB border points into a
    neighbor tile's canopy; halo-point labels are dropped). Global
    exact semantics: cell=None (one partition, the gate path).

    Output: df columns + tree_id (long; 0 = unassigned). Tree
    numbering is per tile (tile-local 1..k scoped by a tile offset),
    deterministic for fixed input.
    """
    import numpy as np
    import pandas as pd

    from pdal_spark.operators.delaunay import _tile_col

    tiled, _ = _tile_col(df, x, y, cell, buffer)
    work = tiled.select(
        F.col("__tx"), F.col("__ty"),
        F.col(id_col).alias("__id").cast("long"),
        F.col(x).cast("double").alias("__px"),
        F.col(y).cast("double").alias("__py"),
        F.col(hag).cast("double").alias("__h"),
        F.col("__own"),
    )
    mp, mh, dr = int(min_points), float(min_height), float(dummy_radius)

    def seg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        px = pdf["__px"].to_numpy()
        py = pdf["__py"].to_numpy()
        h = pdf["__h"].to_numpy()
        n = len(pdf)
        # local max within radius 2 (strictly higher neighbor kills)
        local_max = np.ones(n, dtype=bool)
        for i in range(n):
            d2 = (px - px[i]) ** 2 + (py - py[i]) ** 2
            nb = d2 <= 4.0
            if (h[nb] > h[i]).any():
                local_max[i] = False
        tree = np.zeros(n, dtype=np.int64)
        U = list(range(n))
        tree_id = 1
        dr2 = dr * dr
        while len(U) > mp:
            Ua = np.asarray(U)
            t0 = U[int(np.argmax(h[Ua]))]
            if h[t0] < mh:
                break
            # dummy: farthest point within dummy_radius of t0
            d2u = (px[Ua] - px[t0]) ** 2 + (py[Ua] - py[t0]) ** 2
            in_r = d2u <= dr2
            order = np.argsort(d2u[in_r], kind="stable")
            cand = Ua[in_r][order]
            n0 = int(cand[-1])
            if n0 == t0:
                U.remove(t0)
                continue
            Pi = [t0]
            Ni = [n0]
            for ui in U:
                if ui == t0 or ui == n0:
                    continue
                d2t = ((px[ui] - px[t0]) ** 2
                       + (py[ui] - py[t0]) ** 2)
                if d2t >= 100.0:  # reference quirk: d^2 vs 100.0
                    Ni.append(ui)
                    continue
                pa = np.asarray(Pi)
                na = np.asarray(Ni)
                dmin1 = math.sqrt(float(np.min(
                    (px[pa] - px[ui]) ** 2 + (py[pa] - py[ui]) ** 2
                )))
                dmin2 = math.sqrt(float(np.min(
                    (px[na] - px[ui]) ** 2 + (py[na] - py[ui]) ** 2
                )))
                if not local_max[ui]:
                    (Pi if dmin1 <= dmin2 else Ni).append(ui)
                else:
                    dt = 1.5 if h[ui] <= 15.0 else 2.0
                    if dmin1 > dt:
                        Ni.append(ui)
                    else:
                        (Pi if dmin1 <= dmin2 else Ni).append(ui)
            if len(Pi) >= mp:
                tree[np.asarray(Pi)] = tree_id
                tree_id += 1
            U = Ni
        own = pdf["__own"].to_numpy()
        tx, ty = int(key[0]), int(key[1])
        kept = tree[own]
        return pd.DataFrame({
            "__id": pdf.loc[own, "__id"].to_numpy(),
            "tx": np.full(int(own.sum()), tx, dtype=np.int64),
            "ty": np.full(int(own.sum()), ty, dtype=np.int64),
            "tree_local": kept,
        })

    res = work.groupBy("__tx", "__ty").applyInPandas(
        seg, schema="__id long, tx long, ty long, tree_local long"
    )
    # tile-scoped global ids: dense rank over each (tile, local
    # tree)'s smallest member id — deterministic numbering
    labeled = res.where(F.col("tree_local") > 0)
    tmin = labeled.groupBy("tx", "ty", "tree_local").agg(
        F.min("__id").alias("__m")
    )
    wnd = Window.orderBy("__m", "tx", "ty", "tree_local")
    gids = tmin.withColumn("tree_id", F.dense_rank().over(wnd))
    out = (
        res.join(gids.select("tx", "ty", "tree_local", "tree_id"),
                 on=["tx", "ty", "tree_local"], how="left")
        .withColumn("tree_id",
                    F.coalesce(F.col("tree_id"), F.lit(0)))
        .select("__id", "tree_id")
    )
    return (
        df.join(out, on=F.col(id_col).cast("long") == F.col("__id"))
        .drop("__id")
    )


NMI_Q = 1 << 24


def clustering_nmi(
    df: DataFrame,
    a_col: str,
    b_col: str,
    q: int = NMI_Q,
) -> DataFrame:
    """Normalized mutual information between two categorical
    assignments (Strehl & Ghosh 2002) — THE cluster-vs-label
    agreement score: does the unsupervised partition (kmeans / IVF
    buckets / LPA communities) recover the known labels? NMI =
    2*MI / (H_a + H_b), 0 = independent, 1 = identical partitions.

    Integer-lnq discipline: from the contingency counts n_ij and
    marginals a_i, b_j (all exact),

        mi_qn = sum_ij n_ij * (lnq(n_ij * N) - lnq(a_i * b_j))
        ha_qn = sum_i  a_i  * (lnq(N) - lnq(a_i))   (hb_qn alike)

    — every compared value an exact int64 (args < 2^53); nmi is ONE
    IEEE division. Output one row: n, n_cells, mi_qn, ha_qn, hb_qn,
    nmi.

    Scale: ONE map-side-combined contingency groupBy (cells =
    |A|x|B|, tiny) + two reaggregations of that table; the data is
    scanned once.
    """
    def lnq(x: str) -> str:
        return (
            f"cast(floor(ln(cast({x} as double)) * {int(q)}"
            " + 0.5e0) as bigint)"
        )

    ct = df.groupBy(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).agg(F.count(F.lit(1)).alias("n_ij"))
    ma = ct.groupBy("__a").agg(F.sum("n_ij").alias("a_i"))
    mb = ct.groupBy("__b").agg(F.sum("n_ij").alias("b_j"))
    tot = ct.agg(
        F.sum("n_ij").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    mi = (
        ct.join(ma, on="__a").join(mb, on="__b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.expr(
                f"n_ij * ({lnq('n_ij * n')} - {lnq('a_i * b_j')})"
            )).alias("mi_qn")
        )
    )
    ha = ma.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(
            f"a_i * ({lnq('n')} - {lnq('a_i')})"
        )).alias("ha_qn")
    )
    hb = mb.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(
            f"b_j * ({lnq('n')} - {lnq('b_j')})"
        )).alias("hb_qn")
    )
    return (
        tot.crossJoin(mi).crossJoin(ha).crossJoin(hb)
        .select(
            "n", "n_cells", "mi_qn", "ha_qn", "hb_qn",
            F.expr(
                "CASE WHEN ha_qn + hb_qn > 0 THEN"
                " 2.0e0 * cast(mi_qn as double)"
                " / cast(ha_qn + hb_qn as double) END"
            ).alias("nmi"),
        )
    )


def adjusted_rand(
    df: DataFrame,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Adjusted Rand index between two labelings (Hubert & Arabie
    1985) — clustering_nmi's pair-counting sibling (chance-
    corrected: 0 expected for random labelings, 1 identical):

        ARI = (P - Pa Pb / Pn) / ((Pa + Pb)/2 - Pa Pb / Pn)

    with P = sum_ij C(n_ij, 2), Pa/Pb the marginal pair sums and
    Pn = C(n, 2) — every pair count an exact int64 (DOUBLED:
    2*C(m,2) = m(m-1) avoids the half), the closing ratio one IEEE
    chain. NULL when both labelings are all-singletons or one
    cluster (denominator 0). Output: (n, p2, pa2, pb2, ari).

    Scale: ONE (a, b) contingency agg + two marginal aggs — never
    materializes pairs.
    """
    base = df.select(
        F.col(label_a).alias("a"), F.col(label_b).alias("b")
    )
    nij = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    p2 = nij.agg(
        F.sum(F.expr("c * (c - 1)")).alias("p2"),
        F.sum("c").alias("n"),
    )
    pa2 = (
        nij.groupBy("a").agg(F.sum("c").alias("ca"))
        .agg(F.sum(F.expr("ca * (ca - 1)")).alias("pa2"))
    )
    pb2 = (
        nij.groupBy("b").agg(F.sum("c").alias("cb"))
        .agg(F.sum(F.expr("cb * (cb - 1)")).alias("pb2"))
    )
    j = p2.crossJoin(F.broadcast(pa2)).crossJoin(F.broadcast(pb2))
    exp = (
        "(cast(pa2 as double) * cast(pb2 as double)"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
    )
    den = (
        f"((cast(pa2 as double) + cast(pb2 as double)) / 2.0e0"
        f" - {exp})"
    )
    return j.select(
        "n", "p2", "pa2", "pb2",
        F.expr(
            f"case when n > 1 and {den} <> 0.0e0 then"
            f" (cast(p2 as double) - {exp}) / {den} end"
        ).alias("ari"),
    )


CH_Q = 1 << 16


def calinski_harabasz(
    df: DataFrame,
    label: str,
    x: str,
    y: str,
) -> DataFrame:
    """Calinski-Harabasz (variance-ratio) clustering index (1974)
    — silhouette's cheap global sibling (one pass, no pairs):

        CH = (B / (k-1)) / (W / (n-k))

    with W = within-cluster SSE and B = total SSE - W. Each
    cluster's SSE rational (n_c*(SSx+SSy) - Sx^2 - Sy^2) / n_c
    quantizes by the split-division trick (exact order-invariant
    int64 folds, Q = 2^16); same for the total. Output one row:
    (n, k, w_q, t_q, ch).

    Scale: ONE (label) hash agg + ONE fold. Bound:
    n_c * SS * Q-split < 2^63 — quantize coordinates coarsely on
    huge extents.
    """
    q = CH_Q
    base = df.select(
        F.col(label).alias("g"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    )
    grp = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"),
        F.sum(F.expr("px * px + py * py")).alias("ss"),
    )

    def _qdiv(d: str, nn: str) -> str:
        return (
            f"(({d}) div ({nn})) * cast({q} as bigint)"
            f" + ((({d}) % ({nn})) * cast({q} as bigint))"
            f" div ({nn})"
        )

    wd = "(n_c * ss - sx * sx - sy * sy)"
    agg = grp.agg(
        F.sum("n_c").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.expr(_qdiv(wd, "n_c"))).alias("w_q"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("ss").alias("tss"),
    )
    td = "(n * tss - tsx * tsx - tsy * tsy)"
    tot = agg.select(
        "n", "k", "w_q",
        F.expr(_qdiv(td, "n")).alias("t_q"),
    )
    ch = (
        "((cast(t_q as double) - cast(w_q as double))"
        " / (cast(k as double) - 1.0e0))"
        " / (cast(w_q as double) / (cast(n as double)"
        " - cast(k as double)))"
    )
    return tot.select(
        "n", "k", "w_q", "t_q",
        F.expr(
            f"case when k > 1 and n > k and w_q > 0 then {ch} end"
        ).alias("ch"),
    )


DB_Q = 1 << 20


def davies_bouldin(
    df: DataFrame,
    label: str,
    x: str,
    y: str,
) -> DataFrame:
    """Davies-Bouldin internal clustering index (1979) — the
    similarity-of-worst-neighbor complement of calinski_harabasz
    (lower is better):

        DB = (1/k) sum_i max_{j != i} (S_i + S_j) / d(c_i, c_j)

    Per-cluster scatter S = sqrt(SSE_int)/n and centroid distances
    evaluate as fixed IEEE chains from exact integer moments
    (products exceed int64 so the chain runs in doubles —
    deterministic, the affine_from_gcps convention); each cluster's
    max-ratio quantizes to the 2^-20 grid so the final mean is an
    exact integer fold. Output: (k, db_q_sum, db).

    Scale: ONE (label) agg + a k^2 centroid-pair self-join (k is
    small by construction) + two folds.
    """
    q = float(DB_Q)
    grp = df.select(
        F.col(label).alias("g"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"),
        F.sum(F.expr("px * px + py * py")).alias("ss"),
    ).withColumn(
        "s_c",
        F.expr(
            "sqrt(cast(n_c as double) * cast(ss as double)"
            " - cast(sx as double) * cast(sx as double)"
            " - cast(sy as double) * cast(sy as double))"
            " / cast(n_c as double)"
        ),
    )
    a = grp.select(
        F.col("g").alias("gi"), F.col("n_c").alias("ni"),
        F.col("sx").alias("sxi"), F.col("sy").alias("syi"),
        F.col("s_c").alias("si"),
    )
    b = grp.select(
        F.col("g").alias("gj"), F.col("n_c").alias("nj"),
        F.col("sx").alias("sxj"), F.col("sy").alias("syj"),
        F.col("s_c").alias("sj"),
    )
    pairs = a.join(b, F.col("gi") != F.col("gj"))
    dd = (
        "sqrt((cast(sxi as double) * cast(nj as double)"
        " - cast(sxj as double) * cast(ni as double))"
        " * (cast(sxi as double) * cast(nj as double)"
        " - cast(sxj as double) * cast(ni as double))"
        " + (cast(syi as double) * cast(nj as double)"
        " - cast(syj as double) * cast(ni as double))"
        " * (cast(syi as double) * cast(nj as double)"
        " - cast(syj as double) * cast(ni as double)))"
        " / (cast(ni as double) * cast(nj as double))"
    )
    ratio = pairs.select(
        "gi",
        F.expr(f"(si + sj) / ({dd})").alias("r"),
    )
    mx = ratio.groupBy("gi").agg(F.max("r").alias("mr"))
    agg = mx.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.expr(
                f"cast(floor(mr * {q!r}e0 + 0.5e0) as bigint)"
            )
        ).alias("db_q_sum"),
    )
    return agg.select(
        "k", "db_q_sum",
        F.expr(
            "case when k > 0 then cast(db_q_sum as double)"
            f" / (cast(k as double) * {q!r}e0) end"
        ).alias("db"),
    )


VI_Q = 1 << 10


def variation_information(
    df: DataFrame,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Variation of information between two labelings (Meila 2007)
    — the METRIC member of the agreement family (a true distance,
    unlike ARI/NMI): VI = H(A) + H(B) - 2 I(A;B), computed as

        VI = sum_ij (n_ij / n) * ln( (n_i n_j) / n_ij^2 )

    — each cell's ln of an exact integer ratio quantizes to the
    2^-10 grid (the markov_entropy_rate convention), the
    accumulation sum(n_ij * lnq) is exact int64, VI one division.
    0 iff identical partitions (up to relabeling). Output:
    (n, vi_q_sum, vi).

    Scale: ONE contingency agg + two marginal join-backs.
    """
    q = float(VI_Q)
    base = df.select(
        F.col(label_a).alias("a"), F.col(label_b).alias("b")
    )
    nij = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    na = nij.groupBy("a").agg(F.sum("c").alias("ca"))
    nb = nij.groupBy("b").agg(F.sum("c").alias("cb"))
    n_df = nij.agg(F.sum("c").alias("n"))
    terms = (
        nij.join(na, on="a").join(nb, on="b")
        .crossJoin(F.broadcast(n_df))
        .select(
            "c", "n",
            F.expr(
                "cast(floor(ln(cast(ca as double)"
                " * cast(cb as double)"
                " / (cast(c as double) * cast(c as double)))"
                f" * {q!r}e0 + 0.5e0) as bigint)"
            ).alias("lnq"),
        )
    )
    agg = terms.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("c * lnq")).alias("vi_q_sum"),
    )
    return agg.select(
        "n", "vi_q_sum",
        F.expr(
            "case when n > 0 then cast(vi_q_sum as double)"
            f" / (cast(n as double) * {q!r}e0) end"
        ).alias("vi"),
    )


def cluster_purity(
    df: DataFrame,
    cluster: str,
    truth: str,
) -> DataFrame:
    """Cluster purity (the simplest external clustering score:
    assign each cluster its majority true class — what fraction of
    points land in their cluster's majority?):

        purity = sum_c max_t n_ct / n

    Exact integers; one division. Reported with the majority-class
    breakdown count so the caller can weigh it against k (purity
    inflates as clusters shrink — read next to adjusted_rand).
    Output: (n, n_clusters, sum_majority, purity).

    Scale: ONE (cluster, truth) agg + ONE cluster max + ONE fold.
    """
    base = df.select(
        F.col(cluster).alias("c"), F.col(truth).alias("t")
    )
    nct = base.groupBy("c", "t").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    per_c = nct.groupBy("c").agg(
        F.max("m").alias("mx"), F.sum("m").alias("sz")
    )
    agg = per_c.agg(
        F.sum("sz").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("mx").alias("sum_majority"),
    )
    return agg.select(
        "n", "n_clusters", "sum_majority",
        F.expr(
            "case when n > 0 then cast(sum_majority as double)"
            " / cast(n as double) end"
        ).alias("purity"),
    )
