"""Neighborhood geometry features (SURVEY.md §2.7 bottom row).

The reference ships a family of per-point features computed from the
k/radius-neighborhood covariance matrix: filters.eigenvalues
(EigenvaluesFilter.cpp), filters.covariancefeatures
(CovarianceFeaturesFilter.cpp: linearity/planarity/...),
filters.normal, filters.estimaterank, filters.approximatecoplanar.
All of them share one kernel: neighborhood -> covariance ->
eigendecomposition.

Distributed shape: ONE radius join (cell-bucketed, operators.knn),
then per-source sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) as
a map-side-combinable agg, then the CLOSED-FORM 2x2 symmetric
eigenvalues — pure Catalyst (+,-,*,/,sqrt: IEEE-exact, so the DuckDB
oracle matches bit-for-bit). PDAL's 3D variants need a cubic solve;
the engine's point model is 2D (lon/lat web points), where the
closed form is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.operators.knn import knn_join, radius_join


def neighborhood_features(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    include_self: bool = True,
) -> DataFrame:
    """Per-point 2D covariance eigen-features of the radius
    neighborhood: eigenvalue_1 >= eigenvalue_2 (population
    covariance, like the reference's Eigen::computeCovarianceMatrix),
    linearity (l1-l2)/l1, sum_eigen, and n_neighbors."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[x, y], include_self=include_self,
    )
    nx, ny = F.col(f"nb_{x}"), F.col(f"nb_{y}")
    # sums routed through decimal: float sums are partial-agg-order
    # dependent (nondeterministic across runs/partitionings); decimal
    # addition is exact and associative, then one cast back.
    dec = "decimal(30,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    s = pairs.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(nx).alias("sx"), dsum(ny).alias("sy"),
        dsum(nx * nx).alias("sxx"),
        dsum(ny * ny).alias("syy"),
        dsum(nx * ny).alias("sxy"),
    )
    n = F.col("n")
    # population covariance entries
    cxx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    cyy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    cxy = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    s = (
        s.withColumn("cxx", cxx)
        .withColumn("cyy", cyy)
        .withColumn("cxy", cxy)
    )
    # closed-form symmetric 2x2 eigenvalues
    mean = (F.col("cxx") + F.col("cyy")) / F.lit(2.0)
    half = (F.col("cxx") - F.col("cyy")) / F.lit(2.0)
    root = F.sqrt(half * half + F.col("cxy") * F.col("cxy"))
    s = (
        s.withColumn("eigenvalue_1", mean + root)
        .withColumn("eigenvalue_2", mean - root)
        .withColumn(
            "linearity",
            (F.col("eigenvalue_1") - F.col("eigenvalue_2"))
            / F.col("eigenvalue_1"),
        )
        .withColumn(
            "sum_eigen", F.col("eigenvalue_1") + F.col("eigenvalue_2")
        )
        .withColumnRenamed("n", "n_neighbors")
    )
    # filters.normal analog: the unit eigenvector of the SMALLER
    # eigenvalue, direction (cxy, lambda2 - cxx); degenerate
    # (isotropic, cxy == 0) neighborhoods take the axis of smaller
    # variance — same CASE logic the oracle mirrors.
    nx_raw = F.col("cxy")
    ny_raw = F.col("eigenvalue_2") - F.col("cxx")
    nrm = F.sqrt(nx_raw * nx_raw + ny_raw * ny_raw)
    s = s.withColumn(
        "normal_x",
        F.when(nrm > 0, nx_raw / nrm)
        .when(F.col("cxx") <= F.col("cyy"), F.lit(1.0))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "normal_y",
        F.when(nrm > 0, ny_raw / nrm)
        .when(F.col("cxx") <= F.col("cyy"), F.lit(0.0))
        .otherwise(F.lit(1.0)),
    )
    keep = ["src_id", "n_neighbors", "cxx", "cyy", "cxy",
            "eigenvalue_1", "eigenvalue_2", "linearity", "sum_eigen",
            "normal_x", "normal_y"]
    out = s.select(*keep).withColumnRenamed("src_id", id_col)
    return df.join(out, on=id_col, how="left")


def normals_refine(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    nx: str = "normal_x",
    ny: str = "normal_y",
    max_rounds: int = 20,
) -> DataFrame:
    """filters.normal `refine` option (NormalFilter.cpp:64-66,
    refine via a minimum spanning tree walk): orient the
    sign-ambiguous eigen-normals CONSISTENTLY across the radius
    graph (VERDICT r1 #10).

    Distributed analog of the reference's MST+DFS: seed = the
    smallest id of each connected component keeps its sign; each
    round, every unoriented point adjacent to an oriented one adopts
    the orientation of its most-aligned oriented neighbor (max
    |n·n'|, ties to the smaller neighbor id — the greedy-forest
    counterpart of the MST's strongest edge), flipping when the dot
    is negative. Deterministic: IEEE dots + total tie order.
    Converges in graph-diameter rounds; points in components never
    reached (isolated) keep their sign.

    Scale: the edge list is ONE radius_join (cell-bucketed); each
    round is a join against the currently-oriented frontier only,
    localCheckpoint-truncated like knn_join's ring expansion.
    """
    edges = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[nx, ny], include_self=False,
    ).select(
        F.col("src_id"), F.col("nb_id"),
        F.col(f"nb_{nx}").alias("e_nx"),
        F.col(f"nb_{ny}").alias("e_ny"),
    ).persist()

    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(nx).alias("o_nx"), F.col(ny).alias("o_ny"),
    )
    # seeds: smallest id per component == points with no smaller-id
    # neighbor in the graph... NOT component-minimal in general; the
    # true component minimum needs CC. Use local minima as seeds:
    # every component contains its global minimum (which is locally
    # minimal), extra local-min seeds just start extra consistent
    # regions — the reference's multi-viewpoint analog.
    smaller = edges.where(F.col("nb_id") < F.col("src_id")).select(
        F.col("src_id").alias("pid")
    ).distinct()
    oriented = pts.join(smaller, on="pid", how="left_anti").select(
        "pid", F.lit(1).alias("flip"),  # +1 keep, -1 flip
    ).localCheckpoint(eager=True)
    frontier = oriented
    for _ in range(int(max_rounds)):
        if frontier.limit(1).count() == 0:
            break
        # neighbors of the frontier not yet oriented
        cand = (
            edges.join(
                frontier.withColumnRenamed("pid", "nb_id"),
                on="nb_id",
            )
            .join(oriented.select(F.col("pid").alias("src_id")),
                  on="src_id", how="left_anti")
        )
        # most-aligned oriented neighbor per candidate
        cand = cand.join(
            pts.select(F.col("pid").alias("src_id"),
                       F.col("o_nx").alias("s_nx"),
                       F.col("o_ny").alias("s_ny")),
            on="src_id",
        ).withColumn(
            "dot",
            F.col("s_nx") * F.col("e_nx")
            + F.col("s_ny") * F.col("e_ny"),
        )
        w = Window.partitionBy("src_id").orderBy(
            F.abs(F.col("dot")).desc(), F.col("nb_id").asc()
        )
        newly = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                F.col("src_id").alias("pid"),
                (F.col("flip")
                 * F.when(F.col("dot") < 0, -1).otherwise(1))
                .alias("flip"),
            )
        ).localCheckpoint(eager=True)
        if newly.limit(1).count() == 0:
            break
        oriented = oriented.unionByName(newly).localCheckpoint(
            eager=True
        )
        frontier = newly
    edges.unpersist()
    out = (
        df.join(
            oriented.withColumnRenamed("pid", id_col), on=id_col,
            how="left",
        )
        .withColumn("flip", F.coalesce(F.col("flip"), F.lit(1)))
        .withColumn(nx, F.col(nx) * F.col("flip"))
        .withColumn(ny, F.col(ny) * F.col("flip"))
        .drop("flip")
    )
    return out


def optimal_neighborhood(
    df: DataFrame,
    min_k: int = 10,
    max_k: int = 14,
    cell: float = 1.0,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """filters.optimalneighborhood (OptimalNeighborhoodFilter.cpp:
    72-165): per point, the k in [min_k, max_k] whose k-neighborhood
    minimizes eigenentropy -sum(p_i ln p_i) over normalized sample-
    covariance eigenvalues; ties keep the smallest k (the reference's
    strict `entropy < minentropy`). optimal_radius is the kth
    neighbor distance.

    ONE exact kNN join at max_k, then CUMULATIVE decimal moment sums
    over the rank order give every k's covariance in a single window
    pass — no per-k re-aggregation, no extra shuffle beyond the join.

    min_k is clamped to 2: a 1-neighborhood has no sample covariance
    (the reference's n-1 divisor would be 0 there too).
    """
    from pyspark.sql import Window

    min_k = max(2, int(min_k))

    pairs = knn_join(
        df, df, max_k, cell, x=x, y=y, id_left=id_col,
        id_right=id_col, right_cols=[x, y], include_self=True,
    )
    w = (
        Window.partitionBy("src_id")
        .orderBy("nn_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(30,10)"

    def csum(col):
        return F.sum(col.cast(dec)).over(w).cast("double")

    nx, ny = F.col(f"nb_{x}"), F.col(f"nb_{y}")
    t = pairs.select(
        "src_id", "nn_rank", "dist",
        csum(nx).alias("sx"), csum(ny).alias("sy"),
        csum(nx * nx).alias("sxx"), csum(ny * ny).alias("syy"),
        csum(nx * ny).alias("sxy"),
    ).where(F.col("nn_rank").between(min_k, max_k))
    n = F.col("nn_rank").cast("double")
    nm1 = n - F.lit(1.0)
    cxx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / nm1
    cyy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / nm1
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / nm1
    mean = (cxx + cyy) / F.lit(2.0)
    half = (cxx - cyy) / F.lit(2.0)
    root = F.sqrt(half * half + cxy * cxy)
    l1 = F.greatest(mean + root, F.lit(0.0))
    l2 = F.greatest(mean - root, F.lit(0.0))
    tot = l1 + l2
    p1, p2 = l1 / tot, l2 / tot
    ent = -(
        F.when(p1 > 0, p1 * F.log(p1)).otherwise(F.lit(0.0))
        + F.when(p2 > 0, p2 * F.log(p2)).otherwise(F.lit(0.0))
    )
    # ln differs in last ulps across libm builds -> round before the
    # argmin so both engines rank identically (see sqlgen docstring).
    # tot == 0 (all-duplicate neighborhood): entropy undefined — an
    # +inf sentinel keeps the row out of the argmin like the
    # reference's NaN (and keeps ANSI division guarded); the when()
    # short-circuits so the division never evaluates there
    t = t.withColumn(
        "ent",
        F.when(tot > 0, F.round(ent, 6))
        .otherwise(F.lit(float("inf"))),
    )
    pick = Window.partitionBy("src_id").orderBy(
        F.col("ent").asc(), F.col("nn_rank").asc()
    )
    out = (
        t.withColumn("__r", F.row_number().over(pick))
        .where(F.col("__r") == 1)
        .select(
            F.col("src_id").alias(id_col),
            F.col("nn_rank").alias("optimal_k"),
            F.col("dist").alias("optimal_radius"),
        )
    )
    return out


def plane_fit(
    df: DataFrame,
    k: int = 8,
    cell: float = 1.0,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """filters.planefit (PlaneFitFilter.cpp:120-170): fit the total-
    least-squares line (2D plane analog) through each point's k
    NEIGHBORS (self excluded), then planefit = d / (d + d_bar) where
    d is the point's |distance| to that line and d_bar the mean
    neighbor |distance|. Normal = eigenvector of the smaller sample-
    covariance eigenvalue, centroid-demeaned, like the reference.
    """
    pairs = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[x, y], include_self=False,
    ).localCheckpoint(eager=True)
    dec = "decimal(30,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    nx, ny = F.col(f"nb_{x}"), F.col(f"nb_{y}")
    s = pairs.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(nx).alias("sx"), dsum(ny).alias("sy"),
        dsum(nx * nx).alias("sxx"), dsum(ny * ny).alias("syy"),
        dsum(nx * ny).alias("sxy"),
    )
    n = F.col("n").cast("double")
    nm1 = n - F.lit(1.0)
    cxx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / nm1
    cyy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / nm1
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / nm1
    mean = (cxx + cyy) / F.lit(2.0)
    half = (cxx - cyy) / F.lit(2.0)
    root = F.sqrt(half * half + cxy * cxy)
    e2 = mean - root
    nx_raw, ny_raw = cxy, e2 - cxx
    nrm = F.sqrt(nx_raw * nx_raw + ny_raw * ny_raw)
    params = s.select(
        "src_id", "n",
        (F.col("sx") / n).alias("mx"), (F.col("sy") / n).alias("my"),
        F.when(nrm > 0, nx_raw / nrm)
        .when(cxx <= cyy, F.lit(1.0)).otherwise(F.lit(0.0))
        .alias("vx"),
        F.when(nrm > 0, ny_raw / nrm)
        .when(cxx <= cyy, F.lit(0.0)).otherwise(F.lit(1.0))
        .alias("vy"),
    ).localCheckpoint(eager=True)

    nbd = pairs.join(params, on="src_id").select(
        "src_id", "n",
        F.abs(
            (nx - F.col("mx")) * F.col("vx")
            + (ny - F.col("my")) * F.col("vy")
        ).alias("t"),
    )
    # 18 fractional digits: near-colinear neighborhoods have |t| of
    # float-noise magnitude (~1e-13); decimal(30,10) would quantize
    # them to zero and push planefit to exactly 1.0
    dbar = nbd.groupBy("src_id", "n").agg(
        (
            F.sum(F.col("t").cast("decimal(38,18)")).cast("double")
            / F.col("n").cast("double")
        ).alias("dbar")
    )
    pt = df.select(
        F.col(id_col).alias("src_id"),
        F.col(x).alias("px"), F.col(y).alias("py"),
    ).join(params, on="src_id").select(
        "src_id",
        F.abs(
            (F.col("px") - F.col("mx")) * F.col("vx")
            + (F.col("py") - F.col("my")) * F.col("vy")
        ).alias("d"),
    )
    out = pt.join(dbar.drop("n"), on="src_id").select(
        F.col("src_id").alias(id_col),
        F.when(
            F.col("d") + F.col("dbar") > 0,
            F.col("d") / (F.col("d") + F.col("dbar")),
        ).otherwise(F.lit(0.0)).alias("planefit"),
    )
    return out


def miniball(
    df: DataFrame,
    k: int = 8,
    cell: float = 1.0,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """filters.miniball (MiniballFilter.cpp:106-152): smallest
    enclosing circle of each point's k neighbors (self excluded);
    output = d / (d + 2*r/sqrt(2)) with d the point-to-center
    distance (the reference's 3D normalization uses sqrt(3); sqrt(2)
    is the 2D analog).

    Pure Catalyst brute force instead of the reference's Welzl
    solver: the optimal circle is determined by 2 or 3 of the k
    neighbors, so enumerate all C(k,2) diameter circles and C(k,3)
    circumcircles per point, keep candidates containing all k
    neighbors, take the smallest (ties by center). A candidate's r2
    is the max of its defining points' containment distances — the
    same expression used for the containment test, so self-
    containment is float-exact and both engines agree bit-for-bit.
    O(k^3) candidate rows per point stay distributed; no Python.
    """
    pairs = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[x, y], include_self=False,
    )
    nn = pairs.select(
        "src_id", F.col("nn_rank").alias("r"),
        F.col(f"nb_{x}").alias("qx"), F.col(f"nb_{y}").alias("qy"),
    ).localCheckpoint(eager=True)

    a, b, c = [nn.alias(t) for t in "abc"]

    def col(t, f):
        return F.col(f"{t}.{f}")

    two = F.lit(2.0)
    pair_c = (
        a.join(b, (col("a", "src_id") == col("b", "src_id"))
               & (col("a", "r") < col("b", "r")))
        .select(
            col("a", "src_id").alias("src_id"),
            ((col("a", "qx") + col("b", "qx")) / two).alias("ux"),
            ((col("a", "qy") + col("b", "qy")) / two).alias("uy"),
        )
    )
    ax, ay = col("a", "qx"), col("a", "qy")
    bx, by = col("b", "qx"), col("b", "qy")
    cx, cy = col("c", "qx"), col("c", "qy")
    det = two * (
        ax * (by - cy) + bx * (cy - ay) + cx * (ay - by)
    )
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    tri_c = (
        a.join(b, (col("a", "src_id") == col("b", "src_id"))
               & (col("a", "r") < col("b", "r")))
        .join(c, (col("a", "src_id") == col("c", "src_id"))
              & (col("b", "r") < col("c", "r")))
        .where(det != 0)
        .select(
            col("a", "src_id").alias("src_id"),
            ((a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / det)
            .alias("ux"),
            ((a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / det)
            .alias("uy"),
        )
    )
    cands = pair_c.unionByName(tri_c)
    scored = (
        cands.join(nn, on="src_id")
        .groupBy("src_id", "ux", "uy")
        .agg(
            F.max(
                (F.col("qx") - F.col("ux"))
                * (F.col("qx") - F.col("ux"))
                + (F.col("qy") - F.col("uy"))
                * (F.col("qy") - F.col("uy"))
            ).alias("r2")
        )
    )
    from pyspark.sql import Window

    pick = Window.partitionBy("src_id").orderBy(
        F.col("r2").asc(), F.col("ux").asc(), F.col("uy").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select("src_id", "ux", "uy", F.sqrt("r2").alias("rad"))
    )
    pt = df.select(
        F.col(id_col).alias("src_id"),
        F.col(x).alias("px"), F.col(y).alias("py"),
    )
    d = F.sqrt(
        (F.col("px") - F.col("ux")) * (F.col("px") - F.col("ux"))
        + (F.col("py") - F.col("uy")) * (F.col("py") - F.col("uy"))
    )
    return pt.join(best, on="src_id").select(
        F.col("src_id").alias(id_col),
        (d / (d + two * F.col("rad") / F.sqrt(two)))
        .alias("miniball"),
    )


def convex_hull_exact(
    df: DataFrame, x: str = "lon", y: str = "lat", quant: int = 1 << 20
) -> DataFrame:
    """Exact convex-hull VERTEX set of a point cloud (the boundary
    summary next to filters.hexbin's density boundary; PDAL exposes
    the same need as hexbin's ``h3_grid``/boundary outputs).

    Coordinates quantize to a 2^-20-degree integer grid first, so
    every cross product is int64-exact (|q| <= 1.9e8, product <=
    1.5e17) and the result hash-matches any engine running the same
    arithmetic. Definition: p is a hull vertex iff some direction
    p->q puts EVERY other point r strictly left (cross > 0) or
    exactly along the edge ray (cross = 0 AND dot(q-p, r-p) > 0 —
    without the dot term a point sitting ON a hull edge would kill
    its strictly-convex endpoint). Collinear MID points are NOT
    vertices; output equals Andrew monotone chain with strict
    popping, point-for-point (pytest-pinned vs :func:`convex_hull`).

    O(n^2 k) pairwise form — the ORACLE-EXACT small-n path (filter
    first!); use :func:`convex_hull` for the distributed
    monotone-chain path at scale.
    """
    qx = f"cast(floor(`{x}` * {int(quant)}) as bigint)"
    qy = f"cast(floor(`{y}` * {int(quant)}) as bigint)"
    pts = df.select(
        F.expr(qx).alias("qx"), F.expr(qy).alias("qy")
    ).distinct()
    # degenerate inputs (<3 distinct quantized points) have no (p,q,r)
    # triple — the pairwise test would return empty; match convex_hull
    # by returning the distinct points themselves (ADVICE r1)
    if pts.limit(3).count() < 3:
        return pts
    p = pts.select(F.col("qx").alias("px"), F.col("qy").alias("py"))
    q = pts.select(F.col("qx").alias("ex"), F.col("qy").alias("ey"))
    pairs = p.crossJoin(q).where(
        "NOT (px = ex AND py = ey)"
    )
    chk = pairs.join(
        F.broadcast(pts.select(F.col("qx").alias("rx"),
                               F.col("qy").alias("ry"))),
        F.expr("NOT (rx = px AND ry = py) AND NOT (rx = ex AND ry = ey)"),
    ).groupBy("px", "py", "ex", "ey").agg(
        F.min(
            F.expr(
                "CASE WHEN (ex - px) * (ry - py) - (ey - py) * (rx - px)"
                " > 0 OR ((ex - px) * (ry - py) - (ey - py) * (rx - px)"
                " = 0 AND (ex - px) * (rx - px) + (ey - py) * (ry - py)"
                " > 0) THEN 1 ELSE 0 END"
            )
        ).alias("__mc")
    )
    return (
        chk.where("__mc = 1")
        .select(F.col("px").alias("qx"), F.col("py").alias("qy"))
        .distinct()
    )


def convex_hull(
    df: DataFrame, x: str = "lon", y: str = "lat", quant: int = 1 << 20
) -> DataFrame:
    """Distributed convex hull — the scale path: Andrew monotone
    chain per PARTITION (numpy over Arrow batches, hull(partition) is
    a superset-free local summary), union the partial hull vertices
    (<= a few dozen per partition regardless of partition size), then
    one final chain over the reduced set. hull(union of partial
    hulls) == hull(all points), so the result equals
    :func:`convex_hull_exact` point-for-point (pytest-pinned);
    shuffle volume is O(partitions), not O(rows).
    """
    def _chain(arr):
        import numpy as np

        pts = arr[np.lexsort((arr[:, 1], arr[:, 0]))]
        pts = np.unique(pts, axis=0)
        if len(pts) < 3:
            return pts

        def half(seq):
            out = []
            for pt in seq:
                while len(out) >= 2:
                    ox, oy = out[-2]
                    ax, ay = out[-1]
                    if (ax - ox) * (pt[1] - oy) - (ay - oy) * (pt[0] - ox) <= 0:
                        out.pop()
                    else:
                        break
                out.append((int(pt[0]), int(pt[1])))
            return out[:-1]

        lower = half(pts)
        upper = half(pts[::-1])
        hull = lower + upper
        return np.array(hull, dtype=np.int64).reshape(-1, 2)

    def _partial(it):
        import numpy as np
        import pandas as pd

        # Concat the whole partition before chaining: the hull is a
        # PARTITION-level summary, and the final single-partition pass
        # must see every partial vertex in ONE chain.
        frames = [pdf for pdf in it if not pdf.empty]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        arr = np.stack(
            [pdf["qx"].to_numpy(np.int64), pdf["qy"].to_numpy(np.int64)],
            axis=1,
        )
        h = _chain(arr)
        yield pd.DataFrame({"qx": h[:, 0], "qy": h[:, 1]})

    qx = f"cast(floor(`{x}` * {int(quant)}) as bigint)"
    qy = f"cast(floor(`{y}` * {int(quant)}) as bigint)"
    pts = df.select(F.expr(qx).alias("qx"), F.expr(qy).alias("qy"))
    schema = "qx bigint, qy bigint"
    partial = pts.mapInPandas(_partial, schema=schema)
    # Final pass: the union of partial hulls is tiny — one partition.
    final = partial.repartition(1).mapInPandas(_partial, schema=schema)
    return final


def polygon_centroid(
    verts: DataFrame,
    poly_id: str = "poly_id",
    seq: str = "seq",
    x: str = "xq",
    y: str = "yq",
) -> DataFrame:
    """Area-weighted polygon centroid + signed area via the shoelace
    formula over an integer vertex table (poly_id, seq, xq, yq) —
    the vector-layer summarization primitive (label placement, zone
    representative points) the crop/overlay family reads polygons
    from.

    Exact integer sufficient statistics per polygon:

        a2     = sum cross_i               (= 2 * signed area)
        cx6    = sum (x_i + x_j) * cross_i (= 6 * area * cx)
        cy6    = sum (y_i + y_j) * cross_i
        cross_i = x_i * y_j - x_j * y_i    (j = cyclic next vertex)

    cx = cx6 / (3 * a2), cy = cy6 / (3 * a2): each ONE IEEE division
    of exact ints — hash-exact cross-engine. Bound: |coord| < 2^20
    keeps every term under 2^62 for <= 2^20 vertices.

    Scale: one per-polygon lead() window (cyclic next via a
    first_value fallback) + ONE hash aggregate.
    """
    w = Window.partitionBy("p").orderBy("s")
    base = verts.select(
        F.col(poly_id).alias("p"), F.col(seq).alias("s"),
        F.col(x).cast("long").alias("vx"),
        F.col(y).cast("long").alias("vy"),
    )
    e = base.select(
        "p", "vx", "vy",
        F.coalesce(F.lead("vx").over(w),
                   F.first("vx").over(w)).alias("nx"),
        F.coalesce(F.lead("vy").over(w),
                   F.first("vy").over(w)).alias("ny"),
    )
    cross = F.col("vx") * F.col("ny") - F.col("nx") * F.col("vy")
    agg = e.groupBy("p").agg(
        F.sum(cross).alias("a2"),
        F.sum((F.col("vx") + F.col("nx")) * cross).alias("cx6"),
        F.sum((F.col("vy") + F.col("ny")) * cross).alias("cy6"),
    )
    return agg.select(
        F.col("p").alias(poly_id), "a2", "cx6", "cy6",
        F.expr("cast(cx6 as double) / cast(3 * a2 as double)")
        .alias("cx"),
        F.expr("cast(cy6 as double) / cast(3 * a2 as double)")
        .alias("cy"),
    )


def polygon_compactness(
    verts: DataFrame,
    poly_id: str = "poly_id",
    seq: str = "seq",
    x: str = "xq",
    y: str = "yq",
) -> DataFrame:
    """Polsby-Popper shape compactness per polygon over the integer
    vertex table: pp = 4*pi*area / perimeter^2 in [0, 1] (1 = a
    circle) — the gerrymander / sliver-polygon / blob-vs-tendril
    screen next to :func:`polygon_centroid`'s location summary.

    Exact sufficient statistics on the quantized grid: a2 = the
    shoelace sum (2x signed area, int64), perim_q = sum of per-edge
    floor(sqrt(d2) * 1000 + 0.5) (sqrt of an exact int is engine-
    invariant; lengths accumulate as integer milliunits). pp is one
    IEEE chain: 2*pi*|a2|*1e6 / perim_q^2.

    Scale: one per-polygon lead() window + ONE hash aggregate
    (polygon_centroid's plan shape).
    """
    import math

    from pdal_spark import sqlgen as G

    w = Window.partitionBy("p").orderBy("s")
    base = verts.select(
        F.col(poly_id).alias("p"), F.col(seq).alias("s"),
        F.col(x).cast("long").alias("vx"),
        F.col(y).cast("long").alias("vy"),
    )
    e = base.select(
        "p", "vx", "vy",
        F.coalesce(F.lead("vx").over(w),
                   F.first("vx").over(w)).alias("nx"),
        F.coalesce(F.lead("vy").over(w),
                   F.first("vy").over(w)).alias("ny"),
    )
    cross = F.col("vx") * F.col("ny") - F.col("nx") * F.col("vy")
    elen = F.expr(
        "cast(floor(sqrt(cast((nx - vx) * (nx - vx)"
        " + (ny - vy) * (ny - vy) as double))"
        f" * {G.fnum(1000.0)} + {G.fnum(0.5)}) as bigint)"
    )
    agg = e.groupBy("p").agg(
        F.sum(cross).alias("a2"),
        F.sum(elen).alias("perim_q"),
    )
    pp = (
        f"{G.fnum(2.0 * math.pi)} * cast(abs(a2) as double)"
        f" * {G.fnum(1000000.0)}"
        " / (cast(perim_q as double) * cast(perim_q as double))"
    )
    return agg.select(
        F.col("p").alias(poly_id), "a2", "perim_q",
        F.when(F.col("perim_q") > 0, F.expr(pp)).alias("pp"),
    )


def spherical_polygon_area(
    verts: DataFrame,
    poly_id: str = "poly_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Signed spherical polygon area per polygon over a (poly_id,
    seq, lon, lat) vertex table — the GEODESIC complement of the
    planar shoelace in :func:`polygon_centroid`: at continental
    extents the planar formula distorts badly; this uses the
    Chamberlain & Duquette (2007) spherical excess form

        E = sum (lam2 - lam1) * (2 + sin(phi1) + sin(phi2))
        area = |E| * R^2 / 2       (R = 6371.0088 km)

    Longitude differences wrap to (-180, 180] so antimeridian-
    crossing edges contribute the short way. Trig-derived: each
    edge term QUANTIZES to integer nano-steradians BEFORE the sum
    (floating addition is order-dependent; integer accumulation is
    partitioning-invariant), and the area output rounds to 6
    decimals (km^2) on both sides.

    Scale: one per-polygon cyclic lead() window + ONE hash agg
    (polygon_centroid's plan shape).
    """
    import math

    from pdal_spark import sqlgen as G

    w = Window.partitionBy("p").orderBy("s")
    base = verts.select(
        F.col(poly_id).alias("p"), F.col(seq).alias("s"),
        F.col(lon).alias("x0"), F.col(lat).alias("y0"),
    )
    e = base.select(
        "p", "x0", "y0",
        F.coalesce(F.lead("x0").over(w),
                   F.first("x0").over(w)).alias("x1"),
        F.coalesce(F.lead("y0").over(w),
                   F.first("y0").over(w)).alias("y1"),
    )
    rad = G.fnum(math.pi / 180.0)
    # wrap dlon into (-180, 180]: dl - 360 * floor((dl + 180) / 360)
    dl = (
        f"((x1 - x0) - {G.fnum(360.0)}"
        f" * floor(((x1 - x0) + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
    )
    term = (
        f"({dl} * {rad})"
        f" * ({G.fnum(2.0)} + sin(y0 * {rad}) + sin(y1 * {rad}))"
    )
    r2h = G.fnum(6371.0088 * 6371.0088 / 2.0 / 1.0e9)
    agg = e.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_verts"),
        F.sum(F.expr(
            f"cast(floor({term} * {G.fnum(1.0e9)} + {G.fnum(0.5)})"
            " as bigint)"
        )).alias("exc_q"),
    )
    return agg.select(
        F.col("p").alias(poly_id), "n_verts", "exc_q",
        F.expr(
            f"round(abs(cast(exc_q as double)) * {r2h}, 6)"
        ).alias("area_km2"),
    )


def spherical_perimeter(
    verts: DataFrame,
    poly_id: str = "poly_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Geodesic polygon perimeter per polygon over a (poly_id, seq,
    lon, lat) vertex table — the length complement of
    :func:`spherical_polygon_area` (ring sanity checks, coastline-
    style length rollups, fence budgets): the sum of great-circle
    edge lengths, closing edge included.

    Each haversine edge length QUANTIZES to integer nanometre-scale
    units (floor(round(km, 9) * 1e9 + 0.5) — round(9) first absorbs
    JVM-vs-libm trig ulps, integer accumulation makes the per-
    polygon sum partitioning-invariant). Output: n_verts, perim_q
    (exact int64 micro-km units) and perim_km = perim_q / 1e9
    rounded to 6.

    Scale: one per-polygon cyclic lead() window + ONE hash agg
    (spherical_polygon_area's plan shape).
    """
    import math

    from pdal_spark import sqlgen as G

    w = Window.partitionBy("p").orderBy("s")
    base = verts.select(
        F.col(poly_id).alias("p"), F.col(seq).alias("s"),
        F.col(lon).alias("x0"), F.col(lat).alias("y0"),
    )
    e = base.select(
        "p", "x0", "y0",
        F.coalesce(F.lead("x0").over(w),
                   F.first("x0").over(w)).alias("x1"),
        F.coalesce(F.lead("y0").over(w),
                   F.first("y0").over(w)).alias("y1"),
    )
    rad = G.fnum(math.pi / 180.0)
    hav = (
        f"(sin((y1 - y0) * {rad} / 2) * sin((y1 - y0) * {rad} / 2)"
        f" + cos(y0 * {rad}) * cos(y1 * {rad})"
        f" * sin((x1 - x0) * {rad} / 2)"
        f" * sin((x1 - x0) * {rad} / 2))"
    )
    dkm = (
        f"({G.fnum(2.0 * 6371.0088)}"
        f" * asin(sqrt(greatest(least({hav}, {G.fnum(1.0)}),"
        f" {G.fnum(0.0)}))))"
    )
    agg = e.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_verts"),
        F.sum(F.expr(
            f"cast(floor(round({dkm}, 9) * {G.fnum(1.0e9)}"
            f" + {G.fnum(0.5)}) as bigint)"
        )).alias("perim_q"),
    )
    return agg.select(
        F.col("p").alias(poly_id),
        "n_verts",
        "perim_q",
        F.expr(
            f"round(cast(perim_q as double) / {G.fnum(1.0e9)}, 6)"
        ).alias("perim_km"),
    )


def ransac_line(
    pts: DataFrame,
    id_col: str = "pid",
    x: str = "mx",
    y: str = "my",
    n_cand: int = 16,
    tol: int = 10,
    buckets: int = 64,
) -> DataFrame:
    """Hash-deterministic RANSAC line fit (Fischler & Bolles 1981)
    — robust line extraction under heavy outliers, where planefit's
    least squares gets dragged: scanline recovery, road-axis
    extraction, linear-trend detection in scatter. Randomness is
    replaced by the repo's hash discipline, so the winning model is
    ENGINE-EXACT and partitioning-invariant:

    - anchors: the min-id point of each of ``buckets`` id-residue
      buckets (one tiny agg, no global row ordering);
    - candidate c pairs anchors mix_hash(2c) % buckets and
      mix_hash(2c+1) % buckets (degenerate/coincident pairs drop);
    - inlier test: |(y-y1)(x2-x1) - (x-x1)(y2-y1)|
      <= tol * max(|x2-x1|, |y2-y1|) — the cross-product residual
      against the L-inf-scaled tolerance, ALL exact int64 (a
      documented metric convention: residual/L_inf <= tol, not
      perpendicular distance — no sqrt);
    - winner: max inliers, ties to the smaller candidate id.

    Output: one row per VALID candidate (cand, x1, y1, x2, y2,
    n_inliers, best flag).

    Scale: anchors are one map-side agg; the scoring frame is
    |points| x n_cand with the candidate table broadcast — linear
    in the input for fixed n_cand. Bound: |cross| <= L_inf *
    (coord span); keep span * span under 2^62.
    """
    from pdal_spark import sqlgen as G

    p = pts.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    )
    nb = int(buckets)
    # min-id per bucket, then join back for coordinates (a SCALAR
    # pick key — min(struct) has no DuckDB twin, the arg_max trap)
    mins = p.groupBy((F.col("__id") % nb).alias("bk")).agg(
        F.min("__id").alias("mid")
    )
    anchors = mins.join(
        p.select(F.col("__id").alias("mid"),
                 F.col("px").alias("ax"),
                 F.col("py").alias("ay")),
        on="mid",
    ).select("bk", "ax", "ay")
    cands = None
    sess = pts.sparkSession
    cand_rows = sess.range(int(n_cand)).select(
        F.col("id").cast("long").alias("cand"),
        F.expr(f"({G.mix_hash('id * 2')}) % {nb}").alias("b1"),
        F.expr(f"({G.mix_hash('id * 2 + 1')}) % {nb}").alias("b2"),
    )
    cands = (
        cand_rows.join(
            F.broadcast(anchors.select(F.col("bk").alias("b1"),
                                       F.col("ax").alias("x1"),
                                       F.col("ay").alias("y1"))),
            on="b1",
        )
        .join(
            F.broadcast(anchors.select(F.col("bk").alias("b2"),
                                       F.col("ax").alias("x2"),
                                       F.col("ay").alias("y2"))),
            on="b2",
        )
        .where("NOT (x1 = x2 AND y1 = y2)")
        .select("cand", "x1", "y1", "x2", "y2")
    )
    resid = (
        "abs((py - y1) * (x2 - x1) - (px - x1) * (y2 - y1))"
    )
    span = "greatest(abs(x2 - x1), abs(y2 - y1))"
    scored = (
        p.crossJoin(F.broadcast(cands))
        .where(F.expr(f"{resid} <= {int(tol)} * {span}"))
        .groupBy("cand", "x1", "y1", "x2", "y2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inliers"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_inliers").desc(),
                       F.col("cand").asc())
    return scored.select(
        "cand", "x1", "y1", "x2", "y2", "n_inliers",
        (F.row_number().over(w) == 1).alias("best"),
    )
