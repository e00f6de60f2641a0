"""filters.icp — iterative closest point registration (2D rigid).

Reference: filters/IterativeClosestPoint.cpp aligns a moving cloud to
a fixed cloud by iterating {NN correspondence -> least-squares rigid
transform -> apply} until convergence, emitting the composed
transform as metadata. The distributed re-expression:

- correspondences = the engine's exact 1-NN join (super-cell kernel),
  so each iteration is one distributed pass;
- the rigid estimate is the closed-form 2D Kabsch/Umeyama solution
  from decimal-exact sufficient statistics (centroids + cross-
  covariance): theta = atan2(Sxy - Syx, Sxx + Syy); driver-side,
  O(1) data;
- the loop composes transforms and stops when the parameter update
  falls below tol (PDAL iterates to max_iters similarly).

Deterministic end-to-end: same input -> same correspondences (the
kNN tie-break) -> same statistics (decimal sums) -> same transform.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.knn import knn_join

_DEC = "decimal(38,12)"


def _rigid_from_pairs(pairs: DataFrame) -> tuple[float, float, float]:
    """pairs(mx, my, fx, fy) -> (theta, tx, ty) minimizing
    sum |R(theta)·m + t - f|^2 (closed-form 2D Kabsch)."""
    def dsum(col):
        return F.sum(col.cast(_DEC)).cast("double")

    r = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("mx")).alias("smx"), dsum(F.col("my")).alias("smy"),
        dsum(F.col("fx")).alias("sfx"), dsum(F.col("fy")).alias("sfy"),
        dsum(F.col("mx") * F.col("fx")).alias("sxx"),
        dsum(F.col("mx") * F.col("fy")).alias("sxy"),
        dsum(F.col("my") * F.col("fx")).alias("syx"),
        dsum(F.col("my") * F.col("fy")).alias("syy"),
    ).collect()[0]
    n = int(r["n"])
    mmx, mmy = r["smx"] / n, r["smy"] / n
    mfx, mfy = r["sfx"] / n, r["sfy"] / n
    # centered cross-covariance terms
    cxx = r["sxx"] / n - mmx * mfx
    cxy = r["sxy"] / n - mmx * mfy
    cyx = r["syx"] / n - mmy * mfx
    cyy = r["syy"] / n - mmy * mfy
    theta = math.atan2(cxy - cyx, cxx + cyy)
    ct, st = math.cos(theta), math.sin(theta)
    tx = mfx - (ct * mmx - st * mmy)
    ty = mfy - (st * mmx + ct * mmy)
    return theta, tx, ty


def icp(
    moving: DataFrame,
    fixed: DataFrame,
    x: str = "lon",
    y: str = "lat",
    id_moving: str = "pid",
    id_fixed: str = "pid",
    cell: float = 8.0,
    max_iters: int = 20,
    tol: float = 1e-9,
) -> tuple[DataFrame, dict]:
    """Align `moving` to `fixed`. Returns (transformed moving
    DataFrame with x/y replaced, metadata dict with the composed
    transform + per-iteration errors) — the reference's
    transform-as-metadata contract."""
    theta_c, tx_c, ty_c = 0.0, 0.0, 0.0
    cur = moving.select(
        F.col(id_moving).alias("mid"),
        F.col(x).alias("mx"), F.col(y).alias("my"),
    ).localCheckpoint(eager=True)
    # knn_join reads the same coordinate column names on both sides;
    # keep fx/fy as payload columns for the correspondence pairs
    fx = fixed.select(
        F.col(id_fixed).alias("fid"),
        F.col(x).alias("mx"), F.col(y).alias("my"),
        F.col(x).alias("fx"), F.col(y).alias("fy"),
    ).localCheckpoint(eager=True)
    errors = []
    for it in range(max_iters):
        nn = knn_join(
            cur, fx, k=1, cell=cell, x="mx", y="my",
            id_left="mid", id_right="fid",
            right_cols=["fx", "fy"], include_self=True,
        ).select(
            F.col("src_id").alias("mid"),
            F.col("dist"),
            F.col("nb_fx").alias("fx"), F.col("nb_fy").alias("fy"),
        )
        pairs = cur.join(nn, on="mid")
        err = pairs.agg(
            (
                F.sum((F.col("dist") * F.col("dist")).cast(_DEC))
                .cast("double") / F.count(F.lit(1))
            ).alias("mse")
        ).collect()[0]["mse"]
        errors.append(float(err))
        theta, tx, ty = _rigid_from_pairs(
            pairs.select("mx", "my", "fx", "fy")
        )
        # compose: new total = step ∘ current
        ct, st = math.cos(theta), math.sin(theta)
        tx_c, ty_c = (
            ct * tx_c - st * ty_c + tx,
            st * tx_c + ct * ty_c + ty,
        )
        theta_c += theta
        cur = cur.select(
            "mid",
            (F.col("mx") * ct - F.col("my") * st + tx).alias("mx"),
            (F.col("mx") * st + F.col("my") * ct + ty).alias("my"),
        ).localCheckpoint(eager=True)
        if abs(theta) < tol and abs(tx) < tol and abs(ty) < tol:
            break
    out = cur.select(
        F.col("mid").alias(id_moving),
        F.col("mx").alias(x), F.col("my").alias(y),
    )
    meta = {
        "theta": theta_c, "tx": tx_c, "ty": ty_c,
        "iterations": len(errors), "mse": errors,
    }
    return out, meta


def m3c2(
    cloud1: DataFrame,
    cloud2: DataFrame,
    normal_radius: float = 2.0,
    cyl_radius: float = 2.0,
    cyl_halflen: float = 5.0,
    reg_error: float = 0.0,
    min_points: int = 1,
    x: str = "lon",
    y: str = "lat",
    id1: str = "pid",
    id2: str = "pid",
    cell: float | None = None,
) -> DataFrame:
    """filters.m3c2 (M3C2Filter.cpp:207-306) — multiscale model-to-
    model cloud comparison, 2D analog. Cores are cloud1's own points
    (the reference's separate core view degenerates to this when
    cores == v1). Per core: the neighborhood normal (normal_radius,
    same closed-form eigenvector as operators.features, oriented
    "up" = positive y like math::orientUp), then both clouds'
    points inside the 2D cylinder (|perpendicular| <= cyl_radius,
    |along-normal| <= cyl_halflen; candidates pre-filtered by the
    enclosing ball like the reference's cylBallRadius box query),
    then per-cloud stats of the SIGNED along-normal offsets:
    distance = mean2 - mean1,
    uncertainty (LOD) = 1.96 * (sqrt(var1/n1 + var2/n2) + reg_error),
    significant = |distance| > LOD  (calcStats, :264-303; population
    variance via sum2/n - mean^2 exactly as the reference, clamped
    at 0 against float cancellation).

    Cores with fewer than min_points in either cloud are omitted
    (the reference leaves their dims unset). Distributed shape: one
    radius join per cloud + decimal aggregations; the self point is
    excluded from cloud1's cylinder like the reference's closeEnough
    skip.
    """
    from pdal_spark.operators.features import neighborhood_features
    from pdal_spark.operators.knn import radius_join

    feats = neighborhood_features(
        cloud1, normal_radius, x=x, y=y, id_col=id1
    )
    flip = (F.col("normal_y") < 0) | (
        (F.col("normal_y") == 0) & (F.col("normal_x") < 0)
    )
    cores = feats.select(
        F.col(id1).alias("cid"),
        F.col(x), F.col(y),
        F.when(flip, -F.col("normal_x"))
        .otherwise(F.col("normal_x")).alias("nvx"),
        F.when(flip, -F.col("normal_y"))
        .otherwise(F.col("normal_y")).alias("nvy"),
    ).localCheckpoint(eager=True)
    params = cores.select(
        F.col("cid").alias("src_id"),
        F.col(x).alias("corex"), F.col(y).alias("corey"),
        "nvx", "nvy",
    )
    ball = math.sqrt(
        cyl_radius * cyl_radius + cyl_halflen * cyl_halflen
    )
    dec = "decimal(38,18)"

    def cyl_stats(cloud: DataFrame, idr: str, exclude_self: bool):
        pr = radius_join(
            cores, cloud, ball, x=x, y=y, id_left="cid",
            id_right=idr, right_cols=[x, y], cell=cell,
        )
        if exclude_self:
            pr = pr.where(F.col("src_id") != F.col("nb_id"))
        pr = pr.join(params, on="src_id")
        t = (
            (F.col(f"nb_{x}") - F.col("corex")) * F.col("nvx")
            + (F.col(f"nb_{y}") - F.col("corey")) * F.col("nvy")
        )
        perp = (
            (F.col(f"nb_{y}") - F.col("corey")) * F.col("nvx")
            - (F.col(f"nb_{x}") - F.col("corex")) * F.col("nvy")
        )
        pr = pr.withColumn("t", t).where(
            (F.abs(perp) <= F.lit(float(cyl_radius)))
            & (F.abs(F.col("t")) <= F.lit(float(cyl_halflen)))
        )
        s = pr.groupBy("src_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("t").cast(dec)).cast("double").alias("s1"),
            F.sum((F.col("t") * F.col("t")).cast(dec))
            .cast("double").alias("s2"),
        ).where(F.col("n") >= int(min_points))
        nd = F.col("n").cast("double")
        mean = F.col("s1") / nd
        # round(12): sum2/n - mean^2 cancels to ~1e-13 noise when the
        # cylinder holds one point (or duplicates); quantizing the
        # variance kills the noise identically in both engines
        var = F.round(
            F.greatest(F.col("s2") / nd - mean * mean, F.lit(0.0)),
            12,
        )
        return s.select(
            "src_id", F.col("n"), mean.alias("mean"),
            var.alias("var"),
        )

    s1 = cyl_stats(cloud1, id1, exclude_self=True)
    s2 = cyl_stats(cloud2, id2, exclude_self=False)
    j = (
        s1.select(
            "src_id", F.col("n").alias("n1"),
            F.col("mean").alias("mean1"), F.col("var").alias("var1"),
        )
        .join(
            s2.select(
                "src_id", F.col("n").alias("n2"),
                F.col("mean").alias("mean2"),
                F.col("var").alias("var2"),
            ),
            on="src_id",
        )
    )
    dist = F.col("mean2") - F.col("mean1")
    lod = F.lit(1.96) * (
        F.sqrt(
            F.col("var1") / F.col("n1").cast("double")
            + F.col("var2") / F.col("n2").cast("double")
        )
        + F.lit(float(reg_error))
    )
    return j.select(
        F.col("src_id").alias(id1),
        dist.alias("m3c2_distance"),
        lod.alias("m3c2_uncertainty"),
        (F.abs(dist) > lod).cast("int").alias("m3c2_significant"),
        F.sqrt(F.col("var1")).alias("m3c2_std_dev1"),
        F.sqrt(F.col("var2")).alias("m3c2_std_dev2"),
        "n1", "n2",
    )


def icp_exact(
    moving: DataFrame,
    fixed: DataFrame,
    x: str = "lon",
    y: str = "lat",
    id_moving: str = "pid",
    id_fixed: str = "pid",
    cell: float = 8.0,
    iters: int = 3,
) -> DataFrame:
    """Oracle-exact ICP variant: a FIXED number of iterations, and
    the step rotation expressed directly as (cos, sin) = (A, B) /
    sqrt(A^2 + B^2) with A = Sxx + Syy, B = Sxy - Syx — the same 2D
    Kabsch optimum as `icp`'s atan2 form, but computed with
    +,-,*,/,sqrt only, so every coordinate of the result is
    bit-identical across engines (no trig, no tolerance branch).

    The sufficient statistics are computed on coordinates QUANTIZED
    to a 2^-17-degree grid (floor(x * 2^17 + 0.5), ~8e-6 deg). This
    makes every summand an integer-valued double below 2^53, so the
    decimal sums are exact in BOTH engines: Spark's double->decimal
    cast rounds the double's SHORTEST decimal representation
    (BigDecimal.valueOf) while DuckDB rounds the exact binary value
    — for arbitrary post-transform products the two disagree in the
    12th decimal, but integer-valued doubles convert exactly
    everywhere. The rotation is scale-invariant, so quantization
    only perturbs the step estimate by grid noise; the estimate is
    applied to the UNQUANTIZED coordinates. `icp` remains the
    production path (early stopping, mse trace)."""
    S = float(1 << 17)
    cur = moving.select(
        F.col(id_moving).alias("mid"),
        F.col(x).alias("mx"), F.col(y).alias("my"),
    ).localCheckpoint(eager=True)
    fx = fixed.select(
        F.col(id_fixed).alias("fid"),
        F.col(x).alias("mx"), F.col(y).alias("my"),
        F.col(x).alias("fx"), F.col(y).alias("fy"),
    ).localCheckpoint(eager=True)

    def dsum(col):
        return F.sum(col.cast(_DEC)).cast("double")

    for _ in range(iters):
        nn = knn_join(
            cur, fx, k=1, cell=cell, x="mx", y="my",
            id_left="mid", id_right="fid",
            right_cols=["fx", "fy"], include_self=True,
        ).select(
            F.col("src_id").alias("mid"),
            F.col("nb_fx").alias("fx"), F.col("nb_fy").alias("fy"),
        )
        pairs = cur.join(nn, on="mid").select(
            F.floor(F.col("mx") * S + 0.5).cast("double").alias("qmx"),
            F.floor(F.col("my") * S + 0.5).cast("double").alias("qmy"),
            F.floor(F.col("fx") * S + 0.5).cast("double").alias("qfx"),
            F.floor(F.col("fy") * S + 0.5).cast("double").alias("qfy"),
        )
        r = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("qmx")).alias("smx"), dsum(F.col("qmy")).alias("smy"),
            dsum(F.col("qfx")).alias("sfx"), dsum(F.col("qfy")).alias("sfy"),
            dsum(F.col("qmx") * F.col("qfx")).alias("sxx"),
            dsum(F.col("qmx") * F.col("qfy")).alias("sxy"),
            dsum(F.col("qmy") * F.col("qfx")).alias("syx"),
            dsum(F.col("qmy") * F.col("qfy")).alias("syy"),
        ).collect()[0]
        n = int(r["n"])
        # scaled-domain means and centered cross-covariance (the
        # rotation is invariant to the uniform 2^17 scaling)
        mmx, mmy = r["smx"] / n, r["smy"] / n
        mfx, mfy = r["sfx"] / n, r["sfy"] / n
        cxx = r["sxx"] / n - mmx * mfx
        cxy = r["sxy"] / n - mmx * mfy
        cyx = r["syx"] / n - mmy * mfx
        cyy = r["syy"] / n - mmy * mfy
        a = cxx + cyy
        b = cxy - cyx
        norm = math.sqrt(a * a + b * b)
        if norm == 0.0:
            ct, st = 1.0, 0.0
        else:
            ct, st = a / norm, b / norm
        # translation back in unscaled degrees
        tx = mfx / S - (ct * (mmx / S) - st * (mmy / S))
        ty = mfy / S - (st * (mmx / S) + ct * (mmy / S))
        cur = cur.select(
            "mid",
            (F.col("mx") * ct - F.col("my") * st + tx).alias("mx"),
            (F.col("mx") * st + F.col("my") * ct + ty).alias("my"),
        ).localCheckpoint(eager=True)
    return cur.select(
        F.col("mid").alias(id_moving),
        F.col("mx").alias(x), F.col("my").alias(y),
    )
