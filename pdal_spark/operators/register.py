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
