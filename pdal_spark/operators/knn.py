"""Neighborhood / kNN / radius joins (SURVEY.md §2.7).

The reference builds a nanoflann KD-tree per view
(pdal/KDIndex.hpp:55-124) and runs per-point neighbors()/radius()
queries. The distributed re-design is the classic cell-bucketed
spatial join:

- bucket both sides on a grid of ``cell`` (>= radius for radius
  joins), duplicate the RIGHT side into its 3x3 neighbor cells
  (explode — PDAL's buffered-tile trick from SplitterFilter applied
  to joins), equi-join on the cell key, post-filter on true distance.
  One shuffle per side, AQE-skew-splittable, no Python.
- kNN exactness across cell borders (SURVEY.md §7 risk): a point's
  kNN from the 3x3 block is provably complete iff its kth-neighbor
  distance <= its distance to the block border; points failing the
  bound are retried with a wider ring (driver loop over the usually
  tiny unsettled remainder).

Everything downstream (neighborclassifier, outlier, nndistance,
radialdensity, radiusassign, lof, zsmooth, reciprocity) is a
composition of these two joins with window/agg logic — all Catalyst.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import compile_ranges
from pdal_spark.sqlgen import SPARK


def _bucket(df: DataFrame, x: str, y: str, cell: float, prefix: str
            ) -> DataFrame:
    return df.withColumn(
        f"{prefix}cx", F.floor(F.col(x) / F.lit(float(cell))).cast("long")
    ).withColumn(
        f"{prefix}cy", F.floor(F.col(y) / F.lit(float(cell))).cast("long")
    )


_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _explode_ring(df: DataFrame, prefix: str, ring: int = 1) -> DataFrame:
    """Duplicate rows into all cells within Chebyshev distance `ring`.

    Two chained explode(sequence(..)) Generates, NOT a literal array
    of (2*ring+1)^2 structs: sequence codegen is a loop, so the
    generated method stays constant-size for any ring. The unrolled
    struct-array form overflowed the JVM's 64 KB method limit at
    ring>=4 and silently dropped the whole stage to interpreted mode.
    """
    seq = F.sequence(F.lit(-ring), F.lit(ring))
    return (
        df.withColumn("__dx", F.explode(seq))
        .withColumn("__dy", F.explode(seq))
        .withColumn("jx", F.col(f"{prefix}cx") + F.col("__dx"))
        .withColumn("jy", F.col(f"{prefix}cy") + F.col("__dy"))
        .drop("__dx", "__dy", f"{prefix}cx", f"{prefix}cy")
    )


def _prep_sides(
    left: DataFrame, right: DataFrame,
    x: str, y: str, id_left: str, id_right: str,
    cell: float, ring: int,
    right_cols: list[str] | None,
):
    lf = _bucket(
        left.select(F.col(id_left).alias("src_id"),
                    F.col(x).alias("lx"), F.col(y).alias("ly")),
        "lx", "ly", cell, "l",
    ).withColumnRenamed("lcx", "jx").withColumnRenamed("lcy", "jy")
    rsel = [F.col(id_right).alias("nb_id"),
            F.col(x).alias("rx"), F.col(y).alias("ry")]
    for c in right_cols or []:
        rsel.append(F.col(c).alias(f"nb_{c}"))
    rf = _bucket(right.select(*rsel), "rx", "ry", cell, "r")
    if ring > 1:
        # retry rounds touch few pending cells: prune right rows to
        # those within `ring` of a pending left cell BEFORE the
        # (2*ring+1)^2 explode — otherwise ring=4 re-explodes the
        # whole right side x81. The prune works at COARSE granularity
        # (super-cells of `ring` fine cells): pending cells explode
        # into only their 3x3 coarse neighborhood — a constant 9x
        # regardless of ring, never (2*ring+1)^2 rows per cell into
        # the broadcast.
        near = (
            lf.select(
                F.floor(F.col("jx") / ring).alias("gx"),
                F.floor(F.col("jy") / ring).alias("gy"),
            )
            .distinct()
            .withColumn("__dx", F.explode(F.sequence(
                F.lit(-1), F.lit(1))))
            .withColumn("__dy", F.explode(F.sequence(
                F.lit(-1), F.lit(1))))
            .select((F.col("gx") + F.col("__dx")).alias("gx"),
                    (F.col("gy") + F.col("__dy")).alias("gy"))
            .distinct()
        )
        rf = rf.withColumn(
            "__gx", F.floor(F.col("rcx") / ring)
        ).withColumn("__gy", F.floor(F.col("rcy") / ring))
        rf = rf.join(
            F.broadcast(near),
            on=(F.col("__gx") == F.col("gx"))
            & (F.col("__gy") == F.col("gy")),
            how="left_semi",
        ).drop("__gx", "__gy")
    rf = _explode_ring(rf, "r", ring)
    return lf, rf


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_left: str = "pid",
    id_right: str = "pid",
    right_cols: list[str] | None = None,
    cell: float | None = None,
    include_self: bool = True,
) -> DataFrame:
    """All pairs (src_id, nb_id, dist) with planar dist <= radius.

    cell defaults to radius so one neighbor ring is provably
    sufficient (KDIndex radius() parity). Pure Catalyst: two narrow
    shuffles + codegen'd distance filter.
    """
    cell = float(cell or radius)
    ring = max(1, int(-(-radius // cell)))
    lf, rf = _prep_sides(
        left, right, x, y, id_left, id_right, cell, ring, right_cols
    )
    j = lf.join(rf, on=["jx", "jy"])
    # explicit multiplies (not pow) — bit-identical to the SQL oracle
    d2 = (j["lx"] - j["rx"]) * (j["lx"] - j["rx"]) + (
        j["ly"] - j["ry"]
    ) * (j["ly"] - j["ry"])
    out = j.withColumn("dist", F.sqrt(d2)).where(
        F.col("dist") <= float(radius)
    )
    if not include_self:
        out = out.where(F.col("src_id") != F.col("nb_id"))
    return out.drop("jx", "jy", "lx", "ly", "rx", "ry")


def _exact_topk(d2, rid, k):
    """Row-wise exact top-k by (d2 asc, rid asc) over a padded
    candidate matrix (inf = absent). argpartition alone is NOT
    tie-stable at the k-th boundary — when several candidates share
    the k-th distance it may keep the wrong ids; rows with boundary
    ties are repaired with a full lexsort (rare: exact-equal
    distances on lattice-like data). Returns (idx, d2_sorted,
    rid_sorted) where idx indexes the original candidate axis."""
    import numpy as np

    kk = min(k, d2.shape[1])
    if kk < d2.shape[1]:
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
    else:
        part = np.broadcast_to(
            np.arange(kk), (d2.shape[0], kk)
        ).copy()
    d2p = np.take_along_axis(d2, part, axis=1)
    ridp = np.take_along_axis(rid, part, axis=1)
    order = np.lexsort((ridp, d2p), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    d2s = np.take_along_axis(d2p, order, axis=1)
    rids = np.take_along_axis(ridp, order, axis=1)
    if kk < d2.shape[1]:
        kth = d2s[:, kk - 1]
        finite = np.isfinite(kth)
        total_le = (d2 <= np.where(finite, kth, -np.inf)[:, None]).sum(
            axis=1
        )
        for r in np.nonzero(finite & (total_le > kk))[0]:
            full = np.lexsort((rid[r], d2[r]))[:kk]
            idx[r] = full
            d2s[r] = d2[r][full]
            rids[r] = rid[r][full]
    return idx, d2s, rids


def _knn_kernel(k: int, cell: float, ring: int, include_self: bool,
                nb_cols: list[str], chunk: int = 512):
    """Per-cell brute-force top-k kernel (cogroup applyInPandas).

    The reference queries a nanoflann KD-tree per view
    (pdal/private/KDImpl.hpp:37-100); at Spark scale the equivalent is
    a vectorized numpy distance block per grid cell — candidates never
    leave the kernel, so the shuffle carries O(rows), not O(pairs).
    Emits top-k with deterministic (dist, nb_id) tie-break plus a
    `settled` flag: kth distance within the distance to the candidate
    block's border (the exactness bound; SURVEY.md §7)."""
    import numpy as np
    import pandas as pd

    blk = float(cell)

    def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["src_id", "nb_id", "dist", "nn_rank", "settled",
                *[f"nb_{c}" for c in nb_cols]]
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({c: [] for c in cols})
        jx, jy = key
        qx = lpdf["lx"].to_numpy(np.float64)
        qy = lpdf["ly"].to_numpy(np.float64)
        qid = lpdf["src_id"].to_numpy()
        rx = rpdf["rx"].to_numpy(np.float64)
        ry = rpdf["ry"].to_numpy(np.float64)
        rid = rpdf["nb_id"].to_numpy()
        # distance from each query to the border of the candidate
        # block [(jx-ring)*cell, (jx+ring+1)*cell) x [same for y)
        bound = np.minimum.reduce([
            qx - (jx - ring) * blk, (jx + ring + 1) * blk - qx,
            qy - (jy - ring) * blk, (jy + ring + 1) * blk - qy,
        ])
        outs = []
        for s in range(0, len(qx), chunk):
            e = min(s + chunk, len(qx))
            # in-place (rx-qx)^2 + (ry-qy)^2 — bit-identical, 2
            # temporaries instead of 3 (the grid kernel's note)
            d2 = np.broadcast_to(rx[None, :],
                                 (e - s, len(rx))).copy()
            d2 -= qx[s:e, None]
            d2 *= d2
            _t = np.broadcast_to(ry[None, :],
                                 (e - s, len(ry))).copy()
            _t -= qy[s:e, None]
            _t *= _t
            d2 += _t
            if not include_self:
                d2[qid[s:e, None] == rid[None, :]] = np.inf
            kk = min(k, d2.shape[1])
            idx, d2s, rids = _exact_topk(
                d2, np.broadcast_to(rid, d2.shape), k
            )
            valid = np.isfinite(d2s)
            n_valid = valid.sum(axis=1)
            dist = np.sqrt(d2s)
            kth = np.where(
                n_valid >= k, dist[:, min(k, kk) - 1], np.inf
            )
            settled = (n_valid >= k) & (kth <= bound[s:e])
            rows, ranks = np.nonzero(valid)
            out = {
                "src_id": qid[s:e][rows],
                "nb_id": rids[rows, ranks],
                "dist": dist[rows, ranks],
                "nn_rank": (
                    valid.cumsum(axis=1)[rows, ranks]
                ).astype(np.int32),
                "settled": settled[rows],
            }
            for c in nb_cols:
                rc = rpdf[f"nb_{c}"].to_numpy()
                out[f"nb_{c}"] = rc[idx][rows, ranks]
            outs.append(pd.DataFrame(out))
        return pd.concat(outs, ignore_index=True)

    return fn


def _grid_knn_kernel(k: int, cell: float, S: int, include_self: bool,
                     nb_cols: list[str], chunk: int = 1024):
    """Super-cell grid-hash kNN kernel: one cogroup group = an SxS
    block of cells plus a 1-cell halo of candidates. Right rows are
    bucket-sorted by cell once (np.argsort + searchsorted offsets);
    each occupied left cell then reads its 3x3 candidate slice. Same
    math/tie-break as _knn_kernel but per-group Python overhead is
    amortized over S^2 cells and the halo explode factor is
    ~(1+2/S)^2 instead of 9x."""
    import numpy as np
    import pandas as pd

    blk = float(cell)
    W = S + 2

    def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["src_id", "nb_id", "dist", "nn_rank", "settled",
                *[f"nb_{c}" for c in nb_cols]]
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({c: [] for c in cols})
        scx, scy = key
        cx0, cy0 = scx * S - 1, scy * S - 1  # halo-inclusive origin
        qx = lpdf["lx"].to_numpy(np.float64)
        qy = lpdf["ly"].to_numpy(np.float64)
        qid = lpdf["src_id"].to_numpy()
        rx = rpdf["rx"].to_numpy(np.float64)
        ry = rpdf["ry"].to_numpy(np.float64)
        rid = rpdf["nb_id"].to_numpy()

        # bucket-sort right rows by cell; starts[] gives O(1) slices
        rkey = (
            (np.floor(rx / blk).astype(np.int64) - cx0) * W
            + (np.floor(ry / blk).astype(np.int64) - cy0)
        )
        rorder = np.argsort(rkey, kind="stable")
        rxs, rys, rids_s = rx[rorder], ry[rorder], rid[rorder]
        rextra_s = {c: rpdf[f"nb_{c}"].to_numpy()[rorder] for c in nb_cols}
        starts = np.searchsorted(rkey[rorder], np.arange(W * W + 1))

        lcx = np.floor(qx / blk).astype(np.int64)
        lcy = np.floor(qy / blk).astype(np.int64)
        lkey = (lcx - cx0) * W + (lcy - cy0)
        ukeys = np.unique(lkey)
        nrow = len(ukeys)
        qrow = np.searchsorted(ukeys, lkey)
        ux, uy = ukeys // W, ukeys % W

        # padded per-cell candidate matrix over the 3x3 block: one
        # ragged fill per offset (9 vectorized passes, no cell loop)
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        b0s, lens = [], []
        for dx, dy in offs:
            bx, by = ux + dx, uy + dy
            ok = (bx >= 0) & (bx < W) & (by >= 0) & (by < W)
            b = np.where(ok, bx * W + by, 0)
            ln = np.where(ok, starts[b + 1] - starts[b], 0)
            b0s.append(np.where(ok, starts[b], 0))
            lens.append(ln)
        tot = np.sum(lens, axis=0)
        M = int(tot.max()) if nrow else 0
        if M == 0:
            return pd.DataFrame({c: [] for c in cols})
        pad = np.full((nrow, M), -1, dtype=np.int64)
        colpos = np.zeros(nrow, dtype=np.int64)
        for b0, ln in zip(b0s, lens):
            n = int(ln.sum())
            if n == 0:
                continue
            rows_f = np.repeat(np.arange(nrow), ln)
            within = np.arange(n) - np.repeat(ln.cumsum() - ln, ln)
            pad[rows_f, np.repeat(colpos, ln) + within] = (
                np.repeat(b0, ln) + within
            )
            colpos += ln
        qgx, qgy = lcx, lcy
        bound = np.minimum.reduce([
            qx - (qgx - 1) * blk, (qgx + 2) * blk - qx,
            qy - (qgy - 1) * blk, (qgy + 2) * blk - qy,
        ])

        outs = []
        for cs in range(0, len(qx), chunk):
            ce = min(cs + chunk, len(qx))
            cand = pad[qrow[cs:ce]]                     # (m, M)
            valid_c = cand >= 0
            ci = np.where(valid_c, cand, 0)
            # in-place (rx-qx)^2 + (ry-qy)^2: bit-identical to
            # (qx-rx)^2 + ... (IEEE negation is exact) with 2 m*M
            # temporaries instead of 5 — the kernel is DRAM-bound,
            # so this is a measured ~5x on the distance block
            d2 = rxs[ci]
            d2 -= qx[cs:ce, None]
            d2 *= d2
            _t = rys[ci]
            _t -= qy[cs:ce, None]
            _t *= _t
            d2 += _t
            d2[~valid_c] = np.inf
            crid = rids_s[ci]
            if not include_self:
                d2[(qid[cs:ce, None] == crid) & valid_c] = np.inf
            kk = min(k, d2.shape[1])
            idx, d2s, ridss = _exact_topk(d2, crid, k)
            valid = np.isfinite(d2s)
            n_valid = valid.sum(axis=1)
            dist = np.sqrt(d2s)
            kth = np.where(n_valid >= k, dist[:, kk - 1], np.inf)
            settled = (n_valid >= k) & (kth <= bound[cs:ce])
            rows, ranks = np.nonzero(valid)
            out = {
                "src_id": qid[cs:ce][rows],
                "nb_id": ridss[rows, ranks],
                "dist": dist[rows, ranks],
                "nn_rank": (
                    valid.cumsum(axis=1)[rows, ranks]
                ).astype(np.int32),
                "settled": settled[rows],
            }
            for c in nb_cols:
                rc = rextra_s[c][ci]
                out[f"nb_{c}"] = np.take_along_axis(
                    rc, idx, axis=1
                )[rows, ranks]
            outs.append(pd.DataFrame(out))
        if not outs:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(outs, ignore_index=True)

    return fn


def _prep_supercell(
    left: DataFrame, right: DataFrame,
    x: str, y: str, id_left: str, id_right: str,
    cell: float, S: int,
    right_cols: list[str] | None,
):
    """First-round sides for the super-cell kernel: left keyed by its
    super-cell; right duplicated into neighbor super-cells only when
    its cell touches the 1-cell halo (<= 4 memberships, typically 1)."""
    lf = left.select(
        F.col(id_left).alias("src_id"),
        F.col(x).alias("lx"), F.col(y).alias("ly"),
    )
    lf = lf.withColumn(
        "jx", F.floor(F.floor(F.col("lx") / F.lit(float(cell))) / F.lit(S))
        .cast("long")
    ).withColumn(
        "jy", F.floor(F.floor(F.col("ly") / F.lit(float(cell))) / F.lit(S))
        .cast("long")
    )
    rsel = [F.col(id_right).alias("nb_id"),
            F.col(x).alias("rx"), F.col(y).alias("ry")]
    for c in right_cols or []:
        rsel.append(F.col(c).alias(f"nb_{c}"))
    rf = right.select(*rsel)
    rcx = F.floor(F.col("rx") / F.lit(float(cell))).cast("long")
    rcy = F.floor(F.col("ry") / F.lit(float(cell))).cast("long")
    rf = (
        rf.withColumn("__cx", rcx).withColumn("__cy", rcy)
        .withColumn("__sx", F.floor(F.col("__cx") / F.lit(S)).cast("long"))
        .withColumn("__sy", F.floor(F.col("__cy") / F.lit(S)).cast("long"))
    )
    # membership shifts: on the low edge of its super-cell -> also
    # needed by the neighbor below; high edge -> neighbor above.
    # pmod, NOT %: Spark % is sign-of-dividend remainder, which would
    # silently skip halo duplication for negative cell coordinates.
    ex = F.when(F.pmod(F.col("__cx"), F.lit(S)) == 0, -1).when(
        F.pmod(F.col("__cx"), F.lit(S)) == S - 1, 1
    ).otherwise(0)
    ey = F.when(F.pmod(F.col("__cy"), F.lit(S)) == 0, -1).when(
        F.pmod(F.col("__cy"), F.lit(S)) == S - 1, 1
    ).otherwise(0)
    rf = rf.withColumn("__ex", ex).withColumn("__ey", ey)
    members = F.array(
        F.struct(F.col("__sx").alias("jx"), F.col("__sy").alias("jy")),
        F.when(F.col("__ex") != 0, F.struct(
            (F.col("__sx") + F.col("__ex")).alias("jx"),
            F.col("__sy").alias("jy"))),
        F.when(F.col("__ey") != 0, F.struct(
            F.col("__sx").alias("jx"),
            (F.col("__sy") + F.col("__ey")).alias("jy"))),
        F.when((F.col("__ex") != 0) & (F.col("__ey") != 0), F.struct(
            (F.col("__sx") + F.col("__ex")).alias("jx"),
            (F.col("__sy") + F.col("__ey")).alias("jy"))),
    )
    rf = (
        rf.withColumn("__m", F.explode(members))
        .where(F.col("__m").isNotNull())
        .withColumn("jx", F.col("__m.jx"))
        .withColumn("jy", F.col("__m.jy"))
        .drop("__m", "__cx", "__cy", "__sx", "__sy", "__ex", "__ey")
    )
    return lf, rf


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    cell: float,
    x: str = "lon",
    y: str = "lat",
    id_left: str = "pid",
    id_right: str = "pid",
    right_cols: list[str] | None = None,
    include_self: bool = True,
    max_ring: int = 64,
    supercell: int = 16,
) -> DataFrame:
    """Exact k nearest neighbors of every left row among right rows.

    Output: (src_id, nb_id, dist, nn_rank) with deterministic
    tie-break (dist, nb_id). Candidate blocks are evaluated INSIDE a
    cogrouped pandas kernel (top-k only leaves the executor — the
    pair blow-up of a join+window formulation would be O(9·cellpop)
    rows per point). Iterative ring expansion: points whose kth
    distance exceeds the guaranteed-complete border bound re-run with
    a wider ring; each round touches only the unsettled remainder.
    """
    from pyspark.sql import types as T

    nb_cols = right_cols or []
    rounds = []
    pending = left
    ring = 1
    first = True
    while True:
        if first:
            lf, rf = _prep_supercell(
                pending, right, x, y, id_left, id_right, cell,
                supercell, nb_cols,
            )
            kernel = _grid_knn_kernel(
                k, cell, supercell, include_self, nb_cols
            )
        else:
            lf, rf = _prep_sides(
                pending, right, x, y, id_left, id_right, cell, ring,
                nb_cols,
            )
            kernel = _knn_kernel(k, cell, ring, include_self, nb_cols)
        schema = T.StructType([
            T.StructField("src_id", lf.schema["src_id"].dataType),
            T.StructField("nb_id", rf.schema["nb_id"].dataType),
            T.StructField("dist", T.DoubleType()),
            T.StructField("nn_rank", T.IntegerType()),
            T.StructField("settled", T.BooleanType()),
            *[T.StructField(f"nb_{c}", rf.schema[f"nb_{c}"].dataType)
              for c in nb_cols],
        ])
        first = False
        topk = (
            lf.groupBy("jx", "jy")
            .cogroup(rf.groupBy("jx", "jy"))
            .applyInPandas(kernel, schema)
            .localCheckpoint(eager=True)
        )
        if ring >= max_ring:
            # forced exit: whatever is still unsettled ships as-is —
            # kth may exceed the completeness bound, and points with
            # ZERO candidates within max_ring cells vanish. Surface
            # it loudly instead of silently degrading "exact".
            import warnings

            n_unsettled = (
                topk.where(~F.col("settled") & (F.col("nn_rank") == 1))
                .count()
            )
            n_missing = pending.join(
                topk.select("src_id").distinct()
                .withColumnRenamed("src_id", id_left),
                on=id_left, how="left_anti",
            ).count()
            if n_unsettled or n_missing:
                warnings.warn(
                    f"knn_join: max_ring={max_ring} reached with "
                    f"{n_unsettled} unsettled and {n_missing} "
                    f"zero-candidate points; results for these are "
                    f"not exact — raise max_ring or cell",
                    stacklevel=2,
                )
            rounds.append(topk.drop("settled"))
            break
        # settled points emit final rows now; everything else —
        # including points with ZERO candidates in this ring (absent
        # from topk entirely) — stays pending.
        settled_ids = (
            topk.where(F.col("settled") & (F.col("nn_rank") == 1))
            .select("src_id")
            .localCheckpoint(eager=True)
        )
        rounds.append(
            topk.where(F.col("settled")).drop("settled")
        )
        pending = pending.join(
            settled_ids.withColumnRenamed("src_id", id_left),
            on=id_left,
            how="left_anti",
        ).localCheckpoint(eager=True)
        if pending.count() == 0:
            break
        ring *= 4
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Derived operators
# ---------------------------------------------------------------------------


def nn_distance(
    df: DataFrame, k: int, mode: str = "avg",
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.nndistance (NNDistanceFilter.cpp): per-point kth or
    average distance to its k nearest (self excluded)."""
    nn = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    )
    agg = (
        F.max("dist") if mode == "kth" else F.avg("dist")
    ).alias("nn_distance")
    per = nn.groupBy("src_id").agg(agg).withColumnRenamed("src_id", id_col)
    return df.join(per, on=id_col, how="left")


def neighbor_classifier(
    df: DataFrame,
    k: int,
    dimension: str = "classification",
    candidate: DataFrame | None = None,
    domain: list[str] | None = None,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    cell: float = 1.0,
    candidate_id: str | None = None,
) -> DataFrame:
    """filters.neighborclassifier (NeighborClassifierFilter.cpp:114-139):
    kNN majority vote on an int dimension; reassign iff winner count
    strictly > k/2 AND differs from current; ties -> smallest class
    (std::map iteration order); votes read ORIGINAL classes (deferred
    update, :160-200); self included when voting against self
    (KD3Index::neighbors returns the query point)."""
    cand = candidate if candidate is not None else df
    # include_self ALWAYS: in self-mode the reference's KD query
    # returns the query point itself; in candidate mode the datasets
    # are distinct, so id-equality exclusion would wrongly drop
    # candidates whose id happens to collide numerically.
    nn = knn_join(
        df, cand, k, cell, x=x, y=y,
        id_left=id_col,
        id_right=candidate_id or id_col,
        right_cols=[dimension], include_self=True,
    )
    votes = nn.groupBy("src_id", f"nb_{dimension}").agg(
        F.count(F.lit(1)).alias("votes")
    )
    tot = nn.groupBy("src_id").agg(F.count(F.lit(1)).alias("n_votes"))
    w = Window.partitionBy("src_id").orderBy(
        F.col("votes").desc(), F.col(f"nb_{dimension}").asc()
    )
    winner = (
        votes.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .join(tot, on="src_id")
        .where(F.col("votes") * 2 > F.col("n_votes"))
        .select(
            F.col("src_id").alias(id_col),
            F.col(f"nb_{dimension}").alias("__newclass"),
        )
    )
    # winner is one row per reassigned point — small; AQE broadcasts.
    out = df.join(winner, on=id_col, how="left")
    new_val = F.when(
        F.col("__newclass").isNotNull()
        & (F.col("__newclass") != F.col(dimension)),
        F.col("__newclass"),
    ).otherwise(F.col(dimension))
    if domain:
        in_domain = F.expr(compile_ranges(domain, SPARK))
        new_val = F.when(in_domain, new_val).otherwise(F.col(dimension))
    return out.withColumn(dimension, new_val).drop("__newclass")


def radial_density(
    df: DataFrame, radius: float,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
) -> DataFrame:
    """filters.radialdensity (RadialDensityFilter.cpp): neighbor count
    within radius / sphere volume (2D here: circle area)."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col
    )
    area = 3.141592653589793 * radius * radius
    cnt = pairs.groupBy("src_id").agg(
        (F.count(F.lit(1)) / F.lit(area)).alias("radial_density")
    )
    return df.join(
        cnt.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )


def outlier_radius(
    df: DataFrame, radius: float, min_k: int,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    noise_class: int = 7, cls: str = "classification",
) -> DataFrame:
    """filters.outlier method=radius (OutlierFilter.cpp): flag points
    with fewer than min_k neighbors (self excluded) within radius."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    )
    cnt = pairs.groupBy("src_id").agg(F.count(F.lit(1)).alias("__nb"))
    out = df.join(
        cnt.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )
    return out.withColumn(
        cls,
        F.when(
            F.coalesce(F.col("__nb"), F.lit(0)) < min_k, noise_class
        ).otherwise(F.col(cls)),
    ).drop("__nb")


def outlier_statistical(
    df: DataFrame, mean_k: int, multiplier: float,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0, noise_class: int = 7,
    cls: str = "classification",
) -> DataFrame:
    """filters.outlier method=statistical: per-point mean distance to
    mean_k NN; flag points whose mean distance > global mean +
    multiplier * stddev. Two-phase global agg, broadcast threshold."""
    nn = knn_join(
        df, df, mean_k, cell, x=x, y=y,
        id_left=id_col, id_right=id_col, include_self=False,
    )
    # decimal-routed sums end-to-end: float avg/stddev are partial-
    # agg-order dependent; the explicit sqrt((s2 - s*s/n)/(n-1)) form
    # is what the DuckDB oracle mirrors bit-for-bit
    dec = "decimal(38,15)"
    per = nn.groupBy("src_id").agg(
        (
            F.sum(F.col("dist").cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("__md")
    )
    g = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__md").cast(dec)).cast("double").alias("s1"),
        F.sum((F.col("__md") * F.col("__md")).cast(dec))
        .cast("double").alias("s2"),
    ).collect()[0]
    n = int(g["n"])
    if n < 2:  # degenerate: no distribution to flag against
        return df.withColumn(cls, F.col(cls))
    s1, s2 = float(g["s1"]), float(g["s2"])
    mean = s1 / n
    # clamp: float rounding can push zero variance slightly negative,
    # and a complex-number threshold would poison the comparison
    std = (max(0.0, (s2 - s1 * s1 / n)) / (n - 1)) ** 0.5
    thresh = mean + multiplier * std
    out = df.join(
        per.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )
    return out.withColumn(
        cls,
        F.when(F.col("__md") > thresh, noise_class).otherwise(F.col(cls)),
    ).drop("__md")


def cloud_compare(
    left: DataFrame, right: DataFrame,
    x: str = "lon", y: str = "lat",
    id_left: str = "pid", id_right: str = "pid",
    cell: float = 8.0,
) -> DataFrame:
    """kernels.chamfer / kernels.hausdorff (ChamferKernel.cpp,
    HausdorffKernel.cpp): symmetric cloud-to-cloud distance summary
    over two 1-NN joins. One row: chamfer = mean NN distance in each
    direction averaged; hausdorff = max over both directions' min
    distances. Sums decimal-routed (agg-order independent)."""
    dec = "decimal(38,15)"

    def _nn1(a, b, ida, idb):
        nn = knn_join(
            a, b, 1, cell, x=x, y=y, id_left=ida, id_right=idb,
            include_self=True,
        )
        return nn.agg(
            (
                F.sum(F.col("dist").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_d"),
            F.max("dist").alias("max_d"),
        )

    ab = _nn1(left, right, id_left, id_right).select(
        F.col("mean_d").alias("mean_ab"), F.col("max_d").alias("max_ab")
    )
    ba = _nn1(right, left, id_right, id_left).select(
        F.col("mean_d").alias("mean_ba"), F.col("max_d").alias("max_ba")
    )
    out = ab.crossJoin(ba)
    return out.select(
        ((F.col("mean_ab") + F.col("mean_ba")) / F.lit(2.0)).alias(
            "chamfer"
        ),
        F.greatest(F.col("max_ab"), F.col("max_ba")).alias("hausdorff"),
        "mean_ab", "mean_ba", "max_ab", "max_ba",
    )


def lof(
    df: DataFrame, minpts: int,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.lof (LOFFilter.cpp): classic Local Outlier Factor.
    Adds NNDistance (k-distance), LocalReachabilityDistance and
    LocalOutlierFactor, exactly the three dims the reference creates.

    Three joins over ONE kNN result: kdist per point; reach_dist =
    max(kdist(o), d(p,o)) averaged -> lrd; lof = mean(lrd(o))/lrd(p).
    Sums are decimal-routed (exact + agg-order independent)."""
    dec = "decimal(38,15)"
    nn = knn_join(
        df, df, minpts, cell, x=x, y=y,
        id_left=id_col, id_right=id_col, include_self=False,
    ).select("src_id", "nb_id", "dist")
    kdist = nn.groupBy("src_id").agg(F.max("dist").alias("kdist"))
    reach = nn.join(
        kdist.select(
            F.col("src_id").alias("nb_id"),
            F.col("kdist").alias("kdist_nb"),
        ),
        on="nb_id",
    ).withColumn("reach", F.greatest(F.col("kdist_nb"), F.col("dist")))
    lrd = reach.groupBy("src_id").agg(
        (
            F.count(F.lit(1))
            / F.sum(F.col("reach").cast(dec)).cast("double")
        ).alias("lrd")
    )
    lof_df = (
        nn.join(
            lrd.select(
                F.col("src_id").alias("nb_id"),
                F.col("lrd").alias("lrd_nb"),
            ),
            on="nb_id",
        )
        .groupBy("src_id")
        .agg(
            (
                F.sum(F.col("lrd_nb").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_lrd_nb")
        )
        .join(lrd, on="src_id")
        .join(kdist, on="src_id")
        .select(
            F.col("src_id").alias(id_col),
            F.col("kdist").alias("nn_distance"),
            F.col("lrd").alias("local_reachability_distance"),
            (F.col("avg_lrd_nb") / F.col("lrd")).alias(
                "local_outlier_factor"
            ),
        )
    )
    return df.join(lof_df, on=id_col, how="left")


def zsmooth(
    df: DataFrame, radius: float, dim: str = "z",
    percentile: float = 0.5, out: str = "z_smooth",
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    exact: bool = True,
) -> DataFrame:
    """filters.zsmooth (ZsmoothFilter.cpp): new dim = percentile of
    neighbors' `dim` within 2D radius. exact=False switches to
    percentile_approx for very hot neighborhoods at scale."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[dim],
    )
    agg = (
        F.percentile(f"nb_{dim}", F.lit(percentile)) if exact
        else F.percentile_approx(f"nb_{dim}", percentile, 10000)
    )
    sm = pairs.groupBy("src_id").agg(agg.alias(out))
    return df.join(
        sm.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )


def reciprocity(
    df: DataFrame, k: int,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.reciprocity (ReciprocityFilter.cpp): % of a point's k
    NN that do NOT list the point among their own k NN (two-hop)."""
    nn = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    ).select("src_id", "nb_id")
    rev = nn.select(
        F.col("nb_id").alias("src_id"), F.col("src_id").alias("nb_id")
    ).withColumn("__mutual", F.lit(1))
    j = nn.join(rev, on=["src_id", "nb_id"], how="left")
    rec = j.groupBy("src_id").agg(
        (
            100.0
            * F.sum(F.when(F.col("__mutual").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("reciprocity")
    )
    return df.join(
        rec.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )


GEO_M_PER_DEG = 111194.92664455873  # EARTH_R * pi / 180


def radius_join_geodesic(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    x: str = "lon",
    y: str = "lat",
    id_left: str = "pid",
    id_right: str = "pid",
    include_self: bool = True,
    max_w: int | None = None,
) -> DataFrame:
    """Geodesic radius query: all pairs with HAVERSINE distance <=
    radius_m — the correct "within R meters" join on a sphere, where
    the planar radius_join is wrong at high latitudes (a degree of
    longitude shrinks by cos(lat)).

    Bucketing: square degree cells of cell = radius_m / 111195 (one
    lat ring always suffices: |dlat| <= cell for any pair in range).
    The RIGHT side widens its longitude ring per row by
    W rings from the exact spherical bound dlam <= 2 asin(
    sin(R/2Re)/cos(band_abs + cell)) — conservative (exactness comes
    from the final quantized-haversine filter), capped at the
    half-world wrap. Only high-latitude rows pay wide rings; below
    60 deg W is 2-3. Longitude wraps modulo the cell count. By
    default (max_w=None) the only cap is the half-world wrap, which
    keeps the join EXACT but lets a near-polar row with a small
    radius fan out to up to ~nx ring copies; pass an integer max_w to
    hard-cap the fan-out per row, at a documented recall loss for
    rows whose exact ring need exceeds the cap (only possible above
    ~89 deg latitude for metre-scale radii).

    Output (src_id, nb_id, dist_mm): the integer-mm quantized
    distance (hash-exact; the raw haversine is trig => INEXACT).

    Scale: like radius_join — two narrow shuffles on the cell key;
    fan-out is 3 x (2W+1) copies of the right side, W = 1 below
    60 deg latitude. AQE skew split applies to hot city cells.
    """
    cell = float(radius_m) / GEO_M_PER_DEG
    nx = int(math.ceil(360.0 / cell))
    from pdal_spark import sqlgen as G

    def jx(col: str) -> str:
        return f"cast(floor((`{col}` + 180.0e0) / {G.fnum(cell)}) as bigint)"

    def jy(col: str) -> str:
        return f"cast(floor((`{col}` + 90.0e0) / {G.fnum(cell)}) as bigint)"

    lf = left.select(
        F.col(id_left).alias("src_id"),
        F.col(x).alias("lx"), F.col(y).alias("ly"),
        F.expr(f"pmod({jx(x)}, {nx})").alias("jx"),
        F.expr(jy(y)).alias("jy"),
    )
    band_lo = f"(cast({jy(y)} as double) * {G.fnum(cell)} - 90.0e0)"
    band_abs = (
        f"greatest(abs({band_lo}), abs({band_lo} + {G.fnum(cell)}))"
    )
    # Exact spherical bound on the longitude span of an R-ball whose
    # right endpoint sits in this band: from the haversine identity,
    # dlam <= 2*asin(sin(R/2Re) / sqrt(cos(p1) cos(p2))); both
    # latitudes are within band +- cell, so cos_ext = cos at the
    # farthest reachable latitude lower-bounds the product's root.
    # +1 ring absorbs the floor-boundary offset. A naive 1/cos(band)
    # widening UNDERCOUNTS (it ignores the partner's higher latitude
    # and the asin inflation) — it measurably dropped pairs.
    sin_half = math.sin(float(radius_m) / (2.0 * 6371008.8))
    cos_ext = (
        f"cos(radians(least({band_abs} + {G.fnum(cell)}, 89.9e0)))"
    )
    dlam_deg = (
        f"degrees(2.0e0 * asin(least(1.0e0,"
        f" {G.fnum(sin_half)} / {cos_ext})))"
    )
    w_cap = (nx + 1) // 2 if max_w is None else min(int(max_w), (nx + 1) // 2)
    w_expr = (
        f"least(cast({w_cap} as int),"
        f" cast(ceil({dlam_deg} / {G.fnum(cell)}) as int) + 1)"
    )
    rf = (
        right.select(
            F.col(id_right).alias("nb_id"),
            F.col(x).alias("rx"), F.col(y).alias("ry"),
            F.expr(jx(x)).alias("__cx"),
            F.expr(jy(y)).alias("__cy"),
            F.expr(w_expr).alias("__w"),
        )
        .withColumn(
            "__dx", F.explode(F.expr("sequence(-__w, __w)"))
        )
        .withColumn("__dy", F.explode(F.expr("sequence(-1, 1)")))
        .select(
            "nb_id", "rx", "ry",
            F.expr(f"pmod(__cx + __dx, {nx})").alias("jx"),
            (F.col("__cy") + F.col("__dy")).alias("jy"),
        )
    )
    j = lf.join(rf, on=["jx", "jy"])
    hav = G.haversine_m("`ly`", "`lx`", "`ry`", "`rx`")
    out = j.withColumn(
        "dist_mm",
        F.expr(
            f"cast(floor({hav} * {G.fnum(1000.0)} + {G.fnum(0.5)})"
            " as bigint)"
        ),
    ).where(F.col("dist_mm") <= int(round(radius_m * 1000)))
    if not include_self:
        out = out.where(F.col("src_id") != F.col("nb_id"))
    return out.select("src_id", "nb_id", "dist_mm")


def spatial_join_estimate(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Radius-join CARDINALITY estimator from cell histograms — the
    planner query that decides radius_join strategy (salt factor,
    AQE hints, whether to pre-filter) BEFORE paying the join: bucket
    both sides at cell = radius, candidate pairs ~ sum over cells of
    left_count x (right count of the 3x3 neighborhood). The estimate
    UPPER-bounds the true pair count (every true pair is a candidate)
    and is exact integer arithmetic over histogram rows only.

    Output one row: n_cells_l, candidates, plus the hottest cell's
    contribution (hot_cell_pairs) — the salting signal.

    Scale: two cell histograms (map-side combined) + a 9-offset
    explode join of HISTOGRAM rows — cost is distinct-cell-sized,
    orders below the join it prices.
    """
    cell = float(radius)

    def hist(d: DataFrame, tag: str) -> DataFrame:
        return (
            d.select(
                F.floor(F.col(x) / F.lit(cell)).cast("long").alias("cx"),
                F.floor(F.col(y) / F.lit(cell)).cast("long").alias("cy"),
            )
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias(f"n_{tag}"))
        )

    hl = hist(left, "l")
    hr = (
        hist(right, "r")
        .withColumn("__dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            (F.col("cx") + F.col("__dx")).alias("cx"),
            (F.col("cy") + F.col("__dy")).alias("cy"),
            "n_r",
        )
        .groupBy("cx", "cy")
        .agg(F.sum("n_r").alias("nbr_r"))
    )
    per_cell = hl.join(hr, on=["cx", "cy"]).select(
        "cx", "cy", F.expr("n_l * nbr_r").alias("pairs")
    )
    return per_cell.agg(
        F.count(F.lit(1)).alias("n_cells_l"),
        F.sum("pairs").alias("candidates"),
        F.max("pairs").alias("hot_cell_pairs"),
    )


def knn_join_3d(
    left: DataFrame,
    right: DataFrame,
    k: int,
    radius0: float,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_left: str = "pid",
    id_right: str = "pid",
    include_self: bool = True,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact k nearest neighbors in 3D EUCLIDEAN distance — the
    reference's native neighborhood shape (filters.normal et al. use
    3D KNN; KD3Index in pdal/KDIndex.hpp).

    Radius-doubling over the cell-bucketed 3D ball join: every point
    with >= k candidates inside radius r is EXACT (the ball join is
    complete within r, so its k nearest within r are its k nearest
    overall); the unsettled remainder re-runs at 2r. Each round
    touches only pending points — the knn_join ring-expansion
    economics with a simpler completeness argument. Deterministic
    tie-break (dist3 asc, nb_id asc).

    Output: (src_id, nb_id, dist3, nn_rank[, nb_x/nb_y/nb_z]).
    Points with fewer than k neighbors within radius0 * 2^max_rounds
    ship with what they have, loudly.
    """
    from pdal_spark.operators.features3d import radius_join_3d

    rounds = []
    pending = left
    r = float(radius0)
    for it in range(int(max_rounds)):
        pairs = radius_join_3d(
            pending, right, r, x=x, y=y, z=z, id_left=id_left,
            id_right=id_right, include_self=include_self,
        )
        w = Window.partitionBy("src_id").orderBy(
            F.col("dist3").asc(), F.col("nb_id").asc()
        )
        ranked = (
            pairs.withColumn("nn_rank", F.row_number().over(w))
            .withColumn(
                "__n", F.count(F.lit(1)).over(
                    Window.partitionBy("src_id"))
            )
            .where(F.col("nn_rank") <= int(k))
        )
        last = it == int(max_rounds) - 1
        settled = ranked if last else ranked.where(
            F.col("__n") >= int(k)
        )
        rounds.append(
            settled.drop("__n").localCheckpoint(eager=True)
        )
        if last:
            n_short = (
                rounds[-1]
                .groupBy("src_id").count()
                .where(F.col("count") < int(k)).count()
            )
            miss = pending.join(
                rounds[-1].select("src_id").distinct()
                .withColumnRenamed("src_id", id_left),
                on=id_left, how="left_anti",
            ).count()
            if n_short or miss:
                import warnings

                warnings.warn(
                    f"knn_join_3d: radius cap {r} reached with "
                    f"{n_short} under-k and {miss} zero-candidate "
                    "points — raise radius0 or max_rounds",
                    stacklevel=2,
                )
            break
        done_ids = (
            rounds[-1].select("src_id").distinct()
            .withColumnRenamed("src_id", id_left)
        )
        pending = pending.join(
            done_ids, on=id_left, how="left_anti"
        ).localCheckpoint(eager=True)
        if pending.count() == 0:
            break
        r *= 2.0
    out = rounds[0]
    for rr in rounds[1:]:
        out = out.unionByName(rr)
    return out


def hausdorff_pairs(
    df: DataFrame,
    key: str,
    block: str,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 20,
) -> DataFrame:
    """Symmetric Hausdorff distance (SQUARED, exact integers)
    between every pair of per-key point sets sharing a block — the
    trajectory-pair / shape-pair generalization of cloud_compare's
    two-cloud hausdorff (kernels.hausdorff, ChamferKernel.cpp):
    h2(A,B) = max(max_a min_b d2, max_b min_a d2) on the
    floor(coord * coord_q) grid. Squared form is returned: sqrt is
    monotone, so ordering/thresholds are unchanged and every value
    stays int64 (|coord| < 2^21 at the default grid).

    Scale: the pair space is per-BLOCK quadratic (points_a x
    points_b per key pair) — the caller's blocking column bounds it
    (centroid cell / candidate pairs from an LSH stage), exactly the
    minhash-band discipline. ONE hash join on block + two two-level
    hash aggregates over the SAME joined relation; no driver state.
    """
    q = float(coord_q)
    pts = df.select(
        F.col(key).alias("k"), F.col(block).alias("b"),
        F.floor(F.col(x) * q).cast("long").alias("xq"),
        F.floor(F.col(y) * q).cast("long").alias("yq"),
    )
    a = pts.select(F.col("k").alias("ka"), "b",
                   F.col("xq").alias("ax"), F.col("yq").alias("ay"))
    bb = pts.select(F.col("k").alias("kb"), "b",
                    F.col("xq").alias("bx"), F.col("yq").alias("by"))
    j = (
        a.join(bb, on="b")
        .where(F.col("ka") < F.col("kb"))
        .select(
            "ka", "kb", "ax", "ay", "bx", "by",
            ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
             + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
             ).alias("d2"),
        )
    )
    h_ab = (
        j.groupBy("ka", "kb", "ax", "ay").agg(F.min("d2").alias("dm"))
        .groupBy("ka", "kb").agg(F.max("dm").alias("h_ab2"))
    )
    h_ba = (
        j.groupBy("ka", "kb", "bx", "by").agg(F.min("d2").alias("dm"))
        .groupBy("ka", "kb").agg(F.max("dm").alias("h_ba2"))
    )
    return (
        h_ab.join(h_ba, on=["ka", "kb"])
        .select(
            F.col("ka").alias("key_a"), F.col("kb").alias("key_b"),
            "h_ab2", "h_ba2",
            F.greatest("h_ab2", "h_ba2").alias("h2"),
        )
    )


PMED_BIG = 1 << 50


def p_median_greedy(
    demand: DataFrame,
    candidates: DataFrame,
    k: int = 4,
    id_demand: str = "did",
    id_cand: str = "fid",
    x: str = "x",
    y: str = "y",
    weight: str = "w",
) -> DataFrame:
    """Greedy p-median facility location (the Teitz-Bart/Whitaker
    add heuristic; huff_model / two_sfca's prescriptive sibling —
    WHERE to put the k depots/cache-nodes/service sites so total
    demand-weighted distance is minimal). Squared-Euclidean integer
    distances (the k-medoids convention — document if you need true
    metric distance, pre-quantize sqrt):

        each round picks the candidate minimizing
        sum_d w_d * min(cur_d, d2(d, f)),  ties to the smaller id

    All costs exact int64 (unserved demand carries the 2^50
    sentinel), so the pick sequence is engine-invariant (the
    greedy_set_cover discipline). Output: (fid, sel_rank, cost).

    Scale: the demand x candidate distance table is built ONCE
    (candidates broadcast — they're small by definition); each
    round is one join + hash agg + 1-row argmin. Bound:
    sum w * 2^50 < 2^63 — keep total weight under ~8000, or lower
    the sentinel.
    """
    d = demand.select(
        F.col(id_demand).alias("d"),
        F.col(x).cast("long").alias("dx"),
        F.col(y).cast("long").alias("dy"),
        F.col(weight).cast("long").alias("w"),
    )
    c = candidates.select(
        F.col(id_cand).alias("f"),
        F.col(x).cast("long").alias("fx"),
        F.col(y).cast("long").alias("fy"),
    )
    dist = d.crossJoin(F.broadcast(c)).select(
        "d", "w", "f",
        F.expr(
            "(dx - fx) * (dx - fx) + (dy - fy) * (dy - fy)"
        ).alias("d2"),
    ).localCheckpoint(eager=True)
    cur = d.select(
        "d", "w", F.lit(int(PMED_BIG)).cast("long").alias("cur")
    ).localCheckpoint(eager=True)
    spark = demand.sparkSession
    out_rows: list[tuple] = []
    chosen: set[int] = set()
    for rank in range(1, int(k) + 1):
        cand_cost = (
            dist.where(~F.col("f").isin(sorted(chosen))
                       if chosen else F.lit(True))
            .join(cur.select("d", "cur"), on="d")
            .groupBy("f")
            .agg(
                F.sum(
                    F.expr("w * least(cur, d2)")
                ).alias("cost")
            )
            .orderBy(F.col("cost").asc(), F.col("f").asc())
            .limit(1)
            .collect()
        )
        if not cand_cost:
            break
        pick = cand_cost[0]
        fid = int(pick["f"])
        out_rows.append((fid, rank, int(pick["cost"])))
        chosen.add(fid)
        upd = dist.where(F.col("f") == fid).select(
            "d", F.col("d2").alias("nd")
        )
        cur = (
            cur.join(upd, on="d", how="left")
            .select(
                "d", "w",
                F.expr(
                    "least(cur, coalesce(nd,"
                    f" cast({PMED_BIG} as bigint)))"
                ).alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        out_rows, "fid long, sel_rank long, cost long"
    )
