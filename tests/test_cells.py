"""Polygon->cell covering family: polyfill / compact / uncompact
invariants and the polygon-pushdown crop (readers.copc/ept `polygon`
pruning analog, CopcReader.cpp:684-754)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators.crop import crop_polygons, crop_polygons_pruned

SF_SMOKE = "/root/testdata/sf0.001"

ARROW = [(-40.0, -30.0), (0.0, 40.0), (40.0, -30.0), (0.0, -5.0)]
ARROW_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in ARROW + [ARROW[0]])
    + "))"
)
RES = 6


def _cells(df):
    return sorted(r.cell for r in df.collect())


def test_uncompact_inverts_compact(spark):
    cov = ops_h3.polyfill(spark, [ARROW], RES)
    comp = ops_h3.cell_compact(cov, RES, min_res=2)
    back = ops_h3.cell_uncompact(comp, RES)
    assert _cells(back) == _cells(cov)


def test_compact_is_minimal_and_smaller(spark):
    cov = ops_h3.polyfill(spark, [ARROW], RES)
    comp = ops_h3.cell_compact(cov, RES, min_res=2).collect()
    n_cov = ops_h3.polyfill(spark, [ARROW], RES).count()
    assert 0 < len(comp) < n_cov
    # minimality: no parent has all four children present
    from collections import Counter

    by_parent = Counter()
    for r in comp:
        res = r.cell >> 54
        ix = (r.cell % (1 << 54)) >> 27
        iy = r.cell % (1 << 27)
        if res > 2:
            by_parent[(res - 1, ix >> 1, iy >> 1)] += 1
    assert all(v < 4 for v in by_parent.values())


def test_polyfill_covering_superset_of_center(spark):
    center = set(ops_h3.polyfill_cells([ARROW], RES, "center"))
    covering = set(ops_h3.polyfill_cells([ARROW], RES, "covering"))
    assert center <= covering
    spark_center = set(_cells(ops_h3.polyfill(spark, [ARROW], RES)))
    assert spark_center == center  # driver mirror == engine arithmetic


def test_pruned_crop_equals_plain_crop(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    pts = ops_h3.geocode(ev, "event_id")
    plain = crop_polygons(pts, [(0, ARROW_WKT)], x="lon", y="lat")
    pruned = crop_polygons_pruned(
        pts, [(0, ARROW_WKT)], prune_res=7, x="lon", y="lat"
    )
    a = sorted(r.event_id for r in plain.select("event_id").collect())
    b = sorted(r.event_id for r in pruned.select("event_id").collect())
    assert a == b and len(a) > 0


def test_covering_inlist_prunes_partitioned_scan(spark, tmp_path):
    """Against a cell-partitioned layout the covering IN-list is real
    partition pruning: the scan reads only covered directories."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(2000)
    pts = ops_h3.geocode(ev, "event_id")
    enc = ops_h3.h3_encode(pts, "lat", "lon", res=3, out="pcell")
    path = str(tmp_path / "cellpart")
    enc.write.partitionBy("pcell").parquet(path)
    tbl = spark.read.parquet(path)
    n_dirs = tbl.select("pcell").distinct().count()
    cells = ops_h3.polyfill_cells([ARROW], 3, "covering")
    pruned = tbl.where(F.col("pcell").isin(cells))
    # the IN-list must land in the scan's PartitionFilters (directory
    # pruning), and select strictly fewer partitions than exist
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pcell" in plan.split(
        "PartitionFilters", 1
    )[1]
    n_read = pruned.select("pcell").distinct().count()
    assert 0 < n_read < n_dirs
    # and nothing inside the polygon was lost by the prune
    plain = crop_polygons(tbl, [(0, ARROW_WKT)], x="lon", y="lat")
    after = crop_polygons(pruned, [(0, ARROW_WKT)], x="lon", y="lat")
    assert plain.count() == after.count()


def test_zorder_key_locality_and_range(spark):
    from pdal_spark.operators.h3 import zorder_key_col

    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("double").alias("y"),
        (F.col("id") % 7).cast("double").alias("w"),
    )
    out = zorder_key_col(
        df, [("x", 0.0, 64.0), ("y", 0.0, 64.0), ("w", 0.0, 7.0)],
        bits=4,
    )
    rows = out.collect()
    assert all(0 <= r["z_key"] < (1 << 12) for r in rows)
    # locality: the key's top bits must follow the coarse (x, y)
    # quadrant — points in the same quadrant share high bits.
    import collections
    by_quadrant = collections.defaultdict(set)
    for r in rows:
        q = (int(r["x"]) // 32, int(r["y"]) // 32)
        by_quadrant[q].add(r["z_key"] >> 9)  # top 3 interleaved bits
    # each quadrant hits few distinct high-bit prefixes
    assert all(len(v) <= 4 for v in by_quadrant.values())
    # clamping: out-of-bounds values land in the edge buckets
    edge = zorder_key_col(
        spark.createDataFrame([(-5.0, 99.0, 3.0)], "x double, y double, w double"),
        [("x", 0.0, 64.0), ("y", 0.0, 64.0), ("w", 0.0, 7.0)], bits=4,
    ).collect()[0]["z_key"]
    assert 0 <= edge < (1 << 12)


def test_pca_project_concentrates_variance(spark):
    import numpy as np
    from pyspark.sql import Row

    from pdal_spark.operators.similarity import (
        pca_components,
        pca_project,
    )

    rng = np.random.RandomState(3)
    rows = []
    for i in range(200):
        v = np.zeros(6)
        v[1] = rng.randn() * 8.0
        v[4] = rng.randn() * 1.0
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows)
    _, comps = pca_components(df, n_components=2, dims=6)
    proj = pca_project(df, comps).collect()
    p = np.array([r["pca"] for r in proj])
    # first projected coordinate carries far more variance
    assert p[:, 0].var() > 10 * p[:, 1].var()
    assert p.shape == (200, 2)
