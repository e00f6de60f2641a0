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
