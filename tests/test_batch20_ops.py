"""Batch-20 ops: morton_sample, celljoin outside, containment_pairs."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import sampling as ops_sampling


def test_morton_sample_nested_and_spread(spark):
    pts = spark.range(20000).selectExpr(
        "id AS pid",
        "cast(((id * 48271) % 360000) as double) / 1000.0 - 180.0"
        " AS lon",
        "cast(((id * 69621) % 170000) as double) / 1000.0 - 85.0"
        " AS lat",
    )
    k2 = ops_sampling.morton_sample(pts, 2, 7)
    k1 = ops_sampling.morton_sample(pts, 1, 7)
    n1, n2 = k1.count(), k2.count()
    # nesting: the 1/7 sample is a subset of the 2/7 sample
    ids1 = {r.pid for r in k1.select("pid").collect()}
    ids2 = {r.pid for r in k2.select("pid").collect()}
    assert ids1 <= ids2
    assert abs(n1 / 20000 - 1 / 7) < 0.02
    assert abs(n2 / 20000 - 2 / 7) < 0.02
    # spatial spread: every hemisphere quadrant keeps points
    q = k1.selectExpr(
        "sum(case when lon < 0 and lat < 0 then 1 else 0 end) a",
        "sum(case when lon >= 0 and lat < 0 then 1 else 0 end) b",
        "sum(case when lon < 0 and lat >= 0 then 1 else 0 end) c",
        "sum(case when lon >= 0 and lat >= 0 then 1 else 0 end) d",
    ).collect()[0]
    assert min(q.a, q.b, q.c, q.d) > 100


def test_celljoin_outside_partitions_the_points(spark):
    polys = [(0, "POLYGON ((0.1 0.1, 9.7 0.3, 5.1 8.9, 0.1 0.1))")]
    pdf = spark.createDataFrame(polys, "geom_id int, wkt string")
    pts = spark.range(2000).selectExpr(
        "id AS pid",
        "cast(((id * 48271) % 300) as double) / 10.0 - 10.0 AS lon",
        "cast(((id * 69621) % 300) as double) / 10.0 - 10.0 AS lat",
    )
    inside = {
        r.pid for r in ops_crop.crop_polygons_celljoin(
            pts, pdf, res=5
        ).select("pid").distinct().collect()
    }
    outside = {
        r.pid for r in ops_crop.crop_polygons_celljoin_outside(
            pts, pdf, res=5
        ).select("pid").collect()
    }
    assert inside and outside
    assert inside.isdisjoint(outside)
    assert len(inside) + len(outside) == 2000


def test_containment_catches_quoted_subset(spark):
    quote = "alpha beta gamma delta epsilon zeta"
    page = ("intro words here " + quote + " closing remarks follow"
            " with many extra tokens to dilute jaccard far below"
            " the symmetric threshold")
    df = spark.createDataFrame(
        [(1, quote), (2, page), (3, "unrelated text entirely here")],
        ["doc_id", "text"],
    )
    out = {(r.a, r.b): r.containment for r in
           ops_dedup.containment_pairs(
               df, 4, 5, max_df=10
           ).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0
    # the big page is NOT contained in the quote
    assert (2, 1) not in out
    assert all(a != 3 and b != 3 for a, b in out)
