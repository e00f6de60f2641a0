"""Batch-9 ops: radius_join_geodesic, geometric_median, theil_sen."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import stats as ops_stats


def test_geodesic_radius_high_latitude_wraps_longitude(spark):
    # At lat 80, 15 degrees of longitude is only ~290 km: a planar
    # degree-radius join would need r=15 to pair these, but the
    # geodesic join finds them within 400 km. The antipodal-in-lon
    # pair at the SAME latitude near the antimeridian must also pair
    # (wrap test): lon -179.5 vs 179.5 at lat 80 is ~19 km apart.
    pts = spark.createDataFrame(
        [
            (1, 80.0, 0.0),
            (2, 80.0, 15.0),
            (3, 80.0, -179.5),
            (4, 80.0, 179.5),
            (5, 0.0, 0.0),
            (6, 0.0, 3.0),   # ~334 km at the equator
        ],
        ["pid", "lat", "lon"],
    )
    out = {
        (r.src_id, r.nb_id)
        for r in ops_knn.radius_join_geodesic(
            pts, pts, 400_000.0, include_self=False
        ).collect()
    }
    assert (1, 2) in out and (2, 1) in out
    assert (3, 4) in out and (4, 3) in out
    assert (5, 6) in out
    assert (1, 5) not in out


def test_geometric_median_robust_to_outlier(spark):
    # 9 points at ~(10, 10), 1 far outlier: the median stays near the
    # blob; the mean would sit ~17 degrees off.
    rows = [(1, 10.0 + i * 0.01, 10.0 - i * 0.01) for i in range(9)]
    rows.append((1, -170.0, -80.0))
    df = spark.createDataFrame(rows, ["user_id", "lon", "lat"])
    out = ops_cluster.geometric_median(df, iters=6).collect()[0]
    assert abs(out.gx - 10.0) < 0.5
    assert abs(out.gy - 10.0) < 0.5


def test_theil_sen_ignores_outlier_burst(spark):
    # y = 2 * t (seconds) with 3 wild outliers: OLS bends, Theil-Sen
    # stays on slope 2 (per second = 2e-6 per microsecond).
    rows = []
    for i in range(30):
        y = 2.0 * i if i not in (5, 6, 7) else 1000.0
        rows.append((i, 1, f"2024-01-01 00:00:{i:02d}", y))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ops_stats.theil_sen(df).collect()[0]
    assert out.slope == pytest.approx(2.0e-6, rel=1e-6)
