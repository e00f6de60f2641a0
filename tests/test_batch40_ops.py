"""gdal_contour analog: marching-squares ring around a peak, saddle
resolution, nodata (missing corner) squares skipped."""

from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.operators.raster import contour_segments

RES = 6
N = 1 << RES


def _cells(spark, pts):
    df = spark.createDataFrame(
        [(N // 2 + dx, N // 4 + dy, v) for dx, dy, v in pts],
        "ix long, iy long, x long",
    )
    return df.select(
        F.expr(G.qcell_pack("ix", "iy", RES)).alias("cell"), "x"
    )


def _segs(spark, pts, iso=2.5):
    out = contour_segments(_cells(spark, pts), res=RES, iso=iso)
    return sorted(
        (r.ix - N // 2, r.iy - N // 4, r.seg_idx,
         round(r.x1 - N // 2, 4), round(r.y1 - N // 4, 4),
         round(r.x2 - N // 2, 4), round(r.y2 - N // 4, 4))
        for r in out.collect()
    )


def test_contour_ring_around_peak(spark):
    pts = [(dx, dy, 10 if (dx, dy) == (1, 1) else 1)
           for dx in range(3) for dy in range(3)]
    segs = _segs(spark, pts)
    # a closed diamond: 4 segments, one per square touching the peak
    assert len(segs) == 4
    t = round(1.5 / 9, 4)  # (iso-1)/(10-1)
    assert (0, 0, 0, t, 1.0, 1.0, t) in segs
    # endpoints chain into a closed loop (each vertex appears twice)
    from collections import Counter
    verts = Counter()
    for _, _, _, x1, y1, x2, y2 in segs:
        verts[(x1, y1)] += 1
        verts[(x2, y2)] += 1
    assert all(c == 2 for c in verts.values())


def test_contour_saddle_emits_two_segments(spark):
    # one square with opposite high corners -> case 5/10 saddle
    pts = [(0, 0, 10), (1, 0, 1), (0, 1, 1), (1, 1, 10)]
    segs = _segs(spark, pts)
    assert len(segs) == 2
    assert {s[2] for s in segs} == {0, 1}


def test_contour_skips_nodata_squares(spark):
    # missing NE corner -> no square, no segments
    pts = [(0, 0, 10), (1, 0, 1), (0, 1, 1)]
    assert _segs(spark, pts) == []


def test_segment_radius_join_cases(spark):
    from pdal_spark.operators.transform import segment_radius_join

    pts = spark.createDataFrame(
        [
            (1, 5, 3),     # 3 below the y=0 segment interior
            (2, 5, 9),     # 9 above: outside r=5
            (3, -4, 0),    # 4 left of endpoint a: inside r=5
            (4, -4, 4),    # sqrt(32) > 5 from endpoint a: outside
            (5, 14, -3),   # past endpoint b: dist 5 exactly -> in
        ],
        "p_id long, px long, py long",
    )
    segs = spark.createDataFrame(
        [(100, 0, 0, 10, 0)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    got = sorted(r.p_id for r in segment_radius_join(
        pts, segs, radius=5, cell=4).collect())
    assert got == [1, 3, 5]


def test_segment_radius_join_no_duplicates_across_cells(spark):
    from pdal_spark.operators.transform import segment_radius_join

    # long segment spanning many cells; a point near its middle
    pts = spark.createDataFrame(
        [(1, 50, 2)], "p_id long, px long, py long"
    )
    segs = spark.createDataFrame(
        [(9, 0, 0, 100, 0)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    rows = segment_radius_join(pts, segs, radius=5, cell=8).collect()
    assert [(r.p_id, r.seg_id) for r in rows] == [(1, 9)]


def test_scd2_collapses_noops_and_closes_intervals(spark):
    from pdal_spark.operators.temporal import scd2_intervals

    rows = [
        (1, 10, "a"), (1, 20, "a"),   # no-op change collapses
        (1, 30, "b"), (1, 40, "a"),   # back to a: NEW version
        (2, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v string")
    out = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_intervals(df, "k", "t", "v").collect()
    )
    assert out == [
        (1, "a", 10, 30, 0),
        (1, "a", 40, None, 1),
        (1, "b", 30, 40, 0),
        (2, "x", 5, None, 1),
    ]


def test_anonymize_urls_preserves_hierarchy(spark):
    from pdal_spark.operators.textops import anonymize_urls

    urls = [
        "https://a.com/x/y/p1",
        "https://a.com/x/z",
        "https://A.com/",               # host case-insensitive
        "https://b.com/x/secret?token=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r.url: r.anon_url for r in anonymize_urls(df).collect()}
    a1, a2, a3, b = (out[u] for u in urls)
    # same host -> same anon host; case folds
    assert a1.split("/")[2] == a2.split("/")[2] == a3.split("/")[2]
    assert a3.endswith(".anon/")
    # shared path prefix '/x' stays shared; differing tails differ
    assert a1.split("/")[3] == a2.split("/")[3]
    assert a1.split("/")[4] != a2.split("/")[4]
    # different host differs even with same first segment name
    assert b.split("/")[2] != a1.split("/")[2]
    assert b.split("/")[3] == a1.split("/")[3]  # both hashed 'x'
    # query/fragment never leak
    assert "token" not in b and "?" not in b
