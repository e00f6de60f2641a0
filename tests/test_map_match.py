"""map_match behavior: Viterbi smoothing vs per-point snapping,
penalty extremes, and partitioning invariance."""

from pyspark.sql import functions as F

from pdal_spark.operators.transform import MM_EQ, map_match

# two parallel horizontal roads, 2 degrees apart
_LINES = [
    (0, [(0.0, 0.0), (10.0, 0.0)]),
    (1, [(0.0, 2.0), (10.0, 2.0)]),
]


def _traj(spark, rows):
    return spark.createDataFrame(
        [(1, i, lon, lat) for i, (lon, lat) in enumerate(rows)],
        ["user_id", "event_id", "lon", "lat"],
    )


def test_outlier_does_not_flip_the_road(spark):
    # 7 points hugging road 0, one mid-trajectory outlier nearer
    # road 1. Per-point argmin assigns the outlier to road 1; the
    # HMM (switch costs 2*(1.9^2-0.1^2) > one bad emission) keeps it.
    pts = [(float(i), 0.1) for i in range(4)] \
        + [(4.0, 1.9)] + [(float(i), 0.1) for i in range(5, 8)]
    pen = int(4.0 * MM_EQ)  # 2 switches cost 8 > 1.9^2-0.1^2 = 3.58
    got = {r.event_id: r.line_id for r in map_match(
        _traj(spark, pts), _LINES, switch_penalty_q=pen).collect()}
    assert set(got.values()) == {0}


def test_zero_penalty_is_per_point_argmin(spark):
    pts = [(0.0, 0.1), (1.0, 1.9), (2.0, 0.1), (3.0, 1.9)]
    got = {r.event_id: r.line_id for r in map_match(
        _traj(spark, pts), _LINES, switch_penalty_q=0).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_huge_penalty_picks_best_single_road(spark):
    # 3 points near road 1, 2 near road 0 -> summed emissions favor 1
    pts = [(0.0, 1.9), (1.0, 0.1), (2.0, 1.9), (3.0, 0.1),
           (4.0, 1.9)]
    got = {r.event_id: r.line_id for r in map_match(
        _traj(spark, pts), _LINES,
        switch_penalty_q=10**15).collect()}
    assert set(got.values()) == {1}


def test_gate_fixture_partitioning_invariant(spark):
    import pdal_spark.gates.gate_ext68 as g68
    from pdal_spark.gate import _t
    from pdal_spark.operators import h3 as ops_h3

    ev = _t(spark, "/root/testdata/sf0.001", "events").where(
        F.col("event_id") % g68._MM_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id").select(
        (F.col("user_id") % g68._MM_KEYS).alias("key"),
        "event_id", "lat", "lon",
    )
    a = map_match(pts, g68._SNAP_LINES, switch_penalty_q=g68._MM_P,
                  key_col="key", order_col="event_id")
    b = map_match(pts.repartition(13), g68._SNAP_LINES,
                  switch_penalty_q=g68._MM_P,
                  key_col="key", order_col="event_id")
    ra = {(r.key, r.event_id, r.line_id) for r in a.collect()}
    rb = {(r.key, r.event_id, r.line_id) for r in b.collect()}
    assert ra == rb and len(ra) > 0
