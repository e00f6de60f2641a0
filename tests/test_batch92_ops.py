"""skyline_2d / acf / weighted flow_accumulation / golden_record."""

from pdal_spark.operators.dedup import golden_record
from pdal_spark.operators.raster import flow_accumulation
from pdal_spark.operators.stats import skyline_2d
from pdal_spark.operators.temporal import acf
from pdal_spark.sqlgen import qcell_pack


def test_skyline_basic_dominance(spark):
    rows = [(1, 1, 9), (2, 2, 2), (3, 9, 1), (4, 3, 3), (5, 2, 2)]
    df = spark.createDataFrame(rows, ["pid", "a", "b"])
    out = {(r.a, r.b) for r in skyline_2d(df, "a", "b").collect()}
    # (3,3) dominated by (2,2); duplicates (2,2) collapse via the
    # id-free projection; (1,9), (2,2), (9,1) survive
    assert out == {(1, 9), (2, 2), (9, 1)}
    with_ids = skyline_2d(df, "a", "b", id_col="pid").collect()
    ids = {r.pid for r in with_ids}
    assert ids == {1, 2, 3, 5}  # both (2,2) rows kept with ids


def test_acf_lag_structure(spark):
    # period-2 alternating series: r_1 = -1-ish, r_2 = +1-ish
    rows = [(1, t, 10 if t % 2 == 0 else 0) for t in range(12)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r.lag: r.r for r in
           acf(df, key="k", order="o", value="v", max_lag=3).collect()}
    assert out[2] > 0.8 and out[1] < -0.8
    # num/den are exact ints: r bounded by lead-truncation
    assert -1.0 <= out[1] <= 1.0


def test_flow_accumulation_load(spark):
    # chain 30 -> 20 -> 10 -> 0, loads = cell values:
    # acc(last) = 30 + 20 + 10 = 60 with load=x; count form = 3.
    cells = [(int(eval(qcell_pack(str(ix), "0", 4))), 30 - 10 * ix)
             for ix in range(4)]
    df = spark.createDataFrame(cells, ["cell", "x"])
    last = int(eval(qcell_pack("3", "0", 4)))
    loaded = {r.cell: r.acc for r in
              flow_accumulation(df, 4, load="x").collect()}
    counted = {r.cell: r.acc for r in
               flow_accumulation(df, 4).collect()}
    assert loaded[last] == 60 and counted[last] == 3


def test_golden_record_field_level_survivorship(spark):
    # cluster 1: newest row (ts=3) has NULL name -> name comes from
    # ts=2; city latest non-null is ts=3's.
    rows = [
        (1, 1, 1, "ann", "nyc"),
        (2, 1, 2, "anne", None),
        (3, 1, 3, None, "sf"),
        (4, 2, 1, None, None),
    ]
    df = spark.createDataFrame(rows, ["id", "cl", "ts", "name", "city"])
    out = {r.cl: r for r in golden_record(
        df, cluster="cl", ts="ts", fields=["name", "city"],
        id_col="id").collect()}
    g = out[1]
    assert g.n_members == 3 and g.newest_id == 3
    assert g.name == "anne" and g.city == "sf"
    g2 = out[2]
    assert g2.name is None and g2.city is None and g2.newest_id == 4
