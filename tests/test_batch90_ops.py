"""hrw_assign / extract_headings / isochrone_cells behavior."""

from pdal_spark.operators.raster import FOCAL_Q, isochrone_cells
from pdal_spark.operators.textops import extract_headings, hrw_assign
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def test_hrw_minimal_disruption(spark):
    # Growing 5 -> 6 shards: every doc either keeps its shard or
    # moves to the NEW shard 5 — the rendezvous property.
    df = spark.createDataFrame([(i,) for i in range(500)],
                               ["doc_id"])
    a = {r.doc_id: r.shard for r in
         hrw_assign(df, n_shards=5).collect()}
    b = {r.doc_id: r.shard for r in
         hrw_assign(df, n_shards=6).collect()}
    moved = {d for d in a if a[d] != b[d]}
    assert all(b[d] == 5 for d in moved)
    assert 0 < len(moved) < 500  # some move, not all


def test_hrw_balance_is_reasonable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)],
                               ["doc_id"])
    out = hrw_assign(df, n_shards=4).groupBy("shard").count()
    counts = {r.shard: r["count"] for r in out.collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert max(counts.values()) < 2 * min(counts.values())


def test_extract_headings_levels_and_text(spark):
    html = ('<h1 class="big">Top</h1><p>body</p>'
            "<h2>A</h2><h2>B</h2><h3>deep</h3><h4>ignored</h4>")
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    out = {(r.level, r.heading) for r in
           extract_headings(df).collect()}
    assert out == {(1, "Top"), (2, "A"), (2, "B"), (3, "deep")}


def test_isochrone_bands(spark):
    # uniform friction 1 chain: dist = 2Q, 4Q, 6Q... east; band_q =
    # 3Q, 2 bands -> cells at dist 0, 2Q (band 0), 4Q (band 1);
    # dist 6Q is outside.
    cells = [(_cell(ix, 0), 1) for ix in range(4)]
    df = spark.createDataFrame(cells, ["cell", "x"])
    out = {r.cell: r.band for r in isochrone_cells(
        df, RES, sources=[_cell(0, 0)], band_q=3 * FOCAL_Q,
        n_bands=2, rounds=5).collect()}
    assert out[_cell(0, 0)] == 0 and out[_cell(1, 0)] == 0
    assert out[_cell(2, 0)] == 1
    assert _cell(3, 0) not in out
