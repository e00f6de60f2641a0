"""readers.ept analog over the reference's own EPT fixture trees:
1.2-with-color (laszip nodes) decodes to the exact point multiset
of the .las twin; lone-star-laszip (same capture as the COPC
fixture) reproduces the CopcReaderTest-pinned counts reader-vs-
reader; hierarchy pages with -1 subtree markers resolve; bounds
pruning cuts subtrees at plan time; binary dataType round-trips a
schema-packed node."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from pdal_spark.sources.ept import (
    _schema_dtype,
    ept_hierarchy,
    read_ept,
    read_ept_info,
)

_REF = "/root/reference/test/data"
_WC = f"{_REF}/ept/1.2-with-color"
_LS = f"{_REF}/ept/lone-star-laszip"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


@needs_ref
def test_info_and_hierarchy():
    info = read_ept_info(_LS)
    assert info["points"] == 518862
    h = ept_hierarchy(_LS, info)
    assert sum(c for _, c in h["nodes"]) == 518862
    # 6 root-page nodes + 7 nodes from the five -1 subtree pages
    assert len(h["nodes"]) == 13


@needs_ref
def test_multiset_matches_las_twin(spark):
    import pdal_spark.sources.las as L

    pdf = read_ept(spark, _WC).toPandas()
    assert len(pdf) == 1065
    las = open(f"{_REF}/las/1.2-with-color.las", "rb").read()
    twin = L._decode_las(las, L._parse_las_header(las))
    common = [c for c in pdf.columns if c in twin.columns]
    for d in (pdf, twin):
        for c in ("X", "Y", "Z"):
            d[c] = d[c].round(2)
    a = pdf[common].sort_values(common).reset_index(drop=True)
    b = twin[common].sort_values(common).reset_index(drop=True)
    assert a.equals(b)


@needs_ref
def test_lone_star_full_and_bounds_cross_pins(spark):
    assert read_ept(spark, _LS).count() == 518862
    # same capture as copc/lone-star.copc.laz: the CopcReaderTest
    # 2D-bounds pin must reproduce through the EPT tree too
    n = read_ept(spark, _LS,
                 bounds=(515380, 4918350, 515400, 4918370)).count()
    assert n == 354211


@needs_ref
def test_bounds_prune_subtrees():
    info = read_ept_info(_LS)
    h = ept_hierarchy(
        _LS, info, bounds=(515380, 4918350, 515395, 4918360))
    assert h["pruned"] > 0
    full = ept_hierarchy(_LS, info)
    assert len(h["nodes"]) < len(full["nodes"])


@needs_ref
def test_resolution_depth_limit(spark):
    info = read_ept_info(_LS)
    spacing = (info["bounds"][3] - info["bounds"][0]) / info["span"]
    h = ept_hierarchy(_LS, info, resolution=spacing * 2)
    assert h["depth_end"] == 1
    assert {k[0] for k, _ in h["nodes"]} == {0}


def test_binary_datatype_roundtrip(spark, tmp_path):
    """Schema-driven binary nodes: pack one node per the ept.json
    schema, read it back exactly."""
    root = tmp_path / "ept"
    (root / "ept-data").mkdir(parents=True)
    (root / "ept-hierarchy").mkdir()
    schema = [
        {"name": "X", "type": "signed", "size": 4,
         "scale": 0.01, "offset": 100.0},
        {"name": "Y", "type": "signed", "size": 4,
         "scale": 0.01, "offset": 200.0},
        {"name": "Z", "type": "signed", "size": 4,
         "scale": 0.01, "offset": 0.0},
        {"name": "Intensity", "type": "unsigned", "size": 2},
        {"name": "GpsTime", "type": "float", "size": 8},
    ]
    info = {"bounds": [0, 0, 0, 1000, 1000, 1000],
            "dataType": "binary", "hierarchyType": "json",
            "points": 3, "schema": schema, "span": 128,
            "version": "1.0.0"}
    (root / "ept.json").write_text(json.dumps(info))
    (root / "ept-hierarchy" / "0-0-0-0.json").write_text(
        json.dumps({"0-0-0-0": 3}))
    arr = np.zeros(3, dtype=_schema_dtype(schema))
    arr["X"] = [100, 200, 300]
    arr["Y"] = [-100, 0, 100]
    arr["Z"] = [5000, 6000, 7000]
    arr["Intensity"] = [1, 2, 65535]
    arr["GpsTime"] = [1.5, 2.5, 3.5]
    (root / "ept-data" / "0-0-0-0.bin").write_bytes(arr.tobytes())
    pdf = (read_ept(spark, str(root)).toPandas()
           .sort_values("GpsTime").reset_index(drop=True))
    assert pdf.X.tolist() == [101.0, 102.0, 103.0]
    assert pdf.Y.tolist() == [199.0, 200.0, 201.0]
    assert pdf.Z.tolist() == [50.0, 60.0, 70.0]
    assert pdf.Intensity.tolist() == [1, 2, 65535]
    assert pdf.GpsTime.tolist() == [1.5, 2.5, 3.5]


def test_zstandard_rejected(tmp_path):
    root = tmp_path / "ept"
    root.mkdir()
    (root / "ept.json").write_text(json.dumps(
        {"dataType": "zstandard", "hierarchyType": "json",
         "bounds": [0, 0, 0, 1, 1, 1], "schema": [], "span": 128}))
    with pytest.raises(ValueError, match="zstandard"):
        read_ept_info(str(root))


@needs_ref
def test_read_ept_polygon_pushdown(spark):
    from pdal_spark.operators.crop import crop_polygons

    tri = ("POLYGON ((515368 4918340, 515390 4918340, "
           "515368 4918362, 515368 4918340))")
    got = read_ept(spark, _LS, polygon=tri).count()
    want = crop_polygons(read_ept(spark, _LS), [tri],
                         x="X", y="Y", emit_geom_id=False).count()
    assert got == want > 0
    info = read_ept_info(_LS)
    h = ept_hierarchy(_LS, info, polygon=tri)
    assert len(h["nodes"]) < len(ept_hierarchy(_LS, info)["nodes"])
