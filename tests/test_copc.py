"""readers.copc analog validated against PDAL's OWN pinned
expectations (test/unit/io/CopcReaderTest.cpp): full read 518862,
resolution 0.2 -> 163993 (depths 0-1, CopcReaderTest.cpp:138-182),
2D bounds -> 354211 (:186-242), 3D bounds -> 45930 (:246-311) —
plus pruning assertions (nodes actually skipped at plan time)."""

from __future__ import annotations

import os

import pytest

from pdal_spark.sources.copc import (
    copc_hierarchy,
    copc_quickinfo,
    depth_end_for_resolution,
    parse_copc_info,
    read_copc,
)

_REF = "/root/reference/test/data"
_LONESTAR = f"{_REF}/copc/lone-star.copc.laz"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)

_BOUNDS2D = (515380, 4918350, 515400, 4918370)
_BOUNDS3D = (515380, 4918350, 2320, 515400, 4918370, 2325)


@needs_ref
def test_quickinfo_matches_inspect_pins():
    qi = copc_quickinfo(_LONESTAR)
    assert qi["point_count"] == 518862
    assert qi["point_format"] == 6
    # CopcReaderTest.cpp:63-65 pointBounds mins are the root cube
    # mins (the cube is bounds-anchored at min corner)
    ext = qi["root_extent"]
    assert ext[0] == pytest.approx(515368.60225)
    assert ext[1] == pytest.approx(4918340.364)
    assert ext[2] == pytest.approx(2322.89625)
    assert {"X", "Y", "Z", "ScanChannel", "Overlap"} <= set(qi["dims"])


@needs_ref
def test_hierarchy_full_and_resolution_pins():
    head = open(_LONESTAR, "rb").read(65536)
    info = parse_copc_info(head)
    # CopcReaderTest.cpp:141-149: depth resolutions 0.31846 /
    # 0.15923 / 0.079615 — spacing halves per level
    assert info["spacing"] == pytest.approx(0.31846, abs=1e-4)
    with open(_LONESTAR, "rb") as fh:
        full = copc_hierarchy(fh, info)
        assert sum(n[3] for n in full["nodes"]) == 518862
        res = copc_hierarchy(fh, info, resolution=0.2)
        assert res["depth_end"] == 2
        assert sum(n[3] for n in res["nodes"]) == 163993
        assert len(res["nodes"]) < len(full["nodes"])
        b2 = copc_hierarchy(fh, info, bounds=_BOUNDS2D)
        assert b2["pruned"] > 0  # subtrees cut at plan time
        assert len(b2["nodes"]) < len(full["nodes"])


def test_depth_end_formula():
    # CopcReader.cpp:382-384
    assert depth_end_for_resolution(0.31846, None) == 0
    assert depth_end_for_resolution(0.31846, 0.2) == 2
    assert depth_end_for_resolution(0.31846, 0.15) == 3
    with pytest.raises(ValueError):
        depth_end_for_resolution(0.3, -1)


@needs_ref
def test_read_copc_full_count(spark):
    assert read_copc(spark, _LONESTAR).count() == 518862


@needs_ref
def test_read_copc_bounds_2d_pin(spark):
    df = read_copc(spark, _LONESTAR, bounds=_BOUNDS2D)
    assert df.count() == 354211


@needs_ref
def test_read_copc_bounds_3d_pin(spark):
    df = read_copc(spark, _LONESTAR, bounds=_BOUNDS3D)
    assert df.count() == 45930


@needs_ref
def test_read_copc_resolution_pin(spark):
    assert read_copc(spark, _LONESTAR, resolution=0.2).count() == 163993


@needs_ref
def test_read_copc_node_key_column(spark):
    df = read_copc(spark, _LONESTAR, resolution=0.4,
                   with_node_key=True)
    pdf = df.toPandas()
    assert set(pdf.node_key) == {"0-0-0-0"}  # depth 0 only


_TRI = ("POLYGON ((515368 4918340, 515390 4918340, "
        "515368 4918362, 515368 4918340))")


@needs_ref
def test_read_copc_polygon_pushdown(spark):
    """Polygon query (CopcReader polysOverlap semantics): node-level
    pruning + exact point-in-polygon — equals cropping the full
    read with the same WKT."""
    from pdal_spark.operators.crop import crop_polygons

    got = read_copc(spark, _LONESTAR, polygon=_TRI).count()
    want = crop_polygons(read_copc(spark, _LONESTAR), [_TRI],
                         x="X", y="Y", emit_geom_id=False).count()
    assert got == want > 0
    head = open(_LONESTAR, "rb").read(65536)
    info = parse_copc_info(head)
    with open(_LONESTAR, "rb") as fh:
        h = copc_hierarchy(fh, info, polygon=_TRI)
        full = copc_hierarchy(fh, info)
    assert len(h["nodes"]) < len(full["nodes"])
    assert h["pruned"] > 0


@needs_ref
def test_cli_info_copc(capsys):
    """`info` kernel on a .copc.laz: the CopcReaderTest inspect
    analog (QuickInfo) with no Spark session and no point reads."""
    import json
    import sys

    from pdal_spark.cli import main

    argv = sys.argv
    try:
        sys.argv = ["cli", "info", _LONESTAR]
        main()
    finally:
        sys.argv = argv
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["container"] == "copc"
    assert out["point_count"] == 518862
    assert out["root_extent"][0] == pytest.approx(515368.60225)
