"""Two-level pruning over a directory of COPC tiles (readers.tindex
over writers.copc output): level 1 skips whole FILES from the
manifest (no I/O on pruned files), level 2 skips octree NODES inside
surviving files, and the result equals a plain filter of everything.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pdal_spark.sources.copc import (
    _read_plan_head,
    copc_hierarchy,
    parse_copc_info,
)
from pdal_spark.sources.copcwriter import write_copc
from pdal_spark.sources.tindex import (
    copc_tindex,
    plan_copc_tindex,
    read_copc_tindex,
)


@pytest.fixture(scope="module")
def tiled(spark, tmp_path_factory):
    """Four spatially-disjoint COPC tiles written by our writer."""
    out = str(tmp_path_factory.mktemp("copc_tiles"))
    rng = np.random.default_rng(7)
    frames = []
    for i, (bx, by) in enumerate([(0, 0), (1000, 0),
                                  (0, 1000), (1000, 1000)]):
        n = 8000
        frames.append(pd.DataFrame({
            "X": np.round(rng.uniform(bx, bx + 900, n), 2),
            "Y": np.round(rng.uniform(by, by + 900, n), 2),
            "Z": np.round(rng.uniform(0, 60, n), 2),
            "Intensity": rng.integers(0, 3000, n).astype("int32"),
            "Classification":
                rng.integers(1, 20, n).astype("int16"),
            "GpsTime": np.arange(n, dtype="f8") * 1e-4 + i * 10,
            "tile": np.full(n, i, dtype="int64"),
        }))
    all_pdf = pd.concat(frames, ignore_index=True)
    for i, pdf in enumerate(frames):
        df = spark.createDataFrame(
            pdf.drop(columns=["tile"])).repartition(1)
        # small node capacity -> real multi-level octrees per tile
        write_copc(df, os.path.join(out, f"tile{i}"), capacity=1024)
    return out, all_pdf


def test_manifest_shape(spark, tiled):
    out, all_pdf = tiled
    man = copc_tindex(spark, out)
    rows = man.collect()
    assert sum(r["point_count"] for r in rows) == len(all_pdf)
    # each tile's extent is inside its spatial band
    assert len(rows) >= 4


def test_file_level_prune(spark, tiled):
    out, _ = tiled
    man = copc_tindex(spark, out)
    # query window entirely inside the (0,0) tile band
    plan = plan_copc_tindex(man, bounds=(100.0, 100.0, 800.0, 800.0))
    assert plan["files_pruned"] >= 3
    assert len(plan["paths"]) >= 1
    # polygon prune: triangle inside the (1000,1000) tile
    wkt = "POLYGON((1100 1100, 1800 1100, 1400 1800, 1100 1100))"
    plan2 = plan_copc_tindex(man, polygon=wkt)
    assert plan2["files_pruned"] >= 3


def test_node_level_prune_within_surviving_file(spark, tiled):
    out, _ = tiled
    man = copc_tindex(spark, out)
    plan = plan_copc_tindex(man, bounds=(0.0, 0.0, 200.0, 200.0))
    assert len(plan["paths"]) == 1
    fp = plan["paths"][0]
    with open(fp, "rb") as fh:
        info = parse_copc_info(_read_plan_head(fh))
        full = copc_hierarchy(fh, info)
        sub = copc_hierarchy(fh, info,
                             bounds=(0.0, 0.0, 200.0, 200.0))
    # level 2: nodes skipped inside the surviving file
    assert len(sub["nodes"]) < len(full["nodes"])
    assert sub["pruned"] > 0


def test_two_level_read_equals_plain_filter(spark, tiled):
    out, all_pdf = tiled
    man = copc_tindex(spark, out)
    b = (500.0, 500.0, 1500.0, 1500.0)
    got = read_copc_tindex(spark, man, bounds=b).toPandas()
    want = all_pdf[(all_pdf.X >= b[0]) & (all_pdf.X <= b[2])
                   & (all_pdf.Y >= b[1]) & (all_pdf.Y <= b[3])]
    assert len(got) == len(want)
    assert got.Intensity.sum() == want.Intensity.sum()


def test_disjoint_query_returns_empty(spark, tiled):
    out, _ = tiled
    man = copc_tindex(spark, out)
    df = read_copc_tindex(spark, man,
                          bounds=(-9000.0, -9000.0, -8000.0, -8000.0))
    assert df.count() == 0
    assert {"X", "Y", "Z"} <= set(df.columns)
