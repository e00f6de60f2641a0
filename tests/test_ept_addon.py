"""writers.ept_addon / readers.ept `addons` analog, validated on
the reference's own EPT fixture (lone-star-laszip): write a derived
dimension as an addon, re-read it through the `addons` option, and
get exactly the values back — per node, in node point order, with
unfilled points zeroed like the reference's pre-zeroed buffers
(EptAddonWriter.cpp:198-206). Metadata format pinned to
EptAddonWriter.cpp:264-270.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.sources.ept import (
    read_ept,
    read_ept_addon_info,
    write_ept_addon,
)

_REF = "/root/reference/test/data"
_LS = f"{_REF}/ept/lone-star-laszip"
_SMALL = f"{_REF}/ept/1.2-with-color"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


@needs_ref
def test_point_id_coordinates(spark):
    df = read_ept(spark, _SMALL, with_point_id=True)
    pdf = df.toPandas()
    assert {"node_key", "point_id"} <= set(pdf.columns)
    # point_id is 0..n-1 within each node
    for key, grp in pdf.groupby("node_key"):
        assert sorted(grp.point_id) == list(range(len(grp)))


@needs_ref
def test_addon_round_trip(spark, tmp_path):
    addon = str(tmp_path / "heightclass")
    src = read_ept(spark, _SMALL, with_point_id=True)
    # a derived dimension: quantized height band
    derived = src.withColumn(
        "HeightBand", (F.col("Z") * 10).cast("long"))
    nodes = write_ept_addon(derived, _SMALL, addon, "HeightBand")
    assert nodes >= 1
    # metadata format (EptAddonWriter.cpp:264-270)
    meta = json.loads(
        open(os.path.join(addon, "ept-addon.json")).read())
    assert meta == {"type": "signed", "size": 8,
                    "version": "1.0.0", "dataType": "binary"}
    assert read_ept_addon_info(addon)["size"] == 8

    back = read_ept(spark, _SMALL, with_point_id=True,
                    addons={"HeightBand": addon})
    joined = back.withColumn(
        "want", (F.col("Z") * 10).cast("long"))
    assert joined.filter(
        F.col("HeightBand") != F.col("want")).count() == 0


@needs_ref
def test_addon_unfilled_points_are_zero(spark, tmp_path):
    addon = str(tmp_path / "flag")
    src = read_ept(spark, _SMALL, with_point_id=True)
    # only mark a subset: everything else must read back 0
    marked = src.filter(F.col("Intensity") > 100) \
        .withColumn("Marked", F.lit(7).cast("long"))
    write_ept_addon(marked, _SMALL, addon, "Marked")
    back = read_ept(spark, _SMALL,
                    addons={"Marked": addon}).toPandas()
    assert set(back.loc[back.Intensity > 100, "Marked"]) == {7}
    assert set(back.loc[back.Intensity <= 100, "Marked"]) == {0}


@needs_ref
def test_addon_requires_tree_coordinates(spark, tmp_path):
    src = read_ept(spark, _SMALL)  # no node_key/point_id
    with pytest.raises(ValueError, match="with_point_id"):
        write_ept_addon(src.withColumn("V", F.lit(1)),
                        _SMALL, str(tmp_path / "x"), "V")


@needs_ref
def test_addon_float_type_inference(spark, tmp_path):
    addon = str(tmp_path / "zn")
    src = read_ept(spark, _SMALL, with_point_id=True)
    write_ept_addon(src.withColumn("Zn", F.col("Z") * 0.5),
                    _SMALL, addon, "Zn")
    meta = read_ept_addon_info(addon)
    assert meta["type"] == "float" and meta["size"] == 8
    back = read_ept(spark, _SMALL, addons={"Zn": addon})
    assert back.filter(
        F.abs(F.col("Zn") - F.col("Z") * 0.5) > 1e-9).count() == 0
