"""Batch-15 ops: getis_ord_gi, edit_distance_pairs."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import stats as ops_stats
from pdal_spark.sqlgen import qcell_pack


def _cells(spark, vals, res=4):
    rows = []
    for (ix, iy), x in vals.items():
        cell = int(eval(qcell_pack(str(ix), str(iy), res)))
        rows.append((cell, x))
    return spark.createDataFrame(rows, ["cell", "x"])


def test_getis_ord_flags_the_hot_block(spark):
    # flat field of 1s with a 2x2 block of 50s: block cells score
    # strongly positive, far-away cells negative-ish.
    vals = {(ix, iy): 1 for ix in range(4, 12) for iy in range(4, 12)}
    for ix, iy in [(6, 6), (6, 7), (7, 6), (7, 7)]:
        vals[(ix, iy)] = 50
    df = _cells(spark, vals)
    out = {
        r.cell: r.gi_z
        for r in ops_stats.getis_ord_gi(df, res=4).collect()
    }
    hot = int(eval(qcell_pack("6", "6", 4)))
    cold = int(eval(qcell_pack("10", "10", 4)))
    assert out[hot] > 2.0
    assert out[cold] < 0.0


def test_edit_distance_pairs_blocking_contract(spark):
    df = spark.createDataFrame(
        [
            (1, "spark engine"),
            (2, "spark enginz"),   # dist 1, same prefix -> pair
            (3, "spark en"),       # len diff 4 -> rejected cheaply
            (4, "quark engine"),   # prefix differs -> out of scope
            (5, "sparkly engin"),  # dist 3 > k -> dropped
        ],
        ["doc_id", "k"],
    )
    out = {(r.a, r.b): r.dist for r in
           ops_dedup.edit_distance_pairs(df, "k", k=2).collect()}
    assert out == {(1, 2): 1}
