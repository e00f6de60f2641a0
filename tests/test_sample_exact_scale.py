"""filters.sample exact-at-scale guarantees (r4 VERDICT ask #8):
the dependency-depth fixpoint `sample_poisson_exact` must be
(a) point-for-point equal to the serial view-order greedy (the
reference SampleFilter.cpp semantics), and (b) INVARIANT to input
partitioning — points near Spark partition boundaries decide
identically whatever the physical layout, the analog of splitter's
boundary-buffer test. (a) pins semantics, (b) pins that no
cross-partition dependency is lost, because the neighbor-pair list
is built from a cell-grid join over the WHOLE dataset, not per
partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdal_spark.operators.sampling import sample_poisson_exact


def _serial_greedy(pdf: pd.DataFrame, radius: float) -> set:
    """Reference semantics: scan in order, keep iff no kept point
    within radius."""
    kept = []
    kept_ids = set()
    r2 = radius * radius
    for row in pdf.sort_values("pid").itertuples(index=False):
        ok = True
        for kx, ky in kept:
            if (row.lon - kx) ** 2 + (row.lat - ky) ** 2 < r2:
                ok = False
                break
        if ok:
            kept.append((row.lon, row.lat))
            kept_ids.add(row.pid)
    return kept_ids


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(17)
    n = 1200
    return pd.DataFrame({
        "pid": np.arange(n, dtype="int64"),
        "lon": rng.uniform(0, 30, n),
        "lat": rng.uniform(0, 30, n),
    })


def test_exact_equals_serial_greedy(spark, cloud):
    want = _serial_greedy(cloud, 1.2)
    got = sample_poisson_exact(
        spark.createDataFrame(cloud), 1.2).toPandas()
    assert set(got.pid) == want


def test_partitioning_invariance(spark, cloud):
    """The boundary-buffer property: results identical under 1, 3,
    16 partitions and under a spatially-sorted layout (partition
    boundaries cut through radius-neighborhoods)."""
    base = None
    df0 = spark.createDataFrame(cloud)
    for layout in (df0.coalesce(1),
                   df0.repartition(3),
                   df0.repartition(16),
                   df0.repartitionByRange(8, "lon")):
        ids = set(sample_poisson_exact(layout, 1.2)
                  .toPandas().pid)
        if base is None:
            base = ids
        else:
            assert ids == base


def test_dense_chain_still_exact(spark):
    """Worst case for the round bound: a single radius-connected
    run in scan order (the documented degenerate chain). Small n so
    the O(n)-round behavior stays cheap; equality must still hold."""
    n = 60
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype="int64"),
        "lon": np.arange(n) * 0.6,   # spacing < radius: every
        "lat": np.zeros(n),          # point depends on the previous
    })
    want = _serial_greedy(pdf, 1.0)
    got = sample_poisson_exact(
        spark.createDataFrame(pdf).repartition(7), 1.0,
        max_rounds=200).toPandas()
    assert set(got.pid) == want
    # the serial answer for this layout is every other point
    assert set(got.pid) == set(range(0, n, 2))
