"""wasserstein_1d: known shifts and the KS-vs-W1 contrast;
conductance: hand-computed values on a bridged two-clique graph."""

import itertools

from pyspark.sql import Row

from pdal_spark.operators.graph import conductance
from pdal_spark.operators.stats import ks_test, wasserstein_1d


def _vals(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], ["v"])


def test_w1_constant_shift_exact(spark):
    a = _vals(spark, range(0, 100))
    b = _vals(spark, range(7, 107))  # shift by exactly 7
    r = wasserstein_1d(a, b, "v").collect()[0]
    assert r.w1 == 7.0 and r.n_a == r.n_b == 100


def test_w1_identical_zero_and_magnitude_vs_ks(spark):
    a = _vals(spark, [1, 2, 3, 4, 5] * 10)
    assert wasserstein_1d(a, a, "v").collect()[0].w1 == 0.0
    # small shift of everything: KS is LARGE (every CDF step off by
    # one unit of mass) but W1 stays small — the contrast the op
    # exists to expose
    b = _vals(spark, [v + 1 for v in [1, 2, 3, 4, 5] * 10])
    w1 = wasserstein_1d(a, b, "v").collect()[0]
    ks = ks_test(a, b, "v").collect()[0]
    assert w1.w1 == 1.0
    assert ks.d_num / (ks.n_a * ks.n_b) == 0.2  # per-step gap


def test_conductance_two_cliques_with_bridge(spark):
    pairs = list(itertools.combinations(range(4), 2)) \
        + list(itertools.combinations(range(4, 8), 2)) + [(0, 4)]
    e = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )
    assign = spark.createDataFrame(
        [Row(node=n, community=0 if n < 4 else 1)
         for n in range(8)]
    )
    out = {r.community: r for r in conductance(e, assign).collect()}
    # each clique: vol = 13 (12 internal degree + 1 bridge end),
    # cut = 1, m = 13 -> phi = 1/13
    for c in (0, 1):
        assert out[c].vol == 13 and out[c].cut == 1
        assert abs(out[c].phi - 1 / 13) < 1e-12
    # everything in one community: cut 0, phi NULL (complement 0)
    one = spark.createDataFrame(
        [Row(node=n, community=0) for n in range(8)]
    )
    r = conductance(e, one).collect()[0]
    assert r.cut == 0 and r.phi is None
