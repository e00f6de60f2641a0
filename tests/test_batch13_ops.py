"""Batch-13 ops: hdr_quantile_by_group, harmonic_centrality,
benford_deviation."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import stats as ops_stats


def test_hdr_grouped_quantiles_within_error_bound(spark):
    rows = [("a", i) for i in range(1, 1001)]
    rows += [("b", i * 10) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        (r.g, r.q_num, r.q_den): r.est
        for r in ops_sketch.hdr_quantile_by_group(
            df, "g", "v", [(1, 2), (9, 10)]
        ).collect()
    }
    # 2^-3 relative error bound around the true quantiles
    assert abs(out[("a", 1, 2)] - 500) <= 500 * 0.125 + 1
    assert abs(out[("a", 9, 10)] - 900) <= 900 * 0.125 + 1
    assert abs(out[("b", 1, 2)] - 500) <= 500 * 0.125 + 1


def test_harmonic_centrality_star_vs_chain(spark):
    q = ops_graph.HC_Q
    # star: 4 nodes at level 1 -> hc = 4 * Q
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["src", "dst"]
    )
    r = ops_graph.harmonic_centrality(star, [0], max_depth=3).collect()[0]
    assert (r.n_reached, r.hc_q) == (4, 4 * q)
    # chain 0->1->2->3: levels 1,2,3 -> Q + Q//2 + Q//3
    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], ["src", "dst"]
    )
    r2 = ops_graph.harmonic_centrality(chain, [0], max_depth=3).collect()[0]
    assert r2.hc_q == q + q // 2 + q // 3


def test_benford_flags_uniform_data(spark):
    # 1..999 uniform: leading digits are uniform-ish, far from
    # Benford -> digit 1 observed well below expected.
    df = spark.createDataFrame([(float(i),) for i in range(1, 1000)],
                               ["value"])
    out = {r.digit: r for r in
           ops_stats.benford_deviation(df, "value", quant=1).collect()}
    assert set(out) == set(range(1, 10))
    assert sum(r.obs for r in out.values()) == 999
    # uniform: ~111 ones observed vs ~301 expected
    assert out[1].obs < out[1].expected * 0.5
    chi2 = sum(r.contrib for r in out.values())
    assert chi2 > 100  # decisively non-Benford

    # 2^k data is Benford-ish: chi2 per digit much smaller
    df2 = spark.createDataFrame(
        [(float(2 ** (k % 40)),) for k in range(400)], ["value"]
    )
    out2 = ops_stats.benford_deviation(df2, "value", quant=1).collect()
    chi2b = sum(r.contrib for r in out2)
    assert chi2b < chi2 / 10
