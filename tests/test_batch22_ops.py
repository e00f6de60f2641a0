"""Batch-22 ops: ab_test, url_features, rich_club."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text


def test_ab_test_detects_lift(spark):
    rows = [("a", 1.0)] * 80 + [("a", 0.0)] * 20  # 80% convert
    rows += [("b", 1.0)] * 50 + [("b", 0.0)] * 50  # 50% convert
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = ops_stats.ab_test(df, "grp", "v > 0.5e0", "a", "b").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 80, 100, 50)
    assert r.z > 4.0  # decisive
    # all-converting degenerate -> NULL z
    allc = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 1.0)] * 5, ["grp", "v"]
    )
    r2 = ops_stats.ab_test(allc, "grp", "v > 0.5e0", "a", "b").collect()[0]
    assert r2.z is None


def test_url_features_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, "https://ex.com/"),
            (2, "https://ex.com/a/b/c?x=1&y=2"),
            (3, "http://Ex.com/page#top"),
        ],
        ["doc_id", "url"],
    )
    out = {r.doc_id: r for r in ops_text.url_features(df).collect()}
    assert out[1].is_homepage and out[1].path_depth == 0
    assert out[2].path_depth == 3 and out[2].n_query_params == 2
    assert not out[2].is_homepage
    assert out[3].host == "ex.com" and not out[3].is_https
    assert out[3].has_fragment


def test_rich_club_clique_core_vs_star(spark):
    # K4 among hubs 0-3, plus pendant leaves raising their degrees:
    # club(k=3) = {0,1,2,3}, fully connected -> phi = 1.
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(i, 10 + i) for i in range(4)]  # leaves
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = ops_graph.rich_club(df, k=3).collect()[0]
    assert r.n_club == 4 and r.e_club == 6
    assert r.phi_q == ops_graph.RC_Q
    # star: the hub has no peers above k -> club of 1 -> phi 0
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], ["src", "dst"]
    )
    r2 = ops_graph.rich_club(star, k=3).collect()[0]
    assert r2.n_club == 1 and r2.phi_q == 0
