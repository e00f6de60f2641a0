"""Physical-plan quality assertions (the 100 TB contract).

Correctness gates prove WHAT the operators compute; these tests pin
HOW Catalyst executes them — the properties that decide whether the
same plan survives a 1000-executor / 100 TB run:

- predicate pushdown reaches the parquet scan (PushedFilters);
- column pruning reaches the scan (ReadSchema);
- aggregations keep their map-side partial phase;
- the buffered splitter stays codegen-friendly (no interpreted
  higher-order lambda in the explode);
- kNN uses the cogrouped-kernel operator, not a pair-materializing
  join;
- small dimension sides broadcast instead of shuffling both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_range_filter_pushes_down_to_scan(spark):
    from pdal_spark.operators.rowops import range_filter

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = range_filter(li, ["l_quantity[10:20]"]).select("l_orderkey")
    plan = _formatted(df)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("\n")[0]


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # untouched wide column


def test_hexbin_has_partial_aggregation(spark):
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators import hexbin as ops_hexbin

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ops_h3.geocode(ev, "event_id")
    df = ops_hexbin.hexbin(pts, x="lon", y="lat", size=12.0,
                           threshold=2)
    plan = _plan(df)
    assert "partial_count" in plan  # map-side combine before shuffle


def test_splitter_buffered_no_interpreted_lambda(spark):
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.splitter import splitter

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ops_h3.geocode(ev, "event_id")
    df = splitter(pts, x="lon", y="lat", length=5.0,
                  origin_x=-180.0, origin_y=-85.0, buffer=0.5)
    plan = _plan(df)
    # array_compact would show as filter(...lambdafunction...)
    assert "lambdafunction" not in plan
    assert "Generate explode" in plan


def test_knn_is_cogrouped_kernel_not_pair_join(spark):
    from pdal_spark.operators import knn as ops_knn

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    from pdal_spark.operators import h3 as ops_h3

    pts = ops_h3.geocode(cust, "c_custkey").select(
        "c_custkey", "lat", "lon"
    )
    lf, rf = ops_knn._prep_supercell(
        pts, pts, "lon", "lat", "c_custkey", "c_custkey", 8.0, 16, []
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("src_id", T.LongType()),
        T.StructField("nb_id", T.LongType()),
        T.StructField("dist", T.DoubleType()),
        T.StructField("nn_rank", T.IntegerType()),
        T.StructField("settled", T.BooleanType()),
    ])
    kern = ops_knn._grid_knn_kernel(3, 8.0, 16, False, [])
    df = (
        lf.groupBy("jx", "jy").cogroup(rf.groupBy("jx", "jy"))
        .applyInPandas(kern, schema)
    )
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" in plan
    # no SortMergeJoin/row_number window materializing all pairs
    assert "SortMergeJoin" not in plan


def test_small_dim_side_broadcasts(spark):
    from pdal_spark.operators.splitter import salt_hot_tiles, tile_assign
    from pdal_spark.operators import h3 as ops_h3

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = tile_assign(
        ops_h3.geocode(ev, "event_id"), x="lon", y="lat", length=10.0,
        origin_x=-180.0, origin_y=-90.0,
    )
    salted = salt_hot_tiles(pts, hot_threshold=50, salt_buckets=4)
    plan = _plan(salted)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_salt_hot_tiles_spreads_hot_cells(spark):
    from pdal_spark.operators.splitter import salt_hot_tiles, tile_assign
    from pdal_spark.operators import h3 as ops_h3

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = tile_assign(
        ops_h3.geocode(ev, "event_id"), x="lon", y="lat", length=90.0,
        origin_x=-180.0, origin_y=-90.0,
    )
    salted = salt_hot_tiles(pts, hot_threshold=100, salt_buckets=8)
    hot = (
        salted.groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("tile_salt").alias("n_salts"),
        )
        .where(F.col("n") >= 100)
        .collect()
    )
    assert hot, "expected at least one hot tile at 90-degree tiling"
    for r in hot:
        assert r["n_salts"] > 1, "hot tile not spread over salts"
    # cold tiles keep salt 0 (no pointless fan-out)
    cold = (
        salted.groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("tile_salt").alias("n_salts"))
        .where(F.col("n") < 100)
        .collect()
    )
    for r in cold:
        assert r["n_salts"] == 1


def test_tile_write_hilbert_layout(spark, tmp_path):
    """tile_write(sort_key='hilbert') produces the same partitioned
    layout with rows Hilbert-ordered inside each tile file (tighter
    row-group min/max ranges; see the test_s2 clustering test)."""
    import pandas as pd

    from pdal_spark.operators.h3 import geocode
    from pdal_spark.operators.s2 import hilbert_encode
    from pdal_spark.operators.splitter import splitter, tile_write

    pts = geocode(spark.read.parquet(f"{SF}/events.parquet"), "event_id")
    tiled = splitter(pts, x="lon", y="lat", length=30.0,
                     origin_x=-180.0, origin_y=-90.0)
    out = str(tmp_path / "tiles_h")
    tile_write(tiled, out, sort_key="hilbert")
    back = spark.read.parquet(out)
    assert back.count() == tiled.count()
    assert "__mkey" not in back.columns and "tile_id" in back.columns
    # rows inside each parquet file follow hilbert order (parquet
    # scan preserves in-file row order for a single-file split)
    pdf = (
        hilbert_encode(
            back.withColumn("f", F.input_file_name()),
            res=16, out="hk")
        .select("f", "hk").toPandas()
    )
    for _, grp in pdf.groupby("f"):
        assert grp["hk"].is_monotonic_increasing
    assert pdf["f"].nunique() > 1  # actually multiple tile files


def test_temperature_resample_broadcasts_rates(spark):
    """The corpus scan must NOT shuffle: the per-domain rate table is
    broadcast back and the keep test is a predicate — the plan has a
    broadcast join and no sort-merge join."""
    from pdal_spark.operators.textops import temperature_resample

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pages = ev.select(
        F.col("event_id").alias("page_id"),
        F.concat(
            F.lit("https://s"), (F.col("event_id") % 16).cast("string"),
            F.lit(".com/p"), F.col("event_id").cast("string"),
        ).alias("url"),
    )
    df = temperature_resample(pages, id_col="page_id")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_winnow_scale_mode_has_no_window_sort(spark):
    """Scale-mode winnowing is row-local: no Window node, no per-doc
    Sort before its own distinct."""
    from pdal_spark.operators.dedup import winnow_fingerprints

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = winnow_fingerprints(docs, w=4)
    plan = _plan(df)
    assert "Window" not in plan


def test_blocklist_filter_broadcasts_blocklist(spark):
    from pdal_spark.operators.textops import blocklist_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    bl = spark.createDataFrame([("w1",), ("w2",)], "word string")
    df = blocklist_filter(docs, bl)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Tables bucketed on the join key join WITHOUT a shuffle — the
    pay-once co-location strategy for keys joined repeatedly."""
    from pdal_spark.plans.bucketing import colocated_join, write_bucketed

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    stats = docs.select("doc_id", F.length("text").alias("n_chars"))
    write_bucketed(docs, "bk_docs", "doc_id",
                   str(tmp_path / "bk_docs"), n_buckets=8)
    write_bucketed(stats, "bk_stats", "doc_id",
                   str(tmp_path / "bk_stats"), n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "bk_docs", "bk_stats", "doc_id")
        plan = _plan(j)
        assert "Exchange hashpartitioning" not in plan  # the point
        assert "SortMergeJoin" in plan
        assert j.count() == docs.count()
        # same join WITHOUT bucketing shuffles both sides
        plain = docs.join(stats, on="doc_id")
        assert "Exchange hashpartitioning" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_docs")
        spark.sql("DROP TABLE IF EXISTS bk_stats")


def test_weighted_sample_uses_takeordered(spark):
    """Bottom-k by key must be TakeOrderedAndProject (per-partition
    k-row heaps + a k-row driver merge) — never a global sort."""
    from pdal_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(weighted_sample(docs, 50, "n_chars"))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no full sort stage


def test_stratified_sample_uses_window_group_limit(spark):
    """rank<=k must push below the per-stratum sort: each task keeps
    a k-row heap per group instead of sorting whole strata."""
    from pdal_spark.operators.sampling import stratified_sample

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        stratified_sample(ev, 7, "event_type", id_col="event_id")
    )
    assert "WindowGroupLimit" in plan


def test_hdr_histogram_single_exchange_partial_agg(spark):
    """The sketch is one map-side-combined groupBy: exactly one
    exchange, with a partial_count before it."""
    from pdal_spark.operators.sketch import hdr_histogram

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.expr("cast(floor(o_totalprice) as bigint)").alias("v"))
    plan = _plan(hdr_histogram(orders, "v"))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan


def test_tfidf_topk_has_group_limit_and_no_cartesian(spark):
    """Top-k is a per-query WindowGroupLimit; the dot-product join
    must be a hash join on word, never a cartesian product."""
    from pdal_spark.operators.similarity import tfidf_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(tfidf_topk(docs, docs.where("doc_id % 10 = 0"), k=5))
    assert "WindowGroupLimit" in plan
    assert "Cartesian" not in plan


def test_segment_join_no_cartesian_product(spark):
    from pdal_spark.operators.transform import (
        segment_intersection_join,
    )

    a = spark.createDataFrame(
        [(1, 0, 0, 5, 5)], "a_id long, x1 long, y1 long,"
        " x2 long, y2 long",
    )
    b = spark.createDataFrame(
        [(2, 0, 5, 5, 0)], "b_id long, x1 long, y1 long,"
        " x2 long, y2 long",
    )
    plan = _plan(segment_intersection_join(a, b, cell=8))
    # candidates meet in a hash join on the cell key — the exact
    # predicate must NOT degrade the join to a cartesian/NL product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_sample_broadcasts_pool_and_group_limits(spark):
    from pdal_spark.operators.sampling import negative_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = negative_sample(
        emb.where("vec_id % 7 = 0"), emb.where("vec_id % 3 = 0"),
        k=5,
    )
    plan = _plan(out)
    # pool rides as a broadcast (anchors never shuffle for the join)
    assert "BroadcastNestedLoopJoin" in plan
    # per-anchor top-k collapses before the exchange
    assert "WindowGroupLimit" in plan


def test_line_dedup_counts_are_hash_agg_not_window(spark):
    from pdal_spark.operators.textops import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(line_dedup(docs, min_docs=3))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_luhn_is_pure_codegen_no_exchange_before_explode(spark):
    from pdal_spark.operators.textops import luhn_flags

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(luhn_flags(docs))
    # row-local: no shuffle anywhere in the plan
    assert "Exchange" not in plan


def test_knn_predict_no_cartesian(spark):
    from pdal_spark.operators.similarity import knn_predict

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(knn_predict(emb.where("vec_id < 10"), emb, k=3))
    assert "CartesianProduct" not in plan
