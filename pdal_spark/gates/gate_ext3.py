"""Gate registry extension 3 — expression-language sweep, candidate
classifier, geodesy, hexbin metadata, legacy assign. Imported from
gate_ext2 (end of chain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.functions.dimrange import compile_ranges
from pdal_spark.functions.expr import compile_expression
from pdal_spark.gate import (
    DK, _CPTS, _PTS, _cust_points, _points, _t, gate,
)
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import hexbin as ops_hexbin
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import rowops as ops_row
from pdal_spark.operators import stats as ops_stats

_ORD = "(l_orderkey * 10 + l_linenumber)"


# ===========================================================================
# expression language — full math-function sweep (MathParser.cpp:
# 182-241). Trig/log/exp differ in last ulps across libm builds, so
# every value is rounded(6) on BOTH sides; floor/ceil/abs/sqrt are
# IEEE-exact but ride along rounded for uniformity.
# ===========================================================================
_EXPRS = {
    "e_floor": "floor(l_quantity / 7)",
    "e_ceil": "ceil(l_discount * 100)",
    "e_abs": "abs(l_discount - 0.05)",
    "e_sqrt": "sqrt(l_quantity)",
    "e_sin": "sin(l_quantity / 10)",
    "e_cos": "cos(l_discount)",
    "e_atan": "atan(l_tax * 3)",
    "e_log": "log(l_quantity + 1)",
    "e_log10": "log10(l_extendedprice)",
    "e_exp": "exp(l_discount)",
    "e_tanh": "tanh(l_tax)",
}


def _expr_sweep_sql() -> str:
    cols = ", ".join(
        f"round({compile_expression(e, DK)}, 6) AS {name}"
        for name, e in _EXPRS.items()
    )
    return f"SELECT {_ORD} AS ord, {cols} FROM lineitem"


@gate("expression_functions", _expr_sweep_sql())
def q_expr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sel = [F.expr(_ORD).alias("ord")]
    for name, e in _EXPRS.items():
        sel.append(
            F.round(F.expr(compile_expression(e, G.SPARK)), 6)
            .alias(name)
        )
    return li.select(*sel)


# conditional expression with bool funcs + negation ranges
_NRANGES = ["l_quantity![20:30]"]  # negated DimRange


@gate(
    "range_negated",
    f"SELECT {_ORD} AS ord FROM lineitem"
    f" WHERE {compile_ranges(_NRANGES, DK)}",
)
def q_range_negated(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    return ops_row.range_filter(li, _NRANGES).select("ord")


# filters.assign legacy assignment syntax "Dim[lo:hi]=value"
@gate(
    "assign_range_legacy",
    f"""
    SELECT {_ORD} AS ord,
           CASE WHEN {compile_ranges(['l_discount[0.05:]'], DK)}
                THEN {G.fnum(0.99)} ELSE l_discount END AS l_discount
    FROM lineitem
    """,
)
def q_assign_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    out = ops_row.assign_range(li, ["l_discount[0.05:] = 0.99"])
    return out.select("ord", "l_discount")


# ===========================================================================
# filters.neighborclassifier CANDIDATE mode — kNN join against a
# SECOND dataset + domain restriction
# (NeighborClassifierFilter.cpp:142-200)
# ===========================================================================
_SLAT = G.geo_lat("s_suppkey")
_SLON = G.geo_lon("s_suppkey")
_SPTS2 = (
    f"(SELECT s_suppkey, {_SLAT} AS lat, {_SLON} AS lon,"
    f" s_nationkey % 5 AS cls FROM supplier)"
)
_KNN_D = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)


@gate(
    "neighbor_classifier_candidate",
    f"""
    WITH nn AS (
      SELECT src_id, nb_cls FROM (
        SELECT a.c_custkey AS src_id, b.cls AS nb_cls,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_KNN_D} ASC, b.s_suppkey ASC
               ) AS r
        FROM {_CPTS} a, {_SPTS2} b
      ) t WHERE r <= 3
    ), votes AS (
      SELECT src_id, nb_cls, count(*) AS v FROM nn GROUP BY 1, 2
    ), winner AS (
      SELECT src_id, nb_cls FROM (
        SELECT src_id, nb_cls, v, row_number() OVER (
          PARTITION BY src_id ORDER BY v DESC, nb_cls ASC
        ) AS r, sum(v) OVER (PARTITION BY src_id) AS tot
        FROM votes
      ) w WHERE r = 1 AND v * 2 > tot
    )
    SELECT c.c_custkey,
           CASE WHEN c.cls >= 0 AND c.cls <= 2
                     AND w.nb_cls IS NOT NULL AND w.nb_cls <> c.cls
                THEN w.nb_cls ELSE c.cls END AS cls
    FROM {_CPTS} c
    LEFT JOIN winner w ON w.src_id = c.c_custkey
    """,
)
def q_nc_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _cust_points(spark, sf_dir)
    supp = ops_h3.geocode(
        _t(spark, sf_dir, "supplier"), "s_suppkey"
    ).select(
        "s_suppkey", "lat", "lon",
        (F.col("s_nationkey") % 5).alias("cls"),
    )
    out = ops_knn.neighbor_classifier(
        cust, k=3, dimension="cls", candidate=supp,
        domain=["cls[0:2]"], x="lon", y="lat", id_col="c_custkey",
        cell=12.0, candidate_id="s_suppkey",
    )
    return out.select("c_custkey", "cls")


# ===========================================================================
# geodesy: haversine distance (the reprojection family's spherical
# core) — trig, rounded(3) metres on both sides
# ===========================================================================
@gate(
    "haversine_to_origin",
    f"""
    SELECT event_id,
           round({G.haversine_m('lat', 'lon', G.fnum(0.0), G.fnum(0.0))},
                 3) AS dist_m
    FROM {_PTS}
    """,
)
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    d = F.expr(
        G.haversine_m("`lat`", "`lon`", G.fnum(0.0), G.fnum(0.0))
    )
    return pts.select(
        "event_id", F.round(d, 3).alias("dist_m")
    )


# ===========================================================================
# cell centers (H3 cellToLatLng analog) + hexbin done() metadata
# ===========================================================================
@gate(
    "h3_cell_center",
    f"""
    SELECT event_id,
           {G.qcell_center_lat(G.qcell('lat', 'lon', 10), 10, DK)}
             AS cell_lat,
           {G.qcell_center_lon(G.qcell('lat', 'lon', 10), 10, DK)}
             AS cell_lon
    FROM {_PTS}
    """,
)
def q_cell_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    enc = ops_h3.h3_encode(pts, "lat", "lon", res=10)
    out = ops_h3.h3_center(enc, "h3_cell", 10)
    return out.select("event_id", "cell_lat", "cell_lon")


# hexbin metadata row (HexBinFilter done(): density summary)
@gate(
    "hexbin_summary",
    f"""
    SELECT cast(sum(cnt) as bigint) AS dense_points,
           count(*) AS dense_cells,
           round(avg(cnt), 9) AS avg_cnt
    FROM (
      SELECT count(*) AS cnt
      FROM (SELECT {G.qcell('lat', 'lon', 6)} AS cell FROM {_PTS}) c
      GROUP BY cell HAVING count(*) >= 3
    ) d
    """,
)
def q_hexbin_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = ops_hexbin.density_summary(
        pts, lat="lat", lon="lon", res=6, threshold=3
    )
    return out.select(
        F.col("dense_points").cast("long").alias("dense_points"),
        "dense_cells",
        F.round("avg_cnt", 9).alias("avg_cnt"),
    )


# filters.decimation with limit (DecimationFilter.cpp:94-103 —
# `limit` bounds the INPUT index, not the kept-row count)
@gate(
    "decimation_limit",
    f"""
    SELECT ord FROM (
      SELECT {_ORD} AS ord,
             row_number() OVER (ORDER BY {_ORD}) - 1 AS idx
      FROM lineitem
    ) t WHERE idx >= 2 AND (idx - 2) % 11 = 0 AND idx < 300
    """,
)
def q_decimation_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn("ord", F.expr(_ORD))
    out = ops_row.decimation(li, step=11, order="ord", offset=2,
                             limit=300)
    return out.select("ord")

# ===========================================================================
# filters.outlier method=statistical (OutlierFilter.cpp) — per-point
# mean kNN distance vs global mean + multiplier * stddev; all sums
# decimal-routed, stddev in the explicit sqrt((s2 - s1^2/n)/(n-1))
# form both engines compute identically
# ===========================================================================
_OS_K, _OS_MULT = 4, 1.0


@gate(
    "outlier_statistical",
    f"""
    WITH nn AS (
      SELECT src_id, dist FROM (
        SELECT a.c_custkey AS src_id, {_KNN_D} AS dist,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_KNN_D} ASC, b.c_custkey ASC
               ) AS r
        FROM {_CPTS} a, {_CPTS} b WHERE a.c_custkey <> b.c_custkey
      ) t WHERE r <= {_OS_K}
    ),
    per AS (
      SELECT src_id,
             cast(sum(cast(dist as decimal(38,15))) as double)
               / count(*) AS md
      FROM nn GROUP BY 1
    ),
    g AS (
      SELECT count(*) AS n,
             cast(sum(cast(md as decimal(38,15))) as double) AS s1,
             cast(sum(cast(md * md as decimal(38,15))) as double)
               AS s2
      FROM per
    )
    SELECT c.c_custkey,
           CASE WHEN p.md > (g.s1 / g.n) + {G.fnum(_OS_MULT)}
                  * sqrt((g.s2 - g.s1 * g.s1 / g.n) / (g.n - 1))
                THEN 7 ELSE c.cls END AS cls
    FROM {_CPTS} c
    LEFT JOIN per p ON p.src_id = c.c_custkey
    CROSS JOIN g
    """,
)
def q_outlier_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_knn.outlier_statistical(
        pts, mean_k=_OS_K, multiplier=_OS_MULT, x="lon", y="lat",
        id_col="c_custkey", cell=8.0, cls="cls",
    )
    return out.select("c_custkey", "cls")


# filters.stats `enumerate` option (StatsFilter.cpp:198-220) —
# distinct values of the dimension, exploded to rows (arrays don't
# hash-compare); runs the REAL stats() enumerate path
@gate(
    "stats_enumerate",
    """
    SELECT 'l_linenumber' AS dimension, cnt, minimum, maximum, value
    FROM (
      SELECT count(l_linenumber) AS cnt,
             min(l_linenumber) * 1.0 AS minimum,
             max(l_linenumber) * 1.0 AS maximum
      FROM lineitem
    ) s, (SELECT DISTINCT l_linenumber * 1.0 AS value
          FROM lineitem) v
    """,
)
def q_stats_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = ops_stats.stats(
        li, ["l_linenumber"], enumerate_dims=["l_linenumber"]
    )
    return out.select(
        "dimension", "cnt", "minimum", "maximum",
        F.explode("values").alias("value"),
    ).withColumn("value", F.col("value").cast("double"))




# ===========================================================================
# webtext quality scoring + BPE-ish token counting (training-data
# pipeline heuristics; engine ops in operators/textops.py)
# ===========================================================================
from pdal_spark.operators import textops as ops_text  # noqa: E402


def _quality_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in ops_text.STOPWORDS)
    return f"""
    SELECT doc_id, length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           cast(length(text) - length(regexp_replace(text,
                '[^A-Za-z0-9 ]', '', 'g')) as double)
             / cast(length(text) as double) AS punct_ratio,
           cast(length(text) - length(regexp_replace(text,
                '[0-9]', '', 'g')) as double)
             / cast(length(text) as double) AS digit_ratio,
           cast(len(list_intersect(string_split(text, ' '),
                [{stops}])) as double)
             / cast(len(string_split(text, ' ')) as double)
             AS stopword_ratio
    FROM documents
    """


@gate("quality_score", _quality_sql())
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.quality_score(docs)


@gate(
    "bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{ops_text.BPE_REGEX}'))
             AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(text,
               '{ops_text.BPE_REGEX}'))) AS n_bpe_distinct
    FROM documents
    """,
)
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.bpe_token_count(docs)


# filters.icp — iterative registration (rows-only: driver-loop
# algorithm, not SQL-expressible; precision pinned by
# test_icp_recovers_transform)
@gate("icp_register", None)
def q_icp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.register import icp

    cust = _cust_points(spark, sf_dir).select("c_custkey", "lat", "lon")
    # register a slightly shifted copy of the cloud back onto itself
    moved = cust.select(
        "c_custkey",
        (F.col("lat") + 0.25).alias("lat"),
        (F.col("lon") - 0.25).alias("lon"),
    )
    out, _meta = icp(
        moved, cust, x="lon", y="lat", id_moving="c_custkey",
        id_fixed="c_custkey", cell=8.0, max_iters=10,
    )
    return out


# ===========================================================================
# filters.crop with MULTIPLE polygons — one output view per geometry
# (CropFilter.cpp:235-262 run loop); points inside several polygons
# appear once per geom_id
# ===========================================================================
_PENTA2 = [(-40.0, -20.0), (30.0, -35.0), (55.0, 10.0), (5.0, 40.0),
           (-45.0, 15.0)]
_QUAD = [(-10.0, -30.0), (40.0, -30.0), (40.0, 25.0), (-10.0, 25.0)]


def _poly_wkt(poly) -> str:
    return ("POLYGON((" + ", ".join(f"{x} {y}" for x, y in
                                    poly + [poly[0]]) + "))")


@gate(
    "crop_multi_polygon",
    f"""
    SELECT event_id, 0 AS geom_id FROM {_PTS}
    WHERE {G.convex_pip('lon', 'lat', _PENTA2)}
    UNION ALL
    SELECT event_id, 1 AS geom_id FROM {_PTS}
    WHERE {G.convex_pip('lon', 'lat', _QUAD)}
    """,
)
def q_crop_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.crop import crop_polygons

    pts = _points(spark, sf_dir)
    out = crop_polygons(
        pts, [(0, _poly_wkt(_PENTA2)), (1, _poly_wkt(_QUAD))],
        x="lon", y="lat",
    )
    return out.select("event_id", "geom_id")


# ===========================================================================
# universal stage `where` / `where_merge` through the JSON pipeline
# compiler (pdal/Stage.cpp:61-76 splitView)
# ===========================================================================
@gate(
    "pipeline_where_merge",
    f"""
    SELECT event_id,
           CASE WHEN value > {G.fnum(0.5)}
                THEN value * {G.fnum(10.0)} ELSE value END AS value
    FROM events
    """,
)
def q_pipeline_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.plans import Pipeline

    p = Pipeline([
        {"type": "readers.parquet",
         "filename": f"{sf_dir}/events.parquet"},
        {"type": "filters.assign", "value": "value = value * 10",
         "where": "value > 0.5"},
    ])
    return p.execute(spark).select("event_id", "value")


# ===========================================================================
# readers.faux ramp mode — the synthetic source itself against a
# range()-generated oracle (io/FauxReader.cpp:213-230)
# ===========================================================================
@gate(
    "faux_ramp_source",
    f"""
    SELECT range AS pid,
           {G.fnum(0.0)} + ({G.fnum(2.0)} * range / 999) AS x,
           {G.fnum(-5.0)} + ({G.fnum(10.0)} * range / 999) AS y,
           {G.fnum(100.0)} + ({G.fnum(-100.0)} * range / 999) AS z
    FROM range(0, 1000)
    """,
)
def q_faux_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.sources.faux import faux_reader

    return faux_reader(
        spark, 1000, "ramp",
        ([0.0, -5.0, 100.0], [2.0, 5.0, 0.0]),
    )
