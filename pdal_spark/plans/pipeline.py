"""JSON pipeline -> DataFrame plan compiler (the `pdal pipeline` API).

Mirrors the reference's pipeline lifecycle (SURVEY.md §3):

- parse: a JSON array of stages; plain strings are filenames; stage
  kind inferred (first/non-last = reader, last = writer, else filter)
  exactly like PipelineReaderJSON.cpp:66-160; `tag`/`inputs` wire a
  general DAG (diamonds allowed, multi-input merge).
- validate (= prepare, Stage::prepare at pdal/Stage.cpp:165-203):
  builds the lazy DataFrame plan and resolves the schema WITHOUT
  running a job — Spark's analysis phase is PDAL's layout
  finalization.
- execute (= Stage::execute / Streamable::execute): runs the plan.
  Catalyst pipelines the stages better than either PDAL mode; there
  is deliberately no stream/standard switch (SURVEY.md §2.10).

Every stage supports the universal `where` option (pdal/Stage.cpp:
61-76 splitView): rows failing the predicate bypass the stage, and
`where_merge` ("true"|"false", default true) controls whether they
are merged back into the output — expressed as
transformed.unionByName(complement).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.functions.expr import compile_expression
from pdal_spark.sqlgen import SPARK


class PipelineError(ValueError):
    pass


# ---------------------------------------------------------------------------
# stage adapters: (spark, df_inputs, options) -> DataFrame
# readers take no inputs; writers return their input (pass-through,
# side effect = the write), like PDAL writers forwarding views.
# ---------------------------------------------------------------------------


def _one(dfs: list[DataFrame], typ: str) -> DataFrame:
    if len(dfs) != 1:
        raise PipelineError(
            f"{typ} expects exactly one input, got {len(dfs)}"
        )
    return dfs[0]


def _floats(v) -> list[float]:
    if isinstance(v, str):
        return [float(t) for t in v.replace("(", "").replace(")", "")
                .split(",")]
    return [float(t) for t in v]


def _listify(v) -> list:
    return v if isinstance(v, list) else [v]


def _r_parquet(spark, _dfs, o):
    df = spark.read.parquet(o["filename"])
    if "count" in o:  # Reader `count` option (pdal/Reader.cpp)
        df = df.limit(int(o["count"]))
    return df


def _r_text(spark, _dfs, o):
    from pdal_spark.sources.text import read_text

    return read_text(
        spark, o["filename"],
        separator=o.get("separator", ","),
        skip=int(o.get("skip", 0)),
        count=int(o["count"]) if "count" in o else None,
    )


def _r_faux(spark, _dfs, o):
    from pdal_spark.sources.faux import faux_reader

    return faux_reader(
        spark,
        count=int(o.get("count", 1000)),
        mode=o.get("mode", "ramp"),
        bounds=o.get("bounds"),
        seed=int(o.get("seed", 42)),
    )


def _r_pages(spark, _dfs, o):
    from pdal_spark.sources.pages import read_pages

    return read_pages(
        spark, o["table"] if "table" in o else o["filename"],
        count=int(o["count"]) if "count" in o else None,
        geocode=o.get("geocode", True),
    )


def _f_range(_s, dfs, o):
    from pdal_spark.operators.rowops import range_filter

    limits = o["limits"]
    specs = limits if isinstance(limits, list) else [
        t for t in limits.split(",") if t
    ]
    return range_filter(_one(dfs, "filters.range"), specs)


def _f_expression(_s, dfs, o):
    from pdal_spark.operators.rowops import expression_filter

    return expression_filter(_one(dfs, "filters.expression"),
                             o["expression"])


def _f_assign(_s, dfs, o):
    from pdal_spark.operators.rowops import assign

    return assign(_one(dfs, "filters.assign"), _listify(o["value"]))


def _f_ferry(_s, dfs, o):
    from pdal_spark.operators.rowops import ferry

    dims = o["dimensions"]
    specs = dims if isinstance(dims, list) else [
        t.strip() for t in dims.split(",")
    ]
    return ferry(_one(dfs, "filters.ferry"), specs)


def _f_crop(_s, dfs, o):
    from pdal_spark.operators import crop as C

    df = _one(dfs, "filters.crop")
    outside = str(o.get("outside", "false")).lower() == "true"
    x, y = o.get("x", "lon"), o.get("y", "lat")
    if "polygon" in o:
        return C.crop_polygons(
            df, _listify(o["polygon"]), x=x, y=y, outside=outside
        )
    if "point" in o:
        ctr = _floats(o["point"].replace("POINT", "")
                      if isinstance(o["point"], str) else o["point"])
        dims = tuple(_listify(o.get("dims", [x, y][: len(ctr)])))
        return C.crop_circle(df, tuple(ctr), float(o["distance"]),
                             dims=dims, outside=outside)
    if "bounds" in o:
        b = o["bounds"]
        if isinstance(b, str):
            # PDAL box syntax ([xmin, xmax], [ymin, ymax])
            parts = [p for p in b.replace("[", " ").replace("]", " ")
                     .replace("(", " ").replace(")", " ").split(",")]
            vals = [float(p) for p in parts if p.strip()]
            b = {x: (vals[0], vals[1]), y: (vals[2], vals[3])}
            if len(vals) >= 6:
                b["z"] = (vals[4], vals[5])
        return C.crop_bbox(df, {k: tuple(v) for k, v in b.items()},
                           outside=outside)
    raise PipelineError("filters.crop needs bounds, polygon or point")


def _f_geocode(_s, dfs, o):
    from pdal_spark.operators.h3 import geocode, geocode_url

    df = _one(dfs, "filters.geocode")
    col = o.get("column", "url")
    if dict(df.dtypes)[col] == "string":
        return geocode_url(df, col)
    return geocode(df, col)


def _f_h3(_s, dfs, o):
    from pdal_spark.operators.h3 import h3_encode

    return h3_encode(
        _one(dfs, "filters.h3"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        res=int(o.get("resolution", 12)),
    )


def _f_s2(_s, dfs, o):
    from pdal_spark.operators.s2 import s2_encode

    return s2_encode(
        _one(dfs, "filters.s2"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        level=int(o.get("level", 10)),
    )


def _f_hilbert(_s, dfs, o):
    from pdal_spark.operators.s2 import hilbert_encode

    return hilbert_encode(
        _one(dfs, "filters.hilbert"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        res=int(o.get("resolution", 16)),
    )


def _f_hexbin(_s, dfs, o):
    from pdal_spark.operators import hexbin as H

    df = _one(dfs, "filters.hexbin")
    if str(o.get("h3_grid", "false")).lower() == "true":
        return H.h3bin(
            df, lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
            res=int(o.get("h3_resolution", 7)),
            threshold=int(o.get("density", 1)),
        )
    return H.hexbin(
        df, x=o.get("x", "lon"), y=o.get("y", "lat"),
        size=float(o["edge_length"]),
        threshold=int(o.get("density", 1)),
    )


def _f_splitter(_s, dfs, o):
    from pdal_spark.operators.splitter import splitter

    return splitter(
        _one(dfs, "filters.splitter"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        length=float(o.get("length", 1000.0)),
        origin_x=float(o["origin_x"]), origin_y=float(o["origin_y"]),
        buffer=float(o.get("buffer", 0.0)),
    )


def _f_sort(_s, dfs, o):
    from pdal_spark.operators.rowops import sort

    dims = _listify(o["dimension"])
    parsed = []
    for d in dims:
        name, _, ordr = d.partition(" ")
        parsed.append((name, ordr.strip() or "ASC"))
    return sort(_one(dfs, "filters.sort"), parsed)


def _f_head(_s, dfs, o):
    from pdal_spark.operators.rowops import head

    return head(_one(dfs, "filters.head"), int(o.get("count", 10)),
                order=o["order"],
                invert=str(o.get("invert", "false")).lower() == "true")


def _f_tail(_s, dfs, o):
    from pdal_spark.operators.rowops import tail

    return tail(_one(dfs, "filters.tail"), int(o.get("count", 10)),
                order=o["order"],
                invert=str(o.get("invert", "false")).lower() == "true")


def _f_decimation(_s, dfs, o):
    from pdal_spark.operators.rowops import decimation

    return decimation(
        _one(dfs, "filters.decimation"), step=int(o.get("step", 1)),
        order=o["order"], offset=int(o.get("offset", 0)),
        limit=int(o["limit"]) if "limit" in o else None,
    )


def _f_locate(_s, dfs, o):
    from pdal_spark.operators.rowops import locate

    return locate(_one(dfs, "filters.locate"), o["dimension"],
                  o.get("minmax", "max"))


def _f_randomize(_s, dfs, o):
    from pdal_spark.operators.rowops import randomize

    return randomize(_one(dfs, "filters.randomize"),
                     seed=int(o.get("seed", 42)))


def _f_groupby(_s, dfs, o):
    from pdal_spark.operators.rowops import groupby_views

    return groupby_views(_one(dfs, "filters.groupby"), o["dimension"])


def _f_divider(_s, dfs, o):
    from pdal_spark.operators.rowops import divider, divider_expression

    df = _one(dfs, "filters.divider")
    if o.get("mode") == "expression":
        return divider_expression(
            df, o["expression"], capacity=int(o["capacity"]),
            order=o["order"],
        )
    return divider(
        df,
        count=int(o["count"]) if "count" in o else None,
        capacity=int(o["capacity"]) if "capacity" in o else None,
        order=o["order"], mode=o.get("mode", "partition"),
    )


def _f_merge(_s, dfs, _o):
    from pdal_spark.operators.rowops import merge

    return merge(dfs)


def _f_stats(_s, dfs, o):
    from pdal_spark.operators.stats import stats

    dims = o["dimension"] if isinstance(o.get("dimension"), list) else [
        t.strip() for t in o.get("dimension", "").split(",") if t.strip()
    ]
    return stats(
        _one(dfs, "filters.stats"), dims,
        advanced=str(o.get("advanced", "false")).lower() == "true",
        enumerate_dims=_listify(o["enumerate"]) if "enumerate" in o
        else None,
    )


def _f_voxeldownsize(_s, dfs, o):
    from pdal_spark.operators.voxel import voxel_downsize

    return voxel_downsize(
        _one(dfs, "filters.voxeldownsize"), cell=float(o["cell"]),
        dims=tuple(_listify(o.get("dims", ["lon", "lat"]))),
        order=o["order"], origin=tuple(_floats(o["origin"])),
        mode=o.get("mode", "first"),
    )


def _f_label_duplicates(_s, dfs, o):
    from pdal_spark.operators.rowops import label_duplicates

    return label_duplicates(
        _one(dfs, "filters.label_duplicates"),
        _listify(o["dimensions"]), order=o["order"],
    )


def _f_mortonorder(_s, dfs, o):
    from pdal_spark.operators.rowops import morton_order

    return morton_order(
        _one(dfs, "filters.mortonorder"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


def _f_neighborclassifier(_s, dfs, o):
    from pdal_spark.operators.knn import neighbor_classifier

    return neighbor_classifier(
        _one(dfs, "filters.neighborclassifier"), k=int(o["k"]),
        dimension=o.get("dimension", "classification"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o["id"], cell=float(o.get("cell", 1.0)),
        domain=_listify(o["domain"]) if "domain" in o else None,
    )


def _f_outlier(_s, dfs, o):
    from pdal_spark.operators.knn import (outlier_radius,
                                          outlier_statistical)

    df = _one(dfs, "filters.outlier")
    if o.get("method", "statistical") == "radius":
        return outlier_radius(
            df, radius=float(o.get("radius", 1.0)),
            min_k=int(o.get("min_k", 2)),
            x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
            cls=o.get("dimension", "classification"),
        )
    return outlier_statistical(
        df, mean_k=int(o.get("mean_k", 8)),
        multiplier=float(o.get("multiplier", 2.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
        cell=float(o.get("cell", 1.0)),
        cls=o.get("dimension", "classification"),
    )


def _f_cluster(_s, dfs, o):
    from pdal_spark.operators.cluster import cluster_euclidean

    return cluster_euclidean(
        _one(dfs, "filters.cluster"),
        tolerance=float(o.get("tolerance", 1.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
        min_points=int(o.get("min_points", 1)),
        max_points=int(o["max_points"]) if "max_points" in o else None,
    )


def _w_parquet(_s, dfs, o):
    df = _one(dfs, "writers.parquet")
    w = df.write.mode(o.get("mode", "overwrite"))
    if "partition_by" in o:
        w = w.partitionBy(*_listify(o["partition_by"]))
    w.parquet(o["filename"])
    return df


def _w_text(_s, dfs, o):
    df = _one(dfs, "writers.text")
    df.write.mode(o.get("mode", "overwrite")).option(
        "header", "true"
    ).csv(o["filename"])
    return df


def _w_null(_s, dfs, _o):
    df = _one(dfs, "writers.null")
    df.write.format("noop").mode("overwrite").save()
    return df


def _w_gdal(_s, dfs, o):
    from pdal_spark.operators.raster import rasterize

    df = _one(dfs, "writers.gdal")
    cells = rasterize(
        df, resolution=float(o["resolution"]),
        origin_x=float(o["origin_x"]), origin_y=float(o["origin_y"]),
        width=int(o["width"]), height=int(o["height"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"), z=o.get("z", "value"),
        radius=float(o["radius"]) if "radius" in o else None,
    )
    if "filename" in o:
        cells.write.mode(o.get("mode", "overwrite")).parquet(
            o["filename"]
        )
    return cells


REGISTRY: dict[str, Callable] = {
    "readers.parquet": _r_parquet,
    "readers.arrow": _r_parquet,
    "readers.text": _r_text,
    "readers.faux": _r_faux,
    "readers.pages": _r_pages,
    "filters.geocode": _f_geocode,
    "filters.range": _f_range,
    "filters.expression": _f_expression,
    "filters.assign": _f_assign,
    "filters.ferry": _f_ferry,
    "filters.crop": _f_crop,
    "filters.h3": _f_h3,
    "filters.s2": _f_s2,
    "filters.hilbert": _f_hilbert,
    "filters.hexbin": _f_hexbin,
    "filters.splitter": _f_splitter,
    "filters.sort": _f_sort,
    "filters.head": _f_head,
    "filters.tail": _f_tail,
    "filters.decimation": _f_decimation,
    "filters.locate": _f_locate,
    "filters.randomize": _f_randomize,
    "filters.groupby": _f_groupby,
    "filters.divider": _f_divider,
    "filters.merge": _f_merge,
    "filters.stats": _f_stats,
    "filters.voxeldownsize": _f_voxeldownsize,
    "filters.label_duplicates": _f_label_duplicates,
    "filters.mortonorder": _f_mortonorder,
    "filters.neighborclassifier": _f_neighborclassifier,
    "filters.outlier": _f_outlier,
    "filters.cluster": _f_cluster,
    "writers.parquet": _w_parquet,
    "writers.arrow": _w_parquet,
    "writers.text": _w_text,
    "writers.null": _w_null,
    "writers.gdal": _w_gdal,
}


def _f_sample(_s, dfs, o):
    from pdal_spark.operators.sampling import (
        sample_poisson,
        sample_poisson_exact,
    )

    df = _one(dfs, "filters.sample")
    kw = dict(
        radius=float(o["radius"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o["id"], order=o.get("order"),
    )
    # exact=true: the reference's serial view-order semantics via the
    # dependency-depth fixpoint; default: the scalable 4-color greedy
    if str(o.get("exact", "false")).lower() == "true":
        return sample_poisson_exact(df, **kw)
    return sample_poisson(df, **kw)


def _f_relaxationdart(_s, dfs, o):
    from pdal_spark.operators.sampling import relaxation_dart_throwing

    return relaxation_dart_throwing(
        _one(dfs, "filters.relaxationdartthrowing"),
        count=int(o["count"]), radius=float(o.get("radius", 1.0)),
        decay=float(o.get("decay", 0.9)),
        terminal_radius=float(o.get("terminal_radius", 0.001)),
        x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
    )


def _f_sparsesurface(_s, dfs, o):
    from pdal_spark.operators.ground import sparse_surface

    return sparse_surface(
        _one(dfs, "filters.sparsesurface"),
        radius=float(o.get("radius", 1.0)),
        ground_class=int(o.get("ground_class", 2)),
        low_point_class=int(o.get("low_point_class", 7)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), id_col=o["id"],
    )


def _f_griddecimation(_s, dfs, o):
    from pdal_spark.operators.voxel import grid_decimation

    return grid_decimation(
        _one(dfs, "filters.griddecimation"),
        resolution=float(o["resolution"]),
        output_type=o.get("output_type", "max"),
        assign_col=o.get("assign_col", "classification"),
        assign_value=int(o.get("assign_value", 2)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), order=o["id"],
    )


REGISTRY.update({
    "filters.sample": _f_sample,
    "filters.relaxationdartthrowing": _f_relaxationdart,
    "filters.sparsesurface": _f_sparsesurface,
    "filters.griddecimation": _f_griddecimation,
})


# -- curation stages (webtext layer as JSON pipeline filters) -------------
def _f_normalize(_s, dfs, o):
    from pdal_spark.operators.textops import normalize_text

    return normalize_text(
        _one(dfs, "filters.normalize"),
        text=o.get("column", "text"),
        out=o.get("out", "norm_text"), append=True,
    )


def _f_redact(_s, dfs, o):
    from pdal_spark.operators import textops as T

    df = _one(dfs, "filters.redact")
    col = o.get("column", "text")
    c = F.col(col)
    for pat, tok in ((T.EMAIL_RE, "<EMAIL>"), (T.PHONE_RE, "<PHONE>"),
                     (T.IPV4_RE, "<IP>")):
        c = F.regexp_replace(c, pat, tok)
    return df.withColumn(col, c)


def _f_gopher(_s, dfs, o):
    from pdal_spark.operators.textops import gopher_rules

    df = _one(dfs, "filters.gopher")
    id_col = o.get("id", "doc_id")
    kw = {
        k: o[k]
        for k in (
            "min_words", "max_words", "min_mean_word_len",
            "max_mean_word_len", "min_distinct_stopwords",
            "max_punct_ratio", "max_dup_word_frac",
            "max_top_bigram_frac",
        )
        if k in o
    }
    verdict = gopher_rules(
        df, text=o.get("column", "text"), id_col=id_col, **kw
    )
    keep = verdict.where(F.col("keep") == 1).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")


def _f_split(_s, dfs, o):
    from pdal_spark.operators.textops import corpus_split

    return corpus_split(
        _one(dfs, "filters.split"),
        weights=o.get("weights"),
        id_col=o.get("id", "doc_id"), salt=int(o.get("salt", 0)),
    )


def _f_temperature(_s, dfs, o):
    from pdal_spark.operators.textops import temperature_resample

    out = temperature_resample(
        _one(dfs, "filters.temperature_mix"),
        alpha=float(o.get("alpha", 0.5)),
        url=o.get("url", "url"), id_col=o.get("id", "doc_id"),
    )
    return out.drop("domain", "domain_pages", "sample_rate")


def _f_canonicalurl(_s, dfs, o):
    from pdal_spark.operators.textops import canonical_url

    return canonical_url(
        _one(dfs, "filters.canonicalurl"),
        url=o.get("column", "url"), out=o.get("out", "canon_url"),
    )


def _r_jsonl(s, dfs, o):
    df = s.read.json(o["filename"])
    if "columns" in o:
        df = df.select(*o["columns"])
    return df


def _w_jsonl(_s, dfs, o):
    df = _one(dfs, "writers.jsonl")
    df.write.mode(o.get("mode", "overwrite")).json(o["filename"])
    return df


def _r_warc(s, dfs, o):
    from pdal_spark.sources.warc import read_warc

    return read_warc(
        s, o["filename"], record_type=o.get("record_type", "response")
    )


def _f_extract_text(_s, dfs, o):
    from pdal_spark.operators.textops import extract_text

    return extract_text(
        _one(dfs, "filters.extract_text"),
        html=o.get("column", "html"), out=o.get("out", "text"),
    )


REGISTRY.update({
    "readers.jsonl": _r_jsonl,
    "filters.extract_text": _f_extract_text,
    "writers.jsonl": _w_jsonl,
    "readers.warc": _r_warc,
    "filters.normalize": _f_normalize,
    "filters.redact": _f_redact,
    "filters.gopher": _f_gopher,
    "filters.split": _f_split,
    "filters.temperature_mix": _f_temperature,
    "filters.canonicalurl": _f_canonicalurl,
})


# -- round-1 continuation stages: LM/classifier scoring, Bloom dedup,
#    sketches, as-of join, polygon->cell covering, BPE training ------------
def _f_lm_score(_s, dfs, o):
    from pdal_spark.operators.textops import unigram_logprob

    df = _one(dfs, "filters.lm_score")
    id_col = o.get("id", "doc_id")
    scores = unigram_logprob(df, text=o.get("text", "text"),
                             id_col=id_col)
    return df.join(scores, on=id_col)


def _f_quality_classifier(_s, dfs, o):
    from pdal_spark.operators.textops import nb_classifier

    df = _one(dfs, "filters.quality_classifier")
    id_col = o.get("id", "doc_id")
    scores = nb_classifier(
        df, label_value=o.get("label_value", "en"),
        label_col=o.get("label_col", "lang"),
        text=o.get("text", "text"), id_col=id_col,
    )
    return df.join(scores, on=id_col)


def _f_dsir_label(_s, dfs, o):
    from pdal_spark.operators.textops import dsir_label_weights

    df = _one(dfs, "filters.dsir_label")
    id_col = o.get("id", "doc_id")
    w = dsir_label_weights(
        df, target_value=o.get("target_value", "en"),
        label_col=o.get("label_col", "lang"),
        text=o.get("text", "text"), id_col=id_col,
    )
    return df.join(w, on=id_col)


def _f_bloom(spark, dfs, o):
    from pdal_spark.operators.dedup import bloom_build, bloom_member

    df = _one(dfs, "filters.bloom")
    corpus = spark.read.parquet(o["corpus"])
    m_bits = int(o.get("m_bits", 1 << 20))
    k = int(o.get("k", 3))
    kw = dict(text=o.get("text", "text"), id_col=o.get("id", "doc_id"))
    bm = bloom_build(corpus, m_bits=m_bits, k=k, **kw)
    flags = bloom_member(df, bm, m_bits=m_bits, k=k, **kw)
    out = df.join(flags, on=kw["id_col"])
    if str(o.get("keep", "all")).lower() == "new":
        out = out.where(~F.col("in_bloom")).drop("in_bloom")
    return out


def _f_asof(_s, dfs, o):
    from pdal_spark.operators.temporal import asof_join

    if len(dfs) != 2:
        raise PipelineError(
            f"filters.asof expects two inputs (left, right), got {len(dfs)}"
        )
    tol = o.get("tolerance_us")
    return asof_join(
        dfs[0], dfs[1], on=_listify(o["on"]), ts=o.get("ts", "ts"),
        right_ts=o.get("right_ts"),
        tolerance_us=int(tol) if tol is not None else None,
        suffix=o.get("suffix", "_r"),
        direction=o.get("direction", "backward"),
    )


def _r_polyfill(spark, _dfs, o):
    from pdal_spark.functions import wkt as _wkt
    from pdal_spark.operators.h3 import polyfill

    rings = [
        [(float(v[0]), float(v[1])) for v in r]
        for r in _wkt.parse_polygon(o["polygon"])
    ]
    return polyfill(spark, rings, int(o.get("resolution", 7)))


def _f_compact(_s, dfs, o):
    from pdal_spark.operators.h3 import cell_compact

    return cell_compact(
        _one(dfs, "filters.compact"), res=int(o["resolution"]),
        min_res=int(o.get("min_resolution", 0)),
        cell=o.get("cell", "cell"),
    )


def _f_uncompact(_s, dfs, o):
    from pdal_spark.operators.h3 import cell_uncompact

    return cell_uncompact(
        _one(dfs, "filters.uncompact"), to_res=int(o["resolution"]),
        cell=o.get("cell", "cell"),
    )


def _f_bpe_train(_s, dfs, o):
    from pdal_spark.operators.textops import bpe_train

    return bpe_train(
        _one(dfs, "filters.bpe_train"),
        n_merges=int(o.get("n_merges", 6)), text=o.get("text", "text"),
    )


# -- batch-2 continuation stages: sampling, sketches, retrieval,
#    link extraction, windows, calibration ---------------------------------
def _f_weighted_sample(_s, dfs, o):
    from pdal_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _one(dfs, "filters.weighted_sample"), k=int(o["count"]),
        weight_col=o["weight"], id_col=o.get("id", "doc_id"),
        salt=int(o.get("salt", 0)),
    )


def _f_stratified_sample(_s, dfs, o):
    from pdal_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _one(dfs, "filters.stratified_sample"),
        k_per_group=int(o["count"]), group_col=o["groupby"],
        id_col=o.get("id", "doc_id"), salt=int(o.get("salt", 0)),
    )


def _f_allpairs(_s, dfs, o):
    from pdal_spark.operators.dedup import allpairs_jaccard_pairs

    return allpairs_jaccard_pairs(
        _one(dfs, "filters.allpairs"),
        threshold_num=int(o.get("threshold_num", 1)),
        threshold_den=int(o.get("threshold_den", 2)),
        n=int(o.get("ngram", 3)), text=o.get("text", "text"),
        id_col=o.get("id", "doc_id"),
    )


def _f_hdr_quantile(_s, dfs, o):
    from pdal_spark.operators.sketch import hdr_quantile

    qs = [
        (int(p[0]), int(p[1]))
        for p in o.get("quantiles", [[1, 4], [1, 2], [3, 4]])
    ]
    return hdr_quantile(
        _one(dfs, "filters.hdr_quantile"), o["column"], qs,
        sub_bits=int(o.get("sub_bits", 3)),
    )


def _f_tfidf_topk(_s, dfs, o):
    from pdal_spark.operators.similarity import tfidf_topk

    df = _one(dfs, "filters.tfidf_topk")
    q = df.where(o["query_where"]) if "query_where" in o else df
    return tfidf_topk(
        df, q, k=int(o.get("count", 5)), text=o.get("text", "text"),
        id_col=o.get("id", "doc_id"),
    )


def _f_extract_links(_s, dfs, o):
    from pdal_spark.operators.textops import extract_links

    return extract_links(
        _one(dfs, "filters.extract_links"),
        html=o.get("column", "html"), id_col=o.get("id", "doc_id"),
    )


def _f_char_entropy(_s, dfs, o):
    from pdal_spark.operators.textops import char_entropy

    df = _one(dfs, "filters.char_entropy")
    id_col = o.get("id", "doc_id")
    ent = char_entropy(df, text=o.get("text", "text"), id_col=id_col)
    return df.join(ent, on=id_col)


def _f_sliding_windows(_s, dfs, o):
    from pdal_spark.operators.temporal import sliding_window_counts

    return sliding_window_counts(
        _one(dfs, "filters.sliding_windows"),
        size_s=int(o["size_s"]), step_s=int(o["step_s"]),
        ts=o.get("ts", "ts"), group_col=o.get("groupby"),
    )


def _f_score_percentile(_s, dfs, o):
    from pdal_spark.operators.stats import score_percentile

    return score_percentile(
        _one(dfs, "filters.score_percentile"), o["column"],
        id_col=o.get("id", "doc_id"),
    )


def _f_bigram_score(spark, dfs, o):
    from pdal_spark.operators.textops import bigram_logprob

    df = _one(dfs, "filters.bigram_score")
    train = spark.read.parquet(o["train"]) if "train" in o else None
    id_col = o.get("id", "doc_id")
    scores = bigram_logprob(
        df, train_df=train, text=o.get("text", "text"), id_col=id_col,
        backoff=float(o.get("backoff", 0.4)),
    )
    return df.join(scores, on=id_col)


def _f_funnel(_s, dfs, o):
    from pdal_spark.operators.temporal import funnel

    return funnel(
        _one(dfs, "filters.funnel"), steps=_listify(o["steps"]),
        key_col=o.get("key", "user_id"),
        state_col=o.get("state", "event_type"), ts=o.get("ts", "ts"),
    )


def _f_cohort(_s, dfs, o):
    from pdal_spark.operators.temporal import cohort_retention

    return cohort_retention(
        _one(dfs, "filters.cohort_retention"),
        key_col=o.get("key", "user_id"), ts=o.get("ts", "ts"),
        bucket_s=int(o.get("bucket_s", 86400 * 7)),
    )


def _f_transitions(_s, dfs, o):
    from pdal_spark.operators.temporal import event_transitions

    return event_transitions(
        _one(dfs, "filters.transitions"),
        key_col=o.get("key", "user_id"),
        state_col=o.get("state", "event_type"),
        ts=o.get("ts", "ts"), id_col=o.get("id", "event_id"),
    )


def _f_sessionize(_s, dfs, o):
    from pdal_spark.operators.temporal import session_stats, sessionize

    fn = session_stats if o.get("rollup") else sessionize
    return fn(
        _one(dfs, "filters.sessionize"),
        gap_s=int(o.get("gap_s", 1800)),
        key_col=o.get("key", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
    )


def _f_bootstrap(_s, dfs, o):
    from pdal_spark.operators.stats import bootstrap_replicas

    return bootstrap_replicas(
        _one(dfs, "filters.bootstrap"), value_col=o["column"],
        id_col=o["id"], n_replicas=int(o.get("replicas", 16)),
        salt=int(o.get("salt", 0)),
    )


def _f_skew_report(_s, dfs, o):
    from pdal_spark.operators.stats import skew_report

    return skew_report(
        _one(dfs, "filters.skew_report"), o["column"],
        top_k=int(o.get("count", 10)),
    )


def _f_equi_depth(_s, dfs, o):
    from pdal_spark.operators.stats import equi_depth_bins

    return equi_depth_bins(
        _one(dfs, "filters.equi_depth"), o["column"],
        n_bins=int(o.get("bins", 10)), id_col=o.get("id", "doc_id"),
    )


def _f_url_latest(_s, dfs, o):
    from pdal_spark.operators.textops import latest_by_url

    return latest_by_url(
        _one(dfs, "filters.url_latest"), url=o.get("column", "url"),
        ts=o.get("ts", "warc_ts"), id_col=o.get("id", "doc_id"),
    )


def _f_collocations(_s, dfs, o):
    from pdal_spark.operators.textops import collocations

    return collocations(
        _one(dfs, "filters.collocations"),
        min_count=int(o.get("min_count", 5)),
        top_k=int(o.get("count", 50)), text=o.get("text", "text"),
    )


def _f_grouped_corr(_s, dfs, o):
    from pdal_spark.operators.stats import grouped_corr

    return grouped_corr(
        _one(dfs, "filters.grouped_corr"), o["x"], o["y"],
        o["groupby"],
    )


REGISTRY.update({
    "filters.collocations": _f_collocations,
    "filters.grouped_corr": _f_grouped_corr,
    "filters.url_latest": _f_url_latest,
    "filters.funnel": _f_funnel,
    "filters.cohort_retention": _f_cohort,
    "filters.transitions": _f_transitions,
    "filters.sessionize": _f_sessionize,
    "filters.bootstrap": _f_bootstrap,
    "filters.skew_report": _f_skew_report,
    "filters.equi_depth": _f_equi_depth,
})


REGISTRY.update({
    "filters.weighted_sample": _f_weighted_sample,
    "filters.stratified_sample": _f_stratified_sample,
    "filters.allpairs": _f_allpairs,
    "filters.hdr_quantile": _f_hdr_quantile,
    "filters.tfidf_topk": _f_tfidf_topk,
    "filters.extract_links": _f_extract_links,
    "filters.char_entropy": _f_char_entropy,
    "filters.sliding_windows": _f_sliding_windows,
    "filters.score_percentile": _f_score_percentile,
    "filters.bigram_score": _f_bigram_score,
})


REGISTRY.update({
    "filters.lm_score": _f_lm_score,
    "filters.quality_classifier": _f_quality_classifier,
    "filters.dsir_label": _f_dsir_label,
    "filters.bloom": _f_bloom,
    "filters.asof": _f_asof,
    "readers.polyfill": _r_polyfill,
    "filters.compact": _f_compact,
    "filters.uncompact": _f_uncompact,
    "filters.bpe_train": _f_bpe_train,
})

_EXT_READERS = {
    ".parquet": "readers.parquet",
    ".csv": "readers.text",
    ".txt": "readers.text",
}
_EXT_WRITERS = {
    ".parquet": "writers.parquet",
    ".csv": "writers.text",
}


def _infer_type(spec: dict, pos: int, count: int) -> str:
    """Stage-kind inference, PipelineReaderJSON.cpp:100-140: explicit
    `type` wins; else a `filename` string infers reader (non-last) or
    writer (last) from its extension."""
    if "type" in spec:
        return spec["type"]
    fn = spec.get("filename")
    if fn is None:
        raise PipelineError(f"stage {pos}: no type and no filename")
    ext = "." + fn.rsplit(".", 1)[-1].lower() if "." in fn else ""
    table = _EXT_WRITERS if pos == count - 1 else _EXT_READERS
    t = table.get(ext)
    if t is None:
        raise PipelineError(
            f"stage {pos}: cannot infer stage type for '{fn}'"
        )
    return t


class Pipeline:
    """Programmatic + JSON pipeline (PipelineExecutor analog,
    pdal/PipelineExecutor.hpp:76-121)."""

    def __init__(self, spec):
        if isinstance(spec, str):
            spec = json.loads(spec)
        if isinstance(spec, dict):
            spec = spec["pipeline"]
        if not isinstance(spec, list) or not spec:
            raise PipelineError("pipeline must be a non-empty array")
        stages = []
        for pos, st in enumerate(spec):
            if isinstance(st, str):
                st = {"filename": st}
            st = dict(st)
            st["type"] = _infer_type(st, pos, len(spec))
            stages.append(st)
        self.stages = stages
        self._df: DataFrame | None = None

    # -- prepare (analysis only, no job) --------------------------------
    def _build(self, spark: SparkSession, dry: bool = False) -> DataFrame:
        by_tag: dict[str, DataFrame] = {}
        last: DataFrame | None = None
        out: DataFrame | None = None
        for pos, st in enumerate(self.stages):
            typ = st["type"]
            if dry and typ.startswith("writers.") and typ != "writers.gdal":
                # validate must not perform writes; writers.gdal is a
                # transform + optional write, so keep its transform.
                last = _one([last] if last is not None else [], typ)
                out = last
                continue
            if dry and typ == "writers.gdal":
                st = {k: v for k, v in st.items() if k != "filename"}
            fn = REGISTRY.get(typ)
            if fn is None:
                raise PipelineError(
                    f"unsupported stage type '{typ}'; supported: "
                    + ", ".join(sorted(REGISTRY))
                )
            opts = {k: v for k, v in st.items()
                    if k not in ("type", "tag", "inputs", "where",
                                 "where_merge")}
            if typ.startswith("readers."):
                inputs: list[DataFrame] = []
            elif "inputs" in st:
                inputs = [by_tag[t] for t in _listify(st["inputs"])]
            elif last is not None:
                inputs = [last]
            else:
                raise PipelineError(f"stage {pos} ({typ}): no input")

            where = st.get("where")
            if where and inputs:
                pred = F.expr(compile_expression(where, SPARK))
                kept = [d.where(pred) for d in inputs]
                bypass = inputs[0].where(~pred)
                out = fn(spark, kept, opts)
                merge_back = str(
                    st.get("where_merge", "true")
                ).lower() != "false"
                if merge_back and not typ.startswith("writers."):
                    out = out.unionByName(bypass, allowMissingColumns=True)
            else:
                out = fn(spark, inputs, opts)
            if "tag" in st:
                by_tag[st["tag"]] = out
            last = out
        assert out is not None
        return out

    def validate(self, spark: SparkSession) -> dict:
        """Parse + schema resolution + physical plan, no action
        (`pdal pipeline --validate`)."""
        df = self._build(spark, dry=True)
        self._df = df
        return {
            "schema": df.schema.jsonValue(),
            "columns": df.columns,
            "plan": df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")
            ),
        }

    def execute(self, spark: SparkSession) -> DataFrame:
        """Build (if needed) and return the result DataFrame; writer
        stages have already performed their side effects during
        build. Returns the terminal DataFrame (PDAL: final view set;
        point count = .count() on it)."""
        df = self._build(spark)
        self._df = df
        return df


def _w_geojson(_s, dfs, o):
    from pdal_spark.sources.text import write_geojson

    df = _one(dfs, "writers.geojson")
    write_geojson(
        df, o["filename"], x=o.get("x", "lon"), y=o.get("y", "lat"),
        mode=o.get("mode", "overwrite"),
    )
    return df


REGISTRY["writers.geojson"] = _w_geojson
REGISTRY["writers.ogr"] = _w_geojson


def _f_interval_join(_s, dfs, o):
    from pdal_spark.operators.temporal import interval_join

    if len(dfs) != 2:
        raise PipelineError(
            "filters.interval_join expects two inputs "
            f"(events, intervals), got {len(dfs)}"
        )
    return interval_join(
        dfs[0], dfs[1], ts=o.get("ts", "ts"),
        start_us=o.get("start", "start_us"),
        end_us=o.get("end", "end_us"),
        cell_s=int(o.get("cell_s", 3600)),
    )


def _f_time_rollup(_s, dfs, o):
    from pdal_spark.operators.temporal import time_rollup

    widths = o.get("widths_s")
    return time_rollup(
        _one(dfs, "filters.time_rollup"),
        widths_s=[int(w) for w in widths] if widths else None,
        ts=o.get("ts", "ts"), value=o.get("column", "value"),
        group_col=o.get("groupby"),
    )


REGISTRY.update({
    "filters.interval_join": _f_interval_join,
    "filters.time_rollup": _f_time_rollup,
})


def _f_pq_topk(_s, dfs, o):
    from pdal_spark.operators.similarity import pq_topk

    if len(dfs) != 2:
        raise PipelineError(
            "filters.pq_topk expects two inputs "
            f"(queries, corpus), got {len(dfs)}"
        )
    return pq_topk(
        dfs[0], dfs[1], k=int(o.get("count", 5)),
        m=int(o.get("m", 8)), ncent=int(o.get("ncent", 16)),
        vec=o.get("column", "embedding"),
        id_col=o.get("id", "vec_id"),
    )


REGISTRY["filters.pq_topk"] = _f_pq_topk


def _f_anchor_stats(_s, dfs, o):
    from pdal_spark.operators.textops import anchor_stats

    return anchor_stats(
        _one(dfs, "filters.anchor_stats"),
        html=o.get("column", "html"), id_col=o.get("id", "doc_id"),
    )


def _f_url_rules(_s, dfs, o):
    from pdal_spark.operators.textops import url_rules_filter

    if len(dfs) != 2:
        raise PipelineError(
            "filters.url_rules expects two inputs "
            f"(pages, rules), got {len(dfs)}"
        )
    return url_rules_filter(
        dfs[0], dfs[1], url=o.get("column", "url"),
        id_col=o.get("id", "doc_id"),
        default_allow=bool(o.get("default_allow", True)),
    )


REGISTRY.update({
    "filters.anchor_stats": _f_anchor_stats,
    "filters.url_rules": _f_url_rules,
})


def _f_shard_assign(_s, dfs, o):
    from pdal_spark.operators.textops import shard_assign

    return shard_assign(
        _one(dfs, "filters.shard_assign"),
        n_shards=int(o["shards"]),
        vnodes=int(o.get("vnodes", 8)),
        id_col=o.get("id", "doc_id"),
        salt=int(o.get("salt", 0)),
    )


REGISTRY["filters.shard_assign"] = _f_shard_assign


def _f_triangles(_s, dfs, o):
    from pdal_spark.operators.graph import triangle_stats

    return triangle_stats(
        _one(dfs, "filters.triangles"),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_kcore(_s, dfs, o):
    from pdal_spark.operators.graph import kcore

    return kcore(
        _one(dfs, "filters.kcore"), k=int(o["k"]),
        rounds=int(o.get("rounds", 8)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_hits(_s, dfs, o):
    from pdal_spark.operators.graph import hits

    return hits(
        _one(dfs, "filters.hits"),
        iters=int(o.get("iters", 3)),
        scale=int(o.get("scale", 10**6)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


REGISTRY.update({
    "filters.triangles": _f_triangles,
    "filters.kcore": _f_kcore,
    "filters.hits": _f_hits,
})


def _f_adamic_adar(_s, dfs, o):
    from pdal_spark.operators.graph import adamic_adar

    md = o.get("max_degree")
    return adamic_adar(
        _one(dfs, "filters.adamic_adar"),
        max_degree=int(md) if md is not None else None,
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_ppr(_s, dfs, o):
    from pdal_spark.operators.graph import personalized_pagerank

    return personalized_pagerank(
        _one(dfs, "filters.personalized_pagerank"),
        seeds=[int(s) for s in _listify(o["seeds"])],
        iters=int(o.get("iters", 3)),
        scale=int(o.get("scale", 10**12)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_label_propagation(_s, dfs, o):
    from pdal_spark.operators.graph import label_propagation

    return label_propagation(
        _one(dfs, "filters.label_propagation"),
        rounds=int(o.get("rounds", 3)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_dsir(_s, dfs, o):
    from pdal_spark.operators.textops import dsir_weights

    if len(dfs) != 2:
        raise PipelineError(
            "filters.dsir expects two inputs "
            f"(corpus, target), got {len(dfs)}"
        )
    return dsir_weights(
        dfs[0], dfs[1], buckets=int(o.get("buckets", 64)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.adamic_adar": _f_adamic_adar,
    "filters.personalized_pagerank": _f_ppr,
    "filters.label_propagation": _f_label_propagation,
    "filters.dsir": _f_dsir,
})


def _f_rp_sketch(_s, dfs, o):
    from pdal_spark.operators.similarity import rp_sketch

    return rp_sketch(
        _one(dfs, "filters.rp_sketch"),
        out_dim=int(o.get("out_dim", 16)),
        dims=int(o.get("dims", 64)),
        bits=int(o.get("bits", 8)),
        vec=o.get("column", "embedding"),
        id_col=o.get("id", "vec_id"),
    )


def _f_kmv(_s, dfs, o):
    from pdal_spark.operators.sketch import kmv_sketch

    return kmv_sketch(
        _one(dfs, "filters.kmv"), group=o["group"],
        elem=o["dimension"], k=int(o.get("k", 32)),
    )


def _f_decayed_counts(_s, dfs, o):
    from pdal_spark.operators.temporal import decayed_counts

    return decayed_counts(
        _one(dfs, "filters.decayed_counts"),
        key=o["group"], ref_ts=o["ref"],
        halflife_s=int(o["halflife_s"]),
        ts=o.get("column", "ts"), value=o.get("value"),
    )


def _f_bfs(_s, dfs, o):
    from pdal_spark.operators.graph import bfs_levels

    return bfs_levels(
        _one(dfs, "filters.bfs_levels"),
        seeds=[int(s) for s in _listify(o["seeds"])],
        max_depth=int(o.get("max_depth", 4)),
        directed=bool(o.get("directed", True)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


REGISTRY.update({
    "filters.rp_sketch": _f_rp_sketch,
    "filters.kmv": _f_kmv,
    "filters.decayed_counts": _f_decayed_counts,
    "filters.bfs_levels": _f_bfs,
})


def _f_ams_f2(_s, dfs, o):
    from pdal_spark.operators.sketch import ams_f2

    return ams_f2(
        _one(dfs, "filters.ams_f2"), elem=o["dimension"],
        t=int(o.get("t", 16)),
    )


def _f_gram(_s, dfs, o):
    from pdal_spark.operators.similarity import gram_matrix

    return gram_matrix(
        _one(dfs, "filters.gram_matrix"),
        dims=int(o.get("dims", 64)), bits=int(o.get("bits", 8)),
        vec=o.get("column", "embedding"),
    )


def _f_random_walks(_s, dfs, o):
    from pdal_spark.operators.graph import random_walks

    return random_walks(
        _one(dfs, "filters.random_walks"),
        steps=int(o.get("steps", 4)),
        n_walks=int(o.get("n_walks", 1)),
        directed=bool(o.get("directed", True)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_cooccurrence(_s, dfs, o):
    from pdal_spark.operators.stats import cooccurrence

    cap = o.get("max_items_per_key")
    return cooccurrence(
        _one(dfs, "filters.cooccurrence"),
        key=o["group"], item=o["dimension"],
        min_count=int(o.get("min_count", 1)),
        max_items_per_key=int(cap) if cap is not None else None,
    )


REGISTRY.update({
    "filters.ams_f2": _f_ams_f2,
    "filters.gram_matrix": _f_gram,
    "filters.random_walks": _f_random_walks,
    "filters.cooccurrence": _f_cooccurrence,
})


def _f_bm25(_s, dfs, o):
    from pdal_spark.operators.textops import bm25_topk

    return bm25_topk(
        _one(dfs, "filters.bm25"),
        terms=[str(t) for t in _listify(o["terms"])],
        k=int(o.get("count", 10)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_zorder(_s, dfs, o):
    from pdal_spark.operators.h3 import zorder_key_col

    cols = [(c["column"], float(c["lo"]), float(c["hi"]))
            for c in o["cols"]]
    return zorder_key_col(
        _one(dfs, "filters.zorder"), cols,
        bits=int(o.get("bits", 8)), out=o.get("out", "z_key"),
    )


REGISTRY.update({
    "filters.bm25": _f_bm25,
    "filters.zorder": _f_zorder,
})


def _f_grid_disk(_s, dfs, o):
    from pdal_spark.operators.h3 import grid_disk

    return grid_disk(
        _one(dfs, "filters.grid_disk"),
        cell=o.get("column", "h3_cell"),
        res=int(o.get("resolution", 12)), k=int(o.get("k", 1)),
    )


def _f_trajectory(_s, dfs, o):
    from pdal_spark.operators.temporal import trajectory_stats

    return trajectory_stats(
        _one(dfs, "filters.trajectory"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


def _f_convex_hull(_s, dfs, o):
    from pdal_spark.operators.features import (convex_hull,
                                               convex_hull_exact)

    fn = convex_hull_exact if o.get("mode") == "exact" else convex_hull
    return fn(
        _one(dfs, "filters.convex_hull"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        quant=int(o.get("quant", 1 << 20)),
    )


REGISTRY.update({
    "filters.grid_disk": _f_grid_disk,
    "filters.trajectory": _f_trajectory,
    "filters.convex_hull": _f_convex_hull,
})


def _f_rake(_s, dfs, o):
    from pdal_spark.operators.textops import rake_keywords

    return rake_keywords(
        _one(dfs, "filters.rake"), top_k=int(o.get("count", 20)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_phrase_search(_s, dfs, o):
    from pdal_spark.operators.textops import phrase_search

    return phrase_search(
        _one(dfs, "filters.phrase_search"),
        phrase=[str(t) for t in _listify(o["phrase"])],
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_zipf(_s, dfs, o):
    from pdal_spark.operators.textops import zipf_fit

    return zipf_fit(
        _one(dfs, "filters.zipf"), top_n=int(o.get("count", 20)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.rake": _f_rake,
    "filters.phrase_search": _f_phrase_search,
    "filters.zipf": _f_zipf,
})


def _f_neighbor_jaccard(_s, dfs, o):
    from pdal_spark.operators.graph import neighbor_jaccard

    cap = o.get("max_degree")
    return neighbor_jaccard(
        _one(dfs, "filters.neighbor_jaccard"),
        max_degree=int(cap) if cap is not None else None,
        include_adjacent=bool(o.get("include_adjacent", False)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_textrank(_s, dfs, o):
    from pdal_spark.operators.textops import textrank_keywords

    return textrank_keywords(
        _one(dfs, "filters.textrank"),
        iters=int(o.get("iters", 3)), top_k=int(o.get("count", 20)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.neighbor_jaccard": _f_neighbor_jaccard,
    "filters.textrank": _f_textrank,
})


def _f_assortativity(_s, dfs, o):
    from pdal_spark.operators.graph import degree_assortativity

    return degree_assortativity(
        _one(dfs, "filters.assortativity"),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _r_morton_ranges(spark, dfs, o):
    from pdal_spark.operators.h3 import morton_ranges

    return morton_ranges(
        spark, float(o["lon0"]), float(o["lon1"]),
        float(o["lat0"]), float(o["lat1"]),
        res=int(o.get("resolution", 12)),
    )


def _f_silhouette(_s, dfs, o):
    from pdal_spark.operators.cluster import silhouette_simplified

    return silhouette_simplified(
        _one(dfs, "filters.silhouette"),
        x=o.get("x", "px"), y=o.get("y", "py"),
        label=o.get("label", "cluster_id"), id_col=o.get("id", "pid"),
    )


REGISTRY.update({
    "filters.assortativity": _f_assortativity,
    "readers.morton_ranges": _r_morton_ranges,
    "filters.silhouette": _f_silhouette,
})


def _f_crop_celljoin(spark, dfs, o):
    from pdal_spark.operators.crop import crop_polygons_celljoin

    if len(dfs) == 2:
        pts, polys = dfs
    else:
        pts = _one(dfs, "filters.crop_celljoin")
        polys = spark.read.parquet(o["polygons"])
    return crop_polygons_celljoin(
        pts, polys, res=int(o.get("resolution", 7)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
    )


def _f_cusum(_s, dfs, o):
    from pdal_spark.operators.temporal import cusum_changepoint

    return cusum_changepoint(
        _one(dfs, "filters.cusum"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        value=o.get("column", "value"),
    )


def _f_mmr(_s, dfs, o):
    from pdal_spark.operators.similarity import mmr_rerank

    return mmr_rerank(
        _one(dfs, "filters.mmr"),
        k=int(o.get("count", 8)), lam=float(o.get("lambda", 0.7)),
        rel=o.get("rel", "rel"), vec=o.get("column", "qvec"),
        id_col=o.get("id", "vec_id"),
    )


REGISTRY.update({
    "filters.crop_celljoin": _f_crop_celljoin,
    "filters.cusum": _f_cusum,
    "filters.mmr": _f_mmr,
})


def _f_radius_geodesic(_s, dfs, o):
    from pdal_spark.operators.knn import radius_join_geodesic

    if len(dfs) == 2:
        l, r = dfs
    else:
        l = r = _one(dfs, "filters.radius_geodesic")
    return radius_join_geodesic(
        l, r, float(o["radius_m"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_left=o.get("id", "pid"), id_right=o.get("id", "pid"),
        include_self=bool(o.get("include_self", True)),
    )


def _f_geometric_median(_s, dfs, o):
    from pdal_spark.operators.cluster import geometric_median

    return geometric_median(
        _one(dfs, "filters.geometric_median"),
        key_col=o.get("group", "user_id"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        iters=int(o.get("iters", 3)),
    )


def _f_theil_sen(_s, dfs, o):
    from pdal_spark.operators.stats import theil_sen

    return theil_sen(
        _one(dfs, "filters.theil_sen"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"), value=o.get("column", "value"),
    )


REGISTRY.update({
    "filters.radius_geodesic": _f_radius_geodesic,
    "filters.geometric_median": _f_geometric_median,
    "filters.theil_sen": _f_theil_sen,
})


def _f_bbox_join(_s, dfs, o):
    from pdal_spark.operators.overlay import bbox_join

    if len(dfs) != 2:
        raise PipelineError("filters.bbox_join expects two inputs")
    return bbox_join(
        dfs[0], dfs[1], cell=float(o["cell"]),
        id_left=o.get("id_left", "lid"),
        id_right=o.get("id_right", "rid"),
    )


def _f_trigram(_s, dfs, o):
    from pdal_spark.operators.textops import trigram_logprob

    if len(dfs) == 2:
        score, train = dfs
    else:
        score, train = _one(dfs, "filters.trigram_lm"), None
    return trigram_logprob(
        score, train_df=train,
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
        backoff=float(o.get("backoff", 0.4)),
    )


def _f_kwic(_s, dfs, o):
    from pdal_spark.operators.textops import kwic_snippets

    return kwic_snippets(
        _one(dfs, "filters.kwic"), term=str(o["term"]),
        width=int(o.get("width", 30)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.bbox_join": _f_bbox_join,
    "filters.trigram_lm": _f_trigram,
    "filters.kwic": _f_kwic,
})


def _f_hll_intersect(_s, dfs, o):
    from pdal_spark.operators.sketch import hll_intersect

    return hll_intersect(
        _one(dfs, "filters.hll_intersect"),
        group_col=o["group"], elem_col=o["dimension"],
        g_a=o["a"], g_b=o["b"],
    )


def _f_trajectory_resample(_s, dfs, o):
    from pdal_spark.operators.temporal import trajectory_resample

    return trajectory_resample(
        _one(dfs, "filters.trajectory_resample"),
        step=float(o["step"]),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        max_points_per_leg=int(o.get("max_points_per_leg", 64)),
    )


def _f_compaction_plan(_s, dfs, o):
    from pdal_spark.plans.bucketing import compaction_plan

    return compaction_plan(
        _one(dfs, "filters.compaction_plan"),
        target_bytes=int(o["target_bytes"]),
        part_col=o.get("partition", "partition"),
        id_col=o.get("id", "file_id"),
        size_col=o.get("size", "size_bytes"),
    )


REGISTRY.update({
    "filters.hll_intersect": _f_hll_intersect,
    "filters.trajectory_resample": _f_trajectory_resample,
    "filters.compaction_plan": _f_compaction_plan,
})


def _f_postings_varint(_s, dfs, o):
    from pdal_spark.operators.textops import postings_varint_stats

    return postings_varint_stats(
        _one(dfs, "filters.postings_varint"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_idw_at_points(_s, dfs, o):
    from pdal_spark.operators.raster import idw_at_points

    if len(dfs) != 2:
        raise PipelineError(
            "filters.idw_at_points expects two inputs (queries, samples)"
        )
    return idw_at_points(
        dfs[0], dfs[1], float(o["radius"]),
        value=o.get("column", "value"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_query=o.get("id_query", "qid"),
        id_sample=o.get("id_sample", "sid"),
    )


def _f_cohen_kappa(_s, dfs, o):
    from pdal_spark.operators.stats import cohen_kappa

    return cohen_kappa(
        _one(dfs, "filters.cohen_kappa"), o["a"], o["b"]
    )


REGISTRY.update({
    "filters.postings_varint": _f_postings_varint,
    "filters.idw_at_points": _f_idw_at_points,
    "filters.cohen_kappa": _f_cohen_kappa,
})


def _f_hdr_grouped(_s, dfs, o):
    from pdal_spark.operators.sketch import hdr_quantile_by_group

    qs = [(int(a), int(b)) for a, b in
          (q.split("/") for q in _listify(o.get("quantiles",
                                                ["1/2", "9/10"])))]
    return hdr_quantile_by_group(
        _one(dfs, "filters.hdr_grouped"),
        group_col=o["group"], value_col=o["dimension"], quantiles=qs,
    )


def _f_harmonic_centrality(_s, dfs, o):
    from pdal_spark.operators.graph import harmonic_centrality

    return harmonic_centrality(
        _one(dfs, "filters.harmonic_centrality"),
        seeds=[int(s) for s in _listify(o["seeds"])],
        max_depth=int(o.get("depth", 4)),
        directed=bool(o.get("directed", True)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


def _f_benford(_s, dfs, o):
    from pdal_spark.operators.stats import benford_deviation

    return benford_deviation(
        _one(dfs, "filters.benford"), o.get("column", "value"),
        quant=int(o.get("quant", 1000)),
    )


REGISTRY.update({
    "filters.hdr_grouped": _f_hdr_grouped,
    "filters.harmonic_centrality": _f_harmonic_centrality,
    "filters.benford": _f_benford,
})


def _f_morans_i(_s, dfs, o):
    from pdal_spark.operators.stats import morans_i

    return morans_i(
        _one(dfs, "filters.morans_i"),
        res=int(o["resolution"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_snap_lines(_s, dfs, o):
    from pdal_spark.operators.transform import snap_to_lines

    lines = [
        (int(l["id"]), [(float(x), float(y)) for x, y in l["points"]])
        for l in o["lines"]
    ]
    md = o.get("max_dist")
    return snap_to_lines(
        _one(dfs, "filters.snap_lines"), lines,
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        max_dist=float(md) if md is not None else None,
    )


def _f_zonemap_prune(_s, dfs, o):
    from pdal_spark.plans.bucketing import zonemap_prune_stats

    return zonemap_prune_stats(
        _one(dfs, "filters.zonemap_prune"),
        sort_col=o["column"], id_col=o.get("id", "event_id"),
        rows_per_group=int(o.get("rows_per_group", 4096)),
        lo=float(o["lo"]), hi=float(o["hi"]),
    )


REGISTRY.update({
    "filters.morans_i": _f_morans_i,
    "filters.snap_lines": _f_snap_lines,
    "filters.zonemap_prune": _f_zonemap_prune,
})


def _f_getis_ord(_s, dfs, o):
    from pdal_spark.operators.stats import getis_ord_gi

    return getis_ord_gi(
        _one(dfs, "filters.getis_ord"),
        res=int(o["resolution"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_edit_distance(_s, dfs, o):
    from pdal_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        _one(dfs, "filters.edit_distance"),
        key=o["column"], k=int(o.get("k", 2)),
        prefix=int(o.get("prefix", 2)), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.getis_ord": _f_getis_ord,
    "filters.edit_distance": _f_edit_distance,
})


def _f_hashed_features(_s, dfs, o):
    from pdal_spark.operators.textops import hashed_features

    return hashed_features(
        _one(dfs, "filters.hashed_features"),
        dim=int(o.get("dim", 256)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_oov_rate(_s, dfs, o):
    from pdal_spark.operators.textops import oov_rate

    if len(dfs) != 2:
        raise PipelineError(
            "filters.oov_rate expects two inputs (score, train)"
        )
    return oov_rate(
        dfs[0], dfs[1],
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_image_tiles(_s, dfs, o):
    from pdal_spark.operators.multimodal import image_tile_manifest

    stride = o.get("stride")
    return image_tile_manifest(
        _one(dfs, "filters.image_tiles"),
        patch=int(o.get("patch", 64)),
        stride=int(stride) if stride is not None else None,
    )


REGISTRY.update({
    "filters.hashed_features": _f_hashed_features,
    "filters.oov_rate": _f_oov_rate,
    "filters.image_tiles": _f_image_tiles,
})


def _f_crawl_schedule(_s, dfs, o):
    from pdal_spark.operators.textops import crawl_schedule

    return crawl_schedule(
        _one(dfs, "filters.crawl_schedule"),
        delay_ms=int(o.get("delay_ms", 1000)),
        url=o.get("column", "url"), id_col=o.get("id", "doc_id"),
    )


def _f_burstiness(_s, dfs, o):
    from pdal_spark.operators.temporal import burstiness

    return burstiness(
        _one(dfs, "filters.burstiness"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
    )


def _f_bearings(_s, dfs, o):
    from pdal_spark.operators.temporal import trajectory_bearings

    return trajectory_bearings(
        _one(dfs, "filters.bearings"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({
    "filters.crawl_schedule": _f_crawl_schedule,
    "filters.burstiness": _f_burstiness,
    "filters.bearings": _f_bearings,
})


def _f_label_centroids(_s, dfs, o):
    from pdal_spark.operators.similarity import label_centroids

    return label_centroids(
        _one(dfs, "filters.label_centroids"),
        label=o.get("label", "label"),
        vec=o.get("column", "qvec"), id_col=o.get("id", "vec_id"),
    )


def _f_ncm(_s, dfs, o):
    from pdal_spark.operators.similarity import (label_centroids,
                                                 ncm_classify)

    if len(dfs) != 2:
        raise PipelineError(
            "filters.ncm expects two inputs (probe, train)"
        )
    cent = label_centroids(
        dfs[1], label=o.get("label", "label"),
        vec=o.get("column", "qvec"), id_col=o.get("id", "vec_id"),
    )
    return ncm_classify(
        dfs[0], cent, label=o.get("label", "label"),
        vec=o.get("column", "qvec"), id_col=o.get("id", "vec_id"),
    )


def _f_cell_area(_s, dfs, o):
    from pdal_spark.operators.h3 import cell_area_km2

    return cell_area_km2(
        _one(dfs, "filters.cell_area"),
        cell=o.get("column", "h3_cell"),
        res=int(o.get("resolution", 12)),
    )


REGISTRY.update({
    "filters.label_centroids": _f_label_centroids,
    "filters.ncm": _f_ncm,
    "filters.cell_area": _f_cell_area,
})


def _f_morton_sample(_s, dfs, o):
    from pdal_spark.operators.sampling import morton_sample

    return morton_sample(
        _one(dfs, "filters.morton_sample"),
        keep_num=int(o["num"]), keep_den=int(o["den"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        res=int(o.get("resolution", 26)),
    )


def _f_crop_celljoin_outside(spark, dfs, o):
    from pdal_spark.operators.crop import crop_polygons_celljoin_outside

    if len(dfs) == 2:
        pts, polys = dfs
    else:
        pts = _one(dfs, "filters.crop_celljoin_outside")
        polys = spark.read.parquet(o["polygons"])
    return crop_polygons_celljoin_outside(
        pts, polys, res=int(o.get("resolution", 7)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o.get("id", "pid"),
    )


def _f_containment(_s, dfs, o):
    from pdal_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _one(dfs, "filters.containment"),
        threshold_num=int(o.get("num", 4)),
        threshold_den=int(o.get("den", 5)),
        max_df=int(o.get("max_df", 50)),
        n=int(o.get("n", 3)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.morton_sample": _f_morton_sample,
    "filters.crop_celljoin_outside": _f_crop_celljoin_outside,
    "filters.containment": _f_containment,
})


def _f_robust_zscore(_s, dfs, o):
    from pdal_spark.operators.stats import robust_zscore

    return robust_zscore(
        _one(dfs, "filters.robust_zscore"),
        group_col=o["group"], value=o["column"],
        id_col=o.get("id", "event_id"),
        k=float(o.get("k", 1.4826)),
    )


REGISTRY.update({
    "filters.robust_zscore": _f_robust_zscore,
})


def _f_ab_test(_s, dfs, o):
    from pdal_spark.operators.stats import ab_test

    return ab_test(
        _one(dfs, "filters.ab_test"),
        group_col=o["group"], success_pred=o["predicate"],
        g_a=o["a"], g_b=o["b"],
    )


def _f_url_features(_s, dfs, o):
    from pdal_spark.operators.textops import url_features

    return url_features(
        _one(dfs, "filters.url_features"),
        url=o.get("column", "url"), id_col=o.get("id", "doc_id"),
    )


def _f_rich_club(_s, dfs, o):
    from pdal_spark.operators.graph import rich_club

    return rich_club(
        _one(dfs, "filters.rich_club"), k=int(o["k"]),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
    )


REGISTRY.update({
    "filters.ab_test": _f_ab_test,
    "filters.url_features": _f_url_features,
    "filters.rich_club": _f_rich_club,
})


def _f_psi(_s, dfs, o):
    from pdal_spark.operators.stats import psi_drift

    if len(dfs) != 2:
        raise PipelineError("filters.psi expects two inputs (a, b)")
    return psi_drift(
        dfs[0], dfs[1], o["column"],
        lo=float(o["lo"]), hi=float(o["hi"]),
        n_bins=int(o.get("bins", 10)),
    )


def _f_haar(_s, dfs, o):
    from pdal_spark.operators.temporal import haar_downsample

    return haar_downsample(
        _one(dfs, "filters.haar"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"), value=o.get("column", "value"),
    )


REGISTRY.update({
    "filters.psi": _f_psi,
    "filters.haar": _f_haar,
})


def _f_simplify(_s, dfs, o):
    from pdal_spark.operators.transform import simplify_polyline

    return simplify_polyline(
        _one(dfs, "filters.simplify"),
        eps_area2_q=int(o["eps_area2_q"]),
        rounds=int(o.get("rounds", 2)),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


def _f_focal_mean(_s, dfs, o):
    from pdal_spark.operators.raster import focal_mean

    return focal_mean(
        _one(dfs, "filters.focal_mean"),
        res=int(o["resolution"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_focal_gradient(_s, dfs, o):
    from pdal_spark.operators.raster import focal_gradient

    return focal_gradient(
        _one(dfs, "filters.focal_gradient"),
        res=int(o["resolution"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({
    "filters.simplify": _f_simplify,
    "filters.focal_mean": _f_focal_mean,
    "filters.focal_gradient": _f_focal_gradient,
})


def _f_trajectory_progress(_s, dfs, o):
    from pdal_spark.operators.temporal import trajectory_progress

    return trajectory_progress(
        _one(dfs, "filters.trajectory_progress"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


def _f_spacetime(_s, dfs, o):
    from pdal_spark.operators.hexbin import spacetime_counts

    return spacetime_counts(
        _one(dfs, "filters.spacetime"),
        res=int(o["resolution"]), bucket_s=int(o["bucket_s"]),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        ts=o.get("ts", "ts"),
    )


def _f_suppress_small_cells(_s, dfs, o):
    from pdal_spark.operators.hexbin import suppress_small_cells

    return suppress_small_cells(
        _one(dfs, "filters.suppress_small_cells"),
        res=int(o["resolution"]), k=int(o["k"]),
        entity_col=o.get("entity", "user_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({
    "filters.trajectory_progress": _f_trajectory_progress,
    "filters.spacetime": _f_spacetime,
    "filters.suppress_small_cells": _f_suppress_small_cells,
})


def _f_gini(_s, dfs, o):
    from pdal_spark.operators.stats import gini

    return gini(
        _one(dfs, "filters.gini"), group_col=o["group"],
        value=o["column"],
    )


def _f_category_entropy(_s, dfs, o):
    from pdal_spark.operators.stats import category_entropy

    return category_entropy(
        _one(dfs, "filters.category_entropy"),
        group_col=o["group"], cat_col=o["column"],
    )


REGISTRY.update({
    "filters.gini": _f_gini,
    "filters.category_entropy": _f_category_entropy,
})


def _f_near_dup_keep_best(_s, dfs, o):
    from pdal_spark.operators.dedup import near_dup_keep_best

    return near_dup_keep_best(
        _one(dfs, "filters.near_dup_keep_best"),
        score_col=o["score"],
        jaccard_threshold=float(o.get("threshold", 0.5)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.near_dup_keep_best": _f_near_dup_keep_best,
})


def _f_weighted_pagerank(_s, dfs, o):
    from pdal_spark.operators.graph import weighted_pagerank

    return weighted_pagerank(
        _one(dfs, "filters.weighted_pagerank"),
        iters=int(o.get("iters", 3)),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
        weight=o.get("weight", "w"),
    )


def _f_spatial_join_estimate(_s, dfs, o):
    from pdal_spark.operators.knn import spatial_join_estimate

    if len(dfs) == 2:
        l, r = dfs
    else:
        l = r = _one(dfs, "filters.spatial_join_estimate")
    return spatial_join_estimate(
        l, r, float(o["radius"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
    )


REGISTRY.update({
    "filters.weighted_pagerank": _f_weighted_pagerank,
    "filters.spatial_join_estimate": _f_spatial_join_estimate,
})


def _f_focal_minmax(_s, dfs, o):
    from pdal_spark.operators.raster import focal_minmax

    return focal_minmax(
        _one(dfs, "filters.focal_minmax"),
        res=int(o["resolution"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({
    "filters.focal_minmax": _f_focal_minmax,
})


def _f_rfm(_s, dfs, o):
    from pdal_spark.operators.temporal import rfm_scores

    return rfm_scores(
        _one(dfs, "filters.rfm"), asof_ts=str(o["asof"]),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        value=o.get("column", "value"),
    )


def _f_session_paths(_s, dfs, o):
    from pdal_spark.operators.temporal import top_session_paths

    return top_session_paths(
        _one(dfs, "filters.session_paths"),
        k=int(o.get("count", 10)), depth=int(o.get("depth", 3)),
        key_col=o.get("group", "user_id"),
        state_col=o.get("column", "event_type"),
        ts=o.get("ts", "ts"), id_col=o.get("id", "event_id"),
    )


def _f_peak_hour(_s, dfs, o):
    from pdal_spark.operators.temporal import peak_hour

    return peak_hour(
        _one(dfs, "filters.peak_hour"),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
    )


REGISTRY.update({
    "filters.rfm": _f_rfm,
    "filters.session_paths": _f_session_paths,
    "filters.peak_hour": _f_peak_hour,
})


def _f_cell_dwell(_s, dfs, o):
    from pdal_spark.operators.hexbin import cell_dwell

    return cell_dwell(
        _one(dfs, "filters.cell_dwell"),
        res=int(o["resolution"]),
        key_col=o.get("group", "user_id"), ts=o.get("ts", "ts"),
        id_col=o.get("id", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


def _f_log_odds(_s, dfs, o):
    from pdal_spark.operators.textops import log_odds_keywords

    if len(dfs) != 2:
        raise PipelineError(
            "filters.log_odds expects two inputs (a, b)"
        )
    return log_odds_keywords(
        dfs[0], dfs[1], top_k=int(o.get("count", 20)),
        prior=int(o.get("prior", 1)),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.cell_dwell": _f_cell_dwell,
    "filters.log_odds": _f_log_odds,
})


# -- round-2 batch: TIN family, UTM, hag_nn, fps, colorinterp modes ------
def _f_reprojection_utm(_s, dfs, o):
    from pdal_spark.operators.transform import reproject_utm

    return reproject_utm(
        _one(dfs, "filters.reprojection_utm"),
        zone=int(o["zone"]),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        south=str(o.get("south", "false")).lower() == "true",
        inverse=str(o.get("inverse", "false")).lower() == "true",
    )


def _f_hag_nn(_s, dfs, o):
    from pdal_spark.operators.raster import hag_nn

    return hag_nn(
        _one(dfs, "filters.hag_nn"),
        count=int(o.get("count", 1)),
        cell=float(o.get("cell", 8.0)),
        ground_class=int(o.get("ground_class", 2)),
        max_distance=float(o.get("max_distance", 0.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), cls=o.get("cls", "classification"),
        id_col=o["id"],
    )


def _f_delaunay(_s, dfs, o):
    from pdal_spark.operators.delaunay import delaunay_tin

    cell = o.get("cell")
    return delaunay_tin(
        _one(dfs, "filters.delaunay"),
        x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
        cell=float(cell) if cell is not None else None,
        buffer=float(o.get("buffer", 0.0)),
    )


def _f_hag_delaunay(_s, dfs, o):
    from pdal_spark.operators.delaunay import hag_delaunay

    cell = o.get("cell")
    return hag_delaunay(
        _one(dfs, "filters.hag_delaunay"),
        x=o.get("x", "lon"), y=o.get("y", "lat"), z=o.get("z", "z"),
        cls=o.get("cls", "classification"), id_col=o["id"],
        ground_class=int(o.get("ground_class", 2)),
        cell=float(cell) if cell is not None else None,
        buffer=float(o.get("buffer", 0.0)),
    )


def _f_faceraster(_s, dfs, o):
    from pdal_spark.operators.delaunay import tin_rasterize

    cell = o.get("cell")
    return tin_rasterize(
        _one(dfs, "filters.faceraster"),
        resolution=float(o["resolution"]),
        origin_x=float(o["origin_x"]), origin_y=float(o["origin_y"]),
        width=int(o["width"]), height=int(o["height"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"), z=o.get("z", "z"),
        id_col=o["id"],
        cell=float(cell) if cell is not None else None,
        buffer=float(o.get("buffer", 0.0)),
    )


def _f_fps(_s, dfs, o):
    from pdal_spark.operators.sampling import fps, fps_approx

    df = _one(dfs, "filters.fps")
    kw = dict(count=int(o["count"]), x=o.get("x", "lon"),
              y=o.get("y", "lat"), id_col=o["id"])
    if str(o.get("exact", "false")).lower() == "true":
        return fps(df, **kw)
    return fps_approx(df, **kw)


def _f_colorinterp(_s, dfs, o):
    from pdal_spark.operators.transform import (
        colorinterp, colorinterp_auto, colorinterp_stddev,
    )

    df = _one(dfs, "filters.colorinterp")
    dim = o.get("dimension", "value")
    mode = o.get("mode", "minmax")
    if mode == "mad":
        return colorinterp_auto(df, dim, k=float(o.get("k", 2.0)))
    if mode == "stddev":
        return colorinterp_stddev(df, dim, k=float(o.get("k", 2.0)))
    return colorinterp(
        df, dim, minimum=float(o["minimum"]),
        maximum=float(o["maximum"]),
    )


def _f_normal_refine(_s, dfs, o):
    from pdal_spark.operators.features import normals_refine

    return normals_refine(
        _one(dfs, "filters.normal_refine"),
        radius=float(o["radius"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"), id_col=o["id"],
    )


REGISTRY.update({
    "filters.reprojection_utm": _f_reprojection_utm,
    "filters.hag_nn": _f_hag_nn,
    "filters.delaunay": _f_delaunay,
    "filters.hag_delaunay": _f_hag_delaunay,
    "filters.faceraster": _f_faceraster,
    "filters.fps": _f_fps,
    "filters.colorinterp": _f_colorinterp,
    "filters.normal_refine": _f_normal_refine,
})


def _f_litree(_s, dfs, o):
    from pdal_spark.operators.cluster import litree

    cell = o.get("cell")
    return litree(
        _one(dfs, "filters.litree"),
        min_points=int(o.get("min_points", 10)),
        min_height=float(o.get("min_height", 3.0)),
        dummy_radius=float(o.get("radius", 100.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        hag=o.get("hag", "hag"), id_col=o["id"],
        cell=float(cell) if cell is not None else None,
        buffer=float(o.get("buffer", 0.0)),
    )


REGISTRY.update({"filters.litree": _f_litree})


def _f_covariancefeatures3d(_s, dfs, o):
    from pdal_spark.operators.features3d import neighborhood_features_3d

    return neighborhood_features_3d(
        _one(dfs, "filters.covariancefeatures3d"),
        radius=float(o["radius"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"), z=o.get("z", "z"),
        id_col=o["id"], mode=o.get("mode", "raw"),
    )


REGISTRY.update({
    "filters.covariancefeatures3d": _f_covariancefeatures3d,
    "filters.normal3d": _f_covariancefeatures3d,
})


def _f_boilerplate(_s, dfs, o):
    from pdal_spark.operators.textops import boilerplate_strip

    return boilerplate_strip(
        _one(dfs, "filters.boilerplate"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
        min_words=int(o.get("min_words", 5)),
        stop_pct=int(o.get("stop_pct", 10)),
        out=o.get("out", "clean_text"),
    )


def _f_knn3d(_s, dfs, o):
    from pdal_spark.operators.knn import knn_join_3d

    if len(dfs) == 1:
        l = r = dfs[0]
    else:
        l, r = dfs
    return knn_join_3d(
        l, r, k=int(o.get("k", 8)),
        radius0=float(o.get("radius", 1.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"), z=o.get("z", "z"),
        id_left=o["id"], id_right=o.get("id_right", o["id"]),
        include_self=str(o.get("include_self", "true")).lower()
        == "true",
    )


REGISTRY.update({
    "filters.boilerplate": _f_boilerplate,
    "filters.knn3d": _f_knn3d,
})


def _f_python(_s, dfs, o):
    """filters.python analog (reference filters/python/ — run a
    user-supplied Python function over the stream; PDAL passes numpy
    views, we pass Arrow-batched pandas frames via mapInPandas).

    Options: `function` = "module.path:callable" resolved by import
    (the spark-submit --py-files distribution path); the callable
    receives an iterator of pandas DataFrames and yields DataFrames
    (the mapInPandas contract — vectorized, never per-row);
    `schema` = output schema DDL (defaults to the input schema, the
    in-place-mutation shape of the reference's add_dimension-less
    scripts).
    """
    import importlib

    df = _one(dfs, "filters.python")
    spec = o["function"]
    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise PipelineError(
            "filters.python `function` must be 'module:callable'"
        )
    try:
        fn = getattr(importlib.import_module(mod_name), fn_name)
    except (ImportError, AttributeError) as e:
        raise PipelineError(
            f"filters.python cannot resolve {spec!r}: {e}"
        ) from e
    schema = o.get("schema") or df.schema
    return df.mapInPandas(fn, schema)


REGISTRY.update({
    "filters.python": _f_python,
    "filters.streamcallback": _f_python,
})


def _f_straighten(_s, dfs, o):
    from pdal_spark.operators.transform import straighten

    line = [(float(a), float(b)) for a, b in o["polyline"]]
    return straighten(
        _one(dfs, "filters.straighten"), line,
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        s_out=o.get("s", "s"), t_out=o.get("t", "t"),
        offset=float(o.get("offset", 0.0)),
        unstraighten=str(o.get("unstraighten", "false")).lower()
        == "true",
    )


REGISTRY.update({"filters.straighten": _f_straighten})


def _f_reprojection_utm_auto(_s, dfs, o):
    from pdal_spark.operators.transform import reproject_utm_auto

    return reproject_utm_auto(
        _one(dfs, "filters.reprojection_utm_auto"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update(
    {"filters.reprojection_utm_auto": _f_reprojection_utm_auto}
)


def _f_georeference(_s, dfs, o):
    from pdal_spark.operators.transform import georeference

    if len(dfs) != 2:
        raise PipelineError(
            "filters.georeference expects two inputs "
            f"(points, trajectory), got {len(dfs)}"
        )
    m = o.get("scan2imu")
    return georeference(
        dfs[0], dfs[1],
        scan2imu=_floats(m) if m is not None else None,
        coordinate_system=o.get("coordinate_system", "NED"),
        time_offset=float(o.get("time_offset", 0.0)),
        time_col=o.get("time_col", "gps_time"),
    )


REGISTRY.update({"filters.georeference": _f_georeference})


def _f_projpipeline(_s, dfs, o):
    from pdal_spark.operators.transform import projpipeline

    return projpipeline(
        _one(dfs, "filters.projpipeline"), o["coord_op"],
        reverse=str(o.get("reverse", "false")).lower() == "true",
        x=o.get("x", "x"), y=o.get("y", "y"),
    )


REGISTRY.update({"filters.projpipeline": _f_projpipeline})


def _r_pcd(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_pcd

    return read_pcd(spark, o["filename"],
                    with_path=str(o.get("with_path", "false")
                                  ).lower() == "true")


def _r_ply(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_ply

    return read_ply(spark, o["filename"],
                    with_path=str(o.get("with_path", "false")
                                  ).lower() == "true")


def _w_pcd(_s, dfs, o):
    from pdal_spark.sources.pointcloud import write_pcd

    df = _one(dfs, "writers.pcd")
    write_pcd(df, o["filename"])
    return df


def _w_ply(_s, dfs, o):
    from pdal_spark.sources.pointcloud import write_ply

    df = _one(dfs, "writers.ply")
    write_ply(df, o["filename"])
    return df


REGISTRY.update({
    "readers.pcd": _r_pcd,
    "readers.ply": _r_ply,
    "writers.pcd": _w_pcd,
    "writers.ply": _w_ply,
})


def _r_sbet(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_sbet

    return read_sbet(
        spark, o["filename"],
        angles_as_degrees=str(o.get("angles_as_degrees", "true")
                              ).lower() == "true")


def _r_pts(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_pts

    return read_pts(spark, o["filename"],
                    separator=o.get("separator", " "))


def _r_obj(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_obj

    return read_obj(spark, o["filename"])


REGISTRY.update({
    "readers.sbet": _r_sbet,
    "readers.pts": _r_pts,
    "readers.obj": _r_obj,
})


def _f_greedyprojection(_s, dfs, o):
    from pdal_spark.operators.delaunay import greedy_projection

    import math as _m
    return greedy_projection(
        _one(dfs, "filters.greedyprojection"),
        radius=float(o["radius"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), id_col=o.get("id", "pid"),
        cell=float(o["cell"]) if "cell" in o else None,
        buffer=float(o.get("buffer", 0.0)),
        min_angle=float(o.get("min_angle", _m.pi / 18)),
        max_angle=float(o.get("max_angle", 2 * _m.pi / 3)),
    )


REGISTRY.update({"filters.greedyprojection": _f_greedyprojection})


def _r_smrmsg(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_smrmsg

    return read_smrmsg(spark, o["filename"])


REGISTRY.update({"readers.smrmsg": _r_smrmsg})


def _w_gltf(_s, dfs, o):
    from pdal_spark.sources.pointcloud import write_gltf

    if len(dfs) != 2:
        raise PipelineError(
            "writers.gltf expects two inputs (triangles, points), "
            f"got {len(dfs)}")
    write_gltf(dfs[0], dfs[1], o["filename"],
               x=o.get("x", "lon"), y=o.get("y", "lat"),
               z=o.get("z", "z"), id_col=o.get("id", "pid"))
    return dfs[0]


REGISTRY.update({"writers.gltf": _w_gltf})


def _r_ilvis2(spark, _dfs, o):
    from pdal_spark.sources.pointcloud import read_ilvis2

    return read_ilvis2(spark, o["filename"],
                       mapping=o.get("mapping", "ALL"))


REGISTRY.update({"readers.ilvis2": _r_ilvis2})


def _w_sbet(_s, dfs, o):
    from pdal_spark.sources.pointcloud import write_sbet

    df = _one(dfs, "writers.sbet")
    write_sbet(df, o["filename"],
               angles_as_degrees=str(o.get("angles_as_degrees",
                                           "true")).lower() == "true")
    return df


REGISTRY.update({"writers.sbet": _w_sbet})


def _f_politeness(_s, dfs, o):
    from pdal_spark.operators.temporal import politeness_schedule

    return politeness_schedule(
        _one(dfs, "filters.politeness"),
        host=o.get("host", "host"),
        arrival_us=o.get("arrival", "arrival_us"),
        delay_us=int(o.get("delay_us", 300000)),
        id_col=o.get("id", "url_id"),
    )


def _f_robots(_s, dfs, o):
    from pdal_spark.operators.textops import robots_rules

    urls, rules = dfs
    return robots_rules(
        urls, rules,
        host=o.get("host", "host"), path=o.get("path", "path"),
        url_id=o.get("id", "url_id"),
        prefix=o.get("prefix", "path_prefix"),
        allow=o.get("allow", "allow"),
    )


def _f_anchoragg(_s, dfs, o):
    from pdal_spark.operators.graph import anchor_text_agg

    return anchor_text_agg(
        _one(dfs, "filters.anchoragg"),
        dst=o.get("dst", "dst"), anchor=o.get("anchor", "anchor"),
        src=o.get("src", "src"), top_k=int(o.get("count", 3)),
    )


def _f_pmi(_s, dfs, o):
    from pdal_spark.operators.textops import pmi_collocations

    return pmi_collocations(
        _one(dfs, "filters.pmi"),
        text=o.get("column", "text"),
        min_count=int(o.get("min_count", 3)),
        top_k=int(o.get("count", 50)),
    )


def _f_maxsim(_s, dfs, o):
    from pdal_spark.operators.similarity import maxsim_topk

    qt, dt = dfs
    return maxsim_topk(qt, dt, k=int(o.get("count", 5)),
                       vec=o.get("column", "embedding"))


def _f_calibration(_s, dfs, o):
    from pdal_spark.operators.stats import calibration_bins

    return calibration_bins(
        _one(dfs, "filters.calibration"),
        score=o.get("score", "score"),
        label=o.get("label", "label"),
        bins=int(o.get("bins", 10)),
    )


REGISTRY.update({
    "filters.politeness": _f_politeness,
    "filters.robots": _f_robots,
    "filters.anchoragg": _f_anchoragg,
    "filters.pmi": _f_pmi,
    "filters.maxsim": _f_maxsim,
    "filters.calibration": _f_calibration,
})


def _f_perplexity(_s, dfs, o):
    from pdal_spark.operators.textops import perplexity_buckets

    return perplexity_buckets(
        _one(dfs, "filters.perplexity"),
        text=o.get("column", "text"),
        id_col=o.get("id", "doc_id"),
        buckets=int(o.get("buckets", 3)),
    )


def _f_sysresample(_s, dfs, o):
    from pdal_spark.operators.sampling import systematic_resample

    return systematic_resample(
        _one(dfs, "filters.sysresample"),
        id_col=o.get("id", "doc_id"),
        weight=o.get("weight", "weight"),
        n_out=int(o["count"]),
    )


def _f_reteval(_s, dfs, o):
    from pdal_spark.operators.similarity import retrieval_eval

    runs, qrels = dfs
    return retrieval_eval(runs, qrels, k=int(o.get("k", 10)))


def _f_changerate(_s, dfs, o):
    from pdal_spark.operators.temporal import change_rate

    return change_rate(
        _one(dfs, "filters.changerate"),
        page=o.get("page", "page"),
        changed=o.get("changed", "changed"),
    )


def _f_embdrift(_s, dfs, o):
    from pdal_spark.operators.similarity import embedding_drift

    a, b = dfs
    return embedding_drift(a, b, o.get("group", "group"),
                           vec=o.get("column", "embedding"))


REGISTRY.update({
    "filters.perplexity": _f_perplexity,
    "filters.sysresample": _f_sysresample,
    "filters.reteval": _f_reteval,
    "filters.changerate": _f_changerate,
    "filters.embdrift": _f_embdrift,
})


def _f_cdc(_s, dfs, o):
    from pdal_spark.operators.dedup import cdc_chunks

    return cdc_chunks(
        _one(dfs, "filters.cdc"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
        mask_bits=int(o.get("mask_bits", 12)),
    )


def _f_redirects(_s, dfs, o):
    from pdal_spark.operators.graph import redirect_resolve

    return redirect_resolve(
        _one(dfs, "filters.redirects"),
        src=o.get("src", "src"), dst=o.get("dst", "dst"),
        max_rounds=int(o.get("max_rounds", 24)),
    )


def _f_novelty(_s, dfs, o):
    from pdal_spark.operators.textops import ngram_novelty

    scored, reference = dfs
    return ngram_novelty(scored, reference,
                         n=int(o.get("n", 3)),
                         text=o.get("column", "text"),
                         id_col=o.get("id", "doc_id"))


def _f_oov(_s, dfs, o):
    from pdal_spark.operators.textops import oov_curve

    return oov_curve(_one(dfs, "filters.oov"),
                     vocab_sizes=[int(k) for k in o["sizes"]],
                     text=o.get("column", "text"))


REGISTRY.update({
    "filters.cdc": _f_cdc,
    "filters.redirects": _f_redirects,
    "filters.novelty": _f_novelty,
    "filters.oov": _f_oov,
})


def _f_linededup(_s, dfs, o):
    from pdal_spark.operators.textops import line_dedup

    return line_dedup(
        _one(dfs, "filters.linededup"),
        text=o.get("column", "text"), doc_id=o.get("id", "doc_id"),
        min_docs=int(o.get("min_docs", 2)),
        min_len=int(o.get("min_len", 1)),
        sep=o.get("sep", "\n"),
        keep_first=str(o.get("keep_first", "false")).lower()
        == "true",
    )


def _f_luhn(_s, dfs, o):
    from pdal_spark.operators.textops import luhn_flags

    return luhn_flags(
        _one(dfs, "filters.luhn"),
        text=o.get("column", "text"), doc_id=o.get("id", "doc_id"),
        min_digits=int(o.get("min_digits", 13)),
        max_digits=int(o.get("max_digits", 19)),
    )


def _f_pathrollup(_s, dfs, o):
    from pdal_spark.operators.textops import url_path_rollup

    return url_path_rollup(
        _one(dfs, "filters.pathrollup"),
        url=o.get("column", "url"),
        max_depth=int(o.get("max_depth", 8)),
    )


def _f_classeval(_s, dfs, o):
    from pdal_spark.operators.stats import classification_eval

    predicted, truth = dfs
    return classification_eval(
        predicted, truth,
        labels=[int(v) for v in o["labels"]],
        id_col=o.get("id", "pid"),
        label_col=o.get("column", "Classification"),
    )


REGISTRY.update({
    "filters.linededup": _f_linededup,
    "filters.luhn": _f_luhn,
    "filters.pathrollup": _f_pathrollup,
    "filters.classeval": _f_classeval,
})


def _f_bitext(_s, dfs, o):
    from pdal_spark.operators.similarity import bitext_margin_topk

    src, tgt = dfs
    return bitext_margin_topk(
        src, tgt, k=int(o.get("count", 4)),
        vec=o.get("column", "embedding"),
        id_col=o.get("id", "vec_id"),
    )


def _f_negsample(_s, dfs, o):
    from pdal_spark.operators.sampling import negative_sample

    anchors, pool = dfs
    return negative_sample(
        anchors, pool, k=int(o.get("count", 5)),
        id_col=o.get("id", "vec_id"),
        label=o.get("label", "label"),
    )


def _f_unigramkl(_s, dfs, o):
    from pdal_spark.operators.textops import unigram_kl

    df_a, df_b = dfs
    return unigram_kl(df_a, df_b, text=o.get("column", "text"))


REGISTRY.update({
    "filters.bitext": _f_bitext,
    "filters.negsample": _f_negsample,
    "filters.unigramkl": _f_unigramkl,
})


def _f_segjoin(_s, dfs, o):
    from pdal_spark.operators.transform import (
        segment_intersection_join,
    )

    a, b = dfs
    return segment_intersection_join(
        a, b, cell=int(o.get("cell", 64)),
        id_a=o.get("id_a", "a_id"), id_b=o.get("id_b", "b_id"),
    )


def _f_fairbudget(_s, dfs, o):
    from pdal_spark.operators.textops import fair_budget

    return fair_budget(
        _one(dfs, "filters.fairbudget"),
        group=o.get("group", "host"),
        demand=o.get("column", "demand"),
        budget=int(o["budget"]),
    )


REGISTRY.update({
    "filters.segjoin": _f_segjoin,
    "filters.fairbudget": _f_fairbudget,
})


def _f_mixplan(_s, dfs, o):
    from pdal_spark.operators.textops import mixing_plan

    return mixing_plan(
        _one(dfs, "filters.mixplan"),
        source=o.get("group", "source"),
        avail=o.get("avail", "n_tokens"),
        weight=o.get("weight", "weight_q"),
        budget=int(o["budget"]),
    )


REGISTRY.update({"filters.mixplan": _f_mixplan})


def _f_knnpredict(_s, dfs, o):
    from pdal_spark.operators.similarity import knn_predict

    queries, corpus = dfs
    return knn_predict(
        queries, corpus, k=int(o.get("count", 5)),
        vec=o.get("column", "embedding"),
        id_col=o.get("id", "vec_id"),
        label=o.get("label", "label"),
    )


def _f_winsorize(_s, dfs, o):
    from pdal_spark.operators.stats import winsorize

    return winsorize(
        _one(dfs, "filters.winsorize"),
        value=o.get("column", "value"),
        group_col=o.get("group", "event_type"),
        id_col=o.get("id", "event_id"),
        lo_frac=float(o.get("lo", 0.05)),
        hi_frac=float(o.get("hi", 0.95)),
    )


REGISTRY.update({
    "filters.knnpredict": _f_knnpredict,
    "filters.winsorize": _f_winsorize,
})


def _f_rbo(_s, dfs, o):
    from pdal_spark.operators.similarity import rbo_overlap

    run_a, run_b = dfs
    return rbo_overlap(
        run_a, run_b, k=int(o.get("count", 10)),
        p=float(o.get("p", 0.9)),
        query_id=o.get("query", "query_id"),
        doc_id=o.get("id", "doc_id"),
        rank=o.get("rank", "rank"),
    )


def _f_wilson(_s, dfs, o):
    from pdal_spark.operators.stats import wilson_interval

    return wilson_interval(
        _one(dfs, "filters.wilson"),
        group_col=o.get("group", "event_type"),
        success_pred=o["predicate"],
    )


REGISTRY.update({
    "filters.rbo": _f_rbo,
    "filters.wilson": _f_wilson,
})


def _f_ginisplit(_s, dfs, o):
    from pdal_spark.operators.stats import gini_split

    return gini_split(
        _one(dfs, "filters.ginisplit"),
        feature=o.get("column", "value"),
        label_pred=o["predicate"],
    )


def _f_woe(_s, dfs, o):
    from pdal_spark.operators.stats import woe_bins

    return woe_bins(
        _one(dfs, "filters.woe"),
        value=o.get("column", "value"),
        label_pred=o["predicate"],
        lo=float(o["lo"]), hi=float(o["hi"]),
        n_bins=int(o.get("bins", 10)),
    )


REGISTRY.update({
    "filters.ginisplit": _f_ginisplit,
    "filters.woe": _f_woe,
})


def _f_ewma(_s, dfs, o):
    from pdal_spark.operators.temporal import ewma_smooth

    return ewma_smooth(
        _one(dfs, "filters.ewma"),
        key=o.get("group", "user_id"),
        order_col=o.get("order", "event_id"),
        value=o.get("column", "value"),
        num=int(o.get("num", 2)), den=int(o.get("den", 10)),
    )


def _f_rollmedian(_s, dfs, o):
    from pdal_spark.operators.temporal import rolling_median

    return rolling_median(
        _one(dfs, "filters.rollmedian"),
        key=o.get("group", "event_type"),
        order_col=o.get("order", "event_id"),
        value=o.get("column", "value"),
        width=int(o.get("width", 7)),
    )


REGISTRY.update({
    "filters.ewma": _f_ewma,
    "filters.rollmedian": _f_rollmedian,
})


def _f_hillshade(_s, dfs, o):
    from pdal_spark.operators.raster import hillshade

    return hillshade(
        _one(dfs, "filters.hillshade"),
        res=int(o["resolution"]),
        azimuth_deg=float(o.get("azimuth", 315.0)),
        altitude_deg=float(o.get("altitude", 45.0)),
        z_scale=float(o.get("z_scale", 1.0)),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_slopeaspect(_s, dfs, o):
    from pdal_spark.operators.raster import slope_aspect

    return slope_aspect(
        _one(dfs, "filters.slopeaspect"),
        res=int(o["resolution"]),
        z_scale=float(o.get("z_scale", 1.0)),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({
    "filters.hillshade": _f_hillshade,
    "filters.slopeaspect": _f_slopeaspect,
})


def _f_contour(_s, dfs, o):
    from pdal_spark.operators.raster import contour_segments

    return contour_segments(
        _one(dfs, "filters.contour"),
        res=int(o["resolution"]), iso=float(o["iso"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({"filters.contour": _f_contour})


def _f_segradius(_s, dfs, o):
    from pdal_spark.operators.transform import segment_radius_join

    points, segments = dfs
    return segment_radius_join(
        points, segments, radius=int(o["radius"]),
        cell=int(o.get("cell", 64)),
        id_p=o.get("id_p", "p_id"), id_s=o.get("id_s", "seg_id"),
    )


REGISTRY.update({"filters.segradius": _f_segradius})


def _f_scd2(_s, dfs, o):
    from pdal_spark.operators.temporal import scd2_intervals

    return scd2_intervals(
        _one(dfs, "filters.scd2"),
        key=o.get("group", "user_id"),
        ts_us=o.get("order", "event_id"),
        value=o.get("column", "event_type"),
    )


def _f_anonurls(_s, dfs, o):
    from pdal_spark.operators.textops import anonymize_urls

    return anonymize_urls(
        _one(dfs, "filters.anonurls"),
        url=o.get("column", "url"),
    )


REGISTRY.update({
    "filters.scd2": _f_scd2,
    "filters.anonurls": _f_anonurls,
})


def _f_ks(_s, dfs, o):
    from pdal_spark.operators.stats import ks_test

    df_a, df_b = dfs
    return ks_test(df_a, df_b, o.get("column", "value"))


def _f_mwu(_s, dfs, o):
    from pdal_spark.operators.stats import mann_whitney_u

    df_a, df_b = dfs
    return mann_whitney_u(df_a, df_b, o.get("column", "value"))


REGISTRY.update({
    "filters.kstest": _f_ks,
    "filters.mannwhitney": _f_mwu,
})


def _f_blockeval(_s, dfs, o):
    from pdal_spark.operators.dedup import blocking_eval

    candidates, gold = dfs
    return blocking_eval(
        candidates, gold, n_records=int(o["n_records"]),
        a=o.get("a", "a"), b=o.get("b", "b"),
    )


REGISTRY.update({"filters.blockeval": _f_blockeval})


def _f_prf(_s, dfs, o):
    from pdal_spark.operators.textops import prf_expansion

    return prf_expansion(
        _one(dfs, "filters.prf"),
        terms=list(o["terms"]),
        k=int(o.get("count", 10)), m=int(o.get("expansions", 10)),
        text=o.get("column", "text"),
        id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({"filters.prf": _f_prf})


# ---------------------------------------------------------------------------
# Round-2 session-3 stages: graph/eval/LM ops and the D8 terrain,
# similarity, image-hash, and spatial-statistics families.
# ---------------------------------------------------------------------------


def _f_wasserstein(_s, dfs, o):
    from pdal_spark.operators.stats import wasserstein_1d

    df_a, df_b = dfs
    return wasserstein_1d(df_a, df_b, o.get("column", "value"))


def _f_cuped(_s, dfs, o):
    from pdal_spark.operators.stats import cuped_adjust

    return cuped_adjust(
        _one(dfs, "filters.cuped"), group_col=o["group"],
        metric_q=o["metric"], covariate_q=o["covariate"],
    )


def _f_geary(_s, dfs, o):
    from pdal_spark.operators.stats import geary_c

    return geary_c(_one(dfs, "filters.geary"), res=int(o["res"]),
                   cell=o.get("cell", "cell"),
                   value=o.get("column", "x"))


def _f_local_moran(_s, dfs, o):
    from pdal_spark.operators.stats import local_morans_i

    return local_morans_i(
        _one(dfs, "filters.localmoran"), res=int(o["res"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_ripleys(_s, dfs, o):
    from pdal_spark.operators.stats import ripleys_k

    return ripleys_k(
        _one(dfs, "filters.ripleysk"),
        radii_q=[int(r) for r in o["radii"]], id_col=o["id"],
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        coord_q=int(o.get("coord_q", 1 << 10)),
    )


def _f_semivariogram(_s, dfs, o):
    from pdal_spark.operators.stats import semivariogram

    return semivariogram(
        _one(dfs, "filters.semivariogram"), value=o["column"],
        id_col=o["id"], x=o.get("x", "lon"), y=o.get("y", "lat"),
        bin_q=int(o.get("bin_q", 1 << 10)),
        n_bins=int(o.get("bins", 8)),
        coord_q=int(o.get("coord_q", 1 << 10)),
        value_q=int(o.get("value_q", 1 << 10)),
    )


REGISTRY.update({
    "filters.wasserstein": _f_wasserstein,
    "filters.cuped": _f_cuped,
    "filters.geary": _f_geary,
    "filters.localmoran": _f_local_moran,
    "filters.ripleysk": _f_ripleys,
    "filters.semivariogram": _f_semivariogram,
})


def _f_ktruss(_s, dfs, o):
    from pdal_spark.operators.graph import k_truss

    return k_truss(_one(dfs, "filters.ktruss"), k=int(o["k"]))


def _f_hyperball(_s, dfs, o):
    from pdal_spark.operators.graph import hyperball

    return hyperball(_one(dfs, "filters.hyperball"),
                     max_depth=int(o.get("depth", 3)),
                     directed=bool(o.get("directed", True)))


def _f_betweenness(_s, dfs, o):
    from pdal_spark.operators.graph import betweenness_sampled

    return betweenness_sampled(
        _one(dfs, "filters.betweenness"),
        sources=[int(s) for s in o["sources"]],
    )


def _f_sssp(_s, dfs, o):
    from pdal_spark.operators.graph import weighted_sssp

    return weighted_sssp(
        _one(dfs, "filters.sssp"),
        sources=[int(s) for s in o["sources"]],
        rounds=int(o.get("rounds", 6)), weight=o.get("weight"),
    )


def _f_modularity(_s, dfs, o):
    from pdal_spark.operators.graph import modularity

    edges, assign = dfs
    return modularity(edges, assign)


def _f_conductance(_s, dfs, o):
    from pdal_spark.operators.graph import conductance

    edges, assign = dfs
    return conductance(edges, assign)


def _f_luby(_s, dfs, o):
    from pdal_spark.operators.graph import luby_mis

    return luby_mis(_one(dfs, "filters.lubymis"),
                    rounds=int(o.get("rounds", 8)))


def _f_nmi(_s, dfs, o):
    from pdal_spark.operators.cluster import clustering_nmi

    return clustering_nmi(
        _one(dfs, "filters.clusternmi"),
        a_col=o.get("a", "cluster"), b_col=o.get("b", "label"),
    )


REGISTRY.update({
    "filters.ktruss": _f_ktruss,
    "filters.hyperball": _f_hyperball,
    "filters.betweenness": _f_betweenness,
    "filters.sssp": _f_sssp,
    "filters.modularity": _f_modularity,
    "filters.conductance": _f_conductance,
    "filters.lubymis": _f_luby,
    "filters.clusternmi": _f_nmi,
})


def _f_kneser(_s, dfs, o):
    from pdal_spark.operators.textops import kneser_ney_bigram

    return kneser_ney_bigram(
        _one(dfs, "filters.kneserney"), text=o.get("column", "text"),
        min_count=int(o.get("min_count", 1)),
    )


def _f_goodturing(_s, dfs, o):
    from pdal_spark.operators.textops import good_turing

    return good_turing(_one(dfs, "filters.goodturing"),
                       text=o.get("column", "text"))


def _f_ppmi(_s, dfs, o):
    from pdal_spark.operators.textops import ppmi_cooc

    return ppmi_cooc(
        _one(dfs, "filters.ppmi"),
        window=int(o.get("window", 3)),
        min_count=int(o.get("min_count", 3)),
        top_k=int(o.get("count", 60)), text=o.get("column", "text"),
    )


def _f_texttiling(_s, dfs, o):
    from pdal_spark.operators.textops import text_tiling

    return text_tiling(
        _one(dfs, "filters.texttiling"), text=o.get("column", "text"),
        id_col=o.get("id", "doc_id"),
        block_tokens=int(o.get("block_tokens", 10)),
        peak_window=int(o.get("peak_window", 2)),
    )


def _f_multipattern(_s, dfs, o):
    from pdal_spark.operators.textops import multi_pattern_counts

    return multi_pattern_counts(
        _one(dfs, "filters.multipattern"),
        patterns=list(o["patterns"]), text=o.get("column", "text"),
        id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.kneserney": _f_kneser,
    "filters.goodturing": _f_goodturing,
    "filters.ppmi": _f_ppmi,
    "filters.texttiling": _f_texttiling,
    "filters.multipattern": _f_multipattern,
})


def _f_cms_build(_s, dfs, o):
    from pdal_spark.operators.sketch import cms_build

    return cms_build(
        _one(dfs, "filters.cmsbuild"), elem_col=o["column"],
        weight_col=o.get("weight"),
    )


def _f_cms_estimate(_s, dfs, o):
    from pdal_spark.operators.sketch import cms_estimate

    probes, cms = dfs
    return cms_estimate(probes, cms, elem_col=o["column"])


def _f_scenecuts(_s, dfs, o):
    from pdal_spark.operators.multimodal import scene_cuts

    return scene_cuts(
        _one(dfs, "filters.scenecuts"),
        every=int(o.get("every", 1000)),
        cut_pct=int(o.get("cut_pct", 50)),
        codec=o.get("codec"),
    )


def _f_ahash(_s, dfs, o):
    from pdal_spark.operators.multimodal import image_ahash

    return image_ahash(_one(dfs, "filters.ahash"),
                       payload=o.get("column", "payload"),
                       id_col=o.get("id", "doc_id"),
                       codec=o.get("codec"))


def _f_ahash_pairs(_s, dfs, o):
    from pdal_spark.operators.multimodal import ahash_pairs

    return ahash_pairs(_one(dfs, "filters.ahashpairs"),
                       max_hamming=int(o.get("max_hamming", 3)),
                       id_col=o.get("id", "id"))


def _f_dhash(_s, dfs, o):
    from pdal_spark.operators.multimodal import image_dhash

    return image_dhash(_one(dfs, "filters.dhash"),
                       payload=o.get("column", "payload"),
                       id_col=o.get("id", "doc_id"),
                       codec=o.get("codec"))


REGISTRY.update({
    "filters.cmsbuild": _f_cms_build,
    "filters.cmsestimate": _f_cms_estimate,
    "filters.scenecuts": _f_scenecuts,
    "filters.ahash": _f_ahash,
    "filters.ahashpairs": _f_ahash_pairs,
    "filters.dhash": _f_dhash,
})


def _f_mapmatch(_s, dfs, o):
    from pdal_spark.operators.transform import map_match

    return map_match(
        _one(dfs, "filters.mapmatch"),
        lines=[(int(i), [(float(x), float(y)) for x, y in pts])
               for i, pts in o["lines"]],
        switch_penalty_q=int(o["penalty_q"]),
        key_col=o.get("key", "user_id"),
        order_col=o.get("order", "event_id"),
    )


def _f_seasonal(_s, dfs, o):
    from pdal_spark.operators.temporal import seasonal_decompose

    return seasonal_decompose(
        _one(dfs, "filters.seasonal"), key=o["key"],
        order_col=o["order"], value=o["column"],
        period=int(o.get("period", 24)),
    )


def _f_burst_detect(_s, dfs, o):
    from pdal_spark.operators.temporal import BURST_Q, burst_detect

    return burst_detect(
        _one(dfs, "filters.burstdetect"), key=o["key"],
        ts_us=o["ts_us"], s_num=int(o.get("s_num", 3)),
        s_den=int(o.get("s_den", 1)),
        penalty_q=int(o.get("penalty_q", 2 * BURST_Q)),
    )


def _f_dtw(_s, dfs, o):
    from pdal_spark.operators.temporal import dtw_distance

    return dtw_distance(
        _one(dfs, "filters.dtw"), key=o["key"], order=o["order"],
        value=o["column"], block=o.get("block"),
        band=o.get("band"),
    )


def _f_holt(_s, dfs, o):
    from pdal_spark.operators.temporal import holt_linear

    return holt_linear(
        _one(dfs, "filters.holt"), key=o["key"], order=o["order"],
        value=o["column"], alpha_q=int(o.get("alpha_q", 307)),
        beta_q=int(o.get("beta_q", 102)),
    )


def _f_hausdorff_pairs(_s, dfs, o):
    from pdal_spark.operators.knn import hausdorff_pairs

    return hausdorff_pairs(
        _one(dfs, "filters.hausdorffpairs"), key=o["key"],
        block=o["block"], x=o.get("x", "lon"), y=o.get("y", "lat"),
        coord_q=int(o.get("coord_q", 1 << 20)),
    )


REGISTRY.update({
    "filters.mapmatch": _f_mapmatch,
    "filters.seasonal": _f_seasonal,
    "filters.burstdetect": _f_burst_detect,
    "filters.dtw": _f_dtw,
    "filters.holt": _f_holt,
    "filters.hausdorffpairs": _f_hausdorff_pairs,
})


def _f_cells_op(name, fn_name):
    def run(_s, dfs, o):
        import pdal_spark.operators.raster as R

        fn = getattr(R, fn_name)
        kw = dict(res=int(o["res"]), cell=o.get("cell", "cell"),
                  value=o.get("column", "x"))
        if "rounds" in o:
            kw["rounds" if fn_name in ("cost_distance",
                                       "cost_path_tree",
                                       "strahler_order")
               else "max_rounds"] = int(o["rounds"])
        if fn_name == "cost_distance":
            kw["sources"] = [int(s) for s in o["sources"]]
        if fn_name == "cost_path_tree":
            kw["source"] = int(o["source"])
        if fn_name == "viewshed_transect":
            kw["origin"] = int(o["origin"])
        return fn(_one(dfs, name), **kw)

    return run


REGISTRY.update({
    "filters.flowdirection": _f_cells_op("filters.flowdirection",
                                         "flow_direction"),
    "filters.flowaccumulation": _f_cells_op(
        "filters.flowaccumulation", "flow_accumulation"),
    "filters.watershed": _f_cells_op("filters.watershed",
                                     "watershed_label"),
    "filters.terrainindices": _f_cells_op("filters.terrainindices",
                                          "terrain_indices"),
    "filters.viewshed": _f_cells_op("filters.viewshed",
                                    "viewshed_transect"),
    "filters.costdistance": _f_cells_op("filters.costdistance",
                                        "cost_distance"),
    "filters.costpathtree": _f_cells_op("filters.costpathtree",
                                        "cost_path_tree"),
    "filters.strahler": _f_cells_op("filters.strahler",
                                    "strahler_order"),
    "filters.filldepressions": _f_cells_op("filters.filldepressions",
                                           "fill_depressions"),
})


def _f_odflows(_s, dfs, o):
    from pdal_spark.operators.h3 import od_flows

    return od_flows(
        _one(dfs, "filters.odflows"), key=o["key"], order=o["order"],
        res=int(o["res"]), lat=o.get("lat", "lat"),
        lon=o.get("lon", "lon"),
    )


def _f_hough(_s, dfs, o):
    from pdal_spark.operators.h3 import hough_lines

    return hough_lines(
        _one(dfs, "filters.hough"), x=o.get("x", "lon"),
        y=o.get("y", "lat"), n_thetas=int(o.get("thetas", 16)),
        rho_bin_q=int(o.get("rho_bin_q", 1 << 21)),
        coord_q=int(o.get("coord_q", 1 << 10)),
        top_n=int(o.get("count", 25)),
    )


REGISTRY.update({
    "filters.odflows": _f_odflows,
    "filters.hough": _f_hough,
})


REGISTRY.update({
    "filters.resolveflats": _f_cells_op("filters.resolveflats",
                                        "resolve_flats"),
})


def _f_channel(_s, dfs, o):
    from pdal_spark.operators.raster import channel_network

    return channel_network(
        _one(dfs, "filters.channelnetwork"), res=int(o["res"]),
        acc_threshold=int(o["threshold"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({"filters.channelnetwork": _f_channel})


def _f_chaikin(_s, dfs, o):
    from pdal_spark.operators.transform import chaikin_smooth

    return chaikin_smooth(
        _one(dfs, "filters.chaikin"),
        rounds=int(o.get("rounds", 2)),
        key_col=o.get("key", "user_id"),
        order_col=o.get("order", "event_id"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        coord_q=int(o.get("coord_q", 1 << 20)),
    )


def _f_poly_centroid(_s, dfs, o):
    from pdal_spark.operators.features import polygon_centroid

    return polygon_centroid(
        _one(dfs, "filters.polycentroid"),
        poly_id=o.get("id", "poly_id"), seq=o.get("seq", "seq"),
        x=o.get("x", "xq"), y=o.get("y", "yq"),
    )


def _f_focal_weighted(_s, dfs, o):
    from pdal_spark.operators.raster import focal_weighted

    return focal_weighted(
        _one(dfs, "filters.focalweighted"), res=int(o["res"]),
        weights=tuple(int(w) for w in o.get("weights", [4, 2, 1])),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_gravity(_s, dfs, o):
    from pdal_spark.operators.h3 import gravity_residuals

    return gravity_residuals(
        _one(dfs, "filters.gravity"), key=o["key"],
        order=o["order"], res=int(o["res"]),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({
    "filters.chaikin": _f_chaikin,
    "filters.polycentroid": _f_poly_centroid,
    "filters.focalweighted": _f_focal_weighted,
    "filters.gravity": _f_gravity,
})


def _f_hrw(_s, dfs, o):
    from pdal_spark.operators.textops import hrw_assign

    return hrw_assign(
        _one(dfs, "filters.hrw"), n_shards=int(o["shards"]),
        id_col=o.get("id", "doc_id"), salt=int(o.get("salt", 0)),
    )


def _f_headings(_s, dfs, o):
    from pdal_spark.operators.textops import extract_headings

    return extract_headings(
        _one(dfs, "filters.headings"),
        html=o.get("column", "html"), id_col=o.get("id", "doc_id"),
        max_level=int(o.get("max_level", 3)),
    )


def _f_isochrone(_s, dfs, o):
    from pdal_spark.operators.raster import isochrone_cells

    return isochrone_cells(
        _one(dfs, "filters.isochrone"), res=int(o["res"]),
        sources=[int(s) for s in o["sources"]],
        band_q=int(o["band_q"]), n_bands=int(o["bands"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
        rounds=int(o.get("rounds", 48)),
    )


REGISTRY.update({
    "filters.hrw": _f_hrw,
    "filters.headings": _f_headings,
    "filters.isochrone": _f_isochrone,
})


def _f_colocation(_s, dfs, o):
    from pdal_spark.operators.stats import colocation_ratio

    return colocation_ratio(
        _one(dfs, "filters.colocation"), category=o["category"],
        id_col=o["id"], max_d_q=int(o["radius_q"]),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        coord_q=int(o.get("coord_q", 1 << 10)),
    )


def _f_mannkendall(_s, dfs, o):
    from pdal_spark.operators.temporal import mann_kendall

    return mann_kendall(
        _one(dfs, "filters.mannkendall"), key=o["key"],
        order=o["order"], value=o["column"],
    )


REGISTRY.update({
    "filters.colocation": _f_colocation,
    "filters.mannkendall": _f_mannkendall,
})


def _f_skyline(_s, dfs, o):
    from pdal_spark.operators.stats import skyline_2d

    return skyline_2d(
        _one(dfs, "filters.skyline"), a=o["a"], b=o["b"],
        id_col=o.get("id"),
    )


def _f_acf(_s, dfs, o):
    from pdal_spark.operators.temporal import acf

    return acf(
        _one(dfs, "filters.acf"), key=o["key"], order=o["order"],
        value=o["column"], max_lag=int(o.get("max_lag", 6)),
    )


def _f_golden(_s, dfs, o):
    from pdal_spark.operators.dedup import golden_record

    return golden_record(
        _one(dfs, "filters.goldenrecord"), cluster=o["cluster"],
        ts=o["ts"], fields=list(o["fields"]),
        id_col=o.get("id", "doc_id"),
    )


REGISTRY.update({
    "filters.skyline": _f_skyline,
    "filters.acf": _f_acf,
    "filters.goldenrecord": _f_golden,
})


def _f_dt(_s, dfs, o):
    from pdal_spark.operators.raster import distance_transform

    return distance_transform(
        _one(dfs, "filters.distancetransform"), res=int(o["res"]),
        cell=o.get("cell", "cell"),
        max_rounds=int(o.get("horizon", 32)),
    )


def _f_basin_stats(_s, dfs, o):
    from pdal_spark.operators.raster import basin_stats

    return basin_stats(
        _one(dfs, "filters.basinstats"), res=int(o["res"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


REGISTRY.update({
    "filters.distancetransform": _f_dt,
    "filters.flowpathlength": _f_cells_op("filters.flowpathlength",
                                          "flow_path_length"),
    "filters.basinstats": _f_basin_stats,
})


def _f_itemsets(_s, dfs, o):
    from pdal_spark.operators.textops import frequent_itemsets

    return frequent_itemsets(
        _one(dfs, "filters.itemsets"), basket=o["basket"],
        item=o["item"], min_support=int(o["min_support"]),
        max_size=int(o.get("max_size", 3)),
    )


def _f_sax(_s, dfs, o):
    from pdal_spark.operators.temporal import sax_words

    return sax_words(
        _one(dfs, "filters.sax"), key=o["key"], order=o["order"],
        value=o["column"], n_segments=int(o.get("segments", 8)),
        breakpoints_q=tuple(int(b) for b in
                            o.get("breakpoints", [-431, 0, 431])),
    )


REGISTRY.update({
    "filters.itemsets": _f_itemsets,
    "filters.sax": _f_sax,
})


def _f_cell_jaccard(_s, dfs, o):
    from pdal_spark.operators.h3 import cell_jaccard_pairs

    return cell_jaccard_pairs(
        _one(dfs, "filters.celljaccard"), key=o["key"],
        block=o["block"], res=int(o["res"]),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({"filters.celljaccard": _f_cell_jaccard})


def _f_sd_ellipse(_s, dfs, o):
    from pdal_spark.operators.pointpattern import sd_ellipse

    return sd_ellipse(
        _one(dfs, "filters.sd_ellipse"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
    )


def _f_quadrat(_s, dfs, o):
    from pdal_spark.operators.pointpattern import quadrat_stats

    return quadrat_stats(
        _one(dfs, "filters.quadrat"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        res=int(o.get("resolution", 6)),
    )


def _f_clark_evans(_s, dfs, o):
    from pdal_spark.operators.pointpattern import clark_evans

    return clark_evans(
        _one(dfs, "filters.clark_evans"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o.get("id", "pid"),
        cell=float(o.get("cell", 10000.0)),
    )


def _f_hull_diameter(_s, dfs, o):
    from pdal_spark.operators.pointpattern import hull_diameter

    return hull_diameter(
        _one(dfs, "filters.hull_diameter"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        quant=int(o.get("quant", 1 << 20)),
    )


def _f_join_counts(_s, dfs, o):
    from pdal_spark.operators.pointpattern import join_counts

    return join_counts(
        _one(dfs, "filters.join_counts"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        res=int(o.get("resolution", 6)),
        threshold=int(o.get("threshold", 2)),
    )


REGISTRY.update({
    "filters.sd_ellipse": _f_sd_ellipse,
    "filters.quadrat": _f_quadrat,
    "filters.clark_evans": _f_clark_evans,
    "filters.hull_diameter": _f_hull_diameter,
    "filters.join_counts": _f_join_counts,
})


def _f_readability(_s, dfs, o):
    from pdal_spark.operators.textops import readability_scores

    return readability_scores(
        _one(dfs, "filters.readability"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_yules_k(_s, dfs, o):
    from pdal_spark.operators.textops import yules_k

    return yules_k(
        _one(dfs, "filters.yules_k"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
    )


def _f_idw_loocv(_s, dfs, o):
    from pdal_spark.operators.raster import idw_loocv

    return idw_loocv(
        _one(dfs, "filters.idw_loocv"), radius=float(o["radius"]),
        value=o.get("column", "value"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o.get("id", "sid"),
    )


def _f_polygon_compactness(_s, dfs, o):
    from pdal_spark.operators.features import polygon_compactness

    return polygon_compactness(
        _one(dfs, "filters.polygon_compactness"),
        poly_id=o.get("poly_id", "poly_id"),
        seq=o.get("seq", "seq"),
        x=o.get("x", "xq"), y=o.get("y", "yq"),
    )


def _f_emerging_hotspots(_s, dfs, o):
    from pdal_spark.operators.temporal import emerging_hotspots

    return emerging_hotspots(
        _one(dfs, "filters.emerging_hotspots"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        ts=o.get("ts", "ts"), res=int(o.get("resolution", 3)),
        us_per_bin=int(o.get("us_per_bin", 86_400_000_000)),
        min_total=int(o.get("min_total", 50)),
    )


REGISTRY.update({
    "filters.readability": _f_readability,
    "filters.yules_k": _f_yules_k,
    "filters.idw_loocv": _f_idw_loocv,
    "filters.polygon_compactness": _f_polygon_compactness,
    "filters.emerging_hotspots": _f_emerging_hotspots,
})


def _f_frechet(_s, dfs, o):
    from pdal_spark.operators.temporal import frechet_pairs

    return frechet_pairs(
        _one(dfs, "filters.frechet"), key=o["key"], order=o["order"],
        x=o.get("x", "xq"), y=o.get("y", "yq"),
        block=o.get("block"),
    )


def _f_k_anonymity(_s, dfs, o):
    from pdal_spark.operators.textops import k_anonymity

    return k_anonymity(
        _one(dfs, "filters.k_anonymity"),
        qi_cols=list(o["columns"]), k=int(o.get("k", 5)),
        sensitive=o.get("sensitive"), l_div=int(o.get("l", 2)),
    )


def _f_geo_k_anonymize(_s, dfs, o):
    from pdal_spark.operators.h3 import geo_k_anonymize

    return geo_k_anonymize(
        _one(dfs, "filters.geo_k_anonymize"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        id_col=o.get("id", "pid"), k=int(o.get("k", 10)),
        max_res=int(o.get("max_res", 12)),
    )


REGISTRY.update({
    "filters.frechet": _f_frechet,
    "filters.k_anonymity": _f_k_anonymity,
    "filters.geo_k_anonymize": _f_geo_k_anonymize,
})


def _f_spherical_area(_s, dfs, o):
    from pdal_spark.operators.features import spherical_polygon_area

    return spherical_polygon_area(
        _one(dfs, "filters.spherical_area"),
        poly_id=o.get("poly_id", "poly_id"), seq=o.get("seq", "seq"),
        lon=o.get("lon", "lon"), lat=o.get("lat", "lat"),
    )


def _f_burrows_delta(_s, dfs, o):
    from pdal_spark.operators.textops import burrows_delta

    return burrows_delta(
        _one(dfs, "filters.burrows_delta"),
        text=o.get("column", "text"), id_col=o.get("id", "doc_id"),
        top_m=int(o.get("top_m", 32)),
        block_mod=int(o.get("block", 8)),
    )


REGISTRY.update({
    "filters.spherical_area": _f_spherical_area,
    "filters.burrows_delta": _f_burrows_delta,
})


def _f_knox(_s, dfs, o):
    from pdal_spark.operators.pointpattern import knox_test

    return knox_test(
        _one(dfs, "filters.knox"),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        ts=o.get("ts", "ts"), id_col=o.get("id", "pid"),
        space_md=int(o.get("space_md", 2000)),
        time_us=int(o.get("time_us", 86_400_000_000)),
    )


def _f_jl_projection(_s, dfs, o):
    from pdal_spark.operators.similarity import jl_projection

    return jl_projection(
        _one(dfs, "filters.jl_projection"),
        out_dim=int(o.get("out_dim", 8)),
        vec=o.get("column", "embedding"),
        id_col=o.get("id", "vec_id"),
        dims=int(o.get("dims", 64)),
    )


def _f_suppress_small(_s, dfs, o):
    from pdal_spark.operators.textops import suppress_small_groups

    return suppress_small_groups(
        _one(dfs, "filters.suppress_small"),
        group_cols=list(o["columns"]), k=int(o.get("k", 5)),
        other_label=o.get("other_label", "__other__"),
    )


REGISTRY.update({
    "filters.knox": _f_knox,
    "filters.jl_projection": _f_jl_projection,
    "filters.suppress_small": _f_suppress_small,
})


def _f_areal_interp(spark, dfs, o):
    from pdal_spark.operators.overlay import areal_interpolate

    src = dfs[o["src"]] if "src" in o else dfs["src"]
    tgt = dfs[o["tgt"]] if "tgt" in o else dfs["tgt"]
    return areal_interpolate(
        src, tgt, cell=float(o["cell"]),
        value=o.get("column", "value_q"),
        id_src=o.get("id_src", "sid"), id_tgt=o.get("id_tgt", "tid"),
    )


def _f_kaplan_meier(_s, dfs, o):
    from pdal_spark.operators.temporal import kaplan_meier

    return kaplan_meier(
        _one(dfs, "filters.kaplan_meier"),
        duration=o["duration"], event=o["event"],
    )


def _f_geodesic_destination(_s, dfs, o):
    from pdal_spark.operators.transform import geodesic_destination

    return geodesic_destination(
        _one(dfs, "filters.geodesic_destination"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        bearing=o.get("bearing", "bearing"),
        dist_km=o.get("dist", "dist_km"),
    )


REGISTRY.update({
    "filters.areal_interp": _f_areal_interp,
    "filters.kaplan_meier": _f_kaplan_meier,
    "filters.geodesic_destination": _f_geodesic_destination,
})


# ---------------------------------------------------------------------------
# Batch-30 regional-analysis stages
# ---------------------------------------------------------------------------


def _f_location_quotient(_s, dfs, o):
    from pdal_spark.operators.pointpattern import location_quotient

    return location_quotient(
        _one(dfs, "filters.location_quotient"),
        cell=o.get("cell", "cell"), cat=o.get("cat", "cat"),
    )


def _f_relative_risk(_s, dfs, o):
    from pdal_spark.operators.pointpattern import relative_risk

    return relative_risk(
        _one(dfs, "filters.relative_risk"),
        cell=o.get("cell", "cell"), case=o.get("case", "is_case"),
        k=float(o.get("k", 1.0)),
    )


def _f_huff(_s, dfs, o):
    from pdal_spark.operators.pointpattern import HUFF_Q, huff_model

    origins, facilities = dfs
    return huff_model(
        origins, facilities, oid=o.get("oid", "oid"),
        fid=o.get("fid", "fid"), w=o.get("w", "w"),
        q=int(o.get("q", HUFF_Q)),
    )


def _f_two_sfca(_s, dfs, o):
    from pdal_spark.operators.pointpattern import TWOSFCA_Q, two_sfca

    demand, supply = dfs
    return two_sfca(
        demand, supply, radius=int(o["radius"]),
        did=o.get("did", "did"), sid=o.get("sid", "sid"),
        pop=o.get("pop", "pop"), cap=o.get("cap", "cap"),
        q=int(o.get("q", TWOSFCA_Q)),
    )


def _f_cross_track(_s, dfs, o):
    from pdal_spark.operators.transform import cross_track_distance

    return cross_track_distance(
        _one(dfs, "filters.cross_track"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        lat1=float(o["lat1"]), lon1=float(o["lon1"]),
        lat2=float(o["lat2"]), lon2=float(o["lon2"]),
    )


REGISTRY.update({
    "filters.location_quotient": _f_location_quotient,
    "filters.relative_risk": _f_relative_risk,
    "filters.huff": _f_huff,
    "filters.two_sfca": _f_two_sfca,
    "filters.cross_track": _f_cross_track,
})


# ---------------------------------------------------------------------------
# Batch-31 stages
# ---------------------------------------------------------------------------


def _f_gwr(_s, dfs, o):
    from pdal_spark.operators.pointpattern import gwr_local

    samples, targets = dfs
    return gwr_local(
        samples, targets, h=int(o["h"]), tid=o.get("tid", "tid"),
        x=o.get("x", "x"), y=o.get("y", "y"),
    )


def _f_stay_points(_s, dfs, o):
    from pdal_spark.operators.temporal import stay_points

    return stay_points(
        _one(dfs, "filters.stay_points"),
        key=o.get("key", "key"), ts=o.get("ts", "ts"),
        order=o.get("order"), t2=int(o.get("t2", 1)),
        min_n=int(o.get("min_n", 2)),
    )


def _f_flock(_s, dfs, o):
    from pdal_spark.operators.temporal import flock_pairs

    return flock_pairs(
        _one(dfs, "filters.flock"),
        key=o.get("key", "key"), tbin=o.get("tbin", "tbin"),
        cell=o.get("cell", "cell"),
        min_run=int(o.get("min_run", 2)),
    )


def _f_fleiss(_s, dfs, o):
    from pdal_spark.operators.stats import fleiss_kappa

    return fleiss_kappa(
        _one(dfs, "filters.fleiss"),
        item=o.get("item", "item"), cat=o.get("cat", "cat"),
    )


REGISTRY.update({
    "filters.gwr": _f_gwr,
    "filters.stay_points": _f_stay_points,
    "filters.flock": _f_flock,
    "filters.fleiss": _f_fleiss,
})


# ---------------------------------------------------------------------------
# Batch-32 stages
# ---------------------------------------------------------------------------


def _f_krippendorff(_s, dfs, o):
    from pdal_spark.operators.stats import KRIPP_Q, krippendorff_alpha

    return krippendorff_alpha(
        _one(dfs, "filters.krippendorff"),
        item=o.get("item", "item"), cat=o.get("cat", "cat"),
        q=int(o.get("q", KRIPP_Q)),
    )


def _f_bilinear(_s, dfs, o):
    from pdal_spark.operators.raster import bilinear_at_points

    cells, points = dfs
    return bilinear_at_points(
        cells, points, sub=int(o.get("sub", 1000)),
        cell_x=o.get("cell_x", "gx"), cell_y=o.get("cell_y", "gy"),
        value=o.get("value", "z"),
    )


def _f_focal_curvature(_s, dfs, o):
    from pdal_spark.operators.raster import focal_curvature

    return focal_curvature(
        _one(dfs, "filters.focal_curvature"), res=int(o["res"]),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_zonal_majority(_s, dfs, o):
    from pdal_spark.operators.crop import zonal_majority

    return zonal_majority(
        _one(dfs, "filters.zonal_majority"),
        zone=o.get("zone", "zone"), cat=o.get("cat", "cat"),
        max_cat=int(o.get("max_cat", 1 << 20)),
    )


REGISTRY.update({
    "filters.krippendorff": _f_krippendorff,
    "filters.bilinear": _f_bilinear,
    "filters.focal_curvature": _f_focal_curvature,
    "filters.zonal_majority": _f_zonal_majority,
})


# ---------------------------------------------------------------------------
# Batch-33 stages
# ---------------------------------------------------------------------------


def _f_circular_stats(_s, dfs, o):
    from pdal_spark.operators.pointpattern import circular_stats

    return circular_stats(
        _one(dfs, "filters.circular_stats"),
        key=o.get("key", "key"), bearing=o.get("bearing", "bearing"),
    )


def _f_semivariogram_directional(_s, dfs, o):
    from pdal_spark.operators.stats import semivariogram_directional

    return semivariogram_directional(
        _one(dfs, "filters.semivariogram_directional"),
        value=o.get("column", "value"), id_col=o["id"],
        bin_q=int(o.get("bin_q", 1 << 10)),
        n_bins=int(o.get("n_bins", 8)),
        coord_q=int(o.get("coord_q", 1 << 10)),
        value_q=int(o.get("value_q", 1 << 10)),
    )


def _f_albers(_s, dfs, o):
    from pdal_spark.operators.transform import reproject_albers

    return reproject_albers(
        _one(dfs, "filters.albers"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        phi1=float(o.get("phi1", 29.5)),
        phi2=float(o.get("phi2", 45.5)),
        lat0=float(o.get("lat0", 23.0)),
        lon0=float(o.get("lon0", -96.0)),
    )


def _f_spherical_perimeter(_s, dfs, o):
    from pdal_spark.operators.features import spherical_perimeter

    return spherical_perimeter(
        _one(dfs, "filters.spherical_perimeter"),
        poly_id=o.get("poly_id", "poly_id"), seq=o.get("seq", "seq"),
        lon=o.get("lon", "lon"), lat=o.get("lat", "lat"),
    )


REGISTRY.update({
    "filters.circular_stats": _f_circular_stats,
    "filters.semivariogram_directional": _f_semivariogram_directional,
    "filters.albers": _f_albers,
    "filters.spherical_perimeter": _f_spherical_perimeter,
})


# ---------------------------------------------------------------------------
# Batch-34 stages
# ---------------------------------------------------------------------------


def _f_radius_of_gyration(_s, dfs, o):
    from pdal_spark.operators.temporal import radius_of_gyration

    return radius_of_gyration(
        _one(dfs, "filters.radius_of_gyration"),
        key=o.get("key", "key"),
    )


def _f_bivariate_moran(_s, dfs, o):
    from pdal_spark.operators.stats import bivariate_morans_i

    return bivariate_morans_i(
        _one(dfs, "filters.bivariate_moran"), res=int(o["res"]),
        cell=o.get("cell", "cell"), x=o.get("x", "x"),
        y=o.get("y", "y"),
    )


def _f_spatial_markov(_s, dfs, o):
    from pdal_spark.operators.stats import spatial_markov

    t0, t1 = dfs
    return spatial_markov(
        t0, t1, res=int(o["res"]),
        n_classes=int(o.get("n_classes", 3)),
        class_div=int(o.get("class_div", 2)),
        cell=o.get("cell", "cell"), value=o.get("column", "x"),
    )


def _f_trajectory_entropy(_s, dfs, o):
    from pdal_spark.operators.temporal import trajectory_entropy

    return trajectory_entropy(
        _one(dfs, "filters.trajectory_entropy"),
        key=o.get("key", "key"), ts=o.get("ts", "ts"),
        zone=o.get("zone", "zone"),
    )


REGISTRY.update({
    "filters.radius_of_gyration": _f_radius_of_gyration,
    "filters.bivariate_moran": _f_bivariate_moran,
    "filters.spatial_markov": _f_spatial_markov,
    "filters.trajectory_entropy": _f_trajectory_entropy,
})


# ---------------------------------------------------------------------------
# Batch-35 stages
# ---------------------------------------------------------------------------


def _f_spacetime_scan(_s, dfs, o):
    from pdal_spark.operators.pointpattern import spacetime_scan

    return spacetime_scan(
        _one(dfs, "filters.spacetime_scan"), res=int(o["res"]),
        max_k=int(o.get("max_k", 2)),
        max_len=int(o.get("max_len", 2)),
        min_n=int(o.get("min_n", 3)),
        cell=o.get("cell", "cell"), tbin=o.get("tbin", "tbin"),
        n=o.get("n", "n"),
    )


def _f_qlm(_s, dfs, o):
    from pdal_spark.operators.similarity import qlm_topk

    return qlm_topk(
        _one(dfs, "filters.qlm"), terms=list(o["terms"]),
        k=int(o.get("k", 10)), mu=int(o.get("mu", 2000)),
        doc_id=o.get("doc_id", "doc_id"), word=o.get("word", "word"),
    )


def _f_hoover(_s, dfs, o):
    from pdal_spark.operators.stats import hoover_index

    return hoover_index(
        _one(dfs, "filters.hoover"), value=o.get("column", "x")
    )


def _f_theil_inequality(_s, dfs, o):
    from pdal_spark.operators.stats import theil_inequality

    return theil_inequality(
        _one(dfs, "filters.theil_inequality"),
        value=o.get("column", "x"),
    )


REGISTRY.update({
    "filters.spacetime_scan": _f_spacetime_scan,
    "filters.qlm": _f_qlm,
    "filters.hoover": _f_hoover,
    "filters.theil_inequality": _f_theil_inequality,
})


# ---------------------------------------------------------------------------
# Batch-36 stages
# ---------------------------------------------------------------------------


def _f_dda_cells(_s, dfs, o):
    from pdal_spark.operators.raster import dda_cells

    return dda_cells(
        _one(dfs, "filters.dda_cells"),
        seg_id=o.get("seg_id", "seg_id"),
        x1=o.get("x1", "x1"), y1=o.get("y1", "y1"),
        x2=o.get("x2", "x2"), y2=o.get("y2", "y2"),
    )


def _f_line_density(_s, dfs, o):
    from pdal_spark.operators.raster import line_density

    return line_density(
        _one(dfs, "filters.line_density"),
        seg_id=o.get("seg_id", "seg_id"),
        x1=o.get("x1", "x1"), y1=o.get("y1", "y1"),
        x2=o.get("x2", "x2"), y2=o.get("y2", "y2"),
    )


def _f_head_tail_breaks(_s, dfs, o):
    from pdal_spark.operators.stats import head_tail_breaks

    return head_tail_breaks(
        _one(dfs, "filters.head_tail_breaks"),
        value=o.get("column", "x"),
        max_levels=int(o.get("max_levels", 6)),
        head_max_frac=float(o.get("head_max_frac", 0.4)),
    )


REGISTRY.update({
    "filters.dda_cells": _f_dda_cells,
    "filters.line_density": _f_line_density,
    "filters.head_tail_breaks": _f_head_tail_breaks,
})


# ---------------------------------------------------------------------------
# Batch-37 stages
# ---------------------------------------------------------------------------


def _f_route_waypoints(_s, dfs, o):
    from pdal_spark.operators.transform import route_waypoints

    return route_waypoints(
        _one(dfs, "filters.route_waypoints"), n=int(o.get("n", 8)),
        lat1=o.get("lat1", "lat1"), lon1=o.get("lon1", "lon1"),
        lat2=o.get("lat2", "lat2"), lon2=o.get("lon2", "lon2"),
    )


def _f_runs_test(_s, dfs, o):
    from pdal_spark.operators.stats import runs_test

    return runs_test(
        _one(dfs, "filters.runs_test"), key=o["key"],
        order=o["order"], value=o.get("column", "v"),
        threshold=int(o.get("threshold", 0)),
    )


def _f_segregation(_s, dfs, o):
    from pdal_spark.operators.stats import segregation_indices

    return segregation_indices(
        _one(dfs, "filters.segregation"),
        g1=o.get("g1", "g1"), g2=o.get("g2", "g2"),
    )


def _f_compression_ratio(_s, dfs, o):
    from pdal_spark.operators.textops import compression_ratio

    return compression_ratio(
        _one(dfs, "filters.compression_ratio"),
        text=o.get("column", "text"),
        level=int(o.get("level", 6)),
    )


REGISTRY.update({
    "filters.route_waypoints": _f_route_waypoints,
    "filters.runs_test": _f_runs_test,
    "filters.segregation": _f_segregation,
    "filters.compression_ratio": _f_compression_ratio,
})


# ---------------------------------------------------------------------------
# Batch-38 stages
# ---------------------------------------------------------------------------


def _f_spearman(_s, dfs, o):
    from pdal_spark.operators.stats import spearman_corr

    return spearman_corr(
        _one(dfs, "filters.spearman"), key=o["key"],
        a=o.get("a", "a"), b=o.get("b", "b"),
    )


def _f_simpson(_s, dfs, o):
    from pdal_spark.operators.stats import simpson_diversity

    return simpson_diversity(
        _one(dfs, "filters.simpson"), group_col=o["group"],
        cat_col=o.get("cat", "cat"),
    )


def _f_ransac_line(_s, dfs, o):
    from pdal_spark.operators.features import ransac_line

    return ransac_line(
        _one(dfs, "filters.ransac_line"),
        id_col=o.get("id", "pid"), x=o.get("x", "mx"),
        y=o.get("y", "my"), n_cand=int(o.get("n_cand", 16)),
        tol=int(o.get("tol", 10)),
        buckets=int(o.get("buckets", 64)),
    )


REGISTRY.update({
    "filters.spearman": _f_spearman,
    "filters.simpson": _f_simpson,
    "filters.ransac_line": _f_ransac_line,
})


# ---------------------------------------------------------------------------
# Batch-39 stages
# ---------------------------------------------------------------------------


def _f_nelson_aalen(_s, dfs, o):
    from pdal_spark.operators.temporal import nelson_aalen

    return nelson_aalen(
        _one(dfs, "filters.nelson_aalen"),
        duration=o.get("duration", "dur"),
        event=o.get("event", "event"),
    )


def _f_diff_in_diff(_s, dfs, o):
    from pdal_spark.operators.stats import diff_in_diff

    return diff_in_diff(
        _one(dfs, "filters.diff_in_diff"),
        group=o.get("group", "treated"),
        period=o.get("period", "post"), y=o.get("column", "y"),
    )


def _f_ipf(_s, dfs, o):
    from pdal_spark.operators.h3 import ipf_balance

    seed, rt, ct = dfs
    return ipf_balance(
        seed, rt, ct, rounds=int(o.get("rounds", 2)),
        i=o.get("i", "i"), j=o.get("j", "j"), t=o.get("t", "t"),
        target=o.get("target", "target"),
    )


REGISTRY.update({
    "filters.nelson_aalen": _f_nelson_aalen,
    "filters.diff_in_diff": _f_diff_in_diff,
    "filters.ipf": _f_ipf,
})


# ---------------------------------------------------------------------------
# Batch-40 stages
# ---------------------------------------------------------------------------


def _f_ccf(_s, dfs, o):
    from pdal_spark.operators.temporal import ccf

    return ccf(
        _one(dfs, "filters.ccf"), key=o["key"], order=o["order"],
        x=o.get("x", "x"), y=o.get("y", "y"),
        max_lag=int(o.get("max_lag", 6)),
    )


def _f_granger(_s, dfs, o):
    from pdal_spark.operators.temporal import granger_lag1

    return granger_lag1(
        _one(dfs, "filters.granger"), key=o["key"],
        order=o["order"], x=o.get("x", "x"), y=o.get("y", "y"),
    )


def _f_partial_corr(_s, dfs, o):
    from pdal_spark.operators.stats import partial_correlation

    return partial_correlation(
        _one(dfs, "filters.partial_corr"), key=o["key"],
        x=o.get("x", "x"), y=o.get("y", "y"), z=o.get("z", "z"),
    )


REGISTRY.update({
    "filters.ccf": _f_ccf,
    "filters.granger": _f_granger,
    "filters.partial_corr": _f_partial_corr,
})


# ---------------------------------------------------------------------------
# Batch-41 stages
# ---------------------------------------------------------------------------


def _f_brier(_s, dfs, o):
    from pdal_spark.operators.stats import brier_score

    return brier_score(
        _one(dfs, "filters.brier"),
        prob_q=o.get("prob", "prob_q"),
        label=o.get("label", "label"),
        n_bins=int(o.get("n_bins", 10)),
    )


def _f_trimmed_mean(_s, dfs, o):
    from pdal_spark.operators.stats import trimmed_mean

    return trimmed_mean(
        _one(dfs, "filters.trimmed_mean"), key=o["key"],
        value=o.get("column", "v"), id_col=o["id"],
        trim_pct=int(o.get("trim_pct", 10)),
    )


def _f_quantile_normalize(_s, dfs, o):
    from pdal_spark.operators.stats import quantile_normalize

    return quantile_normalize(
        _one(dfs, "filters.quantile_normalize"), group=o["group"],
        value=o.get("column", "v"), id_col=o["id"],
    )


REGISTRY.update({
    "filters.brier": _f_brier,
    "filters.trimmed_mean": _f_trimmed_mean,
    "filters.quantile_normalize": _f_quantile_normalize,
})


# ---------------------------------------------------------------------------
# Batch-42 stages
# ---------------------------------------------------------------------------


def _f_conformal(_s, dfs, o):
    from pdal_spark.operators.stats import conformal_interval

    calib, test = dfs
    return conformal_interval(
        calib, test, alpha_pct=int(o.get("alpha_pct", 10)),
        pred=o.get("pred", "pred"), y=o.get("y", "y"),
        id_col=o.get("id", "id"),
    )


def _f_fairness(_s, dfs, o):
    from pdal_spark.operators.stats import fairness_gaps

    return fairness_gaps(
        _one(dfs, "filters.fairness"), group=o.get("group", "grp"),
        label=o.get("label", "label"), pred=o.get("pred", "pred"),
    )


REGISTRY.update({
    "filters.conformal": _f_conformal,
    "filters.fairness": _f_fairness,
})


# ---------------------------------------------------------------------------
# Batch-43 stages
# ---------------------------------------------------------------------------


def _f_fellegi_sunter(_s, dfs, o):
    from pdal_spark.operators.dedup import fellegi_sunter

    return fellegi_sunter(
        _one(dfs, "filters.fellegi_sunter"),
        features=list(o["features"]),
        label=o.get("label", "is_match"),
    )


def _f_weighted_median(_s, dfs, o):
    from pdal_spark.operators.stats import weighted_median

    return weighted_median(
        _one(dfs, "filters.weighted_median"), key=o["key"],
        value=o.get("column", "v"), weight=o.get("weight", "w"),
        id_col=o["id"],
    )


REGISTRY.update({
    "filters.fellegi_sunter": _f_fellegi_sunter,
    "filters.weighted_median": _f_weighted_median,
})


def _f_edit_join(_s, dfs, o):
    from pdal_spark.operators.dedup import edit_join

    return edit_join(
        _one(dfs, "filters.edit_join"), d=int(o.get("d", 2)),
        q=int(o.get("q", 2)), id_col=o.get("id", "id"),
        s=o.get("column", "s"),
    )


REGISTRY.update({"filters.edit_join": _f_edit_join})


def _f_lcs_pairs(_s, dfs, o):
    from pdal_spark.operators.temporal import lcs_pairs

    return lcs_pairs(
        _one(dfs, "filters.lcs_pairs"), key=o["key"],
        order=o["order"], value=o.get("column", "v"),
        block=o.get("block"),
    )


def _f_rolling_slope(_s, dfs, o):
    from pdal_spark.operators.temporal import rolling_slope

    return rolling_slope(
        _one(dfs, "filters.rolling_slope"), key=o["key"],
        order=o["order"], value=o.get("column", "v"),
        window=int(o.get("window", 8)),
    )


REGISTRY.update({
    "filters.lcs_pairs": _f_lcs_pairs,
    "filters.rolling_slope": _f_rolling_slope,
})


def _f_chi_square(_s, dfs, o):
    from pdal_spark.operators.stats import chi_square_independence

    return chi_square_independence(
        _one(dfs, "filters.chi_square"),
        a=o.get("a", "a"), b=o.get("b", "b"),
    )


REGISTRY.update({"filters.chi_square": _f_chi_square})


def _f_g_test(_s, dfs, o):
    from pdal_spark.operators.stats import g_test

    return g_test(
        _one(dfs, "filters.g_test"),
        a=o.get("a", "a"), b=o.get("b", "b"),
    )


def _f_odds_ratio(_s, dfs, o):
    from pdal_spark.operators.stats import odds_ratio

    return odds_ratio(
        _one(dfs, "filters.odds_ratio"),
        exposed=o.get("exposed", "exposed"),
        case=o.get("case", "is_case"),
    )


def _f_mcnemar(_s, dfs, o):
    from pdal_spark.operators.stats import mcnemar_test

    return mcnemar_test(
        _one(dfs, "filters.mcnemar"),
        x=o.get("x", "x"), y=o.get("y", "y"),
    )


REGISTRY.update({
    "filters.g_test": _f_g_test,
    "filters.odds_ratio": _f_odds_ratio,
    "filters.mcnemar": _f_mcnemar,
})


def _f_weighted_kappa(_s, dfs, o):
    from pdal_spark.operators.stats import weighted_kappa

    return weighted_kappa(
        _one(dfs, "filters.weighted_kappa"),
        col_a=o["a"], col_b=o["b"],
        n_levels=int(o.get("n_levels", 5)),
    )


def _f_icc(_s, dfs, o):
    from pdal_spark.operators.stats import icc_oneway

    return icc_oneway(
        _one(dfs, "filters.icc"),
        item=o.get("item", "item"), value=o.get("column", "y"),
    )


def _f_cronbach(_s, dfs, o):
    from pdal_spark.operators.stats import cronbach_alpha

    return cronbach_alpha(
        _one(dfs, "filters.cronbach"), items=list(o["items"])
    )


REGISTRY.update({
    "filters.weighted_kappa": _f_weighted_kappa,
    "filters.icc": _f_icc,
    "filters.cronbach": _f_cronbach,
})


def _f_capture_recapture(_s, dfs, o):
    from pdal_spark.operators.sketch import capture_recapture

    a, b = dfs
    return capture_recapture(a, b, id_col=o.get("id", "id"))


def _f_chao1(_s, dfs, o):
    from pdal_spark.operators.sketch import chao1_richness

    return chao1_richness(
        _one(dfs, "filters.chao1"), elem=o.get("column", "elem")
    )


def _f_mark_correlation(_s, dfs, o):
    from pdal_spark.operators.stats import mark_correlation

    return mark_correlation(
        _one(dfs, "filters.mark_correlation"), mark=o["mark"],
        id_col=o["id"], x=o.get("x", "lon"), y=o.get("y", "lat"),
        bin_q=int(o.get("bin_q", 1 << 10)),
        n_bins=int(o.get("n_bins", 8)),
        coord_q=int(o.get("coord_q", 1 << 10)),
    )


REGISTRY.update({
    "filters.capture_recapture": _f_capture_recapture,
    "filters.chao1": _f_chao1,
    "filters.mark_correlation": _f_mark_correlation,
})


def _f_time_weighted_avg(_s, dfs, o):
    from pdal_spark.operators.temporal import time_weighted_avg

    return time_weighted_avg(
        _one(dfs, "filters.time_weighted_avg"), key=o["key"],
        ts=o.get("ts", "ts"), value=o.get("column", "v"),
    )


def _f_state_durations(_s, dfs, o):
    from pdal_spark.operators.temporal import state_durations

    return state_durations(
        _one(dfs, "filters.state_durations"), key=o["key"],
        ts=o.get("ts", "ts"), state=o.get("state", "state"),
    )


REGISTRY.update({
    "filters.time_weighted_avg": _f_time_weighted_avg,
    "filters.state_durations": _f_state_durations,
})


def _f_bh_fdr(_s, dfs, o):
    from pdal_spark.operators.stats import bh_fdr

    return bh_fdr(
        _one(dfs, "filters.bh_fdr"), p_q=o.get("p", "p_q"),
        id_col=o.get("id", "id"), q_pct=int(o.get("q_pct", 5)),
    )


REGISTRY.update({"filters.bh_fdr": _f_bh_fdr})


def _f_periodogram(_s, dfs, o):
    from pdal_spark.operators.temporal import periodogram

    return periodogram(
        _one(dfs, "filters.periodogram"), key=o["key"],
        order=o["order"], value=o.get("column", "v"),
        freqs=[int(k) for k in o["freqs"]],
        period_n=int(o["period_n"]),
    )


def _f_xmr(_s, dfs, o):
    from pdal_spark.operators.temporal import xmr_chart

    return xmr_chart(
        _one(dfs, "filters.xmr"), key=o["key"], order=o["order"],
        value=o.get("column", "v"),
    )


REGISTRY.update({
    "filters.periodogram": _f_periodogram,
    "filters.xmr": _f_xmr,
})


def _f_route_profile(_s, dfs, o):
    from pdal_spark.operators.raster import route_profile

    routes, cells = dfs
    return route_profile(
        routes, cells, n=int(o.get("n", 8)),
        sub=int(o.get("sub", 1000)),
        cell_x=o.get("cell_x", "gx"), cell_y=o.get("cell_y", "gy"),
        value=o.get("value", "z"),
    )


REGISTRY.update({"filters.route_profile": _f_route_profile})


def _f_rhumb_line(_s, dfs, o):
    from pdal_spark.operators.transform import rhumb_line

    return rhumb_line(
        _one(dfs, "filters.rhumb_line"),
        lat1=o.get("lat1", "lat1"), lon1=o.get("lon1", "lon1"),
        lat2=o.get("lat2", "lat2"), lon2=o.get("lon2", "lon2"),
    )


def _f_solar_position(_s, dfs, o):
    from pdal_spark.operators.transform import solar_position

    return solar_position(
        _one(dfs, "filters.solar_position"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        day_of_year=o.get("doy", "doy"),
        hour_utc=o.get("hour", "hour_utc"),
    )


REGISTRY.update({
    "filters.rhumb_line": _f_rhumb_line,
    "filters.solar_position": _f_solar_position,
})


def _f_knee_point(_s, dfs, o):
    from pdal_spark.operators.stats import knee_point

    return knee_point(
        _one(dfs, "filters.knee_point"), key=o["key"],
        x=o.get("x", "x"), y=o.get("y", "y"),
    )


def _f_anova(_s, dfs, o):
    from pdal_spark.operators.stats import anova_f

    return anova_f(
        _one(dfs, "filters.anova"), group=o["group"],
        value=o.get("column", "v"),
    )


REGISTRY.update({
    "filters.knee_point": _f_knee_point,
    "filters.anova": _f_anova,
})


def _f_eb_rates(_s, dfs, o):
    from pdal_spark.operators.stats import empirical_bayes_rates

    return empirical_bayes_rates(
        _one(dfs, "filters.eb_rates"), key=o["key"],
        hits=o.get("hits", "hits"), trials=o.get("trials", "trials"),
    )


REGISTRY.update({"filters.eb_rates": _f_eb_rates})


def _f_logrank(_s, dfs, o):
    from pdal_spark.operators.temporal import logrank_test

    return logrank_test(
        _one(dfs, "filters.logrank"), group=o.get("group", "grp"),
        duration=o.get("duration", "dur"),
        event=o.get("event", "event"),
    )


REGISTRY.update({"filters.logrank": _f_logrank})


def _f_standardized_rate(_s, dfs, o):
    from pdal_spark.operators.stats import standardized_rate

    data, ref = dfs
    return standardized_rate(
        data, ref, pop=o.get("pop", "pop"),
        stratum=o.get("stratum", "stratum"),
        hits=o.get("hits", "hits"),
        exposure=o.get("exposure", "exposure"),
        weight=o.get("weight", "w"),
    )


REGISTRY.update({"filters.standardized_rate": _f_standardized_rate})


def _f_smr(_s, dfs, o):
    from pdal_spark.operators.stats import smr

    data, ref = dfs
    return smr(
        data, ref, pop=o.get("pop", "pop"),
        stratum=o.get("stratum", "stratum"),
        hits=o.get("hits", "hits"),
        exposure=o.get("exposure", "exposure"),
        rate_q=o.get("rate", "rate_q"),
    )


REGISTRY.update({"filters.smr": _f_smr})


def _f_olc_encode(_s, dfs, o):
    from pdal_spark.operators.h3 import olc_encode

    return olc_encode(
        _one(dfs, "filters.olc"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({"filters.olc": _f_olc_encode})


def _f_maidenhead(_s, dfs, o):
    from pdal_spark.operators.h3 import maidenhead_encode

    return maidenhead_encode(
        _one(dfs, "filters.maidenhead"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
    )


REGISTRY.update({"filters.maidenhead": _f_maidenhead})


def _f_randomized_response(_s, dfs, o):
    from pdal_spark.operators.textops import (
        RR_Q, randomized_response_estimate,
    )

    return randomized_response_estimate(
        _one(dfs, "filters.randomized_response"),
        answer=o.get("answer", "answer"),
        p_honest_q=int(o.get("p_q", (3 * RR_Q) // 4)),
    )


def _f_heaps_law(_s, dfs, o):
    from pdal_spark.operators.textops import heaps_law

    return heaps_law(
        _one(dfs, "filters.heaps_law"),
        doc_id=o.get("doc_id", "doc_id"),
        word=o.get("word", "word"),
        checkpoints=[int(t) for t in o["checkpoints"]]
        if "checkpoints" in o else None,
    )


REGISTRY.update({
    "filters.randomized_response": _f_randomized_response,
    "filters.heaps_law": _f_heaps_law,
})


def _f_mantel_haenszel(_s, dfs, o):
    from pdal_spark.operators.stats import mantel_haenszel

    return mantel_haenszel(
        _one(dfs, "filters.mantel_haenszel"),
        stratum=o.get("stratum", "stratum"),
        exposed=o.get("exposed", "exposed"),
        case=o.get("case", "is_case"),
    )


def _f_cohens_d(_s, dfs, o):
    from pdal_spark.operators.stats import cohens_d

    return cohens_d(
        _one(dfs, "filters.cohens_d"), group=o.get("group", "grp"),
        value=o.get("column", "y"),
    )


REGISTRY.update({
    "filters.mantel_haenszel": _f_mantel_haenszel,
    "filters.cohens_d": _f_cohens_d,
})


# -- round-3 batch: named eigen ops + conic/ECEF reprojection ------------
def _f_estimaterank(_s, dfs, o):
    from pdal_spark.operators.features3d import estimate_rank

    return estimate_rank(
        _one(dfs, "filters.estimaterank"),
        knn=int(o.get("knn", 8)),
        thresh=float(o.get("thresh", 0.01)),
        radius0=float(o.get("radius0", 4.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), id_col=o.get("id", "pid"),
    )


def _f_approximatecoplanar(_s, dfs, o):
    from pdal_spark.operators.features3d import approximate_coplanar

    return approximate_coplanar(
        _one(dfs, "filters.approximatecoplanar"),
        knn=int(o.get("knn", 8)),
        thresh1=float(o.get("thresh1", 25.0)),
        thresh2=float(o.get("thresh2", 6.0)),
        radius0=float(o.get("radius0", 4.0)),
        x=o.get("x", "lon"), y=o.get("y", "lat"),
        z=o.get("z", "z"), id_col=o.get("id", "pid"),
    )


def _f_reprojection_lcc(_s, dfs, o):
    from pdal_spark.operators.transform import reproject_lcc

    return reproject_lcc(
        _one(dfs, "filters.reprojection_lcc"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        phi1=float(o.get("phi1", 33.0)),
        phi2=float(o.get("phi2", 45.0)),
        lat0=float(o.get("lat0", 23.0)),
        lon0=float(o.get("lon0", -96.0)),
    )


def _f_reprojection_albers_ell(_s, dfs, o):
    from pdal_spark.operators.transform import (
        reproject_albers_ellipsoidal,
    )

    return reproject_albers_ellipsoidal(
        _one(dfs, "filters.reprojection_albers_ellipsoidal"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        phi1=float(o.get("phi1", 29.5)),
        phi2=float(o.get("phi2", 45.5)),
        lat0=float(o.get("lat0", 23.0)),
        lon0=float(o.get("lon0", -96.0)),
    )


def _f_geodetic_to_ecef(_s, dfs, o):
    from pdal_spark.operators.transform import geodetic_to_ecef

    return geodetic_to_ecef(
        _one(dfs, "filters.geodetic_to_ecef"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        h=o.get("h"),
    )


def _f_ecef_to_geodetic(_s, dfs, o):
    from pdal_spark.operators.transform import ecef_to_geodetic

    return ecef_to_geodetic(
        _one(dfs, "filters.ecef_to_geodetic"),
        x=o.get("x", "ecef_x"), y=o.get("y", "ecef_y"),
        z=o.get("z", "ecef_z"),
    )


REGISTRY.update({
    "filters.estimaterank": _f_estimaterank,
    "filters.approximatecoplanar": _f_approximatecoplanar,
    "filters.reprojection_lcc": _f_reprojection_lcc,
    "filters.reprojection_albers_ellipsoidal":
        _f_reprojection_albers_ell,
    "filters.geodetic_to_ecef": _f_geodetic_to_ecef,
    "filters.ecef_to_geodetic": _f_ecef_to_geodetic,
})


# -- round-4 batch: geographic H3 (spec kernel) + COPC reader ------------
def _f_h3_real(_s, dfs, o):
    from pdal_spark.operators.h3lib import h3_encode_spec

    return h3_encode_spec(
        _one(dfs, "filters.h3_real"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        res=int(o.get("resolution", 9)),
        out=o.get("output", "h3_real"),
    )


def _f_h3_center(_s, dfs, o):
    from pdal_spark.operators.h3lib import h3_center_spec

    return h3_center_spec(
        _one(dfs, "filters.h3_center"),
        cell=o.get("cell", "h3_real"),
        lat_out=o.get("lat_out", "cell_lat"),
        lon_out=o.get("lon_out", "cell_lon"),
    )


def _r_copc(spark, _dfs, o):
    from pdal_spark.sources.copc import read_copc

    return read_copc(
        spark, o["filename"],
        bounds=o.get("bounds"),
        resolution=(float(o["resolution"])
                    if o.get("resolution") else None),
    )


REGISTRY.update({
    "filters.h3_real": _f_h3_real,
    "filters.h3_center": _f_h3_center,
    "readers.copc": _r_copc,
})


def _w_copc(_s, dfs, o):
    from pdal_spark.sources.copcwriter import write_copc

    df = _one(dfs, "writers.copc")
    write_copc(
        df, o["filename"],
        pdrf=(int(o["pdrf"]) if o.get("pdrf") else None),
        capacity=int(o.get("capacity", 65536)),
    )
    return df


REGISTRY.update({"writers.copc": _w_copc})


def _r_ept(spark, _dfs, o):
    from pdal_spark.sources.ept import read_ept

    return read_ept(
        spark, o["filename"],
        bounds=o.get("bounds"),
        resolution=(float(o["resolution"])
                    if o.get("resolution") else None),
    )


REGISTRY.update({"readers.ept": _r_ept})


def _f_reprojection_polar_stereo(_s, dfs, o):
    from pdal_spark.operators.transform import (
        reproject_polar_stereographic,
    )

    return reproject_polar_stereographic(
        _one(dfs, "filters.reprojection_polar_stereo"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        lat_ts=float(o.get("lat_ts", -71.0)),
        lon0=float(o.get("lon_0", 0.0)),
    )


REGISTRY.update({
    "filters.reprojection_polar_stereo": _f_reprojection_polar_stereo,
})


def _f_h3_boundary(_s, dfs, o):
    from pdal_spark.operators.h3lib import h3_boundary_spec

    return h3_boundary_spec(
        _one(dfs, "filters.h3_boundary"),
        cell=o.get("cell", "h3_real"),
        out=o.get("output", "boundary_wkt"),
    )


REGISTRY.update({"filters.h3_boundary": _f_h3_boundary})


def _f_h3_polyfill_real(_s, dfs, o):
    """Driver-computed real-H3 covering cells for a polygon ring ->
    joined IN-filter on the input's real-id cell column."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdal_spark.operators.h3geo import polyfill_real

    df = _one(dfs, "filters.h3_polyfill_real")
    ring = [(float(a), float(b)) for a, b in o["ring"]]
    cells = polyfill_real(ring, int(o.get("resolution", 9)))
    vals = [int(np.int64(np.uint64(c))) for c in cells]
    return df.where(F.col(o.get("cell", "h3_real")).isin(vals))


REGISTRY.update({"filters.h3_polyfill_real": _f_h3_polyfill_real})


def _f_reprojection_tmerc(_s, dfs, o):
    from pdal_spark.operators.transform import reproject_tmerc

    return reproject_tmerc(
        _one(dfs, "filters.reprojection_tmerc"),
        lat=o.get("lat", "lat"), lon=o.get("lon", "lon"),
        lat0=float(o.get("lat_0", 0.0)),
        lon0=float(o.get("lon_0", 0.0)),
        k0=float(o.get("k_0", 1.0)),
        x0=float(o.get("x_0", 0.0)),
        y0=float(o.get("y_0", 0.0)),
    )


REGISTRY.update({
    "filters.reprojection_tmerc": _f_reprojection_tmerc,
})


# ---- round-5 reader/writer stages ----------------------------------

def _r_slpk(spark, _dfs, o):
    from pdal_spark.sources.slpk import read_slpk

    return read_slpk(
        spark, o["filename"],
        dimensions=o.get("dimensions"),
        bounds=tuple(o["bounds"]) if o.get("bounds") else None,
    )


def _r_e57(spark, _dfs, o):
    from pdal_spark.sources.e57 import read_e57

    return read_e57(spark, o["filename"])


def _w_e57(_s, dfs, o):
    from pdal_spark.sources.e57 import write_e57

    df = _one(dfs, "writers.e57")
    write_e57(df, o["filename"])
    return df


def _r_nitf(spark, _dfs, o):
    from pdal_spark.sources.nitf import read_nitf

    return read_nitf(spark, o["filename"])


def _w_ept_addon(_s, dfs, o):
    from pdal_spark.sources.ept import write_ept_addon

    df = _one(dfs, "writers.ept_addon")
    write_ept_addon(
        df, o["ept"], o["filename"], o["dimension"],
        ept_type=o.get("type"),
        size=int(o["size"]) if o.get("size") else None,
    )
    return df


def _f_hgridshift(_s, dfs, o):
    from pdal_spark.operators.datumshift import hgridshift

    return hgridshift(
        _one(dfs, "filters.hgridshift"), o["grids"],
        inverse=str(o.get("inverse", "false")).lower() == "true",
        lon=o.get("lon", "lon"), lat=o.get("lat", "lat"),
    )


REGISTRY.update({
    "readers.slpk": _r_slpk,
    "readers.e57": _r_e57,
    "writers.e57": _w_e57,
    "readers.nitf": _r_nitf,
    "writers.ept_addon": _w_ept_addon,
    "filters.hgridshift": _f_hgridshift,
})
