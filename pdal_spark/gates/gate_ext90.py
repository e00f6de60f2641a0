"""Gate registry extension 90 — shard/ingest/reachability batch:
rendezvous (HRW) shard assignment (literal weight chain, list-argmax
oracle), HTML heading extraction (the extract_links fixture grown
h1/h2/h3 tags), and isochrone cost-band labeling over the friction
lattice (cost_distance oracle + one band projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.gates.gate_ext85 import _cd_sql
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import textops as ops_text

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# hrw_assign — documents, 7 shards.
# ---------------------------------------------------------------------------

_HRW_N = 7
_HRW_SALT = 11


def _hrw_sql() -> str:
    key = f"(doc_id * 100003 + {_HRW_SALT})"
    hs = ", ".join(
        G.mix_hash(f"({key} + {s} * 1009)") for s in range(_HRW_N)
    )
    return f"""
    SELECT doc_id,
           CAST(list_indexof([{hs}],
                list_aggregate([{hs}], 'max')) - 1 AS INT) AS shard
    FROM documents
"""


@gate("hrw_assign", _hrw_sql())
def q_hrw_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.hrw_assign(
        docs, n_shards=_HRW_N, salt=_HRW_SALT
    ).select("doc_id", "shard")


# ---------------------------------------------------------------------------
# extract_headings — synthetic heading HTML off events (the
# extract_links fixture convention).
# ---------------------------------------------------------------------------

_HD_HTML_SQL = (
    "'<h1 class=\"t\">Title ' || cast(event_id % 11 as varchar)"
    " || '</h1><p>x</p><h2>Sec ' || cast(event_id % 5 as varchar)"
    " || '</h2><h2>Sec ' || cast(event_id % 3 as varchar)"
    " || '</h2><h3>Sub ' || cast(event_id % 2 as varchar)"
    " || '</h3>'"
)


def _hd_sql() -> str:
    parts = []
    for lvl in (1, 2, 3):
        parts.append(f"""
    SELECT doc_id, {lvl} AS level,
           unnest(regexp_extract_all(
             html, '<h{lvl}[^>]*>([^<]*)</h{lvl}>', 1)) AS heading
    FROM pages""")
    body = "\n    UNION ALL".join(parts)
    return f"""
    WITH pages AS (
      SELECT event_id AS doc_id, {_HD_HTML_SQL} AS html FROM events
    )
    {body}
"""


@gate("extract_headings", _hd_sql())
def q_extract_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    html = F.concat(
        F.lit('<h1 class="t">Title '), (eid % 11).cast("string"),
        F.lit("</h1><p>x</p><h2>Sec "), (eid % 5).cast("string"),
        F.lit("</h2><h2>Sec "), (eid % 3).cast("string"),
        F.lit("</h2><h3>Sub "), (eid % 2).cast("string"),
        F.lit("</h3>"),
    )
    pages = ev.select(eid.alias("doc_id"), html.alias("html"))
    return ops_text.extract_headings(pages, html="html",
                                     id_col="doc_id")


# ---------------------------------------------------------------------------
# isochrone_cells — the cost_distance fixture + band projection.
# ---------------------------------------------------------------------------

_IC_ROUNDS = 24
_IC_BANDQ = 200 * ops_raster.FOCAL_Q
_IC_BANDS = 4
_IC_SOURCES = [int(eval(G.qcell_pack("8", "8", _FD_RES)))]


def _ic_sql() -> str:
    base = _cd_sql(_IC_ROUNDS)
    head, _, _ = base.rpartition("SELECT seed, node AS cell, dist")
    import re

    head = re.sub(r"FROM \(VALUES \([0-9]+\), \([0-9]+\)\) s\(s\)",
                  f"FROM (VALUES ({_IC_SOURCES[0]})) s(s)", head)
    return head + f"""
    SELECT seed, node AS cell, dist,
           CAST(dist // {_IC_BANDQ} AS INT) AS band
    FROM d{_IC_ROUNDS}
    WHERE dist < {_IC_BANDQ * _IC_BANDS}
    """


@gate("isochrone_cells", _ic_sql())
def q_isochrone_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.isochrone_cells(
        _fd_cells(spark, sf_dir), res=_FD_RES, sources=_IC_SOURCES,
        band_q=_IC_BANDQ, n_bands=_IC_BANDS, cell="cell", value="x",
        rounds=_IC_ROUNDS,
    )

