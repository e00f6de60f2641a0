"""Gate registry extension 74 — video-pipeline scene-cut detection
over the fake-codec frame stream (shot-boundary primitive: frames
whose byte-histogram L1 distance to the previous frame exceeds a
percentage of the combined frame length).

Oracle valid because the synthetic documents are pure ASCII (UTF-8
bytes == char codes, the mm_features convention): per-frame 8-bin
histograms rebuilt from character positions, densified against the
dim grid, L1 via a self-join on frame-1. Exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _t, gate
from pdal_spark.operators import multimodal as ops_mm

_SC_EVERY = 200
_SC_PCT = 50


def _sc_sql() -> str:
    ev, pct = _SC_EVERY, _SC_PCT
    return f"""
    WITH docs AS MATERIALIZED (
      SELECT doc_id, octet_length(encode(text)) AS blen,
             greatest(1, octet_length(encode(text)) // {ev}) AS nf
      FROM documents
    ),
    ch AS MATERIALIZED (
      SELECT d.doc_id,
             unnest(range(0, len(string_split(d.text, ''))))
               AS pos,
             ascii(unnest(string_split(d.text, ''))) % 8 AS dim
      FROM documents d
    ),
    framed AS MATERIALIZED (
      SELECT ch.doc_id, CAST(ch.pos // {ev} AS INT) AS frame_idx,
             ch.dim
      FROM ch JOIN docs USING (doc_id)
      WHERE ch.pos < docs.nf * {ev}
    ),
    cnt AS MATERIALIZED (
      SELECT doc_id, frame_idx, dim, count(*) AS c
      FROM framed GROUP BY 1, 2, 3
    ),
    grid AS MATERIALIZED (
      SELECT d.doc_id, CAST(g.fidx AS INT) AS frame_idx, n8.dim,
             least({ev}, d.blen - g.fidx * {ev}) AS flen
      FROM docs d,
           LATERAL (SELECT unnest(range(0, d.nf)) AS fidx) g,
           (SELECT unnest(range(0, 8)) AS dim) n8
    ),
    hist AS MATERIALIZED (
      SELECT g.doc_id, g.frame_idx, g.dim, g.flen,
             CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN cnt
        ON cnt.doc_id = g.doc_id AND cnt.frame_idx = g.frame_idx
        AND cnt.dim = g.dim
    ),
    l1 AS (
      SELECT a.doc_id, a.frame_idx,
             any_value(a.flen) AS frame_byte_len,
             any_value(b.flen) AS prev_len,
             CAST(sum(abs(a.c - b.c)) AS BIGINT) AS l1_diff
      FROM hist a
      LEFT JOIN hist b
        ON b.doc_id = a.doc_id AND b.dim = a.dim
        AND b.frame_idx = a.frame_idx - 1
      GROUP BY 1, 2
    )
    SELECT doc_id, frame_idx, frame_byte_len,
           CASE WHEN frame_idx > 0 THEN l1_diff END AS l1_diff,
           CASE WHEN frame_idx > 0 THEN
             l1_diff * 100 > {pct} * (frame_byte_len + prev_len)
           END AS is_cut
    FROM l1
    """


@gate("scene_cuts", _sc_sql())
def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    with_bin = ops_mm.attach_binary(docs)
    return ops_mm.scene_cuts(
        with_bin, every=_SC_EVERY, cut_pct=_SC_PCT,
        codec="fake",
    )

