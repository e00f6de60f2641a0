"""Gate registry extension 9 — polygon->cell covering family:
polyfill (H3 polygonToCells analog), cell compact/uncompact (H3
compact analogs), and the polygon-pushdown crop (readers.copc/ept
`polygon` option: prune the cell layout against the query geometry
before the exact PIP test; CopcReader.cpp:684-754). All integer /
IEEE-exact, full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, gate
from pdal_spark.gates.gate_ext4 import _ARROW
from pdal_spark.operators import h3 as ops_h3

DK = G.DUCKDB

_PF_RES = 6  # 64x32-cell world grid: arrow bbox -> ~375 candidates


def _polyfill_sql(
    rings: list[list[tuple[float, float]]], res: int
) -> str:
    """DuckDB mirror of operators.h3.polyfill: bbox candidate grid
    from range() x range(), center-containment ray cast, packed cell
    ids — same sqlgen fragments, so ids hash-match bit-for-bit."""
    ix0, ix1, iy0, iy1 = ops_h3._poly_grid_bounds(rings, res)
    return f"""
    SELECT {G.qcell_pack('ix', 'iy', res)} AS cell
    FROM (
      SELECT a.range AS ix, b.range AS iy,
             {G.ix_center_lon('a.range', res)} AS clon,
             {G.iy_center_lat('b.range', res)} AS clat
      FROM range({ix0}, {ix1 + 1}) a, range({iy0}, {iy1 + 1}) b
    ) g
    WHERE {G.raycast_pip('clon', 'clat', rings)}
    """


def _compact_sql(base_sql: str, res: int, min_res: int) -> str:
    """Unrolled per-level compact: complete sibling quadruples fold
    into their parent, survivors keep their resolution."""
    ctes = [f"c{res} AS MATERIALIZED ({base_sql})"]
    selects = []
    for r in range(res, min_res, -1):
        parent = G.qcell_parent("cell", r, r - 1, DK)
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT {parent} AS cell FROM c{r}"
            f" GROUP BY 1 HAVING count(*) = 4)"
        )
        ctes.append(
            f"k{r} AS (SELECT cell FROM c{r}"
            f" WHERE {parent} NOT IN (SELECT cell FROM p{r}))"
        )
        ctes.append(f"c{r - 1} AS (SELECT cell FROM p{r})")
        selects.append(f"SELECT cell FROM k{r}")
    selects.append(f"SELECT cell FROM c{min_res}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


_ARROW_RINGS = [_ARROW]
_ARROW_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _ARROW + [_ARROW[0]])
    + "))"
)


# H3 polygonToCells analog (inverse of hexbin's cells->boundary)
@gate("h3_polyfill", _polyfill_sql(_ARROW_RINGS, _PF_RES))
def q_h3_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)


# H3 compact analog over the polyfill covering set
@gate(
    "cell_compact",
    _compact_sql(_polyfill_sql(_ARROW_RINGS, _PF_RES), _PF_RES, 2),
)
def q_cell_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)
    return ops_h3.cell_compact(cov, _PF_RES, min_res=2)


# H3 uncompact analog: uncompact(compact(S)) == S, so the oracle is
# the polyfill itself — the round trip must reproduce it exactly.
@gate("cell_uncompact", _polyfill_sql(_ARROW_RINGS, _PF_RES))
def q_cell_uncompact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = ops_h3.polyfill(spark, _ARROW_RINGS, _PF_RES)
    comp = ops_h3.cell_compact(cov, _PF_RES, min_res=2)
    return ops_h3.cell_uncompact(comp, _PF_RES)


# readers.copc/ept `polygon` pushdown: covering-cell IN-list prune
# ahead of the exact PIP — row-identical to the plain concave crop,
# so the oracle is the plain PIP select.
@gate(
    "polygon_prune",
    f"""
    SELECT event_id, 0 AS geom_id FROM {_PTS}
    WHERE {G.raycast_pip('lon', 'lat', [_ARROW])}
    """,
)
def q_polygon_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.crop import crop_polygons_pruned

    pts = _points(spark, sf_dir)
    out = crop_polygons_pruned(
        pts, [(0, _ARROW_WKT)], prune_res=7, x="lon", y="lat"
    )
    return out.select("event_id", "geom_id")


# ---------------------------------------------------------------------------
# Webtext batch: Bloom-filter membership dedup, unigram-LM scoring
# (perplexity-filter analog), Naive-Bayes quality/domain classifier.
# ---------------------------------------------------------------------------

from pdal_spark.gate import _TIDS, _TOKS, _t  # noqa: E402
from pdal_spark.operators import dedup as ops_dedup  # noqa: E402
from pdal_spark.operators import textops as ops_text  # noqa: E402

_BLOOM_M = 512  # small on purpose at test scale: a ~77%-full bitmap
_BLOOM_K = 3  # exercises true members AND false positives


def _bloom_sql(m_bits: int, k: int) -> str:
    idx = ", ".join(str(i) for i in range(1, k + 1))
    pos_h = G.lehmer2("(fingerprint * 131 + i)")
    return f"""
    WITH fp AS MATERIALIZED (
      SELECT doc_id,
             sum((pos + 1) * word_id) % {ops_text.FP_MOD} AS fingerprint
      FROM {_TIDS} GROUP BY doc_id
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, ({pos_h} % {m_bits}) AS p
      FROM fp, (SELECT unnest([{idx}]) AS i) ii
    ),
    bitmap AS MATERIALIZED (
      SELECT p // 64 AS w,
             bit_or((CAST(1 AS BIGINT) << (p % 64))) AS bits
      FROM pos WHERE doc_id % 2 = 0 GROUP BY 1
    )
    SELECT doc_id,
           bool_and(coalesce(((b.bits >> (p % 64)) & 1) = 1, false))
             AS in_bloom
    FROM pos LEFT JOIN bitmap b ON p // 64 = b.w
    GROUP BY doc_id
    """


@gate("bloom_dedup", _bloom_sql(_BLOOM_M, _BLOOM_K))
def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    bm = ops_dedup.bloom_build(corpus, v, m_bits=_BLOOM_M, k=_BLOOM_K)
    return ops_dedup.bloom_member(
        docs, bm, v, m_bits=_BLOOM_M, k=_BLOOM_K
    )


_QF = G.fnum(float(ops_text.LM_Q))
_HALF = G.fnum(0.5)
_LM_TERM = (
    f"cast(floor(ln(cast(w_cnt + 1 as double)"
    f" / cast(n_total + n_vocab as double)) * {_QF} + {_HALF})"
    " as bigint)"
)


@gate(
    "unigram_logprob",
    f"""
    WITH t AS MATERIALIZED (SELECT doc_id, word FROM {_TOKS}),
    cnt AS MATERIALIZED (
      SELECT word, count(*) AS w_cnt FROM t GROUP BY 1),
    tot AS (SELECT sum(w_cnt) AS n_total, count(*) AS n_vocab FROM cnt)
    SELECT doc_id, count(*) AS n_tokens,
           sum({_LM_TERM}) AS lm_q,
           round((cast(sum({_LM_TERM}) as double) / {_QF})
                 / count(*), 6) AS lm_mean
    FROM t JOIN cnt USING (word), tot
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.unigram_logprob(_t(spark, sf_dir, "documents"))


def _nb_sql() -> str:
    q, h = _QF, _HALF
    lo_p = (
        f"cast(floor(ln(cast(p_cnt + 1 as double)"
        f" / cast(p_tot + n_vocab as double)) * {q} + {h}) as bigint)"
    )
    lo_n = (
        f"cast(floor(ln(cast(n_cnt + 1 as double)"
        f" / cast(n_tot + n_vocab as double)) * {q} + {h}) as bigint)"
    )
    prior = (
        f"cast(floor(ln(cast(p_docs as double)"
        f" / cast(n_docs as double)) * {q} + {h}) as bigint)"
    )
    return f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, (lang = 'en') AS pos_lab,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    cnt AS MATERIALIZED (
      SELECT word,
             sum(CASE WHEN pos_lab THEN 1 ELSE 0 END) AS p_cnt,
             sum(CASE WHEN pos_lab THEN 0 ELSE 1 END) AS n_cnt
      FROM t GROUP BY 1
    ),
    tot AS (SELECT sum(p_cnt) AS p_tot, sum(n_cnt) AS n_tot,
                   count(*) AS n_vocab FROM cnt),
    lo AS MATERIALIZED (
      SELECT word, {lo_p} - {lo_n} AS lo_q FROM cnt, tot
    ),
    pri AS (
      SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p_docs,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n_docs
      FROM documents
    ),
    sc AS (
      SELECT doc_id, sum(lo_q) AS tok_q
      FROM t JOIN lo USING (word) GROUP BY doc_id
    )
    SELECT doc_id, tok_q + {prior} AS score_q,
           (tok_q + {prior}) > 0 AS pred
    FROM sc, pri
    """


@gate("nb_classifier", _nb_sql())
def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.nb_classifier(
        _t(spark, sf_dir, "documents"), label_value="en"
    )


# ---------------------------------------------------------------------------
# Distributed sketches (HLL distinct-count, KMV crawl overlap) + DSIR
# importance weighting.
# ---------------------------------------------------------------------------

from pdal_spark.operators import sketch as ops_sketch  # noqa: E402

_HLL_RES = 12


def _hll_sql() -> str:
    m, k = ops_sketch.HLL_M, ops_sketch._RHO_K
    h = G.mix_hash("cell")
    sfx = f"(h // {m})"
    return f"""
    WITH el AS MATERIALIZED (
      SELECT DISTINCT {G.qcell('lat', 'lon', _HLL_RES)} AS cell
      FROM {_PTS}
    ),
    hsh AS (SELECT {h} AS h FROM el),
    regs AS (
      SELECT (h % {m}) AS bkt,
             max({ops_sketch.hll_rho_sql(sfx)}) AS rho
      FROM hsh GROUP BY 1
    ),
    fold AS (
      SELECT count(*) AS n_used,
             sum((CAST(1 AS BIGINT) << ({k} - rho))) AS used_q
      FROM regs
    )
    SELECT n_used, sum_q, {ops_sketch.hll_est_sql()} AS hll_est
    FROM (SELECT n_used,
                 used_q + CAST({m} - n_used AS BIGINT)
                          * (CAST(1 AS BIGINT) << {k}) AS sum_q
          FROM fold) f
    """


@gate("hll_distinct", _hll_sql())
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cells = ops_h3.h3_encode(
        pts, "lat", "lon", res=_HLL_RES
    ).select("h3_cell").distinct().withColumnRenamed("h3_cell", "cell")
    return ops_sketch.hll_estimate(cells, "cell")


_KMV_K = 32
_FP_SQL_ALL = None  # set below


def _kmv_sql() -> str:
    h = G.mix_hash("fingerprint")
    a_pred = "(doc_id % 2 = 0 OR doc_id < 125)"
    b_pred = "(doc_id % 2 = 1 OR doc_id < 125)"
    return f"""
    WITH fp AS MATERIALIZED (
      SELECT doc_id,
             sum((pos + 1) * word_id) % {ops_text.FP_MOD} AS fingerprint
      FROM {_TIDS} GROUP BY doc_id
    ),
    ka AS MATERIALIZED (
      SELECT DISTINCT {h} AS h FROM fp WHERE {a_pred}
      ORDER BY 1 LIMIT {_KMV_K}
    ),
    kb AS MATERIALIZED (
      SELECT DISTINCT {h} AS h FROM fp WHERE {b_pred}
      ORDER BY 1 LIMIT {_KMV_K}
    ),
    ku AS (
      SELECT DISTINCT h FROM (
        SELECT h FROM ka UNION ALL SELECT h FROM kb) u
      ORDER BY h LIMIT {_KMV_K}
    )
    SELECT count(*) AS k_used,
           sum(CASE WHEN ha.h IS NOT NULL AND hb.h IS NOT NULL
               THEN 1 ELSE 0 END) AS n_both,
           round(cast(sum(CASE WHEN ha.h IS NOT NULL
                          AND hb.h IS NOT NULL THEN 1 ELSE 0 END)
                      as double) / count(*), 6) AS jaccard_est
    FROM ku LEFT JOIN ka ha ON ku.h = ha.h
            LEFT JOIN kb hb ON ku.h = hb.h
    """


@gate("kmv_overlap", _kmv_sql())
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    fp = ops_text.fingerprint(docs, v)
    a = fp.where(F.expr("doc_id % 2 = 0 OR doc_id < 125"))
    b = fp.where(F.expr("doc_id % 2 = 1 OR doc_id < 125"))
    return ops_sketch.kmv_overlap(a, b, "fingerprint", k=_KMV_K)


def _dsir_sql() -> str:
    q, h = _QF, _HALF
    w_t = (
        f"cast(floor(ln(cast(t_cnt + 1 as double)"
        f" / cast(t_tot + n_vocab as double)) * {q} + {h}) as bigint)"
    )
    w_a = (
        f"cast(floor(ln(cast(a_cnt + 1 as double)"
        f" / cast(a_tot + n_vocab as double)) * {q} + {h}) as bigint)"
    )
    return f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, (lang = 'en') AS tgt,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    cnt AS MATERIALIZED (
      SELECT word,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_cnt,
             count(*) AS a_cnt
      FROM t GROUP BY 1
    ),
    tot AS (SELECT sum(t_cnt) AS t_tot, sum(a_cnt) AS a_tot,
                   count(*) AS n_vocab FROM cnt),
    ratio AS MATERIALIZED (
      SELECT word, {w_t} - {w_a} AS w_q FROM cnt, tot
    )
    SELECT doc_id, count(*) AS n_tokens, sum(w_q) AS dsir_q,
           round((cast(sum(w_q) as double) / {q}) / count(*), 6)
             AS dsir_w
    FROM t JOIN ratio USING (word)
    GROUP BY doc_id
    """


# NOTE: ext13 registers the two-corpus hashed-bucket `dsir_weights`;
# this is the LABEL-SLICE variant (target = a labeled slice of the
# corpus itself) under its own gate name.
@gate("dsir_label_weights", _dsir_sql())
def q_dsir_label_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.dsir_label_weights(
        _t(spark, sf_dir, "documents"), target_value="en"
    )


# ---------------------------------------------------------------------------
# As-of join (event-time 1-NN; the temporal analog of kernels/
# DeltaKernel.cpp's spatial nearest-point match): each click matched
# to the user's latest view at or before it.
# ---------------------------------------------------------------------------


@gate(
    "asof_join",
    """
    WITH r AS MATERIALIZED (
      SELECT user_id, ts AS rts, max(event_id) AS view_id,
             max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    l AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click'),
    u AS (
      SELECT user_id, epoch_us(ts) AS tus, 1 AS side,
             CAST(NULL AS BIGINT) AS rtus, event_id, ts
      FROM l
      UNION ALL
      SELECT user_id, epoch_us(rts), 0, epoch_us(rts), NULL, NULL
      FROM r
    ),
    m AS (
      SELECT *, max(rtus) OVER (
        PARTITION BY user_id ORDER BY tus, side
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mts
      FROM u
    )
    SELECT m.user_id, m.event_id, m.ts, r.rts AS ts_r,
           r.view_id AS view_id_r, r.view_value AS view_value_r
    FROM m LEFT JOIN r
      ON m.user_id = r.user_id AND m.mts = epoch_us(r.rts)
    WHERE m.side = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(clicks, views, on="user_id", ts="ts")


# ---------------------------------------------------------------------------
# Count-Min frequency sketch: point-estimates vs exact counts
# ---------------------------------------------------------------------------


def _cms_sql() -> str:
    d, w = ops_sketch.CMS_D, ops_sketch.CMS_W
    idx = ", ".join(str(i) for i in range(d))
    h = G.mix_hash("(word_id * 31 + i)")
    return f"""
    WITH t AS MATERIALIZED (SELECT word_id FROM {_TIDS}),
    cells AS MATERIALIZED (
      SELECT i AS row, ({h} % {w}) AS col
      FROM t, (SELECT unnest([{idx}]) AS i) ii
    ),
    cms AS MATERIALIZED (
      SELECT row, col, count(*) AS cnt FROM cells GROUP BY 1, 2
    ),
    probes AS MATERIALIZED (
      SELECT word_id, count(*) AS exact_cnt FROM t GROUP BY 1
    ),
    pcells AS (
      SELECT word_id, i AS row, ({h} % {w}) AS col
      FROM probes, (SELECT unnest([{idx}]) AS i) ii
    )
    SELECT p.word_id, p.exact_cnt,
           min(coalesce(c.cnt, 0)) AS cms_est
    FROM probes p
    JOIN pcells pc USING (word_id)
    LEFT JOIN cms c ON pc.row = c.row AND pc.col = c.col
    GROUP BY 1, 2
    """


@gate("cms_frequency", _cms_sql())
def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    t = ops_text.token_ids(docs, vocab_df=v).select("word_id")
    cms = ops_sketch.cms_build(t, "word_id")
    probes = t.groupBy("word_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    est = ops_sketch.cms_estimate(
        probes.select("word_id"), cms, "word_id"
    )
    return probes.join(est, on="word_id")


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich 2016): top-N merge rules from the
# word-frequency table. Cross-engine exactness rides replace()
# semantics on comma-delimited symbol strings (operator docstring).
# ---------------------------------------------------------------------------

_BPE_N = 6


def _bpe_sql(n: int, segments: bool = False) -> str:
    chars = (
        "list_transform(range(1, length(word) + 1),"
        " i -> substring(word, i, 1))"
    )
    ctes = [f"""w0 AS MATERIALIZED (
      SELECT word, ',' || array_to_string({chars}, ',') || ',' AS s, cnt
      FROM (
        SELECT replace(word, ',', '') AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents) t
        GROUP BY 1
      ) wc WHERE length(word) > 0
    )"""]
    selects = []
    for r in range(1, n + 1):
        ctes.append(f"""p{r} AS MATERIALIZED (
      SELECT lhs, rhs, sum(cnt) AS total FROM (
        SELECT list_extract(syms, i) AS lhs,
               list_extract(syms, i + 1) AS rhs, cnt
        FROM (
          SELECT syms, cnt, unnest(range(1, len(syms))) AS i
          FROM (SELECT list_filter(string_split(s, ','),
                                   x -> x <> '') AS syms, cnt
                FROM w{r - 1}) ss
        ) ee
      ) pp GROUP BY 1, 2
    )""")
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT lhs, rhs, total FROM p{r}"
            f" ORDER BY total DESC, lhs, rhs LIMIT 1)"
        )
        rep = "s"
        for _ in range(ops_text.BPE_PASSES):
            rep = (
                f"replace({rep}, ',' || lhs || ',' || rhs || ',',"
                f" ',' || lhs || rhs || ',')"
            )
        ctes.append(f"""w{r} AS MATERIALIZED (
      SELECT word, {rep} AS s, cnt
      FROM w{r - 1}, b{r}
    )""")
        selects.append(
            f"SELECT {r} AS rank, lhs, rhs, total FROM b{r}"
        )
    if segments:
        final = (
            f"SELECT word, cnt, s,"
            f" len(list_filter(string_split(s, ','), x -> x <> ''))"
            f" AS n_symbols FROM w{n}"
        )
        return "WITH " + ",\n".join(ctes) + "\n" + final
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@gate("bpe_train", _bpe_sql(_BPE_N))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.bpe_train(
        _t(spark, sf_dir, "documents"), n_merges=_BPE_N
    )


@gate("bpe_segment", _bpe_sql(_BPE_N, segments=True))
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.bpe_segment(
        _t(spark, sf_dir, "documents"), n_merges=_BPE_N
    )


# ---------------------------------------------------------------------------
# Weighted (A-ES) and stratified deterministic sampling
# ---------------------------------------------------------------------------

_WS_K = 50
_SS_K = 20


def _ws_key_sql() -> str:
    h = G.mix_hash("(doc_id + 0)")
    u = (
        f"((cast({h} as double) + {G.fnum(1.0)})"
        f" / {G.fnum(float(G.M31))})"
    )
    return (
        f"cast(floor((-ln({u}) / cast(n_chars as double))"
        f" * {G.fnum(float(1 << 20))} + {G.fnum(0.5)}) as bigint)"
    )


@gate(
    "weighted_sample",
    f"""
    SELECT doc_id, {_ws_key_sql()} AS wkey_q FROM documents
    ORDER BY 2, 1 LIMIT {_WS_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(
        docs, k=_WS_K, weight_col="n_chars"
    ).select("doc_id", "wkey_q")


@gate(
    "stratified_sample",
    f"""
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY {G.mix_hash('(event_id + 0)')}, event_id
             ) AS rk
      FROM events
    ) t WHERE rk <= {_SS_K}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import stratified_sample

    ev = _t(spark, sf_dir, "events")
    return stratified_sample(
        ev, k_per_group=_SS_K, group_col="event_type",
        id_col="event_id",
    ).select("event_id", "event_type")

