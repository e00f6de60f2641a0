"""Gate registry extension 7 — corpus-governance ops: eval-set
n-gram decontamination (GPT-3 appx-C style) and per-domain corpus
share (C4/CCNet provenance stats). Both integer/IEEE-exact, full
value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _shingle_sql, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text

# Deterministic held-out "benchmark" slice of the documents table:
# every 37th doc plays the eval set, the rest are the training corpus.
_EVAL_MOD = 37


# ---------------------------------------------------------------------------
# Eval-set n-gram decontamination
# ---------------------------------------------------------------------------
@gate(
    "decontaminate",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0
    ),
    ev AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0
    ),
    tr AS (SELECT * FROM sh WHERE doc_id % {_EVAL_MOD} <> 0)
    SELECT tr.doc_id,
           count(*) AS n_shingles,
           cast(coalesce(
             sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 END), 0
           ) as bigint) AS contaminated,
           cast(coalesce(
             sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 END), 0
           ) as double) / cast(count(*) as double)
             AS contamination_frac,
           CASE WHEN coalesce(
             sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 END), 0
           ) > 0 THEN 1 ELSE 0 END AS is_contaminated
    FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    train = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    ev = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    return ops_dedup.decontaminate(train, ev, vocab_df=v)


# ---------------------------------------------------------------------------
# Per-domain corpus share (pages table provenance stats)
# ---------------------------------------------------------------------------
_URL_SQL = (
    "'https://site-' || cast(event_id % 1000 as varchar)"
    " || '.example.com/page/' || cast(event_id as varchar)"
)


@gate(
    "domain_stats",
    f"""
    WITH pages AS (SELECT {_URL_SQL} AS url FROM events),
    per AS (
      SELECT regexp_extract(url, '{ops_text.DOMAIN_RE}', 1) AS domain,
             count(*) AS n_pages
      FROM pages GROUP BY 1
    )
    SELECT domain, cast(n_pages as bigint) AS n_pages,
           cast(n_pages as double)
             / (SELECT cast(sum(n_pages) as double) FROM per) AS share
    FROM per
    """,
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pages = ev.select(
        F.concat(
            F.lit("https://site-"),
            (F.col("event_id") % 1000).cast("string"),
            F.lit(".example.com/page/"),
            F.col("event_id").cast("string"),
        ).alias("url")
    )
    return ops_text.domain_stats(pages)


# ---------------------------------------------------------------------------
# ExactSubstr dedup CUT step — rewrite docs with duplicated spans
# removed (the corpus-shrinking half of duplicated_spans)
# ---------------------------------------------------------------------------
from pdal_spark.gate import _TOKS, _TIDS  # noqa: E402
from pdal_spark.gates.gate_ext6 import _span_hash_sql, _SPAN_W  # noqa: E402


@gate(
    "span_dedup_cut",
    f"""
    WITH starts AS MATERIALIZED (
      SELECT doc_id, pos, {_span_hash_sql(_SPAN_W)} AS shingle
      FROM {_TIDS} tt
    ),
    st AS (SELECT * FROM starts WHERE shingle IS NOT NULL),
    dup AS (
      SELECT shingle FROM st GROUP BY shingle HAVING count(*) >= 2
    ),
    cov AS (
      SELECT DISTINCT s.doc_id, s.pos + g.range AS cpos
      FROM st s JOIN dup USING (shingle), range({_SPAN_W}) g
    ),
    kept AS (
      SELECT k.doc_id, k.pos, k.word FROM {_TOKS} k
      WHERE NOT EXISTS (
        SELECT 1 FROM cov c
        WHERE c.doc_id = k.doc_id AND c.cpos = k.pos
      )
    ),
    agg AS (
      SELECT doc_id, count(*) AS kept_tokens,
             string_agg(word, ' ' ORDER BY pos) AS text_clean
      FROM kept GROUP BY doc_id
    ),
    nt AS (
      SELECT doc_id, count(*) AS n_tokens FROM {_TOKS} t2 GROUP BY doc_id
    )
    SELECT nt.doc_id, nt.n_tokens,
           cast(coalesce(agg.kept_tokens, 0) as bigint) AS kept_tokens,
           coalesce(agg.text_clean, '') AS text_clean
    FROM nt LEFT JOIN agg USING (doc_id)
    """,
)
def q_span_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.remove_duplicated_spans(
        docs, width=_SPAN_W, min_count=2, vocab_df=v
    )


# ---------------------------------------------------------------------------
# Resolution pyramid — per-cell counts at every level in one pass
# (readers.copc/ept octree-level pruning analog)
# ---------------------------------------------------------------------------
from pdal_spark import sqlgen as G  # noqa: E402
from pdal_spark.gate import _PTS, _points  # noqa: E402
from pdal_spark.operators import h3 as ops_h3  # noqa: E402

_PYR_MIN, _PYR_MAX = 2, 6


def _pyramid_sql(min_res: int, max_res: int) -> str:
    enc = (
        f"SELECT {G.qcell('lat', 'lon', max_res)} AS c FROM {_PTS}"
    )
    rungs = " UNION ALL ".join(
        f"SELECT {r} AS res,"
        f" {G.qcell_parent('c', max_res, r, G.DUCKDB)} AS cell FROM enc"
        for r in range(min_res, max_res + 1)
    )
    return (
        f"WITH enc AS MATERIALIZED ({enc}) "
        f"SELECT res, cell, count(*) AS n_points FROM ({rungs}) u"
        f" GROUP BY res, cell"
    )


@gate("cell_pyramid", _pyramid_sql(_PYR_MIN, _PYR_MAX))
def q_cell_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.cell_pyramid(
        pts, min_res=_PYR_MIN, max_res=_PYR_MAX
    )


# ---------------------------------------------------------------------------
# Slippy z/x/y tiles + Bing quadkey (XYZ serving layout for the
# rasterize output; mercator y cm-quantized on both sides)
# ---------------------------------------------------------------------------
_ZOOM = 6


@gate(
    "slippy_tiles",
    f"""
    SELECT event_id, tx AS tile_x, ty AS tile_y, m AS tile_morton,
           {G.quadkey_from_morton('m', _ZOOM, G.DUCKDB)} AS quadkey
    FROM (
      SELECT event_id, tx, ty,
             {G.morton_key('tx', 'ty', G.DUCKDB)} AS m
      FROM (
        SELECT event_id,
               {G.slippy_tx('lon', _ZOOM)} AS tx,
               {G.slippy_ty('lat', _ZOOM, G.DUCKDB)} AS ty
        FROM {_PTS}
      ) a
    ) b
    """,
)
def q_slippy_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.slippy_encode(pts, zoom=_ZOOM).select(
        "event_id", "tile_x", "tile_y", "tile_morton", "quadkey"
    )


# ---------------------------------------------------------------------------
# Deterministic hash-Bernoulli sample + C4-style per-domain cap
# ---------------------------------------------------------------------------
from pdal_spark.operators import sampling as ops_samp  # noqa: E402

_SAMPLE_RATE = 0.25


@gate(
    "consistent_sample",
    f"""
    SELECT doc_id, n_chars FROM documents
    WHERE ({G.lehmer2_wide('(doc_id + 11)')} % 100000)
          < {int(round(_SAMPLE_RATE * 100000))}
    """,
)
def q_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_samp.consistent_sample(
        docs, rate=_SAMPLE_RATE, salt=11
    ).select("doc_id", "n_chars")


@gate(
    "domain_cap",
    f"""
    WITH pages AS (
      SELECT event_id, {_URL_SQL} AS url FROM events
    ),
    ranked AS (
      SELECT event_id, url,
             row_number() OVER (
               PARTITION BY regexp_extract(url, '{ops_text.DOMAIN_RE}', 1)
               ORDER BY url
             ) AS rn
      FROM pages
    )
    SELECT event_id, url FROM ranked WHERE rn <= 2
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pages = ev.select(
        "event_id",
        F.concat(
            F.lit("https://site-"),
            (F.col("event_id") % 1000).cast("string"),
            F.lit(".example.com/page/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
    )
    return ops_text.domain_cap(pages, cap=2)


# ---------------------------------------------------------------------------
# SimHash hamming-<=k near-dup pairs (Manku et al. 2007 bit-band
# trick: pigeonhole chunks -> bucket join -> exact popcount verify)
# ---------------------------------------------------------------------------
from pdal_spark.gate import _simhash_sql  # noqa: E402

_HAM_K = 2
_HAM_BITS = ops_dedup.SIMHASH_BITS


def _simhash_near_dup_sql(k: int, bits: int) -> str:
    n_chunks = k + 1
    base = bits // n_chunks
    sizes = [base + (1 if i < bits % n_chunks else 0)
             for i in range(n_chunks)]
    offs = [sum(sizes[:i]) for i in range(n_chunks)]
    chunks = " UNION ALL ".join(
        f"SELECT doc_id AS doc, simhash AS sig, {i} AS chunk_idx,"
        f" ((simhash >> {offs[i]}) % {1 << sizes[i]}) AS chunk_val"
        f" FROM sims"
        for i in range(n_chunks)
    )
    return f"""
    WITH sims AS MATERIALIZED ({_simhash_sql()}),
    ch AS ({chunks})
    SELECT DISTINCT l.doc AS a, r.doc AS b,
           bit_count(xor(l.sig, r.sig)) AS hamming
    FROM ch l JOIN ch r
      ON l.chunk_idx = r.chunk_idx AND l.chunk_val = r.chunk_val
    WHERE l.doc < r.doc
      AND bit_count(xor(l.sig, r.sig)) <= {k}
    """


@gate("simhash_near_dup", _simhash_near_dup_sql(_HAM_K, _HAM_BITS))
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    sims = ops_dedup.simhash(docs, vocab_df=v)
    return ops_dedup.simhash_near_dup(sims, k=_HAM_K)


# ---------------------------------------------------------------------------
# XYZ tile pyramid: per-tile counts at every zoom (cell_pyramid on
# the web-mercator grid; parent morton = child morton >> 2)
# ---------------------------------------------------------------------------
_PZ_MIN, _PZ_MAX = 2, 6


def _slippy_pyramid_sql(min_zoom: int, max_zoom: int) -> str:
    enc = f"""
      SELECT {G.morton_key('tx', 'ty', G.DUCKDB)} AS m
      FROM (
        SELECT {G.slippy_tx('lon', max_zoom)} AS tx,
               {G.slippy_ty('lat', max_zoom, G.DUCKDB)} AS ty
        FROM {_PTS}
      ) a
    """
    rungs = " UNION ALL ".join(
        f"SELECT {z} AS zoom, (m >> {2 * (max_zoom - z)}) AS tile_morton"
        f" FROM enc"
        for z in range(min_zoom, max_zoom + 1)
    )
    return (
        f"WITH enc AS MATERIALIZED ({enc}) "
        f"SELECT zoom, tile_morton, count(*) AS n_points"
        f" FROM ({rungs}) u GROUP BY zoom, tile_morton"
    )


@gate("slippy_pyramid", _slippy_pyramid_sql(_PZ_MIN, _PZ_MAX))
def q_slippy_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.slippy_pyramid(
        pts, min_zoom=_PZ_MIN, max_zoom=_PZ_MAX
    )


# ---------------------------------------------------------------------------
# Trained-IVF probe-structured ANN (nlist cells, nprobe probes)
# ---------------------------------------------------------------------------
from pdal_spark.operators import similarity as ops_sim  # noqa: E402

_IVF_NL, _IVF_NP, _IVF_K = 8, 2, 3


def _cos_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))))"
    )


def _ivf_trained_sql(nlist: int, nprobe: int, k: int) -> str:
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cid, cast(embedding as double[]) AS cv
      FROM embeddings
      ORDER BY {G.lehmer2_wide('vec_id')}, vec_id LIMIT {nlist}
    ),
    corp AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS qv FROM embeddings
    ),
    inv AS MATERIALIZED (
      SELECT nb_id, cell, cv2 FROM (
        SELECT c.vec_id AS nb_id, kk.cid AS cell, c.qv AS cv2,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {_cos_sql('c.qv', 'kk.cv')} DESC, kk.cid ASC
               ) AS rn
        FROM corp c, cents kk
      ) x WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, kk.cid AS cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.qv', 'kk.cv')} DESC, kk.cid ASC
               ) AS rn
        FROM (SELECT * FROM corp WHERE vec_id < 20) q, cents kk
      ) x WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, i.nb_id,
             {_cos_sql('qc.qv', 'i.cv2')} AS cosine
      FROM probes p
      JOIN corp qc ON qc.vec_id = p.query_id
      JOIN inv i ON i.cell = p.cell
      WHERE p.query_id <> i.nb_id
    )
    SELECT query_id, nb_id, round(cosine, 9) AS cosine, sim_rank FROM (
      SELECT query_id, nb_id, cosine,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, nb_id ASC
             ) AS sim_rank
      FROM cand
    ) t WHERE sim_rank <= {k}
    """


@gate("ivf_trained_topk", _ivf_trained_sql(_IVF_NL, _IVF_NP, _IVF_K))
def q_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = ops_sim.ivf_trained_topk(
        emb.where(F.col("vec_id") < 20), emb,
        k=_IVF_K, nlist=_IVF_NL, nprobe=_IVF_NP,
    )
    return out.select(
        "query_id", "nb_id",
        F.round("cosine", 9).alias("cosine"), "sim_rank",
    )


# ---------------------------------------------------------------------------
# Geohash cells — the third public cell-index family (base-32 prefix
# code) next to qcell and S2/Hilbert; interchange form for exports
# ---------------------------------------------------------------------------
_GH_P = 7


@gate(
    "geohash_cells",
    f"""
    SELECT event_id, gk AS geohash_key,
           {G.geohash_str('gk', _GH_P, G.DUCKDB)} AS geohash,
           {G.geohash_center_lat('lat', 'lon', _GH_P)} AS gh_lat,
           {G.geohash_center_lon('lat', 'lon', _GH_P)} AS gh_lon
    FROM (
      SELECT event_id, lat, lon,
             {G.geohash_int('lat', 'lon', _GH_P, G.DUCKDB)} AS gk
      FROM {_PTS}
    ) a
    """,
)
def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.geohash_encode(
        pts, precision=_GH_P, with_center=True
    ).select("event_id", "geohash_key", "geohash", "gh_lat", "gh_lon")


# ---------------------------------------------------------------------------
# writers.gdal binmode + percentile outputs (GDALGrid::fillPercentiles)
# ---------------------------------------------------------------------------
from pdal_spark.gate import _LAT, _LON  # noqa: E402
from pdal_spark.gate import _RES, _ROX, _ROY, _RW, _RH  # noqa: E402
from pdal_spark.gate import _event_points_z  # noqa: E402
from pdal_spark.operators import raster as ops_raster  # noqa: E402

_PQ = "1048576e0"  # 2^20 fixed-point grid (exact percentile interp)


def _raster_pctl_sql() -> str:
    pctls = ", ".join(
        f"quantile_cont(pzq, {p / 100.0}) / {_PQ} AS p{p}"
        for p in (25, 50, 75)
    )
    return f"""
    SELECT cell_i, cell_j, count(*) AS cnt,
           min(pz) AS zmin, max(pz) AS zmax,
           (cast(sum(pzq) as double) / {_PQ}) / count(*) AS zmean,
           {pctls}
    FROM (
      SELECT pz, cast(round(pz * {_PQ}) as bigint) AS pzq,
             cast(floor((lon - {G.fnum(_ROX)}) / {G.fnum(_RES)})
                  as bigint) AS cell_i,
             cast(floor((lat - {G.fnum(_ROY)}) / {G.fnum(_RES)})
                  as bigint) AS cell_j
      FROM (SELECT value AS pz, {_LAT} AS lat, {_LON} AS lon
            FROM events) e
    ) p
    WHERE cell_i >= 0 AND cell_i < {_RW}
      AND cell_j >= 0 AND cell_j < {_RH}
    GROUP BY cell_i, cell_j
    """


@gate("rasterize_percentile", _raster_pctl_sql())
def q_rasterize_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points_z(spark, sf_dir)
    return ops_raster.rasterize_binmode(
        pts, resolution=_RES, origin_x=_ROX, origin_y=_ROY,
        width=_RW, height=_RH, x="lon", y="lat", z="value",
        percentiles=(25, 50, 75), deterministic=True,
    )


# ---------------------------------------------------------------------------
# LM sequence packing (GPT-style concat-and-chunk): per-doc manifest
# + per-pack rollup. Engine side is a distributed prefix sum
# (scalable_prefix_sums, no global window); oracle is the plain
# window form — identical integers.
# ---------------------------------------------------------------------------
_SEQ_LEN = 64

_PACK_SQL = f"""
  (SELECT doc_id, n_tokens,
          cast(sum(n_tokens) OVER (ORDER BY doc_id)
               - n_tokens as bigint) AS start_tok
   FROM (SELECT doc_id,
                cast(len(string_split(text, ' ')) as bigint) AS n_tokens
         FROM documents) d)
"""


@gate(
    "sequence_pack",
    f"""
    SELECT doc_id, n_tokens, start_tok,
           (start_tok // {_SEQ_LEN}) AS pack_first,
           (start_tok % {_SEQ_LEN}) AS off_first,
           ((start_tok + n_tokens - 1) // {_SEQ_LEN}) AS pack_last,
           ((start_tok + n_tokens - 1) // {_SEQ_LEN})
             - (start_tok // {_SEQ_LEN}) + 1 AS n_spans
    FROM {_PACK_SQL} p
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.sequence_pack(docs, seq_len=_SEQ_LEN)


@gate(
    "pack_manifest",
    f"""
    WITH per AS (
      SELECT doc_id, n_tokens, start_tok,
             (start_tok // {_SEQ_LEN}) AS pack_first,
             ((start_tok + n_tokens - 1) // {_SEQ_LEN}) AS pack_last
      FROM {_PACK_SQL} p
    ),
    spans AS (
      SELECT doc_id, start_tok, n_tokens, pack_first,
             pack_first + unnest(range(pack_last - pack_first + 1))
               AS pack_id
      FROM per
    )
    SELECT pack_id, count(*) AS n_docs,
           cast(sum(CASE WHEN pack_first = pack_id THEN 1 ELSE 0 END)
                as bigint) AS n_doc_starts,
           cast(sum(least(start_tok + n_tokens, (pack_id + 1) * {_SEQ_LEN})
                    - greatest(start_tok, pack_id * {_SEQ_LEN}))
                as bigint) AS n_tokens
    FROM spans GROUP BY pack_id
    """,
)
def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.pack_manifest(docs, seq_len=_SEQ_LEN)


# ---------------------------------------------------------------------------
# int8 vector quantization + quantized-domain ANN (the shuffle-size
# lever for 100 TB similarity search: 4x smaller payloads, integer
# dots that are exact in double => bit-reproducible under any plan).
# ---------------------------------------------------------------------------
_QMAX = 127  # 8-bit symmetric

_QZ = f"""
  (SELECT vec_id,
          list_transform(v, x -> round(x * {_QMAX} / m)) AS qv,
          m AS qscale
   FROM (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) AS m
         FROM (SELECT vec_id, cast(embedding as double[]) AS v
               FROM embeddings) r) s)
"""


@gate(
    "vector_quantize",
    f"""
    SELECT vec_id, round(qscale, 9) AS qscale,
           cast(list_sum(qv) as bigint) AS qsum,
           cast(list_sum(list_transform(qv, x -> abs(x))) as bigint)
             AS qabs,
           cast(len(qv) as int) AS dim
    FROM {_QZ} z
    """,
)
def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    qz = ops_sim.quantize_vectors(emb, bits=8)
    zero = F.lit(0.0)
    return qz.select(
        "vec_id",
        F.round("qscale", 9).alias("qscale"),
        F.aggregate("qvec", zero, lambda a, v: a + v)
        .cast("bigint").alias("qsum"),
        F.aggregate("qvec", zero, lambda a, v: a + F.abs(v))
        .cast("bigint").alias("qabs"),
        F.size("qvec").alias("dim"),
    )


_QCOS = (
    "list_dot_product(q.qv, c.qv)"
    " / (sqrt(list_dot_product(q.qv, q.qv))"
    "    * sqrt(list_dot_product(c.qv, c.qv)))"
)


@gate(
    "quantized_topk",
    f"""
    SELECT query_id, nb_id, round(qcosine, 9) AS qcosine, sim_rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
             {_QCOS} AS qcosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_QCOS} DESC, c.vec_id ASC
             ) AS sim_rank
      FROM (SELECT * FROM {_QZ} z0 WHERE vec_id < 20) q,
           {_QZ} c
      WHERE q.vec_id <> c.vec_id
    ) t WHERE sim_rank <= 3
    """,
)
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    out = ops_sim.quantized_topk(
        emb.where(F.col("vec_id") < 20), emb, k=3, bits=8
    )
    return out.select(
        "query_id", "nb_id",
        F.round("qcosine", 9).alias("qcosine"), "sim_rank",
    )


# ---------------------------------------------------------------------------
# Temperature-based corpus mixing (share^alpha data balancing).
# Skewed synthetic domains: dom_id = floor(sqrt(event_id % 4096))
# gives 64 domains of sizes 1,3,5,...,127 — so rates actually vary.
# alpha = 0.5 => rate_d = sqrt(n_min / n_d): one divide + one sqrt,
# IEEE-exact on both engines; the keep test is integer.
# ---------------------------------------------------------------------------
_TR_BUCKETS = 100_000

_TR_URL = (
    "'https://site-' || cast(cast(floor(sqrt("
    "cast(event_id % 4096 as double))) as bigint) as varchar)"
    " || '.example.com/p/' || cast(event_id as varchar)"
)


def _temperature_sql() -> str:
    h = G.lehmer2_wide("(page_id + 0)")
    return f"""
    WITH pages AS (
      SELECT event_id AS page_id, {_TR_URL} AS url FROM events
    ),
    d AS (
      SELECT page_id, url,
             regexp_extract(url, '{ops_text.DOMAIN_RE}', 1) AS domain
      FROM pages
    ),
    per AS (SELECT domain, count(*) AS n FROM d GROUP BY domain),
    r AS (
      SELECT domain, cast(n as bigint) AS domain_pages,
             sqrt(cast((SELECT min(n) FROM per) as double)
                  / cast(n as double)) AS sample_rate
      FROM per
    )
    SELECT d.page_id, d.domain, r.domain_pages, r.sample_rate
    FROM d JOIN r USING (domain)
    WHERE ({h} % {_TR_BUCKETS})
          < cast(floor(sample_rate * {G.fnum(float(_TR_BUCKETS))} + 0.5)
                 as bigint)
    """


@gate("temperature_resample", _temperature_sql())
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dom_id = F.floor(
        F.sqrt((F.col("event_id") % 4096).cast("double"))
    ).cast("bigint")
    pages = ev.select(
        F.col("event_id").alias("page_id"),
        F.concat(
            F.lit("https://site-"), dom_id.cast("string"),
            F.lit(".example.com/p/"), F.col("event_id").cast("string"),
        ).alias("url"),
    )
    out = ops_text.temperature_resample(
        pages, alpha=0.5, id_col="page_id", buckets=_TR_BUCKETS
    )
    return out.select("page_id", "domain", "domain_pages", "sample_rate")


# ---------------------------------------------------------------------------
# BPE pair counting (the inner statistic of tokenizer training).
# Engine builds pairs row-locally (2-window over the token array);
# oracle is the classic positional self-join — identical integers.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _TOKS as _TOKS7  # noqa: E402


@gate(
    "bpe_pair_counts",
    f"""
    SELECT l.word AS left_tok, r.word AS right_tok,
           cast(count(*) as bigint) AS n_pairs
    FROM {_TOKS7} l
    JOIN {_TOKS7} r ON l.doc_id = r.doc_id AND r.pos = l.pos + 1
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.bpe_pair_counts(docs, min_count=2)


# ---------------------------------------------------------------------------
# PII redaction. The synthetic corpus has no PII, so the gate plants
# deterministic emails/phones/IPs derived from event ids and checks
# the scrubbed text + per-kind counts exactly. Patterns live in the
# RE2/Java common subset (see textops.EMAIL_RE).
# ---------------------------------------------------------------------------
_PII_TXT = (
    "'reach u' || cast(event_id as varchar)"
    " || ' at u' || cast(event_id as varchar)"
    " || '@mail-' || cast(event_id % 50 as varchar) || '.com'"
    " || ' ip 10.' || cast(event_id % 256 as varchar)"
    " || '.0.' || cast(event_id % 100 as varchar)"
    " || ' tel +1-555-' || lpad(cast(event_id % 1000 as varchar), 3, '0')"
    " || '-' || lpad(cast(event_id % 10000 as varchar), 4, '0')"
)


@gate(
    "redact_pii",
    f"""
    SELECT doc_id,
           cast(len(regexp_extract_all(text, '{ops_text.EMAIL_RE}'))
                as int) AS n_emails,
           cast(len(regexp_extract_all(text, '{ops_text.PHONE_RE}'))
                as int) AS n_phones,
           cast(len(regexp_extract_all(text, '{ops_text.IPV4_RE}'))
                as int) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{ops_text.EMAIL_RE}', '<EMAIL>', 'g'),
             '{ops_text.PHONE_RE}', '<PHONE>', 'g'),
             '{ops_text.IPV4_RE}', '<IP>', 'g') AS clean_text
    FROM (SELECT event_id AS doc_id, {_PII_TXT} AS text FROM events) p
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    txt = F.concat(
        F.lit("reach u"), eid.cast("string"),
        F.lit(" at u"), eid.cast("string"),
        F.lit("@mail-"), (eid % 50).cast("string"), F.lit(".com"),
        F.lit(" ip 10."), (eid % 256).cast("string"),
        F.lit(".0."), (eid % 100).cast("string"),
        F.lit(" tel +1-555-"),
        F.lpad((eid % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((eid % 10000).cast("string"), 4, "0"),
    )
    pages = ev.select(eid.alias("doc_id"), txt.alias("text"))
    return ops_text.redact_pii(pages)


# ---------------------------------------------------------------------------
# C4-style bad-words blocklist filter. Deterministic blocklist: every
# vocab word whose Lehmer-hashed id falls in a 1/29 slice.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _VOCAB as _VOCAB7  # noqa: E402

_BL_MOD = 29


@gate(
    "blocklist_filter",
    f"""
    WITH bl AS (
      SELECT word FROM {_VOCAB7} v
      WHERE {G.lehmer2('word_id')} % {_BL_MOD} = 0
    )
    SELECT d.doc_id, d.text FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM {_TOKS7} t JOIN bl USING (word)
      WHERE t.doc_id = d.doc_id
    )
    """,
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v = ops_text.vocab(docs)
    bl = v.where(
        F.expr(G.lehmer2("word_id")) % _BL_MOD == 0
    ).select("word")
    return ops_text.blocklist_filter(docs, bl)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. SIGMOD'03 / MOSS): min
# shingle-hash per sliding w-window, distinct. Oracle mirrors the
# dense-vocab window form; gate checks the exact fingerprint set.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _TIDS as _TIDS7  # noqa: E402

_WIN_W = 4


@gate(
    "winnow_fingerprints",
    f"""
    WITH s AS (
      SELECT doc_id, pos,
             ((((w1 * 8191 + w2) % {G.M31}) * 8191 + w3) % {G.M31})
               AS shingle
      FROM (
        SELECT doc_id, pos, word_id AS w1,
               lead(word_id, 1) OVER win AS w2,
               lead(word_id, 2) OVER win AS w3
        FROM {_TIDS7} t
        WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) q WHERE w2 IS NOT NULL AND w3 IS NOT NULL
    ),
    m AS (
      SELECT doc_id,
             min(shingle) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING
             ) AS fingerprint,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS rn,
             count(*) OVER (PARTITION BY doc_id) AS cnt
      FROM s
    )
    SELECT DISTINCT doc_id, fingerprint
    FROM m WHERE rn <= cnt - {_WIN_W} + 1
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.winnow_fingerprints(docs, w=_WIN_W, vocab_df=v)


# ---------------------------------------------------------------------------
# Text normalization (CCNet canonical form) + URL canonicalization —
# both pure row-local regexp chains; gates plant messy synthetic
# inputs derived from ids so every branch is exercised.
# ---------------------------------------------------------------------------
_NORM_TXT = (
    "'  The QUICK,,  brown-FOX #' || cast(event_id as varchar)"
    " || CASE WHEN event_id % 2 = 0 THEN '  (jumps)!! ' ELSE ' jumps ' END"
    " || 'over   the LAZY dog.  '"
)


@gate(
    "normalize_text",
    f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]+', ' ', 'g'), '  +', ' ', 'g')) AS norm_text
    FROM (SELECT event_id AS doc_id, {_NORM_TXT} AS text FROM events) p
    """,
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    txt = F.concat(
        F.lit("  The QUICK,,  brown-FOX #"), eid.cast("string"),
        F.when(eid % 2 == 0, F.lit("  (jumps)!! "))
        .otherwise(F.lit(" jumps ")),
        F.lit("over   the LAZY dog.  "),
    )
    pages = ev.select(eid.alias("doc_id"), txt.alias("text"))
    return ops_text.normalize_text(pages)


_CURL_TXT = (
    "'HTTPS://Site-' || cast(event_id % 97 as varchar)"
    " || '.Example.COM/Path/To/Page' || cast(event_id as varchar)"
    " || CASE WHEN event_id % 3 = 0 THEN '/?utm=x&ref=y'"
    "         WHEN event_id % 3 = 1 THEN '#frag' ELSE '/' END"
)


@gate(
    "canonical_url",
    f"""
    SELECT url,
           regexp_replace(
             lower(regexp_extract(u2, '^([a-zA-Z0-9+.-]*://[^/]*)', 1))
               || regexp_replace(u2, '^[a-zA-Z0-9+.-]*://[^/]*', ''),
             '/$', '') AS canon_url
    FROM (
      SELECT url, regexp_replace(url, '[?#].*$', '') AS u2
      FROM (SELECT {_CURL_TXT} AS url FROM events) p
    ) q
    """,
)
def q_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    url = F.concat(
        F.lit("HTTPS://Site-"), (eid % 97).cast("string"),
        F.lit(".Example.COM/Path/To/Page"), eid.cast("string"),
        F.when(eid % 3 == 0, F.lit("/?utm=x&ref=y"))
        .when(eid % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit("/")),
    )
    pages = ev.select(url.alias("url"))
    return ops_text.canonical_url(pages).select("url", "canon_url")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split — disjoint + exhaustive by
# construction (one Lehmer hash, contiguous cumulative ranges).
# ---------------------------------------------------------------------------
_SPLIT_B = 10_000


def _corpus_split_sql() -> str:
    h = G.lehmer2_wide("(doc_id + 0)")
    # weights train/val/test = 0.98/0.01/0.01 over 10000 buckets
    return f"""
    SELECT doc_id,
           CASE WHEN ({h} % {_SPLIT_B}) < 9800 THEN 'train'
                WHEN ({h} % {_SPLIT_B}) < 9900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """


@gate("corpus_split", _corpus_split_sql())
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.corpus_split(docs).select("doc_id", "split")


# ---------------------------------------------------------------------------
# IVF + int8 scoring (the FAISS-style combination): float-domain
# probe structure, quantized candidate scoring. Oracle composes the
# trained-IVF CTEs with the quantize fragment.
# ---------------------------------------------------------------------------
def _ivf_quantized_sql(nlist: int, nprobe: int, k: int) -> str:
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cid, cast(embedding as double[]) AS cv
      FROM embeddings
      ORDER BY {G.lehmer2_wide('vec_id')}, vec_id LIMIT {nlist}
    ),
    corp AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS qv FROM embeddings
    ),
    qz AS MATERIALIZED (
      SELECT vec_id,
             list_transform(qv, x -> round(x * {_QMAX} / m)) AS q8
      FROM (SELECT vec_id, qv,
                   list_max(list_transform(qv, y -> abs(y))) AS m
            FROM corp) b
    ),
    inv AS MATERIALIZED (
      SELECT nb_id, cell FROM (
        SELECT c.vec_id AS nb_id, kk.cid AS cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {_cos_sql('c.qv', 'kk.cv')} DESC, kk.cid ASC
               ) AS rn
        FROM corp c, cents kk
      ) x WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, kk.cid AS cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.qv', 'kk.cv')} DESC, kk.cid ASC
               ) AS rn
        FROM (SELECT * FROM corp WHERE vec_id < 20) q, cents kk
      ) x WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, i.nb_id,
             {_cos_sql('qa.q8', 'qb.q8')} AS qcosine
      FROM probes p
      JOIN qz qa ON qa.vec_id = p.query_id
      JOIN inv i ON i.cell = p.cell
      JOIN qz qb ON qb.vec_id = i.nb_id
      WHERE p.query_id <> i.nb_id
    )
    SELECT query_id, nb_id, round(qcosine, 9) AS qcosine, sim_rank
    FROM (
      SELECT query_id, nb_id, qcosine,
             row_number() OVER (
               PARTITION BY query_id ORDER BY qcosine DESC, nb_id ASC
             ) AS sim_rank
      FROM cand
    ) t WHERE sim_rank <= {k}
    """


@gate("ivf_quantized_topk", _ivf_quantized_sql(_IVF_NL, _IVF_NP, _IVF_K))
def q_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = ops_sim.ivf_quantized_topk(
        emb.where(F.col("vec_id") < 20), emb,
        k=_IVF_K, nlist=_IVF_NL, nprobe=_IVF_NP, bits=8,
    )
    return out.select(
        "query_id", "nb_id",
        F.round("qcosine", 9).alias("qcosine"), "sim_rank",
    )


# ---------------------------------------------------------------------------
# Gopher composite quality verdict (Rae et al. 2021 table A1 shape):
# per-rule 0/1 flags + AND. All ratios are single IEEE divisions of
# integer counts, so the flag comparisons are engine-exact.
# ---------------------------------------------------------------------------
def _gopher_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in ops_text.STOPWORDS)
    return f"""
    WITH q AS (
      SELECT doc_id, length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_words,
             cast(length(text) - length(regexp_replace(text,
                  '[^A-Za-z0-9 ]', '', 'g')) as double)
               / cast(length(text) as double) AS punct_ratio,
             len(list_intersect(string_split(text, ' '),
                 [{stops}])) AS n_stop
      FROM documents
    ),
    toks AS (SELECT * FROM {_TOKS7} t0),
    big AS (
      SELECT doc_id, word,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bcnt AS (
      SELECT doc_id, word, w2, count(*) AS cnt,
             count(*) * (length(word) + length(w2)) AS covered
      FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT doc_id, covered AS top_covered FROM (
        SELECT doc_id, covered, row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY covered DESC, cnt DESC, word ASC, w2 ASC
               ) AS r
        FROM bcnt
      ) rr WHERE r = 1
    ),
    pd AS (
      SELECT doc_id, count(*) AS n_tokens,
             count(DISTINCT word) AS n_distinct,
             sum(length(word)) AS word_chars
      FROM toks GROUP BY 1
    ),
    r AS (
      SELECT pd.doc_id,
             cast(n_tokens - n_distinct as double)
               / cast(n_tokens as double) AS dup_word_frac,
             cast(coalesce(top_covered, 0) as double)
               / cast(word_chars as double) AS top_bigram_frac
      FROM pd LEFT JOIN top USING (doc_id)
    ),
    jj AS (
      SELECT q.doc_id, n_words, punct_ratio, n_stop,
             cast(n_chars - n_words + 1 as double)
               / cast(n_words as double) AS mean_wl,
             dup_word_frac, top_bigram_frac
      FROM q JOIN r ON q.doc_id = r.doc_id
    )
    SELECT doc_id,
      cast(n_words >= 5 AND n_words <= 100000 as int) AS r_word_count,
      cast(mean_wl >= 3.0 AND mean_wl <= 10.0 as int)
        AS r_mean_word_len,
      cast(n_stop >= 2 as int) AS r_stopwords,
      cast(punct_ratio <= 0.2 as int) AS r_punct,
      cast(dup_word_frac <= 0.3 as int) AS r_dup_words,
      cast(top_bigram_frac <= 0.18 as int) AS r_top_bigram,
      cast(n_words >= 5 AND n_words <= 100000
           AND mean_wl >= 3.0 AND mean_wl <= 10.0
           AND n_stop >= 2 AND punct_ratio <= 0.2
           AND dup_word_frac <= 0.3 AND top_bigram_frac <= 0.18
           as int) AS keep
    FROM jj
    """


@gate("gopher_rules", _gopher_sql())
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.gopher_rules(docs)


# ---------------------------------------------------------------------------
# Corpus-snapshot diff: v1 = documents; v2 drops every 7th doc,
# rewrites every 11th, adds shifted ids. Output is churn-only.
# ---------------------------------------------------------------------------
@gate(
    "snapshot_diff",
    """
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || ' EDITED'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 13 = 0
    ),
    j AS (
      SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             md5(v1.text) AS oh, md5(v2.text) AS nh
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT doc_id,
           CASE WHEN oh IS NULL THEN 'added'
                WHEN nh IS NULL THEN 'removed'
                WHEN oh <> nh THEN 'modified' END AS status
    FROM j
    WHERE (oh IS NULL) OR (nh IS NULL) OR (oh <> nh)
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v2a = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" EDITED"))
        ).otherwise(F.col("text")).alias("text"),
    )
    v2b = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return ops_text.snapshot_diff(docs, v2a.unionByName(v2b))


# ---------------------------------------------------------------------------
# Integer PageRank domain authority: 64-node synthetic link graph
# from events (src = id % 64, dst = lehmer(id) % 64). All int64
# arithmetic (div truncation included) — ranks hash-compare exactly.
# ---------------------------------------------------------------------------
_PR_SCALE = 10**12
_PR_ITERS = 3


def _authority_sql(iters: int, scale: int) -> str:
    tele = (scale * 15) // 100
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT (event_id % 64) AS src,
             ({G.lehmer2('event_id')} % 64) AS dst
      FROM events
      WHERE event_id % 23 = 0
        AND (event_id % 64) <> ({G.lehmer2('event_id')} % 64)
    ),
    deg AS MATERIALIZED (
      SELECT src, count(*) AS d FROM e GROUP BY src
    ),
    n AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION SELECT dst FROM e
      ) u
    ),
    r0 AS MATERIALIZED (
      SELECT node, CAST({scale} AS BIGINT) AS r FROM n
    )"""]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f""",
    r{i} AS MATERIALIZED (
      SELECT n.node, CAST({tele} AS BIGINT) + coalesce(s.in_r, 0) AS r
      FROM n LEFT JOIN (
        SELECT e.dst AS node,
               sum((p.r * 85) // (CAST(100 AS BIGINT) * deg.d)) AS in_r
        FROM e JOIN deg ON deg.src = e.src
               JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT node, r AS authority FROM {prev}
    """)
    return "".join(parts)


@gate("domain_authority", _authority_sql(_PR_ITERS, _PR_SCALE))
def q_domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.where(F.col("event_id") % 23 == 0)
        .select(
            (F.col("event_id") % 64).alias("src"),
            (F.expr(G.lehmer2("event_id")) % 64).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return ops_text.domain_authority(
        edges, iters=_PR_ITERS, scale=_PR_SCALE
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dup candidate pairs that CROSS the
# train/val/test boundary (the eval-contamination failure mode a
# random split can't prevent). Composes the LSH pair pipeline with
# the deterministic split assignment.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _lsh_pairs_sql  # noqa: E402


def _split_case(col: str) -> str:
    # balanced 50/25/25 split for the leakage audit (the production
    # 98/1/1 split yields ~0 cross-split pairs at sf0.001)
    h = G.lehmer2_wide(f"({col} + 0)")
    return (
        f"CASE WHEN ({h} % {_SPLIT_B}) < 5000 THEN 'train'"
        f" WHEN ({h} % {_SPLIT_B}) < 7500 THEN 'val'"
        f" ELSE 'test' END"
    )


@gate(
    "split_leakage",
    f"""
    SELECT a, b, {_split_case('a')} AS split_a,
           {_split_case('b')} AS split_b, jaccard
    FROM ({_lsh_pairs_sql()}) p
    WHERE {_split_case('a')} <> {_split_case('b')}
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    pairs = ops_dedup.minhash_lsh_dedup(docs, threshold=0.0, vocab_df=v)
    s = ops_text.corpus_split(
        docs.select("doc_id"),
        weights={"train": 0.5, "val": 0.25, "test": 0.25},
    )
    sa = s.select(F.col("doc_id").alias("a"),
                  F.col("split").alias("split_a"))
    sb = s.select(F.col("doc_id").alias("b"),
                  F.col("split").alias("split_b"))
    return (
        pairs.join(sa, on="a").join(sb, on="b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "split_a", "split_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (WARC payload -> pages.text). Gate plants
# synthetic html (script/style blocks, nested tags, entities) from
# event ids and checks the extracted text byte-for-byte.
# ---------------------------------------------------------------------------
_HTML_SQL = (
    "'<html><head><script>var x = 1 &lt; 2;</script>"
    "<style>p { color: red; }</style></head><body><h1>Title <b>'"
    " || cast(event_id as varchar) ||"
    " '</b></h1>  <p>one &amp; two &quot;three&quot; #'"
    " || cast(event_id % 7 as varchar) ||"
    " '</p></body></html>'"
)


@gate(
    "extract_text",
    f"""
    SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '(?s)<script[^>]*>.*?</script>',
                                  ' ', 'g'),
                   '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                 '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&amp;', '&'),
             '\\s+', ' ', 'g')) AS text
    FROM (SELECT event_id AS doc_id, {_HTML_SQL} AS html FROM events) p
    """,
)
def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    html = F.concat(
        F.lit("<html><head><script>var x = 1 &lt; 2;</script>"
              "<style>p { color: red; }</style></head><body>"
              "<h1>Title <b>"),
        eid.cast("string"),
        F.lit("</b></h1>  <p>one &amp; two &quot;three&quot; #"),
        (eid % 7).cast("string"),
        F.lit("</p></body></html>"),
    )
    pages = ev.select(
        eid.alias("doc_id"),
        F.encode(html, "utf-8").alias("html"),  # exercise binary path
    )
    return ops_text.extract_text(pages).select("doc_id", "text")


# ---------------------------------------------------------------------------
# Audio metadata decode (multimodal twin of multimodal_meta): the
# stub codec derives (sample_rate, channels, duration) from byte
# length — integer arithmetic the oracle replays on length(text).
# ---------------------------------------------------------------------------
from pdal_spark.operators import multimodal as ops_mm7  # noqa: E402


@gate(
    "audio_meta",
    """
    SELECT doc_id, cast(length(text) as bigint) AS byte_len,
           cast(8000 + (length(text) % 3) * 4000 as int) AS sample_rate,
           cast(length(text) % 2 + 1 as int) AS n_channels,
           cast(length(text) * 1000
                // (2 * (8000 + (length(text) % 3) * 4000)
                    * (length(text) % 2 + 1)) as bigint) AS duration_ms
    FROM documents
    """,
)
def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    with_bin = ops_mm7.attach_binary(docs)
    return ops_mm7.decode_audio_meta(with_bin, codec="fake")


# ---------------------------------------------------------------------------
# Incremental exact dedup (new crawl vs existing corpus): existing =
# ids % 3 == 0, new = the rest. Batch-proportional work.
# ---------------------------------------------------------------------------
@gate(
    "incremental_dedup",
    """
    WITH ex AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 = 0
    ),
    nw AS (
      SELECT doc_id, text, md5(text) AS h FROM documents
      WHERE doc_id % 3 <> 0
    ),
    fresh AS (
      SELECT * FROM nw WHERE h NOT IN (SELECT h FROM ex)
    ),
    keep AS (SELECT h, min(doc_id) AS doc_id FROM fresh GROUP BY h)
    SELECT f.doc_id, f.text
    FROM fresh f JOIN keep k ON k.doc_id = f.doc_id AND k.h = f.h
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    return ops_dedup.incremental_exact_dedup(new, existing)


# ---------------------------------------------------------------------------
# Incremental MinHash near-dup: candidates are (new x existing) +
# (new x new); existing x existing never generated. Oracle composes
# the minhash/band/jaccard SQL with the side split.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _minhash_sql  # noqa: E402


def _inc_minhash_sql() -> str:
    band_exprs = []
    for bnd in range(4):
        e = "0"
        for r in range(4):
            e = f"(({e} * 8191 + sig_{bnd * 4 + r}) % {1 << 45})"
        band_exprs.append(
            f"SELECT doc_id AS doc, {bnd} AS band, {e} AS bsig FROM sigs"
        )
    bands_sql = " UNION ALL ".join(band_exprs)
    return f"""
    WITH sigs AS ({_minhash_sql()}),
    bands AS ({bands_sql}),
    bn AS (SELECT * FROM bands WHERE doc % 3 <> 0),
    be AS (SELECT * FROM bands WHERE doc % 3 = 0),
    cand AS (
      SELECT DISTINCT n.doc AS a, e.doc AS b
      FROM bn n JOIN be e USING (band, bsig)
      UNION
      SELECT DISTINCT l.doc AS a, r.doc AS b
      FROM bn l JOIN bn r USING (band, bsig) WHERE l.doc < r.doc
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT c.a, c.b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.a
      JOIN sh sb ON sb.doc_id = c.b AND sa.shingle = sb.shingle
      GROUP BY c.a, c.b
    )
    SELECT c.a, c.b,
           cast(coalesce(i.n_inter, 0) as double)
             / cast(za.sz + zb.sz - coalesce(i.n_inter, 0) as double)
             AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN sz za ON za.doc_id = c.a
    JOIN sz zb ON zb.doc_id = c.b
    """


@gate("incremental_near_dup", _inc_minhash_sql())
def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v = ops_text.vocab(docs)
    existing = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    return ops_dedup.incremental_minhash_dedup(
        new, existing, threshold=0.0, vocab_df=v
    )
