"""Gate registry extension 11 — batch-3 ops: the 1-D range join
(interval containment via time-cell bucketing — the temporal twin of
the point-in-polygon join), the hypertable continuous-aggregate
pyramid (multi-resolution time buckets, TimescaleDB-style), and the
product-quantization ANN family tail. All integer / IEEE-exact, full
value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# interval_join — the range join Spark lacks as a shuffle-join
# (a raw `ON ts BETWEEN start AND end` plans as BNLJ). Intervals are
# derived deterministically from sparse events (1 in 17), with
# lengths of 1..5 x 45 min so most intervals span multiple 1-hour
# cells and the fan-out path is exercised.
# ---------------------------------------------------------------------------

_IV_MOD = 17
_IV_UNIT_US = 2_700 * 1_000_000  # 45 min


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.expr(f"event_id % {_IV_MOD} = 0")).select(
        F.col("event_id").alias("iv_id"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("start_us"),
        F.expr(
            "unix_micros(cast(ts as timestamp)) + "
            f"(1 + event_id % 5) * {_IV_UNIT_US}"
        ).alias("end_us"),
        F.col("event_type").alias("iv_type"),
    )


_INTERVALS_SQL = f"""
(SELECT event_id AS iv_id,
        epoch_us(ts) AS start_us,
        epoch_us(ts) + (1 + event_id % 5) * {_IV_UNIT_US} AS end_us,
        event_type AS iv_type
 FROM events WHERE event_id % {_IV_MOD} = 0) iv
"""


@gate(
    "interval_join",
    f"""
    SELECT e.event_id, iv.iv_id, e.event_type, iv.iv_type
    FROM events e JOIN {_INTERVALS_SQL}
      ON epoch_us(e.ts) >= iv.start_us
     AND epoch_us(e.ts) < iv.end_us
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iv = _intervals(spark, sf_dir)
    out = ops_temporal.interval_join(
        ev.select("event_id", "ts", "event_type"), iv, cell_s=3600
    )
    return out.select("event_id", "iv_id", "event_type", "iv_type")


# ---------------------------------------------------------------------------
# time_rollup — hypertable continuous-aggregate pyramid: minute /
# hour / day buckets per event_type; coarser levels folded from the
# finest aggregate, never from raw rows.
# ---------------------------------------------------------------------------

_TR_WIDTHS = [60, 3600, 86400]
_TR_SCALE = 1 << 20


def _rollup_level_sql(w: int) -> str:
    return f"""
    SELECT cast({w} as int) AS width_s,
           (epoch_us(ts) // {w * 1_000_000}) * {w} AS bucket_start_s,
           event_type,
           count(*) AS n,
           sum(cast(round(value * {_TR_SCALE}.0) as bigint))
             AS value_q_sum
    FROM events GROUP BY 2, 3
    """


@gate(
    "time_rollup",
    " UNION ALL ".join(_rollup_level_sql(w) for w in _TR_WIDTHS),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.time_rollup(
        ev, widths_s=_TR_WIDTHS, group_col="event_type"
    )


# ---------------------------------------------------------------------------
# Product-quantization ADC top-k (FAISS PQ family tail after ivf /
# int8 / ivf+int8): m=8 subspaces x ncent=16 centroids over the
# 64-dim embeddings; codebook = Lehmer-hash-seeded sample; every
# distance/dot is bounded-integer arithmetic, so the WHOLE path —
# codebook, code assignment, LUT, ADC sums, ranks — value-hashes
# exactly against the SQL mirror below.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_D, _PQ_NC, _PQ_K = 8, 8, 16, 3
_PQ_QMAX = 127


def _pq_sql() -> str:
    from pdal_spark import sqlgen as G

    sl = f"[c.sub*{_PQ_D}+1 : c.sub*{_PQ_D}+{_PQ_D}]"
    ldot = "cast(list_dot_product({a}, {b}) as bigint)"
    d2 = (
        ldot.format(a=f"z.qv{sl}", b=f"z.qv{sl}")
        + " - 2 * " + ldot.format(a=f"z.qv{sl}", b="c.cv")
        + " + " + ldot.format(a="c.cv", b="c.cv")
    )
    return f"""
    WITH qz AS MATERIALIZED (
      SELECT vec_id,
             list_transform(
               v, x -> cast(round(x * {_PQ_QMAX} / mm) as bigint)
             ) AS qv
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS mm
            FROM (SELECT vec_id, cast(embedding as double[]) AS v
                  FROM embeddings) r) s
    ),
    cb AS MATERIALIZED (
      SELECT s.sub, src.cid,
             src.qv[s.sub*{_PQ_D}+1 : s.sub*{_PQ_D}+{_PQ_D}] AS cv
      FROM (SELECT vec_id AS cid, qv FROM qz
            ORDER BY {G.lehmer2_wide('vec_id')}, vec_id
            LIMIT {_PQ_NC}) src,
           (SELECT unnest(range({_PQ_M})) AS sub) s
    ),
    enc AS MATERIALIZED (
      SELECT nb_id, sub, code FROM (
        SELECT z.vec_id AS nb_id, c.sub, c.cid AS code,
               row_number() OVER (
                 PARTITION BY z.vec_id, c.sub
                 ORDER BY {d2} ASC, c.cid ASC
               ) AS rn
        FROM qz z, cb c
      ) x WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
             {ldot.format(a=f"q.qv{sl}", b="c.cv")} AS dot
      FROM (SELECT * FROM qz WHERE vec_id < 20) q, cb c
    ),
    sc AS (
      SELECT l.query_id, e.nb_id,
             cast(sum(l.dot) as bigint) AS adc_score
      FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
      WHERE l.query_id <> e.nb_id
      GROUP BY 1, 2
    )
    SELECT query_id, nb_id, adc_score, sim_rank FROM (
      SELECT query_id, nb_id, adc_score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY adc_score DESC, nb_id ASC
             ) AS sim_rank
      FROM sc
    ) t WHERE sim_rank <= {_PQ_K}
    """


@gate("pq_topk", _pq_sql())
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.pq_topk(
        emb.where(F.col("vec_id") < 20), emb,
        k=_PQ_K, m=_PQ_M, ncent=_PQ_NC,
    )


# ---------------------------------------------------------------------------
# IVF-PQ: probe-restricted ADC (FAISS IndexIVFPQ, by_residual=false).
# The oracle composes the ivf_trained probe CTEs (float cosine —
# IEEE-exact sequential folds on both engines, like the ivf gates)
# with the pq ADC CTEs (bounded-integer LUT sums).
# ---------------------------------------------------------------------------

_IPQ_NL, _IPQ_NP, _IPQ_K = 8, 2, 3


def _ivf_pq_sql() -> str:
    from pdal_spark import sqlgen as G
    from pdal_spark.gates.gate_ext7 import _cos_sql

    sl = f"[c.sub*{_PQ_D}+1 : c.sub*{_PQ_D}+{_PQ_D}]"
    ldot = "cast(list_dot_product({a}, {b}) as bigint)"
    d2 = (
        ldot.format(a=f"z.qv{sl}", b=f"z.qv{sl}")
        + " - 2 * " + ldot.format(a=f"z.qv{sl}", b="c.cv")
        + " + " + ldot.format(a="c.cv", b="c.cv")
    )
    return f"""
    WITH corp AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS fv
      FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS ccid, fv AS ccv FROM corp
      ORDER BY {G.lehmer2_wide('vec_id')}, vec_id LIMIT {_IPQ_NL}
    ),
    inv AS MATERIALIZED (
      SELECT nb_id, cell FROM (
        SELECT c.vec_id AS nb_id, kk.ccid AS cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {_cos_sql('c.fv', 'kk.ccv')} DESC,
                          kk.ccid ASC
               ) AS rn
        FROM corp c, cents kk
      ) x WHERE rn = 1
    ),
    probes AS MATERIALIZED (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, kk.ccid AS cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.fv', 'kk.ccv')} DESC,
                          kk.ccid ASC
               ) AS rn
        FROM (SELECT * FROM corp WHERE vec_id < 20) q, cents kk
      ) x WHERE rn <= {_IPQ_NP}
    ),
    qz AS MATERIALIZED (
      SELECT vec_id,
             list_transform(
               fv, x -> cast(round(x * {_PQ_QMAX} / mm) as bigint)
             ) AS qv
      FROM (SELECT vec_id, fv,
                   list_max(list_transform(fv, x -> abs(x))) AS mm
            FROM corp) s
    ),
    cb AS MATERIALIZED (
      SELECT s.sub, src.cid,
             src.qv[s.sub*{_PQ_D}+1 : s.sub*{_PQ_D}+{_PQ_D}] AS cv
      FROM (SELECT vec_id AS cid, qv FROM qz
            ORDER BY {G.lehmer2_wide('vec_id')}, vec_id
            LIMIT {_PQ_NC}) src,
           (SELECT unnest(range({_PQ_M})) AS sub) s
    ),
    enc AS MATERIALIZED (
      SELECT nb_id, sub, code FROM (
        SELECT z.vec_id AS nb_id, c.sub, c.cid AS code,
               row_number() OVER (
                 PARTITION BY z.vec_id, c.sub
                 ORDER BY {d2} ASC, c.cid ASC
               ) AS rn
        FROM qz z, cb c
      ) x WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
             {ldot.format(a=f"q.qv{sl}", b="c.cv")} AS dot
      FROM (SELECT * FROM qz WHERE vec_id < 20) q, cb c
    ),
    sc AS (
      SELECT l.query_id, e.nb_id,
             cast(sum(l.dot) as bigint) AS adc_score
      FROM probes p
      JOIN inv i ON i.cell = p.cell
      JOIN enc e ON e.nb_id = i.nb_id
      JOIN lut l ON l.query_id = p.query_id
               AND l.sub = e.sub AND l.code = e.code
      WHERE l.query_id <> e.nb_id
      GROUP BY 1, 2
    )
    SELECT query_id, nb_id, adc_score, sim_rank FROM (
      SELECT query_id, nb_id, adc_score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY adc_score DESC, nb_id ASC
             ) AS sim_rank
      FROM sc
    ) t WHERE sim_rank <= {_IPQ_K}
    """


@gate("ivf_pq_topk", _ivf_pq_sql())
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.ivf_pq_topk(
        emb.where(F.col("vec_id") < 20), emb,
        k=_IPQ_K, nlist=_IPQ_NL, nprobe=_IPQ_NP,
        m=_PQ_M, ncent=_PQ_NC,
    )


# ---------------------------------------------------------------------------
# anchor_stats — per-target-domain anchor-text profiles from the
# same synthetic WARC-ish HTML the extract_links gate uses (varied
# anchor texts so top-anchor selection is non-trivial).
# ---------------------------------------------------------------------------

_ANCHOR_HTML_SQL = """
('<p><a href="https://site' || cast(event_id % 13 as varchar)
 || '.example.com/p/' || cast(event_id as varchar)
 || '">read ' || cast(event_id % 3 as varchar)
 || '</a> <a href="/rel/' || cast(event_id % 5 as varchar)
 || '">rel</a> <A href="https://Hub' || cast(event_id % 3 as varchar)
 || '.example.org/">hub ' || cast(event_id % 2 as varchar)
 || '</A></p>')
"""


@gate(
    "anchor_stats",
    f"""
    WITH pages AS (
      SELECT event_id AS doc_id, {_ANCHOR_HTML_SQL} AS html
      FROM events
    ),
    snips AS (
      SELECT doc_id,
             unnest(regexp_extract_all(
               html, '(<[aA][^>]*href="[^"]*"[^>]*>[^<]*<)', 1
             )) AS s
      FROM pages
    ),
    pairs AS (
      SELECT doc_id,
             lower(regexp_extract(
               regexp_extract(s, 'href="([^"]*)"', 1),
               '^https?://([^/]+)', 1)) AS link_domain,
             regexp_extract(s, '>([^<]*)<', 1) AS anchor
      FROM snips
      WHERE regexp_extract(
              regexp_extract(s, 'href="([^"]*)"', 1),
              '^https?://([^/]+)', 1) <> ''
    ),
    per_dom AS (
      SELECT link_domain, count(*) AS n_links,
             count(DISTINCT doc_id) AS n_docs
      FROM pairs GROUP BY 1
    ),
    top AS (
      SELECT link_domain, anchor AS top_anchor, n AS top_anchor_n
      FROM (
        SELECT link_domain, anchor, count(*) AS n,
               row_number() OVER (
                 PARTITION BY link_domain
                 ORDER BY count(*) DESC, anchor ASC
               ) AS r
        FROM pairs GROUP BY link_domain, anchor
      ) t WHERE r = 1
    )
    SELECT d.link_domain, d.n_links, d.n_docs,
           t.top_anchor, t.top_anchor_n
    FROM per_dom d JOIN top t USING (link_domain)
    """,
)
def q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import textops as ops_text

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    html = F.concat(
        F.lit('<p><a href="https://site'), (eid % 13).cast("string"),
        F.lit(".example.com/p/"), eid.cast("string"),
        F.lit('">read '), (eid % 3).cast("string"),
        F.lit('</a> <a href="/rel/'), (eid % 5).cast("string"),
        F.lit('">rel</a> <A href="https://Hub'),
        (eid % 3).cast("string"),
        F.lit('.example.org/">hub '), (eid % 2).cast("string"),
        F.lit("</A></p>"),
    )
    pages = ev.select(
        eid.alias("doc_id"),
        F.encode(html, "utf-8").alias("html"),
    )
    return ops_text.anchor_stats(pages)


# ---------------------------------------------------------------------------
# url_rules_filter — robots-style longest-prefix allow/deny over the
# synthetic site URLs (rules chosen so specific allows override
# broad denies, the tie/default paths all fire).
# ---------------------------------------------------------------------------

_URL_SQL = (
    "'https://site-' || cast(event_id % 20 as varchar)"
    " || '.example.com/p/' || cast(event_id as varchar)"
)

_RULES = [
    ("https://site-3", False),
    ("https://site-3.example.com/p/1", True),
    ("https://site-1", False),
    ("https://site-13", True),
]

_RULES_SQL = " UNION ALL ".join(
    f"SELECT '{p}' AS prefix, {str(a).lower()} AS allow"
    for p, a in _RULES
)


@gate(
    "url_rules",
    f"""
    WITH pages AS (
      SELECT event_id AS doc_id, {_URL_SQL} AS url FROM events
    ),
    rules AS ({_RULES_SQL}),
    m AS (
      SELECT p.doc_id, p.url, r.prefix, r.allow,
             row_number() OVER (
               PARTITION BY p.doc_id
               ORDER BY (r.prefix IS NULL) ASC,
                        length(r.prefix) DESC, r.allow DESC
             ) AS rn
      FROM pages p
      LEFT JOIN rules r ON starts_with(p.url, r.prefix)
    )
    SELECT doc_id, url,
           coalesce(allow, true) AS allowed,
           prefix AS rule_prefix
    FROM m WHERE rn = 1
    """,
)
def q_url_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import textops as ops_text

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    pages = ev.select(
        eid.alias("doc_id"),
        F.concat(
            F.lit("https://site-"), (eid % 20).cast("string"),
            F.lit(".example.com/p/"), eid.cast("string"),
        ).alias("url"),
    )
    rules = spark.createDataFrame(_RULES, "prefix string, allow boolean")
    return ops_text.url_rules_filter(pages, rules).select(
        "doc_id", "url", "allowed", "rule_prefix"
    )


# ---------------------------------------------------------------------------
# shard_assign — consistent-hash ring assignment. The oracle builds
# the SAME ring from the shared mix_hash formula (range CTE) and
# picks min(pos >= h) with the wrap fallback.
# ---------------------------------------------------------------------------

_SH_N, _SH_V = 8, 8


def _shard_sql() -> str:
    from pdal_spark import sqlgen as G

    ring_pos = G.mix_hash(
        f"((i // {_SH_V}) * 100003 + (i % {_SH_V}) * 1009)"
    )
    doc_h = G.mix_hash("(event_id * 2 + 1)")
    return f"""
    WITH ring AS MATERIALIZED (
      SELECT cast(i // {_SH_V} as int) AS shard, {ring_pos} AS pos
      FROM (SELECT unnest(range({_SH_N * _SH_V})) AS i)
    ),
    docs AS MATERIALIZED (
      SELECT event_id AS doc_id, {doc_h} AS h FROM events
    ),
    cand AS (
      SELECT doc_id, shard FROM (
        SELECT d.doc_id, r.shard,
               row_number() OVER (
                 PARTITION BY d.doc_id ORDER BY r.pos, r.shard
               ) AS rn
        FROM docs d JOIN ring r ON r.pos >= d.h
      ) x WHERE rn = 1
    ),
    wrap AS (
      SELECT shard FROM ring ORDER BY pos, shard LIMIT 1
    )
    SELECT d.doc_id,
           cast(coalesce(c.shard, (SELECT shard FROM wrap)) as int)
             AS shard
    FROM docs d LEFT JOIN cand c USING (doc_id)
    """


@gate("shard_assign", _shard_sql())
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import textops as ops_text

    ev = _t(spark, sf_dir, "events")
    docs = ev.select(F.col("event_id").alias("doc_id"))
    return ops_text.shard_assign(docs, _SH_N, vnodes=_SH_V).select(
        "doc_id", "shard"
    )
