"""Gate registry extension 10 — the batch-2 tail: exact
set-similarity join (AllPairs/PPJoin prefix filtering, the
deterministic complement of MinHash LSH), HDR-histogram quantiles,
per-group HyperLogLog, bigram stupid-backoff LM, sparse tf-idf
top-k, HTML link extraction, sliding windows, char entropy,
histogram percent_rank, Poisson bootstrap, heavy-key skew report,
exact ntile binning, grouped OLS, event transitions, funnel, cohort
retention, gap sessionization, and keep-latest-per-URL recrawl
dedup. All integer / IEEE-exact, full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _shingle_sql, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import textops as ops_text

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# AllPairs exact Jaccard self-join (threshold 1/2 over 3-gram
# shingles). The oracle is the BRUTE-FORCE all-pairs join — value-
# hash equality proves the prefix filter loses no qualifying pair.
# ---------------------------------------------------------------------------

_AP_NUM, _AP_DEN = 1, 2


def _allpairs_sql() -> str:
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    pairs AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_inter
      FROM sh sa JOIN sh sb
        ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, n_inter,
           cast(n_inter as double)
             / cast(za.sz + zb.sz - n_inter as double) AS jaccard
    FROM pairs
    JOIN sz za ON za.doc_id = a
    JOIN sz zb ON zb.doc_id = b
    WHERE {_AP_DEN} * n_inter >= {_AP_NUM} * (za.sz + zb.sz - n_inter)
    """


@gate("allpairs_jaccard", _allpairs_sql())
def q_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.allpairs_jaccard_pairs(
        docs, _AP_NUM, _AP_DEN, vocab_df=v
    )


# ---------------------------------------------------------------------------
# HDR-histogram quantiles over orders.o_totalprice (integer floor).
# ---------------------------------------------------------------------------

_HDR_QS = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100))
_HDR_S = ops_sketch.HDR_SUB_BITS


def _hdr_sql() -> str:
    b = ops_sketch.hdr_bucket_sql("v", _HDR_S, DK)
    lb = ops_sketch.hdr_lb_sql("v", _HDR_S, DK)
    qvals = ", ".join(f"({a}, {b_})" for a, b_ in _HDR_QS)
    return f"""
    WITH vals AS (
      SELECT cast(floor(o_totalprice) as bigint) AS v FROM orders
      WHERE cast(floor(o_totalprice) as bigint) >= 1
    ),
    hist AS (
      SELECT {b} AS bucket, max({lb}) AS lb, count(*) AS cnt
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT bucket, lb,
             sum(cnt) OVER (ORDER BY bucket) AS cum,
             sum(cnt) OVER () AS total
      FROM hist
    ),
    q(q_num, q_den) AS (VALUES {qvals})
    SELECT q_num, q_den, min(lb) AS est
    FROM cum, q
    WHERE cum >= ((q_num * total + q_den - 1) // q_den)
    GROUP BY 1, 2
    """


@gate("hdr_quantile", _hdr_sql())
def q_hdr_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = _t(spark, sf_dir, "orders").select(
        F.expr("cast(floor(o_totalprice) as bigint)").alias("v")
    )
    return ops_sketch.hdr_quantile(orders, "v", list(_HDR_QS))


# ---------------------------------------------------------------------------
# Per-group HLL distinct users per event_type.
# ---------------------------------------------------------------------------


def _hll_grouped_sql() -> str:
    m, k = ops_sketch.HLL_M, ops_sketch._RHO_K
    h = G.mix_hash("user_id")
    sfx = f"(h // {m})"
    return f"""
    WITH hsh AS (SELECT event_type, {h} AS h FROM events),
    regs AS (
      SELECT event_type, (h % {m}) AS bkt,
             max({ops_sketch.hll_rho_sql(sfx)}) AS rho
      FROM hsh GROUP BY 1, 2
    ),
    fold AS (
      SELECT event_type, count(*) AS n_used,
             sum((CAST(1 AS BIGINT) << ({k} - rho))) AS used_q
      FROM regs GROUP BY 1
    )
    SELECT event_type, n_used, sum_q,
           {ops_sketch.hll_est_sql()} AS hll_est
    FROM (SELECT event_type, n_used,
                 used_q + CAST({m} - n_used AS BIGINT)
                          * (CAST(1 AS BIGINT) << {k}) AS sum_q
          FROM fold) f
    """


@gate("hll_grouped", _hll_grouped_sql())
def q_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_sketch.hll_by_group(ev, "user_id", "event_type")


# ---------------------------------------------------------------------------
# Bigram LM with stupid backoff: train on even doc_ids, score odd —
# the held-out split makes the backoff branch actually fire.
# ---------------------------------------------------------------------------

_BO = 0.4
_LM_Q = ops_text.LM_Q


def _bigram_sql() -> str:
    from pdal_spark.gate import _TOKS

    q = G.fnum(float(_LM_Q))
    return f"""
    WITH tr AS MATERIALIZED (
      SELECT t.doc_id, t.pos, t.word FROM {_TOKS} t
      WHERE t.doc_id % 2 = 0
    ),
    sc AS MATERIALIZED (
      SELECT t.doc_id, t.pos, t.word FROM {_TOKS} t
      WHERE t.doc_id % 2 = 1
    ),
    c1 AS (SELECT word, count(*) AS c1 FROM tr GROUP BY 1),
    tot AS (SELECT count(*) AS n_total,
                   count(DISTINCT word) AS n_vocab FROM tr),
    trbg AS (
      SELECT w1, w2, count(*) AS c2 FROM (
        SELECT word AS w1,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tr) b WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    scbg AS (
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, word AS w1,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM sc) b WHERE w2 IS NOT NULL
    ),
    terms AS (
      SELECT b.doc_id,
        CASE WHEN p.c2 IS NOT NULL THEN
          cast(floor(ln(cast(p.c2 as double) / cast(ca.c1 as double))
               * {q} + {G.fnum(0.5)}) as bigint)
        ELSE
          cast(floor(ln({G.fnum(_BO)}
               * cast(coalesce(cb.c1, 0) + 1 as double)
               / cast(n_total + n_vocab as double))
               * {q} + {G.fnum(0.5)}) as bigint)
        END AS term_q
      FROM scbg b
      LEFT JOIN trbg p ON p.w1 = b.w1 AND p.w2 = b.w2
      LEFT JOIN c1 ca ON ca.word = b.w1
      LEFT JOIN c1 cb ON cb.word = b.w2
      CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_bigrams, sum(term_q) AS lm2_q,
           round((cast(sum(term_q) as double) / {q}) / count(*), 6)
             AS lm2_mean
    FROM terms GROUP BY doc_id
    """


@gate("bigram_backoff", _bigram_sql())
def q_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    train = docs.where("doc_id % 2 = 0")
    score = docs.where("doc_id % 2 = 1")
    return ops_text.bigram_logprob(score, train_df=train, backoff=_BO)


# ---------------------------------------------------------------------------
# Sparse tf-idf cosine top-k (inverted-index lexical retrieval).
# ---------------------------------------------------------------------------

_TFIDF_K = 5


def _tfidf_sql() -> str:
    from pdal_spark.gate import _TOKS

    q = G.fnum(float(1 << 20))
    return f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, word, count(*) AS tf FROM {_TOKS} tt GROUP BY 1, 2
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t),
    idf AS (
      SELECT word,
             cast(floor(ln(cast(n_docs as double) / cast(count(*) as double))
                  * {q} + {G.fnum(0.5)}) as bigint) AS idf_q
      FROM t CROSS JOIN n GROUP BY word, n_docs
    ),
    w AS MATERIALIZED (
      SELECT t.doc_id, t.word, t.tf * idf_q AS wt
      FROM t JOIN idf USING (word) WHERE t.tf * idf_q <> 0
    ),
    nrm AS (SELECT doc_id, sum(wt * wt) AS n2 FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS query_id, b.doc_id AS nb_id,
             sum(a.wt * b.wt) AS dot
      FROM w a JOIN w b ON a.word = b.word AND b.doc_id <> a.doc_id
      WHERE a.doc_id % 10 = 0
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT query_id, nb_id,
             cast(dot as double)
               / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))
               AS cosine
      FROM dots
      JOIN nrm na ON na.doc_id = query_id
      JOIN nrm nb ON nb.doc_id = nb_id
    )
    SELECT query_id, nb_id, cosine, sim_rank FROM (
      SELECT query_id, nb_id, cosine,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, nb_id
             ) AS sim_rank
      FROM cos
    ) r WHERE sim_rank <= {_TFIDF_K}
    """


@gate("tfidf_topk", _tfidf_sql())
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    docs = _t(spark, sf_dir, "documents")
    return ops_sim.tfidf_topk(
        docs, docs.where("doc_id % 10 = 0"), k=_TFIDF_K
    )


# ---------------------------------------------------------------------------
# HTML -> link extraction (the edge feed for domain_authority's link
# graph). Gate plants deterministic anchors from event ids.
# ---------------------------------------------------------------------------

_LINK_HTML_SQL = (
    "'<p><a href=\"https://site' || cast(event_id % 13 as varchar)"
    " || '.example.com/p/' || cast(event_id as varchar)"
    " || '\">a</a> <a href=\"/rel/' || cast(event_id % 5 as varchar)"
    " || '\">b</a> <A href=\"https://Hub' || cast(event_id % 3 as varchar)"
    " || '.example.org/\">c</A></p>'"
)


def _links_sql() -> str:
    return f"""
    WITH pages AS (
      SELECT event_id AS doc_id, {_LINK_HTML_SQL} AS html FROM events
    ),
    ex AS (
      SELECT doc_id,
             unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
      FROM pages
    )
    SELECT doc_id, href,
           CASE WHEN regexp_extract(href, '^https?://([^/]+)', 1) <> ''
                THEN lower(regexp_extract(href, '^https?://([^/]+)', 1))
           END AS link_domain
    FROM ex
    """


@gate("extract_links", _links_sql())
def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    html = F.concat(
        F.lit('<p><a href="https://site'), (eid % 13).cast("string"),
        F.lit(".example.com/p/"), eid.cast("string"),
        F.lit('">a</a> <a href="/rel/'), (eid % 5).cast("string"),
        F.lit('">b</a> <A href="https://Hub'), (eid % 3).cast("string"),
        F.lit('.example.org/">c</A></p>'),
    )
    pages = ev.select(
        eid.alias("doc_id"),
        F.encode(html, "utf-8").alias("html"),  # binary path
    )
    return ops_text.extract_links(pages)


# ---------------------------------------------------------------------------
# Batch sliding-window counts, char entropy, histogram percent_rank.
# ---------------------------------------------------------------------------

_SW_SIZE, _SW_STEP = 900, 300


@gate(
    "sliding_windows",
    f"""
    SELECT ((cast(floor(epoch(ts)) as bigint) // {_SW_STEP}) - j)
             * {_SW_STEP} AS window_start_s,
           event_type, count(*) AS n
    FROM events, unnest(range({_SW_SIZE // _SW_STEP})) AS t(j)
    GROUP BY 1, 2
    """,
)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import temporal as ops_temporal

    ev = _t(spark, sf_dir, "events")
    return ops_temporal.sliding_window_counts(ev, _SW_SIZE, _SW_STEP)


def _entropy_sql() -> str:
    q = G.fnum(float(ops_text.LM_Q))
    return f"""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents
    ),
    per AS (
      SELECT doc_id, c, count(*) AS cnt FROM ch
      WHERE c <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(cnt) AS n_chars_e FROM per GROUP BY 1)
    SELECT p.doc_id, t.n_chars_e,
           sum(cast(floor(
             (cast(cnt as double) / cast(n_chars_e as double))
             * ln(cast(n_chars_e as double) / cast(cnt as double))
             * {q} + {G.fnum(0.5)}) as bigint)) AS ent_q,
           round(cast(sum(cast(floor(
             (cast(cnt as double) / cast(n_chars_e as double))
             * ln(cast(n_chars_e as double) / cast(cnt as double))
             * {q} + {G.fnum(0.5)}) as bigint)) as double) / {q}, 6)
             AS entropy
    FROM per p JOIN tot t ON t.doc_id = p.doc_id
    GROUP BY 1, 2
    """


@gate("char_entropy", _entropy_sql())
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.char_entropy(_t(spark, sf_dir, "documents"))


@gate(
    "score_pct",
    """
    SELECT doc_id, n_chars,
           percent_rank() OVER (ORDER BY n_chars) AS pct_rank
    FROM documents
    """,
)
def q_score_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import stats as ops_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return ops_stats.score_percentile(docs, "n_chars").select(
        "doc_id", "n_chars", "pct_rank"
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap replicas + heavy-key skew report.
# ---------------------------------------------------------------------------

_BOOT_B = 16


def _bootstrap_sql() -> str:
    from pdal_spark.operators.stats import _poisson1_thresholds

    thr = _poisson1_thresholds()
    parts = []
    for b in range(_BOOT_B):
        h = G.mix_hash(f"(l_orderkey * 10 + l_linenumber) * {_BOOT_B} + {b}")
        w = " + ".join(
            f"(CASE WHEN ({h}) >= {t} THEN 1 ELSE 0 END)" for t in thr
        )
        parts.append(
            f"SELECT {b} AS replica, sum({w}) AS sum_w,"
            f" sum(({w}) * cast(l_quantity as bigint)) AS sum_wx"
            " FROM lineitem"
        )
    union = " UNION ALL ".join(parts)
    return f"""
    SELECT replica, sum_w, sum_wx,
           cast(sum_wx as double) / cast(sum_w as double) AS mean_b
    FROM ({union}) u
    """


@gate("bootstrap_mean", _bootstrap_sql())
def q_bootstrap_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdal_spark.operators import stats as ops_stats

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("l_orderkey * 10 + l_linenumber").alias("rid"),
        F.col("l_quantity"),
    )
    return ops_stats.bootstrap_replicas(
        li, "l_quantity", "rid", n_replicas=_BOOT_B
    )


@gate(
    "skew_report",
    """
    SELECT l_suppkey, cnt, n_rows, n_keys,
           round(cast(cnt as double) / cast(n_rows as double), 6) AS share,
           cast((cnt * n_keys + n_rows - 1) // n_rows as bigint)
             AS suggested_salt
    FROM (
      SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
    ) c
    CROSS JOIN (
      SELECT count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_keys
      FROM lineitem
    ) t
    ORDER BY cnt DESC, l_suppkey ASC
    LIMIT 10
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import stats as ops_stats

    li = _t(spark, sf_dir, "lineitem")
    return ops_stats.skew_report(li, "l_suppkey", top_k=10)


# ---------------------------------------------------------------------------
# Equi-depth binning (exact ntile), grouped OLS, event transitions.
# ---------------------------------------------------------------------------

_EDB_N = 8


@gate(
    "equi_depth_bins",
    f"""
    SELECT doc_id, n_chars,
           ntile({_EDB_N}) OVER (ORDER BY n_chars, doc_id) AS bin
    FROM documents
    """,
)
def q_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import stats as ops_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return ops_stats.equi_depth_bins(
        docs, "n_chars", _EDB_N, "doc_id"
    ).select("doc_id", "n_chars", "bin")


@gate(
    "grouped_ols",
    """
    SELECT event_type, n,
           CASE WHEN (n * sxx - sx * sx) <> 0 THEN
             cast(n * sxy - sx * sy as double)
               / cast(n * sxx - sx * sx as double) END AS slope,
           (cast(sy as double)
            - (cast(n * sxy - sx * sy as double)
               / cast(n * sxx - sx * sx as double))
              * cast(sx as double)) / cast(n as double) AS intercept
    FROM (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM (
        SELECT event_type,
               cast(event_id % 1000 as bigint) AS x,
               cast(floor(value) as bigint) AS y
        FROM events
      ) e GROUP BY 1
    ) m
    """,
)
def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdal_spark.operators import stats as ops_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(event_id % 1000 as bigint)").alias("x"),
        F.expr("cast(floor(value) as bigint)").alias("y"),
    )
    return ops_stats.grouped_ols(ev, "x", "y", "event_type")


@gate(
    "event_transitions",
    """
    WITH pairs AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_state
      FROM events
    ),
    cnt AS (
      SELECT from_state, to_state, count(*) AS n FROM pairs
      WHERE to_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT c.from_state, c.to_state, c.n,
           cast(c.n as double) / cast(t.nf as double) AS p
    FROM cnt c
    JOIN (SELECT from_state, sum(n) AS nf FROM cnt GROUP BY 1) t
      ON t.from_state = c.from_state
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import temporal as ops_temporal

    return ops_temporal.event_transitions(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Funnel analysis (view -> click -> purchase) + cohort retention.
# ---------------------------------------------------------------------------

_FUNNEL = ["view", "click", "purchase"]
_COHORT_B = 86400 * 7


def _funnel_sql() -> str:
    ctes, prev = [], None
    for i, step in enumerate(_FUNNEL):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id AS k, min(ts) AS t_{i}"
                f" FROM events WHERE event_type = '{step}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id AS k, min(e.ts) AS t_{i}"
                f" FROM events e JOIN s{i - 1} p ON p.k = e.user_id"
                f" WHERE e.event_type = '{step}' AND e.ts > p.t_{i - 1}"
                " GROUP BY 1)"
            )
        prev = i
    joins = " ".join(
        f"LEFT JOIN s{i} USING (k)" for i in range(1, len(_FUNNEL))
    )
    depth = " + ".join(
        f"(CASE WHEN t_{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(_FUNNEL))
    )
    tcols = ", ".join(f"t_{i}" for i in range(len(_FUNNEL)))
    return f"""
    WITH {", ".join(ctes)}
    SELECT k AS user_id, {tcols}, cast({depth} as int) AS depth
    FROM s0 {joins}
    """


@gate("funnel", _funnel_sql())
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdal_spark.operators import temporal as ops_temporal

    out = ops_temporal.funnel(_t(spark, sf_dir, "events"), _FUNNEL)
    return out.withColumn("depth", F.col("depth").cast("int"))


@gate(
    "cohort_retention",
    f"""
    WITH ev AS (
      SELECT user_id AS k,
             (cast(floor(epoch(ts)) as bigint) // {_COHORT_B}) AS b
      FROM events
    ),
    first AS (SELECT k, min(b) AS cohort_b FROM ev GROUP BY 1),
    act AS (SELECT DISTINCT k, b FROM ev)
    SELECT f.cohort_b, a.b - f.cohort_b AS age, count(*) AS n_act
    FROM act a JOIN first f ON f.k = a.k
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import temporal as ops_temporal

    return ops_temporal.cohort_retention(
        _t(spark, sf_dir, "events"), bucket_s=_COHORT_B
    )


# ---------------------------------------------------------------------------
# Batch gap-based sessionization + per-session rollup.
# ---------------------------------------------------------------------------

_SESS_GAP = 1800


@gate(
    "session_stats",
    f"""
    WITH o AS (
      SELECT user_id, event_id,
             cast(floor(epoch(ts)) as bigint) AS es,
             cast(floor(epoch(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ))) as bigint) AS prev_es
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, es,
             CASE WHEN prev_es IS NULL OR es - prev_es > {_SESS_GAP}
                  THEN 1 ELSE 0 END AS st
      FROM o
    ),
    sess AS (
      SELECT user_id, es,
             sum(st) OVER (
               PARTITION BY user_id ORDER BY es, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_n
      FROM marked
    )
    SELECT user_id, session_n, count(*) AS n_events,
           max(es) - min(es) AS duration_s
    FROM sess GROUP BY 1, 2
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import temporal as ops_temporal

    return ops_temporal.session_stats(
        _t(spark, sf_dir, "events"), gap_s=_SESS_GAP
    )


# ---------------------------------------------------------------------------
# Keep-latest-capture-per-canonical-URL (recrawl dedup).
# ---------------------------------------------------------------------------

_LURL = (
    "'HTTPS://Site-' || cast(event_id % 40 as varchar)"
    " || '.Example.COM/p/' || cast(event_id % 300 as varchar)"
    " || CASE WHEN event_id % 2 = 0 THEN '/?utm=x' ELSE '/' END"
)
_LURL_CANON = (
    "regexp_replace(lower(regexp_extract(u2,"
    " '^([a-zA-Z0-9+.-]*://[^/]*)', 1))"
    " || regexp_replace(u2, '^[a-zA-Z0-9+.-]*://[^/]*', ''), '/$', '')"
)


@gate(
    "url_latest",
    f"""
    WITH pages AS (
      SELECT event_id AS doc_id, ts AS warc_ts, {_LURL} AS url
      FROM events
    ),
    canon AS (
      SELECT doc_id, warc_ts, url, {_LURL_CANON} AS canon_url
      FROM (SELECT *, regexp_replace(url, '[?#].*$', '') AS u2
            FROM pages) q
    )
    SELECT doc_id, warc_ts, url, canon_url FROM (
      SELECT *, row_number() OVER (
        PARTITION BY canon_url ORDER BY warc_ts DESC, doc_id DESC
      ) AS rk FROM canon
    ) r WHERE rk = 1
    """,
)
def q_url_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    url = F.concat(
        F.lit("HTTPS://Site-"), (eid % 40).cast("string"),
        F.lit(".Example.COM/p/"), (eid % 300).cast("string"),
        F.when(eid % 2 == 0, F.lit("/?utm=x")).otherwise(F.lit("/")),
    )
    pages = ev.select(
        eid.alias("doc_id"), F.col("ts").alias("warc_ts"),
        url.alias("url"),
    )
    return ops_text.latest_by_url(pages).select(
        "doc_id", "warc_ts", "url", "canon_url"
    )


# ---------------------------------------------------------------------------
# PMI collocations + reciprocal-rank-fusion hybrid retrieval.
# ---------------------------------------------------------------------------

_PMI_MIN, _PMI_K = 5, 40


def _collocations_sql() -> str:
    q = G.fnum(float(ops_text.LM_Q))
    return f"""
    WITH bg AS (
      SELECT w1, w2 FROM (
        SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
        FROM (SELECT string_split(text, ' ') AS ws FROM documents) d,
             unnest(range(len(ws) - 1)) AS t(i)
      ) p
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    uni AS (
      SELECT w, count(*) AS cu FROM (
        SELECT w1 AS w FROM bg UNION ALL SELECT w2 AS w FROM bg
      ) u GROUP BY 1
    ),
    tot AS (SELECT sum(c2) AS n_bg FROM c2)
    SELECT w1, w2, c2, pmi_q FROM (
      SELECT c2.w1, c2.w2, c2.c2,
             cast(floor(ln(cast(n_bg as double) * cast(c2.c2 as double)
                  / (cast(a.cu as double) * cast(b.cu as double)))
                  * {q} + {G.fnum(0.5)}) as bigint) AS pmi_q
      FROM c2
      JOIN uni a ON a.w = c2.w1
      JOIN uni b ON b.w = c2.w2
      CROSS JOIN tot
      WHERE c2.c2 >= {_PMI_MIN}
    ) s
    ORDER BY pmi_q DESC, w1 ASC, w2 ASC LIMIT {_PMI_K}
    """


@gate("collocations", _collocations_sql())
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_text.collocations(
        _t(spark, sf_dir, "documents"), min_count=_PMI_MIN,
        top_k=_PMI_K,
    )


_RRF_K = 5


def _rrf_sql() -> str:
    from pdal_spark.gate import _COS
    from pdal_spark.gates.gate_ext7 import _QCOS, _QZ

    dense = f"""
      SELECT query_id, nb_id, sim_rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
               row_number() OVER (
                 PARTITION BY q.vec_id ORDER BY {_COS} DESC,
                 c.vec_id ASC
               ) AS sim_rank
        FROM (SELECT vec_id, cast(embedding as double[]) AS qv
              FROM embeddings WHERE vec_id < 20) q,
             (SELECT vec_id, cast(embedding as double[]) AS cv
              FROM embeddings) c
        WHERE q.vec_id <> c.vec_id
      ) t WHERE sim_rank <= {_RRF_K}
    """
    quant = f"""
      SELECT query_id, nb_id, sim_rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
               row_number() OVER (
                 PARTITION BY q.vec_id ORDER BY {_QCOS} DESC,
                 c.vec_id ASC
               ) AS sim_rank
        FROM (SELECT * FROM {_QZ} z0 WHERE vec_id < 20) q,
             {_QZ} c
        WHERE q.vec_id <> c.vec_id
      ) t WHERE sim_rank <= {_RRF_K}
    """
    return f"""
    WITH u AS ({dense} UNION ALL {quant}),
    per AS (
      SELECT query_id, nb_id,
             sum(1.0e0 / (60 + sim_rank)) AS rrf
      FROM u GROUP BY 1, 2
    )
    SELECT query_id, nb_id, rrf, fused_rank FROM (
      SELECT query_id, nb_id, rrf,
             row_number() OVER (
               PARTITION BY query_id ORDER BY rrf DESC, nb_id ASC
             ) AS fused_rank
      FROM per
    ) r WHERE fused_rank <= {_RRF_K}
    """


@gate("rrf_hybrid", _rrf_sql())
def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    dense = ops_sim.cosine_topk(queries, emb, k=_RRF_K)
    quant = ops_sim.quantized_topk(queries, emb, k=_RRF_K, bits=8)
    return ops_sim.rrf_fuse([dense, quant], top_k=_RRF_K)


@gate(
    "grouped_corr",
    """
    SELECT event_type, n,
           CASE WHEN (n * sxx - sx * sx) > 0
                 AND (n * syy - sy * sy) > 0 THEN
             cast(n * sxy - sx * sy as double)
               / sqrt(cast(n * sxx - sx * sx as double)
                      * cast(n * syy - sy * sy as double)) END AS corr
    FROM (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM (
        SELECT event_type,
               cast(event_id % 1000 as bigint) AS x,
               cast(floor(value) as bigint) AS y
        FROM events
      ) e GROUP BY 1
    ) m
    """,
)
def q_grouped_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdal_spark.operators import stats as ops_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(event_id % 1000 as bigint)").alias("x"),
        F.expr("cast(floor(value) as bigint)").alias("y"),
    )
    return ops_stats.grouped_corr(ev, "x", "y", "event_type")
