"""Gate registry extension 5 — corpus-level training-data quality
ops (Gopher repetition rules, tf-idf keyword extraction, CCNet-style
frequent-shingle boilerplate detection). Imported from gate_ext4
(end of chain).

All four gates follow the repo's exactness discipline: integer
counting throughout, one final IEEE division per ratio column, so
value hashes match the DuckDB oracle with no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _TOKS, _shingle_sql, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text

# (word, df) corpus document-frequency — shared by two oracles
_DFREQ = f"""
  (SELECT word, count(*) AS df
   FROM (SELECT DISTINCT doc_id, word FROM {_TOKS} dw) u GROUP BY word)
"""


# Gopher repetition rules: duplicate-word fraction + fraction of word
# characters covered by the most frequent bigram (Rae et al. 2021,
# table A1; the reference's derived-dimension pattern over text)
@gate(
    "repetition_stats",
    f"""
    WITH toks AS (SELECT * FROM {_TOKS} t0),
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
    )
    SELECT pd.doc_id, n_tokens,
           cast(n_tokens - n_distinct as double)
             / cast(n_tokens as double) AS dup_word_frac,
           cast(coalesce(top_covered, 0) as double)
             / cast(word_chars as double) AS top_bigram_frac
    FROM pd LEFT JOIN top USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.repetition_stats(docs)


# tf-idf keyword extraction: top-3 terms per doc by
# (tf DESC, corpus df ASC, word ASC) — integer sort key, no float idf
@gate(
    "keyword_topk",
    f"""
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf FROM {_TOKS} t0 GROUP BY 1, 2
    )
    SELECT doc_id, rank, word, tf, df FROM (
      SELECT t.doc_id, t.word, t.tf, d.df,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.word ASC
             ) AS rank
      FROM tf t JOIN {_DFREQ} d USING (word)
    ) r WHERE rank <= 3
    """,
)
def q_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.keyword_topk(docs, k=3)


# unigram-LM surprisal proxy: mean corpus document-frequency of the
# doc's tokens (no log -> exact; low = rare-vocab/gibberish page)
@gate(
    "commonness_score",
    f"""
    SELECT doc_id, count(*) AS n_tokens,
           cast(sum(df) as double) / cast(count(*) as double) AS mean_df
    FROM {_TOKS} t JOIN {_DFREQ} d USING (word)
    GROUP BY doc_id
    """,
)
def q_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.commonness_score(docs)


# CCNet-style boilerplate detection: fraction of a doc's distinct
# 3-gram shingles occurring in > 2 documents
@gate(
    "frequent_shingles",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0
    ),
    sdf AS (SELECT shingle, count(*) AS sdf FROM sh GROUP BY 1)
    SELECT doc_id, count(*) AS n_shingles,
           cast(sum(CASE WHEN sdf > 2 THEN 1 ELSE 0 END) as double)
             / cast(count(*) as double) AS common_frac
    FROM sh JOIN sdf USING (shingle)
    GROUP BY doc_id
    """,
)
def q_frequent_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.frequent_shingle_fraction(
        docs, doc_threshold=2, vocab_df=v
    )


# ---------------------------------------------------------------------------
# filters.sample EXACT variant (SampleFilter.cpp serial view-order
# greedy): distributed dependency-depth fixpoint == serial scan,
# oracled by a DuckDB recursive CTE that IS the serial scan.
# ---------------------------------------------------------------------------
from pdal_spark import sqlgen as G  # noqa: E402
from pdal_spark.gate import _PTS, _points  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_POIS_R = 3.0
_POIS_N = 3000
_POIS_D2 = (
    "(q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat)"
    f" < {G.fnum(_POIS_R * _POIS_R)}"
)


@gate(
    "sample_poisson_exact",
    f"""
    WITH RECURSIVE o AS (
      SELECT event_id, lon, lat,
             row_number() OVER (ORDER BY event_id) AS rn
      FROM {_PTS} WHERE event_id < {_POIS_N}
    ),
    g AS (
      SELECT CAST(0 AS BIGINT) AS rn,
             CAST([] AS STRUCT(px DOUBLE, py DOUBLE)[]) AS kept,
             CAST([] AS BIGINT[]) AS kept_ids
      UNION ALL
      SELECT p.rn,
        CASE WHEN len(list_filter(g.kept, q -> {_POIS_D2})) = 0
          THEN list_append(g.kept, {{'px': p.lon, 'py': p.lat}})
          ELSE g.kept END,
        CASE WHEN len(list_filter(g.kept, q -> {_POIS_D2})) = 0
          THEN list_append(g.kept_ids, p.event_id)
          ELSE g.kept_ids END
      FROM g JOIN o p ON p.rn = g.rn + 1
    )
    SELECT unnest(kept_ids) AS event_id
    FROM g WHERE rn = (SELECT max(rn) FROM g)
    """,
)
def q_sample_poisson_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import sample_poisson_exact

    pts = _points(spark, sf_dir).where(F.col("event_id") < _POIS_N)
    out = sample_poisson_exact(
        pts, _POIS_R, x="lon", y="lat", id_col="event_id"
    )
    return out.select("event_id")


# ---------------------------------------------------------------------------
# filters.relaxationdartthrowing EXACT variant
# (RelaxationDartThrowing.cpp:62-160, shuffle=false): decaying-radius
# serial-greedy rounds with pinned keeps, truncated at count. The
# oracle is ONE recursive CTE cycling point-index 1..N per round and
# decaying the radius at each wrap (state carries the kept list).
# ---------------------------------------------------------------------------
_RDT_N = 400
_RDT_COUNT = 150
_RDT_R0 = 25.0
_RDT_DECAY = 0.5
_RDT_TERM = 3.0

_RDT_NRAD = (
    f"(CASE WHEN g.rn >= p.n THEN g.radius * {G.fnum(_RDT_DECAY)} "
    "ELSE g.radius END)"
)
_RDT_ADD = (
    "(NOT list_contains(g.kept_ids, p.event_id)) AND "
    "len(list_filter(g.kept, q -> "
    "(q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat) "
    f"< {_RDT_NRAD} * {_RDT_NRAD})) = 0"
)


@gate(
    "relaxation_dart_exact",
    f"""
    WITH RECURSIVE o AS MATERIALIZED (
      SELECT event_id, lon, lat,
             row_number() OVER (ORDER BY event_id) AS rn,
             count(*) OVER () AS n
      FROM {_PTS} WHERE event_id < {_RDT_N}
    ),
    g AS (
      SELECT CAST(0 AS BIGINT) AS step, CAST(0 AS BIGINT) AS rn,
             CAST({G.fnum(_RDT_R0)} AS DOUBLE) AS radius,
             CAST([] AS STRUCT(px DOUBLE, py DOUBLE)[]) AS kept,
             CAST([] AS BIGINT[]) AS kept_ids
      UNION ALL
      SELECT g.step + 1, p.rn, {_RDT_NRAD},
             CASE WHEN {_RDT_ADD}
               THEN list_append(g.kept, {{'px': p.lon, 'py': p.lat}})
               ELSE g.kept END,
             CASE WHEN {_RDT_ADD}
               THEN list_append(g.kept_ids, p.event_id)
               ELSE g.kept_ids END
      FROM g JOIN o p
        ON p.rn = CASE WHEN g.rn >= p.n THEN 1 ELSE g.rn + 1 END
      WHERE len(g.kept_ids) < {_RDT_COUNT}
        AND {_RDT_NRAD} * {_RDT_NRAD}
            >= {G.fnum(_RDT_TERM * _RDT_TERM)}
    )
    SELECT unnest(kept_ids) AS event_id, radius AS rdt_radius
    FROM g WHERE step = (SELECT max(step) FROM g)
    """,
)
def q_relaxation_dart_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import relaxation_dart_exact

    pts = _points(spark, sf_dir).where(F.col("event_id") < _RDT_N)
    out = relaxation_dart_exact(
        pts, _RDT_COUNT, _RDT_R0, _RDT_DECAY, _RDT_TERM,
        x="lon", y="lat", id_col="event_id",
    )
    return out.select("event_id", "rdt_radius")


# ---------------------------------------------------------------------------
# filters.icp EXACT variant (IterativeClosestPoint.cpp): fixed 3
# iterations, rotation as (cos,sin) = (A,B)/sqrt(A^2+B^2) — no trig,
# so transformed coordinates are bit-identical across engines. The
# oracle unrolls the three {1-NN -> decimal Kabsch stats -> apply}
# blocks as MATERIALIZED CTEs.
# ---------------------------------------------------------------------------
from pdal_spark.gate import _CPTS, _cust_points  # noqa: E402

_ICP_ITERS = 3
_ICP_SHIFT = 0.25  # power of two: the + / - shift is IEEE-exact


def _icp_iter_sql(i: int) -> str:
    # rank by sqrt(d2) (not raw d2): the kNN kernel orders by dist,
    # and sqrt can collapse 1-ulp-apart d2 values into a tie that the
    # fid tie-break then resolves — raw-d2 ranking picks a different
    # correspondent in exactly those cases (seen at sf0.001)
    d2 = "sqrt((c.mx-f.fx)*(c.mx-f.fx) + (c.my-f.fy)*(c.my-f.fy))"
    dec = "decimal(38,12)"
    # quantized integer-valued doubles (see operators.register
    # icp_exact: Spark and DuckDB round double->decimal differently
    # for fractional values; integers convert exactly in both)
    sc = "131072e0"  # 2^17
    sums = ", ".join(
        f"cast(sum(cast({e} as {dec})) as double) AS {a}"
        for e, a in [
            ("qmx", "smx"), ("qmy", "smy"), ("qfx", "sfx"),
            ("qfy", "sfy"),
            ("qmx*qfx", "sxx"), ("qmx*qfy", "sxy"),
            ("qmy*qfx", "syx"), ("qmy*qfy", "syy"),
        ]
    )
    return f"""
    nn{i} AS MATERIALIZED (
      SELECT mid, floor(mx * {sc} + 5e-1) AS qmx,
             floor(my * {sc} + 5e-1) AS qmy,
             floor(fx * {sc} + 5e-1) AS qfx,
             floor(fy * {sc} + 5e-1) AS qfy
      FROM (
        SELECT c.mid, c.mx, c.my, f.fx, f.fy,
               row_number() OVER (PARTITION BY c.mid
                 ORDER BY {d2} ASC, f.fid ASC) AS rk
        FROM cur{i} c CROSS JOIN fixedv f) z WHERE rk = 1
    ),
    ss{i} AS MATERIALIZED (
      SELECT count(*) AS n, {sums} FROM nn{i}
    ),
    tp{i} AS MATERIALIZED (
      SELECT ct, sn,
             mfx/{sc} - (ct*(mmx/{sc}) - sn*(mmy/{sc})) AS tx,
             mfy/{sc} - (sn*(mmx/{sc}) + ct*(mmy/{sc})) AS ty
      FROM (
        SELECT CASE WHEN norm = 0e0 THEN 1e0 ELSE a / norm END AS ct,
               CASE WHEN norm = 0e0 THEN 0e0 ELSE b / norm END AS sn,
               mmx, mmy, mfx, mfy
        FROM (
          SELECT mmx, mmy, mfx, mfy, a, b, sqrt(a*a + b*b) AS norm
          FROM (
            SELECT smx/n AS mmx, smy/n AS mmy,
                   sfx/n AS mfx, sfy/n AS mfy,
                   (sxx/n - (smx/n)*(sfx/n))
                     + (syy/n - (smy/n)*(sfy/n)) AS a,
                   (sxy/n - (smx/n)*(sfy/n))
                     - (syx/n - (smy/n)*(sfx/n)) AS b
            FROM ss{i}) q1) q2) q3
    ),
    cur{i + 1} AS MATERIALIZED (
      SELECT mid, mx*ct - my*sn + tx AS mx, mx*sn + my*ct + ty AS my
      FROM cur{i} CROSS JOIN tp{i}
    )"""


def _icp_exact_sql() -> str:
    s = G.fnum(_ICP_SHIFT)
    ctes = ",".join(_icp_iter_sql(i) for i in range(_ICP_ITERS))
    return f"""
    WITH fixedv AS MATERIALIZED (
      SELECT c_custkey AS fid, lon AS fx, lat AS fy FROM {_CPTS} c0
    ),
    cur0 AS MATERIALIZED (
      SELECT c_custkey AS mid, lon - {s} AS mx, lat + {s} AS my
      FROM {_CPTS} c1
    ),{ctes}
    SELECT mid AS c_custkey, mx AS lon, my AS lat
    FROM cur{_ICP_ITERS}
    """


@gate("icp_exact", _icp_exact_sql())
def q_icp_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.register import icp_exact

    cust = _cust_points(spark, sf_dir).select("c_custkey", "lat", "lon")
    moved = cust.select(
        "c_custkey",
        (F.col("lat") + F.lit(_ICP_SHIFT)).alias("lat"),
        (F.col("lon") - F.lit(_ICP_SHIFT)).alias("lon"),
    )
    return icp_exact(
        moved, cust, x="lon", y="lat", id_moving="c_custkey",
        id_fixed="c_custkey", cell=8.0, iters=_ICP_ITERS,
    ).select("c_custkey", "lon", "lat")


# ---------------------------------------------------------------------------
# filters.sparsesurface (SparseSurfaceFilter.cpp:74-119): ascending-Z
# serial scan == serial-greedy Poisson-disk ordered by (z, id);
# ground = kept, low noise = rejected. Same fixpoint kernel / same
# recursive-CTE oracle family as sample_poisson_exact.
# ---------------------------------------------------------------------------
_SS_N = 1500
_SS_R = 3.0
_SS_ZPTS = _PTS.replace(
    "SELECT event_id,", "SELECT event_id, value AS z,"
)


@gate(
    "sparse_surface",
    f"""
    WITH RECURSIVE o AS MATERIALIZED (
      SELECT event_id, lon, lat,
             row_number() OVER (ORDER BY z, event_id) AS rn
      FROM {_SS_ZPTS} WHERE event_id < {_SS_N}
    ),
    g AS (
      SELECT CAST(0 AS BIGINT) AS rn,
             CAST([] AS STRUCT(px DOUBLE, py DOUBLE)[]) AS kept,
             CAST([] AS BIGINT[]) AS kept_ids
      UNION ALL
      SELECT p.rn,
        CASE WHEN len(list_filter(g.kept, q ->
               (q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat)
               < {G.fnum(_SS_R * _SS_R)})) = 0
          THEN list_append(g.kept, {{'px': p.lon, 'py': p.lat}})
          ELSE g.kept END,
        CASE WHEN len(list_filter(g.kept, q ->
               (q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat)
               < {G.fnum(_SS_R * _SS_R)})) = 0
          THEN list_append(g.kept_ids, p.event_id)
          ELSE g.kept_ids END
      FROM g JOIN o p ON p.rn = g.rn + 1
    ),
    kept AS (
      SELECT unnest(kept_ids) AS event_id
      FROM g WHERE rn = (SELECT max(rn) FROM g)
    )
    SELECT o.event_id,
           CASE WHEN k.event_id IS NOT NULL THEN 2 ELSE 7 END
             AS classification
    FROM o LEFT JOIN kept k USING (event_id)
    """,
)
def q_sparse_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.ground import sparse_surface

    pts = _points(spark, sf_dir).where(F.col("event_id") < _SS_N)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("value").alias("z")
    )
    zpts = pts.join(ev, on="event_id")
    out = sparse_surface(
        zpts, _SS_R, x="lon", y="lat", z="z", id_col="event_id"
    )
    return out.select("event_id", "classification")


# ---------------------------------------------------------------------------
# filters.griddecimation (GridDecimationFilter.cpp:103-186): tag the
# max-Z point of each grid cell (first-in-order wins ties); the
# boundary adjustment of the cell division is mirrored op-for-op.
# ---------------------------------------------------------------------------
_GD_RES = 12.0


def _gd_cell(c: str, mn: str) -> str:
    r = G.fnum(_GD_RES)
    w0 = f"floor(({c} - {mn}) / {r})"
    w1 = f"(CASE WHEN {c} < {mn} + {w0} * {r} THEN {w0} - 1 ELSE {w0} END)"
    return (
        f"CAST(CASE WHEN {c} >= {mn} + ({w1} + 1) * {r} "
        f"THEN {w1} + 1 ELSE {w1} END AS BIGINT)"
    )


@gate(
    "grid_decimation",
    f"""
    WITH z AS (
      SELECT event_id, z, lat, lon
      FROM {_PTS.replace("SELECT event_id,",
                         "SELECT event_id, value AS z,")}
    ),
    b AS (SELECT min(lon) AS minx, min(lat) AS miny FROM z),
    cells AS (
      SELECT z.event_id, z.z,
             {_gd_cell('z.lon', 'b.minx')} AS gx,
             {_gd_cell('z.lat', 'b.miny')} AS gy
      FROM z CROSS JOIN b
    ),
    ranked AS (
      SELECT event_id, row_number() OVER (
               PARTITION BY gx, gy ORDER BY z DESC, event_id ASC
             ) AS gr
      FROM cells
    )
    SELECT event_id,
           CASE WHEN gr = 1 THEN 2 ELSE 1 END AS classification
    FROM ranked
    """,
)
def q_grid_decimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.voxel import grid_decimation

    pts = _points(spark, sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("value").alias("z")
    )
    zpts = pts.join(ev, on="event_id").withColumn(
        "classification", F.lit(1)
    )
    out = grid_decimation(
        zpts, _GD_RES, output_type="max", assign_col="classification",
        assign_value=2, x="lon", y="lat", z="z", order="event_id",
    )
    return out.select(
        "event_id", F.col("classification").cast("int").alias("classification")
    )


# ---------------------------------------------------------------------------
# kernels.chamfer / kernels.hausdorff (ChamferKernel.cpp,
# HausdorffKernel.cpp): symmetric cloud-to-cloud distance summary.
# Means round(9) on both sides (decimal casts of arbitrary sqrt
# distances differ in the last decimal digits across engines);
# hausdorff is an exact max, unrounded.
# ---------------------------------------------------------------------------
_SP5 = (
    f"(SELECT s_suppkey, {G.geo_lat('s_suppkey')} AS lat,"
    f" {G.geo_lon('s_suppkey')} AS lon FROM supplier)"
)
_CC_D = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)


def _cc_dir_sql(a_tbl: str, a_id: str, b_tbl: str, b_id: str) -> str:
    return f"""
      SELECT cast(sum(cast(dist as decimal(38,15))) as double)
               / count(*) AS mean_d,
             max(dist) AS max_d
      FROM (
        SELECT dist FROM (
          SELECT {_CC_D} AS dist,
                 row_number() OVER (PARTITION BY a.{a_id}
                   ORDER BY {_CC_D} ASC, b.{b_id} ASC) AS r
          FROM {a_tbl} a, {b_tbl} b
        ) q WHERE r = 1
      ) n
    """


@gate(
    "cloud_compare",
    f"""
    WITH ab AS ({_cc_dir_sql(_CPTS, 'c_custkey', _SP5, 's_suppkey')}),
    ba AS ({_cc_dir_sql(_SP5, 's_suppkey', _CPTS, 'c_custkey')})
    SELECT round((ab.mean_d + ba.mean_d) / 2e0, 9) AS chamfer,
           greatest(ab.max_d, ba.max_d) AS hausdorff,
           round(ab.mean_d, 9) AS mean_ab,
           round(ba.mean_d, 9) AS mean_ba,
           ab.max_d AS max_ab, ba.max_d AS max_ba
    FROM ab CROSS JOIN ba
    """,
)
def q_cloud_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.knn import cloud_compare

    cust = _cust_points(spark, sf_dir).select("c_custkey", "lat", "lon")
    supp = ops_h3.geocode(
        _t(spark, sf_dir, "supplier"), "s_suppkey"
    ).select("s_suppkey", "lat", "lon")
    out = cloud_compare(
        cust, supp, x="lon", y="lat",
        id_left="c_custkey", id_right="s_suppkey", cell=12.0,
    )
    return out.select(
        F.round("chamfer", 9).alias("chamfer"),
        "hausdorff",
        F.round("mean_ab", 9).alias("mean_ab"),
        F.round("mean_ba", 9).alias("mean_ba"),
        "max_ab", "max_ba",
    )


# ---------------------------------------------------------------------------
# filters.hexbin boundary output (HexBinFilter.cpp:224-301): the
# dissolved dense-cell boundary as the exact edge set (cell edges not
# shared by two dense cells) — a groupBy dissolve, no geometry lib.
# ---------------------------------------------------------------------------
_HB_RES = 6
_HB_THRESH = 2


def _boundary_sql() -> str:
    ix_e, iy_e = G.qcell_deconstruct("h3_cell", G.DUCKDB)
    n = 1 << _HB_RES
    sx = G.fnum(360.0 / n)
    sy = G.fnum(180.0 / n)
    return f"""
    WITH cells AS (
      SELECT {G.qcell('lat', 'lon', _HB_RES)} AS h3_cell,
             count(*) AS cnt
      FROM {_PTS} GROUP BY 1 HAVING count(*) >= {_HB_THRESH}
    ),
    cxy AS (SELECT {ix_e} AS ix, {iy_e} AS iy FROM cells),
    edges AS (
      SELECT 'H' AS orient, ix AS ex, iy AS ey FROM cxy
      UNION ALL SELECT 'H', ix, iy + 1 FROM cxy
      UNION ALL SELECT 'V', ix, iy FROM cxy
      UNION ALL SELECT 'V', ix + 1, iy FROM cxy
    ),
    boundary AS (
      SELECT orient, ex, ey FROM edges
      GROUP BY 1, 2, 3 HAVING count(*) = 1
    )
    SELECT orient,
           -1.8e2 + ex * {sx} AS x1,
           -9e1 + ey * {sy} AS y1,
           CASE WHEN orient = 'H'
             THEN (-1.8e2 + ex * {sx}) + {sx}
             ELSE -1.8e2 + ex * {sx} END AS x2,
           CASE WHEN orient = 'V'
             THEN (-9e1 + ey * {sy}) + {sy}
             ELSE -9e1 + ey * {sy} END AS y2
    FROM boundary
    """


@gate("density_boundary", _boundary_sql())
def q_density_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.hexbin import density_boundary_edges

    pts = _points(spark, sf_dir)
    return density_boundary_edges(
        pts, lat="lat", lon="lon", res=_HB_RES, threshold=_HB_THRESH
    )


# ---------------------------------------------------------------------------
# filters.colorinterp MAD mode (ColorinterpFilter.cpp:125-129,209-211):
# ramp bounds = median +- (MAD * multiplier * k) — exact order
# statistics, so the derived bounds and all bucket assignments are
# bit-reproducible (unlike the stddev mode's float accumulation).
# ---------------------------------------------------------------------------
_CI_K = 2.0
_CI_MULT = 1.4862
_CI_RAMP = [(0, 0, 255), (0, 128, 192), (0, 255, 128),
            (128, 255, 0), (192, 128, 0), (255, 0, 0)]


def _colorinterp_auto_sql() -> str:
    n = len(_CI_RAMP)
    b = (
        "least(greatest(cast(floor((value - mn) / dd * "
        f"{n}) as int), 0), {n - 1})"
    )
    chans = []
    for i, ch in enumerate(["red", "green", "blue"]):
        cases = " ".join(
            f"WHEN {j} THEN {_CI_RAMP[j][i]}" for j in range(n)
        )
        chans.append(f"(CASE {b} {cases} END) AS {ch}")
    return f"""
    WITH m AS (SELECT median(value) AS med FROM events),
    d0 AS (SELECT median(abs(value - m.med)) AS mad FROM events, m),
    b AS (SELECT med,
                 ((mad * {G.fnum(_CI_MULT)}) * {G.fnum(_CI_K)}) AS th
          FROM m, d0),
    bb AS (SELECT med - th AS mn,
                  (med + th) - (med - th) AS dd FROM b)
    SELECT event_id, {', '.join(chans)}
    FROM events CROSS JOIN bb
    """


@gate("colorinterp_mad", _colorinterp_auto_sql())
def q_colorinterp_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import colorinterp_auto

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    out = colorinterp_auto(
        ev, "value", k=_CI_K, mad_multiplier=_CI_MULT, ramp=_CI_RAMP
    )
    return out.select("event_id", "red", "green", "blue")


# ---------------------------------------------------------------------------
# filters.divider expression mode (DividerFilter.cpp:85-124): new
# view after every `capacity` expression-matching points, as an
# exclusive prefix sum of the match indicator (distributed — no
# global window; the oracle uses one).
# ---------------------------------------------------------------------------
_DIVX_CAP = 100


@gate(
    "divider_expression",
    f"""
    SELECT event_id,
           cast(floor((cum - m) / {_DIVX_CAP}) as int) AS group_id
    FROM (
      SELECT event_id, m,
             sum(m) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
      FROM (SELECT event_id,
                   CASE WHEN value > 5e1 THEN 1 ELSE 0 END AS m
            FROM events) i
    ) c
    """,
)
def q_divider_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.rowops import divider_expression

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    out = divider_expression(
        ev, "value > 50", capacity=_DIVX_CAP, order="event_id"
    )
    return out.select("event_id", "group_id")


# ---------------------------------------------------------------------------
# filters.stats `global` option (StatsFilter.cpp median/MAD block):
# exact order statistics per dimension — bit-reproducible, unlike the
# float-accumulated moments.
# ---------------------------------------------------------------------------
def _stats_global_dim(d: str) -> str:
    return f"""
    SELECT '{d}' AS dimension, count({d}) AS cnt,
           min({d}) AS minimum, max({d}) AS maximum,
           median({d}) AS median,
           (SELECT median(abs({d} - m.med))
            FROM events, (SELECT median({d}) AS med FROM events) m)
             AS mad
    FROM events
    """


@gate(
    "stats_global",
    " UNION ALL ".join(
        _stats_global_dim(d) for d in ("value", "user_id")
    ),
)
def q_stats_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import stats_global

    ev = _t(spark, sf_dir, "events")
    return stats_global(ev, ["value", "user_id"])


# ---------------------------------------------------------------------------
# Embedding near-dup DEDUP: connected components over the
# lsh_near_dup pair graph, canonical = min id per component (the
# keep-one-survivor step after near-dup mining; transitive closure
# catches A~B~C chains whose A~C cosine is below threshold).
# ---------------------------------------------------------------------------
from pdal_spark.gates.gate_ext import _lsh_sig_sql  # noqa: E402

_ND_THRESH = 0.15


def _near_dup_components_sql() -> str:
    cos = (
        "list_dot_product(sa.v, sb.v)"
        " / (sqrt(list_dot_product(sa.v, sa.v))"
        " * sqrt(list_dot_product(sb.v, sb.v)))"
    )
    return f"""
    WITH RECURSIVE
    sigs AS (
      SELECT vec_id, cast(embedding as double[]) AS v,
             {_lsh_sig_sql('cast(embedding as double[])', 16)} AS sig
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id AS doc, b.band,
             sig & (15 * cast(pow(16, b.band) as bigint)) AS bsig
      FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.doc AS a, r.doc AS b
      FROM bands l JOIN bands r USING (band, bsig)
      WHERE l.doc < r.doc
    ),
    pairs AS (
      SELECT c.a, c.b FROM cand c
      JOIN sigs sa ON sa.vec_id = c.a
      JOIN sigs sb ON sb.vec_id = c.b
      WHERE {cos} >= {G.fnum(_ND_THRESH)}
    ),
    edges AS (
      SELECT a AS ea, b AS eb FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    reach(pid, lbl) AS (
      SELECT vec_id, vec_id FROM sigs
      UNION
      SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.pid
    ),
    comp AS (SELECT pid, min(lbl) AS canonical_id FROM reach GROUP BY 1),
    sizes AS (
      SELECT canonical_id, count(*) AS comp_size FROM comp GROUP BY 1
    )
    SELECT c.pid AS vec_id, c.canonical_id, s.comp_size
    FROM comp c JOIN sizes s USING (canonical_id)
    """


@gate("near_dup_components", _near_dup_components_sql())
def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import near_dup_components

    emb = _t(spark, sf_dir, "embeddings")
    return near_dup_components(
        emb, threshold=_ND_THRESH, n_planes=16, bands=4
    )


# ---------------------------------------------------------------------------
# MinHash text near-dup DEDUP: components over Jaccard-verified LSH
# pairs (exact integer-ratio threshold — no float edge risk).
# ---------------------------------------------------------------------------
from pdal_spark.gate import _lsh_pairs_sql  # noqa: E402

_NDD_J = 0.5


@gate(
    "near_dup_doc_components",
    f"""
    WITH RECURSIVE
    jpairs AS (
      SELECT a, b FROM ({_lsh_pairs_sql()}) p
      WHERE jaccard >= {G.fnum(_NDD_J)}
    ),
    edges AS (
      SELECT a AS ea, b AS eb FROM jpairs
      UNION ALL SELECT b, a FROM jpairs
    ),
    reach(pid, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.pid
    ),
    comp AS (SELECT pid, min(lbl) AS canonical_id FROM reach GROUP BY 1),
    sizes AS (
      SELECT canonical_id, count(*) AS comp_size FROM comp GROUP BY 1
    )
    SELECT c.pid AS doc_id, c.canonical_id, s.comp_size
    FROM comp c JOIN sizes s USING (canonical_id)
    """,
)
def q_near_dup_doc_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.near_dup_doc_components(
        docs, jaccard_threshold=_NDD_J, vocab_df=v
    )
