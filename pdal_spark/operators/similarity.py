"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the dot product stays JVM-side
via zip_with + aggregate (sequential fold => deterministic, oracle-
comparable); the pair space is a broadcast-nested-loop of queries x
corpus, acceptable when |queries| x |corpus| is bounded.

Scale path: random-hyperplane LSH — each vector gets a b-bit sign
signature against deterministic pseudo-random planes (Lehmer-seeded,
no stored model); candidate pairs share a signature bucket; exact
cosine computed only for candidates. Shuffles carry (bucket, id),
never the raw vectors twice.

Embedding-cosine near-dup (training-data dedup) = lsh_near_dup with a
high threshold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

M31 = 2147483647


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_unit_norm(df: DataFrame, vec: str = "embedding",
                   out: str = "unit_vec") -> DataFrame:
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    return df.withColumn(out, F.transform(v, lambda x: x / _norm(v)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
    max_broadcast_queries: int = 4096,
    max_driver_queries: int = 1 << 20,
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, nb_id, cosine, sim_rank).

    Exact baseline. The queries are collected and broadcast as numpy
    matrices; each corpus Arrow batch computes a C @ Q.T matmul and
    emits only its PARTIAL top-k per query, so the shuffle into the
    final rank carries O(partitions * k) rows per query instead of
    O(|corpus|). Query sets larger than ``max_broadcast_queries`` are
    CHUNKED: one mapInPandas scan per chunk (each closure carries
    only its slice, bounding broadcast size), candidates unioned —
    never a cartesian join (the r1 crossJoin fallback shuffled
    |Q|*|C| rows; this plan shuffles chunks * partitions * k per
    query).

    Driver-memory bound: queries stream to the driver via
    ``toLocalIterator`` (one partition in flight, packed straight
    into numpy — no full Row materialization) and the count is
    HARD-CAPPED at ``max_driver_queries`` (default 2^20; the chunk
    closures jointly hold the whole query matrix, ~2 GB at 256-dim
    float64). Beyond that the exact brute-force plan is the wrong
    tool and this raises, pointing at :func:`ivf_topk` /
    :func:`lsh_topk`. Tie-break (cosine desc, nb_id asc).
    """
    import numpy as np
    import pandas as pd

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("nb_id"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("cv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )

    qids_buf: list = []
    qvec_buf: list = []
    for r in q.toLocalIterator():
        qids_buf.append(r["query_id"])
        qvec_buf.append(r["qv"])
        if len(qids_buf) > int(max_driver_queries):
            raise ValueError(
                "cosine_topk: query set exceeds max_driver_queries="
                f"{int(max_driver_queries)}; exact brute force would "
                "not fit on the driver — use ivf_topk/lsh_topk for "
                "large query sets, or raise the cap explicitly"
            )
    all_qids = np.array(qids_buf)
    all_qmat = np.array(qvec_buf, dtype=np.float64)
    del qids_buf, qvec_buf

    def chunk_scan(qids, qmat):
        qnorm = np.sqrt((qmat * qmat).sum(axis=1))

        def partial(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                cm = np.array(list(pdf["cv"]), dtype=np.float64)
                cid = pdf["nb_id"].to_numpy()
                cn = np.sqrt((cm * cm).sum(axis=1))
                sims = (cm @ qmat.T) / (cn[:, None] * qnorm[None, :])
                sims[cid[:, None] == qids[None, :]] = -np.inf
                kk = min(k, sims.shape[0])
                # per-query partial top-k within this batch
                part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
                rows, qcols = (
                    part.ravel(),
                    np.tile(np.arange(sims.shape[1]), kk),
                )
                vals = sims[rows, qcols]
                keep = np.isfinite(vals)
                yield pd.DataFrame({
                    "query_id": qids[qcols[keep]],
                    "nb_id": cid[rows[keep]],
                    "cosine": vals[keep],
                })

        return partial

    schema = (
        f"query_id {q.schema['query_id'].dataType.simpleString()}, "
        f"nb_id {c.schema['nb_id'].dataType.simpleString()}, "
        "cosine double"
    )
    step = max(1, int(max_broadcast_queries))
    cand = None
    for lo in range(0, max(len(all_qids), 1), step):
        qids = all_qids[lo:lo + step]
        if len(qids) == 0:
            break
        part = c.mapInPandas(chunk_scan(qids, all_qmat[lo:lo + step]),
                             schema)
        cand = part if cand is None else cand.unionByName(part)
    if cand is None:
        cand = c.sparkSession.createDataFrame([], schema)
    return (
        cand.withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= k)
        .select("query_id", "nb_id", "cosine", "sim_rank")
    )


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1):
    two Lehmer rounds over (plane, dim) — no stored model, any
    executor can regenerate it."""
    h = ((plane * 7919 + dim + 7) * 48271) % M31
    h = (h * 48271) % M31
    return (h % 2000000) / 1000000.0 - 1.0


def lsh_signature(
    df: DataFrame, n_planes: int = 16, vec: str = "embedding",
    dims: int = 64, out: str = "lsh_sig",
) -> DataFrame:
    """b-bit random-hyperplane signature; sign bits packed to long."""
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(_plane_component(p, d)) for d in range(dims)]
        )
        proj = _dot(v, plane)
        sig = sig + F.when(proj > 0, 1 << p).otherwise(0)
    return df.withColumn(out, sig)


def lsh_near_dup(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 64,
) -> DataFrame:
    """ANN near-dup: signature bands -> candidate pairs -> exact
    cosine for candidates only -> threshold. Recall grows with bands
    (hamming tolerance = bits not in the matching band)."""
    sigs = lsh_signature(df, n_planes, vec, dims)
    rows_per_band = n_planes // bands
    frames = []
    for b in range(bands):
        mask = ((1 << rows_per_band) - 1) << (b * rows_per_band)
        frames.append(
            sigs.select(
                F.col(id_col).alias("doc"),
                F.lit(b).alias("band"),
                F.col("lsh_sig").bitwiseAND(F.lit(mask)).alias("bsig"),
            )
        )
    ab = frames[0]
    for fme in frames[1:]:
        ab = ab.unionByName(fme)
    pairs = (
        ab.alias("l")
        .join(ab.alias("r"), on=["band", "bsig"])
        .where(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("a"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("av"),
    )
    vb = df.select(
        F.col(id_col).alias("b"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("bv"),
    )
    j = pairs.join(va, on="a").join(vb, on="b")
    cos = _dot(F.col("av"), F.col("bv")) / (
        _norm(F.col("av")) * _norm(F.col("bv"))
    )
    return (
        j.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe_bits: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k restricted to the query's LSH bucket family
    (coarse IVF analog: cells = signature prefixes). Trades recall
    for pruning the corpus scan; exactness tested statistically."""
    qs = lsh_signature(queries, n_probe_bits, vec, dims).select(
        F.col(id_col).alias("query_id"), F.col("lsh_sig").alias("cellq"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("qv"),
    )
    cs = lsh_signature(corpus, n_probe_bits, vec, dims).select(
        F.col(id_col).alias("nb_id"), F.col("lsh_sig").alias("cellc"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("cv"),
    )
    j = qs.join(cs, qs["cellq"] == cs["cellc"]).where(
        F.col("query_id") != F.col("nb_id")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )
    return (
        j.withColumn("cosine", cos)
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= k)
        .select("query_id", "nb_id", "cosine", "sim_rank")
    )


def near_dup_components(
    emb: DataFrame,
    threshold: float = 0.15,
    n_planes: int = 16,
    bands: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate DEDUP (not just pair detection):
    connected components over the `lsh_near_dup` pair graph, with the
    canonical representative = smallest id per component — the
    "keep one per duplicate cluster" step a training-data pipeline
    runs after near-dup mining. Transitivity matters: A~B and B~C
    dedup to one survivor even when A~C is below threshold.

    Output: (id, canonical_id, comp_size). Scale shape: the pair
    graph is tiny relative to the corpus (only candidates above
    threshold), and min-label propagation converges in
    O(component diameter) rounds — near-dup components are shallow
    star-like clusters in practice."""
    pairs = lsh_near_dup(
        emb, threshold=threshold, n_planes=n_planes, bands=bands,
        vec=vec, id_col=id_col,
    ).select("a", "b")
    from pdal_spark.operators.cluster import connected_components_star

    edges = pairs.select(
        F.col("a").alias("src_id"), F.col("b").alias("nb_id")
    ).unionByName(
        pairs.select(
            F.col("b").alias("src_id"), F.col("a").alias("nb_id")
        )
    )
    nodes = emb.select(F.col(id_col).alias("pid"))
    comp = connected_components_star(nodes, edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return (
        comp.join(sizes, on="component")
        .select(
            F.col("pid").alias(id_col),
            F.col("component").alias("canonical_id"),
            "comp_size",
        )
    )


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic-seed IVF coarse quantizer: the centroid set is
    the `nlist` corpus vectors with the smallest Lehmer-hashed ids —
    a hash-random sample that both engines (and any two runs)
    reproduce exactly. Random seeding is the standard IVF baseline
    (k-means training refines it; the probe structure is identical).
    Returns a small (cid, cv) table meant to be broadcast.
    """
    from pdal_spark import sqlgen as G

    return (
        corpus.orderBy(
            F.expr(G.lehmer2_wide(f"`{id_col}`")), F.col(id_col)
        )
        .limit(int(nlist))
        .select(
            F.col(id_col).alias("cid"),
            F.transform(
                F.col(vec), lambda x: x.cast("double")
            ).alias("cv"),
        )
    )


def _assign_cells(
    df: DataFrame,
    cents: DataFrame,
    n_keep: int,
    vec: str,
    id_col: str,
    out_id: str,
) -> DataFrame:
    """Rank centroids per vector by cosine (desc, cid tie-break) and
    keep the top n_keep as (out_id, cell, qv). The centroid table is
    broadcast and tiny, so the crossJoin is a map-side nlist-way
    expansion followed by a per-vector window over nlist rows — no
    corpus-sized shuffle. (At very large nlist the argmin becomes the
    batched-matmul pandas kernel cosine_topk uses; the probe
    structure downstream is unchanged.)"""
    qv = F.transform(F.col(vec), lambda x: x.cast("double"))
    pairs = (
        df.select(F.col(id_col).alias(out_id), qv.alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cos_c", _dot(F.col("qv"), F.col("cv")) / (
            _norm(F.col("qv")) * _norm(F.col("cv"))
        ))
    )
    w = Window.partitionBy(out_id).orderBy(
        F.col("cos_c").desc(), F.col("cid").asc()
    )
    return (
        pairs.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= int(n_keep))
        .select(out_id, F.col("cid").alias("cell"), "qv")
    )


def ivf_trained_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """True IVF probe-structured ANN: corpus vectors are inverted
    into `nlist` coarse cells (nearest centroid); each query probes
    its `nprobe` nearest cells and ranks ONLY the vectors filed
    there — the recall/scan-fraction dial real vector stores expose
    (nprobe/nlist of the corpus scanned per query, vs the LSH-bucket
    family of `ivf_topk`).

    Scale: centroids broadcast; the corpus inversion is one
    map-side expansion + per-vector window (rows-per-window = nlist);
    the probe join shuffles on the cell id, so hot cells behave like
    hot tiles (AQE skew split applies). Returns (query_id, nb_id,
    cosine, sim_rank).
    """
    cents = ivf_centroids(corpus, nlist, vec, id_col)
    inv = _assign_cells(corpus, cents, 1, vec, id_col, "nb_id")
    probes = _assign_cells(queries, cents, nprobe, vec, id_col,
                           "query_id").drop("qv")
    qv = F.transform(F.col(vec), lambda x: x.cast("double"))
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv")
    )
    cand = (
        probes.join(qvecs, on="query_id")
        .join(
            inv.withColumnRenamed("qv", "cv"),
            on="cell",
        )
        .where(F.col("query_id") != F.col("nb_id"))
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )
    return (
        cand.withColumn("cosine", cos)
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= int(k))
        .select("query_id", "nb_id", "cosine", "sim_rank")
    )


def quantize_vectors(
    df: DataFrame,
    vec: str = "embedding",
    bits: int = 8,
    out: str = "qvec",
) -> DataFrame:
    """Per-vector symmetric max-abs int quantization (the standard
    int8 ANN compression): qvec[i] = round(v[i] * qmax / max|v|),
    qmax = 2^(bits-1) - 1. Keeps `qscale` = max|v| for dequantize.

    At 100 TB this is the shuffle-size lever for similarity search:
    an int8 payload is 4x smaller than float32 (8x vs float64), and
    every downstream dot product is exact integer arithmetic (values
    <= qmax, so 64-dim dots stay far below 2^53 — reproducible under
    any aggregation order, unlike float dots).
    """
    qmax = float((1 << (bits - 1)) - 1)
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    m = F.array_max(F.transform(v, F.abs))
    # zero vectors (they DO occur in web-scale embedding dumps —
    # failed encodes) quantize to zeros instead of dividing by zero
    safe = F.when(F.col("qscale") > 0.0, F.col("qscale")).otherwise(
        F.lit(1.0)
    )
    return df.withColumn("qscale", m).withColumn(
        out,
        F.transform(v, lambda x: F.round(x * qmax / safe)),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Brute-force cosine top-k in the QUANTIZED domain:
    approx_cosine = intdot(qa, qb) / (|qa| * |qb|). All inputs to the
    score are small integers, so the score is bit-deterministic
    (integer sums are exact in double; one sqrt + one divide, both
    IEEE-exact) — rank and value reproduce under any plan. Recall vs
    exact cosine is the usual int8 tradeoff (ties within ~1/qmax may
    reorder); tie-break (score desc, nb_id asc) is total.
    """
    q = quantize_vectors(queries, vec=vec, bits=bits).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qa")
    )
    c = quantize_vectors(corpus, vec=vec, bits=bits).select(
        F.col(id_col).alias("nb_id"), F.col("qvec").alias("qb")
    )
    j = F.broadcast(q).crossJoin(c).where(
        F.col("query_id") != F.col("nb_id")
    )
    score = _dot(F.col("qa"), F.col("qb")) / (
        _norm(F.col("qa")) * _norm(F.col("qb"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("nb_id").asc()
    )
    return (
        j.withColumn("qcosine", score)
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= k)
        .select("query_id", "nb_id", "qcosine", "sim_rank")
    )


def _quant_arr(v, bits: int = 8):
    """Row-local symmetric int quantization of a double array column
    (same formula as quantize_vectors, usable mid-plan)."""
    qmax = float((1 << (bits - 1)) - 1)
    m = F.array_max(F.transform(v, F.abs))
    safe = F.when(m > 0.0, m).otherwise(F.lit(1.0))
    return F.transform(v, lambda x: F.round(x * qmax / safe))


def ivf_quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    bits: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The FAISS-style production scale path: IVF probe structure
    (nprobe/nlist of the corpus scanned per query) COMBINED with
    int8 scoring (4x smaller candidate payloads, integer-exact
    scores). Cell assignment stays in the float domain — identical
    probe structure to ivf_trained_topk — and the candidate join
    carries only quantized vectors, so the shuffle that dominates at
    corpus scale moves a quarter of the bytes. Quantization happens
    ROW-LOCALLY on the assignment outputs (no extra pass or join).

    Returns (query_id, nb_id, qcosine, sim_rank) with the same total
    tie-break as quantized_topk (score desc, nb_id asc).
    """
    cents = ivf_centroids(corpus, nlist, vec, id_col)
    inv = _assign_cells(corpus, cents, 1, vec, id_col, "nb_id").select(
        "nb_id", "cell", _quant_arr(F.col("qv"), bits).alias("qb")
    )
    probes = _assign_cells(
        queries, cents, nprobe, vec, id_col, "query_id"
    ).select(
        "query_id", "cell", _quant_arr(F.col("qv"), bits).alias("qa")
    )
    cand = probes.join(inv, on="cell").where(
        F.col("query_id") != F.col("nb_id")
    )
    score = _dot(F.col("qa"), F.col("qb")) / (
        _norm(F.col("qa")) * _norm(F.col("qb"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("nb_id").asc()
    )
    return (
        cand.withColumn("qcosine", score)
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= int(k))
        .select("query_id", "nb_id", "qcosine", "sim_rank")
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.97,
    nlist: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    dedup over embeddings. Cluster the corpus with the IVF coarse
    quantizer (deterministic hash-seeded centroids, broadcast), then
    compute pairwise cosine ONLY within each cluster and drop every
    vector that has a lower-id cluster-mate with cosine >= threshold
    — one representative (the smallest id) survives per semantic
    duplicate set, exactly the keep-one rule the paper applies per
    cluster.

    Scale shape: the O(n^2) pair space collapses to sum of
    |cluster|^2; the self-join shuffles on the cluster id only (hot
    clusters behave like hot tiles — AQE skew split applies), and
    the pair comparison never leaves the JVM (zip_with/aggregate
    dot product, sequential fold => bit-reproducible, so the
    threshold test is oracle-exact). Output: (vec_id, cell, kept)
    with kept=1 for survivors.
    """
    cents = ivf_centroids(corpus, nlist, vec, id_col)
    asg = _assign_cells(corpus, cents, 1, vec, id_col, id_col)
    left = asg.select(
        F.col(id_col), F.col("cell"), F.col("qv")
    )
    right = asg.select(
        F.col(id_col).alias("__rid"), F.col("cell"),
        F.col("qv").alias("__rv"),
    )
    cos = _dot(F.col("qv"), F.col("__rv")) / (
        _norm(F.col("qv")) * _norm(F.col("__rv"))
    )
    removed = (
        left.join(right, on="cell")
        .where(F.col("__rid") < F.col(id_col))
        .where(cos >= float(threshold))
        .select(id_col)
        .distinct()
    )
    return (
        asg.join(removed.withColumn("__gone", F.lit(1)), on=id_col,
                 how="left")
        .select(
            id_col, "cell",
            F.when(F.col("__gone").isNull(), F.lit(1))
            .otherwise(F.lit(0)).alias("kept"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse tf-idf cosine top-k over the INVERTED INDEX: for each
    query doc, the k nearest corpus docs by tf-idf-weighted cosine —
    the lexical retrieval complement of the dense-embedding
    cosine_topk (BM25-family shape, idf = ln(N/df)).

    Exactness: idf is quantized to the 2^-20 grid, so every term
    weight wt = tf * idf_q is an int64; dots and squared norms are
    exact integer sums (bounded < 2^63 for tf < 2^10, ln N < 2^5);
    cosine = dot / (sqrt(na) * sqrt(nb)) uses only correctly-rounded
    IEEE ops — bit-identical across engines. Ties break on nb_id.

    Scale: the dot-product join is keyed on WORD (inverted index).
    Stopword keys are the classic skew term — but any word present
    in every document has idf = 0 and weight 0, so zero-weight
    postings are pruned BEFORE the join (provably no effect on any
    cosine); near-universal words keep tiny weights and can be
    df-capped by the caller. The final top-k is a per-query
    WindowGroupLimit (k-row heap per query, no full sort).
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.textops import tokens

    t = (
        tokens(df, text, id_col)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = t.select(id_col).distinct().count()
    idf = t.groupBy("word").agg(
        F.count(F.lit(1)).alias("dfw")
    ).withColumn(
        "idf_q",
        F.expr(
            f"cast(floor(ln({G.fnum(float(n_docs))}"
            " / cast(dfw as double))"
            f" * {G.fnum(float(1 << 20))} + {G.fnum(0.5)}) as bigint)"
        ),
    )
    w = (
        t.join(F.broadcast(idf.select("word", "idf_q")), on="word")
        .withColumn("wt", F.col("tf") * F.col("idf_q"))
        .where(F.col("wt") != 0)
    )
    nrm = w.groupBy(id_col).agg(F.sum(F.col("wt") * F.col("wt")).alias("n2"))
    qw = w.join(
        queries.select(F.col(id_col)).distinct(), on=id_col, how="semi"
    ).select(F.col(id_col).alias("query_id"), "word",
             F.col("wt").alias("wa"))
    cw = w.select(F.col(id_col).alias("nb_id"), "word",
                  F.col("wt").alias("wb"))
    dots = (
        qw.join(cw, on="word")
        .where(F.col("nb_id") != F.col("query_id"))
        .groupBy("query_id", "nb_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(nrm.withColumnRenamed(id_col, "query_id")
                  .withColumnRenamed("n2", "na"), on="query_id")
        .join(nrm.withColumnRenamed(id_col, "nb_id")
              .withColumnRenamed("n2", "nb"), on="nb_id")
        .withColumn(
            "cosine",
            F.expr("cast(dot as double)"
                   " / (sqrt(cast(na as double))"
                   " * sqrt(cast(nb as double)))"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )
    return (
        cos.withColumn("sim_rank", F.row_number().over(rw))
        .where(F.col("sim_rank") <= int(k))
        .select("query_id", "nb_id", "cosine", "sim_rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    top_k: int = 5,
    query_col: str = "query_id",
    item_col: str = "nb_id",
    rank_col: str = "sim_rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N per-query
    rankings — the standard hybrid-retrieval merge (dense ANN +
    sparse tf-idf): score(item) = sum over systems of
    1 / (k + rank_i). Rank-only fusion needs no score calibration
    between systems; k=60 is the published default.

    Exactness: each 1/(k+r) term is one IEEE division of small ints
    and the per-item sum has <= N terms folded in a fixed order
    (system index) — bit-identical across engines. Final order
    (rrf desc, item asc).

    Scale: inputs are already top-k-per-query (tiny relative to the
    corpora); fusion is one groupBy on (query, item) and a per-query
    WindowGroupLimit.
    """
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(query_col).alias("query_id"),
            F.col(item_col).alias("nb_id"),
            F.lit(i).alias("__sys"),
            F.col(rank_col).alias("__rk"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    # fixed fold order: sort_array over (sys, term) structs so the
    # float sum is order-pinned regardless of partitioning
    per = (
        tagged.groupBy("query_id", "nb_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(__sys, __rk)))"
                f", cast(0.0 as double),"
                f" (acc, s) -> acc + 1.0e0 / ({int(k_const)} + s.__rk))"
            ).alias("rrf")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("nb_id").asc()
    )
    return (
        per.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= int(top_k))
        .select("query_id", "nb_id", "rrf", "fused_rank")
    )


def pq_codebook(
    corpus: DataFrame,
    m: int = 8,
    ncent: int = 16,
    vec: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization codebook (FAISS PQ family): the vector
    space splits into `m` contiguous subspaces of dim/m dims; each
    subspace gets `ncent` centroids. Centroid source vectors are the
    `ncent` corpus vectors with the smallest Lehmer-hashed ids — the
    hash-random sample init both engines reproduce exactly (k-means
    refinement of the codebook is the standard polish; the code
    assignment / ADC machinery downstream is identical). Vectors are
    int-quantized first (`quantize_vectors`), so every distance and
    dot downstream is exact integer arithmetic — bit-reproducible
    under any plan.

    Returns the small (sub, cid, cv:array<bigint>) table, meant to be
    broadcast (m * ncent rows).
    """
    from pdal_spark import sqlgen as G

    if dim is None:
        dim = corpus.select(
            F.size(F.col(vec)).alias("d")
        ).first()["d"]
    if dim % m:
        raise ValueError("m must divide the vector dim")
    d = dim // m
    src = (
        quantize_vectors(corpus, vec=vec, bits=bits)
        .orderBy(F.expr(G.lehmer2_wide(id_col)), F.col(id_col))
        .limit(int(ncent))
        .select(
            F.col(id_col).alias("cid"),
            F.transform(
                F.col("qvec"), lambda x: x.cast("bigint")
            ).alias("__qv"),
        )
    )
    return src.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "cid",
        "__qv",
    ).select(
        "sub",
        "cid",
        F.expr(f"slice(__qv, sub * {d} + 1, {d})").alias("cv"),
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    dim: int | None = None,
    out_id: str = "nb_id",
) -> DataFrame:
    """PQ code assignment: each vector's subspace slice maps to its
    nearest centroid by exact integer L2 (ties -> smaller cid).
    Output is the LONG form (out_id, sub, code) — m small-int rows
    per vector, the shape the ADC join consumes (and the columnar
    layout a 100 TB code table wants: ~m bytes/vector vs 4*dim).

    Scale: the codebook is broadcast; assignment is a row-local
    m * ncent expansion + per-(vector, sub) window over ncent rows —
    no corpus-sized shuffle beyond the window's hash partition on the
    vector id.
    """
    if dim is None:
        dim = df.select(F.size(F.col(vec)).alias("d")).first()["d"]
    d = dim // m
    ex = (
        quantize_vectors(df, vec=vec, bits=bits)
        .select(
            F.col(id_col).alias(out_id),
            F.transform(
                F.col("qvec"), lambda x: x.cast("bigint")
            ).alias("__qv"),
        )
        .select(
            out_id,
            F.explode(
                F.sequence(F.lit(0), F.lit(m - 1))
            ).alias("sub"),
            "__qv",
        )
        .select(
            out_id,
            "sub",
            F.expr(f"slice(__qv, sub * {d} + 1, {d})").alias("sv"),
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("cv"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(out_id, "sub").orderBy(
        F.col("__d2").asc(), F.col("cid").asc()
    )
    return (
        ex.join(F.broadcast(codebook), on="sub")
        .withColumn("__d2", d2)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(out_id, "sub", F.col("cid").alias("code"))
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ncent: int = 16,
    vec: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """PQ asymmetric-distance top-k (FAISS ADC): corpus vectors are
    PQ codes; each query builds an m x ncent lookup table of exact
    integer dots between its quantized subvectors and every centroid;
    a document's score is the sum of its m looked-up entries — the
    inner-product ADC approximation, bit-deterministic end to end
    (every term is a bounded-int dot, sums < 2^53).

    Scale: the corpus never moves as floats — only (nb_id, sub, code)
    rows join the BROADCAST LUT (|Q| * m * ncent small rows), then
    ONE map-side-combined groupBy folds the m terms per (query, doc)
    and a per-query window keeps k. The 4*dim-byte float payload is
    replaced by ~m bytes of codes: the shuffle-volume lever at
    100 TB. Returns (query_id, nb_id, adc_score, sim_rank).
    """
    dim = corpus.select(F.size(F.col(vec)).alias("d")).first()["d"]
    d = dim // m
    cb = pq_codebook(
        corpus, m=m, ncent=ncent, vec=vec, id_col=id_col,
        bits=bits, dim=dim,
    )
    enc = pq_encode(
        corpus, cb, m=m, vec=vec, id_col=id_col, bits=bits,
        dim=dim, out_id="nb_id",
    )
    qex = (
        quantize_vectors(queries, vec=vec, bits=bits)
        .select(
            F.col(id_col).alias("query_id"),
            F.transform(
                F.col("qvec"), lambda x: x.cast("bigint")
            ).alias("__qv"),
        )
        .select(
            "query_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(m - 1))
            ).alias("sub"),
            "__qv",
        )
        .select(
            "query_id",
            "sub",
            F.expr(f"slice(__qv, sub * {d} + 1, {d})").alias("qs"),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qs"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    lut = (
        qex.join(F.broadcast(cb), on="sub")
        .select("query_id", "sub", F.col("cid").alias("code"),
                dot.alias("__dot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("nb_id").asc()
    )
    return (
        enc.join(F.broadcast(lut), on=["sub", "code"])
        .groupBy("query_id", "nb_id")
        .agg(F.sum("__dot").alias("adc_score"))
        .where(F.col("query_id") != F.col("nb_id"))
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= int(k))
        .select("query_id", "nb_id", "adc_score", "sim_rank")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ncent: int = 16,
    vec: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """IVF-PQ (FAISS IndexIVFPQ with by_residual=false): the coarse
    IVF quantizer restricts WHICH vectors are scored (each query
    probes its `nprobe` nearest of `nlist` cells), and product-
    quantization ADC decides HOW they are scored (integer LUT sums
    over m code bytes) — the two levers compose: scan-fraction
    nprobe/nlist x payload ~m bytes/vector. Residual encoding (PQ on
    v - centroid) is the float-path FAISS refinement; codes on raw
    vectors keep every score term bounded-integer and therefore
    bit-reproducible, which is what the oracle hashes.

    Scale: centroids + codebook + query LUTs broadcast; the inverted
    corpus carries (nb_id, cell, sub, code) — the probe join shuffles
    on the cell id (AQE skew split for hot cells), the ADC fold is
    ONE map-side-combined groupBy. Returns (query_id, nb_id,
    adc_score, sim_rank).
    """
    dim = corpus.select(F.size(F.col(vec)).alias("d")).first()["d"]
    d = dim // m
    cents = ivf_centroids(corpus, nlist, vec, id_col)
    inv = _assign_cells(corpus, cents, 1, vec, id_col, "nb_id").drop(
        "qv"
    )
    probes = _assign_cells(
        queries, cents, nprobe, vec, id_col, "query_id"
    ).drop("qv")
    cb = pq_codebook(
        corpus, m=m, ncent=ncent, vec=vec, id_col=id_col,
        bits=bits, dim=dim,
    )
    enc = pq_encode(
        corpus, cb, m=m, vec=vec, id_col=id_col, bits=bits,
        dim=dim, out_id="nb_id",
    ).join(inv, on="nb_id")
    qex = (
        quantize_vectors(queries, vec=vec, bits=bits)
        .select(
            F.col(id_col).alias("query_id"),
            F.transform(
                F.col("qvec"), lambda x: x.cast("bigint")
            ).alias("__qv"),
        )
        .select(
            "query_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(m - 1))
            ).alias("sub"),
            "__qv",
        )
        .select(
            "query_id",
            "sub",
            F.expr(f"slice(__qv, sub * {d} + 1, {d})").alias("qs"),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qs"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    lut = qex.join(F.broadcast(cb), on="sub").select(
        "query_id", "sub", F.col("cid").alias("code"),
        dot.alias("__dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("nb_id").asc()
    )
    return (
        probes.join(enc, on="cell")
        .join(F.broadcast(lut), on=["query_id", "sub", "code"])
        .groupBy("query_id", "nb_id")
        .agg(F.sum("__dot").alias("adc_score"))
        .where(F.col("query_id") != F.col("nb_id"))
        .withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= int(k))
        .select("query_id", "nb_id", "adc_score", "sim_rank")
    )


def _rp_sign(i: int, j: int, out_dim: int) -> int:
    """Deterministic Rademacher sign for (input dim i, output dim j)
    from the shared mix_hash arithmetic — regenerable on any executor
    AND by the SQL oracle; no stored projection matrix."""
    from pdal_spark import sqlgen as G

    return 1 - 2 * (G.py_mix_hash(i * out_dim + j) % 2)


def rp_sketch(
    df: DataFrame,
    out_dim: int = 16,
    dims: int = 64,
    bits: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss sign (Rademacher) random projection of
    quantized vectors (Achlioptas 2003 "Database-friendly random
    projections"): sketch[j] = sum_i sign(i,j) * qvec[i], an int64-
    exact dim-reduction that preserves dot products in expectation —
    the cheap pre-filter in front of exact cosine rerank, and a 4x-
    16x shuffle-payload shrink on top of int8 quantization. Output:
    (id, j, rp_q) exploded rows (j in [0, out_dim)).

    Scale: the projection is ROW-LOCAL (per output dim one
    zip_with + aggregate over the quantized array, signs baked into
    the plan as literals — no matrix join, no shuffle); the explode
    emits out_dim counter rows per vector. Integer terms are <= qmax
    * dims << 2^53, so results are bit-reproducible under any plan.
    """
    qz = quantize_vectors(df, vec=vec, bits=bits)
    outs = []
    for j in range(int(out_dim)):
        signs = F.array(*[
            F.lit(float(_rp_sign(i, j, int(out_dim))))
            for i in range(int(dims))
        ])
        outs.append(
            F.aggregate(
                F.zip_with(F.col("qvec"), signs, lambda x, s: x * s),
                F.lit(0.0),
                lambda a, t: a + t,
            ).cast("long")
        )
    return qz.select(
        F.col(id_col),
        F.posexplode(F.array(*outs)).alias("j", "rp_q"),
    )


def gram_matrix(
    df: DataFrame,
    dims: int = 64,
    bits: int = 8,
    vec: str = "embedding",
) -> DataFrame:
    """Uncentered Gram matrix of the quantized embedding corpus —
    the one-pass sufficient statistic for PCA/whitening (center and
    eigendecompose the dims x dims result on the driver; see
    pca_components): gram(i, j) = sum over vectors of q_i * q_j for
    i <= j, plus per-dim sums (i, -1, sum q_i) for the centering
    term and the row (-1, -1, n). All int64-exact (|q| <= 127, so a
    term is <= 16129 and 2^53/16129 ~ 5.6e11 vectors per partition
    before double-sum concerns — and the sums are LongType anyway).

    Scale: the upper-triangle outer product explodes ROW-LOCALLY
    (dims*(dims+1)/2 counter rows per vector) and partial
    aggregation collapses them to one counter set per partition
    before the only shuffle — the classic distributed Gram pattern;
    nothing ever materializes the n x dims matrix off-executor.
    """
    d = int(dims)
    qz = quantize_vectors(df, vec=vec, bits=bits)
    qv = F.col("qvec")
    pairs = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(d - 1)),
                    lambda j: F.struct(
                        i.alias("i"),
                        j.alias("j"),
                        (
                            F.element_at(qv, (i + 1).cast("int"))
                            * F.element_at(qv, (j + 1).cast("int"))
                        ).alias("p"),
                    ),
                ),
            )
        )
    )
    upper = (
        qz.select(pairs.alias("x"))
        .select("x.i", "x.j", "x.p")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("g_q"))
    )
    sums = (
        qz.select(
            F.posexplode(qv).alias("i", "q")
        )
        .groupBy("i")
        .agg(F.sum("q").cast("long").alias("g_q"))
        .select("i", F.lit(-1).alias("j"), "g_q")
    )
    n = qz.agg(F.count(F.lit(1)).cast("long").alias("g_q")).select(
        F.lit(-1).alias("i"), F.lit(-1).alias("j"), "g_q"
    )
    return upper.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"), "g_q",
    ).unionByName(sums.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"), "g_q",
    )).unionByName(n)


def pca_components(
    df: DataFrame,
    n_components: int = 4,
    dims: int = 64,
    bits: int = 8,
    vec: str = "embedding",
):
    """Driver-side PCA from the distributed Gram statistic: collect
    the dims x dims integer Gram table (tiny — O(dims^2) counters,
    independent of corpus size), center it into the covariance
    matrix, numpy-eigendecompose, return (eigenvalues, components)
    as plain numpy arrays sorted by descending eigenvalue. The
    corpus-side cost is exactly one gram_matrix pass; the
    eigendecomposition is a 64x64 problem no cluster should shuffle
    for. Quantization makes this PCA of the QUANTIZED corpus —
    the standard preprocessing tradeoff, documented not hidden."""
    import numpy as np

    d = int(dims)
    rows = gram_matrix(df, dims=d, bits=bits, vec=vec).collect()
    g = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        i, j, v = r["i"], r["j"], float(r["g_q"])
        if i == -1 and j == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            g[i, j] = v
            g[j, i] = v
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1.0, 1.0)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: int(n_components)]
    return vals[order], vecs[:, order].T


def pca_project(
    df: DataFrame,
    components,
    vec: str = "embedding",
    id_col: str = "vec_id",
    out: str = "pca",
) -> DataFrame:
    """Project embeddings onto driver-computed principal components
    (from pca_components): the dim-reduction write path after the
    Gram pass. `components` is a (k, dims) array baked into the plan
    as literals — the projection is ROW-LOCAL (k dot products per
    vector, no join, no shuffle), the same pattern as lsh_signature's
    plane dots. Output keeps id + a k-float array column `out`.
    Float path (components are eigenvectors): pytest-verified, not
    oracle-hashed — documented like colorinterp's stddev mode."""
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    comps = []
    for row in components:
        plane = F.array(*[F.lit(float(c)) for c in row])
        comps.append(
            F.aggregate(
                F.zip_with(v, plane, lambda a, b: a * b),
                F.lit(0.0), lambda acc, t: acc + t,
            )
        )
    return df.select(F.col(id_col), F.array(*comps).alias(out))


def mmr_rerank(
    cands: DataFrame,
    k: int = 8,
    lam: float = 0.7,
    rel: str = "rel",
    vec: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998)
    — the diversity pass training-data curation runs over a retrieval
    top-k (don't fill the context/batch with near-duplicates of the
    best hit): greedily select k candidates maximizing
    lam * rel - (1 - lam) * max_similarity_to_already_selected, ties
    to the smaller id. `cands` carries the relevance score and a
    QUANTIZED vector (quantize_vectors output): integer-valued dots
    are exact in double, so every score — and therefore the SELECTION
    ORDER — is bit-reproducible cross-engine (the oracle carries the
    selected set through k unrolled CTE steps).

    Scale: rerank inputs are top-k BOUNDED (dozens-to-hundreds of
    rows) by construction; each of the k greedy steps is one tiny
    Spark job whose argmax expression bakes the selected vectors as
    plan literals. Never run this on an unbounded candidate set —
    bound it with cosine_topk/quantized_topk first.

    Output: (id, sel_rank 1-based, mmr score at selection time).
    """
    from pdal_spark import sqlgen as G

    lam_f = G.fnum(float(lam))
    rem_f = G.fnum(1.0 - float(lam))
    base = cands.select(
        F.col(id_col).alias("__id"),
        F.col(rel).cast("double").alias("__rel"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=True)

    def _lit_arr(vals: list[float]) -> str:
        return "array(" + ", ".join(G.fnum(v) for v in vals) + ")"

    def _sim_expr(svec: list[float]) -> str:
        arr = _lit_arr(svec)
        dot = (
            f"aggregate(zip_with(__v, {arr}, (a, b) -> a * b),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        )
        nc = (
            "sqrt(aggregate(__v, cast(0.0 as double),"
            " (acc, x) -> acc + x * x))"
        )
        ns = (
            f"sqrt(aggregate({arr}, cast(0.0 as double),"
            " (acc, x) -> acc + x * x))"
        )
        return f"({dot} / ({nc} * {ns}))"

    selected: list[tuple] = []
    out_rows: list[tuple] = []
    cur = base
    for step in range(1, int(k) + 1):
        if not selected:
            score = f"({lam_f} * __rel)"
        else:
            sims = [_sim_expr(list(s[1])) for s in selected]
            mx = sims[0] if len(sims) == 1 else (
                "greatest(" + ", ".join(sims) + ")"
            )
            score = f"({lam_f} * __rel - {rem_f} * {mx})"
        top = (
            cur.select("__id", "__v", F.expr(score).alias("__mmr"))
            .orderBy(F.col("__mmr").desc(), F.col("__id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        selected.append((r["__id"], r["__v"]))
        out_rows.append((r["__id"], step, float(r["__mmr"])))
        cur = cur.where(F.col("__id") != r["__id"])
    spark = cands.sparkSession
    # derive the id field's type from the input so string/non-long ids
    # round-trip (ADVICE r1: schema was hardcoded to long)
    id_type = cands.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        out_rows, f"{id_col} {id_type}, sel_rank int, mmr double"
    )


NCM_Q = 1 << 20


def label_centroids(
    df: DataFrame,
    label: str = "label",
    vec: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label mean embedding in fixed point — the prototype table
    of a nearest-class-mean classifier (the few-shot / data-auditing
    baseline: label quality shows up as prototypes drifting together).
    Input vectors should be QUANTIZED (quantize_vectors) so sums are
    exact integers; centroid component = (sum * NCM_Q) div n — an
    exact integer both engines reproduce. Output long form:
    (label, dim, n, cq).

    Scale: one row-local posexplode + ONE map-side-combined groupBy
    on (label, dim) — dims x labels cells, elements never join.
    """
    e = df.select(
        F.col(label).alias("lbl"),
        F.posexplode(
            F.transform(F.col(vec), lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).withColumn("vi", F.col("v").cast("long"))
    return (
        e.groupBy("lbl", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vi").alias("s"))
        .select(
            F.col("lbl").alias(label), "dim", "n",
            F.expr(f"(s * {NCM_Q}) div n").alias("cq"),
        )
    )


def ncm_classify(
    df: DataFrame,
    centroids: DataFrame,
    label: str = "label",
    vec: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-class-mean classification against a label_centroids
    table: predicted label = argmin squared distance (ties to the
    lexicographically smaller label). Distances are computed in the
    NCM_Q fixed-point domain — (x*Q - cq)^2 sums are exact int64
    (|x| <= 127, dims <= 64 keep terms < 2^55), so the ARGMIN itself
    is oracle-exact, like mmr_rerank's selection.

    Scale: centroids are labels x dims rows (broadcast); scoring is a
    row-local explode + join + two map-side-combined groupBys; the
    per-vector argmin is a 1-row WindowGroupLimit heap.
    """
    from pyspark.sql import Window

    e = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col(vec), lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).withColumn("xq", F.expr(f"cast(v as long) * {NCM_Q}"))
    d2 = (
        e.join(F.broadcast(centroids.withColumnRenamed(label, "lbl")),
               on="dim")
        .groupBy(id_col, "lbl")
        .agg(F.sum(F.expr("(xq - cq) * (xq - cq)")).alias("d2"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("d2").asc(), F.col("lbl").asc()
    )
    return (
        d2.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select(id_col, F.col("lbl").alias("pred"), "d2")
    )


MAXSIM_Q = 1_000_000


def maxsim_topk(
    qtokens: DataFrame,
    dtokens: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    qtok_id: str = "qtok_id",
    doc_id: str = "doc_id",
    vec: str = "embedding",
    q: int = MAXSIM_Q,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia
    2020): score(Q, D) = sum over Q's token vectors of the MAX dot
    product against D's token vectors; top-k documents per query.
    Components quantize to integers (floor(v*q + 0.5)) so dots,
    maxes and sums are int64-exact — bit-reproducible rankings
    under any plan (|dot| must stay < 2^53/dims; q=1e6 over unit
    vectors leaves 3 orders of headroom).

    Scale: the query token set is the small side (a query batch) —
    broadcast; doc tokens stream through ONE broadcast nested-loop
    join, then two map-side-combined hash aggs (max per (query,
    qtok, doc), sum per (query, doc)) and a per-query
    WindowGroupLimit top-k. Doc tokens never self-join; for corpus-
    scale serving, pre-filter candidates with ivf_topk/lsh buckets
    and feed only the shortlist here.
    """
    qz = f"transform(`{vec}`, v -> cast(floor(v * {q}.0e0 + 0.5e0) as bigint))"
    dot = (
        "aggregate(zip_with(__qv, __dv, (x, y) -> x * y),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    qq = qtokens.select(
        query_id, qtok_id, F.expr(qz).alias("__qv")
    )
    dd = dtokens.select(doc_id, F.expr(qz).alias("__dv"))
    pair = dd.join(F.broadcast(qq)).withColumn("__dot", F.expr(dot))
    per_qtok = pair.groupBy(query_id, qtok_id, doc_id).agg(
        F.max("__dot").alias("__m")
    )
    per_doc = per_qtok.groupBy(query_id, doc_id).agg(
        F.sum("__m").alias("score_q"),
        F.count(F.lit(1)).alias("n_qtoks"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score_q").desc(), F.col(doc_id).asc()
    )
    return (
        per_doc.withColumn("sim_rank", F.row_number().over(w))
        .where(F.col("sim_rank") <= int(k))
        .select(query_id, doc_id, "score_q", "n_qtoks", "sim_rank")
    )


EVAL_Q = 1 << 20


def retrieval_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
    rel: str = "rel",
    q: int = EVAL_Q,
) -> DataFrame:
    """Per-query ranking-quality sufficient statistics — MRR and
    nDCG@k (Järvelin & Kekäläinen 2002), the standard readout when
    a retrieval stack (bm25_topk / cosine_topk / maxsim_topk) is
    tuned against judged queries. Integer fixed point throughout:

        rr_q    = q div (first relevant rank), 0 if none
        dcg_q   = sum over judged hits at rank r <= k of
                  (2^rel - 1) * disc_q(r),
        disc_q(r) = floor(q * ln(2)/ln(r+1) + 0.5)
        idcg_q  = same over the query's judgments sorted by
                  (rel DESC, doc_id) at ranks 1..k

    nDCG = dcg_q/idcg_q is left to the caller (one division) so
    every output column stays an exact integer. Output: (query_id,
    n_rel, rr_q, dcg_q, idcg_q).

    Scale: one hash join runs-to-qrels on (query, doc) + two
    map-side-combined aggs; the ideal ranking is a per-query
    WindowGroupLimit over the (small) judgment lists.
    """
    from pdal_spark import sqlgen as G

    kk = int(k)
    qs = G.fnum(float(int(q)))

    def disc(r: str) -> str:
        return (
            f"cast(floor({qs} * {G.fnum(0.6931471805599453)}"
            f" / ln(cast(({r}) + 1 as double))"
            f" + {G.fnum(0.5)}) as bigint)"
        )

    rel_pos = F.col(rel).cast("long") > 0
    hits = runs.join(
        qrels.select(query_id, doc_id,
                     F.col(rel).cast("long").alias("__rel")),
        on=[query_id, doc_id],
    )
    per = hits.groupBy(query_id).agg(
        F.min(F.when(F.col("__rel") > 0, F.col(rank))).alias("__fr"),
        F.sum(
            F.when(
                (F.col(rank) <= kk) & (F.col("__rel") > 0),
                F.expr(
                    f"(shiftleft(1L, cast(__rel as int)) - 1L)"
                    f" * ({disc(rank)})"
                ),
            ).otherwise(F.lit(0))
        ).alias("dcg_q"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__rel").desc(), F.col(doc_id).asc()
    )
    ideal = (
        qrels.select(query_id, doc_id,
                     F.col(rel).cast("long").alias("__rel"))
        .withColumn("__ir", F.row_number().over(w))
        .groupBy(query_id)
        .agg(
            F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
            .alias("n_rel"),
            F.sum(
                F.when(
                    (F.col("__ir") <= kk) & (F.col("__rel") > 0),
                    F.expr(
                        f"(shiftleft(1L, cast(__rel as int)) - 1L)"
                        f" * ({disc('__ir')})"
                    ),
                ).otherwise(F.lit(0))
            ).alias("idcg_q"),
        )
    )
    qi = int(q)
    return (
        ideal.join(per, on=query_id, how="left")
        .select(
            query_id, "n_rel",
            F.expr(f"coalesce({qi}L div __fr, 0L)").alias("rr_q"),
            F.coalesce("dcg_q", F.lit(0)).cast("long")
            .alias("dcg_q"),
            F.col("idcg_q").cast("long"),
        )
    )


def embedding_drift(
    a: DataFrame,
    b: DataFrame,
    group: str,
    vec: str = "embedding",
    q: int = 1_000_000,
) -> DataFrame:
    """Per-group semantic drift between two corpus snapshots: the
    squared distance between the group's mean embeddings, as the
    INTEGER sum of per-dimension quantized deltas

        d_i = floor((s_a_i/n_a - s_b_i/n_b) * q + 0.5)
        drift2_q = sum_i d_i^2

    Components quantize to integers BEFORE any sum (float addition
    is order-sensitive; integer sums are exact under any plan), the
    two divisions and the subtraction act on exact-integer doubles
    (IEEE-identical across engines), and the quantize-then-square
    keeps the final sum integer-exact — the drift RANKING (which
    domains shifted most between crawls) is bit-reproducible.
    Output: (group, n_a, n_b, drift2_q).

    Scale: explode to (group, dim) — 64 rows per doc — then ONE
    map-side-combined agg per side, a dims-sized join, and a
    per-group sum. No pairwise anything. Component sums must stay
    < 2^53 (q=1e6 allows ~9e9 rows per group; lower q for more).
    """
    from pdal_spark import sqlgen as G

    qs0 = G.fnum(float(int(q)))

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(group).alias("g"),
                F.posexplode(vec).alias("dim", "__v"),
            )
            .groupBy("g", "dim")
            .agg(
                F.sum(
                    F.expr(
                        f"cast(floor(cast(__v as double) * {qs0}"
                        f" + {G.fnum(0.5)}) as bigint)"
                    )
                ).alias(f"s_{tag}")
            )
        )
    na = a.groupBy(F.col(group).alias("g")).agg(
        F.count(F.lit(1)).alias("n_a"))
    nb = b.groupBy(F.col(group).alias("g")).agg(
        F.count(F.lit(1)).alias("n_b"))
    sa = side(a, "a")
    sb = side(b, "b")
    # s_* are already in q-units, so the per-dim centroid delta
    # rounds directly to the q grid
    per_dim = (
        sa.join(sb, on=["g", "dim"])
        .join(F.broadcast(na), on="g")
        .join(F.broadcast(nb), on="g")
        .withColumn(
            "__d",
            F.expr(
                "cast(floor(cast(s_a as double) / n_a"
                " - cast(s_b as double) / n_b"
                f" + {G.fnum(0.5)}) as bigint)"
            ),
        )
    )
    return (
        per_dim.groupBy("g")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.sum(F.expr("__d * __d")).alias("drift2_q"),
        )
        .withColumnRenamed("g", group)
    )


def bitext_margin_topk(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019;
    the LASER/CCMatrix bitext miner): a forward nearest-neighbor
    pair (x, y) is scored by its cosine RELATIVE to both sides'
    neighborhood densities,

        margin(x, y) = cos(x, y)
                       / ((avg_kNN_cos(x->tgt) + avg_kNN_cos(y->src)) / 2),

    so hub vectors (high average similarity to everything) stop
    winning on raw cosine. Output: (src_id, tgt_id, cosine, margin,
    sim_rank) for each source vector's k forward neighbors.

    Determinism discipline: cosines are quantized to 1e-9 (the house
    cosine convention — SIMD vs fold summation differs in the last
    ulp), kNN averages use exact decimal(38,15) sums of the
    quantized values, and the margin is a fixed IEEE chain over
    those — hash-exact across engines.

    Scale: two cosine_topk passes (broadcast-query batched matmul,
    partial top-k per partition — O(partitions*k) shuffle per
    query), two tiny k-row-per-vector aggregations, two hash joins
    keyed on vector ids. Nothing quadratic leaves an executor; for
    corpus-scale mining swap cosine_topk for ivf_topk candidates,
    the margin algebra is unchanged.
    """
    f = cosine_topk(src, tgt, k=k, vec=vec, id_col=id_col).select(
        "query_id", "nb_id",
        F.round("cosine", 9).alias("c9"), "sim_rank",
    )
    b = cosine_topk(tgt, src, k=k, vec=vec, id_col=id_col).select(
        "query_id", F.round("cosine", 9).alias("c9"),
    )

    def _avg9(df, out):
        return df.groupBy("query_id").agg(
            F.round(
                F.sum(F.col("c9").cast("decimal(38,15)"))
                .cast("double") / F.count(F.lit(1)),
                9,
            ).alias(out)
        )

    favg = _avg9(f, "knn_src")
    bavg = _avg9(b, "knn_tgt").withColumnRenamed(
        "query_id", "nb_id"
    )
    j = f.join(favg, "query_id").join(bavg, "nb_id")
    margin = F.col("c9") / (
        (F.col("knn_src") + F.col("knn_tgt")) / F.lit(2.0)
    )
    return j.select(
        F.col("query_id").alias("src_id"),
        F.col("nb_id").alias("tgt_id"),
        F.col("c9").alias("cosine"),
        F.round(margin, 6).alias("margin"),
        "sim_rank",
    )


def knn_predict(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
    label: str = "label",
) -> DataFrame:
    """kNN mean-label prediction over embeddings — weak-label
    propagation / quality-score imputation (predict an unlabeled
    vector's score as the mean label of its k cosine neighbors; the
    regression twin of ncm_classify). Output: (query_id, n_nb,
    sum_label, pred) with pred = sum_label / n_nb — one exact
    integer sum and ONE IEEE division, so the prediction is
    hash-exact with no rounding discipline needed.

    Scale: one cosine_topk pass (broadcast-query batched matmul,
    O(partitions*k) shuffle per query) + one hash join on the
    neighbor id + one k-row-per-query agg. Swap in ivf_topk
    candidates at corpus scale, unchanged algebra.
    """
    nn = cosine_topk(queries, corpus, k=k, vec=vec, id_col=id_col)
    lab = corpus.select(
        F.col(id_col).alias("nb_id"),
        F.col(label).cast("long").alias("__l"),
    )
    j = nn.join(lab, on="nb_id")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_nb"),
        F.sum("__l").alias("sum_label"),
    ).select(
        "query_id", "n_nb", "sum_label",
        (F.col("sum_label").cast("double")
         / F.col("n_nb").cast("double")).alias("pred"),
    )


RBO_Q = 1 << 30


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
    q: int = RBO_Q,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two top-k
    rankings per query — THE comparator when two retrieval stacks
    (bm25_topk vs cosine_topk vs maxsim_topk) disagree: top-weighted,
    handles non-conjoint lists. Truncated form:

        RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d.

    A doc at ranks (ra, rb) in both lists contributes to every depth
    d >= max(ra, rb), so its weight is the SUFFIX SUM
    S[m] = sum_{d=m..k} p^(d-1)/d — precomputed in Python, quantized
    to integers, and baked as a literal lookup array: both engines
    sum IDENTICAL integers (no per-row float pow), rbo_q is
    hash-exact. RBO = (1-p) * rbo_q / q, one caller-side division.

    Output: (query_id, n_common, rbo_q).

    Scale: one hash join on (query, doc) over rank<=k rows (k rows
    per query per side), one small agg. Corpus-free.
    """
    import math

    kk = int(k)
    suf = [0.0] * (kk + 2)
    for m in range(kk, 0, -1):
        suf[m] = suf[m + 1] + (float(p) ** (m - 1)) / m
    lits = [int(math.floor(s * int(q) + 0.5)) for s in suf[1:kk + 1]]

    def side(df, rk):
        return df.where(F.col(rank) <= kk).select(
            F.col(query_id).alias("__q"),
            F.col(doc_id).alias("__d"),
            F.col(rank).cast("int").alias(rk),
        )

    j = side(run_a, "__ra").join(side(run_b, "__rb"),
                                 on=["__q", "__d"])
    arr = F.array(*[F.lit(v) for v in lits])
    contrib = F.element_at(
        arr, F.greatest("__ra", "__rb")
    ).cast("long")
    return (
        j.select("__q", contrib.alias("__c"))
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("__c").alias("rbo_q"),
        )
        .withColumnRenamed("__q", query_id)
    )


def jl_projection(
    df: DataFrame,
    out_dim: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with HASH-DERIVED
    +-1 signs (Achlioptas 2003): y_k = sum_d sign(h(d, k)) * v_d /
    sqrt(out_dim) — dimensionality reduction for ANN prefiltering
    and cheap distance sketches that needs NO training pass and NO
    driver-computed components (vs :func:`pca_project`): the sign
    matrix derives from sqlgen.mix_hash parity, so the projection is
    a pure function of (d, k) reproducible everywhere — including
    the SQL oracle.

    Exactness: the per-dim fold runs in FIXED left-to-right order on
    both engines (Spark aggregate() lambda fold == the unrolled
    left-associative sum), so outputs are bit-identical doubles with
    no rounding.

    Scale: fully ROW-LOCAL (out_dim x dims multiply-adds per row,
    zero shuffle) — the lsh_signature plan shape.
    """
    v = F.transform(F.col(vec), lambda c: c.cast("double"))
    inv = 1.0 / math.sqrt(float(out_dim))
    cols = []
    for k in range(int(out_dim)):
        signs = F.array(*[
            F.lit(float(jl_sign(d, k)) * inv)
            for d in range(int(dims))
        ])
        cols.append(
            F.aggregate(
                F.zip_with(v, signs, lambda a, b: a * b),
                F.lit(0.0), lambda acc, t: acc + t,
            ).alias(f"j{k}")
        )
    return df.select(F.col(id_col), *cols)


def jl_sign(d: int, k: int) -> int:
    """+-1 sign for (input dim d, output dim k): mix_hash parity,
    evaluated in PYTHON so Spark literals and oracle SQL agree by
    construction."""
    M31 = (1 << 31) - 1
    x = (d * 131 + k + 7) % M31
    x = (((x + 7) * 48271) % M31 * 48271) % M31
    x = (x * x) % M31
    x = ((x + 7) * 48271) % M31
    return 1 if x % 2 == 0 else -1


QLM_Q = 1_000_000_000


def qlm_topk(
    docs_tokens: DataFrame,
    terms: list[str],
    k: int = 10,
    mu: int = 2000,
    doc_id: str = "doc_id",
    word: str = "word",
) -> DataFrame:
    """Query-likelihood language-model retrieval with Dirichlet
    smoothing (Ponte & Croft 1998; Zhai & Lafferty 2001) — the
    probabilistic ranking next to bm25_topk's Okapi scoring:

        score(d) = sum_t ln( (c_td + mu * ctf_t / |C|)
                             / (dl_d + mu) )

    over ALL query terms (absent terms contribute the smoothing
    floor — that is what distinguishes QLM from a tf-only sum).
    Input: an exploded (doc_id, word) token table.

    Each term's log quantizes to integer nano-units
    (floor(round(ln(ratio-of-exact-ints), 9) * 1e9 + 0.5) — the
    repo's ln convention), so the per-doc sum over the BOUNDED query
    term set is exact int64 and rank ties break on doc_id.

    Scale: ONE pass builds postings + doc lengths; the docs x terms
    frame is |docs| * |q| rows with the tiny term/ctf tables
    broadcast; top-k is one ordered limit.
    """
    from pdal_spark import sqlgen as G

    t = docs_tokens.select(
        F.col(doc_id).alias("d"), F.col(word).alias("w")
    )
    dl = t.groupBy("d").agg(F.count(F.lit(1)).alias("dl"))
    tot = t.agg(F.count(F.lit(1)).alias("ctot"))
    term_df = docs_tokens.sparkSession.createDataFrame(
        [(w,) for w in terms], "w string"
    )
    ctf = (
        t.join(F.broadcast(term_df), on="w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ctf"))
        .join(F.broadcast(term_df), on="w", how="right")
        .select("w", F.coalesce("ctf", F.lit(0)).alias("ctf"))
    )
    post = (
        t.join(F.broadcast(term_df), on="w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    full = (
        dl.crossJoin(F.broadcast(ctf))
        .join(post, on=["d", "w"], how="left")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.coalesce("tf", F.lit(0)).alias("c"),
            "ctf", "dl", "ctot",
        )
    )
    mu_i = int(mu)
    lnq = (
        "cast(floor(round(ln("
        "(cast(c as double) * cast(ctot as double)"
        f" + {G.fnum(float(mu_i))} * cast(ctf as double))"
        f" / ((cast(dl as double) + {G.fnum(float(mu_i))})"
        " * cast(ctot as double))"
        f"), 9) * {G.fnum(float(QLM_Q))} + {G.fnum(0.5)}) as bigint)"
    )
    sc = full.where(
        # a term with ctf = 0 AND c = 0 has ln(0): drop that term's
        # contribution (a corpus-absent query term ranks nothing)
        (F.col("c") > 0) | (F.col("ctf") > 0)
    ).groupBy("d").agg(F.sum(F.expr(lnq)).alias("score_q"))
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("score_q").desc(), F.col("d").asc())
    return (
        sc.select(
            F.col("d").alias(doc_id), "score_q",
            F.row_number().over(w_rank).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= int(k))
    )


RUZ_Q = 1 << 20


def ruzicka_join(
    df: DataFrame,
    entity: str,
    dim: str,
    weight: str,
    min_sim_q: int = 0,
) -> DataFrame:
    """Weighted-Jaccard (Ruzicka) similarity self-join over sparse
    non-negative count/weight profiles (histogram overlap between
    domains' topic mixes, users' item counts — the weighted upgrade
    of allpairs_jaccard's set semantics):

        sim(A, B) = sum_d min(a_d, b_d) / sum_d max(a_d, b_d)

    re-expressed so only SHARED dimensions join: sum max = totA +
    totB - sum_shared min. Pairs with no shared dimension score 0
    and are never generated — the candidate join is LOSSLESS above
    any positive threshold. Exact int64; sim quantized to 2^-20.
    Output: (ea, eb, sum_min, sum_max, sim_q) for ea < eb with
    sim_q >= min_sim_q.

    Scale: one totals agg + one shared-dim equi-join (fan-out =
    dim co-occurrence, the inverted-index shape) + one pair agg.
    """
    base = df.select(
        F.col(entity).alias("e"), F.col(dim).alias("d"),
        F.col(weight).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    tot = base.groupBy("e").agg(F.sum("w").alias("t"))
    a = base.select(F.col("e").alias("ea"), "d",
                    F.col("w").alias("wa"))
    b = base.select(F.col("e").alias("eb"), "d",
                    F.col("w").alias("wb"))
    shared = (
        a.join(b, on="d")
        .where(F.col("ea") < F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.sum(F.expr("least(wa, wb)")).alias("sum_min"))
    )
    j = (
        shared.join(tot.select(F.col("e").alias("ea"),
                               F.col("t").alias("ta")), on="ea")
        .join(tot.select(F.col("e").alias("eb"),
                         F.col("t").alias("tb")), on="eb")
        .select(
            "ea", "eb", "sum_min",
            F.expr("ta + tb - sum_min").alias("sum_max"),
        )
        .select(
            "ea", "eb", "sum_min", "sum_max",
            F.expr(
                f"(sum_min * cast({RUZ_Q} as bigint))"
                " div sum_max"
            ).alias("sim_q"),
        )
    )
    return j.where(F.col("sim_q") >= int(min_sim_q))


def sparse_cosine_join(
    df: DataFrame,
    entity: str,
    dim: str,
    weight: str,
    min_cos_1e6: int = 0,
) -> DataFrame:
    """Exact cosine similarity self-join over sparse integer count
    vectors (bag-of-words/item profiles — the COUNT-weighted member
    of the similarity-join family between allpairs_jaccard's sets
    and the dense-embedding cosine_topk):

        cos(A, B) = dot / sqrt(na2 * nb2)

    dot and the squared norms are exact int64; pairs sharing no
    dimension have cos 0 and are never generated (lossless above
    any positive threshold). cos emits both as a raw IEEE chain
    and floored to 1e-6 units for exact thresholding. Output:
    (ea, eb, dot, na2, nb2, cos_q) with cos_q >= min_cos_1e6.

    Scale: identical inverted-index plan to ruzicka_join.
    """
    base = df.select(
        F.col(entity).alias("e"), F.col(dim).alias("d"),
        F.col(weight).cast("long").alias("w"),
    ).where(F.col("w") != 0)
    norms = base.groupBy("e").agg(
        F.sum(F.expr("w * w")).alias("n2")
    )
    a = base.select(F.col("e").alias("ea"), "d",
                    F.col("w").alias("wa"))
    b = base.select(F.col("e").alias("eb"), "d",
                    F.col("w").alias("wb"))
    dots = (
        a.join(b, on="d")
        .where(F.col("ea") < F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.sum(F.expr("wa * wb")).alias("dot"))
    )
    j = (
        dots.join(norms.select(F.col("e").alias("ea"),
                               F.col("n2").alias("na2")), on="ea")
        .join(norms.select(F.col("e").alias("eb"),
                           F.col("n2").alias("nb2")), on="eb")
        .select(
            "ea", "eb", "dot", "na2", "nb2",
            F.expr(
                "cast(floor(cast(dot as double)"
                " / sqrt(cast(na2 as double)"
                " * cast(nb2 as double))"
                " * 1000000.0e0 + 0.5e0) as bigint)"
            ).alias("cos_q"),
        )
    )
    return j.where(F.col("cos_q") >= int(min_cos_1e6))


RBP_Q = 1 << 30


def rbp_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    p_num: int = 4,
    p_den: int = 5,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
    rel: str = "rel",
) -> DataFrame:
    """Rank-biased precision at persistence p = p_num/p_den
    (Moffat & Zobel 2008) — the top-weighted IR metric that, unlike
    nDCG, models an impatient user directly:

        RBP = (1 - p) * sum_r p^(r-1) * rel_r     [binary rel]

    Each rank's weight p^(r-1) is the exact rational
    p_num^(r-1)/p_den^(r-1); terms quantize as (rel * p_num^(r-1)
    * Q) div p_den^(r-1) — exact int64 for k <= ~12 at the 4/5
    default. Output per query: (query_id, n_ranked, rbp_q, rbp).

    Scale: one candidate join + ONE query agg; weights fold at
    plan build.
    """
    q = RBP_Q
    kk = int(k)
    j = (
        runs.select(
            F.col(query_id).alias("qid"),
            F.col(doc_id).alias("did"),
            F.col(rank).cast("long").alias("r"),
        )
        .where(F.col("r") <= kk)
        .join(
            qrels.select(
                F.col(query_id).alias("qid"),
                F.col(doc_id).alias("did"),
                F.col(rel).cast("long").alias("rl"),
            ),
            on=["qid", "did"],
            how="left",
        )
        .select(
            "qid", "r",
            F.expr(
                "case when rl is not null and rl > 0 then 1"
                " else 0 end"
            ).alias("b"),
        )
    )
    cases = " ".join(
        f"when r = {r} then cast(b as bigint)"
        f" * cast({int(p_num) ** (r - 1)} as bigint)"
        f" * cast({q} as bigint)"
        f" div cast({int(p_den) ** (r - 1)} as bigint)"
        for r in range(1, kk + 1)
    )
    term = f"case {cases} else cast(0 as bigint) end"
    agg = j.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(F.expr(term)).alias("w_q"),
    )
    one_minus_p = float(1 - int(p_num) / int(p_den))
    return agg.select(
        F.col("qid").alias(query_id), "n_ranked",
        F.col("w_q").alias("rbp_q"),
        F.expr(
            f"cast(w_q as double) / {float(q)!r}e0"
            f" * {one_minus_p!r}e0"
        ).alias("rbp"),
    )


def judged_at_k(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
) -> DataFrame:
    """Judgment coverage at k (the pool-bias QA every offline IR
    eval needs BEFORE trusting nDCG/RBP: how many of the top-k
    retrieved docs have ANY judgment?). Output per query:
    (query_id, n_ranked, n_judged, coverage).

    Scale: one left join + one agg.
    """
    kk = int(k)
    j = (
        runs.select(
            F.col(query_id).alias("qid"),
            F.col(doc_id).alias("did"),
            F.col(rank).cast("long").alias("r"),
        )
        .where(F.col("r") <= kk)
        .join(
            qrels.select(
                F.col(query_id).alias("qid"),
                F.col(doc_id).alias("did"),
                F.lit(1).alias("j"),
            ).distinct(),
            on=["qid", "did"],
            how="left",
        )
    )
    agg = j.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(F.expr("case when j is not null then 1 else 0 end"))
        .cast("long").alias("n_judged"),
    )
    return agg.select(
        F.col("qid").alias(query_id), "n_ranked", "n_judged",
        F.expr(
            "case when n_ranked > 0 then"
            " cast(n_judged as double)"
            " / cast(n_ranked as double) end"
        ).alias("coverage"),
    )


AP_Q = 1 << 20


def average_precision(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
    rel: str = "rel",
) -> DataFrame:
    """Exact average precision at k per query (the MAP component —
    the area under the precision-recall staircase rbp/nDCG
    approximate differently):

        AP = sum over relevant ranks r of (tp@r / r) / n_rel

    Each precision-at-hit quantizes as (tp * Q) div r (exact
    int64 fold); the division by the query's TOTAL relevant count
    closes it. Output per query: (query_id, n_rel, n_hits, ap_q,
    ap).

    Scale: one candidate join + one rank-ordered prefix window
    per query + one agg.
    """
    q = AP_Q
    kk = int(k)
    j = (
        runs.select(
            F.col(query_id).alias("qid"),
            F.col(doc_id).alias("did"),
            F.col(rank).cast("long").alias("r"),
        )
        .where(F.col("r") <= kk)
        .join(
            qrels.select(
                F.col(query_id).alias("qid"),
                F.col(doc_id).alias("did"),
                F.col(rel).cast("long").alias("rl"),
            ),
            on=["qid", "did"],
            how="left",
        )
        .select(
            "qid", "r",
            F.expr(
                "case when rl is not null and rl > 0 then 1"
                " else 0 end"
            ).cast("long").alias("b"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("r").asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tp = j.withColumn("tp", F.sum("b").over(w))
    n_rel = qrels.select(
        F.col(query_id).alias("qid"),
        F.col(doc_id).alias("did"),
        F.col(rel).cast("long").alias("rl"),
    ).where(F.col("rl") > 0).groupBy("qid").agg(
        F.countDistinct("did").cast("long").alias("n_rel")
    )
    agg = tp.groupBy("qid").agg(
        F.sum("b").alias("n_hits"),
        F.sum(
            F.expr(
                f"case when b = 1 then (tp * cast({q} as bigint))"
                " div r else cast(0 as bigint) end"
            )
        ).alias("ap_q"),
    )
    out = agg.join(n_rel, on="qid", how="left").select(
        "qid",
        F.expr("coalesce(n_rel, cast(0 as bigint))")
        .alias("n_rel"),
        "n_hits", "ap_q",
    )
    return out.select(
        F.col("qid").alias(query_id), "n_rel", "n_hits", "ap_q",
        F.expr(
            "case when n_rel > 0 then cast(ap_q as double)"
            f" / ({float(q)!r}e0 * cast(n_rel as double)) end"
        ).alias("ap"),
    )


def recall_at_k(
    runs: DataFrame,
    qrels: DataFrame,
    ks: list[int] | None = None,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank: str = "rank",
    rel: str = "rel",
) -> DataFrame:
    """Recall@k ladder per query (the coverage complement of
    precision-flavored rbp/AP). Exact hit counts against the
    query's total relevant set. Output per (query, k): (query_id,
    k, n_rel, n_hits, recall).

    Scale: one candidate join + a |ks| explode + one agg.
    """
    kl = sorted(int(x) for x in (ks or [1, 5, 10]))
    j = (
        runs.select(
            F.col(query_id).alias("qid"),
            F.col(doc_id).alias("did"),
            F.col(rank).cast("long").alias("r"),
        )
        .join(
            qrels.select(
                F.col(query_id).alias("qid"),
                F.col(doc_id).alias("did"),
                F.col(rel).cast("long").alias("rl"),
            ).where(F.col("rl") > 0).distinct(),
            on=["qid", "did"],
        )
    )
    ladder = j.select(
        "qid", "r",
        F.explode(F.array(*[F.lit(x) for x in kl])).alias("k"),
    ).where(F.col("r") <= F.col("k"))
    hits = ladder.groupBy("qid", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    n_rel = qrels.select(
        F.col(query_id).alias("qid"),
        F.col(doc_id).alias("did"),
        F.col(rel).cast("long").alias("rl"),
    ).where(F.col("rl") > 0).groupBy("qid").agg(
        F.countDistinct("did").cast("long").alias("n_rel")
    )
    return hits.join(n_rel, on="qid").select(
        F.col("qid").alias(query_id),
        F.col("k").cast("long").alias("k"),
        "n_rel", "n_hits",
        F.expr(
            "case when n_rel > 0 then cast(n_hits as double)"
            " / cast(n_rel as double) end"
        ).alias("recall"),
    )
