"""Link-graph analytics over the domain graph: exact triangle
counting / local clustering coefficients (degree-ordered orientation
— the MapReduce-era standard for bounding wedge skew), fixed-round
k-core peeling, and integer-exact HITS hubs/authorities.

These sit next to `textops.domain_authority` (integer PageRank) and
`cluster`'s large-star/small-star connected components: together they
are the web-graph quality-signal suite a corpus pipeline joins back
onto pages (spam rings are dense triangles/cores; HITS separates
directories from content hubs).

Reference parity: PDAL has no graph stages; these derive from the
public web-graph literature (Suri & Vassilvitskii 2011 "Counting
triangles and the curse of the last reducer"; Kleinberg 1999 HITS;
Matula & Beck 1983 k-core peeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

LCC_Q = 10**6  # local-clustering-coefficient fixed-point scale


def _canonical_edges(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """Simple undirected edge set as (lo < hi) pairs: self-loops
    dropped, direction and duplicates collapsed."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over the undirected simple graph. Output: (node, degree,
    triangles, lcc_q) where lcc_q = 2*T*10^6 div (d*(d-1)) — the
    fixed-point LCC (0 for degree < 2), integer-exact so results
    hash-compare across engines and partitionings.

    Scale (Suri & Vassilvitskii 2011): edges are ORIENTED from the
    lower-(degree, id) endpoint to the higher, so every triangle is
    enumerated exactly once from its lowest-rank vertex and — the
    point — a hot node of degree d contributes wedges only from its
    out-neighborhood, which orientation bounds by O(sqrt(|E|)): the
    celebrity node's d^2 wedge explosion (the "last reducer") never
    happens. Two shuffle joins total (wedge build on the pivot,
    closure probe on the oriented pair), both plain hash equi-joins
    AQE can skew-split; per-vertex counts are one explode (x3) +
    map-side-combined groupBy.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    ranked = (
        e.join(deg.withColumnRenamed("node", "lo")
                  .withColumnRenamed("degree", "dlo"), on="lo")
        .join(deg.withColumnRenamed("node", "hi")
                 .withColumnRenamed("degree", "dhi"), on="hi")
    )
    # orient low-rank -> high-rank, rank = (degree, id)
    oe = ranked.select(
        F.when(
            F.struct("dlo", "lo") < F.struct("dhi", "hi"),
            F.struct(
                F.col("lo").alias("a"),
                F.col("hi").alias("b"),
                F.col("dhi").alias("db"),
            ),
        )
        .otherwise(
            F.struct(
                F.col("hi").alias("a"),
                F.col("lo").alias("b"),
                F.col("dlo").alias("db"),
            )
        )
        .alias("o")
    ).select("o.a", "o.b", "o.db")
    l = oe.select(
        F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1")
    )
    r = oe.select(
        F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2")
    )
    wedges = l.join(r, on="a").where(
        F.struct("db1", "b1") < F.struct("db2", "b2")
    )
    closing = oe.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing, on=["b1", "b2"]).select(
        F.col("a").alias("x"), F.col("b1").alias("y"),
        F.col("b2").alias("z"),
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, on="node", how="left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long")
            .alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    f"(2 * coalesce(triangles, 0) * {LCC_Q}) div "
                    "(degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_q"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core membership by iterative peeling (Matula & Beck 1983):
    repeatedly drop nodes with degree < k from the induced subgraph.
    Output: (node, core_degree) for survivors after `rounds` peels —
    with `rounds` >= the peel depth this IS the exact k-core (each
    round only removes; a round that removes nothing is a fixpoint).
    Fixed `rounds` (not a driver-side convergence test) keeps the
    computation a static plan both engines replay identically.

    Scale: each round is one degree aggregation + two semi-joins
    (edges restricted to surviving endpoints) — all key-partitioned;
    the node list shrinks monotonically. Peel depth on power-law web
    graphs is small (the degeneracy ordering flattens fast);
    `rounds` is the explicit budget, checked by the fixpoint pytest.
    Lineage is cut with localCheckpoint each round (the repo-wide
    iterative pattern, see operators/cluster.py): each round
    references `e` three times, so an uncut plan grows 3^rounds.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    for _ in range(int(rounds)):
        alive = _degrees(e).where(F.col("degree") >= int(k)) \
            .select("node")
        e = (
            e.join(alive.withColumnRenamed("node", "lo"),
                   on="lo", how="leftsemi")
            .join(alive.withColumnRenamed("node", "hi"),
                  on="hi", how="leftsemi")
        ).localCheckpoint(eager=False)
    return (
        _degrees(e)
        .where(F.col("degree") >= int(k))
        .select("node", F.col("degree").alias("core_degree"))
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the DIRECTED link
    graph, integer-exact: scores start at `scale`; each iteration
    computes a(v) = sum of h over in-edges then renormalizes by the
    global max back to <= scale (a*scale div max_a), then h(u) = sum
    of a over out-edges, same renorm. All int64 with truncating div
    — bit-reproducible under any partitioning, unlike the float
    L2-normalized textbook form. Output: (node, hub, auth).

    Scale: per iteration two edge->score joins (shuffle on the score
    key) + two map-side-combined sums; the renorm max is a 1-row agg
    broadcast into the projection. Same join pattern as integer
    PageRank (textops.domain_authority), which AQE skew-handles.
    Score lineage is cut per iteration with localCheckpoint so the
    plan stays O(1) in `iters` (see operators/cluster.py).
    """
    e = (
        edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = nodes.select(
        "node",
        F.lit(int(scale)).cast("long").alias("hub"),
        F.lit(int(scale)).cast("long").alias("auth"),
    )
    for _ in range(int(iters)):
        a_raw = (
            e.join(s.select(F.col("node").alias("src"), "hub"),
                   on="src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_max = a_raw.agg(
            F.greatest(F.max("a_raw"), F.lit(1).cast("long"))
            .alias("a_mx")
        )
        auth = a_raw.crossJoin(F.broadcast(a_max)).select(
            "node",
            F.expr(f"(a_raw * {int(scale)}) div a_mx").alias("auth"),
        )
        s_a = (
            nodes.join(auth, on="node", how="left")
            .select(
                "node",
                F.coalesce("auth", F.lit(0).cast("long"))
                .alias("auth"),
            )
        )
        h_raw = (
            e.join(s_a.select(F.col("node").alias("dst"), "auth"),
                   on="dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        h_max = h_raw.agg(
            F.greatest(F.max("h_raw"), F.lit(1).cast("long"))
            .alias("h_mx")
        )
        hub = h_raw.crossJoin(F.broadcast(h_max)).select(
            "node",
            F.expr(f"(h_raw * {int(scale)}) div h_mx").alias("hub"),
        )
        s = (
            nodes.join(hub, on="node", how="left")
            .join(s_a, on="node")
            .select(
                "node",
                F.coalesce("hub", F.lit(0).cast("long"))
                .alias("hub"),
                "auth",
            )
        ).localCheckpoint(eager=False)
    return s.select("node", "hub", "auth")


AA_Q = 10**6  # Adamic-Adar fixed-point scale (term = AA_Q div-ish / ln d)


def adamic_adar(
    edges: DataFrame,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected simple graph:
    for every NON-adjacent pair (u < w) sharing >= 1 common neighbor,
    cn = common-neighbor count and aa_q = sum over common neighbors v
    of floor(AA_Q / ln(deg(v))) — the integer fixed-point AA score
    (Adamic & Adar 2003), exact under any partitioning. Output:
    (u, w, cn, aa_q).

    Scale: a common-neighbor pipeline is inherently a wedge
    enumeration — a center of degree d emits d*(d-1)/2 pairs. Unlike
    triangle counting there is no orientation trick that preserves
    the score, but AA has a principled cap instead: a hub's term
    1/ln(d) tends to 0, so `max_degree` drops super-hub CENTERS
    (their pairs, not their own scores) with a bounded score error
    < AA_Q/ln(max_degree) per dropped wedge — the standard
    production lever. With it set, fan-out is <= max_degree^2 per
    center; the remaining plan is one self-join on the center + one
    broadcast-able anti-join against the edge set + one map-side-
    combined groupBy.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    adj = (
        e.select(F.col("lo").alias("v"), F.col("hi").alias("n"))
        .unionByName(
            e.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
        )
    )
    centers = adj.join(deg.withColumnRenamed("node", "v"), on="v")
    if max_degree is not None:
        centers = centers.where(F.col("degree") <= int(max_degree))
    l = centers.select("v", F.col("n").alias("u"), "degree")
    r = centers.select("v", F.col("n").alias("w"))
    pairs = l.join(r, on="v").where(F.col("u") < F.col("w"))
    open_pairs = pairs.join(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("w")),
        on=["u", "w"],
        how="left_anti",
    )
    return (
        open_pairs.select(
            "u", "w",
            F.expr(
                f"cast(floor({G.fnum(float(AA_Q))} /"
                " ln(cast(degree as double))) as bigint)"
            ).alias("term_q"),
        )
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("term_q").alias("aa_q"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    iters: int = 3,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank from a seed set over the DIRECTED graph
    — the crawl-frontier prioritizer (rank URLs by proximity to a
    trusted seed list, cf. TrustRank): identical integer scheme to
    textops.domain_authority except the teleport mass returns ONLY
    to the seeds. r0 = scale on seeds, 0 elsewhere; each iteration
    r(v) = [v in seeds] * teleport + sum over in-edges (u,v) of
    (r(u) * 85) div (100 * outdeg(u)). All int64 truncating
    arithmetic — bit-reproducible under any partitioning. Output:
    (node, ppr) for all nodes.

    Scale: per iteration one ranks-to-edges join (shuffle on src) +
    one map-side-combined sum on dst; the seed list is a broadcast
    literal IN-list (seed sets are small by definition). Lineage cut
    per iteration.
    """
    e = (
        edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed_set = sorted({int(s) for s in seeds})
    is_seed = F.col("node").isin(seed_set)
    teleport = (int(scale) * (damping_den - damping_num)) // damping_den
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(int(scale)))
        .otherwise(F.lit(0)).cast("long").alias("r"),
    )
    ed = e.join(deg, on="src")
    for _ in range(int(iters)):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("src"), "r"),
                    on="src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(r * {int(damping_num)})"
                    f" div (cast({int(damping_den)} as bigint) * d)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.when(is_seed, F.lit(int(teleport)))
                    .otherwise(F.lit(0)).cast("long")
                    + F.coalesce(F.col("in_r"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("ppr"))


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic synchronous label propagation communities
    (Raghavan 2007 made reproducible): labels start as node ids;
    each round every node adopts the most frequent label among its
    neighbors, ties broken by SMALLEST label — a total order, so the
    result is exact and partitioning-invariant (classic LPA breaks
    ties randomly and is not). Fixed `rounds` keeps the plan static
    for cross-engine replay. Output: (node, community).

    Scale: per round one adjacency-to-labels join (shuffle on the
    label key) + one (node,label) count + one per-node 1-row
    WindowGroupLimit argmax — the same shuffle profile as one
    PageRank iteration plus a k=1 top-k that pushes below the sort.
    Lineage cut per round.
    """
    from pyspark.sql import Window

    e = _canonical_edges(edges, src, dst)
    adj = (
        e.select(F.col("lo").alias("node"), F.col("hi").alias("nb"))
        .unionByName(
            e.select(F.col("hi").alias("node"), F.col("lo").alias("nb"))
        )
        .localCheckpoint(eager=False)
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("lbl").asc()
    )
    for _ in range(int(rounds)):
        votes = (
            adj.join(labels.select(F.col("node").alias("nb"), "lbl"),
                     on="nb")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def bfs_levels(
    edges: DataFrame,
    seeds: list[int],
    max_depth: int = 4,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """BFS shortest-hop levels from a seed set — crawl-depth /
    link-distance labeling (every production crawler tags pages with
    hops-from-seed; cf. the breadth-first crawl ordering of Najork &
    Wiener 2001). Level 0 = seeds; level i = first reached in round
    i; nodes not reached within `max_depth` are absent. Output:
    (node, level) — exact set semantics, partitioning-invariant.

    Scale: per round one frontier-to-adjacency join (the frontier
    only — not the visited set — drives the join) + one anti-join
    against visited; frontier and visited ride as localCheckpoints.
    Fixed `max_depth` keeps the plan static; web graphs reach ~90%
    of crawlable nodes within a handful of hops.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .where(F.col("a") != F.col("b")).distinct()
    adj = e if directed else e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    adj = adj.localCheckpoint(eager=False)
    nodes = (
        adj.select(F.col("a").alias("node"))
        .unionByName(adj.select(F.col("b").alias("node")))
        .distinct()
    )
    seed_set = sorted({int(s) for s in seeds})
    frontier = nodes.where(F.col("node").isin(seed_set)) \
        .localCheckpoint(eager=False)
    visited = frontier.select("node", F.lit(0).alias("level"))
    for i in range(1, int(max_depth) + 1):
        reached = (
            adj.join(frontier.withColumnRenamed("node", "a"), on="a")
            .select(F.col("b").alias("node"))
            .distinct()
        )
        frontier = reached.join(
            visited.select("node"), on="node", how="left_anti"
        ).localCheckpoint(eager=False)
        visited = visited.unionByName(
            frontier.select("node", F.lit(i).alias("level"))
        ).localCheckpoint(eager=False)
    return visited.select("node", F.col("level").cast("int").alias("level"))


RW_MIX = 1000003  # walk-step hash stride


def random_walks(
    edges: DataFrame,
    steps: int = 4,
    n_walks: int = 1,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic random-walk corpus generation (the DeepWalk /
    node2vec training-data generator, Perozzi 2014): `n_walks` walks
    of up to `steps` hops start at every node; at step s the walk at
    walk_id w picks sorted-neighbor index mix_hash(w * RW_MIX + s)
    mod outdeg — a hash-derived choice, so the walk corpus is
    bit-reproducible under any partitioning/replay (RNG-state walks
    are not) while remaining uniform per step. Walks stop early at
    dead ends. Output: (walk_id, step, node) with step 0 = start;
    walk_id = node * n_walks + w.

    Scale: adjacency folds once into sorted neighbor ARRAYS (one
    groupBy — the adjacency-list representation); each step is ONE
    join of the frontier against it plus a row-local element_at
    pick. Hot nodes are ordinary skewed join keys (AQE skew split);
    walk state is (walk_id, node) only. Lineage cut per step.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .where(F.col("a") != F.col("b")).distinct()
    adj_e = e if directed else e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    adj = (
        adj_e.groupBy("a")
        .agg(F.sort_array(F.collect_set("b")).alias("nbrs"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        adj_e.select(F.col("a").alias("node"))
        .unionByName(adj_e.select(F.col("b").alias("node")))
        .distinct()
    )
    nw = int(n_walks)
    cur = nodes.select(
        F.explode(F.sequence(F.lit(0), F.lit(nw - 1))).alias("w"),
        F.col("node"),
    ).select(
        (F.col("node") * nw + F.col("w")).alias("walk_id"),
        F.col("node"),
    ).localCheckpoint(eager=False)
    out = cur.select("walk_id", F.lit(0).alias("step"), "node")
    for s in range(1, int(steps) + 1):
        stepped = (
            cur.join(adj.withColumnRenamed("a", "node"), on="node")
            .select(
                "walk_id",
                F.element_at(
                    F.col("nbrs"),
                    (
                        F.expr(
                            f"({G.mix_hash(f'(walk_id * {RW_MIX} + {s})')})"
                            " % size(nbrs)"
                        ) + 1
                    ).cast("int"),
                ).alias("node"),
            )
        )
        cur = stepped.localCheckpoint(eager=False)
        out = out.unionByName(
            cur.select("walk_id", F.lit(s).alias("step"), "node")
        )
    return out.select(
        "walk_id", F.col("step").cast("int").alias("step"), "node"
    )


JACC_Q = 1 << 20  # neighborhood-Jaccard fixed point


def neighbor_jaccard(
    edges: DataFrame,
    max_degree: int | None = None,
    include_adjacent: bool = False,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Neighborhood-Jaccard link prediction / structural similarity
    (Liben-Nowell & Kleinberg 2003's common-neighbors family,
    normalized): for every non-adjacent pair (u < w) sharing >= 1
    common neighbor, jacc_q = (cn * JACC_Q) div (deg u + deg w - cn)
    — exact integer ratio, partitioning-invariant. The related-page /
    mirror-site discovery signal next to adamic_adar (which weights
    rare hubs; Jaccard instead normalizes by neighborhood size).
    `include_adjacent=True` keeps connected pairs too (structural
    edge strength, Jaccard counts only OTHER shared neighbors —
    SimRank-lite).

    Scale: identical wedge shape to adamic_adar — same max_degree
    CENTER cap bounding fan-out at cap^2; pair counts one map-side-
    combined groupBy; both degree joins broadcast-able (the degree
    table is nodes-sized, not edges-sized).
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    adj = (
        e.select(F.col("lo").alias("v"), F.col("hi").alias("n"))
        .unionByName(
            e.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
        )
    )
    centers = adj.join(deg.withColumnRenamed("node", "v"), on="v")
    if max_degree is not None:
        centers = centers.where(F.col("degree") <= int(max_degree))
    l = centers.select("v", F.col("n").alias("u"))
    r = centers.select("v", F.col("n").alias("w"))
    pairs = l.join(r, on="v").where(F.col("u") < F.col("w"))
    if not include_adjacent:
        pairs = pairs.join(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("w")),
            on=["u", "w"],
            how="left_anti",
        )
    cn = pairs.groupBy("u", "w").agg(F.count(F.lit(1)).alias("cn"))
    du = F.broadcast(deg.select(F.col("node").alias("u"),
                                F.col("degree").alias("du")))
    dw = F.broadcast(deg.select(F.col("node").alias("w"),
                                F.col("degree").alias("dw")))
    return (
        cn.join(du, on="u").join(dw, on="w")
        .select(
            "u", "w", "cn",
            F.expr(
                f"(cn * {JACC_Q}) div (du + dw - cn)"
            ).alias("jacc_q"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Newman degree-assortativity coefficient r over the undirected
    simple graph: the Pearson correlation of the degrees at the two
    ends of an edge (each edge counted in both orientations — the
    standard formulation). Web/link graphs are famously
    DISassortative (hubs link to leaves, r < 0); a near-zero or
    positive r on a crawl snapshot is a link-farm / mirror-ring
    signal next to triangle_stats.

    Determinism: degrees are integers, so every moment sum (sx, sxy,
    sxx) is an EXACT int64; the final r is int->double casts, one
    double multiply, sqrt and divide — all IEEE-correctly-rounded,
    hence bit-identical cross-engine. Output: one row
    (m2 = directed edge-end count, sx, sxy, sxx, r).

    Scale: one degree agg + two broadcast-able degree joins onto the
    edge list + one global moment agg (map-side combined) — no
    wedge fan-out at all.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    both = e.unionByName(
        e.select(F.col("hi").alias("lo"), F.col("lo").alias("hi"))
    )
    du = F.broadcast(deg.select(F.col("node").alias("lo"),
                                F.col("degree").alias("dx")))
    dv = F.broadcast(deg.select(F.col("node").alias("hi"),
                                F.col("degree").alias("dy")))
    mom = (
        both.join(du, on="lo").join(dv, on="hi")
        .agg(
            F.count(F.lit(1)).alias("m2"),
            F.sum("dx").alias("sx"),
            F.sum(F.expr("dx * dy")).alias("sxy"),
            F.sum(F.expr("dx * dx")).alias("sxx"),
        )
    )
    # symmetric: sy == sx, syy == sxx
    return mom.select(
        "m2", "sx", "sxy", "sxx",
        F.expr(
            # regular graphs have zero degree variance: r undefined
            "CASE WHEN m2 * sxx - sx * sx <> 0 THEN"
            " cast(m2 * sxy - sx * sx as double)"
            " / cast(m2 * sxx - sx * sx as double) END"
        ).alias("r"),
    )


HC_Q = 1 << 20


def harmonic_centrality(
    edges: DataFrame,
    seeds: list[int],
    max_depth: int = 4,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Harmonic centrality of a SEED SET (Boldi & Vigna 2014's
    centrality, truncated at max_depth — the practical form: exact
    harmonic centrality needs all-pairs distances): sum over reached
    nodes of 1/level in 2^-20 fixed point, plus per-level reach
    counts. Measures how much of the graph the seed frontier can
    touch and how fast — the crawl-seed quality metric on the link
    graph (a seed set with higher truncated harmonic mass discovers
    more of the web per hop).

    Output one row: n_reached (level >= 1), hc_q = sum of
    floor(HC_Q / level) — pure integer, partitioning-invariant.

    Scale: exactly bfs_levels' cost (frontier-driven joins); the
    centrality fold is one constant-size aggregate.
    """
    lv = bfs_levels(
        edges, seeds, max_depth=max_depth, directed=directed,
        src=src, dst=dst,
    )
    reached = lv.where(F.col("level") >= 1)
    return reached.agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum(F.expr(f"cast({HC_Q} as bigint) div level")).alias(
            "hc_q"
        ),
    )


RC_Q = 1 << 20


def rich_club(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient at degree threshold k (Zhou & Mondragon
    2004): phi(k) = 2*E_k / (N_k * (N_k - 1)) over the subgraph
    induced by nodes with degree > k — do the hubs preferentially
    interconnect? A rich club on a crawl's domain graph is the
    portal/conglomerate core; its absence flags a decentralized (or
    sybil-flattened) topology. Output one row: n_club, e_club,
    phi_q = (2*E_k*Q) div (N_k*(N_k-1)) — integer fixed point
    (NULL-free: 0 when the club has < 2 members).

    Scale: one degree agg + two broadcast-able semi-joins restricting
    the edge list + two tiny counts.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    club = deg.where(F.col("degree") > int(k)).select("node")
    ec = (
        e.join(club.withColumnRenamed("node", "lo"), on="lo",
               how="leftsemi")
        .join(club.withColumnRenamed("node", "hi"), on="hi",
              how="leftsemi")
    )
    n = club.agg(F.count(F.lit(1)).alias("n_club"))
    m = ec.agg(F.count(F.lit(1)).alias("e_club"))
    return n.crossJoin(m).select(
        "n_club", "e_club",
        F.expr(
            f"CASE WHEN n_club >= 2 THEN (2 * e_club * {RC_Q})"
            " div (n_club * (n_club - 1)) ELSE cast(0 as bigint) END"
        ).alias("phi_q"),
    )


def weighted_pagerank(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Edge-WEIGHTED integer PageRank over the directed multigraph
    (the real link graph: a domain linking another 500 times should
    pass more authority than a single footer link — the unweighted
    domain_authority collapses that to one edge): contribution along
    (u, v) = (r(u) * 85 * w(u,v)) div (100 * W(u)) with W(u) the
    node's total out-weight. Same truncating int64 scheme as
    personalized_pagerank — bit-reproducible under any partitioning.
    Output: (node, wpr).

    int64 bound: r * 85 * w needs w <= ~10^5 at scale 10^12 — cap or
    rescale heavier multiplicities upstream.

    Scale: per iteration one rank-to-edge join + one map-side-
    combined sum; edge weights fold once into the adjacency.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("long").alias("w"))
        .where((F.col("src") != F.col("dst")) & (F.col("w") > 0))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    tot = e.groupBy("src").agg(F.sum("w").alias("tw"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    teleport = (int(scale) * (damping_den - damping_num)) // damping_den
    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("r")
    )
    ed = e.join(tot, on="src")
    for _ in range(int(iters)):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("src"), "r"),
                    on="src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(r * {int(damping_num)} * w)"
                    f" div (cast({int(damping_den)} as bigint) * tw)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(int(teleport)).cast("long")
                    + F.coalesce(F.col("in_r"),
                                 F.lit(0).cast("long"))
                ).alias("r"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("wpr"))


def anchor_text_agg(
    edges: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
    src: str = "src",
    top_k: int = 3,
) -> DataFrame:
    """Anchor-text aggregation per link target (the classic web-IR
    enrichment: a page is described by the text of the links
    pointing AT it — Brin & Page 1998; Craswell 2001). For each dst,
    the top_k anchor strings by (count DESC, text ASC) plus the
    target's total in-anchor count and distinct-source count.
    Output: (dst, rank, anchor, c_anchor, n_anchors, n_srcs) —
    one row per surviving (dst, anchor).

    Scale: one map-side-combined (dst, anchor) count whose
    per-target fan-out is bounded by top_k via WindowGroupLimit;
    distinct sources ride a second hash agg keyed by dst alone;
    the join back is dst-to-dst (co-partitioned by AQE). A
    celebrity page costs its true anchor cardinality once — never
    a cross product.
    """
    from pyspark.sql import Window

    per = edges.groupBy(dst, anchor).agg(
        F.count(F.lit(1)).alias("c_anchor")
    )
    w = Window.partitionBy(dst).orderBy(
        F.col("c_anchor").desc(), F.col(anchor).asc()
    )
    top = (
        per.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(top_k))
    )
    tot = edges.groupBy(dst).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.countDistinct(src).alias("n_srcs"),
    )
    return top.join(tot, dst).select(
        dst, "rank", anchor, "c_anchor", "n_anchors", "n_srcs"
    )


def redirect_resolve(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 24,
) -> DataFrame:
    """Redirect-chain resolution over a functional graph (each URL
    redirects to at most one target — the canonical crawl-frontier
    cleanup): follow chains to their terminal URL, count hops, and
    flag chains that never terminate (redirect LOOPS and everything
    feeding them). Pointer doubling (p, d) -> (p(p), d + d(p)):
    chain length L resolves in ceil(log2 L) rounds, so
    `max_rounds`=24 covers chains of 16M hops — each round is ONE
    self-join on the current pointer table, the textbook
    O(log n)-round functional-graph contraction. Nodes still
    unresolved after the doubling horizon are exactly the cycle
    members and their feeders: is_cycle=true, terminal=NULL,
    hops=-1. Output: (url, terminal, hops, is_cycle).

    Scale: log-bounded rounds of hash self-joins on a table that
    only SHRINKS as resolved pointers stop changing; lineage cut
    per round (localCheckpoint) like the CC/BFS family.
    """
    e = edges.groupBy(F.col(src).alias("url")).agg(
        F.min(dst).alias("p")
    )
    nodes = (
        edges.select(F.col(src).alias("url"))
        .union(edges.select(F.col(dst).alias("url")))
        .distinct()
    )
    # terminal nodes point to themselves at distance 0
    t = (
        nodes.join(e, on="url", how="left")
        .select(
            "url",
            F.coalesce("p", F.col("url")).alias("p"),
            F.when(F.col("p").isNull(), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("d"),
        )
    )
    for _ in range(int(max_rounds)):
        nxt = t.select(F.col("url").alias("__u2"),
                       F.col("p").alias("__p2"),
                       F.col("d").alias("__d2"))
        t = (
            t.join(nxt, t["p"] == nxt["__u2"], "left")
            .select(
                "url",
                F.coalesce("__p2", F.col("p")).alias("p"),
                (F.col("d") + F.coalesce("__d2", F.lit(0)))
                .alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    # resolved iff the final pointer is a TRUE terminal (a node
    # with no outgoing redirect) — p == url alone would mistake a
    # self-loop redirect (a 1-cycle) for a terminal
    term = nodes.join(e.select(F.col("url")), on="url",
                      how="left_anti") \
        .select(F.col("url").alias("__t"))
    return (
        t.join(term, t["p"] == term["__t"], "left")
        .select(
            "url",
            F.when(F.col("__t").isNotNull(), F.col("p"))
            .alias("terminal"),
            F.when(F.col("__t").isNotNull(), F.col("d"))
            .otherwise(F.lit(-1)).cast("long").alias("hops"),
            F.col("__t").isNull().alias("is_cycle"),
        )
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """k-truss decomposition (Cohen 2008): the maximal subgraph in
    which every edge participates in >= k-2 triangles — the
    cohesive-community step above k-core (a k-truss is always inside
    a (k-1)-core but far denser; link-farm detection on the crawl
    graph uses exactly this). Iteratively deletes under-supported
    edges until fixpoint; the surviving UNDIRECTED edge set (u < v)
    is returned.

    Scale: each round counts every edge's support with TWO hash
    joins on neighbor keys (the standard forward-adjacency triangle
    count), deletes, and localCheckpoints — rounds are bounded by
    max_rounds with a loud warning on forced exit, like knn_join's
    ring expansion. Peak cost = triangles touched, never all pairs.
    """
    import warnings

    need = int(k) - 2
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = e.count()
    for _ in range(int(max_rounds)):
        if n == 0:
            break
        a = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # support(u,v) = |N(u) ∩ N(v)|: common neighbors w
        common = (
            a.select(F.col("u").alias("x"), F.col("v").alias("w"))
            .join(
                a.select(F.col("u").alias("y"),
                         F.col("v").alias("w")),
                on="w",
            )
            .where(F.col("x") < F.col("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        kept = (
            e.join(
                common.withColumnRenamed("x", "u")
                .withColumnRenamed("y", "v"),
                on=["u", "v"],
                how="left",
            )
            .where(F.coalesce(F.col("sup"), F.lit(0)) >= need)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        m = kept.count()
        if m == n:
            break
        e, n = kept, m
    else:
        warnings.warn(
            f"k_truss: fixpoint not reached in {max_rounds} rounds",
            stacklevel=2,
        )
    return e



def hyperball(
    edges: DataFrame,
    max_depth: int = 3,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function
    N(v, t) = |B(v, t)| estimated with per-node HyperLogLog
    registers instead of per-node visited SETS — the scale path to
    closeness/harmonic centrality on a web graph where exact
    all-pairs BFS (n * n state) is impossible. Ball recurrence:

        B(v, t) = B(v, t-1)  UNION  B(u, t-1) for every edge v -> u

    HLL registers make the union a per-(node, bucket) MAX — an
    associative, map-side-combinable aggregate, so per-node state is
    <= 64 integers no matter how large the ball (the property the
    paper exploits to run on billion-node graphs).

    Output long-form, one row per (node, t in 0..max_depth):
    n_used / sum_q (the exact integer register moments — THE
    deterministic comparison surface) and ball_est (the HLL
    estimate, one ln, rounded 4dp). Harmonic centrality follows as
    sum_t (est_t - est_{t-1}) / t; closeness from the same deltas.

    Invariant (pinned by pytest): registers at (v, t) are IDENTICAL
    to hll_estimate() run on the exact ball membership set.

    Scale: per round ONE reversed-adjacency hash join (edge list x
    <=64 register rows per node) + one (node, bucket) max agg;
    lineage cut per round; fixed max_depth keeps the plan static.
    Register rows, never ball members, are what shuffles.

    Reference analog: the reach/centrality summaries PDAL-style
    engines compute per tile; here the sketch replaces the set the
    same way hexbin's density summary replaces raw points
    (filters/StatsFilter.hpp:60-210 merge support).
    """
    from pdal_spark.operators import sketch as SK

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    h = G.mix_hash("node")
    regs = nodes.select(
        "node",
        F.expr(f"({h}) % {SK.HLL_M}").alias("bkt"),
        F.expr(SK.hll_rho_sql(f"(({h}) div {SK.HLL_M})")).alias("rho"),
    ).localCheckpoint(eager=False)

    def _ball_est(r: DataFrame, t: int) -> DataFrame:
        g = r.groupBy("node").agg(
            F.count(F.lit(1)).alias("n_used"),
            F.sum(
                F.expr(
                    f"shiftleft(cast(1 as bigint), {SK._RHO_K} - rho)"
                )
            ).alias("__used_q"),
        )
        return g.select(
            "node",
            F.lit(int(t)).cast("int").alias("t"),
            "n_used",
            F.expr(
                f"__used_q + cast({SK.HLL_M} - n_used as bigint)"
                f" * shiftleft(cast(1 as bigint), {SK._RHO_K})"
            ).alias("sum_q"),
        ).withColumn("ball_est", F.expr(SK.hll_est_sql()))

    out = _ball_est(regs, 0)
    for t in range(1, int(max_depth) + 1):
        grown = (
            e.join(regs.withColumnRenamed("node", "b"), on="b")
            .select(F.col("a").alias("node"), "bkt", "rho")
        )
        regs = (
            regs.unionByName(grown)
            .groupBy("node", "bkt")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(_ball_est(regs, t))
    return out


BC_Q = 1 << 20  # betweenness dependency fixed-point grid


def betweenness_sampled(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 4,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Source-sampled betweenness centrality (Brandes 2001 with the
    standard pivot sampling of Brandes & Pich 2007): how much
    shortest-path traffic flows THROUGH each node, accumulated from
    a fixed source set truncated at max_depth — the bridge/broker
    detector on the link graph (k-truss finds dense cores;
    betweenness finds the nodes connecting them).

    Forward pass per source: BFS levels with path counts sigma
    (sum of predecessor sigmas — one join + one agg per round,
    exactly bfs_levels' shape). Backward pass: dependency
    delta(v) = sum over DAG successors w of
    (sigma_v / sigma_w) * (1 + delta(w)), held EXACT-deterministic
    in fixed point by quantizing each term independently:

        term_q = (sigma_v * (BC_Q + delta_q(w))) div sigma_w

    — integer terms sum order-independently, so the result is
    bit-reproducible under any partitioning (a float delta would
    depend on reduction order). bc_q(v) = sum over sources of
    delta_q(v); sources themselves excluded per Brandes.

    Output: (node, bc_q) for every node reached by >= 1 source
    (zeros kept — "reached but never intermediate" is signal).

    Scale: cost = sources x BFS cost; state per round is the
    (src, node) frontier; each backward level is one edge join +
    one agg. Lineage cut per round. For larger graphs raise
    |sources| for accuracy, never the per-round shape.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    e = e.localCheckpoint(eager=False)
    spark = edges.sparkSession
    seed = sorted({int(s) for s in sources})
    frontier = spark.createDataFrame(
        [(s, s, 1) for s in seed], "src bigint, node bigint, sigma bigint"
    ).localCheckpoint(eager=False)
    visited = frontier.select(
        "src", "node", "sigma", F.lit(0).alias("level")
    )
    levels = [visited]
    for t in range(1, int(max_depth) + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "a"), on="a")
            .select("src", F.col("b").alias("node"), "sigma")
            .groupBy("src", "node")
            .agg(F.sum("sigma").alias("sigma"))
        )
        frontier = nxt.join(
            visited.select("src", "node"),
            on=["src", "node"], how="left_anti",
        ).localCheckpoint(eager=False)
        lv = frontier.select(
            "src", "node", "sigma", F.lit(t).alias("level")
        )
        levels.append(lv)
        visited = visited.unionByName(lv).localCheckpoint(eager=False)
    # backward dependency accumulation, deepest level first
    delta = levels[int(max_depth)].select(
        "src", "node", "sigma", F.lit(0).cast("bigint").alias("delta")
    ).localCheckpoint(eager=False)
    deltas = [delta]
    for t in range(int(max_depth), 0, -1):
        v = levels[t - 1].select("src", "node", "sigma")
        contrib = (
            v.join(e.withColumnRenamed("a", "node"), on="node",
                   how="left")
            .join(
                delta.select(
                    "src", F.col("node").alias("b"),
                    F.col("sigma").alias("__sw"),
                    F.col("delta").alias("__dw"),
                ),
                on=["src", "b"], how="left",
            )
            .groupBy("src", "node", "sigma")
            .agg(
                F.coalesce(
                    F.sum(F.expr(
                        f"(sigma * ({BC_Q} + __dw)) div __sw"
                    )),
                    F.lit(0),
                ).cast("bigint").alias("delta")
            )
        )
        delta = contrib.localCheckpoint(eager=False)
        deltas.append(delta)
    acc = deltas[0]
    for d in deltas[1:]:
        acc = acc.unionByName(d)
    return (
        acc.where(F.col("node") != F.col("src"))
        .groupBy("node")
        .agg(F.sum("delta").alias("bc_q"))
    )


def weighted_sssp(
    edges: DataFrame,
    sources: list[int],
    rounds: int = 6,
    weight: str | None = None,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Multi-source single-source-shortest-paths over integer edge
    weights — `rounds` Bellman-Ford relaxations (the delta-stepping
    family's distributed baseline): dist(seed, v) = min cost path in
    <= rounds hops. With rounds >= graph diameter this IS the exact
    SSSP (relaxation is monotone, so extra rounds are no-ops — the
    k_truss/kcore fixed-budget convention); latency-weighted crawl
    routing and redirect-cost analysis on the link graph.

    Unweighted (weight=None) edges cost 1 per hop = BFS distances.

    Scale: frontier-driven — each round joins ONLY the rows whose
    distance improved last round against the adjacency (exactly
    bfs_levels' frontier shape, generalized to weights), then ONE
    min-merge agg. Integer mins are order-independent:
    bit-reproducible under any partitioning. Lineage cut per round.
    """
    w_expr = (
        F.col(weight).cast("bigint") if weight is not None
        else F.lit(1).cast("bigint")
    )
    e = (
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"),
            w_expr.alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"),
                     "w")
        ).groupBy("a", "b").agg(F.min("w").alias("w"))
    e = e.localCheckpoint(eager=False)
    spark = edges.sparkSession
    seed = sorted({int(s) for s in sources})
    dist = spark.createDataFrame(
        [(s, s, 0) for s in seed],
        "seed bigint, node bigint, dist bigint",
    ).localCheckpoint(eager=False)
    frontier = dist
    for _ in range(int(rounds)):
        cand = (
            e.join(frontier.withColumnRenamed("node", "a"), on="a")
            .select(
                "seed", F.col("b").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        # improved = rows whose dist changed (new node or smaller)
        frontier = merged.join(
            dist.withColumnRenamed("dist", "__old"),
            on=["seed", "node"], how="left",
        ).where(
            F.col("__old").isNull() | (F.col("dist") < F.col("__old"))
        ).select("seed", "node", "dist").localCheckpoint(eager=False)
        dist = merged
    return dist


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    node_col: str = "node",
    com_col: str = "community",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman modularity of a community assignment (Newman & Girvan
    2004) — THE partition-quality score: Q = sum_c (e_c/m -
    (d_c/2m)^2), the intra-community edge excess over the
    degree-preserving random expectation. Scores label_propagation
    (or any) communities; the link-farm detector's quality gate.

    Emits one row per community with EXACT integer sufficient
    statistics (n_nodes, e_c intra edges, d_c degree mass, m) and
    the per-community contribution (4*m*e_c - d_c^2) / (4*m^2) as
    ONE IEEE division — sum of contributions = Q, computable
    downstream without refetching the graph.

    Scale: one canonical-edge pass, one degree agg, two
    assignment hash joins (edge endpoints), one per-community agg.
    The assignment table is the only non-edge shuffle.
    """
    e = _canonical_edges(edges, src, dst)
    a = assign.select(
        F.col(node_col).alias("node"), F.col(com_col).alias("c")
    )
    m_df = e.agg(F.count(F.lit(1)).alias("m"))
    deg = _degrees(e)
    members = deg.join(a, on="node", how="inner")
    dsum = members.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("degree").alias("d_c"),
    )
    intra = (
        e.join(a.withColumnRenamed("node", "lo")
               .withColumnRenamed("c", "c_lo"), on="lo")
        .join(a.withColumnRenamed("node", "hi")
              .withColumnRenamed("c", "c_hi"), on="hi")
        .where(F.col("c_lo") == F.col("c_hi"))
        .groupBy(F.col("c_lo").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    return (
        dsum.join(intra, on="c", how="left")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("c").alias(com_col), "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint")
            .alias("e_c"),
            "d_c", "m",
            F.expr(
                "cast(4 * m * coalesce(e_c, 0) - d_c * d_c"
                " as double) / cast(4 * m * m as double)"
            ).alias("q_contrib"),
        )
    )


def conductance(
    edges: DataFrame,
    assign: DataFrame,
    node_col: str = "node",
    com_col: str = "community",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-community conductance phi(C) = cut(C) / min(vol(C),
    vol(complement)) — the bottleneck score that modularity misses
    (a community can have high modularity yet leak heavily through
    one boundary). Standard next to modularity in community-quality
    audits (Leskovec et al. 2008's NCP plots).

    Emits exact integer sufficient statistics per community
    (n_nodes, vol = degree mass, cut = boundary edges, m) + phi as
    ONE guarded IEEE division.

    Scale: the modularity plan with the intra predicate flipped —
    one degree agg + two endpoint joins + one per-community agg.
    """
    e = _canonical_edges(edges, src, dst)
    a = assign.select(
        F.col(node_col).alias("node"), F.col(com_col).alias("c")
    )
    m_df = e.agg(F.count(F.lit(1)).alias("m"))
    deg = _degrees(e)
    vol = deg.join(a, on="node").groupBy("c").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("degree").alias("vol"),
    )
    tagged = (
        e.join(a.withColumnRenamed("node", "lo")
               .withColumnRenamed("c", "c_lo"), on="lo")
        .join(a.withColumnRenamed("node", "hi")
              .withColumnRenamed("c", "c_hi"), on="hi")
        .where(F.col("c_lo") != F.col("c_hi"))
    )
    cut = (
        tagged.select(F.col("c_lo").alias("c"))
        .unionByName(tagged.select(F.col("c_hi").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    return (
        vol.join(cut, on="c", how="left")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("c").alias(com_col), "n_nodes", "vol",
            F.coalesce(F.col("cut"), F.lit(0)).cast("bigint")
            .alias("cut"),
            "m",
            F.expr(
                "CASE WHEN least(vol, 2 * m - vol) > 0 THEN"
                " cast(cut as double)"
                " / cast(least(vol, 2 * m - vol) as double) END"
            ).alias("phi"),
        )
    )


def luby_mis(
    edges: DataFrame,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Maximal independent set via Luby's algorithm (Luby 1986)
    made deterministic: node priority = mix_hash(node), total order
    broken by node id (key = pri * 2^31 + node) — an undecided node
    joins the MIS when it beats every undecided neighbor; MIS
    members knock their neighbors out. O(log n) rounds whp; the
    fixed budget is pinned by a none-undecided pytest. The parallel
    conflict-free scheduling primitive: an MIS over the host
    same-IP/same-domain conflict graph is a crawl wave that touches
    no conflicting pair.

    Output: (node, mis boolean, round) — round = when decided.
    Bit-reproducible under any partitioning (hash priorities, no
    RNG state).

    Scale: per round one undecided-to-undecided neighbor max-join +
    two anti-joins; the undecided set SHRINKS geometrically (in
    expectation half the edge mass dies per round). Lineage cut per
    round. Requires non-negative node ids < 2^31 (web-graph node
    dictionaries are).
    """
    e = _canonical_edges(edges, src, dst)
    adj = (
        e.select(F.col("lo").alias("node"), F.col("hi").alias("nb"))
        .unionByName(
            e.select(F.col("hi").alias("node"),
                     F.col("lo").alias("nb"))
        )
        .localCheckpoint(eager=False)
    )
    k = f"({G.mix_hash('node')} * {1 << 31} + node)"
    und = adj.select("node").distinct().withColumn(
        "k", F.expr(k)
    ).localCheckpoint(eager=False)
    decided = []
    for t in range(1, int(rounds) + 1):
        nbr = (
            adj.join(und.select(F.col("node").alias("nb"),
                                F.col("k").alias("nk")), on="nb")
            .groupBy("node")
            .agg(F.max("nk").alias("mx"))
        )
        cand = und.join(nbr, on="node", how="left")
        winners = cand.where(
            F.col("mx").isNull() | (F.col("k") > F.col("mx"))
        ).select("node").localCheckpoint(eager=True)
        knocked = (
            adj.join(winners.withColumnRenamed("node", "nb"),
                     on="nb")
            .select("node")
            .join(und.select("node"), on="node", how="left_semi")
            .distinct()
            .localCheckpoint(eager=True)
        )
        decided.append(winners.select(
            "node", F.lit(True).alias("mis"),
            F.lit(t).alias("round")))
        decided.append(knocked.select(
            "node", F.lit(False).alias("mis"),
            F.lit(t).alias("round")))
        und = (
            und.join(winners, on="node", how="left_anti")
            .join(knocked, on="node", how="left_anti")
            .localCheckpoint(eager=False)
        )
    out = decided[0]
    for d in decided[1:]:
        out = out.unionByName(d)
    return out.select(
        "node", "mis", F.col("round").cast("int").alias("round")
    )


RA_Q = 1 << 20  # resource-allocation fixed-point scale


def resource_allocation(
    edges: DataFrame,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lu & Zhang 2009)
    over the undirected simple graph — adamic_adar's harder-decaying
    sibling (1/deg instead of 1/ln deg; the empirical top scorer on
    dense social graphs): for every NON-adjacent pair (u < w) with
    >= 1 common neighbor,

        ra_q = sum over common neighbors v of RA_Q div deg(v)

    exact int64 (no ln — unlike AA this one needs no float at all).
    Output: (u, w, cn, ra_q).

    Scale: identical wedge-enumeration plan to :func:`adamic_adar`,
    with the same principled `max_degree` hub-center cap (a dropped
    hub center's term RA_Q/deg is the SMALLEST term of any wedge
    through it — bounded score error RA_Q/max_degree per wedge).
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    adj = (
        e.select(F.col("lo").alias("v"), F.col("hi").alias("n"))
        .unionByName(
            e.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
        )
    )
    centers = adj.join(deg.withColumnRenamed("node", "v"), on="v")
    if max_degree is not None:
        centers = centers.where(F.col("degree") <= int(max_degree))
    l = centers.select("v", F.col("n").alias("u"), "degree")
    r = centers.select("v", F.col("n").alias("w"))
    pairs = l.join(r, on="v").where(F.col("u") < F.col("w"))
    open_pairs = pairs.join(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("w")),
        on=["u", "w"],
        how="left_anti",
    )
    return (
        open_pairs.select(
            "u", "w",
            F.expr(f"cast({RA_Q} as bigint) div degree")
            .alias("term_q"),
        )
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("term_q").alias("ra_q"),
        )
    )


def preferential_attachment(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Preferential-attachment link prediction (Barabasi & Albert):
    pa = deg(u) * deg(w) for every NON-adjacent pair (u < w) sharing
    >= 1 common neighbor — the degree-only baseline the
    neighborhood scores (adamic_adar / resource_allocation /
    neighbor_jaccard) are judged against. Restricting to
    wedge-connected pairs keeps the candidate space identical to
    those ops (and spares the full V^2 cross product the textbook
    definition implies). Output: (u, w, cn, pa) — all exact int64.

    Scale: the shared wedge plan; the score itself needs only the
    broadcast degree table, so the candidate join dominates.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    adj = (
        e.select(F.col("lo").alias("v"), F.col("hi").alias("n"))
        .unionByName(
            e.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
        )
    )
    pairs = (
        adj.select("v", F.col("n").alias("u"))
        .join(adj.select("v", F.col("n").alias("w")), on="v")
        .where(F.col("u") < F.col("w"))
    )
    open_pairs = pairs.join(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("w")),
        on=["u", "w"],
        how="left_anti",
    )
    cn = open_pairs.groupBy("u", "w").agg(
        F.count(F.lit(1)).alias("cn")
    )
    return (
        cn.join(
            F.broadcast(deg.select(F.col("node").alias("u"),
                                   F.col("degree").alias("du"))),
            on="u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("w"),
                                   F.col("degree").alias("dw"))),
            on="w",
        )
        .select("u", "w", "cn",
                (F.col("du") * F.col("dw")).alias("pa"))
    )


KATZ_SCALE = 10**9
KATZ_ALPHA_NUM = 1
KATZ_ALPHA_DEN = 8


def katz_centrality(
    edges: DataFrame,
    iters: int = 3,
    scale: int = KATZ_SCALE,
    alpha_num: int = KATZ_ALPHA_NUM,
    alpha_den: int = KATZ_ALPHA_DEN,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Katz centrality (Katz 1953) by truncated fixed-point power
    series over the undirected simple graph — pagerank's
    degree-unnormalized cousin (every walk counts, damped by
    alpha^length, no out-degree division):

        x_{k+1}(v) = scale + (alpha_num * sum_{u~v} x_k(u))
                             div alpha_den,   x_0 = scale

    Truncating integer division each hop keeps every rank exact
    int64 under any partitioning (the personalized_pagerank
    discipline, graph.py:376-407). Converges for alpha < 1/lambda_1;
    keep alpha_den >= max degree. Output: (node, katz_q).

    Scale: iters joins on the edge list + map-side-combined sums;
    iterates on the NODE table (checkpointed), never materializing
    walks.
    """
    e = _canonical_edges(edges, src, dst)
    adj = (
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        .unionByName(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
    )
    nodes = adj.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(int(scale)).cast("long")
                         .alias("x"))
    for _ in range(int(iters)):
        contrib = (
            adj.join(ranks.select(F.col("node").alias("u"), "x"),
                     on="u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("x").alias("in_x"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(int(scale)).cast("long")
                    + F.expr(
                        f"({int(alpha_num)}"
                        " * coalesce(in_x, cast(0 as bigint)))"
                        f" div {int(alpha_den)}"
                    )
                ).alias("x"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.col("x").alias("katz_q"))


EIG_SCALE = 10**6  # deg_max * EIG_SCALE^2 must stay < 2^63


def eigenvector_centrality(
    edges: DataFrame,
    iters: int = 3,
    scale: int = EIG_SCALE,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Eigenvector centrality by max-normalized integer power
    iteration over the undirected simple graph (Bonacich 1972):

        y = A x_k ;  x_{k+1}(v) = (y(v) * scale) div max(y)

    so the top-ranked node pins at `scale` each round and every
    value stays exact int64 (truncating div — deterministic under
    any partitioning). Bound: y * scale <= deg_max * scale^2 <
    2^63 — the 10^6 default is safe to deg_max ~ 9e6. Fixed `iters` truncation IS the spec (like
    textrank/pagerank oracles); isolated components away from the
    max decay toward 0. Output: (node, eig_q).

    Scale: per iteration one edge join + one hash agg + one
    broadcast of the single-row max.
    """
    e = _canonical_edges(edges, src, dst)
    adj = (
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        .unionByName(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
    )
    nodes = adj.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(int(scale)).cast("long")
                         .alias("x"))
    for _ in range(int(iters)):
        y = (
            adj.join(
                ranks.select(F.col("node").alias("u"), "x"), on="u"
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("x").alias("y"))
        )
        mx = y.agg(F.max("y").alias("m"))
        ranks = (
            nodes.join(y, on="node", how="left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.expr(
                    f"(coalesce(y, cast(0 as bigint))"
                    f" * {int(scale)}) div m"
                ).alias("x"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.col("x").alias("eig_q"))


RWE_Q = 1 << 10


def random_walk_entropy(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Entropy rate of the simple random walk on the undirected
    graph (Burda et al. 2009): the walk's stationary distribution
    is EXACTLY pi_i = deg_i / 2m, so

        H = sum_i (deg_i / 2m) * ln(deg_i)    [nats]

    — the closed form that needs no iteration at all (the
    navigability/mixing summary next to eigenvector_centrality).
    Each ln(deg) quantizes to the 2^-10 grid; the accumulation
    sum(deg * lnq) is exact int64; H is one division by 2m * Q.
    Output one row: (n_nodes, two_m, h_q_sum, h).

    Scale: degree table + ONE fold.
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    q = float(RWE_Q)
    terms = deg.select(
        "degree",
        F.expr(
            "cast(floor(ln(cast(degree as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("lnq"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("degree").alias("two_m"),
        F.sum(F.expr("degree * lnq")).alias("h_q_sum"),
    )
    return agg.select(
        "n_nodes", "two_m", "h_q_sum",
        F.expr(
            "case when two_m > 0 then cast(h_q_sum as double)"
            f" / (cast(two_m as double) * {q!r}e0) end"
        ).alias("h"),
    )


def bipartite_project(
    df: DataFrame,
    left: str,
    right: str,
    max_right_degree: int | None = None,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite graph (user-item,
    document-term, page-link): left nodes sharing a right neighbor
    connect with the resource-allocation weight

        w(u, v) = sum over shared r of RA_Q div deg(r)

    (hub items contribute little — the collaborative-filtering /
    co-occurrence normalization; Zhou et al. 2007). Exact int64.
    Output: (u, v, n_common, w_q) for u < v.

    Scale: the wedge plan keyed on the RIGHT node — fan-out
    deg(r)^2 per item, capped by `max_right_degree` (drop super-hub
    items: their per-wedge weight RA_Q/deg is the smallest of any,
    bounded error). One join + one hash agg.
    """
    e = df.select(
        F.col(left).alias("u"), F.col(right).alias("r")
    ).distinct()
    deg = e.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = e.join(deg, on="r")
    if max_right_degree is not None:
        ed = ed.where(F.col("d") <= int(max_right_degree))
    pairs = (
        ed.select("r", "u", "d")
        .join(ed.select("r", F.col("u").alias("v")), on="r")
        .where(F.col("u") < F.col("v"))
    )
    return (
        pairs.select(
            "u", "v",
            F.expr(f"cast({RA_Q} as bigint) div d").alias("t"),
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("t").alias("w_q"),
        )
    )


PL_Q = 1 << 10


def powerlaw_alpha(
    edges: DataFrame,
    d_min: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Continuous-approximation MLE of the degree-distribution
    power-law exponent (Clauset, Shalizi & Newman 2009 eq. 3.1) —
    the scale-free-ness readout over the degree table:

        alpha = 1 + n_tail / sum ln(d_i / (d_min - 1/2))

    over nodes with degree >= d_min. Each ln of the exact ratio
    quantizes to the 2^-10 grid (integer fold); alpha is one
    division. Output: (n_tail, ln_q_sum, alpha).

    Scale: degree table + ONE fold.
    """
    import math

    from pdal_spark import sqlgen as G_

    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    q = float(PL_Q)
    dm = G_.fnum(float(d_min) - 0.5)
    tail = deg.where(F.col("degree") >= int(d_min))
    terms = tail.select(
        F.expr(
            f"cast(floor(ln(cast(degree as double) / {dm})"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("lnq")
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum("lnq").alias("ln_q_sum"),
    )
    return agg.select(
        "n_tail", "ln_q_sum",
        F.expr(
            "case when ln_q_sum > 0 then 1.0e0"
            " + cast(n_tail as double)"
            f" / (cast(ln_q_sum as double) / {q!r}e0) end"
        ).alias("alpha"),
    )


def edge_reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Directed-graph edge reciprocity (Garlaschelli & Loffredo
    2004): the fraction of directed edges whose reverse also exists
    — THE mutuality number for link/follow graphs (the kNN
    `reciprocity` op is the spatial-neighbor cousin; this is the
    plain graph-theoretic one). Self-loops dropped, duplicates
    collapsed. Output: (n_edges, n_mutual, reciprocity).

    Scale: one distinct + one self-join on the reversed pair + a
    fold — shuffles keyed on the edge.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = e.join(rev, on=["u", "v"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_mutual")
    )
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return tot.crossJoin(F.broadcast(mutual)).select(
        "n_edges", "n_mutual",
        F.expr(
            "case when n_edges > 0 then"
            " cast(n_mutual as double)"
            " / cast(n_edges as double) end"
        ).alias("reciprocity"),
    )


ELO_Q = 1 << 20
ELO_START = 1500


def elo_batch(
    matches: DataFrame,
    rounds: int = 3,
    k_factor: int = 32,
    round_col: str = "rnd",
    a_col: str = "a",
    b_col: str = "b",
    score2_col: str = "sa2",
) -> DataFrame:
    """Batch Elo ratings over discrete match rounds (Elo 1978) —
    the rating-system member of the ranking family (pagerank ranks
    by structure, BM25 by content, this by RESULTS). Within each
    round every match evaluates against the round-START ratings
    (the batch convention — order inside a round cannot matter),
    then deltas sum per player:

        e_a   = round(1 / (1 + 10^((r_b - r_a)/400)), 9)
        delta = floor(K * (s_a - e_a) * Q + 0.5)    [s in {0,1/2,1}
                                                     via 2s int]

    Ratings carry as exact int64 Q-units from 1500; the pow/round
    chain is engine-invariant (the trig convention applied to
    10^x). Output: (player, rating_q, rating).

    Scale: `rounds` driver iterations, each one join + one
    player-keyed agg (the pagerank discipline).
    """
    import math

    from pdal_spark import sqlgen as G_

    q = ELO_Q
    base = matches.select(
        F.col(round_col).alias("rnd"), F.col(a_col).alias("a"),
        F.col(b_col).alias("b"),
        F.col(score2_col).cast("long").alias("sa2"),
    ).localCheckpoint(eager=True)
    players = (
        base.select(F.col("a").alias("p"))
        .unionByName(base.select(F.col("b").alias("p")))
        .distinct()
    )
    ratings = players.select(
        "p", F.lit(int(ELO_START) * q).cast("long").alias("rq")
    ).localCheckpoint(eager=True)
    qf = G_.fnum(float(q))
    kf = G_.fnum(float(k_factor))
    for rnd in range(int(rounds)):
        m = base.where(F.col("rnd") == rnd)
        j = (
            m.join(ratings.select(F.col("p").alias("a"),
                                  F.col("rq").alias("ra")), on="a")
            .join(ratings.select(F.col("p").alias("b"),
                                 F.col("rq").alias("rb")), on="b")
        )
        ea = (
            "round(1.0e0 / (1.0e0 + power(10.0e0,"
            f" (cast(rb as double) - cast(ra as double))"
            f" / ({qf} * 400.0e0))), 9)"
        )
        delta = (
            f"cast(floor({kf} * (cast(sa2 as double) / 2.0e0"
            f" - {ea}) * {qf} + 0.5e0) as bigint)"
        )
        d = j.select(
            F.col("a").alias("p"), F.expr(delta).alias("d")
        ).unionByName(
            j.select(F.col("b").alias("p"),
                     F.expr(f"-({delta})").alias("d"))
        ).groupBy("p").agg(F.sum("d").alias("dd"))
        ratings = (
            ratings.join(d, on="p", how="left")
            .select(
                "p",
                (F.col("rq")
                 + F.expr("coalesce(dd, cast(0 as bigint))"))
                .alias("rq"),
            )
            .localCheckpoint(eager=True)
        )
    return ratings.select(
        F.col("p").alias("player"), F.col("rq").alias("rating_q"),
        F.expr(f"cast(rq as double) / {qf}").alias("rating"),
    )


def condorcet_winner(
    matches: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    winner_col: str = "w",
) -> DataFrame:
    """Condorcet head-to-head audit (who beats EVERY rival
    pairwise — the social-choice gold standard the plain win-rate
    table can violate): per unordered pair, net wins decide the
    pair; per candidate report pairs beaten / tied / lost against
    the field and the is_condorcet flag (beats ALL others met
    head-to-head AND has met everyone). Output per candidate:
    (cand, n_others, n_beaten, n_tied, is_condorcet).

    Scale: one canonical-pair agg + one candidate rollup +
    broadcast candidate count.
    """
    base = matches.select(
        F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
        F.col(winner_col).alias("w"),
    ).where(F.col("lo") != F.col("hi"))
    per = base.groupBy("lo", "hi").agg(
        F.sum(F.expr("case when w = lo then 1 else 0 end"))
        .alias("wl"),
        F.sum(F.expr("case when w = hi then 1 else 0 end"))
        .alias("wh"),
    )
    sides = per.select(
        F.col("lo").alias("cand"),
        F.expr("case when wl > wh then 1 else 0 end")
        .alias("beat"),
        F.expr("case when wl = wh then 1 else 0 end")
        .alias("tie"),
    ).unionByName(per.select(
        F.col("hi").alias("cand"),
        F.expr("case when wh > wl then 1 else 0 end")
        .alias("beat"),
        F.expr("case when wl = wh then 1 else 0 end")
        .alias("tie"),
    ))
    agg = sides.groupBy("cand").agg(
        F.count(F.lit(1)).cast("long").alias("n_others"),
        F.sum("beat").cast("long").alias("n_beaten"),
        F.sum("tie").cast("long").alias("n_tied"),
    )
    n_c = (
        base.select(F.col("lo").alias("c"))
        .unionByName(base.select(F.col("hi").alias("c")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_cands"))
    )
    return agg.crossJoin(F.broadcast(n_c)).select(
        "cand", "n_others", "n_beaten", "n_tied",
        F.expr(
            "cast(case when n_beaten = n_cands - 1 then 1"
            " else 0 end as int)"
        ).alias("is_condorcet"),
    )


def edge_churn(
    edges_a: DataFrame,
    edges_b: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Edge churn between two graph snapshots (the link-graph
    snapshot_diff: how much of the crawl's link structure turned
    over): canonical undirected edge sets compared —

        jaccard = |A n B| / |A u B|

    plus added/removed counts. Exact integers. Output: (n_a, n_b,
    n_common, n_added, n_removed, jaccard).

    Scale: two distinct projections + one equi-join on the edge.
    """
    a = _canonical_edges(edges_a, src, dst)
    b = _canonical_edges(edges_b, src, dst)
    common = a.join(b, on=["lo", "hi"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    j = (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(common))
    )
    return j.select(
        "n_a", "n_b", "n_common",
        (F.col("n_b") - F.col("n_common")).alias("n_added"),
        (F.col("n_a") - F.col("n_common")).alias("n_removed"),
        F.expr(
            "case when n_a + n_b - n_common > 0 then"
            " cast(n_common as double)"
            " / cast(n_a + n_b - n_common as double) end"
        ).alias("jaccard"),
    )


def degree_summary(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree-distribution summary of the undirected simple graph
    (the one-row shape card next to powerlaw_alpha's exponent):
    node/edge counts, mean and max degree, and the degree Gini
    (hub concentration) via the pair-free rank closed form

        gini = sum (2i - n - 1) d_(i) / (n * sum d)

    All exact int64 except the closing chains. Output: (n_nodes,
    n_edges, max_degree, mean_degree, degree_gini).

    Scale: degree table + one sort-window + one fold.
    """
    from pyspark.sql import Window

    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    w = Window.orderBy(F.col("degree").asc(),
                       F.col("node").asc())
    ranked = deg.withColumn(
        "i", F.row_number().over(w).cast("long")
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    agg = ranked.agg(
        F.max("n").alias("n_nodes"),
        F.sum("degree").alias("deg_sum"),
        F.max("degree").alias("max_degree"),
        F.sum(
            F.expr("(2 * i - n - 1) * degree")
        ).alias("g_num"),
    )
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    j = agg.crossJoin(F.broadcast(ne))
    return j.select(
        "n_nodes", "n_edges", "max_degree",
        F.expr(
            "cast(deg_sum as double) / cast(n_nodes as double)"
        ).alias("mean_degree"),
        F.expr(
            "case when deg_sum > 0 then cast(g_num as double)"
            " / (cast(n_nodes as double)"
            " * cast(deg_sum as double)) end"
        ).alias("degree_gini"),
    )
