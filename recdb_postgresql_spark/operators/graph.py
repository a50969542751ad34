"""Iterative graph algorithms over edge DataFrames.

The near-dup pair graphs this engine produces (LSH-verified Jaccard
pairs, semantic-dedup cells) are inputs to graph analytics beyond
connected components: PageRank ranks documents by how centrally they
sit in the duplication graph (hub templates score high — a better
boilerplate signal than raw degree), and the same kernel ranks any
edge list (citations, user-item projections).

Scale notes (100 TB): power iteration is inherently one shuffle round
per iteration — rank mass moves along edges, so the join keyed on the
source node and the aggregate keyed on the destination are the
algorithm. What the implementation controls:

- the edge list (+ degrees) is static across iterations: computed
  once, ``localCheckpoint``-ed, reused — never recomputed per round;
- per-iteration lineage is truncated (checkpoint) so the plan stays
  O(1) deep instead of O(iterations) — the classic iterative-Spark
  stall is Catalyst re-analyzing a 10-deep self-referential plan;
- only (node, double) rows shuffle per round; edges stay put (the
  join reuses their partitioning);
- bucketing the edge list by source node removes the per-iteration
  edge-side Exchange entirely (``sinks.write_bucketed``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 10, src: str = "id1", dst: str = "id2",
             directed: bool = False) -> DataFrame:
    """(id, rank): PageRank by fixed-iteration power iteration.

    Undirected mode (default) symmetrizes the edge list, so every
    node has out-degree >= 1 and no dangling-mass correction is
    needed; ranks sum to 1 up to float error. The node set is the
    nodes incident to at least one edge. Fixed iteration count (not a
    convergence test) keeps the result deterministic and
    oracle-expressible as unrolled SQL.

    Directed mode keeps edges as given; dangling nodes (no
    out-edges) redistribute their mass uniformly each round — the
    standard correction, folded into the teleport term via one scalar
    aggregate per iteration.
    """
    # simple-graph semantics, same contract as triangle_count:
    # duplicate/reversed edges collapse and self-loops drop — without
    # this, ranks silently become edge-multiplicity-weighted
    # canonical edge list materialized BEFORE the symmetrizing union —
    # the union's two legs otherwise each inline the caller's whole
    # edge-producing pipeline (r12 plan audit: textrank's word graph
    # built twice; guide §2.4)
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
        # reversed duplicates in the input collapse here
        e = e.distinct()
        e = e.localCheckpoint(eager=True)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()  # one scalar to the driver, like any COUNT(*)
    if n == 0:         # empty graph: empty result, not a div-by-zero
        return nodes.select("id", F.lit(0.0).alias("rank"))
    # static (u, v, deg) edge frame — reused by every iteration
    ed = e.join(deg, "u").localCheckpoint(eager=True)
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (ed.join(ranks, ed["u"] == ranks["id"])
                   .select(F.col("v").alias("id"),
                           (F.col("rank") / F.col("deg")).alias("c"))
                   .groupBy("id").agg(F.sum("c").alias("c")))
        if directed:
            # mass parked on dangling nodes (no out-edges) teleports
            dangling = (ranks.join(deg, ranks["id"] == deg["u"],
                                   "left_anti")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                             .alias("d")))
            base = ((1.0 - damping) / n
                    + damping * F.col("d") / n)
            ranks = (nodes.join(contrib, "id", "left")
                     .crossJoin(F.broadcast(dangling))
                     .select("id",
                             (base + damping
                              * F.coalesce(F.col("c"), F.lit(0.0)))
                             .alias("rank")))
        else:
            ranks = (nodes.join(contrib, "id", "left")
                     .select("id",
                             (F.lit((1.0 - damping) / n) + damping
                              * F.coalesce(F.col("c"), F.lit(0.0)))
                             .alias("rank")))
        # eager=False: each round's checkpoint still truncates lineage
        # when materialized, but all 10 materializations chain inside
        # ONE action instead of ten scheduled jobs — measured 5.7 s ->
        # 4.1 s on a toy graph (pure scheduling overhead; identical
        # ranks). The static frames above stay eager (reused by every
        # round from the first).
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def triangle_count(edges: DataFrame, src: str = "id1",
                   dst: str = "id2") -> DataFrame:
    """(id, n_triangles): triangles through each node — the clustering
    signal on a near-dup graph (a template family is a dense clique;
    a chain of pairwise-similar docs is not).

    Degree-oriented enumeration (the MapReduce-era standard): each
    undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher one, so every wedge is generated at exactly one node
    and a heavy hub never fans out — the per-node wedge count is
    bounded by its ORIENTED out-degree, O(sqrt(m)) on any graph, which
    is what makes the self-join survive a power-law 100 TB graph. One
    wedge self-join + one membership join against the oriented edge
    set; each triangle found exactly once.
    """
    # checkpoint: e feeds the degree aggregate AND the orientation
    # join — without it the (possibly expensive) upstream edge
    # producer runs once per leg
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .where(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    deg = (e.select(F.col("a").alias("id"))
           .unionByName(e.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | \
        ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = (e.join(da, "a").join(db, "b")
                .select(F.when(lower_first, F.col("a")).otherwise(F.col("b"))
                        .alias("u"),
                        F.when(lower_first, F.col("b")).otherwise(F.col("a"))
                        .alias("v"))
                .localCheckpoint(eager=True))
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = (w1.join(w2, "u").where(F.col("x") < F.col("y")))
    # the closing edge may be oriented either way between x and y
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    per_node = (tris.select(F.col("u").alias("id"))
                .unionByName(tris.select(F.col("x").alias("id")))
                .unionByName(tris.select(F.col("y").alias("id"))))
    return (per_node.groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))


def bfs_distances(edges: DataFrame, sources: DataFrame,
                  max_hops: int = 6, src: str = "id1", dst: str = "id2",
                  source_col: str = "id",
                  directed: bool = False) -> DataFrame:
    """(id, dist): minimum hop count from ANY source node, by
    level-synchronous BFS (the Pregel frontier shape) — "how far does
    this template's duplication neighborhood reach", contamination
    blast radius, feature propagation depth.

    Per round: frontier joins the static checkpointed edge frame,
    newly-reached nodes (anti-join against visited) become the next
    frontier at dist+1. Only (node, int) rows shuffle per round; the
    loop exits early when a frontier empties (one scalar count per
    round — the same driver-side control every iterative algorithm
    here uses). ``max_hops`` bounds the recursion identically to the
    oracle's recursive-CTE depth guard, so results are comparable
    engine-to-engine. Sources not present in the edge list still
    report dist 0 (a source IS reachable from itself)."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct())
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"),
                                   F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)
    visited = (sources.select(F.col(source_col).alias("id")).distinct()
               .withColumn("dist", F.lit(0))
               .localCheckpoint(eager=True))
    frontier = visited
    for hop in range(1, int(max_hops) + 1):
        nxt = (e.join(frontier.select(F.col("id").alias("u")), "u")
               .select(F.col("v").alias("id")).distinct()
               .join(visited, "id", "left_anti")
               .withColumn("dist", F.lit(hop))
               .localCheckpoint(eager=True))
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select("id", F.col("dist").cast("int").alias("dist"))


def label_propagation(edges: DataFrame, rounds: int = 4,
                      src: str = "id1", dst: str = "id2",
                      seed_labels: DataFrame | None = None) -> DataFrame:
    """(id, community): community detection by SYNCHRONOUS label
    propagation (Raghavan et al. 2007) with deterministic tie-breaking.

    Every node starts labeled with its own id (or ``seed_labels``
    (id, label) where given — the semi-supervised form; seeded nodes
    are CLAMPED to their seed every round, the Zhu & Ghahramani
    convention, or synchronous majority voting washes sparse seeds
    out immediately); each round every node adopts the most frequent
    label among its neighbors, ties broken by the smallest label
    (give seeds labels below the node-id space so ties resolve
    toward them), isolated nodes keep theirs.
    Synchronous updates + min-label ties make the result a pure
    function of the edge set — unlike the asynchronous
    random-visit-order variant — so a fixed-round run is
    oracle-expressible as unrolled SQL (the driver checks it
    hash-exact; all-integer arithmetic).

    Scale shape: identical to ``pagerank`` — the static symmetrized
    edge list is checkpointed once; each round shuffles only
    (node, label) votes: one join keyed on the source, one
    count aggregate keyed on (dst, label), one per-node argmax
    window. Lineage is truncated per round (lazy checkpoint, one
    action materializes the whole chain). Convergence is typically
    <5 rounds on near-dup graphs; fixed ``rounds`` keeps the plan
    bounded and the result deterministic.
    """
    from pyspark.sql import Window

    # canonical edge list materialized BEFORE the symmetrizing union —
    # the union's two legs otherwise each inline the caller's whole
    # pair pipeline (r12 plan audit; guide §2.4)
    e0 = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .where(F.col("u") != F.col("v")).distinct()
          .localCheckpoint(eager=True))
    e = e0.unionByName(e0.select(F.col("v").alias("u"),
                                 F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))
    seeds = None
    if seed_labels is not None:
        seeds = (seed_labels.select(F.col("id"),
                                    F.col("label").alias("seed"))
                 .localCheckpoint(eager=True))
        labels = (nodes.join(seeds, "id", "left")
                  .select("id", F.coalesce("seed", F.col("id"))
                          .alias("label")))
    else:
        labels = nodes.select("id", F.col("id").alias("label"))
    win = Window.partitionBy("node").orderBy(F.col("n").desc(),
                                             F.col("label").asc())
    for _ in range(int(rounds)):
        votes = (e.join(labels.withColumnRenamed("id", "u"), "u")
                 .groupBy(F.col("v").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("n")))
        winner = (votes.withColumn("rn", F.row_number().over(win))
                  .where(F.col("rn") == 1)
                  .select(F.col("node").alias("id"),
                          F.col("label").alias("new_label")))
        labels = (labels.join(winner, "id", "left")
                  .select("id", F.coalesce("new_label", "label")
                          .alias("label")))
        if seeds is not None:
            labels = (labels.join(seeds, "id", "left")
                      .select("id", F.coalesce("seed", "label")
                              .alias("label")))
        labels = labels.localCheckpoint(eager=False)
    return labels.select("id", F.col("label").alias("community"))


def hits(edges: DataFrame, iterations: int = 6,
         src: str = "id1", dst: str = "id2") -> DataFrame:
    """(id, authority, hub): Kleinberg HITS by fixed-iteration power
    iteration over a DIRECTED edge list (u -> v endorses v).

    Update order is the standard one and is part of the contract the
    oracle mirrors: a' = A^T h (sum of hub scores over in-edges),
    L1-normalize; h' = A a' over out-edges from the NORMALIZED
    authorities, L1-normalize. Nodes with no in-edges hold authority
    0 (resp. hub 0 without out-edges) — they stay in the output.

    Scale shape: identical to ``pagerank`` — the deduped edge list is
    checkpointed once and only (node, double) score rows shuffle per
    round; the L1 total is a one-row aggregate broadcast back
    (never a window over all nodes). Fixed iteration count keeps the
    result deterministic and oracle-expressible as unrolled SQL;
    float drift under 6-decimal rounding is ~1e-13.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))
    hub = nodes.select("id", F.lit(1.0).alias("h"))
    auth = None
    # per half-round, the propagate-join + aggregate is materialized
    # (lazy checkpoint) BEFORE the L1 total reads it: uncheckpointed,
    # the aggregate subtree executed twice per half-round — once under
    # the broadcast total, once in the normalization leg (r12 audit;
    # ~2x the per-iteration join work). The total over the aggregate
    # rows equals the total over all nodes (absent nodes hold exact
    # 0.0), so the scores are unchanged.
    for _ in range(int(iterations)):
        a_in = (e.join(hub.withColumnRenamed("id", "u"), "u")
                .groupBy(F.col("v").alias("id"))
                .agg(F.sum("h").alias("a"))
                .localCheckpoint(eager=False))
        tot_a = a_in.agg(F.sum("a").alias("ta"))
        auth = (nodes.join(a_in, "id", "left")
                .join(F.broadcast(tot_a))
                .select("id", (F.coalesce("a", F.lit(0.0)) / F.col("ta"))
                        .alias("a"))
                .localCheckpoint(eager=False))
        h_out = (e.join(auth.withColumnRenamed("id", "v"), "v")
                 .groupBy(F.col("u").alias("id"))
                 .agg(F.sum("a").alias("h"))
                 .localCheckpoint(eager=False))
        tot_h = h_out.agg(F.sum("h").alias("th"))
        hub = (nodes.join(h_out, "id", "left")
               .join(F.broadcast(tot_h))
               .select("id", (F.coalesce("h", F.lit(0.0)) / F.col("th"))
                       .alias("h"))
               .localCheckpoint(eager=False))
    return (nodes.join(auth, "id").join(hub, "id")
            .select("id", F.round("a", 6).alias("authority"),
                    F.round("h", 6).alias("hub")))


def sssp(edges: DataFrame, sources: DataFrame, rounds: int = 6,
         src: str = "id1", dst: str = "id2", weight: str = "w",
         source_col: str = "id", directed: bool = True) -> DataFrame:
    """(id, dist): single-source (or multi-source) shortest WEIGHTED
    path lengths by ``rounds`` Bellman-Ford relaxation rounds — the
    weighted companion to ``bfs_distances`` (paths of at most
    ``rounds`` edges; weights must be non-negative for the truncation
    to be monotone).

    Per round every settled node relaxes its out-edges and each node
    keeps the MIN of its candidates — one join keyed on the source
    node + one MIN aggregate; only (node, double) rows shuffle, the
    checkpointed edge list never moves. MIN is order-independent and
    each candidate distance is the same IEEE addition chain on both
    engines, so results are BIT-exact against the unrolled-CTE
    oracle, unlike sum-based scores."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                      F.col(weight).cast("double").alias("w"))
         .where(F.col("u") != F.col("v"))
         .groupBy("u", "v").agg(F.min("w").alias("w")))
    if not directed:
        e = (e.unionByName(e.select(F.col("v").alias("u"),
                                    F.col("u").alias("v"), "w"))
             .groupBy("u", "v").agg(F.min("w").alias("w")))
    e = e.localCheckpoint(eager=True)
    dist = (sources.select(F.col(source_col).alias("id")).distinct()
            .withColumn("dist", F.lit(0.0))
            .localCheckpoint(eager=True))
    for _ in range(int(rounds)):
        relaxed = (e.join(dist.withColumnRenamed("id", "u"), "u")
                   .select(F.col("v").alias("id"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("id").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False))
    return dist.select("id", F.round("dist", 6).alias("dist"))


def kcore(edges: DataFrame, k: int = 3, rounds: int = 6,
          src: str = "id1", dst: str = "id2") -> DataFrame:
    """(id, deg): the k-core after ``rounds`` synchronous peeling
    rounds — every round removes ALL nodes of degree < k at once,
    then recounts (the cohesive-subgraph extractor: near-dup cluster
    cores, spam rings, engaged-user cores; a hub with many degree-1
    leaves is NOT cohesive and peels away).

    Synchronous peeling is a pure function of the edge set (unlike
    arbitrary-order sequential peeling narratives, the fixpoint is
    unique anyway — fixed synchronous rounds make the TRAJECTORY
    deterministic too, so a fixed-round run is oracle-expressible as
    unrolled SQL). Peeling converges in few rounds on real graphs;
    an unconverged run is still exact for "nodes surviving r peels".
    Per round: one degree aggregate over edges filtered to surviving
    endpoints — two semi-joins keyed on the node, (node, int) rows
    only, lineage truncated per round."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct())
    e = e.unionByName(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)
    alive = e.select(F.col("u").alias("id")).distinct() \
        .localCheckpoint(eager=True)
    deg = None
    for _ in range(int(rounds)):
        live = (e.join(alive.withColumnRenamed("id", "u"), "u",
                       "left_semi")
                .join(alive.withColumnRenamed("id", "v"), "v",
                      "left_semi"))
        deg = live.groupBy(F.col("u").alias("id")) \
            .agg(F.count(F.lit(1)).alias("deg"))
        alive = (deg.where(F.col("deg") >= k).select("id")
                 .localCheckpoint(eager=False))
    live = (e.join(alive.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("id", "v"), "v", "left_semi"))
    return (live.groupBy(F.col("u").alias("id"))
            .agg(F.count(F.lit(1)).cast("int").alias("deg"))
            .orderBy("id"))


def degree_assortativity(pairs: DataFrame, id1: str = "id1",
                         id2: str = "id2") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the undirected edge list —
    positive means hubs attach to hubs (social cores), negative means
    hubs attach to leaves (hub-and-spoke, most tech/dedup graphs).
    One degree aggregate, two broadcast joins back onto the edges,
    one algebraic finisher — the corr_matrix shape on graph
    structure; nothing scales past the edge scan. Each undirected
    edge contributes BOTH orientations (the standard symmetric
    estimator). Returns (n_edges, assortativity)."""
    e = (pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
         .unionByName(pairs.select(F.col(id2).alias("a"),
                                   F.col(id1).alias("b"))))
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("d")) \
        .withColumnRenamed("a", "node")
    ends = (e.join(F.broadcast(deg.withColumnRenamed("node", "a")
                               .withColumnRenamed("d", "da")), "a")
            .join(F.broadcast(deg.withColumnRenamed("node", "b")
                              .withColumnRenamed("d", "db")), "b"))
    agg = ends.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("da").cast("double").alias("sa"),
        F.sum("db").cast("double").alias("sb"),
        F.sum(F.col("da") * F.col("da")).cast("double").alias("saa"),
        F.sum(F.col("db") * F.col("db")).cast("double").alias("sbb"),
        F.sum(F.col("da") * F.col("db")).cast("double").alias("sab"))
    num = F.col("m") * F.col("sab") - F.col("sa") * F.col("sb")
    den = F.sqrt((F.col("m") * F.col("saa") - F.col("sa") * F.col("sa"))
                 * (F.col("m") * F.col("sbb")
                    - F.col("sb") * F.col("sb")))
    return agg.select((F.col("m") / 2).cast("long").alias("n_edges"),
                      F.round(F.try_divide(num, den), 6)
                      .alias("assortativity"))


def clustering_coefficient(edges: DataFrame, src: str = "id1",
                           dst: str = "id2") -> DataFrame:
    """(id, degree, n_triangles, clustering): local clustering
    coefficient per node — triangles / C(degree, 2), the "how
    clique-like is this node's neighborhood" readout that
    distinguishes a template FAMILY member (c -> 1) from a bridge
    between families (c -> 0) at equal degree. Composes
    triangle_count (degree-oriented, skew-bounded) with one degree
    aggregate; degree-1 nodes have no defined coefficient (NULL).
    All counts exact integers; one division."""
    tri = triangle_count(edges, src, dst)
    und = (edges.select(F.col(src).alias("n"))
           .unionByName(edges.select(F.col(dst).alias("n"))))
    deg = und.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    out = (deg.join(tri.withColumnRenamed("id", "n"), "n", "left")
           .withColumn("n_triangles",
                       F.coalesce("n_triangles", F.lit(0)))
           .withColumn("clustering",
                       F.round(F.try_divide(
                           2 * F.col("n_triangles"),
                           F.col("degree") * (F.col("degree") - 1)),
                           6)))
    return (out.select(F.col("n").alias("id"), "degree",
                       "n_triangles", "clustering")
            .orderBy("id"))


def modularity(edges: DataFrame, labels: DataFrame, src: str = "id1",
               dst: str = "id2", id_col: str = "id",
               label_col: str = "community") -> DataFrame:
    """One row (n_nodes, n_communities, m_edges, modularity): Newman
    modularity Q = sum_c (m_c/m - (d_c/2m)^2) of a partition over an
    undirected graph — the objective that says whether detected
    communities beat a degree-preserving random rewiring (Q > ~0.3 is
    real structure; ~0 means the partition is noise). The evaluation
    the label_propagation output needs before anyone trusts it —
    exactly silhouette's role for the vector clusters.

    One distinct-edge pass joined to the label table on both
    endpoints (intra-community edge counts), one degree aggregate
    joined once (community degree mass) — label-table-sized state;
    per-community terms quantize to 1e-15 ints so the sum is
    partitioning-invariant and the score oracle-exact."""
    # materialize the canonical edge list once: it is tiny (distinct
    # pairs) but its lineage is the caller's whole pair pipeline, and
    # FOUR legs consume it (the m count, intra, and both degree union
    # legs) — uncheckpointed, each leg re-ran that pipeline (r12 plan
    # audit; the m count is then metadata-cheap too)
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v")).distinct()
         .localCheckpoint(eager=True))
    la = labels.select(F.col(id_col).alias("u"),
                       F.col(label_col).alias("cu"))
    lb = labels.select(F.col(id_col).alias("v"),
                       F.col(label_col).alias("cv"))
    m = e.count()
    intra = (e.join(la, "u").join(lb, "v")
             .where(F.col("cu") == F.col("cv"))
             .groupBy(F.col("cu").alias("c"))
             .agg(F.count(F.lit(1)).alias("mc")))
    deg = (e.select(F.col("u").alias("id"))
           .unionByName(e.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    dmass = (deg.join(labels.select(F.col(id_col).alias("id"),
                                    F.col(label_col).alias("c")), "id")
             .groupBy("c").agg(F.sum("d").alias("dc")))
    per_c = dmass.join(intra, "c", "left").na.fill({"mc": 0})
    term = (F.col("mc") / F.lit(float(m))
            - (F.col("dc") / F.lit(2.0 * m))
            * (F.col("dc") / F.lit(2.0 * m)))
    q = F.lit(1e15)
    agg = per_c.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(F.round(term * q, 0).cast("long")).alias("tq"))
    nn = labels.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (agg.crossJoin(F.broadcast(nn))
            .select("n_nodes", "n_communities",
                    F.lit(m).alias("m_edges"),
                    F.round(F.col("tq") / q, 6).alias("modularity")))
