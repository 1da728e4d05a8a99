"""Graph propagation over candidate-pair edge lists.

Companion to dedup.connected_components / connected_components_star:
where those compute cluster MEMBERSHIP, pagerank_integer computes
centrality WITHIN the near-dup graph — "which document is the
canonical copy" ranking for dedup keep-policies.

Determinism by construction (same playbook as operators/kmeans.py):
ranks are bigint in 1e-9 units; per-edge contributions use truncating
integer division (Spark ``DIV`` == DuckDB ``//``), so shuffle order
cannot perturb a single bit and a chained-CTE SQL oracle replays the
iterations exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_integer(
    pairs: DataFrame,
    iters: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Integer PageRank over an UNDIRECTED pair list (id_a, id_b).

    pr_0 = SCALE // N per node; each round
    pr(v) = (15 * (SCALE // N)) // 100
            + sum over in-edges of (85 * (pr(u) DIV deg(u))) DIV 100.
    Undirected edges are mirrored, so every node has in-edges and no
    dangling-mass term is needed.

    Output: (node, degree, pr) — one row per node in the pair graph.

    Scale: edges and degrees are computed once and ``localCheckpoint``ed
    — like connected_components, an iterative plan that re-references
    its inputs each round grows the logical tree EXPONENTIALLY without
    a lineage cut (3 rounds over the LSH graph planned 238 broadcast
    joins before the cut, 3 after). Each iteration is then ONE
    equi-join (rank table to edge list on the source) plus one
    map-side-combined groupBy on the destination. O(iters) small
    shuffles, no all-pairs anything; the rank state is one bigint per
    node.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )

    n_nodes = deg.count()
    init = SCALE // max(n_nodes, 1)
    teleport = (15 * init) // 100

    pr = deg.select("node", "deg", F.lit(init).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .select(
                F.col("dst"),
                F.expr("(85 * (pr DIV deg)) DIV 100").alias("c"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            deg.join(contrib, "node")
            .select(
                "node",
                "deg",
                (F.lit(teleport).cast("long") + F.col("inflow")).alias("pr"),
            )
        )
    return pr.select(F.col("node").alias("doc_id"), F.col("deg").alias("degree"), "pr")


def hits_integer(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> tuple[DataFrame, DataFrame]:
    """Integer HITS (Kleinberg 1999) over a DIRECTED edge list:
    authority(dst) = sum of its sources' hub scores, hub(src) = sum
    of its targets' authority scores. Normalization is per FULL
    iteration on the hub side (hubs rescaled to max 1e6 with
    truncating DIV; authorities flow through raw and are rescaled
    once on output) — half the sync barriers of half-step
    normalization for the same fixed point direction, and still
    overflow-safe by construction: with hubs <= 1e6 entering a
    round, authority inflow <= in_degree * 1e6 and hub inflow <=
    out_degree * in_degree * 1e12 — DECIMAL(38,0)-exact to degree
    products of 1e26, far past any real graph. Every intermediate is
    a reproducible integer (the pagerank_integer discipline on the
    bipartite eigenpair). Returns (authorities(dst, a), hubs(src,
    h)), both max-normalized to 1e6.

    Scale: ``edges`` is staged (every half-step joins it); each
    iteration is two key-partitioned aggregate+joins; the hub inflow
    (two consumers: the max normalizer and the rescale) and the
    final authority inflow are staged before their branches. The max
    normalizer is a 1-ROW driver collect on the staged inflow (the
    k-means/BPE bounded model-state contract; a broadcast-crossJoin
    variant scheduled one broadcast-exchange job per half-step over
    the unmaterialized persist chain — measured 3x slower for
    identical results). O(iters) small shuffles; rank state is one
    bigint per node."""
    from ursa_major_choir_etl_spark.caching import stage

    # One staged copy of the edge list feeds all 2*iters scatter
    # joins. (A per-join-key co-partitioned pair of copies — the
    # bucketed layout a production deployment bakes into storage —
    # was tried here and measured SLOWER locally: with AQE re-
    # planning each query stage, the cached partitioning is not
    # reused and the second materialization is pure overhead.)
    edges = stage(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
    )
    h = (
        edges.select("src")
        .distinct()
        .withColumn("h", F.lit(1_000_000).cast("long"))
    )
    a_raw = None
    for i in range(iters):
        a_raw = (
            edges.join(h, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("ar"))
        )
        if i == iters - 1:
            a_raw = stage(a_raw)  # feeds the hub step AND the output
        h_raw = stage(
            edges.join(a_raw, "dst")
            .groupBy("src")
            .agg(F.sum("ar").alias("hr"))
        )
        hm = h_raw.agg(F.max("hr")).first()[0]
        if not hm:
            # Empty edge list: the max over zero groups is NULL (and a
            # zero max would divide by zero). Degrade to empty score
            # frames with the contract schema, like salsa_integer.
            return (
                a_raw.select(
                    "dst", F.col("ar").cast("bigint").alias("a")
                ).limit(0),
                h_raw.select(
                    "src", F.col("hr").cast("bigint").alias("h")
                ).limit(0),
            )
        h = h_raw.select(
            "src",
            F.expr(
                f"CAST(hr * 1000000 DIV {int(hm)} AS BIGINT)"
            ).alias("h"),
        )
    am = a_raw.agg(F.max("ar")).first()[0]
    if not am:
        return (
            a_raw.select(
                "dst", F.col("ar").cast("bigint").alias("a")
            ).limit(0),
            h.limit(0),
        )
    a = a_raw.select(
        "dst",
        F.expr(f"CAST(ar * 1000000 DIV {int(am)} AS BIGINT)").alias(
            "a"
        ),
    )
    return a, h


def salsa_integer(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> tuple[DataFrame, DataFrame]:
    """Integer SALSA (Lempel & Moran 2000) over a DIRECTED edge list —
    the random-walk sibling of :func:`hits_integer`: each half-step
    divides a node's score equally over its edges (truncating DIV by
    the node's own degree) instead of summing raw and renormalizing,
    so total mass is conserved (minus truncation dust) and NO global
    max barrier is needed — the whole ``iters``-round computation is
    ONE lazy chain of key-partitioned joins and aggregates with zero
    driver synchronization, the property that makes SALSA the
    preferred formulation at cluster scale (hits_integer pays one
    1-row sync per half-step; this pays none). Magnitudes are bounded
    by the initial total mass (n_src * 1e6), so plain BIGINT holds to
    1e12 sources. Returns (authorities(dst, a), hubs(src, h)).

    Scale: degrees are computed once and hung on the edge list (the
    staged ``ee`` adjacency feeds all 2*iters scatter joins); each
    iteration is two aggregate+joins; no collects, no normalization
    barriers, no windows."""
    from ursa_major_choir_etl_spark.caching import stage

    base = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    od = base.groupBy("src").agg(F.count(F.lit(1)).alias("dc"))
    idg = base.groupBy("dst").agg(F.count(F.lit(1)).alias("dp"))
    ee = stage(base.join(od, "src").join(idg, "dst"))
    h = od.select("src", F.lit(1_000_000).cast("long").alias("h"))
    a = None
    for i in range(iters):
        a = (
            ee.join(h, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("h DIV dc")).alias("a"))
        )
        if i == iters - 1:
            # the final authority table has TWO consumers (the last
            # hub half-step and the returned frame) — stage it or a
            # caller reading both outputs re-evaluates the whole
            # iteration chain once per output (measured ~2x warm).
            a = stage(a)
        h = (
            ee.join(a, "dst")
            .groupBy("src")
            .agg(F.sum(F.expr("a DIV dp")).alias("h"))
        )
    return a, h


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    assume_unique: bool = False,
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list —
    the clustering-coefficient numerator, and for a near-dup pair
    graph the "is this a template family or a chance collision"
    signal (triangle-rich neighborhoods = mutually-similar template
    clusters; triangle-free stars = one hub matching many unrelated
    docs).

    Algorithm: degree-ordered wedge join (the distributed-triangle
    standard). Edges are oriented from the lower-(degree, id) endpoint
    to the higher; each wedge (u->v, u->w) is generated at its
    lowest-degree apex, so per-node wedge fan-out is bounded by that
    node's OUT-degree under the orientation — O(sqrt(m)) worst case
    per node instead of the hub's full degree; the classic hub-killer
    for skewed similarity graphs. One join closes each wedge against
    the oriented edge set. Every triangle is generated exactly once.

    The oracle deliberately uses the naive ``a<b<c`` three-way
    self-join formulation — an independent derivation of the same
    set. Output: (node, n_triangles) for nodes in >= 1 triangle.
    """
    from ursa_major_choir_etl_spark.caching import stage

    # The edge list heads an expensive candidate-pair pipeline and
    # feeds FOUR plan branches (degrees, orientation, wedge self-join,
    # closing join) — stage it once or every branch re-runs the whole
    # upstream dedup pipeline (measured 85s -> ~2s at sf0.001).
    # ``assume_unique=True`` skips the dedup shuffle when the caller
    # guarantees one row per undirected edge in canonical (a<b) form
    # (e.g. dedup.jaccard_pairs output, which is grouped by pair
    # upstream). The sanitizing path canonicalizes the orientation
    # BEFORE distinct — an edge arriving as both (a,b) and (b,a)
    # must collapse to one row, or degrees/wedges/triangle counts all
    # double (review finding).
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if not assume_unique:
        edges = edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).distinct()
    e = stage(edges)
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # Orient each undirected edge from lower (degree, id) to higher.
    ranked = (
        und.join(deg.withColumnRenamed("u", "_n").withColumnRenamed("d", "du"),
                 F.col("u") == F.col("_n"))
        .drop("_n")
        .join(deg.withColumnRenamed("u", "_n").withColumnRenamed("d", "dv"),
              F.col("v") == F.col("_n"))
        .drop("_n")
    )
    # Also a multi-branch fan-out point (wedge self-join reads it
    # twice, the closing side twice more): stage the tiny oriented
    # edge list so the degree joins run once.
    oriented = stage(
        ranked.filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        ).select("u", "v")
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    closer = oriented.select(
        F.col("u").alias("cy"), F.col("v").alias("cz")
    ).unionByName(
        oriented.select(F.col("v").alias("cy"), F.col("u").alias("cz"))
    )
    tris = wedges.join(
        closer,
        (F.col("y") == F.col("cy")) & (F.col("z") == F.col("cz")),
        "inner",
    ).select("x", "y", "z")
    member = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
    )
    return member.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def kcore_membership(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 8,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """k-core decomposition by iterative peeling: drop every node of
    degree < k, recompute degrees on the induced subgraph, repeat.
    The k-core separates COHESIVE duplicate families (every member
    tied to >= k others — safe to collapse to one representative)
    from star/chain collision artifacts that connected components
    (q55/q77) lumps together; the standard densest-region screen on
    a near-dup graph before aggressive dedup.

    Deterministic by construction: each round is a pure function of
    the previous node set, so a chained-CTE oracle replays the same
    ``rounds`` peels bit-for-bit. ``rounds`` is FIXED (not
    converge-tested): both engines report the round-``rounds`` state,
    identical even mid-convergence; peeling cascades shrink the graph
    monotonically, and on bounded-cluster dedup graphs the fixpoint
    lands in 2-3 rounds (asserted converged in tests).

    Scale: per round, one semi-join of the staged edge list against
    the surviving node set per endpoint plus one map-side-combined
    degree aggregate — O(rounds) small shuffles, node state only.
    ``localCheckpoint`` cuts lineage per round (the q55/q93 lesson:
    an iterative plan that re-references its inputs grows the logical
    tree exponentially without the cut).

    Output: (node, core_degree) for nodes surviving the k-core, where
    core_degree is the node's degree WITHIN the core.
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("a").alias("node")).distinct()
    for _ in range(rounds):
        alive = (
            edges.join(nodes.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(nodes.withColumnRenamed("node", "b"), "b", "left_semi")
        )
        deg = alive.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        nodes = (
            deg.filter(F.col("deg") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    core_edges = (
        edges.join(nodes.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(nodes.withColumnRenamed("node", "b"), "b", "left_semi")
    )
    return core_edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def resource_allocation_link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int = 32,
    top_n: int = 20,
) -> DataFrame:
    """Link prediction by the Resource-Allocation index (Zhou, Lü &
    Zhang 2009) — the log-free sibling of Adamic–Adar (1/deg instead
    of 1/log deg), which keeps the whole score EXACT INTEGER:

        RA(a,b) = Σ_{z ∈ N(a) ∩ N(b)} 1/deg(z)   (scored in ppm:
        score_ppm = Σ 1e6 DIV deg(z))

    Candidates come from the wedge join (two neighbors of a common
    center), the q124 triangle pattern: pairs sharing >= 1 neighbor
    are exactly the pairs with RA > 0 — never all-pairs. Centers with
    deg > ``max_center_degree`` are excluded (documented recall
    trade): a hub's wedge fan-out is deg² while its RA contribution
    is the MINIMUM possible (1/deg), so dropping hubs bounds the
    blow-up at the least-informative end — the standard practical
    mitigation. Already-adjacent pairs are anti-joined out (link
    prediction scores absent edges only).

    ``edges`` must be canonical undirected (src < dst, no dups
    required — deduped here). Output: (id_a, id_b, n_common,
    score_ppm) top ``top_n`` by score desc, ties by ids.
    """
    from ursa_major_choir_etl_spark.caching import stage

    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).distinct()
    e = stage(e)
    adj = e.select(F.col("_s").alias("_z"), F.col("_d").alias("_n")).union(
        e.select(F.col("_d").alias("_z"), F.col("_s").alias("_n"))
    )
    deg = adj.groupBy("_z").agg(F.count(F.lit(1)).alias("_deg"))
    adjc = stage(
        adj.join(
            deg.filter(F.col("_deg") <= max_center_degree), "_z"
        ).select("_z", "_n", "_deg")
    )
    a = adjc.select("_z", F.col("_n").alias("id_a"), "_deg")
    b = adjc.select(F.col("_z").alias("_z2"), F.col("_n").alias("id_b"))
    wedges = a.join(
        b,
        (F.col("_z") == F.col("_z2")) & (F.col("id_a") < F.col("id_b")),
    )
    scored = wedges.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.expr("1000000 DIV _deg")).alias("score_ppm"),
    )
    existing = e.select(
        F.col("_s").alias("id_a"), F.col("_d").alias("id_b")
    )
    return (
        scored.join(existing, ["id_a", "id_b"], "left_anti")
        .orderBy(F.desc("score_ppm"), "id_a", "id_b")
        .limit(top_n)
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all edges — POSITIVE when
    high-degree nodes attach to each other (a template-cluster corpus
    in the near-dup graph: dup-heavy docs link among themselves),
    NEGATIVE for hub-and-spoke shapes (one boilerplate page linked by
    everything). The one-number shape diagnostic to read next to the
    q174 cluster-size spectrum.

    ``edges`` holds each undirected edge ONCE (id_a < id_b, the pair
    artifacts' contract); the statistic is computed over both ordered
    directions, which by symmetry reduces to three integer sums over
    the once-stored edges:

        S_jk = sum(d_a * d_b),  S_j = sum(d_a + d_b),
        S_j2 = sum(d_a^2 + d_b^2),  over M2 = 2M ordered pairs
        r = (M2 * 2*S_jk - S_j^2) / (M2 * S_j2 - S_j^2)

    — the Pearson square root disappears: both ordered directions are
    counted, so the source- and target-degree variances COINCIDE and
    sqrt(v*v) == v, making the statistic fully integer (floor-ppm at
    the single final division), all in DECIMAL(38,0). Shape:
    one degree aggregate (edge-cardinality), one broadcast join back,
    one global aggregate. Output single row:
    (n_nodes, n_edges, assortativity_ppm) — NULL when degenerate
    (all degrees equal: zero variance, e.g. a perfect matching).
    """
    both = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    )
    deg = (
        both.select(F.col("u").alias("n"))
        .unionAll(both.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    from ursa_major_choir_etl_spark.caching import stage

    deg = stage(deg)
    da = deg.select(F.col("n").alias("u"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("v"), F.col("d").alias("db"))
    j = both.join(da, "u").join(db, "v")
    sums = j.agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(F.expr("CAST(da AS DECIMAL(38,0)) * db")).alias("_sjk"),
        F.sum(F.expr("CAST(da AS DECIMAL(38,0)) + db")).alias("_sj"),
        F.sum(
            F.expr(
                "CAST(da AS DECIMAL(38,0)) * da"
                " + CAST(db AS DECIMAL(38,0)) * db"
            )
        ).alias("_sj2"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    out = (
        sums.crossJoin(F.broadcast(nn))
        .withColumn("_m2", F.expr("CAST(2 AS DECIMAL(38,0)) * _m"))
        .withColumn("_num", F.expr("_m2 * 2 * _sjk - _sj * _sj"))
        .withColumn("_den2", F.expr("_m2 * _sj2 - _sj * _sj"))
    )
    # By symmetry (each edge counted in both directions) the two
    # degree-variance factors under the square root coincide, so
    # sqrt((M2*Sj2 - Sj^2)^2) == _den2 EXACTLY — no isqrt needed at
    # all, which is why this statistic can be fully integer.
    return out.select(
        "n_nodes",
        F.col("_m").alias("n_edges"),
        F.expr(
            "CASE WHEN _den2 > 0 THEN"
            " CAST(_num * 1000000 DIV _den2 AS BIGINT) END"
        ).alias("assortativity_ppm"),
    )
