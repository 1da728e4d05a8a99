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
