"""Deterministic distributed k-means (Lloyd's algorithm) over an
embedding column — the "iterative algorithm" family, built so that even
a SQL oracle can replay it bit-for-bit.

Determinism by construction (the cross-engine float pitfalls, all
avoided):
- vectors are integer-scaled (micro-units) BEFORE any arithmetic, so
  distances and centroid sums are exact bigint math — shuffle order
  cannot change a single bit;
- centroid means use truncating integer division (Spark ``DIV`` ==
  DuckDB ``//``, both toward zero);
- initial centroids are the k smallest ids (no RNG);
- argmin ties break on the smaller centroid id.

Spark shape (the 1000-executor story): centroids are model state —
k x dims bigints — collected to the driver each round and rebroadcast
as an 8-row table; assignment is a broadcast nested-loop over that
tiny table (never a shuffle of the corpus); the centroid update is one
posexplode + map-side-combined groupBy(cid, dim) shuffle of at most
k x dims cells per executor. Per iteration: exactly one small shuffle.
This is the canonical Spark k-means layout (pyspark.ml's KMeans does
the same collect-and-broadcast of cluster centers per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sq_dist(a, b):
    """Exact integer squared L2 distance between two bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _lloyd_rounds(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    iters: int,
    scale: int,
    id_col: str,
    vec_col: str,
):
    """Shared Lloyd driver loop: returns (assigned, cents) after
    ``iters`` rounds — ``assigned`` is (id, cid, _xi) of the FINAL
    assignment, ``cents`` the post-update centroid list. Both the
    stats query (kmeans_lloyd_integer) and the semantic-dedup
    assignment consumer (kmeans_assignments_integer) replay the exact
    same deterministic rounds, so their SQL oracles share CTEs too."""
    from ursa_major_choir_etl_spark.caching import stage

    xi_df = stage(
        emb.select(
            F.col(id_col),
            F.transform(
                vec_col, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
            ).alias("_xi"),
        )
    )

    seed_rows = xi_df.orderBy(id_col).limit(k).collect()
    cents: list[tuple[int, list[int]]] = [
        (cid, list(row["_xi"])) for cid, row in enumerate(seed_rows)
    ]

    assigned = None
    for _ in range(iters):
        cents_df = spark.createDataFrame(
            cents, schema="cid bigint, c array<bigint>"
        )
        scored = xi_df.crossJoin(F.broadcast(cents_df)).withColumn(
            "_d", _sq_dist(F.col("_xi"), F.col("c"))
        )
        best = F.min(
            F.struct(
                F.col("_d").alias("d"),
                F.col("cid").alias("cid"),
                F.col("_xi").alias("xi"),
            )
        ).alias("m")
        assigned = (
            scored.groupBy(id_col)
            .agg(best)
            .select(F.col(id_col), F.col("m.cid").alias("cid"), F.col("m.xi").alias("_xi"))
        )
        sums = (
            assigned.select("cid", F.posexplode("_xi").alias("pos", "xd"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(xd) DIV count(*)").alias("cv"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for row in sums:
            by_cid.setdefault(row["cid"], {})[row["pos"]] = row["cv"]
        cents = [
            (
                cid,
                [by_cid[cid][d] for d in range(len(old))]
                if cid in by_cid
                else old,
            )
            for cid, old in cents
        ]

    return assigned, cents


def kmeans_lloyd_integer(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dims: int = 4,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return per-cluster stats.

    Output: (cid, n_members, sum_vec_id, c_0..c_{out_dims-1}) — member
    count and exact id-sum of the FINAL assignment, plus the first
    ``out_dims`` coordinates of the centroid recomputed from it (all
    bigint; empty clusters keep their previous centroid and emit no
    stats row, mirroring the oracle's group-by).
    """
    assigned, cents = _lloyd_rounds(spark, emb, k, iters, scale, id_col, vec_col)
    final_c = {cid: v for cid, v in cents}
    stats = assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum(id_col).alias("sum_vec_id"),
    )
    cent_rows = [
        (cid, *final_c[cid][:out_dims]) for cid, _ in cents
    ]
    cent_df = spark.createDataFrame(
        cent_rows,
        schema="cid bigint, " + ", ".join(f"c_{d} bigint" for d in range(out_dims)),
    )
    return stats.join(F.broadcast(cent_df), "cid")


def kmeans_assignments_integer(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final-round cluster ASSIGNMENTS (id, cid) — the clustering
    stage of SemDeDup-style semantic dedup, bit-replayable in SQL via
    the same deterministic rounds as kmeans_lloyd_integer."""
    assigned, _ = _lloyd_rounds(spark, emb, k, iters, scale, id_col, vec_col)
    return assigned.select(F.col(id_col), F.col("cid"))


def hierarchical_assignments(
    spark: SparkSession,
    emb: DataFrame,
    assignments: DataFrame,
    max_cluster_size: int,
    k_split: int = 4,
    iters: int = 2,
    max_depth: int = 4,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The semantic-dedup skew escape hatch (similarity.semantic_dedup
    docstring's "hierarchical k-means for skewed ones", now real):
    any cluster whose membership exceeds ``max_cluster_size`` is
    re-clustered with a ``k_split``-way deterministic Lloyd pass over
    its own members, recursively (up to ``max_depth`` levels), until
    every cluster fits. Returns a refined (id, cid) assignment whose
    cids remain unique: split children get
    ``offset + parent_index * k_split + sub_cid`` with ``offset``
    above the current max cid, deterministic across runs.

    Semantics contract (what semantic_dedup over the refined
    assignment preserves vs the unsplit one, pinned by
    tests/test_skew.py): splitting only REMOVES cross-subcluster
    comparisons — every drop decision under the refined assignment is
    also a drop under the parent assignment (same keep-smaller-id
    rule, a subset of the pairs); no new drops can appear. That is
    the standard SemDeDup trade: bounded |c|^2 task cost for a
    recall haircut confined to the split clusters.

    Scale shape: the oversize-cluster list is COLLECTED to the driver
    — by construction there are at most corpus_size /
    max_cluster_size oversize clusters, and in practice the escape
    hatch exists for a HANDFUL of mega-clusters (the k-means
    degenerate case), so the driver loop is short; each split is one
    membership semi-join + the per-round broadcast Lloyd pass over
    that cluster's members only. The common path (nothing oversize)
    is one aggregate and returns the input unchanged.
    """
    asg = assignments.select(F.col(id_col), F.col("cid").cast("long"))
    for _ in range(max_depth):
        sizes = asg.groupBy("cid").agg(F.count(F.lit(1)).alias("_n"))
        stats = sizes.agg(
            F.max("cid").alias("_maxcid"),
            F.sum(
                (F.col("_n") > max_cluster_size).cast("int")
            ).alias("_n_over"),
        ).collect()[0]
        if not stats["_n_over"]:
            return asg
        oversize = sorted(
            r["cid"]
            for r in sizes.filter(F.col("_n") > max_cluster_size).collect()
        )
        offset = int(stats["_maxcid"]) + 1
        kept = asg.join(
            sizes.filter(F.col("_n") <= max_cluster_size).select("cid"),
            "cid",
            "left_semi",
        )
        refined = [kept]
        for idx, cid in enumerate(oversize):
            members = emb.join(
                asg.filter(F.col("cid") == cid).select(id_col),
                id_col,
                "left_semi",
            )
            sub = kmeans_assignments_integer(
                spark,
                members,
                k=k_split,
                iters=iters,
                scale=scale,
                id_col=id_col,
                vec_col=vec_col,
            )
            refined.append(
                sub.select(
                    F.col(id_col),
                    (
                        F.lit(offset + idx * k_split) + F.col("cid")
                    ).cast("long").alias("cid"),
                )
            )
        out = refined[0]
        for frame in refined[1:]:
            out = out.unionByName(frame)
        asg = out
    return asg
