"""Iterative connected components on DataFrames (large-star / small-star).

Stage C of the north-star pipeline: collapse owl:sameAs edge sets into
canonical clusters. GraphFrames is unavailable in this sandbox, so this is
the alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed directly as
DataFrame programs — the same plan GraphFrames produces:

  large-star: for each node u, attach every neighbor v > u to min(N(u)∪{u})
  small-star: for each node u, attach every neighbor v <= u to the minimum

Each round is two shuffles on the node id; convergence is detected by an
edge-set checksum; ``localCheckpoint`` every round truncates the plan/
lineage (an iterative algorithm would otherwise compound the DAG).
Deterministic: ids are longs, min-based, no randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u").isNotNull() & F.col("v").isNotNull()
    )
    return e.where(F.col("u") != F.col("v")).select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient edges high -> low, group by the high node
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attach = (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    return attach


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Edge list -> (node, component) with component = min node id of the
    cluster. Converges in O(log n) alternating rounds."""
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    prev_sum = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        # cheap convergence checksum: count + decimal sum of endpoints
        # (node ids span the full int64 range — hashed ids — so a bigint
        # sum overflows under ANSI; decimal(38) cannot)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("u").cast("decimal(38,0)") + F.col("v").cast("decimal(38,0)")),
                F.lit(0),
            ).alias("s"),
        ).first()
        checksum = (row["n"], row["s"])
        if checksum == prev_sum:
            break
        prev_sum = checksum
    else:
        raise RuntimeError(f"connected components did not converge in {max_iterations} rounds")
    # converged edges are canonical (u = cluster minimum = root, v = member)
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).distinct()
