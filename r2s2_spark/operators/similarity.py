"""Similarity search (ANN) over an embedding column.

Two strategies (SURVEY.md §2 extension):
- brute-force cosine top-k: the correctness baseline. A broadcast of the
  query vector + one projection + one top-k — no shuffle except the final
  k-row ordering.
- hyperplane-bucket (IVF/LSH-style) top-k: the scale path. Candidates are
  restricted to the query's random-hyperplane sign bucket (2^n_bits
  balanced cells; Rademacher projections mix all dimensions), optionally
  widened to flip-1-bit neighbor buckets (multi-probe); recall < 1 by
  construction, latency O(n_probes * n / 2^bits).

At 100 TB the bucket column is a partition key: bucket pruning turns a
full scan into a handful of partitions. Ties are broken on (rounded
similarity desc, id asc) so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing


def _query_vec(emb: DataFrame, query_id: int, id_col: str, vec_col: str):
    row = emb.where(F.col(id_col) == query_id).select(vec_col).first()
    if row is None:
        raise KeyError(f"no vector with {id_col}={query_id}")
    return [float(x) for x in row[0]]


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine to the query vector (query excluded).
    The query vector ships as a literal array — Catalyst constant-folds the
    norm; the scan stays a single stage with a takeOrdered at the end."""
    q = _query_vec(emb, query_id, id_col, vec_col)
    q_lit = F.array(*[F.lit(x) for x in q])
    sim = F.round(hashing.cosine_similarity(F.col(vec_col), q_lit), 4)
    return (
        emb.where(F.col(id_col) != query_id)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def build_ann_index(
    emb: DataFrame,
    path: str,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize the hyperplane bucket as a PARTITION KEY: the parquet
    dataset is written partitionBy(bkt), so an indexed query's scan is
    physically pruned to the probed cells (PartitionFilters in the plan —
    asserted in tests). This is the concrete 100 TB layout the bucketed
    search docstrings promise: latency O(n_probes * n / 2^n_bits) IO, not
    a full scan with a post-filter."""
    if dim is None:
        dim = emb.select(F.size(F.col(vec_col))).first()[0]
    planes = hashing.rademacher_planes(n_bits, dim)
    (
        emb.withColumn("bkt", hashing.hyperplane_bucket(F.col(vec_col), planes))
        .repartition("bkt")
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(path)
    )


def cosine_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Top-k over a :func:`build_ann_index` dataset: the bucket filter is a
    partition-column predicate, so Spark lists and reads ONLY the probed
    cell directories."""
    planes = hashing.rademacher_planes(n_bits, len(query_vec))
    q_bucket = "".join(
        "1" if sum(c * x for c, x in zip(coefs, query_vec)) >= 0 else "0"
        for coefs in planes
    )
    probes = probe_buckets(q_bucket, n_probes)
    q_lit = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(hashing.cosine_similarity(F.col(vec_col), q_lit), 4)
    df = spark.read.parquet(path).where(F.col("bkt").isin(probes))
    if exclude_id is not None:
        df = df.where(F.col(id_col) != exclude_id)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def probe_buckets(q_bucket: str, n_probes: int) -> list[str]:
    """Multi-probe bucket list: the exact bucket first, then flip-1-bit
    neighbors in bit order, up to ``n_probes`` buckets total."""
    probes = [q_bucket]
    for i in range(len(q_bucket)):
        if len(probes) >= n_probes:
            break
        flipped = q_bucket[:i] + ("0" if q_bucket[i] == "1" else "1") + q_bucket[i + 1:]
        probes.append(flipped)
    return probes[:n_probes]


def cosine_topk_bucketed(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF/LSH-style top-k: only vectors in the query's random-hyperplane
    sign bucket (2^n_bits balanced cells — 256 at the default) compete;
    ``n_probes`` > 1 additionally probes flip-1-bit neighbor buckets
    (multi-probe LSH), trading latency back for recall. With the bucket as
    a partition key this is a partition-pruned scan of n_probes cells."""
    q = _query_vec(emb, query_id, id_col, vec_col)
    planes = hashing.rademacher_planes(n_bits, len(q))
    # query bucket computed driver-side with the same planes (exact ±1
    # coefficients -> identical sign as the Catalyst expression)
    q_bucket = "".join(
        "1" if sum(c * x for c, x in zip(coefs, q)) >= 0 else "0" for coefs in planes
    )
    probes = probe_buckets(q_bucket, n_probes)
    q_lit = F.array(*[F.lit(x) for x in q])
    sim = F.round(hashing.cosine_similarity(F.col(vec_col), q_lit), 4)
    return (
        emb.where(
            hashing.hyperplane_bucket(F.col(vec_col), planes).isin(probes)
            & (F.col(id_col) != query_id)
        )
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
