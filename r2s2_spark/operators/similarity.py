"""Similarity search (ANN) over an embedding column.

Three strategies (SURVEY.md §2 extension):
- brute-force cosine top-k: the correctness baseline. A broadcast of the
  query vector + one projection + one top-k — no shuffle except the final
  k-row ordering.
- hyperplane-bucket (LSH) top-k: data-independent cells. Candidates are
  restricted to the query's random-hyperplane sign bucket (2^n_bits
  balanced cells; Rademacher projections mix all dimensions), optionally
  widened to flip-1-bit neighbor buckets (multi-probe); recall < 1 by
  construction, latency O(n_probes * n / 2^bits).
- IVF (inverted file) top-k: DATA-DEPENDENT cells from a deterministic
  k-means coarse quantizer (seeded driver-side Lloyd iterations over a
  bounded sample — the full-data pass is only the one-projection
  assignment). Queries rank centroids by similarity and probe the top
  ``n_probes`` cells. IVF cells follow the data distribution, so recall
  at equal probe budget beats data-independent hashing on clustered
  embeddings — the standard trade (FAISS IVF-Flat; training cost +
  centroid shipping vs. hash-only).

At 100 TB the cell/bucket column is a partition key: pruning turns a
full scan into a handful of partitions. Ties are broken on (rounded
similarity desc, id asc) so results are deterministic across engines.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing


def _query_vec(emb: DataFrame, query_id: int, id_col: str, vec_col: str):
    row = emb.where(F.col(id_col) == query_id).select(vec_col).first()
    if row is None:
        raise KeyError(f"no vector with {id_col}={query_id}")
    return [float(x) for x in row[0]]


# -- shared-norm cosine pieces ----------------------------------------------
# hashing.cosine_similarity(row, lit(q)) evaluates THREE O(dim) folds per
# row (dot, |row|, |q|) — and the constant-side norm |q| re-folds a literal
# array for every row because Catalyst does not constant-fold lambda-based
# higher-order functions. These helpers keep the produced doubles
# BIT-IDENTICAL (same IEEE ops in the same left-to-right order, same
# dot / (na * nb) association) while computing each constant norm once in
# Python and letting callers project the row norm once per row instead of
# once per centroid/query reference.


def _dot_lit(vec_col: str, coefs: list[float]):
    """aggregate(zip_with(vec, lit(coefs))) — the dot fold of
    hashing.cosine_similarity, verbatim."""
    lit_arr = F.array(*[F.lit(float(x)) for x in coefs])
    return hashing.dot_fold(F.col(vec_col), lit_arr)


def _row_norm(vec_col: str):
    """sqrt of the self-dot fold — hashing.cosine_similarity's na, verbatim."""
    return hashing.norm_fold(F.col(vec_col))


def _py_norm(coefs: list[float]) -> float:
    """Python twin of the constant-side norm fold: left-to-right
    accumulation then sqrt, both IEEE double — bit-identical to the
    Catalyst fold over the same literals."""
    import math

    acc = 0.0
    for x in coefs:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _cosine_lit(vec_col: str, coefs: list[float], na=None):
    """cosine_similarity(vec, lit(coefs)) with the constant norm folded at
    plan-build time; pass ``na`` (a projected row-norm column) to share
    the row-side fold across several cosines."""
    if na is None:
        na = _row_norm(vec_col)
    return _dot_lit(vec_col, coefs) / (na * F.lit(_py_norm(coefs)))


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
    sim = F.round(_cosine_lit(vec_col, q), 4)
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
    sim = F.round(_cosine_lit(vec_col, [float(x) for x in query_vec]), 4)
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
    sim = F.round(_cosine_lit(vec_col, q), 4)
    return (
        emb.where(
            hashing.hyperplane_bucket(F.col(vec_col), planes).isin(probes)
            & (F.col(id_col) != query_id)
        )
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# --- IVF: deterministic k-means coarse quantizer ---------------------------


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer for IVF. Training runs DRIVER-SIDE
    over a BOUNDED sample (``sample`` rows — the ``takeOrdered`` by
    xxhash64(id) is a deterministic pseudo-random sample costing one
    scan + a top-k, no shuffle of the data itself); a FIXED number of
    Lloyd iterations from deterministic seeds (the ``n_cells`` lowest-
    hash sample rows) makes the centroids reproducible across runs and
    engines — no convergence-dependent nondeterminism. Centroids are
    L2-normalized so cosine ranking reduces to a dot product.

    Empty cells re-seed to the sample vector FARTHEST from its assigned
    centroid (deterministic, classic k-means++-style repair)."""
    import numpy as np

    rows = (
        emb.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"))
        .withColumn("sh", F.xxhash64(F.col("sid").cast("string")))
        .orderBy("sh", "sid")
        .limit(sample)
        .collect()
    )
    if len(rows) < n_cells:
        raise ValueError(
            f"IVF needs >= n_cells sample vectors ({len(rows)} < {n_cells})"
        )
    X = np.array([[float(x) for x in r.sv] for r in rows], dtype=np.float64)
    return _lloyd(X, n_cells, iters)


def _lloyd(X, n_cells: int, iters: int) -> list[list[float]]:
    """Fixed-iteration Lloyd over a normalized sample matrix (numpy-only,
    driver-side). Separated from the Spark sampling so the empty-cell
    repair rule is directly unit-testable."""
    import numpy as np

    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_cells].copy()
    for _ in range(iters):
        sims = X @ C.T                     # (n, k) cosine on normalized
        assign = np.argmax(sims, axis=1)   # first max wins: deterministic
        # empty-cell repair points: worst-fit sample rows, FARTHEST from
        # their assigned centroid first, each used at most once per
        # iteration — two empty cells in the same iteration reseed to
        # DISTINCT vectors (same-point reseeds would stay duplicate
        # centroids forever under first-max-wins assignment, silently
        # shrinking the effective cell count)
        repair_order = np.argsort(np.max(sims, axis=1), kind="stable")
        repair_at = 0
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
            else:
                C[j] = X[int(repair_order[repair_at])]
                repair_at += 1
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in c] for c in C]


def _cell_expr(centroids: list[list[float]], vec_col: str, na=None):
    """argmax-similarity cell id as ONE Catalyst expression: an array of
    cosines + array_position of the max (first max wins — the same tie
    rule as the numpy argmax in training). Plan size is O(n_cells * dim)
    literals — fine to a few hundred cells; past that, assign through an
    Arrow matmul (functions/hashing.py embedding fast-path pattern)
    instead.

    Per-row cost is ``n_cells`` dot folds plus ONE row-norm fold when the
    caller projects ``na`` (the centroid norms are plan-time literals) —
    the previous form ran 3 folds per centroid (dot + row norm + a
    re-folded constant norm: 24 at 8 cells; measured 2.7 s -> 1.1 s noop
    for the full-probe query at sf0.1). The produced cosines are
    bit-identical (same fold order, same association), so every cell
    assignment — including partial-probe recall goldens — is unchanged."""
    dots = F.array(*[_cosine_lit(vec_col, c, na=na) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def _rank_cells(centroids: list[list[float]], query_vec: list[float]) -> list[int]:
    """Cell ids by centroid similarity to the query, best first
    (driver-side — n_cells values, ties by cell id)."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    sims = np.array(centroids, dtype=np.float64) @ q
    return [int(i) for i in np.lexsort((np.arange(len(sims)), -sims))]


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probes: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k without a materialized index: assign-on-the-fly (one
    projection), probe the ``n_probes`` cells whose centroids are most
    similar to the query, brute-force within. ``n_probes == n_cells``
    probes everything — EXACT top-k (the driver-gated configuration; the
    partial-probe recall trade is pytest-golden)."""
    if centroids is None:
        centroids = kmeans_centroids(
            emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
    q = _query_vec(emb, query_id, id_col, vec_col)
    probes = _rank_cells(centroids, q)[:n_probes]
    # the row norm is projected ONCE and shared by the cell assignment and
    # the query cosine (the aggregate fold is non-cheap, so Catalyst's
    # CollapseProject keeps the projection instead of inlining it per use)
    na = F.col("__na")
    sim = F.round(_cosine_lit(vec_col, q, na=na), 4)
    return (
        emb.where(F.col(id_col) != query_id)
        .withColumn("__na", _row_norm(vec_col))
        .where(_cell_expr(centroids, vec_col, na=na).isin(probes))
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the IVF cell as a PARTITION KEY (same layout contract
    as :func:`build_ann_index`): partitionBy(cell) parquet + the trained
    centroids as JSON beside it (vocabulary-sized — n_cells * dim
    floats), so queries rank cells without retraining. Returns the
    centroids."""
    centroids = kmeans_centroids(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    (
        emb.withColumn("__na", _row_norm(vec_col))
        .withColumn("cell", _cell_expr(centroids, vec_col, na=F.col("__na")))
        .drop("__na")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    spark = emb.sparkSession
    spark.createDataFrame(
        [(json.dumps(centroids),)], "centroids string"
    ).coalesce(1).write.mode("overwrite").json(path + "_centroids")
    return centroids


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Top-k over a :func:`build_ivf_index` dataset: the probed cells are
    a partition-column predicate — Spark lists and reads ONLY those cell
    directories (PartitionFilters, plan-asserted in tests)."""
    centroids = json.loads(
        spark.read.json(path + "_centroids").first().centroids
    )
    probes = _rank_cells(centroids, query_vec)[:n_probes]
    sim = F.round(_cosine_lit(vec_col, [float(x) for x in query_vec]), 4)
    df = spark.read.parquet(path).where(F.col("cell").isin(probes))
    if exclude_id is not None:
        df = df.where(F.col(id_col) != exclude_id)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
