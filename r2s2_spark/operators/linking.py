"""Stages L + C — entity linking and canonicalization (north-star
extensions beyond the reference; r2s2 links rows only by exact subject
equality, TableMergingConcurence.java J1/J2).

  L: mentions (entity id + text) -> MinHash-LSH blocking (dedup.py) ->
     salted, skew-aware scoring join (token Jaccard) -> owl:sameAs edges
  C: sameAs edges -> iterative connected components (components.py) ->
     canonical id per cluster -> subject rewrite view

Node ids for the component algorithm are ``xxhash64(entity)`` longs —
deterministic across retries and executors (an AtomicLong counter like the
reference's bnode numbering is illegal under Spark's retry semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..naming import OWL_SAMEAS
from . import dedup
from .components import connected_components
from .skew import salted_join


def link_mentions(
    mentions: DataFrame,
    id_col: str = "entity_id",
    text_col: str = "mention",
    k: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.7,
    max_bucket: int = 50,
) -> DataFrame:
    """Mentions -> scored owl:sameAs candidate edges (a_id, b_id, jaccard, p).

    Blocking is banded MinHash-LSH (never an n^2 cross join); scoring is
    exact token Jaccard computed on the blocked pairs; the pair->gram
    scoring join is salted (hot mentions share boilerplate tokens and
    would otherwise pile onto single reducers).
    """
    docs = mentions.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    sigs = dedup.minhash_signatures(docs, k=k)
    pairs = dedup.lsh_candidate_pairs(sigs, k=k, rows_per_band=rows_per_band, max_bucket=max_bucket)
    scored = dedup.token_jaccard_pairs(docs, pairs, threshold=threshold)
    return scored.select(
        F.col("a_id").alias("src"),
        F.col("b_id").alias("dst"),
        F.col("jaccard").alias("score"),
        F.lit(OWL_SAMEAS).alias("p"),
    )


def canonical_mapping(
    mentions: DataFrame,
    edges: DataFrame,
    id_col: str = "entity_id",
) -> DataFrame:
    """sameAs edges -> (entity_id, canonical_id): every entity mapped to
    its cluster representative (lexicographic min of the cluster), via
    large-star/small-star connected components over hashed node ids."""
    nodes = mentions.select(F.col(id_col).alias("entity")).distinct().withColumn(
        "node", F.xxhash64("entity")
    )
    edge_ids = (
        edges.join(nodes.withColumnRenamed("entity", "src"), "src")
        .withColumnRenamed("node", "src_node")
        .join(nodes.withColumnRenamed("entity", "dst"), "dst")
        .withColumnRenamed("node", "dst_node")
        .select("src_node", "dst_node")
    )
    comp = connected_components(edge_ids, "src_node", "dst_node")
    # Only entities that appear in an edge are in `comp`; everything else
    # is a singleton cluster and maps to ITSELF with no join at all.
    # (Never broadcast the representatives: reps is O(#linked clusters),
    # which at billions of mentions is itself a big table — a forced
    # broadcast would OOM the driver. Shuffle join; AQE picks broadcast
    # automatically when reps happens to be small.)
    linked = nodes.join(comp, "node").select("entity", "component")
    reps = linked.groupBy("component").agg(F.min("entity").alias("canonical_id"))
    linked_mapped = linked.join(reps, "component").select(
        F.col("entity").alias(id_col), "canonical_id"
    )
    singletons = nodes.join(comp, "node", "left_anti").select(
        F.col("entity").alias(id_col), F.col("entity").alias("canonical_id")
    )
    return linked_mapped.unionByName(singletons)


def rewrite_subjects(
    triples: DataFrame,
    mapping: DataFrame,
    subject_col: str = "s",
) -> DataFrame:
    """Apply the canonical mapping to a triple view: subjects collapse to
    their cluster representative. Salted join — canonical subjects are the
    definition of a hot key (every statement of a big cluster lands on
    one id)."""
    dim = mapping.select(
        F.col("entity_id").alias(subject_col), F.col("canonical_id")
    )
    out = salted_join(triples, dim, subject_col, n_salt=8, how="left")
    return out.withColumn(
        subject_col, F.coalesce(F.col("canonical_id"), F.col(subject_col))
    ).drop("canonical_id")
