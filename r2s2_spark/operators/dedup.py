"""Deduplication operators for training-data pipelines.

Five families, each a DataFrame program (SURVEY.md §2 extension; these are
also the building blocks of the entity-linking stage L):

- exact:        hash-groupBy on normalized content
- MinHash+LSH:  shingle -> k minhashes -> banded buckets -> candidate pairs
- SimHash:      bit-majority fingerprint, equal-hash grouping
- n-gram Jaccard: exact overlap scoring of candidate pairs
- embedding cosine: near-duplicates by vector similarity

Scale notes: every candidate generation is *blocked* (band buckets /
sign buckets) — never an O(n^2) cross join. Hot LSH buckets (boilerplate
shingles) are the classic skew source: ``lsh_candidate_pairs`` caps bucket
width and salts the self-join, and AQE skew-join handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing, text


def deterministic_shard(id_col: str) -> "F.Column":
    """Deterministic 16-way shard key from the first hex digit of
    md5(id) — replayable verbatim by a SQL oracle (DuckDB has the same
    ``instr``/``substr``/``md5``), uniform over hex digits, and stable
    across retries/cluster sizes (never ``rand()``)."""
    return F.expr(
        f"instr('0123456789abcdef', substr(md5(cast({id_col} as string)), 1, 1)) - 1"
    ).cast("bigint")


def pack_by_token_budget(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str | None = None,
    global_order: bool = False,
) -> DataFrame:
    """Sequence packing for pretraining: concatenate documents in id order
    and cut at ``budget``-token boundaries — each document's bin is
    floor(start_offset / budget) over the exclusive running token count
    (concat-then-chunk semantics: a straddling document belongs to the bin
    it STARTS in). Deterministic: id order, never random.

    Scale-safe by DEFAULT: documents take a deterministic 16-way shard key
    (:func:`deterministic_shard`) and each shard packs independently under
    its own window — bins are (shard_id, bin_id) pairs and no
    single-partition stage exists. ``part_col`` shards on an existing
    column instead (e.g. a corpus/source shard — the right key at 100 TB).
    ``global_order=True`` is the explicit opt-in for one whole-corpus
    concat order through a single global window (the literal "moving all
    data to a single partition" plan) — corpus-manifest sizes only."""
    n_tok = text.token_count(F.col(text_col)).cast("bigint")
    if global_order:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        return docs.select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            F.floor(
                F.coalesce(F.sum(n_tok).over(w), F.lit(0)) / budget
            ).cast("bigint").alias("bin_id"),
        )
    if part_col is None:
        part_col = "shard_id"
        docs = docs.withColumn(part_col, deterministic_shard(id_col))
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        F.col(id_col),
        F.col(part_col),
        n_tok.alias("n_tokens"),
        F.floor(
            F.coalesce(F.sum(n_tok).over(w), F.lit(0)) / budget
        ).cast("bigint").alias("bin_id"),
    )


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    (fingerprint, n_dups, keep_id, dup_ids)."""
    fp = text.fingerprint(F.col(text_col))
    return (
        docs.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, mh0..mh{k-1}) — one shuffle: explode tokens, groupBy doc.
    Tokens are distinct-per-doc first (set semantics of Jaccard)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(text.tokens(F.col(text_col)))).alias("tok")
    )
    return toks.groupBy(id_col).agg(*hashing.minhash_signature_agg(F.col("tok"), k))


def lsh_candidate_pairs(
    sigs: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket: int = 50,
) -> DataFrame:
    """Banded LSH: docs sharing any band become a candidate pair (a < b).

    Skew handling: buckets wider than ``max_bucket`` are truncated to the
    first ``max_bucket`` members by id (boilerplate buckets otherwise
    explode quadratically) and the self-join runs bucket-local. Truncation
    loses recall SILENTLY from this frame's point of view — run
    :func:`lsh_truncation_stats` with the same parameters to quantify it
    (north rule: no silent caps).
    """
    buckets = _lsh_buckets(sigs, k, rows_per_band, id_col)
    w = Window.partitionBy("band_no", "band").orderBy(id_col)
    capped = (
        buckets.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_bucket)
        .drop("rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band_no") == F.col(f"b.band_no"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    return pairs


def _lsh_buckets(sigs: DataFrame, k: int, rows_per_band: int, id_col: str) -> DataFrame:
    """(band_no, band, id) rows — one per document per band."""
    n_bands = (k + rows_per_band - 1) // rows_per_band
    banded = sigs.select(F.col(id_col), *hashing.band_exprs(k, rows_per_band))
    pieces = [
        banded.select(
            F.lit(b).alias("band_no"), F.col(f"band{b}").alias("band"), F.col(id_col)
        )
        for b in range(n_bands)
    ]
    buckets = pieces[0]
    for p in pieces[1:]:
        buckets = buckets.unionByName(p)
    return buckets


def lsh_truncation_stats(
    sigs: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket: int = 50,
) -> DataFrame:
    """One-row recall-loss metric for :func:`lsh_candidate_pairs` at the
    same parameters: how many buckets exceeded ``max_bucket`` and how many
    member rows the cap dropped. Emit/log this next to any capped run —
    a silent cap reads as full recall when it isn't."""
    return (
        _lsh_buckets(sigs, k, rows_per_band, id_col)
        .groupBy("band_no", "band")
        .agg(F.count(F.lit(1)).alias("width"))
        .agg(
            F.coalesce(
                F.sum((F.col("width") > max_bucket).cast("bigint")), F.lit(0)
            ).alias("n_buckets_truncated"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("width") > max_bucket, F.col("width") - max_bucket
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_members_dropped"),
        )
    )


def token_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_bigrams: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard scoring of candidate pairs (n=1 tokens or n=2
    shingles): |A ∩ B| / |A ∪ B| computed via exploded joins — distributed,
    no arrays collected to the driver."""
    toks = text.tokens(F.col(text_col))
    grams = hashing.token_bigrams(toks) if use_bigrams else toks
    sets = docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("g"))
    set_sizes = sets.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    # intersection size: join each pair with both gram sets, equi-joining on
    # the gram value itself (NOT a blind b_id join, which would fan out
    # |A|x|B| rows per pair before filtering)
    a_sets = sets.select(F.col(id_col).alias("a_id"), "g")
    b_sets = sets.select(F.col(id_col).alias("bb_id"), F.col("g").alias("g_b"))
    inter = (
        pairs.join(a_sets, "a_id")
        .join(b_sets, (F.col("b_id") == F.col("bb_id")) & (F.col("g") == F.col("g_b")))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(inter, ["a_id", "b_id"], "left")
        .na.fill({"inter": 0})
        .join(set_sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("sz", "a_sz"), "a_id")
        .join(set_sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("sz", "b_sz"), "b_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("a_sz") + F.col("b_sz") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return out


def duplicate_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    log_truncation: bool = True,
) -> DataFrame:
    """End-to-end corpus dedup map (doc_id, keep_id): MinHash-LSH blocked
    candidates -> exact token-Jaccard >= threshold edges -> connected
    components -> every document mapped to its cluster minimum (non-dups
    map to themselves). THE training-data dedup composite: downstream
    keeps ``WHERE doc_id = keep_id``. Every stage is the blocked/bounded
    form (capped buckets, id-only joins, O(log n) CC rounds).

    ``log_truncation``: when the bucket cap bites, emit one WARNING with
    the measured recall loss (lsh_truncation_stats — no silent caps).
    Costs one extra aggregation over the bands; pass False to skip."""
    from .components import connected_components

    sigs = minhash_signatures(docs, k=k, id_col=id_col, text_col=text_col)
    if log_truncation:
        ts = lsh_truncation_stats(
            sigs, k=k, rows_per_band=rows_per_band,
            id_col=id_col, max_bucket=max_bucket,
        ).collect()[0]
        if ts.n_buckets_truncated:
            import logging

            logging.getLogger("r2s2_spark.dedup").warning(
                "LSH bucket cap (max_bucket=%d) truncated %d bucket(s), "
                "dropping %d member row(s) — candidate recall is below "
                "1.0; raise max_bucket or pre-filter boilerplate",
                max_bucket, ts.n_buckets_truncated, ts.n_members_dropped,
            )
    pairs = lsh_candidate_pairs(
        sigs, k=k, rows_per_band=rows_per_band, id_col=id_col, max_bucket=max_bucket
    )
    edges = token_jaccard_pairs(
        docs, pairs, threshold=threshold, id_col=id_col, text_col=text_col
    ).select("a_id", "b_id")
    # connected_components needs bigint nodes; ORIGINAL ids (string or
    # numeric) are kept through the composite and hashed to a node key
    # only inside the CC kernel (xxhash64 of the string form — collision
    # odds ~n^2/2^64, negligible below ~10^9 docs). The keep choice is
    # min(ORIGINAL id) per component, so the output id/keep_id columns
    # keep the caller's id type (ADVICE r2: the previous cast('bigint')
    # threw under ANSI mode for string ids).
    ids = docs.select(id_col).distinct().withColumn(
        "node", F.xxhash64(F.col(id_col).cast("string"))
    )
    e2 = (
        edges.join(ids.select(F.col(id_col).alias("a_id"), F.col("node").alias("src")), "a_id")
        .join(ids.select(F.col(id_col).alias("b_id"), F.col("node").alias("dst")), "b_id")
        .select("src", "dst")
    )
    comp = connected_components(e2)
    linked = ids.join(comp, "node")
    keep = linked.groupBy("component").agg(F.min(id_col).alias("keep_id"))
    linked_mapped = linked.join(keep, "component").select(F.col(id_col), "keep_id")
    singles = ids.join(comp, "node", "left_anti").select(
        F.col(id_col), F.col(id_col).alias("keep_id")
    )
    return linked_mapped.unionByName(singles)


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash bitstring): bit-majority over token hashes."""
    toks = docs.select(F.col(id_col), F.explode(text.tokens(F.col(text_col))).alias("tok"))
    bits = toks.groupBy(id_col).agg(*hashing.simhash16(F.col("tok")))
    return bits.select(F.col(id_col), hashing.simhash_from_bits().alias("simhash"))


def simhash_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents sharing an identical SimHash (hamming-0 groups; wider
    hamming radii block on bitstring halves — same join shape)."""
    fps = simhash_fingerprints(docs, id_col, text_col)
    return (
        fps.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.col("n") > 1)
    )


def embedding_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_bands: int = 4,
    dim: int | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Banded random-hyperplane LSH candidate pairs over an embedding
    column — the same blocking shape as :func:`lsh_candidate_pairs`:
    ``n_bands`` independent buckets of ``n_bits`` Rademacher sign bits each
    (2^n_bits cells per band, balanced regardless of the embedding
    distribution), candidates = pairs sharing ANY band bucket. With the
    default 8 bits that's 256 buckets per band: the within-bucket self-join
    is O(n^2 / 256) per band — scale-safe, unlike a leading-dimension sign
    bucket whose 16 cells put n/16 vectors in each.

    ``use_arrow``: compute all buckets in one numpy matmul per Arrow batch
    (the 100 TB path — one Python boundary, BLAS inside) instead of the
    Catalyst fold (the SQL-oracle-exact twin; n_bands*n_bits aggregate
    expressions per row). Both produce identical buckets (asserted in
    tests); keep Catalyst wherever a DuckDB oracle must replay the plan."""
    if dim is None:
        dim = emb.select(F.size(F.col(vec_col))).first()[0]
    bands_planes = [
        hashing.rademacher_planes(n_bits, dim, band=band) for band in range(n_bands)
    ]
    if use_arrow:
        buckets = hashing.hyperplane_buckets_pandas(emb, vec_col, bands_planes, id_col)
    else:
        pieces = [
            emb.select(
                F.lit(band).alias("band_no"),
                hashing.hyperplane_bucket(F.col(vec_col), planes).alias("bkt"),
                F.col(id_col),
            )
            for band, planes in enumerate(bands_planes)
        ]
        buckets = pieces[0]
        for p in pieces[1:]:
            buckets = buckets.unionByName(p)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_bands: int = 4,
    dim: int | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicates: banded hyperplane-LSH candidates
    (never all-pairs) scored by exact cosine >= threshold. Pairs carry ids
    only through the blocking join; vectors are joined back once for
    scoring (no vector duplication across bands)."""
    pairs = embedding_candidate_pairs(
        emb, id_col, vec_col, n_bits, n_bands, dim, use_arrow
    )
    va = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("__va"))
    vb = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("__vb"))
    return (
        pairs.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(hashing.cosine_similarity(F.col("__va"), F.col("__vb")), 4).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
