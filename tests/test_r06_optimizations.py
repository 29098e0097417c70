"""Round-6 optimization pins: each rewrite here claims BIT-IDENTICAL
results to the expression it replaced — these tests hold the equivalences
directly (the oracle rehearsal in test_entry_queries holds them end to
end against DuckDB)."""

from pyspark.sql import functions as F

from r2s2_spark.functions import hashing, text
from r2s2_spark.operators import dedup, similarity


def test_cosine_lit_bit_identical_to_cosine_similarity(spark):
    """similarity._cosine_lit folds the constant-side norm at plan-build
    time; the produced doubles must equal hashing.cosine_similarity's
    UNROUNDED output bit for bit (same IEEE ops, same order)."""
    vecs = [
        ([1.0, 2.0, 3.0, 4.5],),
        ([-0.25, 0.0, 7.125, 1e-3],),
        ([1e150, 2.0, -1e150, 0.5],),
        ([0.1, 0.2, 0.30000000000000004, -0.7],),
    ]
    q = [0.7, -1.3, 2.9, 0.0001]
    df = spark.createDataFrame(vecs, "v array<double>")
    q_lit = F.array(*[F.lit(x) for x in q])
    rows = df.select(
        hashing.cosine_similarity(F.col("v"), q_lit).alias("old"),
        similarity._cosine_lit("v", q).alias("new"),
    ).collect()
    for r in rows:
        assert r.old == r.new, (r.old, r.new)


def test_cell_expr_matches_unshared_form(spark):
    """_cell_expr with a projected shared row norm assigns the same cell
    as building each cosine independently (partial-probe recall depends
    on assignments, not just full-probe results)."""
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(64)],
        "vec_id bigint, embedding array<double>",
    )
    cents = similarity.kmeans_centroids(emb, n_cells=4, sample=64)
    base = emb.withColumn("__na", similarity._row_norm("embedding"))
    got = base.select(
        "vec_id",
        similarity._cell_expr(cents, "embedding", na=F.col("__na")).alias("a"),
        similarity._cell_expr(cents, "embedding").alias("b"),
    ).collect()
    for r in got:
        assert r.a == r.b, (r.vec_id, r.a, r.b)


def test_token_jaccard_hashed_matches_string_form(spark):
    """The xxhash64 gram sets + aggregation-barrier rewrite must score
    identically to the direct string-set computation."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d x"),
            (3, "a b c d e"),
            (4, "completely different tokens here now"),
            (5, None),
            (6, ""),
            (7, "a a a b b c d e"),  # in-doc duplicates collapse
        ],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 7), (5, 6)],
        "a_id bigint, b_id bigint",
    )

    def reference(threshold):
        toks = text.tokens(F.col("text"))
        sets = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("g"))
        sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        a_sets = sets.select(F.col("doc_id").alias("a_id"), "g")
        b_sets = sets.select(F.col("doc_id").alias("bb_id"), F.col("g").alias("g_b"))
        inter = (
            pairs.join(a_sets, "a_id")
            .join(b_sets, (F.col("b_id") == F.col("bb_id")) & (F.col("g") == F.col("g_b")))
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            pairs.join(inter, ["a_id", "b_id"], "left")
            .na.fill({"inter": 0})
            .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "a_sz"), "a_id")
            .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "b_sz"), "b_id")
            .withColumn(
                "jaccard",
                F.round(F.col("inter") / (F.col("a_sz") + F.col("b_sz") - F.col("inter")), 4),
            )
            .where(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", "jaccard")
        )

    for threshold in (0.0, 0.5, 0.9):
        got = dedup.token_jaccard_pairs(docs, pairs, threshold=threshold)
        ref = reference(threshold)
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0
    # bigrams path too
    got = dedup.token_jaccard_pairs(docs, pairs, threshold=0.3, use_bigrams=True)
    assert got.count() >= 1
    assert set(got.columns) == {"a_id", "b_id", "jaccard"}


def test_simhash16_takes_prehashed_md5(spark):
    """simhash_fingerprints projects md5(token) once before the groupBy;
    fingerprints must equal the inline-md5 formulation."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the the the"), (3, "x")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    ref_bits = toks.groupBy("doc_id").agg(*hashing.simhash16(F.md5(F.col("tok"))))
    ref = {
        r.doc_id: r.simhash
        for r in ref_bits.select(
            "doc_id", hashing.simhash_from_bits().alias("simhash")
        ).collect()
    }
    assert got == ref
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in got.values())
