"""Stage E — triple extraction from the ``source_files`` table.

Reference counterpart: ParseIntoSOGTables.java:100-124 (thread-pool Rio
parse) + LoadIntoTable.java:283-368 (term decomposition). Here:

  source_files --sha2(content,256) [JVM]--> mapInPandas(vectorized NT parse)
               --Catalyst IRI decomposition--> statements DataFrame

Scale notes:
- the parser is the only Python boundary in the whole load path; it is
  Arrow-batched and line-vectorized (no per-row Python).
- bnode labels are renumbered to cluster-stable ids with
  ``xxhash64(file_sha256, label)`` — the reference's global AtomicLong
  (ParseIntoSOGTables.java:65) is illegal under Spark retry semantics;
  a content hash is deterministic across retries and executors.
- per-file graph defaulting matches ParseIntoSOGTables.java:355-357.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.uri import decompose_iri
from ..sources.ntriples import STATEMENT_SCHEMA, parse_iterator
from ..sources.fixtures import DEFAULT_GRAPH

#: flat statement-frame columns after decomposition (the Stage E output)
S_PARTS = [f"s_{k}" for k in ("scheme", "ssp", "authority", "user_info", "host", "port", "path", "query", "fragment")]
O_PARTS = [f"o_{k}" for k in ("scheme", "ssp", "authority", "user_info", "host", "port", "path", "query", "fragment")]


def parse_statements(source_files: DataFrame, default_graph: str = DEFAULT_GRAPH) -> DataFrame:
    """source_files -> raw statement rows (lexical terms, pre-decomposition).

    Rows that fail to parse are kept with ``parse_error`` set so lineage can
    count them; downstream stages filter them out.
    """
    with_sha = source_files.withColumn("file_sha256", F.sha2(F.col("content"), 256))
    fn = functools.partial(parse_iterator, default_graph=default_graph)
    return with_sha.select(
        "repo", "path", "commit", "content", "file_sha256"
    ).mapInPandas(fn, schema=STATEMENT_SCHEMA)


def decompose_statements(raw: DataFrame) -> DataFrame:
    """Add the 9-part IRI decomposition for subject and object plus stable
    bnode ids. Pure Catalyst — stays in whole-stage codegen."""
    good = raw.where(F.col("parse_error").isNull()).drop("parse_error")

    s_iri = F.when(F.col("s_kind") == "iri", F.col("s_lex"))
    o_iri = F.when(F.col("o_kind") == "iri", F.col("o_lex"))
    s_parts = decompose_iri(s_iri)
    o_parts = decompose_iri(o_iri)

    cols = [
        "repo",
        "path",
        "commit",
        "file_sha256",
        "line_no",
        "s_kind",
        "s_lex",
        "p_iri",
        "o_kind",
        "o_lex",
        "o_lang",
        "o_datatype",
        "g_iri",
    ]
    out = good.select(
        *cols,
        *[s_parts[k].alias(f"s_{k}") for k in s_parts],
        *[o_parts[k].alias(f"o_{k}") for k in o_parts],
        F.when(
            F.col("s_kind") == "bnode",
            F.xxhash64(F.col("file_sha256"), F.col("s_lex")),
        ).alias("s_bnode_id"),
        F.when(
            F.col("o_kind") == "bnode",
            F.xxhash64(F.col("file_sha256"), F.col("o_lex")),
        ).alias("o_bnode_id"),
    )
    return out


def extract(source_files: DataFrame, default_graph: str = DEFAULT_GRAPH) -> DataFrame:
    """Full Stage E: parse + decompose."""
    return decompose_statements(parse_statements(source_files, default_graph))
