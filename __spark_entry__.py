"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: full KG-construction pipeline (E extract ->
                 D dictionaries -> V vertical tables -> O layout passes ->
                 M merge) over an RDF rendering of the sf0.001 star schema,
                 returning the reconstructed triples.
queries()     -> one entry per SURVEY.md §2 operator family + the
                 training-data operators (dedup/similarity/text/multimodal),
                 implemented in r2s2_spark.testdata_queries.
oracle_sql()  -> DuckDB twins for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import r2s2_spark.testdata_queries as tq
from r2s2_spark.naming import EX, RDF_TYPE
from r2s2_spark.pipeline import KgPipeline

SF_DIR = "/root/testdata/sf0.001"


def _nation_rdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render nation+region as N-Triples source_files rows (executor-side
    Catalyst concat — the 'repos' here are rows of the relational tables)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    n_key = F.col("n_nationkey").cast("string")
    nation_content = F.concat(
        F.lit(f"<{EX}nation/"), n_key, F.lit(f"> <{RDF_TYPE}> <{EX}Nation> .\n"),
        F.lit(f"<{EX}nation/"), n_key, F.lit(f'> <{EX}name> "'), F.col("n_name"), F.lit('" .\n'),
        F.lit(f"<{EX}nation/"), n_key, F.lit(f"> <{EX}inRegion> <{EX}region/"),
        F.col("n_regionkey").cast("string"), F.lit("> ."),
    )
    r_key = F.col("r_regionkey").cast("string")
    region_content = F.concat(
        F.lit(f"<{EX}region/"), r_key, F.lit(f"> <{RDF_TYPE}> <{EX}Region> .\n"),
        F.lit(f"<{EX}region/"), r_key, F.lit(f'> <{EX}name> "'), F.col("r_name"), F.lit('" .'),
    )

    def as_src(df, key, content, prefix):
        return df.select(
            F.lit("tpch").alias("repo"),
            F.concat(F.lit(prefix), key).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("ntriples").alias("lang"),
            content.alias("content"),
        )

    return as_src(nation, n_key, nation_content, "nation/").unionByName(
        as_src(region, r_key, region_content, "region/")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the whole pipeline, return reconstructed triples.

    The result is WRITTEN to a stable path and returned as a lazy reader —
    no driver-side collect (the returned frame stays distributed no matter
    how large the KG is); the pipeline work dir is removed after the
    result parquet is materialized."""
    work = tempfile.mkdtemp(prefix="r2s2_entry_")
    # unique per call: a fixed shared path would let two concurrent
    # sessions clobber each other's result mid-read (leaked-but-unique
    # beats shared-and-clobbered; ADVICE r2)
    result = os.path.join(tempfile.mkdtemp(prefix="r2s2_entry_out_"), "triples")
    try:
        pipe = KgPipeline(spark, work)
        pipe.load(_nation_rdf(spark, SF_DIR))
        pipe.triples_with_graph_iri().write.mode("overwrite").parquet(result)
        return spark.read.parquet(result)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(tq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(tq.ORACLES)
