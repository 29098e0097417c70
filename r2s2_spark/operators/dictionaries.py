"""Stage D — dictionary encoding of IRIs into long-id lookup tables.

Reference counterpart: in-memory ``TemporaryIriIdMap`` (atomic counter per
first-seen IRI, TemporaryIriIdMap.java:23-56) flushed to
``predicates(id, iri)`` / ``graphs(id, iri)`` tables
(ParseIntoSOGTables.java:455-470), plus the later scheme/host enum passes
(IntroduceIriSchemeEnum.java:27-72, IntroduceHostEnums.java:27-71).

Spark realization: ``row_number()`` over the globally *sorted distinct*
value set — deterministic across retries and cluster sizes, unlike
``monotonically_increasing_id`` or first-seen counters (illegal under task
retry). The single-partition window is over the distinct set only (IRI
vocabulary, not data volume), which is exactly the small side of every
subsequent broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(df: DataFrame, col: str, id_col: str = "id", value_col: str = "iri") -> DataFrame:
    """Distinct values of ``col`` -> ``(id bigint, iri string)``, id assigned
    by sorted order (deterministic; reference ids are first-seen order,
    which no distributed plan can reproduce stably)."""
    w = Window.orderBy(value_col)
    return (
        df.select(F.col(col).alias(value_col))
        .where(F.col(value_col).isNotNull())
        .distinct()
        .withColumn(id_col, F.row_number().over(w).cast("bigint"))
        .select(id_col, value_col)
    )


def encode_with_dictionary(
    df: DataFrame, dictionary: DataFrame, col: str, id_alias: str
) -> DataFrame:
    """Replace string ``col`` with its dictionary id via broadcast join
    (the Spark idiom for the reference's 10k-arm CASE id->IRI,
    IntroduceGraphEnum.java:59-73)."""
    dim = F.broadcast(
        dictionary.select(F.col("iri").alias(col), F.col("id").alias(id_alias))
    )
    return df.join(dim, on=col, how="left")


def decode_with_dictionary(
    df: DataFrame, dictionary: DataFrame, id_col: str, value_alias: str
) -> DataFrame:
    dim = F.broadcast(
        dictionary.select(F.col("id").alias(id_col), F.col("iri").alias(value_alias))
    )
    return df.join(dim, on=id_col, how="left")
