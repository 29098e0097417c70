"""Explicit skew handling: salted joins.

AQE's skew-join split (on by default, session.py) handles most runtime
skew; salting is the *planned* defense for joins where one key is known to
be pathologically hot (LSH candidate blocks, rdf:type-like predicates).
North-rule requirement: "partitioning / shuffle / skew handled explicitly".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` may have hot keys: ``big`` rows get a
    deterministic salt (hash of the whole row modulo n_salt), ``small`` is
    replicated n_salt times, and the join key becomes (key, salt) — a hot
    key's rows now spread over ``n_salt`` reducers instead of one.

    Deterministic (no rand()): retry-stable under task re-execution.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
