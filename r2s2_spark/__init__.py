"""r2s2_spark — a from-scratch, PySpark-native knowledge-graph construction
engine with the capabilities of JervenBolleman/r2s2 (reference: a Java 17 +
DuckDB bulk loader; see /root/reference and SURVEY.md).

Not a port: the reference's thread pools, row-wise Appenders and SQL UPDATE
passes dissolve into declarative DataFrame programs; Catalyst + AQE pick the
physical plan. Architecture (SURVEY.md §7.0):

    source_files (repo, path, commit, lang, content)
      E  extract      mapInArrow RE2-vectorized N-Triples/N-Quads parse
      D  dictionaries predicates/graphs -> deterministic long ids
      V  vertical     one table per (predicate, subj kind, obj kind, lang, dt)
      O  layout       type-split, virtual cols, narrowing, LCP, set semantics
      M  merge        denormalize unique-subject tables; R2RML mapping doc
      L  link         MinHash-LSH blocking + salted score join
      C  canonicalize connected components -> rewrite subject ids

Every stage commits an atomic snapshot with per-partition lineage rows so a
killed job resumes without recomputation (reference: description.ttl
checkpoints, Loader.java:207-213).
"""

__version__ = "0.1.0"
