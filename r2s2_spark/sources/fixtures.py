"""Deterministic fixture + scale generators for the ``source_files`` table.

Input shape is mandated by BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.
Fixture triple sets are ported from the reference's JUnit fixtures
(FIXTURES.md; LoadingTest.java:41-53, SparqlOnLoadedTest.java:66-90,
ReintroduceRdfSetSemanticsTest.java:32-45) re-serialized as N-Triples —
triple *sets*, not syntax, are what P/R compares.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from ..naming import EX, RDF, RDFS, XSD

DEFAULT_GRAPH = "http://example.org/graph"

SOURCE_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _row(repo: str, path: str, content: str, lang: str = "ntriples") -> tuple:
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    return (repo, path, commit, lang, content)


def source_files_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, SOURCE_FILES_SCHEMA)


# --- fixture A: LoadingTest.java:41-53 (15 statements) ---------------------

FIXTURE_LOADING_NT = "\n".join(
    [
        f"<{RDF}Bag> <{RDF}type> <{RDF}Alt> .",
        f"<{RDF}Alt> <{RDF}type> <{RDF}Bag> .",
        f"<{RDF}Alt> <{RDF}type> <{RDF}Alt> .",
        f"<{RDF}List> <{RDF}type> <{RDF}Alt> .",
        f"<{RDF}List> <{RDF}type> <{RDF}Bag> .",
        f'<{RDF}Alt> <{RDFS}label> "true"^^<{XSD}boolean> .',
        f'<{RDF}Alt> <{RDFS}label> "false"^^<{XSD}boolean> .',
        f'<{RDF}List> <{RDFS}label> "false"^^<{XSD}boolean> .',
        f'<{RDF}Alt> <{RDFS}label> "杭州市"@cz .',
        f'<{RDF}Bag> <{RDFS}label> "杭州"@cz .',
        f'<{RDF}Alt> <{RDFS}label> "lala"@en-UK .',
        f'<{RDF}Alt> <{RDFS}label> "lala lala"@en-UK .',
        f'<{RDF}Alt> <{RDFS}label> "2023-06-23"^^<{XSD}date> .',
        f'<{RDF}Alt> <{RDFS}label> "2023-06-22"^^<{XSD}date> .',
        f"<{RDF}Alt> <{RDFS}label> _:b1 .",
    ]
)


def fixture_loading(spark: SparkSession) -> DataFrame:
    return source_files_df(
        spark, [_row("fixture-repo", "data/loading.nt", FIXTURE_LOADING_NT)]
    )


#: fixture A re-serialized as RDF/XML — the reference's OWN fixture syntax
#: (its JUnit models are written as RDF/XML, LoadingTest.java:41-53); the
#: triple SET is identical to FIXTURE_LOADING_NT.
FIXTURE_LOADING_RDFXML = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:rdfs="{RDFS}">
  <rdf:Description rdf:about="{RDF}Bag">
    <rdf:type rdf:resource="{RDF}Alt"/>
    <rdfs:label xml:lang="cz">杭州</rdfs:label>
  </rdf:Description>
  <rdf:Description rdf:about="{RDF}Alt">
    <rdf:type rdf:resource="{RDF}Bag"/>
    <rdf:type rdf:resource="{RDF}Alt"/>
    <rdfs:label rdf:datatype="{XSD}boolean">true</rdfs:label>
    <rdfs:label rdf:datatype="{XSD}boolean">false</rdfs:label>
    <rdfs:label xml:lang="cz">杭州市</rdfs:label>
    <rdfs:label xml:lang="en-UK">lala</rdfs:label>
    <rdfs:label xml:lang="en-UK">lala lala</rdfs:label>
    <rdfs:label rdf:datatype="{XSD}date">2023-06-23</rdfs:label>
    <rdfs:label rdf:datatype="{XSD}date">2023-06-22</rdfs:label>
    <rdfs:label rdf:nodeID="b1"/>
  </rdf:Description>
  <rdf:Description rdf:about="{RDF}List">
    <rdf:type rdf:resource="{RDF}Alt"/>
    <rdf:type rdf:resource="{RDF}Bag"/>
    <rdfs:label rdf:datatype="{XSD}boolean">false</rdfs:label>
  </rdf:Description>
</rdf:RDF>"""


def fixture_loading_rdfxml(spark: SparkSession) -> DataFrame:
    return source_files_df(
        spark,
        [_row("fixture-repo", "data/loading.rdf", FIXTURE_LOADING_RDFXML, lang="rdfxml")],
    )


# --- fixture B: SparqlOnLoadedTest.java:66-90 (odd/even) -------------------


def oddeven_nt(with_labels: bool = False) -> str:
    lines = []
    for i in range(1, 100):
        # reference's inverted ternary (SparqlOnLoadedTest.java:68): even i
        # -> ex:odd, odd i -> ex:even. Kept verbatim for golden parity.
        cls = "odd" if i % 2 == 0 else "even"
        lines.append(f"<{EX}i{i}> <{RDF}type> <{EX}{cls}> .")
        if with_labels:
            lines.append(f'<{EX}i{i}> <{RDFS}label> "{i}"^^<{XSD}int> .')
    return "\n".join(lines)


def fixture_oddeven(spark: SparkSession, with_labels: bool = False) -> DataFrame:
    return source_files_df(
        spark, [_row("fixture-repo", "data/oddeven.nt", oddeven_nt(with_labels))]
    )


# --- fixture C: ReintroduceRdfSetSemanticsTest.java:32-45 ------------------

FIXTURE_MULTIGRAPH_NQ = "\n".join(
    [
        f"<http://example.org/2> <{RDF}type> <http://example.org/1> <http://example.org/zeroGraph> .",
        f"<http://example.org/2> <{RDF}type> <http://example.org/1> <http://example.org/oneGraph> .",
    ]
)


def fixture_multigraph(spark: SparkSession) -> DataFrame:
    return source_files_df(
        spark, [_row("fixture-repo", "data/multigraph.nq", FIXTURE_MULTIGRAPH_NQ)]
    )


# --- fixture D: OptimizeForDatatypeTest.java:23-94 narrowing probes --------


def fixture_datatypes(spark: SparkSession) -> DataFrame:
    """Narrowing probes (OptimizeForDatatypeTest.java:23-94). The numeric
    probe applies to IRI path/query/fragment columns (optimizeIRI), so the
    numeric cases are object IRIs with numeric *fragments*; gYear is a
    typed-literal case (optimizeLiteral)."""

    def iris(name: str, values: list[str]) -> str:
        return "\n".join(
            f"<{EX}{name}{j}> <{EX}{name}> <{EX}x#{v}> ."
            for j, v in enumerate(values)
        )

    def lits(name: str, values: list[str], dt: str) -> str:
        return "\n".join(
            f'<{EX}{name}{j}> <{EX}{name}> "{v}"^^<{dt}> .'
            for j, v in enumerate(values)
        )

    rows = [
        _row("fixture-repo", "data/dt_numeric.nt", iris("numeric", [str(i) for i in range(100)])),
        _row("fixture-repo", "data/dt_zeros.nt", iris("zeros", ["0" + str(i) for i in range(100)])),
        _row("fixture-repo", "data/dt_mixed.nt", iris("mixed", [str(i) for i in range(100)] + ["A"])),
        _row(
            "fixture-repo",
            "data/dt_gyear.nt",
            lits("gyear", [f"{i:04d}" for i in range(10)], f"{XSD}gYear"),
        ),
    ]
    return source_files_df(spark, rows)


# --- scale generator (bench + scaling-efficiency evidence) -----------------


def synthetic_source_files(
    spark: SparkSession,
    n_files: int,
    statements_per_file: int = 200,
    n_entities: int | None = None,
    partitions: int | None = None,
    n_predicates: int = 7,
) -> DataFrame:
    """Deterministic synthetic code-repo-shaped corpus, generated *on the
    executors* (range -> transform), so generation itself scales: no driver
    list, no Python. Each file holds ``statements_per_file`` N-Triples lines
    about entities in a Zipf-ish id space (id = seq % n_entities -> hot heads,
    exercising the skewed-predicate shuffle path).
    """
    from pyspark.sql import functions as F

    n_entities = n_entities or max(1000, n_files * statements_per_file // 10)
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    sid = F.col("id")
    # per-file content: concat of generated lines, all Catalyst expressions
    line = (
        F.transform(
            F.sequence(F.lit(0), F.lit(statements_per_file - 1)),
            lambda j: F.concat(
                F.lit(f"<{EX}e"),
                ((sid * statements_per_file + j) % F.lit(n_entities)).cast("string"),
                F.lit(f"> <{EX}p"),
                (F.abs(F.xxhash64(sid * statements_per_file + j)) % n_predicates).cast("string"),
                F.lit('> "v'),
                ((sid * statements_per_file + j) % 97).cast("string"),
                F.lit(f'"^^<{XSD}string> .'),
            ),
        )
    )
    return df.select(
        F.concat(F.lit("repo"), (sid % 257).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), sid.cast("string"), F.lit(".nt")).alias("path"),
        F.sha1(F.concat(F.lit("c"), sid.cast("string"))).alias("commit"),
        F.lit("ntriples").alias("lang"),
        F.array_join(line, "\n").alias("content"),
    )


def synthetic_source_files_syntax(
    spark: SparkSession,
    n_files: int,
    statements_per_file: int = 100,
    syntax: str = "turtle",
    partitions: int | None = None,
) -> DataFrame:
    """The same statement population as :func:`synthetic_source_files`
    rendered in another RDF syntax — feeds the per-syntax parse-throughput
    benchmark (the NT fast path is vectorized; Turtle/RDF-XML tokenize
    per-statement inside the Arrow batch, so their ceiling must be
    measured, not assumed). Generation stays executor-side Catalyst."""
    from pyspark.sql import functions as F

    n_entities = max(1000, n_files * statements_per_file // 10)
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    sid = F.col("id")
    seq = F.sequence(F.lit(0), F.lit(statements_per_file - 1))
    ent = lambda j: ((sid * statements_per_file + j) % F.lit(n_entities)).cast("string")  # noqa: E731
    prd = lambda j: (F.abs(F.xxhash64(sid * statements_per_file + j)) % 7).cast("string")  # noqa: E731
    val = lambda j: ((sid * statements_per_file + j) % 97).cast("string")  # noqa: E731

    if syntax == "turtle":
        lines = F.transform(
            seq,
            lambda j: F.concat(
                F.lit("ex:e"), ent(j), F.lit(" ex:p"), prd(j),
                F.lit(' "v'), val(j), F.lit('"^^xsd:string .'),
            ),
        )
        content = F.concat(
            F.lit(f"@prefix ex: <{EX}> .\n@prefix xsd: <{XSD}> .\n"),
            F.array_join(lines, "\n"),
        )
        lang, suffix = "turtle", ".ttl"
    elif syntax == "rdfxml":
        lines = F.transform(
            seq,
            lambda j: F.concat(
                F.lit(f'<rdf:Description rdf:about="{EX}e'), ent(j),
                F.lit('"><ex:p'), prd(j),
                F.lit(f' rdf:datatype="{XSD}string">v'), val(j),
                F.lit("</ex:p"), prd(j), F.lit("></rdf:Description>"),
            ),
        )
        content = F.concat(
            F.lit(f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">\n'),
            F.array_join(lines, "\n"),
            F.lit("\n</rdf:RDF>"),
        )
        lang, suffix = "rdfxml", ".rdf"
    else:
        raise ValueError(syntax)

    return df.select(
        F.concat(F.lit("repo"), (sid % 257).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), sid.cast("string"), F.lit(suffix)).alias("path"),
        F.sha1(F.concat(F.lit("c"), sid.cast("string"))).alias("commit"),
        F.lit(lang).alias("lang"),
        content.alias("content"),
    )
