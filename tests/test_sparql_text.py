"""Textual SPARQL front-end (plans/sparql_text.py): parse-only unit tests
plus executed goldens over loaded pipelines, including the reference's
flagship query VERBATIM (SparqlOnLoadedTest.java:117)."""

import pytest
from pyspark.sql import functions as F

from r2s2_spark.naming import EX, RDF, RDFS, XSD
from r2s2_spark.pipeline import KgPipeline
from r2s2_spark.plans.sparql_text import (
    SparqlUnsupported,
    parse_sparql,
    sparql_query,
)
from r2s2_spark.sources import fixtures as fx


# -- parse-only ------------------------------------------------------------


def test_parse_flagship_verbatim():
    q = parse_sparql(
        "SELECT DISTINCT ?type FROM <http://example.org/graph> WHERE {[] a ?type}"
    )
    assert q["distinct"] and q["graph"] == "http://example.org/graph"
    [(s, p, o)] = q["where"]["patterns"]
    assert s.startswith("?__anon") and p == RDF + "type" and o == "?type"


def test_parse_abbreviations_and_paths():
    q = parse_sparql(
        f"PREFIX ex: <{EX}> SELECT * WHERE "
        "{ ?s ex:p1 ?a , ?b ; ex:p2 ?c . ?s ex:q1/ex:q2 ?d . ?s ex:r+ ?e }"
    )
    pats = q["where"]["patterns"]
    assert [(s, o) for s, _, o in pats[:3]] == [
        ("?s", "?a"), ("?s", "?b"), ("?s", "?c")
    ]
    with pytest.raises(SparqlUnsupported, match="compound"):
        parse_sparql(f"PREFIX ex: <{EX}> SELECT * WHERE {{ ?s (ex:a/ex:b)+ ?d }}")


def test_parse_unsupported_named_clearly():
    with pytest.raises(SparqlUnsupported, match="HAVING"):
        parse_sparql("SELECT ?x WHERE { ?x <http://p> ?y } HAVING (?y > 2)")
    with pytest.raises(SparqlUnsupported, match="LANG"):
        parse_sparql("SELECT ?x WHERE { ?x <http://p> ?y FILTER(LANG(?y) = 'en') }")
    with pytest.raises(SparqlUnsupported, match="GRAPH"):
        parse_sparql(
            "SELECT ?x WHERE { ?x <http://p> ?y . GRAPH ?g { ?x <http://q> ?z } }"
        )


# -- executed goldens ------------------------------------------------------


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    pipe = KgPipeline(spark, str(tmp_path_factory.mktemp("st") / "wd"))
    pipe.load(fx.fixture_loading(spark))
    return pipe


@pytest.fixture(scope="module")
def oddeven(spark, tmp_path_factory):
    pipe = KgPipeline(spark, str(tmp_path_factory.mktemp("st2") / "wd"))
    pipe.load(fx.fixture_oddeven(spark, with_labels=True))
    return pipe


def test_flagship_query_verbatim(loaded):
    """The reference's own test query, byte-for-byte
    (SparqlOnLoadedTest.java:117): the loading fixture's default graph IS
    http://example.org/graph, so FROM restricts to it and the two classes
    used as rdf:type objects come back."""
    out = sparql_query(
        loaded,
        "SELECT DISTINCT ?type FROM <http://example.org/graph> WHERE {[] a ?type}",
    )
    assert {r.type for r in out.collect()} == {RDF + "Alt", RDF + "Bag"}


def test_select_filter_regex_order_limit(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s a ex:even ; rdfs:label ?l .
          FILTER (?l < 10 && REGEX(?s, "i[0-9]+$"))
        }} ORDER BY ?l LIMIT 3""",
    )
    rows = out.collect()
    # even-classed = odd i (inverted ternary); labels < 10: 1,3,5,7,9
    assert [r.l for r in rows] == ["1", "3", "5"]


def test_aggregate_group_by(oddeven):
    out = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> SELECT ?t (COUNT(?s) AS ?n) "
        "WHERE { ?s a ?t } GROUP BY ?t",
    )
    assert {(r.t, r.n) for r in out.collect()} == {
        (EX + "even", 50), (EX + "odd", 49)
    }
    total = sparql_query(
        oddeven,
        "SELECT (COUNT(*) AS ?n) WHERE { ?s a ?t }",
    )
    assert total.collect()[0].n == 99


def test_union_and_optional(oddeven):
    u = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> SELECT DISTINCT ?s WHERE "
        "{ { ?s a ex:even } UNION { ?s a ex:odd } }",
    )
    assert u.count() == 99
    opt = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s a ex:even . OPTIONAL {{ ?s rdfs:label ?l }}
        }}""",
    )
    assert opt.count() == 50 and opt.where(F.col("l").isNull()).count() == 0


def test_minus_and_not_exists(oddeven):
    m = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> SELECT ?s WHERE "
        "{ ?s a ?t MINUS { ?s a ex:odd } }",
    )
    assert m.count() == 50
    ne = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}> SELECT ?s WHERE "
        "{ ?s a ex:even FILTER NOT EXISTS { ?s rdfs:label ?l } }",
    )
    assert ne.count() == 0


def test_bind_and_numeric_filter(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?dbl WHERE {{
          ?s rdfs:label ?l .
          BIND(?l * 2 AS ?dbl)
          FILTER (?dbl >= 196)
        }}""",
    )
    assert {r.dbl for r in out.collect()} == {196.0, 198.0}


def test_property_path_text(spark, tmp_path):
    nt = "\n".join(
        [
            f"<{EX}a> <{EX}next> <{EX}b> .",
            f"<{EX}b> <{EX}next> <{EX}c> .",
            f'<{EX}c> <{EX}name> "sea" .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "p.nt", nt)]))
    star = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ex:a ex:next* ?x }}"
    )
    assert {r.x for r in star.collect()} == {EX + "a", EX + "b", EX + "c"}
    seq = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?n WHERE {{ ex:b (ex:next/ex:name) ?n }}"
    )
    assert [r.n for r in seq.collect()] == ["sea"]
    inv = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ex:b ^ex:next ?x }}"
    )
    assert [r.x for r in inv.collect()] == [EX + "a"]


def test_graph_var_text(spark, tmp_path):
    nq = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f"<{EX}s2> <{RDF}type> <{EX}T> <{EX}g/two> .",
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "g.nq", nq)]))
    out = sparql_query(
        p,
        f"PREFIX ex: <{EX}> SELECT ?s ?g WHERE {{ GRAPH ?g {{ ?s a ex:T }} }}",
    )
    assert {(r.s, r.g) for r in out.collect()} == {
        (EX + "s1", EX + "g/one"), (EX + "s2", EX + "g/two"),
    }
