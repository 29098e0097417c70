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
    q2 = parse_sparql(f"PREFIX ex: <{EX}> SELECT * WHERE {{ ?s (ex:a/ex:b)+ ?d }}")
    [(_, path, _)] = q2["where"]["patterns"]
    from r2s2_spark.plans.sparql import PathPlus, PathSeq

    assert isinstance(path, PathPlus) and isinstance(path.predicate, PathSeq)


def test_parse_unsupported_named_clearly():
    with pytest.raises(SparqlUnsupported, match="path"):
        parse_sparql("CONSTRUCT { ?s <http://p>+ ?o } WHERE { ?s ?p ?o }")
    # SERVICE is SUPPORTED since round 5 — constant endpoints resolve
    # through the registry, variable endpoints range over it
    q_svc = parse_sparql("SELECT ?x WHERE { SERVICE ?e { ?x <http://p> ?y } }")
    [svc] = q_svc["where"]["services"]
    assert svc["endpoint"] == "?e" and not svc["silent"]
    # a subquery inside GRAPH ?var is SUPPORTED since round 5 — including
    # LIMIT/OFFSET (per-graph window slice) and pattern-only reuse of the
    # graph var (alpha-renamed, §18.2.1); the named residuals are
    # projecting the graph var and reuse in expressions / nested subqueries
    q = parse_sparql(
        "SELECT ?x WHERE { GRAPH ?g { "
        "{ SELECT ?x WHERE { ?x <http://q> ?z } LIMIT 3 } } }"
    )
    [sq] = q["where"]["subselects"]
    assert sq["graph_slice"] == "g" and sq["limit"] == 3
    q2 = parse_sparql(
        "SELECT ?x WHERE { GRAPH ?g { "
        "{ SELECT ?x WHERE { ?x <http://q> ?g } } } }"
    )
    [sq2] = q2["where"]["subselects"]
    # the inner ?g is a DIFFERENT variable (not projected): renamed, and
    # the pattern carries the outer graph scope
    assert sq2["where"]["patterns"] == [("?x", "http://q", "?__gv_g", "?g")]
    with pytest.raises(SparqlUnsupported, match="projects"):
        parse_sparql(
            "SELECT ?x WHERE { GRAPH ?g { "
            "{ SELECT ?x ?g WHERE { ?x <http://q> ?g } } } }"
        )
    with pytest.raises(SparqlUnsupported, match="expression"):
        parse_sparql(
            "SELECT ?x WHERE { GRAPH ?g { "
            "{ SELECT ?x WHERE { ?x <http://q> ?g FILTER(?g != <http://u>) } } } }"
        )
    with pytest.raises(SparqlUnsupported, match="expression"):
        # SELECT * re-exposes the internal use through the projection
        parse_sparql(
            "SELECT ?x WHERE { GRAPH ?g { "
            "{ SELECT * WHERE { ?x <http://q> ?g } } } }"
        )
    with pytest.raises(SparqlUnsupported, match="aggregate"):
        parse_sparql("SELECT ?x WHERE { ?x <http://p> ?y FILTER(COUNT(?y) > 2) }")


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


# -- round-3 surface: HAVING / VALUES / subqueries / ASK / CONSTRUCT -------


def test_having_with_aggregates(oddeven):
    out = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> SELECT ?t (COUNT(?s) AS ?n) "
        "WHERE { ?s a ?t } GROUP BY ?t HAVING (COUNT(?s) > 49)",
    )
    assert [(r.t, r.n) for r in out.collect()] == [(EX + "even", 50)]
    # hidden agg columns must not leak into the projection
    assert out.columns == ["t", "n"]


def test_having_without_select_aggregate(oddeven):
    out = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> SELECT ?t WHERE {{ ?s a ?t }} "
        "GROUP BY ?t HAVING (COUNT(?s) < 50)",
    )
    assert [r.t for r in out.collect()] == [EX + "odd"]


def test_values_in_group(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s rdfs:label ?l .
          VALUES ?s {{ ex:i1 ex:i2 ex:nosuch }}
        }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (EX + "i1", "1"), (EX + "i2", "2")
    }


def test_values_multi_var_and_trailing(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{ ?s rdfs:label ?l }}
        VALUES (?s ?l) {{ (ex:i3 "3") (ex:i3 "nope") (ex:i4 "4") }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (EX + "i3", "3"), (EX + "i4", "4")
    }


def test_subquery_joins_on_shared_vars(oddeven):
    # per-subject max label via a sub-SELECT, joined to the outer type
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?t ?mx WHERE {{
          ?s a ?t .
          {{ SELECT ?s (MAX(?l) AS ?mx) WHERE {{ ?s rdfs:label ?l }} GROUP BY ?s }}
        }}""",
    )
    rows = {(r.s, r.t, r.mx) for r in out.collect()}
    assert (EX + "i1", EX + "even", "1") in rows
    assert (EX + "i2", EX + "odd", "2") in rows
    assert len(rows) == 99


def test_order_by_multiple_keys(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?t ?l WHERE {{ ?s a ?t ; rdfs:label ?l }}
        ORDER BY ?t DESC(?l)""",
    )
    rows = [(r.t, r.l) for r in out.collect()]
    # expected: primary ?t asc, secondary ?l lexicographically desc —
    # built by a stable two-pass sort (secondary first, then primary)
    expected = sorted(sorted(rows, key=lambda r: r[1], reverse=True), key=lambda r: r[0])
    assert rows == expected
    # secondary key must actually order within the primary groups
    assert rows[0] == (EX + "even", "99")


def test_ask_true_and_false(oddeven):
    yes = sparql_query(
        oddeven, f"PREFIX ex: <{EX}> ASK {{ ?s a ex:even }}"
    )
    assert [r.ask for r in yes.collect()] == [True]
    no = sparql_query(
        oddeven, f"PREFIX ex: <{EX}> ASK {{ ?s a ex:nosuchclass }}"
    )
    assert [r.ask for r in no.collect()] == [False]


def test_construct_template(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{
          ?s ex:tagged ex:seen .
          ?s ex:labelCopy ?l .
        }} WHERE {{ ?s a ex:even ; rdfs:label ?l FILTER (?l < 3) }}""",
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert rows == {
        (EX + "i1", EX + "tagged", EX + "seen"),
        (EX + "i1", EX + "labelCopy", "1"),
    }
    assert out.columns == ["subject", "predicate", "object"]


# -- LANG / DATATYPE / LANGMATCHES over term metadata ----------------------


def test_lang_filter(loaded):
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{ ?s rdfs:label ?l FILTER(LANG(?l) = "cz") }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (RDF + "Bag", "杭州"), (RDF + "Alt", "杭州市"),
    }
    # hidden term-metadata columns must not leak
    assert out.columns == ["s", "l"]


def test_langmatches_range(loaded):
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l WHERE {{
          ?s rdfs:label ?l FILTER(LANGMATCHES(LANG(?l), "en"))
        }}""",
    )
    # "en" matches the en-UK tagged labels (RFC 4647 prefix rule)
    assert {r.l for r in out.collect()} == {"lala", "lala lala"}


def test_datatype_filter(loaded):
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        PREFIX xsd: <{XSD}>
        SELECT ?s ?l WHERE {{
          ?s rdfs:label ?l FILTER(DATATYPE(?l) = xsd:boolean)
        }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (RDF + "Alt", "true"), (RDF + "Alt", "false"), (RDF + "List", "false"),
    }


def test_datatype_of_langtagged_is_langstring(loaded):
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l WHERE {{
          ?s rdfs:label ?l
          FILTER(DATATYPE(?l) = <{RDF}langString>)
        }}""",
    )
    assert {r.l for r in out.collect()} == {"杭州", "杭州市", "lala", "lala lala"}


def test_lang_of_iri_object_is_null(loaded):
    # rdf:type objects are IRIs: LANG() is a type error -> NULL -> filter
    # eliminates every solution
    out = sparql_query(
        loaded,
        "SELECT ?t WHERE { ?s a ?t FILTER(LANG(?t) = \"\") }",
    )
    assert out.count() == 0


# -- DESCRIBE and mixed UNION ----------------------------------------------


def test_describe_constant(loaded):
    out = sparql_query(loaded, f"DESCRIBE <{RDF}Bag>")
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert rows == {
        (RDF + "Bag", RDF + "type", RDF + "Alt"),
        (RDF + "Bag", RDFS + "label", "杭州"),
    }
    assert out.columns == ["subject", "predicate", "object"]


def test_describe_var_with_where(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        DESCRIBE ?s WHERE {{ ?s rdfs:label ?l FILTER(?l < 2) }}""",
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert rows == {
        (EX + "i1", RDF + "type", EX + "even"),
        (EX + "i1", RDFS + "label", "1"),
    }


def test_union_joined_with_patterns(oddeven):
    # Join(Union(A,B), G): the union restricts ?s to classed subjects,
    # the required pattern pulls each one's label
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s rdfs:label ?l .
          {{ ?s a ex:even }} UNION {{ ?s a ex:odd }}
          FILTER(?l < 3)
        }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (EX + "i1", "1"), (EX + "i2", "2")
    }


def test_negated_property_set(oddeven):
    # !rdf:type leaves only the label edges; !(rdf:type|rdfs:label) is empty
    out = sparql_query(
        oddeven,
        f"PREFIX rdfs: <{RDFS}> SELECT ?s ?o WHERE {{ ?s !a ?o FILTER(?o < 2) }}",
    )
    assert {(r.s, r.o) for r in out.collect()} == {(EX + "i1", "1")}
    none = sparql_query(
        oddeven,
        f"PREFIX rdfs: <{RDFS}> SELECT ?s WHERE {{ ?s !(a|rdfs:label) ?o }}",
    )
    assert none.count() == 0


def test_negated_property_set_inverse_members(oddeven):
    """SPARQL 1.1 §9.2: !(F|^I) ≡ !(F) | ^(!(I)). A pure-inverse set
    matches REVERSED edges whose predicate is outside the set; a mixed
    set unions the forward and reversed components."""
    # !(^a): reversed edges from predicates other than rdf:type — i.e.
    # label edges reversed: ("1", ex:i1)
    inv = sparql_query(
        oddeven,
        f'SELECT ?s ?o WHERE {{ ?s !(^a) ?o FILTER(?s = "1") }}',
    )
    assert {(r.s, r.o) for r in inv.collect()} == {("1", EX + "i1")}
    # !(a|^rdfs:label): forward label edges UNION reversed type edges
    mixed = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?o WHERE {{
          ?s !(a|^rdfs:label) ?o
          FILTER(?o = "1" || ?o = ex:i1)
        }}""",
    )
    assert {(r.s, r.o) for r in mixed.collect()} == {
        (EX + "i1", "1"),         # forward: label edge survives !a
        (EX + "even", EX + "i1"),  # reversed: type edge survives !label
    }


def test_compound_path_closure(spark, tmp_path):
    # hop = next/next: a ->2 c ->2 e; (next/next)+ from a = {c, e};
    # (next/next)* adds the zero-length endpoints incident to hop edges
    nt = "\n".join(
        f"<{EX}{x}> <{EX}next> <{EX}y>".replace("y", y) + " ."
        for x, y in [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "p.nt", nt)]))
    plus = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ex:a (ex:next/ex:next)+ ?x }}"
    )
    assert {r.x for r in plus.collect()} == {EX + "c", EX + "e"}
    star = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ex:c (ex:next/ex:next)* ?x }}"
    )
    assert {r.x for r in star.collect()} == {EX + "c", EX + "e"}
    # alternation closure: (next|^next)+ from c reaches every node
    alt = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ex:c (ex:next|^ex:next)+ ?x }}"
    )
    assert {r.x for r in alt.collect()} == {EX + s for s in "abcde"}


def test_compound_path_closure_graph_var(spark, tmp_path):
    """Closure over a COMPOUND path under GRAPH ?g (the pre-round-5
    ValueError): the inner edge set compiles per graph through a hidden
    graph variable, the closure groups on the decoded IRI, and the
    zero-length node set is per-graph too."""
    nq = "\n".join(
        [
            f"<{EX}a> <{EX}p1> <{EX}m> <{EX}g1> .",
            f"<{EX}m> <{EX}p2> <{EX}b> <{EX}g1> .",
            f"<{EX}b> <{EX}p1> <{EX}n> <{EX}g1> .",
            f"<{EX}n> <{EX}p2> <{EX}c> <{EX}g1> .",
            # g2 has a p1/p2 hop of its own plus an unrelated edge
            f"<{EX}x> <{EX}p1> <{EX}w> <{EX}g2> .",
            f"<{EX}w> <{EX}p2> <{EX}y> <{EX}g2> .",
            f"<{EX}q> <{EX}other> <{EX}r> <{EX}g2> .",
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "cp.nq", nq)]))
    plus = sparql_query(
        p,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?s ?x WHERE {{ GRAPH ?g {{ ?s (ex:p1/ex:p2)+ ?x }} }}""",
    )
    got = {(r.g, r.s, r.x) for r in plus.collect()}
    assert got == {
        (EX + "g1", EX + "a", EX + "b"),
        (EX + "g1", EX + "b", EX + "c"),
        (EX + "g1", EX + "a", EX + "c"),  # two hops, closed within g1
        (EX + "g2", EX + "x", EX + "y"),
    }
    # constant endpoint + star: zero-length self-match rides per graph —
    # a bound in g1 only reaches its own graph's closure
    star = sparql_query(
        p,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?x WHERE {{ GRAPH ?g {{ ex:a (ex:p1/ex:p2)* ?x }} }}""",
    )
    by_g = {}
    for r in star.collect():
        by_g.setdefault(r.g, set()).add(r.x)
    # the (a, a) zero-length match holds in EVERY named graph (§9.3);
    # the closure contributes b and c inside g1 only
    assert by_g[EX + "g1"] == {EX + "a", EX + "b", EX + "c"}
    assert by_g[EX + "g2"] == {EX + "a"}


def test_select_expression(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s (?l * 2 AS ?dbl) WHERE {{
          ?s rdfs:label ?l FILTER(?l > 97)
        }}""",
    )
    assert {(r.s, r.dbl) for r in out.collect()} == {
        (EX + "i98", 196.0), (EX + "i99", 198.0)
    }
    assert out.columns == ["s", "dbl"]
    with pytest.raises(SparqlUnsupported, match="SELECT expression"):
        sparql_query(
            oddeven,
            f"PREFIX rdfs: <{RDFS}> SELECT (STRLEN(?l) AS ?n) (COUNT(?s) AS ?c) "
            "WHERE { ?s rdfs:label ?l }",
        )


# -- IN / NOT IN, STRBEFORE/STRAFTER/REPLACE, term-kind tests --------------


def test_in_and_not_in(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l WHERE {{ ?s rdfs:label ?l FILTER(?l IN ("1", "2", "77")) }}""",
    )
    assert {r.l for r in out.collect()} == {"1", "2", "77"}
    neg = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l WHERE {{
          ?s rdfs:label ?l FILTER(?l < 4 && ?l NOT IN ("2", "3"))
        }}""",
    )
    assert {r.l for r in neg.collect()} == {"1"}


def test_strbefore_strafter_replace(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        SELECT ?s ?tail ?rep WHERE {{
          ?s rdfs:label ?l FILTER(?l = "42")
          BIND(STRAFTER(STR(?s), "org/") AS ?tail)
          BIND(REPLACE(?tail, "[0-9]+", "N") AS ?rep)
        }}""",
    )
    [(s, tail, rep)] = [(r.s, r.tail, r.rep) for r in out.collect()]
    assert (tail, rep) == ("i42", "iN")
    before = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?b WHERE {{
          ?s rdfs:label ?l FILTER(?l = "42")
          BIND(STRBEFORE("key=value", "=") AS ?b)
        }}""",
    )
    assert [r.b for r in before.collect()] == ["key"]


def test_term_kind_tests(loaded):
    blank = sparql_query(
        loaded,
        f"PREFIX rdfs: <{RDFS}> SELECT ?s WHERE "
        "{ ?s rdfs:label ?l FILTER(ISBLANK(?l)) }",
    )
    assert [r.s for r in blank.collect()] == [RDF + "Alt"]
    lit = sparql_query(
        loaded,
        f"PREFIX rdfs: <{RDFS}> SELECT ?l WHERE "
        "{ ?s rdfs:label ?l FILTER(ISLITERAL(?l) && LANG(?l) = \"cz\") }",
    )
    assert {r.l for r in lit.collect()} == {"杭州", "杭州市"}
    iri = sparql_query(
        loaded,
        "SELECT ?t WHERE { ?s a ?t FILTER(ISIRI(?t)) }",
    )
    all_types = sparql_query(loaded, "SELECT ?t WHERE { ?s a ?t }")
    # every rdf:type object is an IRI -> the filter removes nothing
    assert iri.count() == all_types.count() > 0


def test_isnumeric(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l WHERE {{ ?s rdfs:label ?l FILTER(ISNUMERIC(?l) && ?l = 7) }}""",
    )
    assert [r.l for r in out.collect()] == ["7"]


def test_multiple_from_merges_graphs(spark, tmp_path):
    nq = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f"<{EX}s2> <{RDF}type> <{EX}T> <{EX}g/two> .",
            f"<{EX}s3> <{RDF}type> <{EX}T> <{EX}g/three> .",
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "g.nq", nq)]))
    both = sparql_query(
        p,
        f"PREFIX ex: <{EX}> SELECT ?s FROM <{EX}g/one> FROM <{EX}g/two> "
        "WHERE { ?s a ex:T }",
    )
    assert {r.s for r in both.collect()} == {EX + "s1", EX + "s2"}
    one = sparql_query(
        p,
        f"PREFIX ex: <{EX}> SELECT ?s FROM <{EX}g/three> WHERE {{ ?s a ex:T }}",
    )
    assert {r.s for r in one.collect()} == {EX + "s3"}


# -- round-4 ADVICE regressions --------------------------------------------


def test_pure_union_with_filter_and_bind(oddeven):
    """A pure-UNION group with modifiers rides the mixed path since r4
    (the union frame seeds bgp) — the FILTER actually applies (r3 ADVICE:
    it was parsed then silently dropped; r3's fix rejected it; r4
    supports it)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?l ?x WHERE {{
          {{ ?s a ex:even ; rdfs:label ?l }}
          UNION {{ ?s a ex:odd ; rdfs:label ?l }}
          FILTER(?l = "7" || ?l = "8")
          BIND(CONCAT(?l, "!") AS ?x)
        }}""",
    )
    assert sorted((r.l, r.x) for r in out.collect()) == [("7", "7!"), ("8", "8!")]


def test_pure_union_with_minus_and_optional(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          {{ ?s a ex:even }} UNION {{ ?s a ex:odd }}
          MINUS {{ ?s a ex:odd }}
          OPTIONAL {{ ?s rdfs:label ?l }}
        }}""",
    )
    rows = out.collect()
    # even-classed subjects = odd i (inverted ternary): 50 of 99, all
    # with their label attached by the OPTIONAL
    assert len(rows) == 50
    assert all(r.l is not None for r in rows)


def test_pure_union_with_aggregate_and_ask_filter(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?t (COUNT(?s) AS ?n) WHERE {{
          {{ ?s a ?t . ?s rdfs:label "7" }}
          UNION {{ ?s a ?t . ?s rdfs:label "8" }}
        }} GROUP BY ?t""",
    )
    assert {(r.t, r.n) for r in out.collect()} == {
        (EX + "even", 1), (EX + "odd", 1)
    }
    ask = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        ASK WHERE {{
          {{ ?s a ex:even ; rdfs:label ?l }} UNION {{ ?s a ex:odd ; rdfs:label ?l }}
          FILTER(?l = "no-such-label")
        }}""",
    )
    assert ask.collect()[0].ask is False


def test_pure_union_lang_filter(loaded):
    """LANG() over a single pure-UNION block: each branch scans with the
    term metadata; the rdf:type branch binds IRIs, so LANG() is NULL
    there (the spec's type error) and its rows filter out."""
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?x WHERE {{
          {{ ?s rdfs:label ?x }} UNION {{ ?s a ?x }}
          FILTER(LANG(?x) = "cz")
        }}""",
    )
    assert {(r.s, r.x) for r in out.collect()} == {
        (RDF + "Bag", "杭州"), (RDF + "Alt", "杭州市"),
    }
    assert out.columns == ["s", "x"]  # hidden metadata dropped


def test_multi_block_union_with_lang_filter(loaded):
    """LANG()/DATATYPE() over SEVERAL pure-UNION blocks (r4 VERDICT #4):
    each block's frame carries its own term metadata; bgp joins the
    frames on lexical bindings only, first-frame metadata winning on a
    collision — no more named narrowing, no column-collision crash."""
    out = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?x ?y WHERE {{
          {{ ?s rdfs:label ?x }} UNION {{ ?s a ?x }}
          {{ ?s rdfs:label ?y }} UNION {{ ?s a ?y }}
          FILTER(LANG(?x) = "cz" && LANG(?y) = "en-UK")
        }}""",
    )
    rows = {(r.s, r.x, r.y) for r in out.collect()}
    assert rows == {
        (RDF + "Alt", "杭州市", "lala"),
        (RDF + "Alt", "杭州市", "lala lala"),
    }
    assert out.columns == ["s", "x", "y"]  # hidden metadata dropped
    # same variable bound by BOTH blocks: duplicate metadata columns are
    # deduped (first block wins), the blocks join on the lexical binding
    dup = sparql_query(
        loaded,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?x WHERE {{
          {{ ?s rdfs:label ?x }} UNION {{ ?s a ?x }}
          {{ ?s rdfs:label ?x }} UNION {{ ?s a ?x }}
          FILTER(LANG(?x) = "cz")
        }}""",
    )
    assert {(r.s, r.x) for r in dup.collect()} == {
        (RDF + "Bag", "杭州"), (RDF + "Alt", "杭州市"),
    }


def test_describe_var_respects_from_graph(spark, tmp_path):
    """DESCRIBE ?x FROM <g> must evaluate the WHERE group inside <g> only
    (r3 ADVICE: it ignored q['graph'] and matched every graph)."""
    nq = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f'<{EX}s1> <{RDFS}label> "one" <{EX}g/one> .',
            f"<{EX}s2> <{RDF}type> <{EX}T> <{EX}g/two> .",
            f'<{EX}s2> <{RDFS}label> "two" <{EX}g/two> .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "g.nq", nq)]))
    out = sparql_query(
        p,
        f"PREFIX ex: <{EX}> DESCRIBE ?s FROM <{EX}g/one> WHERE {{ ?s a ex:T }}",
    )
    assert {r.subject for r in out.collect()} == {EX + "s1"}


def test_construct_blank_node_template(oddeven):
    """CONSTRUCT { ?s <p> [] }: the template bnode maps to a FRESH bnode
    per solution (SPARQL §16.2.1) — previously an unresolved-column crash."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:hasThing [] }}
        WHERE {{ ?s rdfs:label ?l FILTER (?l < 3) }}""",
    )
    rows = out.collect()
    assert {r.subject for r in rows} == {EX + "i1", EX + "i2"}
    assert all(r.predicate == EX + "hasThing" for r in rows)
    # fresh per solution: two solutions -> two DISTINCT bnode objects
    objs = [r.object for r in rows]
    assert len(objs) == len(set(objs)) == 2
    assert all(o.startswith("_:") for o in objs)


def test_construct_unbound_plain_var_emits_nothing(oddeven):
    # a NON-bnode template variable the WHERE never binds is unbound in
    # every solution -> that template row emits no triples (not a crash)
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:nope ?missing . ?s ex:yes ?l }}
        WHERE {{ ?s rdfs:label ?l FILTER (?l < 2) }}""",
    )
    rows = {(r.predicate, r.object) for r in out.collect()}
    assert rows == {(EX + "yes", "1")}


def test_limit_offset_reject_non_integer():
    """Parser totality: LIMIT/OFFSET with a non-integer token must raise
    SparqlSyntaxError, never ValueError (r3 ADVICE fuzz finding)."""
    from r2s2_spark.plans.sparql_text import SparqlSyntaxError

    for q in (
        "SELECT * { } LIMIT ?x",
        "SELECT * WHERE { ?s ?p ?o } OFFSET bad",
        "SELECT * WHERE { ?s ?p ?o } LIMIT 1.5",
        "SELECT * WHERE { ?s ?p ?o } LIMIT",
        "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o } LIMIT x",
    ):
        with pytest.raises(SparqlSyntaxError):
            parse_sparql(q)
    assert parse_sparql("SELECT * WHERE { ?s ?p ?o } LIMIT 5 OFFSET 2")[
        "limit"
    ] == 5


def test_in_list_numeric_coercion(oddeven):
    """?x IN (1) must use the same numeric lifting as ?x = 1: a lexical
    '1.0'-style value compares by VALUE when the element is numeric."""
    eq = sparql_query(
        oddeven,
        f"PREFIX rdfs: <{RDFS}> SELECT ?s WHERE "
        "{ ?s rdfs:label ?l FILTER(?l = 1) }",
    )
    inn = sparql_query(
        oddeven,
        f"PREFIX rdfs: <{RDFS}> SELECT ?s WHERE "
        "{ ?s rdfs:label ?l FILTER(?l IN (1)) }",
    )
    assert {r.s for r in eq.collect()} == {r.s for r in inn.collect()} == {
        EX + "i1"
    }


# -- round-4 GRAPH scoping generality --------------------------------------


@pytest.fixture(scope="module")
def twograph(spark, tmp_path_factory):
    nq = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f'<{EX}s1> <{RDFS}label> "one" <{EX}g/one> .',
            f"<{EX}s2> <{RDF}type> <{EX}T> <{EX}g/two> .",
            f'<{EX}s2> <{RDFS}label> "two" <{EX}g/two> .',
            f'<{EX}s1> <{EX}seen> "y" .',  # default graph only
        ]
    )
    p = KgPipeline(spark, str(tmp_path_factory.mktemp("tg") / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "g.nq", nq)]))
    return p


def test_graph_mixed_with_default_patterns(twograph):
    out = sparql_query(
        twograph,
        f"PREFIX ex: <{EX}> SELECT ?s ?g WHERE "
        "{ GRAPH ?g { ?s a ex:T } . ?s ex:seen ?v }",
    )
    assert [(r.s, r.g) for r in out.collect()] == [(EX + "s1", EX + "g/one")]


def test_two_variable_graph_scopes(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?g ?h WHERE {{
          GRAPH ?g {{ ?s a ex:T }} . GRAPH ?h {{ ?s rdfs:label ?l }}
        }}""",
    )
    rows = sorted((r.s, r.g, r.h) for r in out.collect())
    assert rows == [
        (EX + "s1", EX + "g/one", EX + "g/one"),
        (EX + "s2", EX + "g/two", EX + "g/two"),
    ]


def test_two_constant_graph_scopes(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?t WHERE {{
          GRAPH <{EX}g/one> {{ ?s a ex:T }} . GRAPH <{EX}g/two> {{ ?t a ex:T }}
        }}""",
    )
    assert [(r.s, r.t) for r in out.collect()] == [(EX + "s1", EX + "s2")]


def test_from_and_from_named_combination(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?g ?t FROM <{EX}g/one> FROM NAMED <{EX}g/two>
        WHERE {{ ?s a ex:T . GRAPH ?g {{ ?t a ex:T }} }}""",
    )
    assert [(r.s, r.g, r.t) for r in out.collect()] == [
        (EX + "s1", EX + "g/two", EX + "s2")
    ]


def test_from_without_named_leaves_graph_empty(twograph):
    # FROM present, no FROM NAMED: the dataset has NO named graphs, so a
    # GRAPH block matches nothing (SPARQL §13.2)
    out = sparql_query(
        twograph,
        f"PREFIX ex: <{EX}> SELECT ?s ?g FROM <{EX}g/one> "
        "WHERE { GRAPH ?g { ?s a ex:T } }",
    )
    assert out.count() == 0


def test_from_named_only_leaves_default_empty(twograph):
    out = sparql_query(
        twograph,
        f"PREFIX ex: <{EX}> SELECT ?s FROM NAMED <{EX}g/one> "
        "WHERE { ?s a ex:T }",
    )
    assert out.count() == 0


def test_from_named_restricts_graph_var(twograph):
    out = sparql_query(
        twograph,
        f"PREFIX ex: <{EX}> SELECT ?s ?g FROM NAMED <{EX}g/two> "
        "WHERE { GRAPH ?g { ?s a ex:T } }",
    )
    assert [(r.s, r.g) for r in out.collect()] == [(EX + "s2", EX + "g/two")]


def test_optional_group_with_own_graph_scope(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s ex:seen ?v OPTIONAL {{ GRAPH <{EX}g/one> {{ ?s rdfs:label ?l }} }}
        }}""",
    )
    assert [(r.s, r.l) for r in out.collect()] == [(EX + "s1", "one")]


def test_graph_wrapping_optional(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          GRAPH <{EX}g/two> {{ ?s a ex:T OPTIONAL {{ ?s rdfs:label ?l }} }}
        }}""",
    )
    assert [(r.s, r.l) for r in out.collect()] == [(EX + "s2", "two")]


def test_graph_scoped_minus(twograph):
    # MINUS evaluated inside its own GRAPH scope: s1's label lives in
    # g/one, so MINUS against g/two removes nothing for s1
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s a ex:T MINUS {{ GRAPH <{EX}g/two> {{ ?s rdfs:label ?l }} }}
        }}""",
    )
    assert [r.s for r in out.collect()] == [EX + "s1"]


# -- round-4: GROUP_CONCAT / SAMPLE / VALUES UNDEF -------------------------


def test_group_concat(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?t (GROUP_CONCAT(?l; SEPARATOR=",") AS ?ls) WHERE {{
          ?s a ?t ; rdfs:label ?l FILTER(?l < 4)
        }} GROUP BY ?t""",
    )
    rows = {(r.t, r.ls) for r in out.collect()}
    # sorted concatenation (deterministic choice); class assignment is the
    # fixture's inverted ternary: odd labels carry ex:even and vice versa
    assert rows == {(EX + "even", "1,3"), (EX + "odd", "2")}


def test_group_concat_distinct_default_separator(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        SELECT (GROUP_CONCAT(DISTINCT ?t) AS ?ts) WHERE {{ ?s a ?t }}""",
    )
    assert [r.ts for r in out.collect()] == [f"{EX}even {EX}odd"]


def test_sample_aggregate(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?t (SAMPLE(?l) AS ?one) WHERE {{
          ?s a ?t ; rdfs:label ?l
        }} GROUP BY ?t""",
    )
    # SAMPLE = deterministic MIN here (documented choice); lexicographic
    # mins of the two label sets ('1' for evens, '10' for odds)
    assert {(r.t, r.one) for r in out.collect()} == {
        (EX + "even", "1"), (EX + "odd", "10"),
    }


def test_values_undef_wildcard(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?t WHERE {{
          ?s a ?t ; rdfs:label ?l FILTER(?l < 3)
          VALUES (?t) {{ (ex:even) (UNDEF) }}
        }}""",
    )
    rows = sorted((r.s, r.t) for r in out.collect())
    # labels < 3: i1 (class even, inverted ternary) and i2 (class odd).
    # The UNDEF row matches BOTH; (ex:even) matches i1 again — multiset
    # semantics keep the duplicate
    assert rows == [
        (EX + "i1", EX + "even"),
        (EX + "i1", EX + "even"),
        (EX + "i2", EX + "odd"),
    ]


def test_values_undef_multi_var(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s a ?t ; rdfs:label ?l
          VALUES (?t ?l) {{ (ex:odd UNDEF) (UNDEF "2") }}
        }}""",
    )
    rows = sorted((r.s, r.l) for r in out.collect())
    # (ex:odd UNDEF) matches every odd-classed subject (even i); i2 also
    # matches (UNDEF "2") -> appears twice. even-classed subjects (odd i)
    # never match.
    assert rows.count((EX + "i2", "2")) == 2
    assert (EX + "i4", "4") in rows
    assert (EX + "i1", "1") not in rows and (EX + "i3", "3") not in rows


# -- round-4: CONSTRUCT/DESCRIBE breadth -----------------------------------


def test_ask_with_union(oddeven):
    yes = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> ASK {{ {{ ?s a ex:nosuch }} UNION {{ ?s a ex:even }} }}",
    )
    assert [r.ask for r in yes.collect()] == [True]
    no = sparql_query(
        oddeven,
        f"PREFIX ex: <{EX}> ASK {{ {{ ?s a ex:no1 }} UNION {{ ?s a ex:no2 }} }}",
    )
    assert [r.ask for r in no.collect()] == [False]


def test_construct_with_union(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:kept ?l }} WHERE {{
          ?s rdfs:label ?l FILTER(?l < 3)
          {{ ?s a ex:even }} UNION {{ ?s a ex:odd }}
        }}""",
    )
    rows = {(r.subject, r.object) for r in out.collect()}
    assert rows == {(EX + "i1", "1"), (EX + "i2", "2")}


def test_construct_sequence_path_template(oddeven):
    """?s (p1/p2) ?o in the template chains through a FRESH per-solution
    blank node: ?s p1 _:m . _:m p2 ?o."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:hasEntry/ex:entryLabel ?l }}
        WHERE {{ ?s rdfs:label ?l FILTER(?l < 3) }}""",
    )
    rows = [(r.subject, r.predicate, r.object) for r in out.collect()]
    first = [r for r in rows if r[1] == EX + "hasEntry"]
    second = [r for r in rows if r[1] == EX + "entryLabel"]
    assert {r[0] for r in first} == {EX + "i1", EX + "i2"}
    assert {r[2] for r in second} == {"1", "2"}
    # the chain joins: every hasEntry object is an entryLabel subject,
    # bnodes are distinct per solution
    mids_a = sorted(r[2] for r in first)
    mids_b = sorted(r[0] for r in second)
    assert mids_a == mids_b and len(set(mids_a)) == 2
    assert all(m.startswith("_:") for m in mids_a)


def test_describe_star(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        DESCRIBE * WHERE {{ ?s rdfs:label ?l FILTER(?l = 1) }}""",
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    # ?s = i1 (described); ?l = plain literal "1" (no triples with a
    # literal subject exist, so it contributes nothing)
    assert rows == {
        (EX + "i1", RDF + "type", EX + "even"),
        (EX + "i1", RDFS + "label", "1"),
    }


def test_describe_with_union(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        PREFIX rdfs: <{RDFS}>
        DESCRIBE ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l < 2)
          {{ ?s a ex:even }} UNION {{ ?s a ex:odd }}
        }}""",
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert rows == {
        (EX + "i1", RDF + "type", EX + "even"),
        (EX + "i1", RDFS + "label", "1"),
    }


# -- round-4b: group generality, path completeness, builtin breadth --------


def test_multiple_union_blocks_one_group(oddeven):
    """Two UNION blocks in one group: each compiles to its own frame and
    the blocks JOIN on shared variables (SPARQL Join of two Unions)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          {{ ?s a ex:even }} UNION {{ ?s a ex:odd }}
          {{ ?s rdfs:label ?l FILTER(?l = 1) }} UNION {{ ?s rdfs:label ?l FILTER(?l = 2) }}
        }}""",
    )
    assert {(r.s, r.l) for r in out.collect()} == {
        (EX + "i1", "1"), (EX + "i2", "2")
    }


def test_union_inside_graph_block(twograph):
    """UNION inside GRAPH: the branch patterns carry the block's scope."""
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?g WHERE {{
          GRAPH ?g {{ {{ ?s a ex:T }} UNION {{ ?s rdfs:label "one" }} }}
        }}""",
    )
    rows = {(r.s, r.g) for r in out.collect()}
    assert rows == {
        (EX + "s1", EX + "g/one"),
        (EX + "s2", EX + "g/two"),
    }
    # constant scope: only g/one's branches contribute
    one = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          GRAPH <{EX}g/one> {{ {{ ?s a ex:T }} UNION {{ ?s rdfs:label "two" }} }}
        }}""",
    )
    assert {r.s for r in one.collect()} == {EX + "s1"}


def test_bind_and_values_inside_graph_block(twograph):
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?tag ?l WHERE {{
          GRAPH ?g {{
            ?s rdfs:label ?l
            BIND(CONCAT("in:", ?l) AS ?tag)
            VALUES ?l {{ "one" }}
          }}
        }}""",
    )
    assert [(r.s, r.tag, r.l) for r in out.collect()] == [
        (EX + "s1", "in:one", "one")
    ]


def test_subquery_inside_ask_and_construct(oddeven):
    yes = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        ASK WHERE {{ {{ SELECT ?s WHERE {{ ?s rdfs:label "1" }} }} }}""",
    )
    assert yes.collect()[0].ask is True
    no = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        ASK WHERE {{ {{ SELECT ?s WHERE {{ ?s rdfs:label "none" }} }} }}""",
    )
    assert no.collect()[0].ask is False
    built = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:tagged "yes" }} WHERE {{
          {{ SELECT ?s WHERE {{ ?s rdfs:label ?l FILTER(?l < 2) }} }}
        }}""",
    )
    assert {(r.subject, r.predicate, r.object) for r in built.collect()} == {
        (EX + "i1", EX + "tagged", "yes")
    }


def test_subselect_inside_graph_var(twograph):
    """Sub-SELECT under GRAPH ?g (r4 VERDICT #4): the subquery evaluates
    once per named graph — its aggregate groups per graph and ?g binds
    outside. g/one and g/two each hold 2 triples."""
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?n WHERE {{
          GRAPH ?g {{ {{ SELECT (COUNT(?s) AS ?n) WHERE {{ ?s ?p ?o }} }} }}
        }} ORDER BY ?g""",
    )
    # the engine fills graph-less triples with the catalog default graph,
    # which GRAPH ?var then ranges over like any named graph (existing
    # documented model) — so the default graph's 1 triple counts too
    assert [(r.g, r.n) for r in out.collect()] == [
        ("http://example.org/graph", 1),
        (EX + "g/one", 2), (EX + "g/two", 2),
    ]
    # non-aggregate subquery: DISTINCT applies per graph, ?g joins the
    # outer pattern in the same GRAPH block
    out2 = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?g ?s ?l WHERE {{
          GRAPH ?g {{
            ?s rdfs:label ?l .
            {{ SELECT DISTINCT ?s WHERE {{ ?s a ex:T }} }}
          }}
        }} ORDER BY ?g""",
    )
    assert [(r.g, r.s, r.l) for r in out2.collect()] == [
        (EX + "g/one", EX + "s1", "one"), (EX + "g/two", EX + "s2", "two"),
    ]


def test_subselect_graph_var_limit_per_graph(twograph):
    """LIMIT/OFFSET in a sub-SELECT under GRAPH ?g slices PER GRAPH
    (row_number window partitioned on ?g), not across the whole frame —
    each graph keeps its own top-k. g/one and g/two hold 2 triples each,
    the default graph 1."""
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?p WHERE {{
          GRAPH ?g {{ {{ SELECT ?p WHERE {{ ?s ?p ?o }} ORDER BY ?p LIMIT 1 }} }}
        }} ORDER BY ?g""",
    )
    # per graph, the lexically smallest predicate survives; a plain
    # frame-wide LIMIT 1 would keep a single row total
    assert [(r.g, r.p) for r in out.collect()] == [
        ("http://example.org/graph", EX + "seen"),
        (EX + "g/one", RDF + "type"),
        (EX + "g/two", RDF + "type"),
    ]
    # OFFSET skips per graph too: the 1-triple default graph empties out
    out2 = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?p WHERE {{
          GRAPH ?g {{
            {{ SELECT ?p WHERE {{ ?s ?p ?o }} ORDER BY ?p LIMIT 1 OFFSET 1 }}
          }}
        }} ORDER BY ?g""",
    )
    assert [(r.g, r.p) for r in out2.collect()] == [
        (EX + "g/one", RDFS + "label"),
        (EX + "g/two", RDFS + "label"),
    ]
    # unordered slice: any 1 row per graph is spec-valid — assert the
    # per-graph cardinality, not which row
    out3 = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?p WHERE {{
          GRAPH ?g {{ {{ SELECT ?p WHERE {{ ?s ?p ?o }} LIMIT 1 }} }}
        }}""",
    )
    from collections import Counter

    counts = Counter(r.g for r in out3.collect())
    assert counts == {
        "http://example.org/graph": 1, EX + "g/one": 1, EX + "g/two": 1,
    }


def test_subselect_graph_var_agg_order_slice(spark, tmp_path_factory):
    """Aggregate ORDER BY + LIMIT in a sub-SELECT under GRAPH ?g: the
    hidden aggregate sort keys materialize as __o columns that survive
    the deferred projection, so the per-graph slice can rank by them —
    the most frequent predicate PER GRAPH, not across graphs."""
    nq = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f"<{EX}s2> <{RDF}type> <{EX}T> <{EX}g/one> .",
            f'<{EX}s1> <{RDFS}label> "a" <{EX}g/one> .',
            f'<{EX}s3> <{RDFS}label> "x" <{EX}g/two> .',
            f'<{EX}s4> <{RDFS}label> "y" <{EX}g/two> .',
            f"<{EX}s3> <{RDF}type> <{EX}T> <{EX}g/two> .",
            f'<{EX}s1> <{EX}seen> "y" .',
        ]
    )
    pipe = KgPipeline(spark, str(tmp_path_factory.mktemp("gs") / "wd"))
    pipe.load(fx.source_files_df(spark, [fx._row("r", "g.nq", nq)]))
    q = f"""PREFIX ex: <{EX}>
    SELECT ?g ?p WHERE {{
      GRAPH ?g {{
        {{ SELECT ?p WHERE {{ ?s ?p ?o }}
           GROUP BY ?p ORDER BY DESC(COUNT(?s)) LIMIT 1 }}
      }}
    }} ORDER BY ?g"""
    out = sparql_query(pipe, q)
    assert [(r.g, r.p) for r in out.collect()] == [
        ("http://example.org/graph", EX + "seen"),
        (EX + "g/one", RDF + "type"),
        (EX + "g/two", RDFS + "label"),
    ]
    # DISTINCT + aggregate ORDER BY + slice compose too (the __o keys
    # ride through the one-best-ranked-duplicate window as well)
    q2 = f"""PREFIX ex: <{EX}>
    SELECT ?g ?p WHERE {{
      GRAPH ?g {{
        {{ SELECT DISTINCT ?p WHERE {{ ?s ?p ?o }}
           GROUP BY ?p ORDER BY DESC(COUNT(?s)) LIMIT 1 }}
      }}
    }} ORDER BY ?g"""
    out2 = sparql_query(pipe, q2)
    assert [(r.g, r.p) for r in out2.collect()] == [
        ("http://example.org/graph", EX + "seen"),
        (EX + "g/one", RDF + "type"),
        (EX + "g/two", RDFS + "label"),
    ]


def test_subselect_graph_var_pattern_reuse_renamed(twograph):
    """Pattern-only reuse of the graph variable inside a sub-SELECT:
    the inner occurrence is a different variable (§18.2.1) and is
    alpha-renamed — it must NOT join against the graph IRI. Here the
    inner ?g sits in object position over rdfs:label; a (wrong) join
    with the graph name would match nothing."""
    out = sparql_query(
        twograph,
        f"""SELECT ?g ?s WHERE {{
          GRAPH ?g {{ {{ SELECT ?s WHERE {{ ?s <{RDFS}label> ?g }} }} }}
        }} ORDER BY ?g""",
    )
    assert [(r.g, r.s) for r in out.collect()] == [
        (EX + "g/one", EX + "s1"),
        (EX + "g/two", EX + "s2"),
    ]
    # inner GRAPH ?g reuse: the inner scope variable is ALSO a different
    # variable — it ranges over graphs independently of the outer
    # binding. With an outer-scoped pattern anchoring ?g, the renamed
    # inner block joins in (here: no shared vars -> spec cross product,
    # collapsed by DISTINCT); with NO anchor pattern it stays named.
    out2 = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?g ?s WHERE {{
          GRAPH ?g {{
            {{ SELECT DISTINCT ?s WHERE
               {{ ?s a ex:T . GRAPH ?g {{ ?s2 ?p ?o }} }} }}
          }}
        }} ORDER BY ?g ?s""",
    )
    assert [(r.g, r.s) for r in out2.collect()] == [
        (EX + "g/one", EX + "s1"),
        (EX + "g/two", EX + "s2"),
    ]
    with pytest.raises(SparqlUnsupported, match="outer-scoped"):
        parse_sparql(
            "SELECT ?g ?s WHERE { GRAPH ?g { "
            "{ SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } } } } }"
        )


# -- SERVICE federation over registered endpoints ---------------------------


@pytest.fixture(scope="module")
def fedpair(spark, tmp_path_factory):
    """Two loaded pipelines: the local one holds rdf:type triples, the
    pipeline registered as <urn:svc:labels> holds the labels."""
    local_nt = "\n".join(
        [
            f"<{EX}s1> <{RDF}type> <{EX}T> .",
            f"<{EX}s2> <{RDF}type> <{EX}T> .",
            f"<{EX}s3> <{RDF}type> <{EX}U> .",
        ]
    )
    remote_nt = "\n".join(
        [
            f'<{EX}s1> <{RDFS}label> "one" .',
            f'<{EX}s2> <{RDFS}label> "two" .',
            f'<{EX}s9> <{RDFS}label> "nine" .',
        ]
    )
    local = KgPipeline(spark, str(tmp_path_factory.mktemp("fl") / "wd"))
    local.load(fx.source_files_df(spark, [fx._row("r", "l.nt", local_nt)]))
    remote = KgPipeline(spark, str(tmp_path_factory.mktemp("fr") / "wd"))
    remote.load(fx.source_files_df(spark, [fx._row("r", "r.nt", remote_nt)]))
    local.register_service("urn:svc:labels", remote)
    return local


def test_service_joins_registered_endpoint(fedpair):
    """SERVICE <iri> { P }: P evaluates against the registered endpoint
    pipeline and joins the enclosing group on shared variables — s3 has
    no remote label, s9 no local type."""
    out = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?l WHERE {{
          ?s a ex:T .
          SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }}
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.l) for r in out.collect()] == [
        (EX + "s1", "one"),
        (EX + "s2", "two"),
    ]


def test_service_only_group_and_optional(fedpair):
    """A WHERE group consisting of just a SERVICE block works (the frame
    IS the solution set), and SERVICE inside OPTIONAL left-joins."""
    out = sparql_query(
        fedpair,
        f"""SELECT ?s WHERE {{
          SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }}
        }} ORDER BY ?s""",
    )
    assert [r.s for r in out.collect()] == [
        EX + "s1", EX + "s2", EX + "s9",
    ]
    out2 = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?l WHERE {{
          ?s a ?t .
          OPTIONAL {{ SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }} }}
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.l) for r in out2.collect()] == [
        (EX + "s1", "one"),
        (EX + "s2", "two"),
        (EX + "s3", None),
    ]


def test_service_unregistered_named_and_silent(fedpair):
    """An unregistered endpoint is a NAMED error; SILENT turns the
    failure into the spec's single empty solution (§18.8) — the outer
    solutions survive with the service variables unbound."""
    from r2s2_spark.plans.sparql import SparqlCompileError

    q = f"""PREFIX ex: <{EX}>
        SELECT ?s ?l WHERE {{
          ?s a ex:T .
          SERVICE <urn:svc:nope> {{ ?s <{RDFS}label> ?l }}
        }}"""
    with pytest.raises(SparqlCompileError, match="not registered"):
        sparql_query(fedpair, q)
    out = sparql_query(fedpair, q.replace("SERVICE", "SERVICE SILENT"))
    assert sorted((r.s, r.l) for r in out.collect()) == [
        (EX + "s1", None),
        (EX + "s2", None),
    ]


def test_service_variable_endpoint_over_registry(fedpair, spark, tmp_path_factory):
    """SERVICE ?e ranges over the REGISTERED endpoints, binding each
    endpoint's IRI per solution (the union of per-endpoint results)."""
    extra = KgPipeline(spark, str(tmp_path_factory.mktemp("fx2") / "wd"))
    extra.load(
        fx.source_files_df(
            spark, [fx._row("r", "x.nt", f'<{EX}s2> <{RDFS}label> "zwei" .')]
        )
    )
    fedpair.register_service("urn:svc:labels2", extra)
    try:
        out = sparql_query(
            fedpair,
            f"""PREFIX ex: <{EX}>
            SELECT ?e ?s ?l WHERE {{
              ?s a ex:T .
              SERVICE ?e {{ ?s <{RDFS}label> ?l }}
            }} ORDER BY ?e ?s""",
        )
        assert [(r.e, r.s, r.l) for r in out.collect()] == [
            ("urn:svc:labels", EX + "s1", "one"),
            ("urn:svc:labels", EX + "s2", "two"),
            ("urn:svc:labels2", EX + "s2", "zwei"),
        ]
    finally:
        del fedpair.services["urn:svc:labels2"]
    # no registered endpoints: a named error (SILENT -> empty solution)
    from r2s2_spark.plans.sparql import SparqlCompileError

    lone = KgPipeline(spark, str(tmp_path_factory.mktemp("fx3") / "wd"))
    lone.load(
        fx.source_files_df(
            spark, [fx._row("r", "y.nt", f"<{EX}s1> <{RDF}type> <{EX}T> .")]
        )
    )
    with pytest.raises(SparqlCompileError, match="no registered"):
        sparql_query(
            lone, "SELECT ?s WHERE { SERVICE ?e { ?s ?p ?o } }"
        )
    out2 = sparql_query(
        lone,
        f"""SELECT ?s ?l ?e WHERE {{
          ?s a <{EX}T> .
          SERVICE SILENT ?e {{ ?s <{RDFS}label> ?l }}
        }}""",
    )
    assert [(r.s, r.l, r.e) for r in out2.collect()] == [
        (EX + "s1", None, None)
    ]


def test_service_silent_mu0_edge_cases(fedpair):
    """μ0 NULL-binding composes: a variable a LIVE service frame shares
    with the failed one keeps the frame's values (only the exclusive
    variable NULL-binds), and a BIND can read the NULL column."""
    out = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?l ?c WHERE {{
          ?s a ex:T .
          SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }}
          SERVICE SILENT <urn:svc:gone>
            {{ ?s <{RDFS}label> ?l . ?s ex:c ?c }}
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.l, r.c) for r in out.collect()] == [
        (EX + "s1", "one", None),
        (EX + "s2", "two", None),
    ]
    out2 = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?y WHERE {{
          ?s a ex:T .
          SERVICE SILENT <urn:svc:gone> {{ ?s <{RDFS}label> ?l }}
          BIND(COALESCE(?l, "none") AS ?y)
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.y) for r in out2.collect()] == [
        (EX + "s1", "none"),
        (EX + "s2", "none"),
    ]


def test_sequence_path_inside_alternation(spark, tmp_path):
    """(a/b)|c — a sequence branch compiles via the chain join on the
    branch endpoints; no manual distribution needed."""
    from r2s2_spark.pipeline import KgPipeline

    nt = "\n".join(
        [
            f"<{EX}x> <{EX}a> <{EX}m> .",
            f"<{EX}m> <{EX}b> <{EX}y1> .",
            f"<{EX}x> <{EX}c> <{EX}y2> .",
            f"<{EX}z> <{EX}a> <{EX}n> .",  # dangling a-edge: no b step
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "p.nt", nt)]))
    out = sparql_query(
        p, f"PREFIX ex: <{EX}> SELECT ?s ?o WHERE {{ ?s (ex:a/ex:b)|ex:c ?o }}"
    )
    assert {(r.s, r.o) for r in out.collect()} == {
        (EX + "x", EX + "y1"), (EX + "x", EX + "y2")
    }
    # constant endpoints: both-constant branches behave as existence tests
    got = sparql_query(
        p,
        f"PREFIX ex: <{EX}> SELECT ?o WHERE {{ ex:x (ex:a/ex:b)|ex:c ?o }}",
    )
    assert {r.o for r in got.collect()} == {EX + "y1", EX + "y2"}


def test_hash_functions(oddeven):
    import hashlib

    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l (MD5(?l) AS ?m) (SHA1(?l) AS ?s1) (SHA256(?l) AS ?s2)
               (SHA512(?l) AS ?s5)
        WHERE {{ ?s rdfs:label ?l FILTER(?l = 1) }}""",
    )
    r = out.collect()[0]
    raw = b"1"
    assert r.m == hashlib.md5(raw).hexdigest()
    assert r.s1 == hashlib.sha1(raw).hexdigest()
    assert r.s2 == hashlib.sha256(raw).hexdigest()
    assert r.s5 == hashlib.sha512(raw).hexdigest()


def test_encode_for_uri(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT (ENCODE_FOR_URI("Los Angeles~*100%/x_a-b.c") AS ?e)
        WHERE {{ ?s rdfs:label "1" }}""",
    )
    # RFC 3986 unreserved stay raw; everything else percent-encodes
    assert out.collect()[0].e == "Los%20Angeles~%2A100%25%2Fx_a-b.c"


def test_datetime_accessors(spark, tmp_path):
    from r2s2_spark.pipeline import KgPipeline

    nt = (
        f'<{EX}e> <{EX}at> "2024-03-05T07:08:09.25+02:00"'
        f"^^<{XSD}dateTime> ."
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "d.nt", nt)]))
    out = sparql_query(
        p,
        f"""PREFIX ex: <{EX}>
        SELECT (YEAR(?t) AS ?y) (MONTH(?t) AS ?mo) (DAY(?t) AS ?d)
               (HOURS(?t) AS ?h) (MINUTES(?t) AS ?mi) (SECONDS(?t) AS ?sec)
               (TZ(?t) AS ?tz)
        WHERE {{ ?s ex:at ?t }}""",
    )
    r = out.collect()[0]
    # components read from the LEXICAL form — the +02:00 zone is never
    # shifted into the session timezone
    assert (r.y, r.mo, r.d, r.h, r.mi) == (2024, 3, 5, 7, 8)
    assert r.sec == 9.25 and r.tz == "+02:00"


def test_iri_function_with_base(oddeven):
    out = sparql_query(
        oddeven,
        f"""BASE <http://example.org/dir/page>
        PREFIX rdfs: <{RDFS}>
        SELECT (IRI("child") AS ?rel) (IRI("/root") AS ?abs)
               (IRI("#frag") AS ?frag) (IRI("http://other/x") AS ?full)
        WHERE {{ ?s rdfs:label "1" }}""",
    )
    r = out.collect()[0]
    assert r.rel == "http://example.org/dir/child"
    assert r.abs == "http://example.org/root"
    assert r.frag == "http://example.org/dir/page#frag"
    assert r.full == "http://other/x"


def test_uuid_struuid_now_shapes(oddeven):
    import re as _re

    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT (UUID() AS ?u) (STRUUID() AS ?su) (NOW() AS ?n)
        WHERE {{ ?s rdfs:label "1" }}""",
    )
    r = out.collect()[0]
    hex_ = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    assert _re.fullmatch("urn:uuid:" + hex_, r.u)
    assert _re.fullmatch(hex_, r.su)
    assert _re.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}", r.n)


# -- round-4c: nested modifier groups ---------------------------------------
# OPTIONAL/MINUS/EXISTS bodies and UNION branches are full sub-groups
# (plans/sparql._group_frame compiles them recursively). Data reminder:
# oddeven inverts the ternary — ODD i are ex:even, EVEN i are ex:odd.


def test_optional_with_inner_filter(oddeven):
    """The FILTER applies to the OPTIONAL group's OWN solutions before
    the left join — non-matching rows keep the binding NULL, they are
    not eliminated (that's the difference from a top-level FILTER)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s a ex:even .
          OPTIONAL {{ ?s rdfs:label ?l FILTER(?l = 7) }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 50
    labelled = [r for r in rows if r.l is not None]
    assert [(r.s, r.l) for r in labelled] == [(EX + "i7", "7")]


def test_nested_optional_in_optional(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l ?m WHERE {{
          ?s a ex:even .
          OPTIONAL {{
            ?s rdfs:label ?l .
            OPTIONAL {{ ?s rdfs:label ?m FILTER(?m = 7) }}
          }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 50 and all(r.l is not None for r in rows)
    assert [r.s for r in rows if r.m is not None] == [EX + "i7"]


def test_minus_with_inner_filter(oddeven):
    """MINUS group evaluates independently (its FILTER sees only its own
    bindings, SPARQL §8.3) then removes compatible solutions."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          ?s a ex:even ; rdfs:label ?l
          MINUS {{ ?s rdfs:label ?l FILTER(?l < 10) }}
        }}""",
    )
    rows = out.collect()
    # even-classed = odd i; MINUS removes those with label < 10
    # (i1,i3,i5,i7,i9) -> 45 remain, all labels >= 10
    assert len(rows) == 45
    assert all(int(r.l) >= 10 for r in rows)


def test_union_branch_with_optional(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          {{ ?s a ex:even . OPTIONAL {{ ?s rdfs:label ?l FILTER(?l = 7) }} }}
          UNION
          {{ ?s a ex:odd ; rdfs:label ?l FILTER(?l = 8) }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 51  # 50 even-classed (one labelled) + i8
    assert sorted((r.s, r.l) for r in rows if r.l is not None) == [
        (EX + "i7", "7"), (EX + "i8", "8")
    ]


def test_union_branch_with_values(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l WHERE {{
          {{ ?s rdfs:label ?l VALUES ?l {{ "7" "8" }} }}
          UNION
          {{ ?s a ex:no-such-class ; rdfs:label ?l }}
        }}""",
    )
    assert sorted((r.s, r.l) for r in out.collect()) == [
        (EX + "i7", "7"), (EX + "i8", "8")
    ]


def test_optional_with_inner_union(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s ?k WHERE {{
          ?s rdfs:label ?l FILTER(?l = 7 || ?l = 8)
          OPTIONAL {{
            {{ ?s a ex:even . BIND("E" AS ?k) }}
            UNION {{ ?s a ex:odd . BIND("O" AS ?k) }}
          }}
        }}""",
    )
    assert sorted((r.s, r.k) for r in out.collect()) == [
        (EX + "i7", "E"), (EX + "i8", "O")
    ]


def test_exists_with_inner_union(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s a ?t
          FILTER EXISTS {{
            {{ ?s rdfs:label "7" }} UNION {{ ?s rdfs:label "8" }}
          }}
        }}""",
    )
    assert sorted(r.s for r in out.collect()) == [EX + "i7", EX + "i8"]


def test_not_exists_with_inner_filter(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s a ex:even
          FILTER NOT EXISTS {{ ?s rdfs:label ?l FILTER(?l < 50) }}
        }}""",
    )
    # even-classed = odd i; survivors have labels >= 50: i51..i99 odd
    assert len(out.collect()) == 25


def test_minus_with_inner_optional(oddeven):
    """An OPTIONAL inside MINUS extends the group's domain but unbound
    rows still share only ?s — compatibility is decided per solution."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l <= 4)
          MINUS {{ ?s a ex:odd OPTIONAL {{ ?s rdfs:label ?m }} }}
        }}""",
    )
    # labels 1..4; ex:odd = even i -> i2, i4 removed; i1, i3 remain
    assert sorted(r.s for r in out.collect()) == [EX + "i1", EX + "i3"]


def test_subgroup_narrowings_named():
    # a modifier group with modifiers but nothing to match them against
    # is rejected rather than silently empty
    with pytest.raises(SparqlUnsupported, match="no patterns"):
        parse_sparql(
            'SELECT ?s WHERE { ?s <http://p> ?o MINUS { FILTER(?o > 3) } }'
        )


# -- round-4c: sub-SELECT inside modifier groups and GRAPH blocks -----------


def test_subselect_inside_optional(oddeven):
    """An aggregate subquery left-joins per solution: every (s, t) row
    gains its class's member count; OPTIONAL keeps rows the subquery
    misses (none here)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?t ?n WHERE {{
          ?s a ?t .
          OPTIONAL {{
            {{ SELECT ?t (COUNT(?x) AS ?n) WHERE {{ ?x a ?t }} GROUP BY ?t }}
          }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 99
    counts = {(r.t, r.n) for r in rows}
    # odd i -> ex:even (50 members), even i -> ex:odd (49)
    assert counts == {(EX + "even", 50), (EX + "odd", 49)}


def test_subselect_inside_minus(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l <= 4)
          MINUS {{ {{ SELECT ?s WHERE {{ ?s a ex:odd }} }} }}
        }}""",
    )
    # labels 1..4; ex:odd = even i -> i2, i4 removed
    assert sorted(r.s for r in out.collect()) == [EX + "i1", EX + "i3"]


def test_subselect_inside_union_branch(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          {{ {{ SELECT ?s WHERE {{ ?s rdfs:label "7" }} }} }}
          UNION {{ ?s rdfs:label "8" }}
        }}""",
    )
    assert sorted(r.s for r in out.collect()) == [EX + "i7", EX + "i8"]


def test_subselect_inside_constant_graph(twograph):
    """The subquery's WHERE evaluates inside the GRAPH block's constant
    scope: only g/one's subject comes back."""
    out = sparql_query(
        twograph,
        f"""PREFIX ex: <{EX}>
        SELECT ?s WHERE {{
          GRAPH <{EX}g/one> {{
            {{ SELECT ?s WHERE {{ ?s a ?t }} }}
          }}
        }}""",
    )
    assert sorted(r.s for r in out.collect()) == [EX + "s1"]


# -- round-4c: aggregates inside ORDER BY -----------------------------------


def test_order_by_aggregate(oddeven):
    out = sparql_query(
        oddeven,
        """SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s a ?t }
        GROUP BY ?t ORDER BY DESC(COUNT(?s))""",
    )
    assert [(r.t, r.n) for r in out.collect()] == [
        (EX + "even", 50), (EX + "odd", 49)
    ]
    # bare (unbracketed) aggregate order key, ascending
    out2 = sparql_query(
        oddeven,
        """SELECT ?t WHERE { ?s a ?t } GROUP BY ?t ORDER BY COUNT(?s)""",
    )
    assert [r.t for r in out2.collect()] == [EX + "odd", EX + "even"]
    assert out2.columns == ["t"]  # hidden sort key projected away


def test_order_by_aggregate_with_distinct(oddeven):
    """DISTINCT + aggregate ORDER BY (r4 VERDICT #4): one best-ranked
    duplicate survives per projected tuple, ordered by the aggregate
    keys. Group keys are already distinct here, so DISTINCT is a no-op
    and the order must match the plain aggregate sort."""
    out = sparql_query(
        oddeven,
        """SELECT DISTINCT ?t WHERE { ?s a ?t }
        GROUP BY ?t ORDER BY COUNT(?s)""",
    )
    assert [r.t for r in out.collect()] == [EX + "odd", EX + "even"]
    assert out.columns == ["t"]
    # non-trivial DISTINCT: project a SUBSET of the group keys — each
    # width (1- and 2-digit labels) groups per (type, width), DISTINCT
    # keeps one ?t row ranked by its best (largest) group count
    out2 = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT DISTINCT ?t WHERE {{ ?s a ?t ; rdfs:label ?l }}
        GROUP BY ?t (STRLEN(?l) AS ?w) ORDER BY DESC(COUNT(?s)) ?t""",
    )
    # groups: (even,1)=5 (even,2)=45 (odd,1)=4 (odd,2)=45; best-ranked
    # duplicate per ?t is 45 for both, tie broken by ?t ascending
    assert [r.t for r in out2.collect()] == [EX + "even", EX + "odd"]


# -- round-4c: SELECT expressions over aggregates ---------------------------


def test_select_expression_over_aggregate(oddeven):
    out = sparql_query(
        oddeven,
        """SELECT ?t (COUNT(?s) * 2 AS ?d) WHERE { ?s a ?t } GROUP BY ?t""",
    )
    assert {(r.t, r.d) for r in out.collect()} == {
        (EX + "even", 100), (EX + "odd", 98)
    }
    assert out.columns == ["t", "d"]


def test_select_expression_implicit_group(oddeven):
    """An aggregate SELECT expression without GROUP BY aggregates the
    whole solution set (SPARQL's implicit single group)."""
    out = sparql_query(
        oddeven, """SELECT (COUNT(?s) + 1 AS ?c) WHERE { ?s a ?t }"""
    )
    assert [r.c for r in out.collect()] == [100]


def test_select_expression_over_group_key_and_agg(oddeven):
    out = sparql_query(
        oddeven,
        """SELECT (CONCAT(?t, "!") AS ?x) (COUNT(?s) AS ?n)
        WHERE { ?s a ?t } GROUP BY ?t ORDER BY DESC(?n)""",
    )
    assert [(r.x, r.n) for r in out.collect()] == [
        (EX + "even!", 50), (EX + "odd!", 49)
    ]


# -- round-4c: CONSTRUCT WHERE shorthand ------------------------------------


def test_construct_where_shorthand(oddeven):
    out = sparql_query(
        oddeven, f"PREFIX rdfs: <{RDFS}> CONSTRUCT WHERE {{ ?s rdfs:label ?l }}"
    )
    rows = out.collect()
    assert len(rows) == 99
    assert all(r.predicate == RDFS + "label" for r in rows)
    one = [r for r in rows if r.subject == EX + "i7"]
    assert [(r.subject, r.object) for r in one] == [(EX + "i7", "7")]


def test_construct_where_shorthand_limit(oddeven):
    out = sparql_query(
        oddeven, "CONSTRUCT WHERE { ?s ?p ?o } LIMIT 5"
    )
    assert len(out.collect()) == 5


def test_construct_where_shorthand_narrowings():
    with pytest.raises(SparqlUnsupported, match="shorthand"):
        parse_sparql(
            "CONSTRUCT WHERE { ?s <http://p> ?o FILTER(?o > 3) }"
        )
    with pytest.raises(SparqlUnsupported, match="shorthand"):
        parse_sparql("CONSTRUCT WHERE { ?s <http://p>+ ?o }")


# -- round-4c: GROUP BY expressions -----------------------------------------


def test_group_by_expression_with_alias(oddeven):
    """Group by a computed key: label length (1 digit vs 2 digits)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?w (COUNT(?s) AS ?n) WHERE {{ ?s rdfs:label ?l }}
        GROUP BY (STRLEN(?l) AS ?w) ORDER BY ?w""",
    )
    assert [(r.w, r.n) for r in out.collect()] == [(1, 9), (2, 90)]


def test_group_by_expression_hidden(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT (COUNT(?s) AS ?n) WHERE {{ ?s rdfs:label ?l }}
        GROUP BY (STRLEN(?l)) ORDER BY ?n""",
    )
    assert [r.n for r in out.collect()] == [9, 90]
    assert out.columns == ["n"]


def test_group_by_expression_mixed_with_var(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        SELECT ?t ?w (COUNT(?s) AS ?n) WHERE {{
          ?s a ?t ; rdfs:label ?l
        }} GROUP BY ?t (STRLEN(?l) AS ?w) ORDER BY ?t ?w""",
    )
    # odd i are ex:even: 1-digit odds 1,3,5,7,9 -> 5; even class 2-digit 45
    assert [(r.t, r.w, r.n) for r in out.collect()] == [
        (EX + "even", 1, 5), (EX + "even", 2, 45),
        (EX + "odd", 1, 4), (EX + "odd", 2, 45),
    ]


# -- round-4c: outer-variable FILTERs (LeftJoin condition / correlated EXISTS)


def test_optional_filter_referencing_outer_var(oddeven):
    """SPARQL's LeftJoin(P1, P2, expr): the FILTER inside OPTIONAL reads
    ?l bound OUTSIDE the group, so it joins as the LEFT JOIN CONDITION —
    failing rows keep the required solution with ?t unbound (NOT
    eliminated)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l ?t WHERE {{
          ?s rdfs:label ?l .
          OPTIONAL {{ ?s a ?t FILTER(?l <= 3) }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 99
    bound = sorted(r.s for r in rows if r.t is not None)
    assert bound == [EX + "i1", EX + "i2", EX + "i3"]


def test_exists_filter_referencing_outer_var(oddeven):
    """Correlated EXISTS (SPARQL §8.1.2): the group evaluates under the
    outer solution's bindings."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l
          FILTER EXISTS {{ ?s a ?t FILTER(?l = 7) }}
        }}""",
    )
    assert [r.s for r in out.collect()] == [EX + "i7"]
    neg = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l
          FILTER NOT EXISTS {{ ?s a ?t FILTER(?l = 7) }}
        }}""",
    )
    assert len(neg.collect()) == 98


def test_minus_outer_filter_named_error(oddeven):
    """MINUS evaluates independently (§8.3) — an outer-variable FILTER
    inside it is a clearly named error, not an unresolved-column
    crash."""
    from r2s2_spark.plans.sparql import SparqlCompileError

    with pytest.raises(SparqlCompileError, match="outside its group"):
        sparql_query(
            oddeven,
            f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
            SELECT ?s WHERE {{
              ?s rdfs:label ?l
              MINUS {{ ?s a ?t FILTER(?l = 7) }}
            }}""",
        ).collect()


def test_sameterm(oddeven):
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{ ?s rdfs:label ?l FILTER(SAMETERM(?l, "7")) }}""",
    )
    assert [r.s for r in out.collect()] == [EX + "i7"]


def test_optional_outer_filter_plan_uses_equi_join(oddeven):
    """The LeftJoin-condition form must keep the shared variable as the
    HASH JOIN KEY with the outer-var filter as a residual condition — a
    BroadcastNestedLoopJoin here would be quadratic at KG scale."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?l ?t WHERE {{
          ?s rdfs:label ?l .
          OPTIONAL {{ ?s a ?t FILTER(?l <= 3) }}
        }}""",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        kind in plan
        for kind in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )


# -- round-5: ADVICE closures ------------------------------------------------


def test_sameterm_vars_respects_lang_and_datatype(spark, tmp_path):
    """sameTerm(?a, ?b) over variables compares TERMS, not lexical forms:
    "7" vs "7"@en vs "7"^^xsd:int vs IRI <...#7-lexical> all differ even
    when the lexical form matches (ADVICE r4: use the hidden
    __kind/__lang/__dt metadata, not plain equality)."""
    from r2s2_spark.pipeline import KgPipeline

    nt = "\n".join(
        [
            f'<{EX}plain> <{EX}p> "7" .',
            f'<{EX}plain> <{EX}q> "7" .',
            f'<{EX}lang> <{EX}p> "7" .',
            f'<{EX}lang> <{EX}q> "7"@en .',
            f'<{EX}dt> <{EX}p> "7" .',
            f'<{EX}dt> <{EX}q> "7"^^<{XSD}int> .',
            f'<{EX}iri> <{EX}p> <http://x/7> .',
            f'<{EX}iri> <{EX}q> "http://x/7" .',
            f'<{EX}langsame> <{EX}p> "7"@en .',
            f'<{EX}langsame> <{EX}q> "7"@en .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "d.nt", nt)]))
    out = sparql_query(
        p,
        f"""PREFIX ex: <{EX}>
        SELECT ?s WHERE {{ ?s ex:p ?a ; ex:q ?b FILTER(SAMETERM(?a, ?b)) }}
        ORDER BY ?s""",
    )
    assert [r.s for r in out.collect()] == [EX + "langsame", EX + "plain"]


def test_optional_filter_on_nowhere_bound_var_is_false(oddeven):
    """A FILTER variable bound NOWHERE is a SPARQL type error -> the
    LeftJoin condition evaluates effectively-false (§17.2): every
    required solution survives with the OPTIONAL side unbound. Before
    the structural-correlation fix this path depended on catching
    AnalysisException and then crashed resolving the column."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s ?t WHERE {{
          ?s rdfs:label ?l .
          OPTIONAL {{ ?s a ?t FILTER(?nowhere = 1) }}
        }}""",
    )
    rows = out.collect()
    assert len(rows) == 99 and all(r.t is None for r in rows)


def test_group_by_without_aggregate_distinct_keys(oddeven):
    """GROUP BY with no aggregate groups solutions by the keys and
    yields one row per group (§11) — plain key and computed key."""
    out = sparql_query(
        oddeven,
        "SELECT ?t WHERE { ?s a ?t } GROUP BY ?t ORDER BY ?t",
    )
    assert [r.t for r in out.collect()] == [EX + "even", EX + "odd"]
    assert out.columns == ["t"]
    out2 = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?w WHERE {{ ?s rdfs:label ?l }}
        GROUP BY (STRLEN(?l) AS ?w) ORDER BY ?w""",
    )
    assert [r.w for r in out2.collect()] == [1, 2]


def test_group_by_without_aggregate_hidden_key_not_leaked(oddeven):
    """A hidden (unaliased) GROUP BY expression key must not leak a __g
    column; the SELECTed subset projects the grouped multiset."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?t WHERE {{ ?s a ?t ; rdfs:label ?l }}
        GROUP BY ?t (STRLEN(?l)) ORDER BY ?t""",
    )
    assert out.columns == ["t"]
    # 2 types x 2 widths = 4 grouped rows projected to ?t
    assert [r.t for r in out.collect()] == [
        EX + "even", EX + "even", EX + "odd", EX + "odd",
    ]


def test_group_by_without_aggregate_named_narrowings(oddeven):
    with pytest.raises(SparqlUnsupported, match="SELECT \\*"):
        sparql_query(oddeven, "SELECT * WHERE { ?s a ?t } GROUP BY ?t")
    with pytest.raises(SparqlUnsupported, match="non-group-key"):
        sparql_query(
            oddeven, "SELECT ?s WHERE { ?s a ?t } GROUP BY ?t"
        )


def test_construct_order_by_limit(oddeven):
    """CONSTRUCT WHERE and full CONSTRUCT take the whole solution
    modifier set (§16.2): LIMIT applies to the ORDERED solution
    sequence (ADVICE r4: was a generic leftover-token error)."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        CONSTRUCT WHERE {{ ?s rdfs:label ?l }} ORDER BY ?l LIMIT 3""",
    )
    rows = sorted(r.object for r in out.collect())
    assert rows == ["1", "10", "11"]  # string order over "1".."99"
    out2 = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?s ex:tag ?l }} WHERE {{ ?s rdfs:label ?l }}
        ORDER BY DESC(?l) LIMIT 2""",
    )
    rows2 = sorted(r.object for r in out2.collect())
    assert rows2 == ["98", "99"]


def test_construct_template_inverse_path(oddeven):
    """Inverse paths in CONSTRUCT templates render finitely by swapping
    endpoints (r4 VERDICT #4), composing inside sequences; closures stay
    named."""
    out = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?l ^ex:labelOf ?s }}
        WHERE {{ ?s rdfs:label ?l FILTER(?l = 7) }}""",
    )
    assert [(r.subject, r.predicate, r.object) for r in out.collect()] == [
        (EX + "i7", EX + "labelOf", "7")
    ]
    # sequence containing an inverse: ?l (^rdfs:label)/rdf:type ?t ->
    # ?m rdfs:label ?l . ?m rdf:type ?t with a fresh join variable
    out2 = sparql_query(
        oddeven,
        f"""PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}>
        CONSTRUCT {{ ?l (^rdfs:label)/ex:tag ?t }}
        WHERE {{ ?s rdfs:label ?l ; a ?t FILTER(?l = 7) }}""",
    )
    preds = sorted(r.predicate for r in out2.collect())
    assert preds == sorted([RDFS + "label", EX + "tag"])
    with pytest.raises(SparqlUnsupported, match="non-finite"):
        parse_sparql("CONSTRUCT { ?s <http://p>+ ?o } WHERE { ?s ?p ?o }")


# -- round-5: term inspection over non-variable expressions ------------------


def test_lang_datatype_constant_fold(oddeven):
    """LANG()/DATATYPE() over CONSTANTS constant-fold on the literal's
    static term shape (SPARQL §19.8 numeric datatypes, @tag ->
    rdf:langString, plain string -> xsd:string) instead of raising the
    old non-variable-expression narrowing."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?l1 ?l2 ?d1 ?d2 ?d3 ?d4 ?d5 ?d6 WHERE {{
          ?s rdfs:label ?x FILTER(?x = 7)
          BIND(LANG("chat"@en) AS ?l1)
          BIND(LANG("chat") AS ?l2)
          BIND(DATATYPE("chat") AS ?d1)
          BIND(DATATYPE("chat"@en-GB) AS ?d2)
          BIND(DATATYPE(5) AS ?d3)
          BIND(DATATYPE(5.5) AS ?d4)
          BIND(DATATYPE(5e0) AS ?d5)
          BIND(DATATYPE(TRUE) AS ?d6)
        }}""",
    )
    row = out.collect()[0]
    assert (row.l1, row.l2) == ("en", "")
    assert row.d1 == XSD + "string"
    assert row.d2 == RDF + "langString"
    assert row.d3 == XSD + "integer"
    assert row.d4 == XSD + "decimal"
    assert row.d5 == XSD + "double"
    assert row.d6 == XSD + "boolean"


def test_lang_datatype_over_derived_expressions(oddeven):
    """String-function results carry their §17.4/§17.5 static shapes:
    STR() is always a simple literal, CONCAT with one untagged argument
    is simple (§17.4.3.12), UCASE preserves the tag, and STRDT/STRLANG
    constant annotations feed DATATYPE()/LANG()."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}> PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l = 7)
          FILTER(DATATYPE(STR(?l)) = xsd:string)
          FILTER(LANG(CONCAT(?l, "!")) = "")
          FILTER(LANG(UCASE("a"@en)) = "en")
          FILTER(DATATYPE(STRDT(?l, xsd:token)) = xsd:token)
          FILTER(LANG(STRLANG(?l, "en-GB")) = "en-GB")
        }}""",
    )
    assert [r.s for r in out.collect()] == [EX + "i7"]


def test_lang_of_iri_is_type_error_null(oddeven):
    """LANG()/DATATYPE() of an IRI-shaped expression is the spec's type
    error: NULL, which a FILTER treats as false and COALESCE recovers."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l = 7)
          FILTER(LANG(<http://x/>) = "")
        }}""",
    )
    assert out.count() == 0
    out2 = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l = 7)
          FILTER(COALESCE(DATATYPE(IRI("http://x/")), "none") = "none")
        }}""",
    )
    assert [r.s for r in out2.collect()] == [EX + "i7"]


def test_term_kind_tests_constant_fold(oddeven):
    """isIRI/isBlank/isLiteral/isNumeric over statically-shaped
    expressions: IRI() results are IRIs, BNODE() results are blank
    nodes, typed numeric constants are numeric, plain strings are not."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <{RDFS}> PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l FILTER(?l = 7)
          FILTER(ISIRI(IRI("http://x/")) && !ISIRI("x"))
          FILTER(ISLITERAL("x") && !ISLITERAL(<http://x/>))
          FILTER(ISNUMERIC(5) && !ISNUMERIC("5") && ISNUMERIC("5"^^xsd:int))
          FILTER(ISBLANK(BNODE()) && !ISBLANK(STR(?l)))
        }}""",
    )
    assert [r.s for r in out.collect()] == [EX + "i7"]


def test_term_inspection_unknown_shape_stays_named(oddeven):
    """Shapes the parser cannot prove stay NAMED errors: STRBEFORE over
    a tagged literal (no-match returns a SIMPLE literal, so the tag is
    runtime-dependent) and STRDT with a computed datatype."""
    with pytest.raises(SparqlUnsupported, match="statically unknown"):
        parse_sparql(
            'SELECT ?s WHERE { ?s ?p ?o '
            'FILTER(LANG(STRBEFORE("ab"@en, "b")) = "en") }'
        )
    with pytest.raises(SparqlUnsupported, match="statically unknown"):
        parse_sparql(
            "SELECT ?s WHERE { ?s ?p ?o ; ?q ?dt "
            "FILTER(DATATYPE(STRDT(?o, ?dt)) = ?dt) }"
        )


def test_timezone_from_lexical(spark, tmp_path):
    """TIMEZONE() reads the literal's OWN timezone off the lexical form
    as an xsd:dayTimeDuration — never shifted to the session zone; a
    literal without a timezone is the spec's type error (NULL)."""
    nt = "\n".join(
        [
            f'<{EX}e1> <{EX}t> "2011-01-10T14:45:13.815-05:00"^^<{XSD}dateTime> .',
            f'<{EX}e2> <{EX}t> "2011-01-10T14:45:13Z"^^<{XSD}dateTime> .',
            f'<{EX}e3> <{EX}t> "2011-01-10T14:45:13+05:30"^^<{XSD}dateTime> .',
            f'<{EX}e4> <{EX}t> "2011-01-10T14:45:13"^^<{XSD}dateTime> .',
            f'<{EX}e5> <{EX}t> "2011-01-10T14:45:13+00:00"^^<{XSD}dateTime> .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "d.nt", nt)]))
    out = sparql_query(
        p,
        f"""PREFIX ex: <{EX}>
        SELECT ?s (TIMEZONE(?t) AS ?tz) WHERE {{ ?s ex:t ?t }} ORDER BY ?s""",
    )
    got = [(r.s.rsplit("/", 1)[-1], r.tz) for r in out.collect()]
    assert got == [
        ("e1", "-PT5H"),
        ("e2", "PT0S"),
        ("e3", "PT5H30M"),
        ("e4", None),
        ("e5", "PT0S"),
    ]


# -- round-5 review fixes ----------------------------------------------------


def test_isnumeric_over_abs_family(spark, tmp_path):
    """isNumeric(ABS(?x)) must hold when ABS returned a value — the
    ABS/CEIL/FLOOR/ROUND family's result is numeric by definition even
    though its exact XSD type follows the argument (it used to
    constant-fold to FALSE); DATATYPE over the same shape stays a named
    error."""
    nt = "\n".join(
        [
            f'<{EX}n1> <{EX}v> "-7"^^<{XSD}integer> .',
            f'<{EX}n2> <{EX}v> "3"^^<{XSD}integer> .',
        ]
    )
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.load(fx.source_files_df(spark, [fx._row("r", "n.nt", nt)]))
    out = sparql_query(
        pipe,
        f"SELECT ?s WHERE {{ ?s <{EX}v> ?x FILTER(isNumeric(ABS(?x))) }}"
        " ORDER BY ?s",
    )
    assert [r.s for r in out.collect()] == [EX + "n1", EX + "n2"]
    with pytest.raises(SparqlUnsupported, match="unknown term shape"):
        sparql_query(
            pipe,
            f"SELECT ?s WHERE {{ ?s <{EX}v> ?x "
            f'FILTER(DATATYPE(ABS(?x)) = <{XSD}integer>) }}',
        )
    # an inner error must propagate, not fold away: isLiteral(STRLANG(...))
    # over an errored inner value is an error (no row), not TRUE
    out2 = sparql_query(
        pipe,
        f"SELECT ?s WHERE {{ ?s <{EX}v> ?x "
        'FILTER(isLiteral(STRLANG(?x, "en"))) }',
    )
    assert out2.count() == 2  # STRLANG succeeds here: still literal


def test_service_vars_keep_term_metadata(fedpair):
    """Outer LANG()/DATATYPE()/isLiteral() over a variable bound inside
    a SERVICE block: the endpoint-side compile carries the hidden term
    metadata out through its star projection (it used to drop it, so the
    outer read fell back to the type-error NULL and filtered everything)."""
    out = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?l WHERE {{
          ?s a ex:T .
          SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }}
          FILTER(LANG(?l) = "" && isLiteral(?l))
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.l) for r in out.collect()] == [
        (EX + "s1", "one"),
        (EX + "s2", "two"),
    ]
    out2 = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s WHERE {{
          ?s a ex:T .
          SERVICE <urn:svc:labels> {{ ?s <{RDFS}label> ?l }}
          FILTER(DATATYPE(?l) = <{XSD}string>)
        }} ORDER BY ?s""",
    )
    assert [r.s for r in out2.collect()] == [EX + "s1", EX + "s2"]


def test_service_silent_mu0_skips_subquery_alias(fedpair):
    """A failed SERVICE SILENT block must not NULL-bind over a variable a
    sub-SELECT provides as an expression ALIAS (no pattern walk can see
    it) — only the block's exclusive variables NULL-bind."""
    out = sparql_query(
        fedpair,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?m ?x WHERE {{
          {{ SELECT ?s (COUNT(?t) AS ?m) WHERE {{ ?s a ?t }} GROUP BY ?s }}
          SERVICE SILENT <urn:svc:gone> {{ ?x <{EX}q> ?m }}
        }} ORDER BY ?s""",
    )
    assert [(r.s, r.m, r.x) for r in out.collect()] == [
        (EX + "s1", 1, None),
        (EX + "s2", 1, None),
        (EX + "s3", 1, None),
    ]


def test_subselect_graph_var_bind_values_rejected(twograph):
    """BIND(... AS ?g) / VALUES ?g inside a sub-SELECT under GRAPH ?g
    rebinds the name where readers are opaque lambdas — named error, not
    a silent overwrite of the graph-scope column."""
    with pytest.raises(SparqlUnsupported, match="BIND/VALUES"):
        sparql_query(
            twograph,
            f"""SELECT ?g ?s WHERE {{ GRAPH ?g {{
              {{ SELECT ?s WHERE {{
                   ?s <{RDFS}label> ?o . BIND("oops" AS ?g) }} }}
            }} }}""",
        )
    with pytest.raises(SparqlUnsupported, match="BIND/VALUES"):
        sparql_query(
            twograph,
            f"""SELECT ?g ?s WHERE {{ GRAPH ?g {{
              {{ SELECT ?s WHERE {{
                   ?s <{RDFS}label> ?o . VALUES ?g {{ "v" }} }} }}
            }} }}""",
        )


def test_path_with_typed_literal_object(spark, tmp_path):
    """A lang/datatype-qualified literal endpoint on a property path
    matches on the LEXICAL form (the closure carries no term metadata —
    same documented narrowing as zero-length constant endpoints); it
    used to filter NULL metadata and return zero rows."""
    nt = "\n".join(
        [
            f"<{EX}a> <{EX}next> <{EX}b> .",
            f'<{EX}b> <{EX}next> "7"^^<{XSD}integer> .',
            f'<{EX}c> <{EX}lab> "x"@en .',
        ]
    )
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.load(fx.source_files_df(spark, [fx._row("r", "p.nt", nt)]))
    out = sparql_query(
        pipe,
        f'SELECT ?s WHERE {{ ?s <{EX}next>+ "7"^^<{XSD}integer> }} ORDER BY ?s',
    )
    assert [r.s for r in out.collect()] == [EX + "a", EX + "b"]
    out2 = sparql_query(
        pipe, f'SELECT ?s WHERE {{ ?s <{EX}lab>? "x"@en }} ORDER BY ?s'
    )
    # "x" is the §9.3 zero-length self-match (the constant endpoint
    # matches itself); ex:c is the one-step match
    assert [r.s for r in out2.collect()] == [EX + "c", "x"]


def test_values_only_optional_bound_is_named_error(spark, tmp_path):
    """VALUES over a variable bound ONLY inside an OPTIONAL group is
    position-dependent per §18.2.2.6 and the textual position is lost —
    named error instead of a silently wrong early join; a VALUES var
    bound by the required part stays order-insensitive and works."""
    from r2s2_spark.plans.sparql import SparqlCompileError

    nt = "\n".join(
        [
            f"<{EX}a> <{EX}p> <{EX}b> .",
            f'<{EX}b> <{EX}q> "2" .',
        ]
    )
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.load(fx.source_files_df(spark, [fx._row("r", "v.nt", nt)]))
    with pytest.raises(SparqlCompileError, match="OPTIONAL"):
        sparql_query(
            pipe,
            f"""SELECT ?s ?v WHERE {{
              ?s <{EX}p> ?o OPTIONAL {{ ?o <{EX}q> ?v }}
              VALUES ?v {{ "1" }}
            }}""",
        )
    ok = sparql_query(
        pipe,
        f"""SELECT ?s ?o WHERE {{
          ?s <{EX}p> ?o OPTIONAL {{ ?o <{EX}q> ?v }}
          VALUES ?o {{ <{EX}b> }}
        }}""",
    )
    assert [r.s for r in ok.collect()] == [EX + "a"]


def test_isnumeric_inner_error_stays_null(oddeven):
    """ADVICE r6: ISNUMERIC over ABS/CEIL/... whose inner errored must be
    an ERROR (NULL), not false — under negation the old false kept rows
    SPARQL drops: !ISNUMERIC(ABS("label text")) is an error, filtered."""
    out = sparql_query(
        oddeven,
        f"""PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?s WHERE {{
          ?s rdfs:label ?l . FILTER(!ISNUMERIC(ABS(?l)))
        }}""",
    ).collect()
    assert out == []
