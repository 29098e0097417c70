"""BGP queries over the vertical tables (the reference's SPARQL surface,
SparqlOnLoadedTest.java:104-145, minus the Ontop dependency)."""

import pytest
from pyspark.sql import functions as F

from r2s2_spark.naming import EX, RDF, RDFS, RDF_TYPE, XSD
from r2s2_spark.pipeline import KgPipeline
from r2s2_spark.plans.sparql import Literal, bgp_on_pipeline
from r2s2_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    p = KgPipeline(spark, str(tmp_path_factory.mktemp("sparql") / "wd"))
    p.load(fx.fixture_oddeven(spark, with_labels=True))
    return p


def test_select_distinct_type(pipe):
    """SELECT DISTINCT ?type WHERE { [] a ?type } — the reference's
    flagship query, as a BGP."""
    out = bgp_on_pipeline(pipe, [("?s", RDF_TYPE, "?type")], select=["?type"], distinct=True)
    assert {r.type for r in out.collect()} == {EX + "odd", EX + "even"}


def test_two_pattern_join(pipe):
    """{ ?s a ?t . ?s rdfs:label ?l } — a self-join over subject."""
    out = bgp_on_pipeline(
        pipe,
        [("?s", RDF_TYPE, "?t"), ("?s", RDFS + "label", "?l")],
        select=["?s", "?t", "?l"],
    )
    rows = out.collect()
    assert len(rows) == 99
    by_s = {r.s: (r.t, r.l) for r in rows}
    # reference's inverted ternary: even i -> ex:odd
    assert by_s[EX + "i4"] == (EX + "odd", "4")
    assert by_s[EX + "i7"] == (EX + "even", "7")


def test_constant_object_and_subject(pipe):
    odd = bgp_on_pipeline(pipe, [("?s", RDF_TYPE, EX + "odd")], select=["?s"])
    assert odd.count() == 49  # even i in 1..99 -> 49 subjects
    lbl = bgp_on_pipeline(
        pipe,
        [(EX + "i42", RDFS + "label", "?l")],
        select=["?l"],
    )
    assert [r.l for r in lbl.collect()] == ["42"]


def test_repeated_variable_within_pattern(spark, tmp_path):
    """('?x', p, '?x') is an s==o equality constraint, not a rebinding
    (regression: the second binding used to silently overwrite the first)."""
    nt = "\n".join(
        [
            f"<{EX}self> <{EX}rel> <{EX}self> .",
            f"<{EX}a> <{EX}rel> <{EX}b> .",
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "self.nt", nt)]))
    out = bgp_on_pipeline(p, [("?x", EX + "rel", "?x")], select=["?x"])
    assert [r.x for r in out.collect()] == [EX + "self"]


def test_literal_constant_with_datatype(pipe):
    out = bgp_on_pipeline(
        pipe,
        [("?s", RDFS + "label", Literal("7", datatype=XSD + "int"))],
        select=["?s"],
    )
    assert [r.s for r in out.collect()] == [EX + "i7"]


def test_bgp_after_merge_sees_merged_tables(spark, tmp_path):
    """BGPs read through the catalog, so merged (denormalized) tables and
    virtual columns are transparent."""
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.load(fx.fixture_loading(spark))
    out = bgp_on_pipeline(
        pipe,
        [("?s", RDF_TYPE, RDF + "Bag"), ("?s", RDFS + "label", "?l")],
        select=["?s", "?l"],
    )
    rows = {(r.s, r.l) for r in out.collect()}
    # Alt and List are rdf:type Bag; labels come from boolean/cz/en-UK/date tables
    assert (RDF + "Alt", "杭州市") in rows
    assert all(s in (RDF + "Alt", RDF + "List") for s, _ in rows)


def test_variable_predicate(pipe):
    """{ ?s ?p ?o } and { <s> ?p ?o } union over ALL predicate maps
    (SparqlOnLoadedTest parity notch: the reference answers these through
    Ontop; variable predicates used to raise NotImplementedError)."""
    allp = bgp_on_pipeline(pipe, [("?s", "?p", "?o")], select=["?p"], distinct=True)
    assert {r.p for r in allp.collect()} == {RDF_TYPE, RDFS + "label"}
    spo = bgp_on_pipeline(pipe, [(EX + "i42", "?p", "?o")], select=["?p", "?o"])
    assert {(r.p, r.o) for r in spo.collect()} == {
        (RDF_TYPE, EX + "odd"),
        (RDFS + "label", "42"),
    }
    # full scan row count: 99 types + 99 labels
    assert bgp_on_pipeline(pipe, [("?s", "?p", "?o")]).count() == 198


def test_optional_group(spark, tmp_path):
    """{ ?s ex:name ?n } OPTIONAL { ?s ex:age ?a }: subjects without an
    age keep their name row with a NULL binding (SPARQL 1.1 left join)."""
    nt = "\n".join(
        [
            f'<{EX}s1> <{EX}name> "anna" .',
            f'<{EX}s1> <{EX}age> "7"^^<{XSD}int> .',
            f'<{EX}s2> <{EX}name> "bob" .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "opt.nt", nt)]))
    out = bgp_on_pipeline(
        p,
        [("?s", EX + "name", "?n")],
        select=["?n", "?a"],
        optional=[[("?s", EX + "age", "?a")]],
    )
    assert {(r.n, r.a) for r in out.collect()} == {("anna", "7"), ("bob", None)}


def test_filter_expression(pipe):
    """FILTER over bound variables: { ?s rdfs:label ?l . FILTER(?l > 90) }
    — applied post-join; Catalyst pushes the predicate into the scan."""
    out = bgp_on_pipeline(
        pipe,
        [("?s", RDFS + "label", "?l")],
        select=["?l"],
        filter=F.col("l").cast("int") > 90,
    )
    assert {int(r.l) for r in out.collect()} == set(range(91, 100))


def test_union_groups(pipe):
    """{ ?s a ex:odd } UNION { ?s a ex:even } covers all 99 subjects;
    branches binding different variables yield NULL for the unbound one."""
    from r2s2_spark.plans.sparql import bgp_union_on_pipeline

    both = bgp_union_on_pipeline(
        pipe,
        [[("?s", RDF_TYPE, EX + "odd")], [("?s", RDF_TYPE, EX + "even")]],
        select=["?s"],
        distinct=True,
    )
    assert both.count() == 99
    mixed = bgp_union_on_pipeline(
        pipe,
        [[("?s", RDF_TYPE, EX + "odd")], [("?x", RDFS + "label", "?l")]],
    )
    rows = mixed.collect()
    assert len(rows) == 49 + 99
    assert sum(1 for r in rows if r.s is None) == 99  # label branch binds ?x/?l


def test_property_path_plus(spark, tmp_path):
    """Property path p+ (one-or-more): semi-naive transitive closure over
    the predicate's pairs, joinable with other patterns like any BGP."""
    from r2s2_spark.plans.sparql import PathPlus

    nt = "\n".join(
        [
            f"<{EX}a> <{EX}next> <{EX}b> .",
            f"<{EX}b> <{EX}next> <{EX}c> .",
            f"<{EX}c> <{EX}next> <{EX}d> .",
            f'<{EX}d> <{EX}name> "dee" .',
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "path.nt", nt)]))
    reach = bgp_on_pipeline(p, [(EX + "a", PathPlus(EX + "next"), "?x")], select=["?x"])
    assert {r.x for r in reach.collect()} == {EX + "b", EX + "c", EX + "d"}
    all_pairs = bgp_on_pipeline(p, [("?x", PathPlus(EX + "next"), "?y")])
    assert all_pairs.count() == 6  # 3 + 2 + 1
    # composed with a second pattern: everything reaching something named
    named = bgp_on_pipeline(
        p,
        [("?x", PathPlus(EX + "next"), "?y"), ("?y", EX + "name", "?n")],
        select=["?x", "?n"],
    )
    assert {(r.x, r.n) for r in named.collect()} == {
        (EX + "a", "dee"), (EX + "b", "dee"), (EX + "c", "dee"),
    }


def test_bgp_constant_predicate_prunes_scans(pipe):
    """A constant-predicate pattern must scan ONLY that predicate's table
    directories. At stage O (pre-merge) { ?s rdfs:label ?l } touches no
    type-table path; post-merge the label columns legitimately live INSIDE
    the type tables — then the plan must still read only the label column
    (column pruning), never the type table's other columns."""
    out = bgp_on_pipeline(pipe, [("?s", RDFS + "label", "?l")], select=["?l"], stage="O")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rdfs_label" in plan
    assert "/type_" not in plan, plan

    merged = bgp_on_pipeline(pipe, [("?s", RDFS + "label", "?l")], select=["?l"], stage="M")
    mplan = merged._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", mplan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert all("label" in c or c.startswith("subject_") for c in cols), cols


def test_inverse_path(spark, tmp_path):
    """^p and ^(p+): (s, ^p, o) == (o, p, s); composes with closure."""
    from r2s2_spark.plans.sparql import PathInverse, PathPlus

    nt = "\n".join(
        [
            f"<{EX}a> <{EX}next> <{EX}b> .",
            f"<{EX}b> <{EX}next> <{EX}c> .",
        ]
    )
    p = KgPipeline(spark, str(tmp_path / "wd"))
    p.load(fx.source_files_df(spark, [fx._row("r", "inv.nt", nt)]))
    inv = bgp_on_pipeline(p, [(EX + "b", PathInverse(EX + "next"), "?x")], select=["?x"])
    assert [r.x for r in inv.collect()] == [EX + "a"]
    inv_plus = bgp_on_pipeline(
        p, [(EX + "c", PathInverse(PathPlus(EX + "next")), "?x")], select=["?x"]
    )
    assert {r.x for r in inv_plus.collect()} == {EX + "a", EX + "b"}
