"""Stage M: table merging goldens from LoadingTest.java:86-125."""

import pytest
from pyspark.sql import functions as F

from r2s2_spark.naming import EX, RDF, RDFS, XSD
from r2s2_spark.pipeline import KgPipeline
from r2s2_spark.sources import fixtures as fx

from tests.test_pipeline_ev import (
    expected_triples_loading,
    precision_recall,
    reconstructed_set,
)


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    pipe = KgPipeline(spark, str(tmp_path_factory.mktemp("m") / "wd"))
    pipe.load(fx.fixture_loading(spark))
    return pipe


def test_merged_schema_golden(loaded):
    """LoadingTest.java:106-124: after split+merge, type_rdf_Alt and
    type_rdf_Bag carry exactly {subject_rdf_type_fragment,
    object_rdfs_label_langvalue} as physical columns, and
    COUNT(object_rdfs_label_langvalue) == 1 in each (only the
    unique-subject @cz label table merges; @en-UK repeats subjects)."""
    cat = loaded.catalog("M")
    for name in ("type_rdf_Alt", "type_rdf_Bag"):
        t = cat.table(name)
        assert set(t.physical_columns()) == {
            "subject_rdf_type_fragment",
            "object_rdfs_label_langvalue",
        }, (name, t.physical_columns())
        df = loaded.reader("M")(t)
        assert df.where(F.col("object_rdfs_label_langvalue").isNotNull()).count() == 1
    assert cat.table("type_rdf_Bag").row_count == 2  # LoadingTest.java:87-92
    assert cat.table("type_rdf_Alt").row_count == 3
    # the @cz table was fully consumed -> dropped as empty
    assert not any(t.predicates[0].lang == "cz" and len(t.predicates) == 1
                   for t in cat.tables if t.name.startswith("rdfs_label"))
    # the @en-UK table survives un-merged (repeating subjects)
    assert any(
        pm.lang == "en-UK" for t in cat.tables for pm in t.predicates
    )


def test_pr_after_merge(loaded):
    """Triple set identical after the whole pipeline E->D->V->O->M."""
    got = reconstructed_set(loaded, "M")
    expect = expected_triples_loading()
    p, r = precision_recall(got, expect)
    assert got == expect, (p, r, got ^ expect)


def test_oddeven_label_merges(spark, tmp_path):
    """SparqlOnLoadedTest variant 3: unique-subject xsd:int label table
    merges into the class tables; flagship query still returns 2 types."""
    pipe = KgPipeline(spark, str(tmp_path / "oe"))
    pipe.load(fx.fixture_oddeven(spark, with_labels=True))
    cat = pipe.catalog("M")
    type_tables = [t for t in cat.tables if t.name.startswith("type_")]
    assert len(type_tables) == 2
    for t in type_tables:
        preds = {pm.predicate for pm in t.predicates}
        assert preds == {RDF + "type", RDFS + "label"}, (t.name, preds)
    types = {r.type for r in pipe.distinct_types("M").collect()}
    assert types == {EX + "odd", EX + "even"}
    # every label triple survives the merge (99 labels, odd+even split)
    labels = pipe.triples("M").where(F.col("o_datatype") == XSD + "int").count()
    assert labels == 99


def test_multigraph_unaffected_by_merge(spark, tmp_path):
    pipe = KgPipeline(spark, str(tmp_path / "mg"))
    pipe.load(fx.fixture_multigraph(spark))
    trips = pipe.triples_with_graph_iri().collect()  # default = stage M
    assert len(trips) == 2
    assert {x.g for x in trips} == {
        "http://example.org/zeroGraph",
        "http://example.org/oneGraph",
    }


def test_oddeven_full_pr(spark, tmp_path):
    """Full-pipeline P/R on fixture B (SparqlOnLoadedTest corpus): all 198
    triples reconstruct exactly after E->D->V->O->M."""
    pipe = KgPipeline(spark, str(tmp_path / "oepr"))
    pipe.load(fx.fixture_oddeven(spark, with_labels=True))
    got = {
        (r.s, r.p, r.o_lex, r.o_lang, r.o_datatype)
        for r in pipe.triples("M").collect()
    }
    from r2s2_spark.naming import EX, RDF, RDFS, XSD

    expect = set()
    for i in range(1, 100):
        cls = "odd" if i % 2 == 0 else "even"
        expect.add((f"{EX}i{i}", RDF + "type", f"{EX}{cls}", None, None))
        expect.add((f"{EX}i{i}", RDFS + "label", str(i), None, XSD + "int"))
    assert got == expect, (len(got), len(expect), list(got ^ expect)[:6])


def test_uniqueness_verification_recorded(loaded):
    """IntroduceIndexes analog (IntroduceIndexes.java:22-46): after stage M
    every table carries a verified subject_unique flag in the catalog;
    split type tables are unique, the @en-UK label table (Alt has two
    labels) is not."""
    cat = loaded.catalog("M")
    assert all(t.subject_unique is not None for t in cat.tables)
    assert cat.table("type_rdf_Alt").subject_unique is True
    assert cat.table("type_rdf_Bag").subject_unique is True
    en_uk = next(
        t
        for t in cat.tables
        if any(pm.lang == "en-UK" for pm in t.predicates)
    )
    assert en_uk.subject_unique is False
    # the flag round-trips catalog JSON serialization
    from r2s2_spark.plans.catalog import Catalog

    again = Catalog.from_json(cat.to_json())
    assert again.table("type_rdf_Alt").subject_unique is True
    assert again.table(en_uk.name).subject_unique is False


def test_sql_views_over_loaded_kg(loaded, spark):
    """The loaded KG is queryable with plain spark.sql — table names match
    the R2RML mapping's rr:tableName (a DuckDB user of the reference can
    run the same SQL here)."""
    names = loaded.register_views(prefix="kg_")
    assert "kg_type_rdf_Alt" in names and "kg_triples" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM kg_type_rdf_Alt").first().n
    assert n == 3
    labels = spark.sql(
        "SELECT o_lex FROM kg_triples "
        "WHERE p = 'http://www.w3.org/2000/01/rdf-schema#label' "
        "AND o_lang = 'en-UK' ORDER BY o_lex"
    ).collect()
    assert [r.o_lex for r in labels] == ["lala", "lala lala"]


def test_no_cross_entity_merge_on_stripped_suffixes(spark, tmp_path):
    """Subject keys must compare FULL lexical values: after stage O's
    prefix strip, .../nation/0 and .../region/0 both store suffix '0' in
    their subject path columns under different lcp_prefix values. A key
    built from stripped values cross-merged the two entity families,
    silently attaching one entity's statements to another. End-to-end
    triple-set equality catches both that and the merged-in virtual-
    constant fabrication (a non-matched subject rendering a bare
    scheme+host IRI from a merged map's constants)."""
    nq = []
    expect = set()
    for k in range(5):
        nq.append(f"<{EX}nation/{k}> <{EX}inRegion> <{EX}region/{k}> .")
        expect.add((f"{EX}nation/{k}", f"{EX}inRegion", f"{EX}region/{k}", None, None, "iri"))
        nq.append(f'<{EX}region/{k}> <{EX}rname> "r{k}" .')
        expect.add((f"{EX}region/{k}", f"{EX}rname", f"r{k}", None, XSD + "string", "literal"))
        if k < 4:
            nq.append(f"<{EX}region/{k}> <{EX}next> <{EX}region/{k + 1}> .")
            expect.add((f"{EX}region/{k}", f"{EX}next", f"{EX}region/{k + 1}", None, None, "iri"))
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.load(fx.source_files_df(spark, [fx._row("r", "x.nt", "\n".join(nq))]))
    got = reconstructed_set(pipe, "M")
    assert got == expect, got ^ expect


def test_merged_map_flag_roundtrips(loaded):
    """The merged-in marker survives the catalog JSON round-trip (the
    presence filter depends on it when a later session reads stage M)."""
    from r2s2_spark.plans.catalog import Catalog

    cat = loaded.catalog("M")
    merged_flags = [pm.merged for t in cat.tables for pm in t.predicates]
    assert any(merged_flags)  # the loading fixture does merge
    back = Catalog.from_json(cat.to_json())
    assert [
        pm.merged for t in back.tables for pm in t.predicates
    ] == merged_flags
