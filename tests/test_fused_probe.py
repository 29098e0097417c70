"""Fused stage-O probe parity: the one-job fused_probe_tables must agree
key-for-key with the per-table probe_table it replaces, including the
collapse stats (__groups = post-collapse row count, __max_graphs = the
max-graphs probe) — across type-split children, multi-graph data, and
numeric narrowing guards."""

import pytest

from r2s2_spark.operators import passes, vertical
from r2s2_spark.pipeline import KgPipeline
from r2s2_spark.sources import fixtures as fx


def _fused_vs_per_table(spark, tmp_path, fixture):
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.stage_e(fixture)
    pipe.stage_d()
    pipe.stage_v()
    io = pipe.io
    catalog = io.read_catalog("V")
    v_data = io.path("V", "data")
    catalog, split_paths = passes.split_type_tables(
        spark, catalog, v_data, str(tmp_path / "split")
    )
    fused = passes.fused_probe_tables(spark, catalog, v_data, split_paths)

    assert set(fused) == {t.name for t in catalog.tables}
    for t in catalog.tables:
        if t.name in split_paths:
            src = spark.read.parquet(split_paths[t.name])
        else:
            src = spark.read.parquet(f"{v_data}/t={t.name}")
        df = vertical.rename_generic(src, t)
        ref = passes.probe_table(df, t, mode="full")
        got = fused[t.name]
        for key, val in ref.items():
            assert got[key] == val, (t.name, key.replace("\x00", "|"), got[key], val)

        # collapse stats vs a directly computed collapse on the raw frame
        from pyspark.sql import functions as F

        g_specs = [
            pm.graph_column for pm in t.predicates if pm.graph_column is not None
        ]
        non_graph = [
            cs.name
            for cs in t.all_column_specs()
            if cs.physical and cs not in g_specs
        ]
        if g_specs:
            grp = df.groupBy(*non_graph).agg(
                F.countDistinct(g_specs[0].name).alias("ng")
            )
            n_groups = grp.count()
            max_graphs = grp.agg(F.max("ng")).first()[0] or 0
        else:
            n_groups = df.dropDuplicates().count()
            max_graphs = 0
        assert got["__groups"] == n_groups, t.name
        assert got["__max_graphs"] == max_graphs, t.name
    return catalog


def test_fused_probe_loading(spark, tmp_path):
    """fixture_loading has rdf:type tables -> exercises the split-children
    union branch and the md5->name mapping."""
    cat = _fused_vs_per_table(spark, tmp_path, fx.fixture_loading(spark))
    assert any("type_" in t.name for t in cat.tables)


def test_fused_probe_multigraph(spark, tmp_path):
    """__max_graphs > 1 for the two-graph fixture (the collapse-to-array
    decision path)."""
    cat = _fused_vs_per_table(spark, tmp_path, fx.fixture_multigraph(spark))


def test_fused_probe_datatypes(spark, tmp_path):
    """narrow-guard aggregation (ok keys) must survive the two-level
    decomposition exactly — fixture_datatypes carries numeric literals."""
    _fused_vs_per_table(spark, tmp_path, fx.fixture_datatypes(spark))


def test_observed_row_counts_match_written(spark, tmp_path):
    """stage O records row_count from the write-time Observation metric;
    it must equal what a read-back count would have said (and __groups
    from the fused probe)."""
    pipe = KgPipeline(spark, str(tmp_path / "wd"))
    pipe.stage_e(fx.fixture_loading(spark))
    pipe.stage_d()
    pipe.stage_v()
    pipe.stage_o()
    catalog = pipe.io.read_catalog("O")
    import os

    for t in catalog.tables:
        actual = spark.read.parquet(os.path.join(pipe.io.root, t.path)).count()
        assert t.row_count == actual, t.name
