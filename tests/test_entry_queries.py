"""Driver-contract rehearsal: run every queries() entry against its DuckDB
oracle at sf0.001 the same way the driver does at sf0.01 (row count +
sorted-column, order-insensitive value comparison)."""

import math

import duckdb
import pytest

import r2s2_spark.testdata_queries as tq

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(tq.ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = tq.QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = ddb.execute(tq.ORACLES[name])
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]

    assert sorted(scols) == sorted(ocols), (name, scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    ns, no = normalize(srows, scols), normalize(orows, ocols)
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b][:5]
    assert ns == no, (name, mismatches)


@pytest.mark.parametrize("name", sorted(set(tq.QUERIES) - set(tq.ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = tq.QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
