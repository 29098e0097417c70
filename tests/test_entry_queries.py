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


def test_bucketed_ann_exact_within_cell(spark):
    """The IVF contract: the bucketed search returns the EXACT top-k within
    the probed cell (candidates restricted to the query's sign bucket), and
    the cell prunes a large share of the corpus."""
    from pyspark.sql import functions as F

    from r2s2_spark.functions.hashing import sign_bucket
    from r2s2_spark.operators.similarity import cosine_topk, cosine_topk_bucketed

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    q_bucket = "".join("1" if x >= 0 else "0" for x in q[:4])
    cell = emb.where(sign_bucket(F.col("embedding"), 4) == q_bucket)
    n_all, n_cell = emb.count(), cell.count()
    assert n_cell < n_all / 4  # real pruning

    exact_in_cell = [
        (r.vec_id, r.cosine) for r in cosine_topk(cell, 0, k=10).collect()
    ]
    approx = [
        (r.vec_id, r.cosine)
        for r in cosine_topk_bucketed(emb, 0, k=10, n_bits=4).collect()
    ]
    assert approx == exact_in_cell
