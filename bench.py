"""Benchmark harness — prints ONE JSON line for the driver.

Headline: end-to-end KG construction (extract -> dictionaries -> vertical
tables -> layout passes -> merge) over a deterministic synthetic
source-code corpus scaled to the sf of $SPARK_GRAFT_SF_DIR, plus the
headline relational / training-data queries at that sf.

    {"metric": "e2e_kg_load", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "kg_triples": N, "kg_triples_per_sec": R}

Scaling-efficiency evidence (BASELINE.md: N -> 4N executors as local[8]
-> local[32]) is produced by ``python bench.py --scaling``, which reports
both throughputs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_kg_load(spark, sf: float, stages: str = "full") -> dict:
    """Synthetic corpus scaled to sf: 20k files/sf-unit x 200 stmts."""
    from r2s2_spark.pipeline import KgPipeline
    from r2s2_spark.sources.fixtures import synthetic_source_files

    n_files = max(50, int(20000 * sf))
    src = synthetic_source_files(spark, n_files=n_files, statements_per_file=200)
    work = tempfile.mkdtemp(prefix="r2s2_bench_")
    try:
        t0 = time.time()
        pipe = KgPipeline(spark, work)
        pipe.stage_e(src)
        pipe.stage_d()
        pipe.stage_v()
        edv = time.time() - t0
        n_triples = pipe.io.manifest("E")["statements"]
        if stages == "full":
            pipe.stage_o()
            pipe.stage_m()
        total = time.time() - t0
        return {
            "kg_files": n_files,
            "kg_triples": n_triples,
            "kg_edv_sec": round(edv, 3),
            "kg_total_sec": round(total, 3),
            "kg_triples_per_sec": round(n_triples / edv, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


HEADLINE_QUERIES = [
    "tpch_q1_pricing",
    "s4_route_counts",
    "j2_merge_outer",
    "a6_collect_set",
    "f1_url_decompose",
    "events_hourly_window",
    "dedup_exact_groups",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "ann_cosine_topk",
    "ann_cosine_topk_bucketed",
    "text_stats",
]


def run_queries(spark, sf_dir: str) -> dict:
    import r2s2_spark.testdata_queries as tq

    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        df = tq.QUERIES[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def bench_once(cpus: str, sf_dir: str, stages: str = "full") -> dict:
    from r2s2_spark.session import get_spark

    spark = get_spark(app_name=f"r2s2_bench_{cpus}", master=f"local[{cpus}]")
    try:
        sf = _sf_from_dir(sf_dir)
        kg = run_kg_load(spark, sf, stages)
        qs = run_queries(spark, sf_dir)
        return {"sf": sf, **kg, "queries": qs}
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if "--scaling" in sys.argv:
        # N -> 4N evidence: same job + input at local[8] and local[32]
        lo = bench_once("8", sf_dir, stages="edv")
        hi = bench_once("32", sf_dir, stages="edv")
        tp8, tp32 = lo["kg_triples_per_sec"], hi["kg_triples_per_sec"]
        eff = round((tp32 / tp8) / 4, 3)
        report = {
            "metric": "scaling_efficiency_8_to_32",
            "value": eff,
            "unit": "ratio",
            "throughput_local8_triples_per_sec": tp8,
            "throughput_local32_triples_per_sec": tp32,
            "sf": lo["sf"],
        }
        print(json.dumps(report))
        return

    r = bench_once(cpus, sf_dir)
    out = {
        "metric": "e2e_kg_load",
        "value": r["kg_total_sec"],
        "unit": "sec",
        "queries": {k: v for k, v in r["queries"].items() if not k.endswith("_rows")},
        "sf": r["sf"],
        "kg_files": r["kg_files"],
        "kg_triples": r["kg_triples"],
        "kg_edv_sec": r["kg_edv_sec"],
        "kg_triples_per_sec": r["kg_triples_per_sec"],
        "query_rows": {
            k[: -len("_rows")]: v for k, v in r["queries"].items() if k.endswith("_rows")
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
