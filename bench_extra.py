"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
the driver's measurement; every number cited in OPTIMIZATION_r06.md that
is not a bench.py headline comes from here).

Modes:
  python bench_extra.py queries [names...]   noop-sink isolation per query
                                             (guide §1.4): each query's
                                             frame is written to the noop
                                             sink so the computation is
                                             timed, not .count()'s pruning
  python bench_extra.py plans [names...]     capture .explain('formatted')
                                             for each query into
                                             plans/r06/<name>_<tag>.txt
  python bench_extra.py twin                 the sf1 dedup scale twin's
                                             component times (sigs, pairs,
                                             clusters), noop-isolated

Environment: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS (same contract as
bench.py); PLAN_TAG=before|after controls the plans filename suffix.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def _spark():
    from r2s2_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(app_name="r2s2_bench_extra", master=f"local[{cpus}]")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries(names: list[str]) -> None:
    import r2s2_spark.testdata_queries as tq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    out = {}
    try:
        names = names or list(tq.ALL_QUERIES)
        # one warmup query to absorb JVM/python-worker spin-up
        tq.ALL_QUERIES["text_stats"](spark, sf_dir).count()
        for name in names:
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            noop(tq.ALL_QUERIES[name](spark, sf_dir))
            out[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "noop_sec": out}))


def run_plans(names: list[str]) -> None:
    import r2s2_spark.testdata_queries as tq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLAN_TAG", "before")
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(dest, exist_ok=True)
    spark = _spark()
    try:
        for name in names or list(tq.ALL_QUERIES):
            df = tq.ALL_QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(dest, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}_{tag}.txt")
    finally:
        spark.stop()


def run_twin() -> None:
    """Component breakdown of bench.py's dedup sf1 twin (frozen there as
    one composite number): signatures, candidate pairs, clusters."""
    from pyspark.sql import functions as F

    from r2s2_spark.operators import dedup

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    out = {}
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        copies = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
            )
            for i in range(10)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big = big.persist()
        big.count()
        for label, build in (
            ("sigs", lambda: dedup.minhash_signatures(big, k=4)),
            (
                "pairs",
                lambda: dedup.lsh_candidate_pairs(
                    dedup.minhash_signatures(big, k=4),
                    k=4,
                    rows_per_band=2,
                    max_bucket=50,
                ),
            ),
            (
                "clusters",
                lambda: dedup.duplicate_clusters(big, log_truncation=False),
            ),
        ):
            spark.sparkContext.setJobDescription(f"twin:{label}")
            t0 = time.time()
            noop(build())
            out[label] = round(time.time() - t0, 3)
        big.unpersist()
    finally:
        spark.stop()
    print(json.dumps({"twin_noop_sec": out}))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "queries":
        run_queries(rest)
    elif mode == "plans":
        run_plans(rest)
    elif mode == "twin":
        run_twin()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
