"""SparkSession factory with scale-oriented defaults (SURVEY.md §7.3)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "r2s2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the KG-construction pipeline.

    Defaults chosen for scale (they matter equally on a real cluster):
    - AQE on, including skew-join handling: predicate frequency in real RDF
      is Zipfian (rdf:type, rdfs:label dominate), so the shuffle written by
      the vertical-partitioning stage is skewed by construction.
    - Arrow on: the extraction parser is a vectorized ``mapInArrow``; Arrow
      batching is the only acceptable Python boundary (no per-row Python).
    - shuffle partitions 4x cores locally (measured: the routed V shuffle
      runs ~20% faster at 4x than 2x on 8 pinned cores — finer reduce
      tasks overlap the map side and pack better; AQE coalesces any
      over-partitioning, so the higher default costs nothing on small
      stages); on a cluster size it ~2-4x total cores the same way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 8
        except ValueError:
            n = int(cpus)
        shuffle_partitions = max(16, 4 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # content rows are fat (whole files as strings): 20k-row Arrow
        # batches were ~240MB each and 32 concurrent tasks thrashed GC —
        # local[32] ran SLOWER than local[8] until this was capped
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # source-code text compresses ~100x: default 128MB splits starve
        # cores on file scans; statement-frame scans stay well-formed too
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # zstd parquet output: the stage-V write burst is bandwidth-bound
        # (per-stage scaling evidence, BENCH/BASELINE.md) and statement
        # frames are highly compressible text — pinned 8-core ABAB
        # measured +11-18% E+D+V throughput over snappy (198.5/196.7k ->
        # 234.0/219.3k medians), and ~2x smaller files is itself the win
        # at 100 TB (storage + every downstream scan)
        .config("spark.sql.parquet.compression.codec", "zstd")
        # stage O/M submit per-table jobs from a bounded thread pool. FIFO
        # still interleaves concurrent jobs whenever slots are free and
        # measures ~12% faster than FAIR on the single-job load path;
        # flip to FAIR (extra_conf) only when one huge table must not
        # starve the small-table jobs queued behind it
        .config("spark.ui.enabled", "false")
    )
    # ad-hoc conf overrides for benchmarking A/Bs without code edits:
    # SPARK_GRAFT_CONF="k=v;k2=v2" applies before extra_conf
    for pair in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
