"""SparkSession factory with scale-oriented defaults.

Defaults chosen for correctness-at-scale first (AQE on, skew-join handling
on) and then local-mode speed. On a real cluster the same config holds;
only master/shuffle-partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hls-payer-mrf-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.parallelismFirst stays at its default (true).
        # r14 measured BOTH arms: over an 18-query light-tail sample,
        # false (respect the advisory size) won 5.5-6% twice — those
        # queries' reduce stages are scheduling-bound, so fewer post-
        # shuffle tasks help. But over the compute-heavy set the same
        # knob LOST 20% (interleaved A/B: copurchase_pairs -62%,
        # percentile_summary -45%, anomaly_mad -39%): advisory-size
        # coalescing collapses their post-shuffle parallelism to 1-2
        # tasks at bench scale, costing more absolute seconds than the
        # tail gains. On a real 100 TB cluster post-shuffle partitions
        # exceed the advisory size anyway, so flipping it here buys
        # nothing at scale either — rejected, evidence in
        # OPTIMIZATION_r14.md §7.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas-UDF path; never row-at-a-time python UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics for oracle comparisons.
        .config("spark.sql.session.timeZone", "UTC")
        # Required by Spark for any Python-datasource pushFilters call; the
        # payer-mrf source additionally requires the explicit
        # filterpushdown=true SOURCE OPTION (or the headerkey option) before
        # it prunes byte ranges — pushdown is opt-in per read, this conf
        # alone enables nothing (see sources/datasource.py reader()).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # iterative operators (connected components) checkpoint each round;
        # let the ContextCleaner reap checkpoint files no longer referenced
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Reliable checkpoint location for iterative algorithms — lineage MUST
    # truncate each round or the logical plan grows exponentially. Local tmp
    # here; on a cluster point this at HDFS/S3 before calling get_spark.
    if spark.sparkContext.getCheckpointDir() is None:
        import tempfile

        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        )
    # Register our custom data sources on every session.
    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import register

    register(spark)
    return spark
