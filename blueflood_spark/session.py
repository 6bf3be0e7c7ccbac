"""SparkSession factory tuned for this engine.

Local test profile runs on local[N]; the same settings (AQE, shuffle
partitions sized to cores, Arrow for the few pandas exchanges) are the
ones we'd set cluster-side at 100 TB — shuffle partition count and
maxPartitionBytes would scale with executor count, not be hardcoded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "blueflood_spark",
    shuffle_partitions: int | None = None,
    **extra_confs: str,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        env_shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "")
        if env_shuffle.isdigit():
            shuffle_partitions = int(env_shuffle)
        else:
            shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's per-op origin capture (error call-site tracking)
        # costs ~3 extra py4j round trips on EVERY DataFrame/Column op:
        # PySparkCurrentOrigin.set, a conf.get, and .clear per call
        # (pyspark/errors/utils.py _with_origin). Profiled on the timer
        # ladder: 2850 py4j round trips ≈ 0.5 s of a 1.37 s warm query
        # was plan CONSTRUCTION, most of it this bookkeeping. A query
        # service builds thousands of plans per second — debug origin
        # tracking belongs in dev sessions, not the serving path.
        # Changes no plans; error messages just lose the Python-side
        # call-site annotation. (The process-global cache in
        # is_debugging_enabled() reads this at the FIRST DataFrame op,
        # so it must be set at session build, as here.)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # 16g, measured: 32g was tried to damp the ±15% run-to-run
        # serial drift and made things WORSE — bench calls System.gc()
        # after heavy queries, and an explicit full GC on a 32g heap is
        # a multi-second stop-the-world (the 120 calls blew the bench
        # past its 10-min budget). The drift is ambient, not heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed rollup storage) land outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/blueflood_spark_warehouse"),
        )
    )
    for k, v in extra_confs.items():
        builder = builder.config(k.replace("__", "."), v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
