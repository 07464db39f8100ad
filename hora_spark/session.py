"""SparkSession factory with the engine's pinned configs.

local[N] in the sandbox; on a real cluster the same builder is driven by
spark-submit --py-files (master/deploy-mode come from the submit command, so
everything here is master-agnostic except the explicit local fallback).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hora_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or 32).
    shuffle_partitions defaults to `cores` so the local[8]-vs-local[32]
    scaling runs keep shuffle width proportional to executor slots —
    required for an honest scaling-efficiency measurement.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # sandbox-scale inputs are ~1GB; the 128MB default would coalesce
        # them into a handful of scan tasks and cap the Python-UDF stages'
        # parallelism far below the core count. At cluster scale inputs
        # have enough files/splits that this only adds harmless fan-out.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # answer bare MIN/MAX/COUNT aggregations from parquet footer
        # statistics instead of scanning (the build's max(doc_id) probe
        # becomes footer-only at any corpus size)
        .config("spark.sql.parquet.aggregatePushDown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("HORA_SPARK_DRIVER_MEM", "48g"))
    )
    # Only force a master when none was provided externally. Under
    # spark-submit (client mode) the JVM gateway launches this Python
    # process and sets PYSPARK_GATEWAY_PORT — the submit command's --master
    # is already bound in that JVM, so calling builder.master() here would
    # override yarn/k8s with local[N]. MASTER / spark.master env covers
    # bare pyspark shells with an external master.
    externally_mastered = bool(
        os.environ.get("PYSPARK_GATEWAY_PORT")
        or os.environ.get("MASTER")
        or os.environ.get("SPARK_MASTER")
    )
    if not externally_mastered:
        b = b.master(os.environ.get("HORA_SPARK_MASTER", f"local[{cores}]"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
