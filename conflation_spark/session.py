"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings are what we would
ship in ``spark-submit --conf`` on a real cluster (AQE on, skew-join on,
Arrow on, shuffle partitions sized to parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    d = os.environ.get("SPARK_LOCAL_DIRS")
    if d:
        return d
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return "/tmp"


def get_spark(
    app_name: str = "conflation_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Under spark-submit the JVM gateway is already up with the --master
    # from the submit command line (PYSPARK_GATEWAY_PORT set); calling
    # .master() here would override the cluster manager with local[N].
    under_submit = master is None and os.environ.get("PYSPARK_GATEWAY_PORT")
    master = master or f"local[{cpus}]"
    # Parse N out of local[N] to size shuffle partitions; on a real cluster
    # this would be executors * cores (or left to AQE coalescing).
    if shuffle_partitions is None:
        # masters like local[4,2] carry (cores, maxFailures) — only the first
        # token is the core count; anything unparseable falls back to cpus
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        first = inner.split(",")[0].strip()
        try:
            shuffle_partitions = cpus if first == "*" else int(first)
        except ValueError:
            shuffle_partitions = cpus
    builder = (
        (SparkSession.builder if under_submit else SparkSession.builder.master(master))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # accept children partitioned on a SUBSET of the join keys as
        # co-partitioned: the matcher pre-partitions points+candidates by
        # doc_id so the (doc_id, offset) sort-merge join — and the
        # mapInPandas stage after it — reuse that partitioning instead of
        # re-shuffling the pipeline's largest intermediate
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # local fixtures are small single files; split scans at row-group
        # granularity so map-side stages use every core (on a real cluster
        # with TB-scale multi-file tables the 128m default is fine)
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # single-host proxy for a cluster's node-local NVMe shuffle dirs:
        # route shuffle/spill through tmpfs so local disk isn't the bottleneck
        .config("spark.local.dir", _local_dir())
        # bigger Arrow batches = fewer python round-trips for the
        # batch-vectorized Viterbi (it vectorizes across the whole batch)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "30000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
