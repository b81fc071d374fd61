"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "abot_dotnet_core_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[N] session; on a real cluster the same confs apply unchanged.

    AQE is on (runtime skew-join splitting + partition coalescing); shuffle
    partitions sized to cores in local mode (not the 200 default); Arrow
    enabled for the pandas-UDF extraction path.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # 2x cores: post-shuffle stages carry Arrow-batched Python work whose
        # CPU cost per byte is far above JVM relational work — byte-based AQE
        # coalescing alone would under-parallelize the UDF stages
        shuffle_partitions = max(cpus * 2, 16)
    # SPARK_GRAFT_MASTER overrides the master URL — e.g.
    # local-cluster[4,4,8192] runs 4 separate 4-core executor JVMs on this
    # machine (own heap/GC/Arrow runners each), the faithful single-box
    # rendition of "N executors"; local[N] folds all cores into one JVM.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep coalesced partitions small enough that UDF stages stay wide
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        # post-shuffle stages that carry pandas-UDF work are CPU-bound, not
        # byte-bound: a 4 MB link batch can hold seconds of Python — keep the
        # coalescer from narrowing below real parallelism
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # web html compresses ~25x: default 128 MB (compressed) splits give
        # far too few scan tasks once the binary column decompresses
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # local mode runs many short rounds in one JVM: reclaim broadcast /
        # shuffle state often (default 30min lets it pile up), and a larger
        # G1 region keeps batch-sized broadcasts out of humongous territory
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.driver.extraJavaOptions",
                "-XX:G1HeapRegionSize=32m -XX:MaxGCPauseMillis=300")
        .config("spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "8g"))
        .config("spark.executor.extraJavaOptions",
                "-XX:G1HeapRegionSize=32m -XX:MaxGCPauseMillis=300")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # the binding limit for fat binary rows: a 10k-record batch of 21 KB
        # pages is ~210 MB of Arrow — humongous G1 allocations × N workers
        # collapse concurrent UDF throughput. 16 MB batches keep the python
        # runner pipeline smooth at any width; narrow rows still get the
        # full 10k records
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "16m")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
