"""SparkSession factory tuned for this engine.

Local-mode knobs follow the public Spark docs: shuffle partitions ~ cores
(not 200), AQE on for runtime coalesce/skew handling, Arrow on for the
pandas-UDF analyzer path, UTC session TZ so DuckDB-oracle comparisons are
stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "mysql_es_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Job commit: v2 commits task output directly at task-commit time
        # (parallel, on executors) instead of a driver-serial rename sweep
        # at job end — with partitionBy(term_bucket) writes producing
        # O(tasks × buckets) files, v1's serial commit was ~10s of
        # non-scaling wall time per build. Production object-store
        # committers (S3A magic / Iceberg) are likewise task-parallel.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Local FS only: skip the ChecksumFileSystem .crc shadow files —
        # they double small-file creates/renames; parquet has its own
        # page checksums.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
