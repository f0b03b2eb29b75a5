"""SparkSession factory tuned for this engine.

Replaces the reference's cluster bootstrap (``lrmr.NewExecutor`` /
``ConnectToCluster`` — /root/reference/lrmr.go:21-53,
/root/reference/executor/executor.go:76-112): Spark owns cluster
membership, liveness and scheduling, so the only thing left to build is
a well-configured session.

Scale notes (100 TB / 1000-executor design):
- AQE is on: runtime partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace the reference's static
  scheduler (/root/reference/partitions/schedule.go:55-165).
- ``spark.sql.shuffle.partitions`` defaults to ~2-3x total cores locally;
  on a real cluster AQE's coalescing makes a high initial number safe.
- Arrow is enabled so every Pandas-UDF operator moves columnar batches,
  the analogue of the reference's batched []Row channels
  (/root/reference/input/reader.go:9-21) but vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SF_DIR"]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "lrmr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Defaults favor correctness-critical settings (UTC session timezone so
    timestamps compare bit-identically with the DuckDB oracle) and
    scale-critical ones (AQE, Arrow, skew-join handling).
    """
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or _default_master())
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # custom Python DataSources (sources.pyds feeder) prune via
        # pushFilters; disabled by default in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long, converted in tables.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # bucketed tables (write_bucketed / bucketed_join_orders) live
        # here; pinned so every process that shares the repo sees the
        # same layout regardless of cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/root/repo/.spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
