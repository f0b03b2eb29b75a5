"""Sources & sinks (SURVEY §2.1).

The reference has exactly two feeders — in-memory rows and a local-file
path walker (/root/reference/input.go:11-31, feeder iface
/root/reference/input/feeder.go:9-11) — and no format readers at all
(CSV parsing is user code — /root/reference/test/input_csv_decoder.go).
Here the same surface plus the real format readers Spark provides:

- ``parallelize``     → in-memory rows (mirror of lrmr.Parallelize)
- ``local_file_paths``→ one row per file path (mirror of FromLocalFile)
- ``read_csv/json/parquet/orc`` → native splittable readers with
  explicit schemas (inference is a correctness+perf hazard at scale)
- ``decode_csv_paths``→ the reference's DecodeCSV user-op shape: a
  path-per-row DF fanned out to per-file parsing
- ``write_parquet``   → partitioned columnar sink

Formats needing external jars (Delta/Iceberg/Hudi/JDBC drivers) are
gated behind try-imports and raise a clear error in this container.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parallelize",
    "local_file_paths",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_orc",
    "decode_csv_paths",
    "read_text",
    "read_binary_files",
    "read_jdbc",
    "write_parquet",
    "write_bucketed",
    "compact_parquet",
    "read_delta",
]


def parallelize(spark: SparkSession, data: Iterable[Any], schema: Any = None) -> DataFrame:
    """Mirror of lrmr.Parallelize (/root/reference/lrmr.go:12-14)."""
    return spark.createDataFrame(data, schema=schema)


def local_file_paths(spark: SparkSession, path: str) -> DataFrame:
    """Mirror of lrmr.FromLocalFile (/root/reference/input.go:11-22):
    one row per file path, column ``value``. Small listings only — at
    scale use a native reader with a glob, which also splits files."""
    paths = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            paths.append((os.path.join(root, f),))
    return spark.createDataFrame(paths, schema="value string")


def read_csv(
    spark: SparkSession, path: str, schema: Any = None, header: bool = True, **options: Any
) -> DataFrame:
    """Native CSV reader — replaces the reference's per-file user-code
    CSV decode (/root/reference/test/input_csv_decoder.go:23-76) with a
    splittable, pushdown-capable scan."""
    reader = spark.read.option("header", header).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: Any = None, **options: Any) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def decode_csv_paths(
    paths_df: DataFrame, schema: str, key_col: str | None = None, header: bool = True
) -> DataFrame:
    """The reference's flagship DecodeCSV stage shape
    (/root/reference/test/input_csv_decoder.go:23-76): a DF of file
    paths → parsed records, optionally keyed by one column. Implemented
    by collecting the (small) path list and handing it to the native
    CSV reader — the files themselves are never driver-side."""
    spark = paths_df.sparkSession
    paths = [r[0] for r in paths_df.collect()]
    df = spark.read.option("header", header).schema(schema).csv(paths)
    if key_col is not None:
        from pyspark.sql import functions as F

        df = df.withColumn("key", F.col(key_col))
    return df


def read_text(
    spark: SparkSession, path: str, wholetext: bool = False, **options: Any
) -> DataFrame:
    """Line-oriented (or whole-file) text reader — the raw-corpus
    ingestion path. ``wholetext=False`` splits large files by line
    ranges (parallel within a file); ``wholetext=True`` yields one row
    per file (for document-per-file corpora — pair with many small
    files, not one giant one, since a whole file must fit a task)."""
    # wholetext must ride the reader call, not .option() (the option
    # key is consumed at text()-call time in PySpark)
    return spark.read.options(**options).text(path, wholetext=wholetext)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file reader (built-in ``binaryFile`` format): one row per
    file with (path, modificationTime, length, content) — the ingestion
    path for image/audio/video corpora into the multimodal operators
    (operators.multimodal takes the ``content`` binary column).

    Scale notes: metadata columns (path/length/mtime) are read from the
    file listing, so filters on them prune files BEFORE any byte is
    fetched (spark.sql.sources.binaryFile.maxLength guards huge blobs);
    files are not splittable — one file = one task input, so shard media
    into object-store-sized pieces upstream."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned columnar sink — partition columns become directory
    pruning at read time. ``max_records_per_file`` caps output file
    size (the write-side half of the small/huge-file hygiene that
    compact_parquet repairs read-side): at 100 TB, unbounded task
    outputs produce multi-GB files that defeat parallel scan splits,
    while a cap keeps every file a unit of parallelism."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted table sink (bucketBy/sortBy + saveAsTable).

    The storage layout that makes repeated join/dedup pipelines
    shuffle-free at 100 TB: both sides of a recurring join bucketed by
    the join key with the same bucket count sort-merge-join with ZERO
    exchanges (and with sortBy, zero sorts) — the shuffle is paid once
    at write time instead of on every query. The reference has no write
    path at all; this is the Spark-native north star."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake reader — activates whenever the delta jars are on the
    session classpath (e.g. a cluster launched with the delta-spark
    package); gated so imports of this module never fail. The probe
    (optional_deps.has_delta) sharpens the error: pip package present
    but jars missing means the SESSION was built without them — they
    must be on the classpath at JVM launch, not importable later."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        from ..optional_deps import has_delta

        hint = (
            "delta-spark is pip-installed but the jars are not on this "
            "session's classpath — build the session with "
            "delta.configure_spark_with_delta_pip() (jars must be set "
            "at JVM launch)"
            if has_delta()
            else "Delta Lake requires the delta-spark package on the classpath"
        )
        raise NotImplementedError(hint) from exc


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: Any,
) -> DataFrame:
    """JDBC reader with partitioned parallel pulls — set
    ``partition_column`` + bounds so the read splits into
    ``num_partitions`` range queries instead of one serial cursor (the
    difference between minutes and hours against a big table). Driver
    jars are not present in this container; gated like read_delta."""
    try:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .options(**options)
        )
        if partition_column is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", num_partitions)
                .option("lowerBound", lower_bound)
                .option("upperBound", upper_bound)
            )
        return reader.load()
    except Exception as exc:  # pragma: no cover - driver-jar-dependent
        raise NotImplementedError(
            "JDBC reads require the database driver jar on the classpath"
        ) from exc


def compact_parquet(
    spark: SparkSession, path: str, target_files: int, sort_within: list[str] | None = None
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (optionally sorted within each file for
    min/max row-group skipping). Streaming sinks and incremental
    appends accumulate thousands of tiny files whose per-file open cost
    dominates scans; periodic compaction is the table-maintenance
    operation every lakehouse schedules (Delta OPTIMIZE / Iceberg
    rewrite_data_files — same logical rewrite, no table format needed).

    Rewrites into a sibling staging dir then atomically swaps, so a
    concurrent reader sees either the old or the new layout. Returns
    the number of data files after compaction."""
    import shutil

    df = spark.read.parquet(path)
    df = df.repartition(target_files)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    staging = path.rstrip("/") + ".compact_tmp"
    backup = path.rstrip("/") + ".compact_old"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
