"""Layered-lake writers.

Generalizes the reference's ``write_to_datalake`` /
``write_to_datalake_and_hive`` (``_lib_dq_helpers.py:21-54, 198-233``):
partitioned writes to a layer path plus optional metastore registration.

Two deliberate fixes over the reference:

* The reference executes the full plan twice per gold table (Delta save
  then ``saveAsTable``, ``_lib_dq_helpers.py:216,226``). Here we write
  the files once and register the table *over the written path* — zero
  recompute.
* Delta Lake isn't available in this container, so the physical format
  is parquet behind the same API; the format is a parameter, not a
  hardcode, so a Delta-enabled cluster just passes ``fmt="delta"``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_layer(
    df: DataFrame,
    path: str,
    *,
    partition_by: str | Sequence[str] | None = None,
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` to ``path`` with optional partitioning.

    Mirrors ``write_to_datalake`` (``_lib_dq_helpers.py:21-54``) minus the
    cloud-path assembly: callers pass a full path/URI so the same code
    serves local disk, HDFS, or object stores.
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.save(path)


def write_layer_and_register(
    df: DataFrame,
    path: str,
    table: str,
    *,
    database: str = "news_articles",
    partition_by: str | Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write once, then register an external table over the files.

    Replaces ``write_to_datalake_and_hive`` (``_lib_dq_helpers.py:198-233``)
    without the double execution: ``CREATE TABLE ... USING <fmt> LOCATION``
    is a metadata-only operation.
    """
    spark: SparkSession = df.sparkSession
    write_layer(df, path, partition_by=partition_by, mode=mode, fmt=fmt)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
    spark.sql(
        f"CREATE TABLE {database}.{table} USING {fmt} LOCATION '{path}'"
    )
    if partition_by:
        spark.sql(f"MSCK REPAIR TABLE {database}.{table}")


def quarantine_writer(path: str, fmt: str = "parquet"):
    """Append-only audit sink for DQ-failed rows.

    The payload/reason/lineage shaping happens in ``dq.engine`` (mirrors
    ``02_silver_transformation_news_articles.py:44-49``); this is just the
    append-mode sink those rows flow into.
    """

    def _write(df: DataFrame) -> None:
        write_layer(df, path, mode="append", fmt=fmt)

    return _write


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | Sequence[str],
    num_buckets: int,
    sort_by: str | Sequence[str] | None = None,
    database: str = "news_articles",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a table bucketed (and optionally sorted) by join/agg keys.

    Bucketing is the co-located-join story at 100 TB: two tables
    bucketed by the same key into the same bucket count join with NO
    exchange on either side — the shuffle happens once at write time
    and every subsequent join/aggregation on the key is free. Requires
    the metastore (``saveAsTable``); plain path writes can't record
    bucket metadata.
    """
    spark: SparkSession = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    bucket_cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_by:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(f"{database}.{table}")


def compact_layer(
    spark: SparkSession,
    path: str,
    *,
    target_partitions: int | None = None,
    partition_by: str | Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Rewrite a layer to healthy file counts (small-files compaction).

    Streaming sinks and frequent small appends leave thousands of tiny
    files per partition; scans then pay per-file open cost and lose
    row-group pruning. This rewrites the layer in one pass —
    ``repartition`` to ``target_partitions`` (or let AQE coalesce when
    None) — into a temp directory, then swaps it in via the Hadoop
    FileSystem API (local disk, HDFS, or any mounted FS).

    The delete+rename swap is NOT atomic: a concurrent reader can catch
    the gap, and object stores rename by copy. Under concurrency or on
    S3-class storage use a table format instead (Delta ``OPTIMIZE`` is
    this operation with a transactional commit).
    """
    import uuid

    df = spark.read.format(fmt).load(path)
    out = df.repartition(target_partitions) if target_partitions else df.coalesce(
        max(spark.sparkContext.defaultParallelism // 4, 1)
    )
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    write_layer(out, tmp, partition_by=partition_by, mode="overwrite", fmt=fmt)
    jvm = spark._jvm
    dst = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    old = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}__pre_compact")
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    # Rename the live layer ASIDE first — deleting it before the swap
    # would leave NO copy if the rename then failed or the process died.
    fs.delete(old, True)
    if not fs.rename(dst, old):
        raise IOError(f"compaction: could not move {path} aside")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # restore the original layer
        raise IOError(f"compaction rename failed: {tmp} -> {path}; original restored")
    fs.delete(old, True)
