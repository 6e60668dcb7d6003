"""Adaptive scan fan-out for CPU-heavy operator heads.

A parquet file is splittable only at row-group boundaries, so a
small-file / single-row-group scan feeds exactly ONE task — and every
expression pipelined onto that scan (shingle explosion + md5 families,
regexp chains, Arrow/Python decode) runs on one core no matter how many
the cluster has. At real scale this never happens (thousands of input
splits); on a laptop-or-test-sized input it serializes precisely the
operators with the highest per-row cost.

``fan_out`` is the guarded fix: round-robin repartition to the
cluster's parallelism ONLY when the incoming partition count is below
it. The repartition moves just the operator's input projection (id +
payload — data the operator must touch anyway), and at scale the guard
makes it a no-op, so no plan pays a shuffle it doesn't need. Callers
apply it AFTER projecting down to the columns the operator consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``defaultParallelism``) iff it currently has fewer
    partitions. Streaming frames pass through untouched (no static
    partition count to inspect; the microbatch source sizes those)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
