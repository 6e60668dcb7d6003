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

# Logical nodes (QueryPlan.nodeName) that are narrow over their
# children: a plan made only of these (over leaves) has no exchanges,
# so Dataset.rdd builds the RDD lazily without running anything.
# Anything else (Join, Aggregate, Window, Sort, limits, Repartition,
# ...) is skipped — see fan_out.
_NARROW_NODES = frozenset(
    {
        # leaves
        "LogicalRelation",
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "StreamingRelation",
        "LogicalRDD",
        "LocalRelation",
        "OneRowRelation",
        "Range",
        # narrow unary/n-ary
        "Project",
        "Filter",
        "SubqueryAlias",
        "View",
        "Generate",
        "Union",
        # Arrow map stages are narrow; a decode chained on a scan still
        # deserves the fan-out
        "MapInPandas",
        "PythonMapInArrow",
        "MapPartitions",
    }
)


def _is_narrow_scan_chain(df: DataFrame) -> bool:
    """True iff every node of the analyzed logical plan is narrow (no
    shuffle below), making ``df.rdd.getNumPartitions()`` free.

    Under AQE, ``Dataset.rdd`` on a plan WITH exchanges materializes
    every query stage at plan-construction time — real jobs run, and
    the caller's action then recomputes them in a fresh execution.
    Inspecting partition counts is only safe on shuffle-free plans, and
    those are also the only plans that need the fan-out: anything
    downstream of a shuffle is already ``spark.sql.shuffle.partitions``
    wide.

    Classification walks the actual logical plan tree by
    ``nodeName`` — NOT the plan's string rendering, where a multi-line
    expression (e.g. a string literal containing a newline) would split
    a node across lines and misclassify it. A node carrying subquery
    expressions also fails the check: probing ``.rdd`` would execute
    the subquery plans regardless of the host node's shape.
    Unrecognized nodes fail conservative (no fan-out).
    """
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() not in _NARROW_NODES:
                return False
            if not node.subqueries().isEmpty():
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False


def fan_out(df: DataFrame, *, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``defaultParallelism``) iff it is a narrow scan-shaped
    plan currently carrying fewer partitions. Streaming frames and
    plans containing any wide node pass through untouched — the former
    have no static partition count, the latter are already
    shuffle-partitioned AND probing them would eagerly execute their
    upstream stages under AQE."""
    if df.isStreaming or not _is_narrow_scan_chain(df):
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
