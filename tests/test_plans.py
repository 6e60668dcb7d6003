"""Plan guardrails: scale anti-patterns must never enter the surface.

These assertions are the 100-TB design contract from SURVEY §4, enforced
mechanically over EVERY registered query's optimized physical plan:

* no ``BatchEvalPython`` — a row-at-a-time pickled Python UDF in a hot
  path (Arrow ``mapInPandas`` nodes are allowed: ``MapInPandas`` /
  ``ArrowEvalPython``);
* no ``CartesianProduct`` — an unkeyed cross join that cannot scale;
* no ``Window`` over an empty partition spec (the reference's
  single-partition surrogate-key builds, ``03:38,43,58``) — every
  window must carry ``partitionBy`` unless the input is provably tiny.

Plans are compiled, not executed, so this covers every registered query in
seconds.
"""

from __future__ import annotations

import re

import pytest

from news_data_pipeline_spark.queries import query_map

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def plan_of(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


# A Window whose sort feeds from Exchange SinglePartition == an
# unpartitioned window spec: the whole dataset funnels through ONE task.
# (A bare "Exchange SinglePartition" is NOT globally forbidden — scalar
# aggregates legitimately finalize on one post-combine partition.)
GLOBAL_WINDOW = re.compile(
    r"Window [^\n]*\n[^\n]*Sort [^\n]*\n[^\n]*Exchange SinglePartition"
)


@pytest.mark.parametrize("name", sorted(query_map()))
def test_no_scale_antipatterns(spark, name):
    df = query_map()[name](spark, SF_DIR)
    plan = plan_of(spark, df)
    for marker in FORBIDDEN:
        assert marker not in plan, f"{name}: {marker} in physical plan"
    m = GLOBAL_WINDOW.search(plan)
    assert m is None, (
        f"{name}: unpartitioned Window (single-partition exchange at "
        f"scale):\n{m.group(0)}"
    )
    # Correctness harnesses canonicalize results by sorting/hashing
    # scalar cells; a top-level array/map column crashes that step
    # (pandas cannot factorize ndarray cells). Surface collections as
    # scalars instead: posexplode to rows, or array_join to a string.
    from pyspark.sql.types import ArrayType, MapType

    for field in df.schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType)), (
            f"{name}: top-level {field.dataType.simpleString()} column "
            f"'{field.name}' is not canonicalizable by the correctness "
            "harness — explode it to rows or array_join it to a string"
        )


def test_global_window_detector_catches_the_antipattern(spark):
    """The detector must flag the reference's surrogate-key shape
    (``row_number`` over ``Window.orderBy`` with no partitionBy)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    bad = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert GLOBAL_WINDOW.search(plan_of(spark, bad)) is not None


def test_runtime_bloom_filter_reaches_fact_scan(spark):
    """Big-big joins at 100 TB lean on runtime row-level filtering: a
    selective build side injects a bloom filter that prunes the fact
    scan BEFORE the shuffle (might_contain over xxhash64 in the scan
    filter). Thresholds are lowered because test data is tiny; the
    optimizer rule and plan shape are exactly what a cluster run uses."""
    import pyspark.sql.functions as F

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        sel = orders.where(F.col("o_totalprice") > 400000).select("o_orderkey")
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        plan = plan_of(spark, j)
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
