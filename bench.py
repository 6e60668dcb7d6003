"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query executes fully (noop sink — every output column is computed,
nothing collects to the driver) after a warm-up pass that absorbs JVM/
codegen startup. Usage: python bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative slice of the declared surface: scan+agg, shuffles,
# broadcast joins, windows, LSH dedup, vector search, event-time windows,
# DQ split. Keep aligned with SURVEY.md §2 coverage.
HEADLINE_QUERIES = (
    "pricing_summary",
    "revenue_per_nation",
    "top_customers",
    "customer_running_spend",
    "order_status_rollup",
    "dq_valid_documents",
    "dedup_exact_fingerprint",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "multimodal_image_features",
    "tumbling_hourly_counts",
    "user_sessions",
    "user_lifetime_totals",
    "events_asof_latest_order",
    "shipping_priority",
    "training_corpus",
)


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    # Some operators persist intermediates (LSH banding, shingle tables);
    # clear between queries so no query is timed against another's
    # leftover cache or pays its memory pressure.
    spark.catalog.clearCache()
    return elapsed


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else None

    from news_data_pipeline_spark.queries import query_map
    from news_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qmap = query_map()

    # Warm-up: JIT/codegen/Arrow init on a tiny query, not on the clock.
    qmap["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Pre-fork the Python worker pool (one per core) and import pandas in
    # each: Arrow-stage queries should measure decode throughput, not 32
    # one-time worker cold starts. Workers are reused across queries
    # (spark.python.worker.reuse default), so this pays the fork exactly
    # where warm-up belongs.
    n_workers = spark.sparkContext.defaultParallelism

    def _touch(batches):
        for b in batches:
            yield b

    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        _touch, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        timings[name] = round(run_query(qmap[name], spark, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
