"""A/B: bucketed-by-orderkey orders+lineitem vs plain parquet reads
for the registry's repeat-join family (round-12, verdict item 4).

The round-11 bucketed-join sweep (SCALE.md "Storage layout") measured
the lever's slope on synthetic data: 0.94x at 1M fact rows, break-even
~16M, 2.36x at 64M, write cost amortized over ~2.6 reads. This probe
asks the ADOPTION question at the engine's bench operating point: the
six registered queries that all re-join ``lineitem`` to ``orders`` on
the orderkey per invocation (priority_order_counts, shipping_priority,
returned_items_report, nation_pair_trade, ship_lag_priority_bands,
sole_late_suppliers) — would routing their reads through a
fingerprint-cached bucketed copy (the ``_bucketed_join_db`` pattern)
beat the plain parquet scan at sf0.1?

Mechanism: build ``b_orders``/``b_lineitem`` (full columns, bucketed 32
ways by the join key, one sorted file per bucket) in a temp database,
then rebind ``relational.load_table`` to redirect just those two tables
— the REAL registered query code runs unmodified in both arms, so the
comparison includes every downstream stage. Warm pass + 4 timed reps
per arm, per-query medians, noop-sink execution (bench.run_query).

Decision protocol: adopt only on a >=15% family-median win
(measured-decision culture, SCALE.md); record the numbers either way.

Usage::

    python tools/ab_bucketed_family.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import tempfile
import time
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FAMILY = (
    "priority_order_counts",
    "shipping_priority",
    "returned_items_report",
    "nation_pair_trade",
    "ship_lag_priority_bands",
    "sole_late_suppliers",
)


def main() -> None:
    from news_data_pipeline_spark.queries import query_map
    from news_data_pipeline_spark.queries import relational
    from news_data_pipeline_spark.session import get_spark
    from news_data_pipeline_spark.sources.catalog import load_table
    from news_data_pipeline_spark.sources.writers import write_bucketed

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ab_bucketed_family")
    qmap = query_map()

    def run_arm(tag: str) -> dict[str, float]:
        for name in FAMILY:  # warm: compile + page cache
            bench.run_query(qmap[name], spark, sf_dir)
        reps: dict[str, list[float]] = {name: [] for name in FAMILY}
        for _ in range(4):
            for name in FAMILY:
                reps[name].append(bench.run_query(qmap[name], spark, sf_dir))
        med = {n: statistics.median(ts) for n, ts in reps.items()}
        for n in FAMILY:
            print(
                f"  {tag} {n}: median {med[n]:.3f}s"
                f" (min {min(reps[n]):.3f} max {max(reps[n]):.3f})",
                flush=True,
            )
        print(f"{tag} family total: {sum(med.values()):.3f}s", flush=True)
        return med

    plain = run_arm("plain")

    db = f"ab_bucketed_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="ab_bucketed_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    t0 = time.perf_counter()
    # full columns: the family projects different subsets; repartition
    # to one file per bucket so sortBy survives the read (r11 sweep)
    write_bucketed(
        load_table(spark, sf_dir, "orders").repartition(32, "o_orderkey"),
        "b_orders", bucket_by="o_orderkey", num_buckets=32,
        sort_by="o_orderkey", database=db,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").repartition(32, "l_orderkey"),
        "b_lineitem", bucket_by="l_orderkey", num_buckets=32,
        sort_by="l_orderkey", database=db,
    )
    t_write = time.perf_counter() - t0
    print(f"bucketed write (orders+lineitem, 32 buckets): {t_write:.2f}s",
          flush=True)

    def routed(spark_, sf_dir_, table):
        if sf_dir_ == sf_dir and table == "orders":
            return spark_.table(f"{db}.b_orders")
        if sf_dir_ == sf_dir and table == "lineitem":
            return spark_.table(f"{db}.b_lineitem")
        return load_table(spark_, sf_dir_, table)

    relational.load_table = routed
    try:
        bucketed = run_arm("bucketed")
    finally:
        relational.load_table = load_table
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")

    p_tot, b_tot = sum(plain.values()), sum(bucketed.values())
    print(
        f"RESULT plain {p_tot:.3f}s vs bucketed {b_tot:.3f}s"
        f" -> {p_tot / b_tot:.2f}x (write cost {t_write:.2f}s,"
        f" break-even {t_write / max(p_tot - b_tot, 1e-9):.1f} family"
        f" sweeps)" if b_tot < p_tot else
        f"RESULT plain {p_tot:.3f}s vs bucketed {b_tot:.3f}s"
        f" -> bucketed SLOWER ({b_tot / p_tot:.2f}x), write cost"
        f" {t_write:.2f}s never amortizes",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
