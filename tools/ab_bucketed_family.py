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

THREE arms, each rebinding ``relational._orderkey_tables`` (the
adopted read hook) so the REAL registered query code runs unmodified
against each physical layout:

- ``plain``: the original fixture tables — which at sf0.1 are
  SINGLE-FILE, SINGLE-ROW-GROUP parquet, so their scans are
  effectively one task wide;
- ``rewritten``: the same rows rewritten as 32 plain parquet files
  (no bucket metadata) — isolates the multi-file scan-parallelism
  term;
- ``bucketed``: the adopted fingerprint-cached bucketed artifact —
  adds the co-location term on top.

Warm pass + 4 timed reps per arm, per-query medians, noop-sink
execution (bench.run_query). First run's finding (round 12): at sf0.1
the family joins are all BROADCAST (AQE: filtered orders fits), so
the 1.39-1.52x plain->bucketed win is almost entirely the scan-
parallelism term the rewritten arm also gets; the co-location term
only engages at volumes where the join must sort-merge (r11 sweep:
break-even ~16M fact rows, 2.36x at 64M). Adoption stands on the pair:
bucketed >= rewritten at every scale, strictly better once broadcast
stops being an option.

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

    # The family queries read orders/lineitem through
    # ``relational._orderkey_tables`` (the adopted bucketed artifact);
    # each arm rebinds that hook so the REAL registered query code runs
    # unmodified against the arm's physical layout.
    real_orderkey_tables = relational._orderkey_tables

    # plain arm: the original single-file fixture tables
    relational._orderkey_tables = lambda s, d: (
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    try:
        plain = run_arm("plain")
    finally:
        relational._orderkey_tables = real_orderkey_tables

    # Control arm: the same tables rewritten as 32 PLAIN parquet files
    # (no bucket metadata). The sf0.1 fixture tables are single-file
    # single-row-group parquet, so their scans are effectively
    # single-task; this arm separates the multi-file scan-parallelism
    # term from the bucketed-join co-location term.
    rw_root = tempfile.mkdtemp(prefix="ab_rewritten_")
    t0 = time.perf_counter()
    load_table(spark, sf_dir, "orders").repartition(
        32, "o_orderkey"
    ).write.mode("overwrite").parquet(f"{rw_root}/orders")
    load_table(spark, sf_dir, "lineitem").repartition(
        32, "l_orderkey"
    ).write.mode("overwrite").parquet(f"{rw_root}/lineitem")
    t_rw = time.perf_counter() - t0
    print(f"rewritten plain write (32 files each): {t_rw:.2f}s", flush=True)

    relational._orderkey_tables = lambda s, d: (
        s.read.parquet(f"{rw_root}/orders"),
        s.read.parquet(f"{rw_root}/lineitem"),
    )
    try:
        rewritten = run_arm("rewritten")
    finally:
        relational._orderkey_tables = real_orderkey_tables

    # bucketed arm: the adopted production path itself (fingerprint-
    # cached artifact db; the build cost is paid by the first call)
    t0 = time.perf_counter()
    real_orderkey_tables(spark, sf_dir)
    t_write = time.perf_counter() - t0
    print(f"bucketed artifact build: {t_write:.2f}s", flush=True)
    bucketed = run_arm("bucketed")

    import shutil

    shutil.rmtree(rw_root, ignore_errors=True)
    p_tot, b_tot = sum(plain.values()), sum(bucketed.values())
    r_tot = sum(rewritten.values())
    print(
        f"RESULT plain {p_tot:.3f}s | rewritten-32-file {r_tot:.3f}s"
        f" | bucketed {b_tot:.3f}s -> bucketed {p_tot / b_tot:.2f}x vs"
        f" plain, {r_tot / b_tot:.2f}x vs rewritten (bucketed write"
        f" {t_write:.2f}s, rewrite {t_rw:.2f}s)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
