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
fingerprint-cached bucketed copy (the ``_orderkey_tables`` artifact)
beat the plain parquet scan at sf0.1?

THREE arms, each rebinding ``relational._orderkey_tables`` (the
adopted read hook) so the REAL registered query code runs unmodified
against each physical layout:

- ``plain``: the original fixture tables (single-file,
  single-row-group parquet);
- ``rewritten``: the same rows rewritten as 32 plain parquet files
  (no bucket metadata) — the scan-parallelism control;
- ``bucketed``: the adopted fingerprint-cached bucketed artifact.

INTERLEAVED timing: after warming every arm twice, the timed rounds
run each arm once per round, ROTATING the within-round arm order
each round (round r starts at arm r mod 3) so neither slow JVM
warm-up drift nor a systematic per-slot effect can masquerade as an
arm effect. Two earlier versions each mis-attributed: (a) fully
sequential arms read the first arm in a fresh JVM 1.4-4x high (the
run-order/cold-start class in BENCH_BASELINE.md), making the 32-file
rewrite look like a 1.34x scan-parallelism win; (b) interleaved but
FIXED-order rounds (bucketed always in the coldest first slot) read
bucketed at only 1.30x and the rewrite at ~0 — the sixth
local-measurement trap (SCALE.md "Rotated-arm re-measure"). Rotated,
the round-12 numbers are: plain 6.28 s, rewritten 4.90 s (scan
parallelism IS worth ~1.28x at sf0.1 once no arm owns the cold
slot), bucketed 4.08 s (1.54x vs plain; 1.20x vs rewritten) — the
co-location term alone still clears the adoption bar, and it is the
term that stacks with the r11 sweep's sort-merge win (2.36x at 64M
rows) once broadcast stops being an option at scale.

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

WARM_ROUNDS = 2
TIMED_ROUNDS = 6  # a multiple of the arm count: every arm sees every slot


def main() -> None:
    import shutil

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

    real_orderkey_tables = relational._orderkey_tables

    # rewritten arm's layout: 32 plain files, no bucket metadata
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

    # bucketed arm: the adopted production artifact (build cost = first
    # call; subsequent calls are fingerprint-cache hits)
    t0 = time.perf_counter()
    real_orderkey_tables(spark, sf_dir)
    t_build = time.perf_counter() - t0
    print(f"bucketed artifact build: {t_build:.2f}s", flush=True)

    arms = {
        "bucketed": real_orderkey_tables,
        "plain": lambda s, d: (
            load_table(s, d, "orders"), load_table(s, d, "lineitem")
        ),
        "rewritten": lambda s, d: (
            s.read.parquet(f"{rw_root}/orders"),
            s.read.parquet(f"{rw_root}/lineitem"),
        ),
    }

    def family_sweep(hook) -> dict[str, float]:
        relational._orderkey_tables = hook
        try:
            return {
                n: bench.run_query(qmap[n], spark, sf_dir) for n in FAMILY
            }
        finally:
            relational._orderkey_tables = real_orderkey_tables

    for _ in range(WARM_ROUNDS):
        for hook in arms.values():
            family_sweep(hook)

    # rotate the within-round arm order so no arm owns a warmth/GC slot
    # (the fixed-order version left each arm in the same per-round
    # position — the sixth local-measurement trap, found by the rotated
    # user_id/custkey probes; rotation supersedes it here too)
    order = list(arms)
    reps: dict[str, list[dict[str, float]]] = {tag: [] for tag in arms}
    for r in range(TIMED_ROUNDS):
        rotated = order[r % len(order):] + order[:r % len(order)]
        for tag in rotated:
            reps[tag].append(family_sweep(arms[tag]))

    totals = {}
    for tag in arms:
        per_q = {
            n: statistics.median([r[n] for r in reps[tag]]) for n in FAMILY
        }
        for n in FAMILY:
            print(f"  {tag} {n}: median {per_q[n]:.3f}s", flush=True)
        totals[tag] = sum(per_q.values())
        sweep_totals = [sum(r.values()) for r in reps[tag]]
        print(
            f"{tag} family total {totals[tag]:.3f}s (sweep totals"
            f" {[round(x, 2) for x in sweep_totals]})",
            flush=True,
        )

    shutil.rmtree(rw_root, ignore_errors=True)
    print(
        f"RESULT plain {totals['plain']:.3f}s | rewritten-32-file"
        f" {totals['rewritten']:.3f}s | bucketed {totals['bucketed']:.3f}s"
        f" -> bucketed {totals['plain'] / totals['bucketed']:.2f}x vs"
        f" plain, {totals['rewritten'] / totals['bucketed']:.2f}x vs"
        f" rewritten (build {t_build:.2f}s, rewrite {t_rw:.2f}s)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
