"""A/B: does bucketed+SORTED events lift the user_id event family over
the adoption bar — and if so, through which mechanism?

Round-12 pre-measure (SCALE.md "Pre-measured adoption queue"): events
bucketed 32-way by user_id bought the 8-query family only 1.13x — below
the 15% bar — because the family is window-heavy and every window still
pays its in-task (user_id, ts) sort after the pre-window exchange is
gone. The recorded revisit condition: a sort-preserving layout, i.e.
``write_bucketed(sort_by=...)`` + one file per bucket + the session
conf ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (r11
finding: all three are required together — Spark 4 defaults never
report bucketed-scan output ordering, so sortBy alone buys nothing at
the PLAN level). This probe measures that condition with the REAL
registered queries.

Mechanism split — the first run of this probe found the sorted arm
1.36x faster than unsorted-bucketed while the executed plans were
IDENTICAL (same Sort nodes): none of the family's sorts is exactly
[user_id, ts] (they tie-break on event_id, interleave event_type into
the key, or order by a computed session_window), so the elision path
— which a [user_id, ts] row_number window DOES take under the conf,
verified separately — never fires here. Any real win must then come
from the physical layout (clustered user_id RLE-compresses better and
the in-task sorts run adaptively over already-sorted runs), which the
conf cannot affect. FOUR arms, each rebinding
``streaming_batch.load_table`` so the registered query code runs
unmodified; only the "events" read is substituted:

- ``plain``: fixture events.parquet (the pre-measure baseline);
- ``bucketed``: events bucketed 32-way by user_id, unsorted (the
  1.13x arm);
- ``sorted``: events bucketed 32-way, ``sortBy(user_id, ts)``, one
  file per bucket, session-default conf — isolates the LAYOUT term;
- ``sorted+conf``: same table swept with the legacy output-ordering
  conf ON (captured and restored in a finally) — the conf-elision
  term on top; expected ~= ``sorted`` for this family.

ROTATED interleaved timing: arm order within each timed round rotates
(round r starts at arm r mod 4), so neither slow JVM drift NOR the
fixed within-round position can masquerade as an arm effect — the
first version of this probe ran a fixed (plain, bucketed, sorted)
order every round, which left the winning arm always in the warmest
slot. Sequential arms are banned outright (SCALE.md round 12).

Decision protocol: adopt only on a >=15% family-median win; record
numbers either way in SCALE.md. Note the conf is GLOBAL to the
session: a conf-dependent adoption would put every other query in a
shared gate sweep on the legacy bucketed-scan path, so a win through
the conf arm would additionally need a no-regression check on the
non-family gate before any registry edit. A win through the plain
``sorted`` arm needs no conf and carries no such coupling.

Usage::

    python tools/ab_userid_sorted.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import time
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FAMILY = (
    "user_sessions",
    "user_lifetime_totals",
    "events_asof_latest_order",
    "purchase_state_attribution",
    "user_event_islands",
    "user_decayed_value",
    "earliest_event_per_user_type",
    "user_retention_cohorts",
)

ORDERING_CONF = "spark.sql.legacy.bucketedTableScan.outputOrdering"
WARM_ROUNDS = 2
TIMED_ROUNDS = 8  # a multiple of the arm count so every arm sees every slot


def main() -> None:
    from news_data_pipeline_spark.queries import query_map
    from news_data_pipeline_spark.queries import streaming_batch
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
    spark = get_spark("ab_userid_sorted")
    qmap = query_map()
    real_load_table = streaming_batch.load_table
    # since the r14 adoption the 8-query family reads events through
    # streaming_batch._userid_events, not load_table — rebind it to the
    # same arm hook so each arm's table actually reaches the registered
    # query code (and the plain arm stays genuinely plain)
    real_userid_events = streaming_batch._userid_events

    db = f"ab_userid_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        events = load_table(spark, sf_dir, "events")
        t0 = time.perf_counter()
        write_bucketed(
            events.repartition(32, "user_id"), "events_b",
            bucket_by="user_id", num_buckets=32, database=db,
        )
        t_bucket = time.perf_counter() - t0
        t0 = time.perf_counter()
        write_bucketed(
            events.repartition(32, "user_id"), "events_bs",
            bucket_by="user_id", num_buckets=32,
            sort_by=("user_id", "ts"), database=db,
        )
        t_sorted = time.perf_counter() - t0
        print(
            f"artifact builds: bucketed {t_bucket:.2f}s,"
            f" bucketed+sorted {t_sorted:.2f}s",
            flush=True,
        )

        def hooked(table_name: str):
            def hook(s, d, t):
                if t == "events":
                    return s.table(f"{db}.{table_name}")
                return real_load_table(s, d, t)
            return hook

        # (hook, ordering_conf_value) per arm; None = session default
        arms = {
            "plain": (real_load_table, None),
            "bucketed": (hooked("events_b"), None),
            "sorted": (hooked("events_bs"), None),
            "sorted+conf": (hooked("events_bs"), "true"),
        }
        order = list(arms)

        def family_sweep(hook, conf_val) -> dict[str, float]:
            streaming_batch.load_table = hook
            streaming_batch._userid_events = lambda s, d: hook(s, d, "events")
            prior = spark.conf.get(ORDERING_CONF, None)
            try:
                if conf_val is not None:
                    spark.conf.set(ORDERING_CONF, conf_val)
                return {
                    n: bench.run_query(qmap[n], spark, sf_dir)
                    for n in FAMILY
                }
            finally:
                streaming_batch.load_table = real_load_table
                streaming_batch._userid_events = real_userid_events
                if prior is None:
                    spark.conf.unset(ORDERING_CONF)
                else:
                    spark.conf.set(ORDERING_CONF, prior)

        # mechanism check: executed-plan Sort/Exchange counts per arm,
        # collected once before timing (AQE finalizes the plan only
        # after execution)
        for tag in order:
            hook, conf_val = arms[tag]
            streaming_batch.load_table = hook
            streaming_batch._userid_events = lambda s, d: hook(s, d, "events")
            prior = spark.conf.get(ORDERING_CONF, None)
            try:
                if conf_val is not None:
                    spark.conf.set(ORDERING_CONF, conf_val)
                for n in FAMILY:
                    frame = qmap[n](spark, sf_dir)
                    frame.write.format("noop").mode("overwrite").save()
                    plan = (
                        frame._jdf.queryExecution().executedPlan().toString()
                    )
                    sorts = plan.count("Sort [")
                    exchanges = plan.count("Exchange")
                    print(
                        f"plan {tag} {n}: sorts={sorts}"
                        f" exchanges={exchanges}",
                        flush=True,
                    )
                    spark.catalog.clearCache()
            finally:
                streaming_batch.load_table = real_load_table
                streaming_batch._userid_events = real_userid_events
                if prior is None:
                    spark.conf.unset(ORDERING_CONF)
                else:
                    spark.conf.set(ORDERING_CONF, prior)

        for _ in range(WARM_ROUNDS):
            for tag in order:
                family_sweep(*arms[tag])

        reps: dict[str, list[dict[str, float]]] = {tag: [] for tag in arms}
        for r in range(TIMED_ROUNDS):
            # rotate the within-round arm order so no arm owns a slot
            rotated = order[r % len(order):] + order[:r % len(order)]
            for tag in rotated:
                reps[tag].append(family_sweep(*arms[tag]))

        totals = {}
        for tag in order:
            per_q = {
                n: statistics.median([r[n] for r in reps[tag]])
                for n in FAMILY
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
        p = totals["plain"]
        print(
            f"RESULT plain {p:.3f}s | bucketed {totals['bucketed']:.3f}s"
            f" ({p / totals['bucketed']:.2f}x) | sorted"
            f" {totals['sorted']:.3f}s ({p / totals['sorted']:.2f}x) |"
            f" sorted+conf {totals['sorted+conf']:.3f}s"
            f" ({p / totals['sorted+conf']:.2f}x)"
            f" (builds {t_bucket:.2f}/{t_sorted:.2f}s)",
            flush=True,
        )
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        spark.stop()


if __name__ == "__main__":
    main()
