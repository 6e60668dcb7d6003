"""A/B: bucketed-by-custkey customer+orders vs plain reads for the
custkey repeat-join family — rotated-order re-measure of the round-12
pre-measure, plus the sorted-layout mechanism split.

The round-12 pre-measure (SCALE.md "Pre-measured adoption queue") read
the 5-query custkey family at 1.22x bucketed with a FIXED within-round
arm order; the user_id family's rotated re-measure showed fixed-order
probes can mis-state an arm effect by tens of percent (1.13x fixed →
1.46x rotated for the same lever), so this probe re-asks the custkey
question under the rotation protocol before round-13 adoption.

Unlike the user_id family, two custkey queries have windows whose
required ordering a sorted layout can satisfy EXACTLY —
``customer_running_spend`` and ``order_price_lag_lead`` both window
over (o_custkey ORDER BY o_orderdate, o_orderkey) — so the
``sorted+conf`` arm here is the genuine elision case the user_id
probe could not exercise (its windows tie-break on columns outside
the sort key). ``order_price_lag_lead`` was not in the pre-measured
5-query family; it is swept as a 6th member because it re-reads
orders over the same keys, and the 5-query subtotal is printed
separately for comparability.

FOUR arms, each rebinding ``relational.load_table`` so the registered
query code runs unmodified; only "customer" and "orders" reads are
substituted (lineitem/nation pass through):

- ``plain``: fixture files (pre-measure baseline);
- ``bucketed``: customer by c_custkey / orders by o_custkey, 32
  buckets, unsorted — the co-location term;
- ``sorted``: same, customer sortBy(c_custkey) and orders
  sortBy(o_custkey, o_orderdate, o_orderkey), one file per bucket,
  session-default conf — the physical-layout term (adaptive in-task
  sorts, RLE on clustered keys);
- ``sorted+conf``: same table swept with
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — the
  plan-level Sort-elision term on top.

ROTATED interleaved timing (round r starts at arm r mod 4) and a
pre-timing executed-plan Sort/Exchange census per arm, as in
``ab_userid_sorted.py``. Decision protocol: adopt only on a >=15%
family-median win; the conf arm additionally needs a no-regression
check on the non-family gate before any registry edit (the conf is
global to the session).

Usage::

    python tools/ab_custkey_family.py [sf_dir]
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

PREMEASURED = (
    "top_customers",
    "revenue_per_nation",
    "customers_with_orders",
    "customers_without_orders",
    "customer_running_spend",
)
FAMILY = PREMEASURED + ("order_price_lag_lead",)

ORDERING_CONF = "spark.sql.legacy.bucketedTableScan.outputOrdering"
WARM_ROUNDS = 2
TIMED_ROUNDS = 8


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
    spark = get_spark("ab_custkey_family")
    qmap = query_map()
    real_load_table = relational.load_table

    db = f"ab_custkey_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        customer = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        t0 = time.perf_counter()
        write_bucketed(
            customer.repartition(32, "c_custkey"), "customer_b",
            bucket_by="c_custkey", num_buckets=32, database=db,
        )
        write_bucketed(
            orders.repartition(32, "o_custkey"), "orders_b",
            bucket_by="o_custkey", num_buckets=32, database=db,
        )
        t_bucket = time.perf_counter() - t0
        t0 = time.perf_counter()
        write_bucketed(
            customer.repartition(32, "c_custkey"), "customer_bs",
            bucket_by="c_custkey", num_buckets=32,
            sort_by="c_custkey", database=db,
        )
        write_bucketed(
            orders.repartition(32, "o_custkey"), "orders_bs",
            bucket_by="o_custkey", num_buckets=32,
            sort_by=("o_custkey", "o_orderdate", "o_orderkey"), database=db,
        )
        t_sorted = time.perf_counter() - t0
        print(
            f"artifact builds: bucketed {t_bucket:.2f}s,"
            f" bucketed+sorted {t_sorted:.2f}s",
            flush=True,
        )

        # Since the r13 adoption the 5 PREMEASURED queries read through
        # relational._custkey_tables (the registered bucketed artifact),
        # so each arm rebinds BOTH hooks: _custkey_tables routes the 5
        # adopted queries, load_table routes order_price_lag_lead (the
        # still-plain 6th member) and the pass-through dims.
        real_custkey_tables = relational._custkey_tables

        def hooked(suffix: str):
            def hook(s, d, t):
                if t == "customer":
                    return s.table(f"{db}.customer_{suffix}")
                if t == "orders":
                    return s.table(f"{db}.orders_{suffix}")
                return real_load_table(s, d, t)
            return hook

        def ck_plain(s, d):
            return real_load_table(s, d, "customer"), real_load_table(
                s, d, "orders"
            )

        def ck_hooked(suffix: str):
            def hook(s, d):
                return (
                    s.table(f"{db}.customer_{suffix}"),
                    s.table(f"{db}.orders_{suffix}"),
                )
            return hook

        arms = {
            "plain": (real_load_table, ck_plain, None),
            "bucketed": (hooked("b"), ck_hooked("b"), None),
            "sorted": (hooked("bs"), ck_hooked("bs"), None),
            "sorted+conf": (hooked("bs"), ck_hooked("bs"), "true"),
        }
        order = list(arms)

        def family_sweep(hook, ck_hook, conf_val) -> dict[str, float]:
            relational.load_table = hook
            relational._custkey_tables = ck_hook
            prior = spark.conf.get(ORDERING_CONF, None)
            try:
                if conf_val is not None:
                    spark.conf.set(ORDERING_CONF, conf_val)
                return {
                    n: bench.run_query(qmap[n], spark, sf_dir)
                    for n in FAMILY
                }
            finally:
                relational.load_table = real_load_table
                relational._custkey_tables = real_custkey_tables
                if prior is None:
                    spark.conf.unset(ORDERING_CONF)
                else:
                    spark.conf.set(ORDERING_CONF, prior)

        for tag in order:
            hook, ck_hook, conf_val = arms[tag]
            relational.load_table = hook
            relational._custkey_tables = ck_hook
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
                    print(
                        f"plan {tag} {n}: sorts={plan.count('Sort [')}"
                        f" exchanges={plan.count('Exchange')}",
                        flush=True,
                    )
                    spark.catalog.clearCache()
            finally:
                relational.load_table = real_load_table
                relational._custkey_tables = real_custkey_tables
                if prior is None:
                    spark.conf.unset(ORDERING_CONF)
                else:
                    spark.conf.set(ORDERING_CONF, prior)

        for _ in range(WARM_ROUNDS):
            for tag in order:
                family_sweep(*arms[tag])

        reps: dict[str, list[dict[str, float]]] = {tag: [] for tag in arms}
        for r in range(TIMED_ROUNDS):
            rotated = order[r % len(order):] + order[:r % len(order)]
            for tag in rotated:
                reps[tag].append(family_sweep(*arms[tag]))

        totals, totals5 = {}, {}
        for tag in order:
            per_q = {
                n: statistics.median([r[n] for r in reps[tag]])
                for n in FAMILY
            }
            for n in FAMILY:
                print(f"  {tag} {n}: median {per_q[n]:.3f}s", flush=True)
            totals[tag] = sum(per_q.values())
            totals5[tag] = sum(per_q[n] for n in PREMEASURED)
            sweep_totals = [sum(r.values()) for r in reps[tag]]
            print(
                f"{tag} family total {totals[tag]:.3f}s"
                f" (5-query subtotal {totals5[tag]:.3f}s; sweep totals"
                f" {[round(x, 2) for x in sweep_totals]})",
                flush=True,
            )
        p, p5 = totals["plain"], totals5["plain"]
        print(
            f"RESULT plain {p:.3f}s | bucketed {totals['bucketed']:.3f}s"
            f" ({p / totals['bucketed']:.2f}x) | sorted"
            f" {totals['sorted']:.3f}s ({p / totals['sorted']:.2f}x) |"
            f" sorted+conf {totals['sorted+conf']:.3f}s"
            f" ({p / totals['sorted+conf']:.2f}x)"
            f" || 5-query comparable: plain {p5:.3f}s, bucketed"
            f" {totals5['bucketed']:.3f}s"
            f" ({p5 / totals5['bucketed']:.2f}x)"
            f" (builds {t_bucket:.2f}/{t_sorted:.2f}s)",
            flush=True,
        )
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        spark.stop()


if __name__ == "__main__":
    main()
