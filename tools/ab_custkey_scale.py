"""Validate the queued custkey bucketing adoption at 100x-400x volume
with the real registered queries — including the regime where customer
stops being broadcastable and the join itself needs the buckets.

The rotated gate-scale probe (`ab_custkey_family.py`) measured the
custkey family at 1.57x bucketed, but at sf0.1 the customer side
(15k rows) broadcasts, so the gate-scale win is aggregate/semi-join
co-location only — the join exchange was never there to eliminate.
This probe scales orders AND customer together at TPC-H density (~10
orders/customer), so at 16M orders customer is 1.6M rows and at 64M
it is 6.4M rows — far past any broadcast threshold: the
customer⋈orders join goes sort-merge and bucketing removes BOTH
join-side exchanges, the r11 synthetic sweep's regime, now exercised
through the registered queries.

Synthetic tables are deterministic functions of ``spark.range`` ids:
orders(o_orderkey=id, o_custkey=id%n_cust, o_orderdate spread over
1992-1998, o_totalprice in [900, 600k) 2dp) and customer(c_custkey=id,
c_name='Customer#'||id, c_nationkey=id%25); nation passes through to
the sf0.1 fixture. The swept family is the rotated probe's six
(`order_price_lag_lead` included — it windows the same keys).

Arms per size, ROTATED within-round order (round r starts at arm
r mod n_arms), medians of 4, one warm round:

- ``plain``: both tables as n_buckets plain parquet files,
  repartitioned by the key at write (scan-parallelism-controlled);
- ``bucketed``: customer by c_custkey / orders by o_custkey,
  n_buckets buckets (default 32; ``<rows>:<buckets>`` overrides —
  the bucket-count policy applies here exactly as in
  `ab_userid_scale.py`: size buckets by per-bucket bytes).

64M needs SPARK_DRIVER_MEMORY=32g.

Usage::

    SPARK_DRIVER_MEMORY=32g python tools/ab_custkey_scale.py [spec ...]

where each spec is ``<rows>[:<buckets>[:<shape>]]`` with shape
``uniform`` (default) or ``skew`` — every 10th order on custkey 0, the
bucketed layout's adversarial case: a bucketed scan side gives AQE
skew-splitting no shuffle to rebalance, while the plain arm's
sort-merge join is exactly the shape ``adaptive.skewJoin`` splits.
Default specs: ``16000000 64000000:128``.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FAMILY = (
    "top_customers",
    "revenue_per_nation",
    "customers_with_orders",
    "customers_without_orders",
    "customer_running_spend",
    "order_price_lag_lead",
)

ORDERS_PER_CUSTOMER = 10  # TPC-H density
BASE_DAYS = 8035  # 1992-01-01 in days-since-epoch
SPAN_DAYS = 2400  # ~1992-1998, the TPC-H orderdate spread
WARM_ROUNDS = 1
TIMED_ROUNDS = 4


def synth_tables(spark, n_orders: int, shape: str = "uniform"):
    """``uniform``: TPC-H density. ``skew``: every 10th order lands on
    custkey 0 (a 10%-hot key on top of its uniform share — the same
    hot-fraction convention as the user_id skew study), the adversarial
    case for a bucketed layout: the hot key pins to ONE bucket and a
    bucketed scan side offers no shuffle for AQE skew-splitting to
    rebalance, while the plain arm's sort-merge join is exactly the
    shape ``spark.sql.adaptive.skewJoin`` exists to split."""
    import pyspark.sql.functions as F

    if shape not in ("uniform", "skew"):
        raise ValueError(f"shape must be uniform|skew, got {shape!r}")
    n_cust = max(1, n_orders // ORDERS_PER_CUSTOMER)
    custkey = F.col("id") % n_cust
    if shape == "skew":
        custkey = F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(custkey)
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        custkey.alias("o_custkey"),
        F.date_add(
            F.to_date(F.lit("1992-01-01")),
            F.pmod(F.xxhash64("id"), F.lit(SPAN_DAYS)).cast("int"),
        ).alias("o_orderdate"),
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(59910000)) / 100.0
            + 900.0
        ).alias("o_totalprice"),
    )
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias(
            "c_name"
        ),
        (F.col("id") % 25).alias("c_nationkey"),
    )
    return orders, customer


def main() -> None:
    from news_data_pipeline_spark.queries import query_map
    from news_data_pipeline_spark.queries import relational
    from news_data_pipeline_spark.session import get_spark
    from news_data_pipeline_spark.sources.writers import write_bucketed

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    specs = sys.argv[1:] or ["16000000", "64000000:128"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_custkey_scale")
    qmap = query_map()
    real_load_table = relational.load_table

    for item in specs:
        parts = item.split(":")
        n_orders = int(parts[0])
        n_buckets = int(parts[1]) if len(parts) > 1 and parts[1] else 32
        shape = parts[2] if len(parts) > 2 else "uniform"
        db = f"ab_cscale_{uuid.uuid4().hex[:8]}"
        plain_root = tempfile.mkdtemp(prefix="ab_cscale_plain_")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        try:
            orders, customer = synth_tables(spark, n_orders, shape)
            t0 = time.perf_counter()
            orders.repartition(n_buckets, "o_custkey").write.mode(
                "overwrite"
            ).parquet(f"{plain_root}/orders")
            customer.repartition(n_buckets, "c_custkey").write.mode(
                "overwrite"
            ).parquet(f"{plain_root}/customer")
            t_plain = time.perf_counter() - t0
            t0 = time.perf_counter()
            write_bucketed(
                orders.repartition(n_buckets, "o_custkey"), "orders_b",
                bucket_by="o_custkey", num_buckets=n_buckets, database=db,
            )
            write_bucketed(
                customer.repartition(n_buckets, "c_custkey"), "customer_b",
                bucket_by="c_custkey", num_buckets=n_buckets, database=db,
            )
            t_bucket = time.perf_counter() - t0
            print(
                f"[{n_orders}:{n_buckets}:{shape}] builds: plain {t_plain:.1f}s,"
                f" bucketed {t_bucket:.1f}s",
                flush=True,
            )

            def plain_hook(s, d, t, _r=plain_root):
                if t == "orders":
                    return s.read.parquet(f"{_r}/orders")
                if t == "customer":
                    return s.read.parquet(f"{_r}/customer")
                return real_load_table(s, d, t)

            def bucketed_hook(s, d, t, _db=db):
                if t == "orders":
                    return s.table(f"{_db}.orders_b")
                if t == "customer":
                    return s.table(f"{_db}.customer_b")
                return real_load_table(s, d, t)

            arms = {"plain": plain_hook, "bucketed": bucketed_hook}
            order = list(arms)

            # since the r13 adoption the 5-query family reads customer/
            # orders through relational._custkey_tables, not load_table
            # — rebind it to the same arm hook so the synthetic tables
            # actually reach the registered query code
            real_custkey_tables = relational._custkey_tables

            def family_sweep(hook) -> dict[str, float]:
                relational.load_table = hook
                relational._custkey_tables = lambda s, d: (
                    hook(s, d, "customer"), hook(s, d, "orders")
                )
                try:
                    return {
                        n: bench.run_query(qmap[n], spark, sf_dir)
                        for n in FAMILY
                    }
                finally:
                    relational.load_table = real_load_table
                    relational._custkey_tables = real_custkey_tables

            for _ in range(WARM_ROUNDS):
                for tag in order:
                    family_sweep(arms[tag])
            reps = {tag: [] for tag in arms}
            for r in range(TIMED_ROUNDS):
                rotated = order[r % len(order):] + order[:r % len(order)]
                for tag in rotated:
                    reps[tag].append(family_sweep(arms[tag]))

            totals = {}
            for tag in order:
                per_q = {
                    n: statistics.median([rr[n] for rr in reps[tag]])
                    for n in FAMILY
                }
                for n in FAMILY:
                    print(
                        f"  [{n_orders}:{n_buckets}:{shape}] {tag} {n}:"
                        f" median {per_q[n]:.3f}s",
                        flush=True,
                    )
                totals[tag] = sum(per_q.values())
                sweep_totals = [sum(rr.values()) for rr in reps[tag]]
                print(
                    f"[{n_orders}:{n_buckets}:{shape}] {tag} family total"
                    f" {totals[tag]:.2f}s (sweeps"
                    f" {[round(x, 1) for x in sweep_totals]})",
                    flush=True,
                )
            print(
                f"RESULT [{n_orders}:{n_buckets}:{shape}] plain"
                f" {totals['plain']:.2f}s | bucketed"
                f" {totals['bucketed']:.2f}s"
                f" ({totals['plain'] / totals['bucketed']:.2f}x)"
                f" (builds {t_plain:.1f}/{t_bucket:.1f}s)",
                flush=True,
            )
        finally:
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
            shutil.rmtree(plain_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
