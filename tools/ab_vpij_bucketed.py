"""A/B a time-bucketed rewrite of ``view_purchase_interval_join``
against its residual-join form — the second member of the per-key-
quadratic hazard family the round-12 skew probe isolated (SCALE.md
"Skew probe"; the first member, ``purchase_state_attribution``, has a
linear as-of rewrite proven in tools/ab_psa_asof.py).

The registered query (``queries/streaming_batch.py:481``) is an
equi-join on user_id with a ±15-minute residual: Spark's sort-merge
join materializes views(k) x purchases(k) candidate pairs per user
before the residual filters, so a hot key pays quadratically in ANY
storage layout (a 400k-row user: ~6.4e9 candidates for ~4M true
pairs). The rewrite is the ``range_join`` trick on the TIME axis
(``operators/joins.py:261`` applies it to value bands): bucket both
sides into 15-minute epochs, explode the view side into its bucket
and both neighbors, equi-join on (user_id, bucket), then apply the
same residual. Why the multiset is identical:

- any pair with ``|purchase_ts - view_ts| <= 15 min`` has bucket
  distance <= 1 (bucket width == window width; integer-second floors
  cannot add a second bucket of drift for an in-window pair), so it
  survives exactly one exploded copy — the one equal to the
  purchase's own bucket. No dedup step needed.
- any pair surviving the residual is in-window by construction; the
  explode adds only candidates, never results.

Per-key cost falls from views(k) x purchases(k) to the sum over
epochs of 3 x views(k,epoch) x purchases(k,epoch) — linear in rows
for time-spread activity (the 100-TB shape: even a pathological key's
events spread across the time axis), and bounded by 3x the true
output in the worst case of fully co-bucketed activity.

The candidate deliberately gives up the registered query's
shared-code path with ``streaming.ops.interval_join_streams`` (the
batch-twin discipline): in streaming mode the two-sided time bound is
what keeps join state evictable, and THAT form must stay; this is a
batch-plan alternative for hot-key corpora, measured here so round 13
can adopt (or decline) with numbers.

Modes::

    python tools/ab_vpij_bucketed.py parity
    SPARK_DRIVER_MEMORY=16g python tools/ab_vpij_bucketed.py timing [spec ...]

Spec format and measurement protocol identical to tools/ab_psa_asof.py
(rotated arms, warm round, medians; plan census first).
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import threading

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERY = "view_purchase_interval_join"
WARM_ROUNDS = 1


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def vpij_naive(spark, sf_dir: str):
    """The equi-join-with-time-residual form of
    ``view_purchase_interval_join`` — the registered implementation
    BEFORE the r13 adoption (batch execution of
    ``streaming.ops.interval_join_streams``), kept verbatim so the
    probe's naive-vs-rewrite comparison and the parity pins in
    tests/test_psa_asof_candidate.py survive the adoption. Per-key cost
    is views(k) x purchases(k) candidates before the residual filters."""
    import pyspark.sql.functions as F

    from news_data_pipeline_spark.queries import streaming_batch
    from news_data_pipeline_spark.streaming.ops import interval_join_streams

    events = streaming_batch.load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("l_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    out = interval_join_streams(
        views, purchases, on="user_id", left_ts="l_ts", right_ts="r_ts",
        within="15 minutes", watermark="1 hour",
    )
    return out.select(
        "view_id",
        "purchase_id",
        "user_id",
        F.col("l_ts").alias("view_ts"),
        F.col("r_ts").alias("purchase_ts"),
        "purchase_value",
    )


def vpij_bucketed(spark, sf_dir: str):
    """Time-bucketed rewrite via ``operators.joins.interval_join_bucketed``
    (the operator this probe's campaign promoted into the library):
    identical output multiset, candidate set bounded per (user, 15-min
    epoch) instead of per user."""
    import pyspark.sql.functions as F

    from news_data_pipeline_spark.operators.joins import (
        interval_join_bucketed,
    )
    from news_data_pipeline_spark.queries import streaming_batch

    events = streaming_batch.load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    out = interval_join_bucketed(
        views,
        purchases,
        on="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        within="15 minutes",
    )
    return out.select(
        "view_id",
        "purchase_id",
        "user_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


def run_parity(spark, co, qmap, oracle) -> bool:
    import pyspark.sql.functions as F

    from news_data_pipeline_spark.queries import streaming_batch

    ab_psa = _load("tools/ab_psa_asof.py", "ab_psa_asof")
    scale = _load("tools/ab_userid_scale.py", "ab_userid_scale")
    # since the r13 adoption the registered query IS the bucketed
    # rewrite; the naive residual-join twin keeps this two-form
    current = vpij_naive
    assert qmap[QUERY]  # the registered query must still exist
    failed = False

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        ok, why = ab_psa._compare_frames(
            co, current(spark, sf_dir), vpij_bucketed(spark, sf_dir)
        )
        print(f"parity {sf_dir}: {'ok' if ok else 'FAIL ' + why}", flush=True)
        failed |= not ok

    duck_local = threading.local()
    line, bad, _ = co.check_one(
        spark, duck_local, "/root/testdata/sf0.01", f"{QUERY}[bucketed]",
        vpij_bucketed, oracle,
    )
    print(f"oracle sf0.01: {line}", flush=True)
    failed |= bad

    # synthetic shapes plus a bucket-EDGE fixture: pairs exactly at the
    # ±15-minute boundary and exactly at epoch boundaries, where an
    # off-by-one in the neighbor explode would drop rows
    real_load_table = streaming_batch.load_table
    for shape in ("wide", "skew"):
        root = tempfile.mkdtemp(prefix="ab_vpij_parity_")
        try:
            scale.synth_events(spark, 200_000, shape).write.mode(
                "overwrite"
            ).parquet(f"{root}/events")
            streaming_batch.load_table = (
                lambda s, d, t, _r=root: s.read.parquet(f"{_r}/events")
                if t == "events"
                else real_load_table(s, d, t)
            )
            try:
                ok, why = ab_psa._compare_frames(
                    co,
                    current(spark, "/root/testdata/sf0.1"),
                    vpij_bucketed(spark, "/root/testdata/sf0.1"),
                )
            finally:
                streaming_batch.load_table = real_load_table
            print(
                f"parity synth 200k {shape}: {'ok' if ok else 'FAIL ' + why}",
                flush=True,
            )
            failed |= not ok
        finally:
            shutil.rmtree(root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix="ab_vpij_edge_")
    try:
        base = 1704067200  # epoch-divisible by 900: bucket boundary
        rows = []
        # views pinned at a bucket boundary; purchases at exactly ±900s
        # (inclusive edges, bucket distance 1), ±901s (just outside),
        # and same-second (bucket distance 0)
        for i, (u, off, typ) in enumerate(
            [
                (1, 0, "view"),
                (1, -900, "purchase"),
                (1, 900, "purchase"),
                (1, -901, "purchase"),
                (1, 901, "purchase"),
                (1, 0, "purchase"),
                (2, 450, "view"),
                (2, 1350, "purchase"),  # +900 across a boundary
                (2, -450, "purchase"),  # -900 across a boundary
            ]
        ):
            rows.append((i, base + off, u, typ, float(i), "p"))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts_l long, user_id long, event_type string,"
            " value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds(F.col("ts_l"))
            .cast("timestamp_ntz")
            .alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        ev.write.parquet(f"{root}/events")
        streaming_batch.load_table = (
            lambda s, d, t, _r=root: s.read.parquet(f"{_r}/events")
            if t == "events"
            else real_load_table(s, d, t)
        )
        try:
            cur = current(spark, "/root/testdata/sf0.1")
            new = vpij_bucketed(spark, "/root/testdata/sf0.1")
            ok, why = ab_psa._compare_frames(co, cur, new)
            n_pairs = new.count()
        finally:
            streaming_batch.load_table = real_load_table
        # user 1: purchases at -900/0/+900 match, ±901 do not; user 2:
        # both boundary-crossing ±900 purchases match
        expect = 5
        edge_ok = ok and n_pairs == expect
        print(
            f"parity bucket-edge fixture: "
            f"{'ok' if edge_ok else f'FAIL {why} pairs={n_pairs}'}",
            flush=True,
        )
        failed |= not edge_ok
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return not failed


def run_timing(spark, qmap, specs: list[str]) -> None:
    from news_data_pipeline_spark.queries import streaming_batch

    scale = _load("tools/ab_userid_scale.py", "ab_userid_scale")
    bench = _load("bench.py", "bench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # "naive" = the pre-r13 residual-join form; the registered query
    # (qmap[QUERY]) is the bucketed rewrite since the r13 adoption
    arms = {"naive": vpij_naive, "bucketed": qmap[QUERY]}
    real_load_table = streaming_batch.load_table

    for item in specs:
        parts = item.split(":")
        n_rows = int(parts[0])
        shape = parts[1] if len(parts) > 1 and parts[1] else "wide"
        timed_rounds = int(parts[2]) if len(parts) > 2 else 4
        root = tempfile.mkdtemp(prefix="ab_vpij_")
        try:
            ev = scale.synth_events(spark, n_rows, shape)
            ev.repartition(32, "user_id").write.mode("overwrite").parquet(
                f"{root}/events"
            )
            streaming_batch.load_table = (
                lambda s, d, t, _r=root: s.read.parquet(f"{_r}/events")
                if t == "events"
                else real_load_table(s, d, t)
            )
            try:
                for tag, fn in arms.items():
                    frame = fn(spark, sf_dir)
                    frame.write.format("noop").mode("overwrite").save()
                    plan = (
                        frame._jdf.queryExecution().executedPlan().toString()
                    )
                    print(
                        f"plan [{n_rows}:{shape}] {tag}:"
                        f" smj={plan.count('SortMergeJoin')}"
                        f" exchanges={plan.count('Exchange')}"
                        f" generate={plan.count('Generate')}",
                        flush=True,
                    )
                    spark.catalog.clearCache()

                order = list(arms)
                for _ in range(WARM_ROUNDS):
                    for tag in order:
                        bench.run_query(arms[tag], spark, sf_dir)
                reps: dict[str, list[float]] = {tag: [] for tag in arms}
                for r in range(timed_rounds):
                    rotated = order[r % len(order):] + order[: r % len(order)]
                    for tag in rotated:
                        t = bench.run_query(arms[tag], spark, sf_dir)
                        reps[tag].append(t)
                        print(
                            f"  [{n_rows}:{shape}] round {r} {tag}:"
                            f" {t:.2f}s",
                            flush=True,
                        )
                med = {tag: statistics.median(reps[tag]) for tag in arms}
                print(
                    f"RESULT [{n_rows}:{shape}] current {med['current']:.2f}s"
                    f" | bucketed {med['bucketed']:.2f}s"
                    f" ({med['current'] / med['bucketed']:.2f}x)"
                    f" (rounds {timed_rounds}, runs"
                    f" {[round(x, 1) for x in reps['current']]} vs"
                    f" {[round(x, 1) for x in reps['bucketed']]})",
                    flush=True,
                )
            finally:
                streaming_batch.load_table = real_load_table
        finally:
            shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    from news_data_pipeline_spark.queries import oracle_map, query_map
    from news_data_pipeline_spark.session import get_spark

    co = _load("tools/check_oracle.py", "check_oracle")
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    spark = get_spark("ab_vpij_bucketed")
    qmap = query_map()
    try:
        if mode == "parity":
            ok = run_parity(spark, co, qmap, oracle_map()[QUERY])
            print(f"PARITY {'PASS' if ok else 'FAIL'}", flush=True)
            return 0 if ok else 1
        if mode == "timing":
            specs = sys.argv[2:] or [
                "4000000:wide:4",
                "4000000:deep:2",
                "4000000:skew:2",
            ]
            run_timing(spark, qmap, specs)
            return 0
        print(f"unknown mode {mode!r} (parity|timing)")
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
