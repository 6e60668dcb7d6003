"""A/B the linear as-of rewrite of ``purchase_state_attribution``
against its interval-join form — the r13 fix candidate for the
operator's recorded skew envelope (SCALE.md "Skew probe": the SCD
interval join is equi-on-user_id with a range residual, so its
per-key cost is purchases(k) x state_intervals(k) — QUADRATIC in a
hot key's row count in ANY storage layout; ~150-240 s for a 400k-row
hot user at 4M rows vs 0.9 s uniform).

The rewrite replaces the final ``purchases LEFT JOIN scd ON user AND
valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)`` with the
engine's own ``operators.joins.asof_join`` (union both sides, ONE
shuffle by user_id, forward-fill window) — per-key cost drops to one
in-key sort, and the ``lead(valid_from)`` window that materialized
``valid_to`` disappears entirely (the as-of lookup never needs the
interval's right edge).

Equivalence argument (why the outputs are identical, not just close):
half-open SCD2 intervals built by ``lead(valid_from) OVER (ORDER BY
valid_from, event_type)`` partition each user's timeline, so a
purchase at ``ts`` matches exactly the LAST island (in that same
order) with ``valid_from <= ts``:
- any earlier island's ``valid_to`` is a later island's ``valid_from
  <= ts``, failing ``ts < valid_to``;
- islands tied on ``valid_from`` produce empty intervals for all but
  the last tied one (``valid_to == valid_from``), which never match —
  and ``asof_join(right_order=["state_type"])`` picks the same last
  tied island;
- purchases before any island carry NULL — the left join's miss row.
``asof_join`` ties right-before-left at equal timestamps, giving the
inclusive ``valid_from <= ts`` edge. The parity mode below checks
this exactly (full-output multiset compare at three fixture SFs, the
sf0.01 DuckDB oracle, and synthetic wide/skew shapes).

Modes::

    python tools/ab_psa_asof.py parity
    SPARK_DRIVER_MEMORY=16g python tools/ab_psa_asof.py timing [spec ...]

where each timing spec is ``<rows>:<shape>:<timed_rounds>`` (shapes
wide|deep|skew from ab_userid_scale.synth_events; defaults
``4000000:wide:4 4000000:deep:2 4000000:skew:2`` — the quadratic arm
runs minutes per sweep at deep/skew, so those shapes take fewer
rounds; the effect size there is expected in the 10-100x range where
round-to-round noise is irrelevant). Arms run ROTATED within each
round (measurement trap #6), one warm round each, medians reported;
executed-plan join/window/exchange census precedes timing.

Reference parity target: the registered query itself
(``queries/streaming_batch.py:940``), which is driver-green against
its DuckDB oracle — the rewrite must match it cell-for-cell.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERY = "purchase_state_attribution"
WARM_ROUNDS = 1


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def psa_naive(spark, sf_dir: str):
    """The interval-join form of ``purchase_state_attribution`` — the
    registered implementation BEFORE the r13 adoption, kept verbatim so
    the probe's naive-vs-rewrite comparison (and the parity pins in
    tests/test_psa_asof_candidate.py) survive the adoption. This is the
    per-key-quadratic shape: purchases(k) x state_intervals(k) pairs
    per user before the residual filters."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from news_data_pipeline_spark.queries import streaming_batch

    events = streaming_batch.load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    nonp = events.where(F.col("event_type") != "purchase")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    grp = F.row_number().over(w_all) - F.row_number().over(w_type)
    islands = (
        nonp.withColumn("grp", grp)
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("valid_from"))
        .drop("grp")
    )
    w_seq = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    scd = islands.select(
        F.col("user_id").alias("s_user_id"),
        F.col("event_type").alias("state_type"),
        "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
    )
    purchases = events.where(F.col("event_type") == "purchase")
    cond = (
        (purchases.user_id == scd.s_user_id)
        & (scd.valid_from <= purchases.ts)
        & (scd.valid_to.isNull() | (purchases.ts < scd.valid_to))
    )
    return purchases.join(scd, cond, "left").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "state_type",
        F.col("valid_from").alias("state_since"),
    )


def psa_asof(spark, sf_dir: str):
    """Linear rewrite: identical islands construction, then asof_join
    instead of interval join. Output schema and semantics match
    ``purchase_state_attribution`` exactly (see module docstring)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from news_data_pipeline_spark.operators.joins import asof_join
    from news_data_pipeline_spark.queries import streaming_batch

    # read through the module hook so timing arms can swap the table
    events = streaming_batch.load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    nonp = events.where(F.col("event_type") != "purchase")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    grp = F.row_number().over(w_all) - F.row_number().over(w_type)
    islands = (
        nonp.withColumn("grp", grp)
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("valid_from"))
        .drop("grp")
    )
    states = islands.select(
        "user_id",
        F.col("event_type").alias("state_type"),
        F.col("valid_from").alias("state_since"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    out = asof_join(
        purchases,
        states,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="state_since",
        right_cols=["state_type", "state_since"],
        # islands tied on valid_from: the LAST by state_type wins —
        # the only one whose half-open interval is non-empty in the
        # registered form
        right_order=["state_type"],
    )
    return out.select(
        "event_id", "user_id", "purchase_ts", "state_type", "state_since"
    )


def _compare_frames(co, a, b) -> tuple[bool, str]:
    """Exact multiset compare of two Spark frames via the oracle gate's
    canonicalizer (sorted-by-name columns, 6dp float canon)."""
    acols, arows = co.frame_to_multiset(a.toPandas())
    bcols, brows = co.frame_to_multiset(b.toPandas())
    if acols != bcols:
        return False, f"columns {acols} vs {bcols}"
    ok, why, _rescued = co.rows_equal(arows, brows)
    return ok, why


def run_parity(spark, co, qmap, oracle) -> bool:
    from news_data_pipeline_spark.queries import streaming_batch

    scale = _load("tools/ab_userid_scale.py", "ab_userid_scale")
    # since the r13 adoption the registered query IS the as-of rewrite;
    # the naive interval-join twin keeps this a two-form comparison
    current = psa_naive
    assert qmap[QUERY]  # the registered query must still exist
    failed = False

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        ok, why = _compare_frames(
            co, current(spark, sf_dir), psa_asof(spark, sf_dir)
        )
        print(f"parity {sf_dir}: {'ok' if ok else 'FAIL ' + why}", flush=True)
        failed |= not ok

    # the rewrite directly against the registered DuckDB oracle
    duck_local = threading.local()
    line, bad, _ = co.check_one(
        spark, duck_local, "/root/testdata/sf0.01", f"{QUERY}[asof]",
        psa_asof, oracle,
    )
    print(f"oracle sf0.01: {line}", flush=True)
    failed |= bad

    # synthetic shapes at small scale: wide (uniform) and skew (10%-hot
    # key, 200k rows keeps the quadratic arm to seconds) — the regime
    # the rewrite exists for must be parity-checked, not only timed
    real_load_table = streaming_batch.load_table
    # since the r14 adoption the registered query reads events through
    # streaming_batch._userid_events — rebind it alongside load_table,
    # or the artifact builder would bucket-write the SYNTHETIC events
    # under the real sf_dir's fingerprint key (cache poisoning)
    real_userid_events = streaming_batch._userid_events
    for shape in ("wide", "skew"):
        root = tempfile.mkdtemp(prefix="ab_psa_parity_")
        try:
            scale.synth_events(spark, 200_000, shape).write.mode(
                "overwrite"
            ).parquet(f"{root}/events")
            streaming_batch.load_table = (
                lambda s, d, t, _r=root: s.read.parquet(f"{_r}/events")
                if t == "events"
                else real_load_table(s, d, t)
            )
            streaming_batch._userid_events = (
                lambda s, d: streaming_batch.load_table(s, d, "events")
            )
            try:
                ok, why = _compare_frames(
                    co,
                    current(spark, "/root/testdata/sf0.1"),
                    psa_asof(spark, "/root/testdata/sf0.1"),
                )
            finally:
                streaming_batch.load_table = real_load_table
                streaming_batch._userid_events = real_userid_events
            print(
                f"parity synth 200k {shape}: {'ok' if ok else 'FAIL ' + why}",
                flush=True,
            )
            failed |= not ok
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return not failed


def run_timing(spark, qmap, specs: list[str]) -> None:
    from news_data_pipeline_spark.queries import streaming_batch

    scale = _load("tools/ab_userid_scale.py", "ab_userid_scale")
    bench = _load("bench.py", "bench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # "naive" = the pre-r13 interval-join form; the registered query
    # (qmap[QUERY]) is the as-of rewrite since the r13 adoption
    arms = {"naive": psa_naive, "asof": qmap[QUERY]}
    real_load_table = streaming_batch.load_table
    # r14 adoption: rebind _userid_events alongside load_table so the
    # asof arm (the registered query) reads the synthetic events rather
    # than bucket-writing them under the real sf_dir's fingerprint key
    real_userid_events = streaming_batch._userid_events

    for item in specs:
        parts = item.split(":")
        n_rows = int(parts[0])
        shape = parts[1] if len(parts) > 1 and parts[1] else "wide"
        timed_rounds = int(parts[2]) if len(parts) > 2 else 4
        root = tempfile.mkdtemp(prefix="ab_psa_")
        try:
            ev = scale.synth_events(spark, n_rows, shape)
            # same fair multi-file control as the layout probes
            ev.repartition(32, "user_id").write.mode("overwrite").parquet(
                f"{root}/events"
            )
            streaming_batch.load_table = (
                lambda s, d, t, _r=root: s.read.parquet(f"{_r}/events")
                if t == "events"
                else real_load_table(s, d, t)
            )
            streaming_batch._userid_events = (
                lambda s, d: streaming_batch.load_table(s, d, "events")
            )
            try:
                # mechanism census before timing (AQE finalizes the
                # plan only after execution)
                for tag, fn in arms.items():
                    frame = fn(spark, sf_dir)
                    frame.write.format("noop").mode("overwrite").save()
                    plan = (
                        frame._jdf.queryExecution().executedPlan().toString()
                    )
                    print(
                        f"plan [{n_rows}:{shape}] {tag}:"
                        f" smj={plan.count('SortMergeJoin')}"
                        f" window={plan.count('Window')}"
                        f" exchanges={plan.count('Exchange')}",
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
                med = {
                    tag: statistics.median(reps[tag]) for tag in arms
                }
                print(
                    f"RESULT [{n_rows}:{shape}] naive {med['naive']:.2f}s"
                    f" | asof {med['asof']:.2f}s"
                    f" ({med['naive'] / med['asof']:.2f}x)"
                    f" (rounds {timed_rounds}, runs"
                    f" {[round(x, 1) for x in reps['naive']]} vs"
                    f" {[round(x, 1) for x in reps['asof']]})",
                    flush=True,
                )
            finally:
                streaming_batch.load_table = real_load_table
                streaming_batch._userid_events = real_userid_events
        finally:
            shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    from news_data_pipeline_spark.queries import oracle_map, query_map
    from news_data_pipeline_spark.session import get_spark

    co = _load("tools/check_oracle.py", "check_oracle")
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    spark = get_spark("ab_psa_asof")
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
