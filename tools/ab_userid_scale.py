"""Validate the queued user_id bucketing adoption at 160x-640x volume
with the real registered queries — and test the sorted-layout regime
claim where in-task window sorts actually dominate.

The rotated gate-scale probe (`ab_userid_sorted.py`, SCALE.md
"Rotated-arm re-measure") measured the 8-query user_id family at
1.46-1.60x bucketed and found sortBy+conf worth nothing at 100k rows
because per-user partitions are ~67 rows — in-task sorts cost
milliseconds. This probe scales the events table along BOTH axes that
grow at 100 TB, because they stress different terms:

- ``wide`` shape: user count scales, ~67 events/user held (the
  fixture's density). Window partition COUNT grows; per-partition
  sorts stay trivial. This is the co-location term the r13 adoption
  rests on — the analogue of the orderkey family's 16M/64M
  validation.
- ``skew`` shape: the wide distribution plus one hot user holding
  ~10% of ALL rows — the hazard case for bucketed layouts: a bucketed
  scan is one task per bucket and cannot be split by AQE, so the hot
  key's bucket becomes the straggler, while the plain arm's exchanges
  can at least balance the uniform keys around the (equally
  unsplittable, for windows/aggs) hot key and AQE skew-join splitting
  remains available to its joins.
- ``deep`` shape: 1500 users held, events-per-user scales (~10.7k at
  16M rows). Window partition SIZE grows; the per-user in-task sort
  becomes real work. This is the regime where the rotated probe's
  finding #2 predicts the sorted layout (+ the legacy
  output-ordering conf, elidable only for exactly-matching keys)
  starts to matter — measured here rather than asserted. Note the
  family's windows tie-break outside (user_id, ts), so even here the
  conf cannot elide; the deep arm measures the LAYOUT term (adaptive
  sort over pre-sorted runs) at a volume where the sort is the work.

Synthetic events are deterministic functions of ``spark.range`` ids
shaped like the fixture (5 event types uniform, value in [0,250), ts
spread over Jan 2024, 32-char props pad); orders stays the sf0.1
fixture (the as-of/attribution queries join it on user_id — at wide
scale most users have no orders, which only shrinks the probe side of
those joins and is shape-realistic for an events firehose next to a
small transactional table).

Arms per (size, shape), ROTATED within-round order, medians of 4:

- ``plain``: 32 plain parquet files, repartitioned by user_id at
  write (the fair multi-file control per the corrected orderkey
  decomposition — single-file fixtures under-read scan parallelism);
- ``bucketed``: 32 buckets by user_id, unsorted (the r13 candidate);
- ``sorted+conf`` (deep shape only): 32 buckets sortBy(user_id, ts),
  one file per bucket, legacy output-ordering conf ON for the sweep.

64M needs SPARK_DRIVER_MEMORY=32g (the r12 orderkey validation's GC
finding at the default 8g heap applies here too).

Usage::

    SPARK_DRIVER_MEMORY=32g python tools/ab_userid_scale.py [spec ...]

where each spec is ``<rows>:<shape>[:<buckets>]`` (default:
``16000000:wide 16000000:deep 64000000:wide``; buckets default 32).
The buckets field exists to test the bucket-count policy (SCALE.md:
"bucket count must scale with volume") — the deep shape at 32 buckets
pins the scan+window at 32 tasks of ~500k rows each, which is the
`priority_order_counts`-at-64M regression class.
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
    "user_sessions",
    "user_lifetime_totals",
    "events_asof_latest_order",
    "purchase_state_attribution",
    "user_event_islands",
    "user_decayed_value",
    "earliest_event_per_user_type",
    "user_retention_cohorts",
)

# The skew shape sweeps the family WITHOUT purchase_state_attribution
# and times that query separately, once per arm: its SCD interval join
# is equi-on-user_id with a range residual, so its per-key cost is
# purchases(k) x state_intervals(k) — QUADRATIC in the hot key's row
# count in ANY layout (~150 s for a 400k-row hot user at 4M rows,
# measured both plain and bucketed). Folding a ~150 s constant into a
# rotated multi-round sweep would burn an hour to measure noise around
# a number that is about the operator, not the storage layout.
SKEW_SEPARATE = "purchase_state_attribution"

ORDERING_CONF = "spark.sql.legacy.bucketedTableScan.outputOrdering"
EVENT_TYPES = ("signup", "purchase", "view", "click", "error")
FIXTURE_USERS = 1500
FIXTURE_DENSITY = 67  # ~events per user in the sf0.1 fixture
BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC
SPAN_S = 30 * 24 * 3600  # the fixture's ~one-month ts spread
WARM_ROUNDS = 1
TIMED_ROUNDS = 4


def synth_events(spark, n_rows: int, shape: str):
    import pyspark.sql.functions as F

    if shape in ("wide", "skew"):
        n_users = max(FIXTURE_USERS, n_rows // FIXTURE_DENSITY)
    elif shape == "deep":
        n_users = FIXTURE_USERS
    else:
        raise ValueError(f"unknown shape {shape!r} (wide|deep|skew)")
    per_user = max(1, n_rows // n_users)
    step = max(1, SPAN_S // per_user)
    base = spark.range(n_rows)
    uid = (F.col("id") % n_users).alias("user_id")
    if shape == "skew":
        # wide distribution plus one hot key holding ~10% of all rows:
        # the classic hazard for bucketed layouts — the hot key is
        # pinned to ONE bucket task (a bucketed scan cannot be split
        # by AQE), while the plain arm's shuffles can at least balance
        # the other keys around it (windows/aggs must still co-locate
        # the hot key; only AQE skew-JOIN splitting is forfeited)
        uid = (
            F.when(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10)) == 0,
                   F.lit(0))
            .otherwise(F.col("id") % n_users)
            .alias("user_id")
        )
    seq = (F.col("id") / n_users).cast("long")
    # deterministic jitter inside each step keeps ts unique per user
    jitter = F.pmod(F.xxhash64("id"), F.lit(step))
    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH) + seq * step + jitter
    ).cast("timestamp_ntz").alias("ts")
    return base.select(
        F.col("id").alias("event_id"),
        ts,
        uid,
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100000)) / 400.0).alias(
            "value"
        ),
        F.md5(F.col("id").cast("string")).alias("props"),
    )


def main() -> None:
    from news_data_pipeline_spark.queries import query_map
    from news_data_pipeline_spark.queries import streaming_batch
    from news_data_pipeline_spark.session import get_spark
    from news_data_pipeline_spark.sources.writers import write_bucketed

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    specs = sys.argv[1:] or ["16000000:wide", "16000000:deep", "64000000:wide"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_userid_scale")
    qmap = query_map()
    real_load_table = streaming_batch.load_table
    # since the r14 adoption the 8-query family reads events through
    # streaming_batch._userid_events, not load_table — rebind it to the
    # same arm hook so the synthetic tables actually reach the
    # registered query code (and the plain arm stays genuinely plain)
    real_userid_events = streaming_batch._userid_events

    for item in specs:
        parts = item.split(":")
        n_rows = int(parts[0])
        shape = parts[1] if len(parts) > 1 and parts[1] else "wide"
        n_buckets = int(parts[2]) if len(parts) > 2 else 32
        db = f"ab_uscale_{uuid.uuid4().hex[:8]}"
        plain_root = tempfile.mkdtemp(prefix="ab_uscale_plain_")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        try:
            ev = synth_events(spark, n_rows, shape)
            t0 = time.perf_counter()
            ev.repartition(n_buckets, "user_id").write.mode(
                "overwrite"
            ).parquet(f"{plain_root}/events")
            t_plain = time.perf_counter() - t0
            t0 = time.perf_counter()
            write_bucketed(
                ev.repartition(n_buckets, "user_id"), "events_b",
                bucket_by="user_id", num_buckets=n_buckets, database=db,
            )
            t_bucket = time.perf_counter() - t0
            arms = {
                "plain": (
                    lambda s, d, t, _r=plain_root: s.read.parquet(
                        f"{_r}/events"
                    ) if t == "events" else real_load_table(s, d, t),
                    None,
                ),
                "bucketed": (
                    lambda s, d, t: s.table(f"{db}.events_b")
                    if t == "events" else real_load_table(s, d, t),
                    None,
                ),
            }
            t_sorted = 0.0
            if shape in ("wide", "deep"):
                t0 = time.perf_counter()
                write_bucketed(
                    ev.repartition(n_buckets, "user_id"), "events_bs",
                    bucket_by="user_id", num_buckets=n_buckets,
                    sort_by=("user_id", "ts"), database=db,
                )
                t_sorted = time.perf_counter() - t0
                # conf-FREE sorted arm (r13: the sorted layout beats
                # unsorted at gate volume on the rewrite-adopted family
                # — 1.89x/1.64x over two rotated runs — via the
                # physical-layout term alone; this arm answers whether
                # that term survives volume, where bigger in-task sorts
                # could spill). The conf'd elision arm stays deep-only.
                arms["sorted"] = (
                    lambda s, d, t: s.table(f"{db}.events_bs")
                    if t == "events" else real_load_table(s, d, t),
                    None,
                )
            if shape == "deep":
                arms["sorted+conf"] = (
                    lambda s, d, t: s.table(f"{db}.events_bs")
                    if t == "events" else real_load_table(s, d, t),
                    "true",
                )
            print(
                f"[{n_rows}:{shape}:{n_buckets}] builds: plain {t_plain:.1f}s,"
                f" bucketed {t_bucket:.1f}s"
                + (f", sorted {t_sorted:.1f}s" if t_sorted else ""),
                flush=True,
            )

            swept = tuple(
                n for n in FAMILY if shape != "skew" or n != SKEW_SEPARATE
            )

            def family_sweep(hook, conf_val) -> dict[str, float]:
                streaming_batch.load_table = hook
                streaming_batch._userid_events = (
                    lambda s, d: hook(s, d, "events")
                )
                prior = spark.conf.get(ORDERING_CONF, None)
                try:
                    if conf_val is not None:
                        spark.conf.set(ORDERING_CONF, conf_val)
                    return {
                        n: bench.run_query(qmap[n], spark, sf_dir)
                        for n in swept
                    }
                finally:
                    streaming_batch.load_table = real_load_table
                    streaming_batch._userid_events = real_userid_events
                    if prior is None:
                        spark.conf.unset(ORDERING_CONF)
                    else:
                        spark.conf.set(ORDERING_CONF, prior)

            order = list(arms)
            # round count must be a multiple of the arm count or one arm
            # owns the cold first slot more often than the others
            # (BENCH_BASELINE.md trap #6) — the deep shape adds a third
            # arm, so round up rather than keep a flat TIMED_ROUNDS
            timed_rounds = len(order) * -(-TIMED_ROUNDS // len(order))
            for _ in range(WARM_ROUNDS):
                for tag in order:
                    family_sweep(*arms[tag])
            reps = {tag: [] for tag in arms}
            for r in range(timed_rounds):
                rotated = order[r % len(order):] + order[:r % len(order)]
                for tag in rotated:
                    reps[tag].append(family_sweep(*arms[tag]))

            totals = {}
            for tag in order:
                per_q = {
                    n: statistics.median([rr[n] for rr in reps[tag]])
                    for n in swept
                }
                for n in swept:
                    print(
                        f"  [{n_rows}:{shape}:{n_buckets}] {tag} {n}:"
                        f" median {per_q[n]:.3f}s",
                        flush=True,
                    )
                totals[tag] = sum(per_q.values())
                sweep_totals = [sum(rr.values()) for rr in reps[tag]]
                print(
                    f"[{n_rows}:{shape}:{n_buckets}] {tag} family total"
                    f" {totals[tag]:.2f}s (sweeps"
                    f" {[round(x, 1) for x in sweep_totals]})",
                    flush=True,
                )
            line = (
                f"RESULT [{n_rows}:{shape}:{n_buckets}] plain {totals['plain']:.2f}s |"
                f" bucketed {totals['bucketed']:.2f}s"
                f" ({totals['plain'] / totals['bucketed']:.2f}x)"
            )
            if "sorted+conf" in totals:
                line += (
                    f" | sorted+conf {totals['sorted+conf']:.2f}s"
                    f" ({totals['plain'] / totals['sorted+conf']:.2f}x vs"
                    f" plain,"
                    f" {totals['bucketed'] / totals['sorted+conf']:.2f}x vs"
                    f" bucketed)"
                )
            line += f" (builds {t_plain:.1f}/{t_bucket:.1f}"
            line += f"/{t_sorted:.1f}s)" if t_sorted else "s)"
            print(line, flush=True)
            if shape == "skew":
                # the quadratic-hot-key interval join, once per arm
                for tag in order:
                    hook, conf_val = arms[tag]
                    streaming_batch.load_table = hook
                    streaming_batch._userid_events = (
                        lambda s, d: hook(s, d, "events")
                    )
                    try:
                        t = bench.run_query(
                            qmap[SKEW_SEPARATE], spark, sf_dir
                        )
                    finally:
                        streaming_batch.load_table = real_load_table
                        streaming_batch._userid_events = real_userid_events
                    print(
                        f"SEPARATE [{n_rows}:{shape}:{n_buckets}]"
                        f" {SKEW_SEPARATE} {tag}: {t:.1f}s (single run"
                        f" — per-key-quadratic interval join, see"
                        f" SKEW_SEPARATE note)",
                        flush=True,
                    )
        finally:
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
            shutil.rmtree(plain_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
