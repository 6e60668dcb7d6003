"""A/B: does the clustered / z-ordered layout lever buy selective
scans enough to register a clustered-scan family in r15?

Context (r14): the repeat-join layout campaign is CLOSED — orderkey
(r12), custkey (r13) and user_id (r14) exhausted the families that pay
a repeated fact-scale exchange. The next storage lever on the books is
scan SELECTIVITY: ``sources.writers.write_clustered`` (range-cluster =
disjoint per-file/row-group min-max footer stats) and
``functions.zorder.morton_key`` (2-D clustering). A registry census
found NO registered query with a selective range predicate over events
(all filters are null-guards or low-cardinality event_type equality),
so unlike the join campaign this lever has no adoption target yet —
this probe decides whether r15 should REGISTER a small selective-scan
family reading through a clustered artifact, or close the lever as
registry-irrelevant.

The honest baseline matters here: realistic ingest is roughly
TIME-ordered (events arrive in arrival order; the synth generator's ts
likewise ascends with id), so a time-slice over the "natural" layout
already prunes well — the dimension with no natural clustering is
``value``. The matrix this probe measures:

  layouts: natural        (time-ordered ingest, the fair control)
           clust_value    (write_clustered by value — 1-D re-cluster)
           zorder         (write_clustered by morton_key(ts, value))
  probes:  ts_slice       (6-hour window, ~0.8% of a 30-day span)
           value_band     (value in [200, 210), ~4%)
           ts_and_value   (1-day window AND the band, ~0.13%)

Expected shape if the lever works: clust_value wins value_band but
CEDES the natural layout's ts_slice pruning; zorder holds both within
a small factor of each 1-D winner — that rectangle-bounding property
is the whole point of the Morton key and the reason Delta/Iceberg
ship ZORDER BY.

Mechanism census BEFORE timing (BENCH_BASELINE.md discipline — claims
live in footers/plans, not wall-clock): for every (layout, probe) cell
the tool counts, via pyarrow parquet footers, how many row groups'
min-max stats OVERLAP the predicate — the skipping bound an engine can
achieve on that layout — and prints Spark's PushedFilters presence so
row-group pruning is actually reachable. Timing then follows the
standing protocol: every arm warmed, within-round arm order ROTATED
(round r starts at arm r mod n_arms), medians over >= 2 x n_arms
rounds, per-cell AND per-layout totals reported.

Usage::

    python tools/ab_zorder_scan.py [n_rows] [n_files]
    # defaults 16_000_000 rows, 64 files
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WARM_ROUNDS = 1
TIMED_ROUNDS = 6  # a multiple of the 3 arms: every arm sees every slot

# probe predicates over the synth generator's 30-day / [0, 250) ranges
TS_LO = "2024-01-10 00:00:00"
TS_HI = "2024-01-10 06:00:00"
DAY_LO = "2024-01-20 00:00:00"
DAY_HI = "2024-01-21 00:00:00"
VAL_LO, VAL_HI = 200.0, 210.0


def _load(fname: str, modname: str):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(ROOT, "tools", fname)
        if not fname.endswith("bench.py")
        else os.path.join(ROOT, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def rowgroup_overlap(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) row groups whose [min, max] stats intersect
    [lo, hi] for ``column`` across every parquet file under ``path`` —
    the lower bound on what footer-stats skipping can prune."""
    import pyarrow.parquet as pq

    overlapping = total = 0
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        ci = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == column
        )
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                overlapping += 1  # no stats = unprunable
            elif not (st.max < lo or st.min > hi):
                overlapping += 1
    return overlapping, total


def main() -> None:
    import pyspark.sql.functions as F

    from news_data_pipeline_spark.functions.zorder import (
        morton_key,
        quantize,
    )
    from news_data_pipeline_spark.session import get_spark
    from news_data_pipeline_spark.sources.writers import write_clustered

    scale = _load("ab_userid_scale.py", "ab_userid_scale")

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("ab_zorder_scan")
    root = tempfile.mkdtemp(prefix="ab_zorder_")
    try:
        ev = scale.synth_events(spark, n_rows, "wide")

        t0 = time.perf_counter()
        # natural = time-ordered ingest: range-partition on event_id
        # (the arrival sequence; ts ascends with it) so every file is a
        # contiguous time run — what a streaming sink would have left
        ev.repartitionByRange(n_files, "event_id").write.mode(
            "overwrite"
        ).parquet(f"{root}/natural")
        t_nat = time.perf_counter() - t0

        t0 = time.perf_counter()
        write_clustered(
            ev, f"{root}/clust_value", cluster_by="value",
            num_files=n_files,
        )
        t_val = time.perf_counter() - t0

        t0 = time.perf_counter()
        # 16-bit quantization over the generator's exact ranges; the
        # epoch-seconds cast keeps the key codegen'd integer arithmetic
        zk = morton_key(
            quantize(
                F.col("ts").cast("timestamp").cast("long"),
                lo=float(scale.BASE_EPOCH),
                hi=float(scale.BASE_EPOCH + scale.SPAN_S),
            ),
            quantize(F.col("value"), lo=0.0, hi=250.0),
        )
        write_clustered(
            ev.withColumn("__zk", zk), f"{root}/zorder", cluster_by="__zk",
            num_files=n_files,
        )
        t_zk = time.perf_counter() - t0
        print(
            f"builds [{n_rows} rows, {n_files} files]: natural"
            f" {t_nat:.1f}s, clust_value {t_val:.1f}s, zorder {t_zk:.1f}s",
            flush=True,
        )

        def probes(df):
            ts = F.col("ts")
            return {
                "ts_slice": df.where(
                    ts >= F.lit(TS_LO).cast("timestamp_ntz")
                ).where(ts < F.lit(TS_HI).cast("timestamp_ntz")),
                "value_band": df.where(
                    (F.col("value") >= VAL_LO) & (F.col("value") < VAL_HI)
                ),
                "ts_and_value": df.where(
                    (ts >= F.lit(DAY_LO).cast("timestamp_ntz"))
                    & (ts < F.lit(DAY_HI).cast("timestamp_ntz"))
                    & (F.col("value") >= VAL_LO)
                    & (F.col("value") < VAL_HI)
                ),
            }

        arms = ("natural", "clust_value", "zorder")

        # ---- mechanism census: row-group stats overlap + pushdown ----
        import datetime as dt

        ts_bounds = {
            "ts_slice": (
                dt.datetime.fromisoformat(TS_LO),
                dt.datetime.fromisoformat(TS_HI),
            ),
            "ts_and_value": (
                dt.datetime.fromisoformat(DAY_LO),
                dt.datetime.fromisoformat(DAY_HI),
            ),
        }
        for arm in arms:
            path = f"{root}/{arm}"
            for probe in ("ts_slice", "value_band", "ts_and_value"):
                cells = []
                if probe in ts_bounds:
                    lo, hi = ts_bounds[probe]
                    cells.append(rowgroup_overlap(path, "ts", lo, hi))
                if probe != "ts_slice":
                    cells.append(
                        rowgroup_overlap(path, "value", VAL_LO, VAL_HI)
                    )
                # a row group survives only if EVERY predicate column
                # overlaps — take the min over per-column overlap counts
                # as the (optimistic) engine-reachable bound
                ov = min(c[0] for c in cells)
                tot = cells[0][1]
                print(
                    f"census {arm:11s} {probe:12s}:"
                    f" {ov}/{tot} row groups overlap",
                    flush=True,
                )
        # pushdown reachability: PushedFilters must be non-empty
        df0 = spark.read.parquet(f"{root}/natural")
        plan = (
            probes(df0)["ts_and_value"]
            ._jdf.queryExecution().executedPlan().toString()
        )
        print(
            "PushedFilters present:", "PushedFilters: [" in plan
            and "PushedFilters: []" not in plan,
            flush=True,
        )

        # ---- rotated timing ----
        def sweep(arm: str) -> dict[str, float]:
            df = spark.read.parquet(f"{root}/{arm}")
            out = {}
            for probe, frame in probes(df).items():
                agg = frame.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("sv"),
                )
                t0 = time.perf_counter()
                agg.write.format("noop").mode("overwrite").save()
                out[probe] = time.perf_counter() - t0
            return out

        for _ in range(WARM_ROUNDS):
            for arm in arms:
                sweep(arm)
        reps: dict[str, list[dict[str, float]]] = {a: [] for a in arms}
        for r in range(TIMED_ROUNDS):
            rotated = arms[r % len(arms):] + arms[: r % len(arms)]
            for arm in rotated:
                reps[arm].append(sweep(arm))

        med = {
            arm: {
                p: statistics.median([r[p] for r in reps[arm]])
                for p in reps[arm][0]
            }
            for arm in arms
        }
        for arm in arms:
            cells = " ".join(
                f"{p}={med[arm][p]:.3f}s" for p in med[arm]
            )
            print(
                f"RESULT {arm:11s}: total"
                f" {sum(med[arm].values()):.3f}s | {cells}",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
