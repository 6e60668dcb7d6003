"""Parity pins for the r13-adopted rewrites of the per-key-quadratic
interval-join family (SCALE.md round-12 skew probe, adopted round 13):

- ``purchase_state_attribution`` now routes through
  ``operators.joins.asof_join``; the pre-adoption interval-join form
  lives on as ``tools/ab_psa_asof.py::psa_naive`` (purchases(k) x
  state_intervals(k) pairs per key — ~150-240 s for a 400k-row hot key
  at 4M rows in any storage layout, vs one shuffle + one in-key sort).
- ``view_purchase_interval_join`` now routes through
  ``operators.joins.interval_join_bucketed``; the pre-adoption
  residual-join form lives on as
  ``tools/ab_vpij_bucketed.py::vpij_naive``.

Each probe tool's parity mode checked cell-exact equality at three
fixture SFs, the sf0.01 DuckDB oracle, and synthetic wide/skew shapes;
these tests keep the sf0.001 REGISTERED-vs-NAIVE comparisons plus the
semantic edge cases in unit-test time so the adopted rewrites cannot
silently drift from the interval semantics the oracles state.
"""

from __future__ import annotations

import importlib.util
import os

import pyspark.sql.functions as F

# repo root = parent of tests/ — the pins must work from any checkout
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(fname: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", fname)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ab = _load_tool("ab_psa_asof.py", "ab_psa_asof")
vp = _load_tool("ab_vpij_bucketed.py", "ab_vpij_bucketed")
co = _load_tool("check_oracle.py", "check_oracle")

SF = "/root/testdata/sf0.001"


def test_asof_rewrite_matches_naive_interval_form(spark):
    from news_data_pipeline_spark.queries import query_map

    current = query_map()["purchase_state_attribution"](spark, SF)
    ok, why = ab._compare_frames(co, current, ab.psa_naive(spark, SF))
    assert ok, why


def test_asof_rewrite_tied_and_prehistory_edges(spark, tmp_path, monkeypatch):
    """Hand-built edge fixture: two islands tied on valid_from (only
    the last by event_type owns a non-empty interval), a purchase
    before any state (left-join miss), a purchase exactly AT a
    valid_from (inclusive edge), and a user with purchases only."""
    from news_data_pipeline_spark.queries import query_map, streaming_batch

    rows = [
        # user 1: view and click at the SAME ts (tied valid_from
        # islands), then purchases at and after the tie
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "p"),
        (2, "2024-01-01 00:00:00", 1, "click", 1.0, "p"),
        (3, "2024-01-01 00:00:00", 1, "purchase", 5.0, "p"),  # at the edge
        (4, "2024-01-02 00:00:00", 1, "purchase", 5.0, "p"),
        # user 2: purchase BEFORE any state, then a state, then another
        (5, "2024-01-01 00:00:00", 2, "purchase", 5.0, "p"),
        (6, "2024-01-02 00:00:00", 2, "error", 1.0, "p"),
        (7, "2024-01-03 00:00:00", 2, "purchase", 5.0, "p"),
        # user 3: purchases only — no islands at all
        (8, "2024-01-01 00:00:00", 3, "purchase", 5.0, "p"),
    ]
    ev = spark.createDataFrame(
        [
            (i, ts, u, t, v, pr)
            for (i, ts, u, t, v, pr) in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    path = str(tmp_path / "events")
    ev.write.parquet(path)
    real = streaming_batch.load_table
    monkeypatch.setattr(
        streaming_batch,
        "load_table",
        lambda s, d, t: s.read.parquet(path)
        if t == "events"
        else real(s, d, t),
    )
    # r14 adoption: the registered query reads events through
    # _userid_events — rebind it too, or the rewrite arm reads the REAL
    # fixture (and bucket-writes the synthetic rows under the real
    # sf_dir's fingerprint key) while the naive arm reads the synthetic
    monkeypatch.setattr(
        streaming_batch,
        "_userid_events",
        lambda s, d: streaming_batch.load_table(s, d, "events"),
    )
    naive = ab.psa_naive(spark, SF)
    rewrite = query_map()["purchase_state_attribution"](spark, SF)
    ok, why = ab._compare_frames(co, naive, rewrite)
    assert ok, why
    got = {
        (r.event_id, r.state_type)
        for r in rewrite.collect()
    }
    # the tied-island edge: at ts == the tie, the LAST island by
    # (valid_from, event_type) — 'view' — owns the non-empty interval
    assert got == {
        (3, "view"),
        (4, "view"),
        (5, None),  # pre-history purchase survives with no state
        (7, "error"),
        (8, None),  # user with no non-purchase activity at all
    }


def test_vpij_bucketed_matches_naive_residual_form(spark):
    from news_data_pipeline_spark.queries import query_map

    current = query_map()["view_purchase_interval_join"](spark, SF)
    ok, why = ab._compare_frames(co, current, vp.vpij_naive(spark, SF))
    assert ok, why


def test_vpij_bucketed_window_and_bucket_edges(spark, tmp_path, monkeypatch):
    """Purchases at exactly ±15 min match (inclusive edges), ±15min+1s
    do not, and pairs whose buckets differ by one (the neighbor-explode
    case) are kept — including when the view itself sits on an epoch
    boundary."""
    from news_data_pipeline_spark.queries import query_map, streaming_batch

    base = 1704067200  # divisible by 900: the view sits ON a boundary
    rows = [
        (0, base, 1, "view"),
        (1, base - 900, 1, "purchase"),
        (2, base + 900, 1, "purchase"),
        (3, base - 901, 1, "purchase"),
        (4, base + 901, 1, "purchase"),
        (5, base, 1, "purchase"),
        (6, base + 450, 2, "view"),
        (7, base + 1350, 2, "purchase"),  # +900 across a bucket boundary
        (8, base - 450, 2, "purchase"),  # -900 across a bucket boundary
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, float(i), "p") for (i, ts, u, t) in rows],
        "event_id long, ts_l long, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("ts_l")).cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    path = str(tmp_path / "events")
    ev.write.parquet(path)
    real = streaming_batch.load_table
    monkeypatch.setattr(
        streaming_batch,
        "load_table",
        lambda s, d, t: s.read.parquet(path)
        if t == "events"
        else real(s, d, t),
    )
    naive = vp.vpij_naive(spark, SF)
    rewrite = query_map()["view_purchase_interval_join"](spark, SF)
    ok, why = ab._compare_frames(co, naive, rewrite)
    assert ok, why
    got = {(r.view_id, r.purchase_id) for r in rewrite.collect()}
    assert got == {(0, 1), (0, 2), (0, 5), (6, 7), (6, 8)}
