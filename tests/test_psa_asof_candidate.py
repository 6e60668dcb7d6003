"""Parity pins for the r13 rewrite candidates of the per-key-quadratic
interval-join family (SCALE.md round-12 skew probe):

- ``purchase_state_attribution`` -> linear as-of rewrite
  (tools/ab_psa_asof.py::psa_asof): the final interval join costs
  purchases(k) x state_intervals(k) pairs per key (~150-240 s for a
  400k-row hot key at 4M rows in any storage layout); the candidate
  replaces it with ``operators.joins.asof_join`` (one shuffle + one
  in-key sort).
- ``view_purchase_interval_join`` -> time-bucketed rewrite
  (tools/ab_vpij_bucketed.py::vpij_bucketed): candidates bounded per
  (user, 15-min epoch) instead of per user.

Each probe tool's parity mode checked cell-exact equality at three
fixture SFs, the sf0.01 DuckDB oracle, and synthetic wide/skew shapes;
these tests keep the sf0.001 fixture comparisons plus the semantic
edge cases in unit-test time so the equivalences cannot silently rot
before the r13 adoptions edit the registered queries.
"""

from __future__ import annotations

import importlib.util

import pyspark.sql.functions as F

spec = importlib.util.spec_from_file_location(
    "ab_psa_asof", "/root/repo/tools/ab_psa_asof.py"
)
ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab)

vp_spec = importlib.util.spec_from_file_location(
    "ab_vpij_bucketed", "/root/repo/tools/ab_vpij_bucketed.py"
)
vp = importlib.util.module_from_spec(vp_spec)
vp_spec.loader.exec_module(vp)

co_spec = importlib.util.spec_from_file_location(
    "check_oracle", "/root/repo/tools/check_oracle.py"
)
co = importlib.util.module_from_spec(co_spec)
co_spec.loader.exec_module(co)

SF = "/root/testdata/sf0.001"


def test_asof_rewrite_matches_registered_query(spark):
    from news_data_pipeline_spark.queries import query_map

    current = query_map()["purchase_state_attribution"](spark, SF)
    ok, why = ab._compare_frames(co, current, ab.psa_asof(spark, SF))
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
    current = query_map()["purchase_state_attribution"](spark, SF)
    rewrite = ab.psa_asof(spark, SF)
    ok, why = ab._compare_frames(co, current, rewrite)
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


def test_vpij_bucketed_matches_registered_query(spark):
    from news_data_pipeline_spark.queries import query_map

    current = query_map()["view_purchase_interval_join"](spark, SF)
    ok, why = ab._compare_frames(co, current, vp.vpij_bucketed(spark, SF))
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
    current = query_map()["view_purchase_interval_join"](spark, SF)
    rewrite = vp.vpij_bucketed(spark, SF)
    ok, why = ab._compare_frames(co, current, rewrite)
    assert ok, why
    got = {(r.view_id, r.purchase_id) for r in rewrite.collect()}
    assert got == {(0, 1), (0, 2), (0, 5), (6, 7), (6, 8)}
