"""Parity pin for the r13 adoption candidate: the linear as-of rewrite
of ``purchase_state_attribution`` (tools/ab_psa_asof.py::psa_asof).

The registered query's final interval join is per-key-quadratic
(SCALE.md round-12 skew probe: purchases(k) x state_intervals(k) pairs
— ~150-240 s for a 400k-row hot key at 4M rows in any storage
layout); the candidate replaces it with ``operators.joins.asof_join``
(one shuffle + one in-key sort). The probe tool's parity mode checked
cell-exact equality at three fixture SFs, the sf0.01 DuckDB oracle,
and synthetic wide/skew shapes; this test keeps the sf0.001 fixture
comparison plus a tied-valid_from island edge case in unit-test time
so the equivalence cannot silently rot before the r13 adoption edits
the registered query.
"""

from __future__ import annotations

import importlib.util

import pyspark.sql.functions as F

spec = importlib.util.spec_from_file_location(
    "ab_psa_asof", "/root/repo/tools/ab_psa_asof.py"
)
ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab)

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
