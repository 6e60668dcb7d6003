"""Event-time windowing queries over the ``events`` fixture.

These are the batch twins of the Structured Streaming operators in
``news_data_pipeline_spark.streaming`` — Spark's ``window`` /
``session_window`` functions have identical semantics in batch and
streaming, so the oracle validates the semantics here and the streaming
tests (tests/test_streaming.py) validate the readStream/watermark
plumbing against these same results.

The reference has no streaming at all (future work,
``docs/pipeline_overview.md:165``); this is the north-star extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from news_data_pipeline_spark.functions.exact import (
    exact_sum,
    settled_round,
    sql_exact_sum,
)
from news_data_pipeline_spark.queries.registry import register
from news_data_pipeline_spark.sources.catalog import (
    dataset_fingerprint,
    evict_stale_artifacts as _evict_stale,
    load_table,
)


# --- round 14: bucketed-by-user_id events artifact ------------------------
_USERID_DBS: dict = {}
_USERID_NUM_BUCKETS = 32


def _userid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` read from a full-column copy bucketed 32 ways by
    ``user_id`` — the round-14 adoption of the bucketed-join lever for
    the registry's THIRD repeat-join family (eight queries re-window,
    re-join or re-aggregate events on this key per invocation:
    user_sessions, user_lifetime_totals, events_asof_latest_order,
    purchase_state_attribution, user_event_islands, user_decayed_value,
    earliest_event_per_user_type, user_retention_cohorts). Measured
    through the ROTATED interleaved A/B at THREE volumes
    (``tools/ab_userid_sorted.py`` at gate, ``tools/ab_userid_scale.py``
    at 16M/64M — SCALE.md "r14 pre-measure"): family total 1.43-1.60×
    at sf0.1, 1.37× at 16M wide, 1.35× at 64M/128 buckets, build
    2.9-3.7 s at gate amortizing in ~2 family sweeps at every size.
    UNSORTED buckets deliberately: ``sortBy(user_id, ts)`` wins only at
    gate-scale bucket sizes (pre-sorted runs ride the in-task sort's
    no-spill fast path), pays a ~10× write premium at 16M, and INVERTS
    at 64M (slower than unsorted on 6 of 8 members — SCALE.md r13
    "layout wins don't extrapolate"); the legacy bucketed-scan
    output-ordering conf stays rejected on session-coupling grounds
    (r12 finding 3). Bucketing is value-invisible, so every family
    oracle is unchanged; column pruning and filter pushdown still reach
    the bucketed parquet scans. At 100 TB this is the co-located
    layout for every per-user window/aggregate: the pre-window
    exchange of the full events fact disappears on all eight plans."""
    from news_data_pipeline_spark.queries.relational import (
        _bucketed_artifact_db,
    )
    from news_data_pipeline_spark.sources.writers import write_bucketed

    def build(db: str) -> None:
        n = _USERID_NUM_BUCKETS
        write_bucketed(
            load_table(spark, sf_dir, "events").repartition(n, "user_id"),
            "events", bucket_by="user_id", num_buckets=n, database=db,
        )

    db = _bucketed_artifact_db(
        spark, sf_dir,
        memo=_USERID_DBS, prefix="bucketed_uid",
        fingerprint_tables=("events",),
        table_names=("events",),
        build=build,
    )
    return spark.table(f"{db}.events")


@register(
    "tumbling_hourly_counts",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*)                 AS n_events,
           {sql_exact_sum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value sums are exact settled-cents (functions/exact.py) — hourly
    # groups grow with data volume, so round(sum(double)) would
    # eventually flip a half-cent between engines; the streaming twin
    # (streaming/ops.py::tumbling_window_counts) uses the identical units
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type
        FROM events)
    SELECT window_start, event_type, count(*) AS n_events
    FROM assigned GROUP BY 1, 2
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — each event lands in two."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n_events"
        )
    )


@register(
    "user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged)
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL '10 minutes'  AS session_end,
           count(*)                         AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user via ``session_window`` —
    the same operator the streaming module uses with a watermark."""
    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir)
    return (
        events.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "earliest_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def earliest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming ``dropDuplicatesWithinWatermark``-style
    dedup: keep the earliest event per (user, type), deterministically."""
    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "user_lifetime_totals",
    oracle=f"""
    SELECT user_id,
           count(*)                               AS n_events,
           {sql_exact_sum('coalesce(value, 0)')}  AS total_value,
           max(ts)                                AS last_ts
    FROM events GROUP BY user_id
    """,
)
def user_lifetime_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.state.running_user_totals`` — the
    aggregate the applyInPandasWithState operator maintains per key."""
    from news_data_pipeline_spark.streaming.state import batch_user_totals

    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    return batch_user_totals(_userid_events(spark, sf_dir))


# DuckDB twin of functions.zorder.morton_key: OR of per-bit shifts.
def _duck_spread(col: str, bits: int, offset: int) -> str:
    return " | ".join(
        f"((({col} >> {b}) & 1) << {2 * b + offset})" for b in range(bits)
    )


@register(
    "event_zorder_keys",
    oracle=f"""
    WITH d AS (
        SELECT event_id,
               coalesce(user_id, 0) % 256 AS zx,
               greatest(CAST(floor(coalesce(value, 0)) AS BIGINT), 0) % 256 AS zy
        FROM events)
    SELECT event_id, zx, zy,
           ({_duck_spread('zx', 8, 0)}) | ({_duck_spread('zy', 8, 1)}) AS zkey
    FROM d
    """,
)
def event_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key projection (functions.zorder.morton_key): the
    clustering key ``write_clustered`` sorts by for 2-D data skipping —
    pure shift/mask integer arithmetic, codegen'd, bit-exact in SQL."""
    from news_data_pipeline_spark.functions.zorder import morton_key

    events = load_table(spark, sf_dir, "events")
    zx = (F.coalesce(F.col("user_id"), F.lit(0)) % 256).alias("zx")
    zy = (
        F.greatest(
            F.floor(F.coalesce(F.col("value"), F.lit(0.0))).cast("long"),
            F.lit(0).cast("long"),
        )
        % 256
    ).alias("zy")
    d = events.select("event_id", zx, zy)
    return d.select(
        "event_id", "zx", "zy",
        morton_key(F.col("zx"), F.col("zy"), bits=8).alias("zkey"),
    )


def _zorder_events_layer(
    spark: SparkSession, sf_dir: str, *, num_files: int = 8
) -> str:
    """Write events range-clustered on the (ts, value) Morton key into
    a fresh scratch dir and return its path — the layout half of
    ``zorder_rectangle_scan``, split out so tests can census the SAME
    layer's parquet footers the registered query scans. Quantization
    bounds are fixed constants over the fixture's [2024-01-01,
    2024-02-01) x [0, 600) envelope — they shape only the layout,
    never any result (out-of-range rows clamp to the edge buckets and
    merely prune worse)."""
    import tempfile

    from news_data_pipeline_spark.functions.zorder import (
        morton_key,
        quantize,
    )
    from news_data_pipeline_spark.sources.writers import write_clustered

    events = load_table(spark, sf_dir, "events")
    zk = morton_key(
        quantize(
            F.col("ts").cast("timestamp").cast("long"),
            lo=1704067200.0,  # 2024-01-01 00:00:00 UTC
            hi=1706745600.0,  # 2024-02-01 00:00:00 UTC
        ),
        quantize(F.col("value"), lo=0.0, hi=600.0),
    )
    path = tempfile.mkdtemp(prefix="zorder_layer_q_")
    write_clustered(
        events.withColumn("__zk", zk), path, cluster_by="__zk",
        num_files=num_files,
    )
    return path


@register(
    "zorder_rectangle_scan",
    # IDENTICAL result contract to a plain filtered aggregate: the
    # Spark side routes events through a morton-clustered layer on
    # disk and a footer-stat-bounded read; the oracle proves the
    # storage round-trip changes nothing about the answer (clustering
    # is value-invisible). The PRUNING property is pinned separately
    # and mechanically in tests/test_sources.py (pyarrow row-group
    # stats: the rectangle overlaps a bounded minority of row groups
    # in the z-ordered layout vs ALL value-dim groups in a
    # time-ordered one), not by local wall-clock — at fixture volume
    # every byte is page-cached and task scheduling dominates, so
    # bytes-not-read is invisible to timing here and decisive at
    # 100 TB (SCALE.md round 14, "Clustered-scan lever").
    oracle=f"""
    SELECT event_type,
           count(*)                 AS n_events,
           {sql_exact_sum('value')} AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-16 00:00:00'
      AND value >= 100 AND value < 250
    GROUP BY event_type
    """,
)
def zorder_rectangle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D data skipping under the correctness gate: events are WRITTEN
    range-clustered on ``morton_key(quantize(ts), quantize(value))``
    (``write_clustered`` — one interleaved sort at write time, the
    plain-parquet expression of Delta/Iceberg ``ZORDER BY``), then a
    time-slice x value-band rectangle is read BACK off that layout and
    aggregated. Because the morton order bounds every file/row group to
    a small rectangle of the (ts, value) key space, the re-read's
    footer stats prune most of the layer on BOTH dimensions — where a
    time-ordered ingest layout can prune only time (r14 census at 16M
    rows / 64 row groups: natural 64/64 groups overlap the value band;
    z-ordered 9/64 — ``tools/ab_zorder_scan.py``). At 100 TB this is
    the read-amplification fix for selective scans the repeat-join
    bucketing family cannot address: the win is bytes never read, so
    it GROWS with corpus size while costing one write-side sort.
    Quantization bounds are fixed constants (they shape only the
    layout, never the result); the filter runs on the original
    columns, so the oracle is plain SQL over the raw table."""
    path = _zorder_events_layer(spark, sf_dir)
    lo_ts = F.lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    hi_ts = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    pruned = spark.read.parquet(path).where(
        (F.col("ts") >= lo_ts)
        & (F.col("ts") < hi_ts)
        & (F.col("value") >= 100.0)
        & (F.col("value") < 250.0)
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("total_value"),
    )


@register(
    "approx_value_percentiles",
    oracle="""
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 100 + 0.5) / 100.0
               AS p50_exact,
           floor(quantile_cont(value, 0.95) * 100 + 0.5) / 100.0
               AS p95_exact,
           TRUE AS p50_within_bounds,
           TRUE AS p95_within_bounds
    FROM events GROUP BY event_type
    """,
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per event type — the quantile sketch a
    100-TB rollup uses where exact percentiles would sort every value.

    Same cross-engine-honest contract as ``approx_distinct_users_daily``:
    sketch VALUES aren't comparable across engines, but the sketch's
    guarantee is. ``approx_percentile(accuracy=1000)`` returns an actual
    data value whose RANK is within 0.001*n of p*n; the interpolated
    exact percentile at p +- eps brackets any such value as long as eps
    also absorbs the nearest-rank-vs-interpolation gap, which scales as
    1/n — so eps must NOT be sized from the sketch's rank error alone
    (0.001 would break on groups under ~100 rows). eps=0.05 with the
    upper bound clamped to the max holds for every n >= 1. Booleans
    coalesce to true for all-null groups (both engines yield NULL
    percentiles there). Exact values exist only to validate the sketch
    in the harness; the production rollup ships the estimates alone."""
    events = load_table(spark, sf_dir, "events")
    # bounds: p50 in [P(0.45), P(0.55)], p95 in [P(0.90), P(1.0)=max]
    agg = events.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("a95"),
        F.expr(
            "percentile(value, array(0.45, 0.5, 0.55, 0.90, 0.95, 1.0))"
        ).alias("ex"),
    )
    ex = F.col("ex")
    return agg.select(
        "event_type",
        # settled: interpolated percentiles of 2dp values sit exactly on
        # .xx5 half-way cells, where round() differs across DuckDB builds
        settled_round(ex[1], 2).alias("p50_exact"),
        settled_round(ex[4], 2).alias("p95_exact"),
        F.coalesce(
            (F.col("a50") >= ex[0]) & (F.col("a50") <= ex[2]), F.lit(True)
        ).alias("p50_within_bounds"),
        F.coalesce(
            (F.col("a95") >= ex[3]) & (F.col("a95") <= ex[5]), F.lit(True)
        ).alias("p95_within_bounds"),
    )


@register(
    "approx_distinct_users_daily",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS approx_within_5pct
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per day via HyperLogLog++ — the sketch
    the 100-TB path uses where exact distinct would shuffle every user
    id; rsd=0.01 keeps the estimate within ~1%.

    HLL sketch VALUES differ per engine by design, so the hash-matched
    contract is the sketch's accuracy instead: the query emits the exact
    count and a boolean asserting the estimate lands within 5x the
    requested rsd. The exact count_distinct here exists ONLY to validate
    the sketch in the harness — the production rollup drops it and ships
    the estimate alone."""
    events = load_table(spark, sf_dir, "events")
    ex, ap = F.col("n_users_exact"), F.col("approx_users")
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count_distinct("user_id").alias("n_users_exact"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_users_exact",
            (F.abs(ap - ex) <= ex * 0.05).alias("approx_within_5pct"),
        )
    )


@register(
    "events_asof_latest_order",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS order_ts,
               o_orderkey, o_totalprice
        FROM orders),
    ranked AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_totalprice, o.order_ts,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.order_ts DESC, o.o_orderkey DESC) AS rn
        FROM events e LEFT JOIN o
          ON o.o_custkey = e.user_id AND o.order_ts <= e.ts)
    SELECT event_id, user_id, ts, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join): each event gets the
    user's most recent order at or before the event time — one shuffle
    by key + a forward-fill window, no quadratic range join. Ties on
    order_ts break by highest o_orderkey to keep both engines
    deterministic."""
    from news_data_pipeline_spark.operators.joins import asof_join

    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("order_ts"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    out = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="order_ts",
        right_cols=["o_orderkey", "o_totalprice"],
        # ties on order_ts resolve to the highest o_orderkey, matching
        # the oracle's row_number tie-break
        right_order=["o_orderkey"],
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


@register(
    "event_value_bands_rangejoin",
    oracle=f"""
    WITH bands AS (
        SELECT i * 25.0 AS lo, (i + 1) * 25.0 AS hi,
               'band_' || CAST(i AS VARCHAR) AS band
        FROM (SELECT unnest(range(0, 10)) AS i))
    SELECT b.band, count(*) AS n_events,
           {sql_exact_sum('e.value')} AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def event_value_bands_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators.joins.range_join): events against
    value bands as an equi-join on overlap buckets — no nested-loop."""
    from news_data_pipeline_spark.operators.joins import range_join

    events = load_table(spark, sf_dir, "events")
    bands = spark.range(0, 10).select(
        (F.col("id") * 25.0).alias("lo"),
        ((F.col("id") + 1) * 25.0).alias("hi"),
        F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band"),
    )
    joined = range_join(
        events, bands, left_value="value", right_lo="lo", right_hi="hi",
        bucket_width=25.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("total_value"),
    )


@register(
    "events_asof_tiebreak_order",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS order_ts,
               o_orderkey, o_totalprice
        FROM orders),
    ranked AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.order_ts DESC,
                                           o.o_totalprice DESC,
                                           o.o_orderkey DESC) AS rn
        FROM events e LEFT JOIN o
          ON o.o_custkey = e.user_id AND o.order_ts <= e.ts)
    SELECT event_id, user_id, ts,
           o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def events_asof_tiebreak_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join variant that leans on the multi-column ``right_order``
    tie-break: order timestamps are date-granular, so a user routinely
    has several orders at the SAME latest as-of instant — the winner is
    the highest (totalprice, orderkey) pair, not whichever row a task
    saw last. Same one-shuffle forward-fill plan as
    ``events_asof_latest_order``; only the tie policy differs."""
    from news_data_pipeline_spark.operators.joins import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("order_ts"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    out = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="order_ts",
        right_cols=["o_orderkey", "o_totalprice"],
        # ascending right_order; the LAST (max) pair wins the tie
        right_order=["o_totalprice", "o_orderkey"],
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


@register(
    "event_value_bands_left_rangejoin",
    oracle=f"""
    WITH bands AS (
        SELECT i * 50.0 AS lo, i * 50.0 + 25.0 AS hi,
               'band_' || CAST(i AS VARCHAR) AS band
        FROM (SELECT unnest(range(0, 5)) AS i))
    SELECT b.band, count(*) AS n_events,
           {sql_exact_sum('e.value')} AS total_value
    FROM events e LEFT JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def event_value_bands_left_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer bucketized range join (operators.joins.range_join,
    ``how="left"``): the bands deliberately cover only alternating
    50-wide stripes, so events falling in a gap survive the join with a
    NULL band — the rows an inner range join silently drops. The NULL
    group aggregates the unbanded remainder, proving the range predicate
    lives in the join condition, not a post-join filter."""
    from news_data_pipeline_spark.operators.joins import range_join

    events = load_table(spark, sf_dir, "events")
    bands = spark.range(0, 5).select(
        (F.col("id") * 50.0).alias("lo"),
        (F.col("id") * 50.0 + 25.0).alias("hi"),
        F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band"),
    )
    joined = range_join(
        events, bands, left_value="value", right_lo="lo", right_hi="hi",
        bucket_width=25.0, how="left",
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("total_value"),
    )


@register(
    "view_purchase_interval_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
           round(p.value, 2) AS purchase_value
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts - INTERVAL 15 MINUTE
     AND p.ts <= v.ts + INTERVAL 15 MINUTE
    """,
)
def view_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch side of the ±15-minute view↔purchase attribution, routed
    through ``operators.joins.interval_join_bucketed`` (time-bucketed
    equi-join). Semantics are identical to the streaming twin
    ``streaming.ops.interval_join_streams`` — same key equality, same
    two-sided inclusive bound — but the PLANS deliberately diverge:
    the streaming form's equi-join-with-time-residual is fine there
    (watermarks evict state, bounding per-key candidates), while in
    batch the same plan materializes views(k) × purchases(k) pairs per
    key before the residual filters — SCALE.md "Interval-join family
    rewrites" measured 909 s for a 400k-row hot user at 4M rows vs
    0.72 s bucketed (1268×). Parity between the two forms is pinned in
    tests/test_psa_asof_candidate.py (fixtures, oracle, epoch-boundary
    edges)."""
    from news_data_pipeline_spark.operators.joins import interval_join_bucketed

    events = load_table(spark, sf_dir, "events")
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


@register(
    "event_time_rollup",
    oracle=f"""
    SELECT CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR) AS month,
           CASE WHEN GROUPING(CAST(ts AS DATE)) = 0
                THEN CAST(CAST(ts AS DATE) AS VARCHAR) END AS day,
           count(*) AS n_events,
           {sql_exact_sum('value')} AS total_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('month', ts) AS DATE), CAST(ts AS DATE))
    HAVING GROUPING(CAST(date_trunc('month', ts) AS DATE)) = 0
    """,
)
def event_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: one pass produces both
    daily and monthly continuous aggregates via ROLLUP — partial
    aggregation handles every level map-side, so the scan count stays 1
    no matter how many resolutions roll up."""
    events = load_table(spark, sf_dir, "events")
    # dates surface as ISO strings: pandas coerces DATE to datetime64
    # on the oracle side, which would hash-mismatch a true date column
    month = F.date_trunc("month", "ts").cast("date").cast("string").alias("month")
    day = F.col("ts").cast("date").cast("string").alias("day")
    return (
        events.select(month, day, "value")
        .rollup("month", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
            # grouping indicator, not value-nullness: a genuinely-null
            # month is DATA (grouping=0) and must survive; only the
            # rollup grand-total row (grouping=1) is dropped
            F.grouping("month").alias("__gm"),
        )
        .where(F.col("__gm") == 0)
        .drop("__gm")
    )


@register(
    "user_value_highwater",
    oracle="""
    SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL) t
    WHERE prev_max IS NULL OR value > prev_max
    """,
)
def user_value_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.state.user_value_highwater: the rows that
    set a new per-user lifetime value maximum, in event-time order."""
    from news_data_pipeline_spark.streaming.state import batch_value_highwater

    return batch_value_highwater(load_table(spark, sf_dir, "events"))


@register(
    "user_event_islands",
    # gaps-and-islands: two row_numbers whose difference is constant
    # within a run of consecutive identical event_types per user
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
        FROM events WHERE ts IS NOT NULL)
    SELECT user_id, event_type,
           min(ts) AS island_start, max(ts) AS island_end,
           count(*) AS n_events
    FROM ordered GROUP BY user_id, event_type, grp
    """,
)
def user_event_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive identical
    event_types per user, by the classic two-row_number difference —
    the value-change twin of time-gap sessionization (user_sessions).
    Both windows partition by user (plus type), so the shuffle keys by
    user_id and no partition ever exceeds one user's history; ties
    break on event_id so replays are deterministic."""
    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir).where(F.col("ts").isNotNull())
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    grp = F.row_number().over(w_all) - F.row_number().over(w_type)
    return (
        events.withColumn("grp", grp)
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("grp")
    )


@register(
    "event_rate_anomalies",
    # both engines compute the identical trailing-24-row frame over the
    # same hourly aggregate; z rounds to 4dp BEFORE the threshold so the
    # flag decision is made on the same double
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n_events
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2),
    scored AS (
        SELECT event_type, hour, n_events,
               floor(avg(n_events) OVER w * 10000 + 0.5) / 10000.0
                   AS mean_prev,
               floor(stddev_samp(n_events) OVER w * 10000 + 0.5) / 10000.0
                   AS std_prev
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hour, n_events, mean_prev,
           floor((n_events - mean_prev) / std_prev * 10000 + 0.5) / 10000.0
               AS z
    FROM scored
    WHERE std_prev IS NOT NULL AND std_prev > 0
      AND abs(floor((n_events - mean_prev) / std_prev * 10000 + 0.5)
              / 10000.0) >= 2.0
    """,
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window rate anomaly detection: hours whose event count
    sits >= 2 sample standard deviations from the previous 24 hourly
    counts of the same event type. The frame is ROWS-based over the
    hourly aggregate (tiny: one row per (type, hour)), so the window
    shuffle is on event_type and the heavy lifting — the hourly count —
    is one map-side-combined aggregate of the raw events. The streaming
    twin is a tumbling-window count feeding the same z-rule in
    foreachBatch."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "n_events",
        settled_round(F.avg("n_events").over(w), 4).alias("mean_prev"),
        settled_round(
            F.stddev_samp("n_events").over(w), 4
        ).alias("std_prev"),
    )
    z = settled_round(
        (F.col("n_events") - F.col("mean_prev")) / F.col("std_prev"), 4
    )
    return (
        scored.where(F.col("std_prev").isNotNull() & (F.col("std_prev") > 0))
        .withColumn("z", z)
        .where(F.abs(F.col("z")) >= 2.0)
        .drop("std_prev")
        .select("event_type", "hour", "n_events", "mean_prev", "z")
    )


@register(
    "event_user_skew_report",
    oracle="""
    WITH counts AS (
        SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
    total AS (SELECT sum(n_rows) AS t FROM counts)
    SELECT user_id, n_rows, floor(n_rows / t * 1000000 + 0.5) / 1000000.0
               AS share
    FROM counts CROSS JOIN total
    ORDER BY n_rows DESC, user_id LIMIT 10
    """,
)
def event_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic (operators.ranking.skew_report): the 10
    heaviest user_ids in events with their row share — the number a
    salting / AQE-skew-join decision is made from, produced as one
    keyed count + broadcast total + TakeOrderedAndProject."""
    from news_data_pipeline_spark.operators.ranking import skew_report

    events = load_table(spark, sf_dir, "events")
    return skew_report(events, "user_id", top_n=10)


@register(
    "user_type_scd2",
    # islands -> intervals: valid_from = island start, valid_to = next
    # island's start (lead), open-ended current row; both engines order
    # islands by (valid_from, event_type) so same-timestamp starts
    # break ties identically
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
        FROM events WHERE ts IS NOT NULL),
    islands AS (
        SELECT user_id, event_type, min(ts) AS valid_from
        FROM ordered GROUP BY user_id, event_type, grp)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_type)
               AS valid_to,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from, event_type)
                     IS NULL
                THEN TRUE ELSE FALSE END AS is_current
    FROM islands
    """,
)
def user_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event stream: each
    user's event_type history as half-open validity intervals
    [valid_from, valid_to), open-ended on the current value — the
    gaps-and-islands runs (user_event_islands) projected to the
    warehouse versioning shape with one more user-keyed lead(). All
    windows key on user_id; no partition ever holds more than one
    user's history."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    grp = F.row_number().over(w_all) - F.row_number().over(w_type)
    islands = (
        events.withColumn("grp", grp)
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("valid_from"))
        .drop("grp")
    )
    w_seq = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    valid_to = F.lead("valid_from").over(w_seq)
    return islands.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --- round 4: ordered first-touch funnel ----------------------------------
@register(
    "user_funnel_stages",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'   THEN ts END) AS s,
               min(CASE WHEN event_type = 'view'     THEN ts END) AS v,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
        FROM events GROUP BY user_id),
    staged AS (
        SELECT user_id,
               CASE WHEN s IS NULL THEN 'no_signup'
                    WHEN v IS NULL OR v < s THEN 'signup_only'
                    WHEN p IS NULL OR p < v THEN 'viewed'
                    ELSE 'purchased' END AS funnel_stage
        FROM per_user)
    SELECT funnel_stage, count(*) AS n_users
    FROM staged GROUP BY funnel_stage
    """,
)
def user_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered first-touch funnel signup -> view -> purchase:
    a user advances a stage only if that stage's FIRST event falls at or
    after the previous stage's first event (a pre-signup view does not
    count). One conditional-min aggregate per user, then a constant-size
    stage rollup — two map-side-combinable shuffles, no joins, no
    windows. The per-user stage expression is streaming/state.py::
    batch_funnel_stages — the ONE Spark-side definition of the rule the
    stateful streaming twin must match."""
    from news_data_pipeline_spark.streaming.state import (
        batch_funnel_stages,
    )

    events = load_table(spark, sf_dir, "events")
    return (
        batch_funnel_stages(events)
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- round 4: exponentially time-decayed engagement -----------------------
@register(
    "user_decayed_value",
    oracle=f"""
    WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
    aged AS (
        SELECT e.user_id, e.value,
               datediff('second', e.ts, r.ref_ts) / 86400.0 AS age_days
        FROM events e CROSS JOIN ref r
        WHERE e.value IS NOT NULL)
    SELECT user_id,
           {sql_exact_sum('value * exp(-age_days / 30.0)', 4)} AS decayed_value,
           count(*) AS n_events
    FROM aged GROUP BY user_id
    """,
)
def user_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user (30-day
    half-life-style weighting): the standard recency-weighted feature
    for ranking/mixing. The corpus max-timestamp anchor is a 1-row
    broadcast; ages are exact integer second deltas on both engines, so
    the only float work is the shared exp/sum expression. One shuffle
    (the per-user aggregate), no windows."""
    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir)
    ref = events.agg(F.max("ts").alias("__ref_ts"))
    age_days = (
        F.col("__ref_ts").cast("timestamp").cast("long")
        - F.col("ts").cast("timestamp").cast("long")
    ) / F.lit(86400.0)
    return (
        events.where(F.col("value").isNotNull())
        .join(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            # per-row decayed contribution settled to 1e-4 units before
            # the sum: value, age and the exp ARGUMENT are identical
            # doubles on both engines, and the integer sum cannot drift
            # by accumulation order. Caveat: exp itself is only ~1-ulp
            # accurate in both Java's Math.exp and DuckDB's libm — they
            # agree empirically on this data (gate-verified at two SFs),
            # but a product within an ulp of a 0.5e-4 settle boundary
            # could in principle still flip a unit between engines
            exact_sum(
                F.col("value") * F.exp(-age_days / F.lit(30.0)), 4
            ).alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- round 4: robust dispersion (median absolute deviation) ---------------
@register(
    "event_value_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_type,
           round(any_value(m.med), 4) AS median_value,
           round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
           count(*) AS n_events
    FROM events e JOIN med m USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def event_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of event values per type — the robust
    dispersion behind outlier gates that variance-based z-scores get
    wrong on heavy tails. Two exact-percentile aggregates: the per-type
    medians ride back in as a broadcast (group count is bounded), then
    one more aggregate over the absolute deviations. Spark `percentile`
    and DuckDB `quantile_cont` share interpolation semantics (pinned by
    quantity_median)."""
    events = load_table(spark, sf_dir, "events")
    vals = events.where(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    med = vals.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("__med")
    )
    return (
        vals.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("__med"), 4).alias("median_value"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("__med")), 0.5), 4
            ).alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- round 4: point-in-time (SCD2) attribution join -----------------------
@register(
    "purchase_state_attribution",
    oracle="""
    WITH nonp AS (
        SELECT * FROM events
        WHERE ts IS NOT NULL AND event_type <> 'purchase'),
    ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
        FROM nonp),
    islands AS (
        SELECT user_id, event_type, min(ts) AS valid_from
        FROM ordered GROUP BY user_id, event_type, grp),
    scd AS (
        SELECT user_id, event_type AS state_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from, event_type)
                   AS valid_to
        FROM islands)
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           s.state_type, s.valid_from AS state_since
    FROM events p
    LEFT JOIN scd s
      ON s.user_id = p.user_id
     AND s.valid_from <= p.ts
     AND (s.valid_to IS NULL OR p.ts < s.valid_to)
    WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
    """,
)
def purchase_state_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase attributed to the SCD2 state
    interval (built from the user's NON-purchase activity) that was
    active at purchase time — the as-of-correct dimension lookup that
    naive latest-value joins get wrong.

    The lookup routes through ``operators.joins.asof_join`` (union both
    sides, ONE shuffle by user_id, forward-fill window) instead of the
    interval-join form the oracle states: half-open SCD2 intervals
    built by ``lead(valid_from) OVER (ORDER BY valid_from,
    event_type)`` partition each user's timeline, so a purchase at
    ``ts`` matches exactly the LAST island (in that same order) with
    ``valid_from <= ts`` — any earlier island's ``valid_to`` is a later
    island's ``valid_from <= ts``, and islands tied on ``valid_from``
    produce empty intervals for all but the last tie, which
    ``right_order=["state_type"]`` reproduces. The ``lead`` window (and
    ``valid_to`` itself) therefore never needs to materialize. The
    interval form's per-key cost is purchases(k) × intervals(k) —
    ~150-240 s for a 400k-row hot user at 4M rows vs 0.9 s uniform
    (SCALE.md "Skew probe"); the as-of form is one in-key sort (56.9×
    under that key). Equivalence pinned in
    tests/test_psa_asof_candidate.py (tied-island, pre-history and
    inclusive-edge fixtures + oracle parity)."""
    from news_data_pipeline_spark.operators.joins import asof_join

    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir).where(F.col("ts").isNotNull())
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
        # islands tied on valid_from: the LAST by state_type wins — the
        # only one whose half-open interval is non-empty in the oracle
        right_order=["state_type"],
    )
    return out.select(
        "event_id", "user_id", "purchase_ts", "state_type", "state_since"
    )


# --- round 4: last-observation-carried-forward imputation -----------------
@register(
    "events_value_locf",
    oracle="""
    SELECT event_id, user_id, ts, value,
           last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_filled
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def events_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by last observation carried forward: null event
    values inherit the user's most recent non-null reading
    (last_value IGNORE NULLS over a running frame) — the standard
    sensor/telemetry imputation. Leading nulls stay null (nothing to
    carry). User-partitioned window; deterministic (ts, event_id)
    order."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.last("value", ignorenulls=True).over(w).alias("value_filled"),
    )


# --- round 4: cohort retention triangle -----------------------------------
@register(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(date_trunc('week', ts)) AS cohort_week
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               datediff('week', f.cohort_week,
                        date_trunc('week', e.ts)) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.ts IS NOT NULL)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS INT) AS week_offset,
           count(*) AS n_active_users
    FROM activity GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted once per (cohort, weeks-since-start) cell — the standard
    retention matrix. Two user-keyed shuffles (first-touch min, then
    the distinct cell membership); the cohort dimension rides back on
    the user-keyed join, never a cross product. Weeks are date_trunc
    boundaries so both engines bucket identically."""
    # bucketed-by-user_id read (round-14 adoption — _userid_events):
    events = _userid_events(spark, sf_dir).where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    firsts = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


# --- round 4: inter-arrival gap statistics --------------------------------
@register(
    "event_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               datediff('second',
                        lag(ts) OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id),
                        ts) AS gap_s
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT event_type,
           count(gap_s) AS n_gaps,
           -- settled: sum/count of exact integer seconds is the
           -- half-way-cell integer-ratio class
           floor(sum(gap_s) / count(gap_s)::DOUBLE * 100 + 0.5) / 100.0
               AS avg_gap_s,
           floor(quantile_cont(gap_s, 0.5) * 100 + 0.5) / 100.0
               AS median_gap_s,
           max(gap_s) AS max_gap_s
    FROM gaps GROUP BY event_type
    """,
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival time distribution (same-user consecutive
    events): the burstiness signal behind rate limits and session-gap
    tuning. Gaps are exact integer second deltas from a user-keyed lag
    window; the rollup is one aggregate with an exact median."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    gap = (
        F.col("ts").cast("timestamp").cast("long")
        - F.lag("ts").over(w).cast("timestamp").cast("long")
    )
    gaps = events.select("event_type", gap.alias("gap_s"))
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        settled_round(
            F.sum("gap_s") / F.count("gap_s").cast("double"), 2
        ).alias("avg_gap_s"),
        settled_round(F.percentile("gap_s", 0.5), 2).alias("median_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


# --- round 4: distribution entropy over time ------------------------------
@register(
    "event_type_entropy_daily",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type, count(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT day, sum(cnt) AS n FROM daily GROUP BY day)
    SELECT d.day,
           CAST(t.n AS BIGINT) AS n_events,
           -- per-term 10dp settle before the sum: summation order
           -- differs between engines; the BIGINT sum is exact
           floor(-sum(CAST(floor((d.cnt / t.n::DOUBLE)
                                 * log2(d.cnt / t.n::DOUBLE)
                                 * 10000000000 + 0.5) AS BIGINT))
                 / 10000000000.0 * 1000000 + 0.5) / 1000000.0
               AS entropy_bits
    FROM daily d JOIN tot t USING (day)
    GROUP BY d.day, t.n
    """,
)
def event_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the daily event-type mix: the one-number
    drift signal that collapses when traffic degenerates to a single
    type (bot storms, pipeline stalls) and peaks at uniform mix. Two
    keyed aggregates; per-day totals attach by broadcast; per-term
    settled units make the sum order-independent on both engines."""
    events = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = daily.groupBy("day").agg(F.sum("cnt").alias("__n"))
    p = F.col("cnt") / F.col("__n").cast("double")
    return (
        daily.join(F.broadcast(tot), "day")
        .groupBy("day", F.col("__n").cast("bigint").alias("n_events"))
        .agg(
            # per-term 10dp settle before the sum (order-independent),
            # final 6dp settle — mirrors the oracle exactly
            settled_round(
                -F.sum(
                    F.floor(p * F.log2(p) * 1e10 + F.lit(0.5)).cast("long")
                )
                / 1e10,
                6,
            ).alias("entropy_bits")
        )
    )


# --- round 7: CDC apply (the streaming MERGE INTO), batch replay ----------
@register(
    "cdc_apply_final_state",
    # last-writer-wins over the whole change set: per user, the change
    # with the highest event_id decides — a final delete removes the
    # key, anything else carries its row into the final table. The
    # Spark side replays the same set in three ordered batches through
    # streaming.sinks.apply_cdc_batch (the exact code the streaming
    # sink runs per micro-batch), so sequential merge-with-delete must
    # compose to global LWW for the hashes to meet.
    oracle="""
    WITH ch AS (
        SELECT event_id, user_id, event_type, value,
               CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
        FROM events),
    last AS (
        SELECT event_id, user_id, event_type, value, op FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM ch) t
        WHERE rn = 1)
    SELECT user_id, event_id AS last_event_id, event_type, value
    FROM last WHERE op <> 'd'
    """,
)
def cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply end-to-end (streaming.sinks.apply_cdc_batch — the body
    apply_cdc runs per micro-batch): the events table becomes a change
    stream (key user_id, version event_id, op 'd' on error events),
    replayed in three event-id-ordered batches into a VersionedLayer.
    Each batch resolves last-change-per-key, merges the upsert arm,
    then the delete arm, and commits one version atomically; the final
    table must equal last-writer-wins over the entire change set —
    including a delete resurrected by a later upsert and vice versa.
    One bounded scalar collect (max event_id, 1 row) sizes the batches.
    """
    import tempfile

    from news_data_pipeline_spark.sources.writers import VersionedLayer
    from news_data_pipeline_spark.streaming.sinks import apply_cdc_batch

    events = load_table(spark, sf_dir, "events")
    changes = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
    )
    max_id = changes.agg(F.max("event_id")).first()[0]
    if max_id is None:  # empty change set: nothing to replay
        return spark.createDataFrame(
            [],
            "user_id bigint, last_event_id bigint, event_type string, "
            "value double",
        )
    step = max_id // 3 + 1
    layer = VersionedLayer(tempfile.mkdtemp(prefix="cdc_q_"))
    for i in range(3):
        batch = changes.where(
            (F.col("event_id") >= i * step)
            & (F.col("event_id") < (i + 1) * step)
        )
        apply_cdc_batch(
            batch,
            layer,
            ["user_id"],
            dedup_order_col="event_id",
            op_col="op",
            delete_value="d",
        )
    return layer.read(spark).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        "event_type",
        "value",
    )


# --- streamed sketch maintenance twins (round 8) ---------------------------

_SK_DEPTH, _SK_WIDTH = 4, 256
_SK_MELT = "\n        UNION ALL ".join(
    f"SELECT CAST({j} AS INT) AS row, b{j} AS bucket, n FROM tb"
    for j in range(_SK_DEPTH)
)
_SK_BUCKETS = ",\n".join(
    f"               CAST(concat('0x', substring(md5('cms{j}:' || token),"
    f" 1, 8)) AS BIGINT) % {_SK_WIDTH} AS b{j}"
    for j in range(_SK_DEPTH)
)


@register(
    "streamed_cms_sketch",
    # the oracle builds the BATCH sketch of the whole corpus; the Spark
    # side streams the corpus through maintain_cms_sketch in three
    # availableNow micro-batches and merges the per-batch partitions
    # with read_cms_sketch — counter addition is associative, so the
    # streamed merge must equal the batch build cell-for-cell
    oracle=f"""
    WITH toks AS (
        SELECT w AS token
        FROM documents, LATERAL unnest(
            regexp_split_to_array(trim(text), '\\s+')) AS t(w)
        WHERE length(w) > 0),
    tc AS (SELECT token, CAST(count(*) AS BIGINT) AS n
           FROM toks GROUP BY token),
    tb AS (
        SELECT token, n,
{_SK_BUCKETS}
        FROM tc),
    melt AS (
        {_SK_MELT})
    SELECT row, bucket, CAST(sum(n) AS BIGINT) AS counter
    FROM melt GROUP BY row, bucket
    """,
)
def streamed_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming sketch-maintenance loop end-to-end
    (streaming.sinks.maintain_cms_sketch + read_cms_sketch): documents
    land as three parquet files, a real availableNow stream consumes
    them one file per trigger, each micro-batch writes its own
    constant-size sketch partition, and the reader's groupBy-sum merge
    must equal the batch-built corpus sketch EXACTLY — the mergeable-
    monoid contract that makes a CMS maintainable over an unbounded
    stream without ever rescanning history."""
    import os
    import tempfile

    from news_data_pipeline_spark.streaming.sinks import (
        maintain_cms_sketch,
        read_cms_sketch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="cms_stream_q_")
    landing = os.path.join(root, "landing")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = maintain_cms_sketch(
        stream,
        id_col="doc_id",
        text_col="text",
        sketch_path=os.path.join(root, "sketch"),
        checkpoint=os.path.join(root, "ckpt"),
        depth=_SK_DEPTH,
        width=_SK_WIDTH,
        available_now=True,
    )
    q.awaitTermination()
    return read_cms_sketch(spark, os.path.join(root, "sketch"))


@register(
    "streamed_bloom_filter",
    # batch-built filter of every fingerprint == distinct-merged union
    # of the per-batch bit partitions (bit-OR is idempotent AND
    # associative — the stronger half of the sketch-monoid family)
    oracle="""
    WITH mem AS (SELECT md5(text) AS fp FROM documents),
    bits AS (
        SELECT DISTINCT
            CASE u.j
                 WHEN 0 THEN CAST(concat('0x', substring(
                     md5('bloom0:' || fp), 1, 8)) AS BIGINT) % 256
                 WHEN 1 THEN CAST(concat('0x', substring(
                     md5('bloom1:' || fp), 1, 8)) AS BIGINT) % 256
                 ELSE CAST(concat('0x', substring(
                     md5('bloom2:' || fp), 1, 8)) AS BIGINT) % 256
            END AS bit
        FROM mem, LATERAL unnest(range(0, 3)) AS u(j))
    SELECT bit FROM bits
    """,
)
def streamed_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming Bloom-filter maintenance loop end-to-end
    (streaming.sinks.maintain_bloom_filter + read_bloom_filter): text
    fingerprints stream through three availableNow micro-batches, each
    writing its own bit partition; the distinct-merged filter must
    equal the batch-built filter of the whole corpus bit-for-bit. The
    filter is the live half of the incremental-dedup contract — probe
    it before paying the exact anti-join against history."""
    import os
    import tempfile

    from news_data_pipeline_spark.streaming.sinks import (
        maintain_bloom_filter,
        read_bloom_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id", F.md5("text").alias("fp")
    )
    root = tempfile.mkdtemp(prefix="bloom_stream_q_")
    landing = os.path.join(root, "landing")
    for i in range(3):
        fps.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id bigint, fp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = maintain_bloom_filter(
        stream,
        term_col="fp",
        filter_path=os.path.join(root, "filter"),
        checkpoint=os.path.join(root, "ckpt"),
        num_bits=256,
        num_hashes=3,
        available_now=True,
    )
    q.awaitTermination()
    return read_bloom_filter(spark, os.path.join(root, "filter"))


@register(
    "stream_dim_enrichment",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment
    (streaming.ops.enrich_stream_with_dim): every event picks up its
    customer's market segment through a broadcast left join — the
    exact function the streaming path applies per micro-batch
    (stateless, so batch and streaming semantics are identical; the
    stream-side plumbing is pinned by tests/test_streaming.py).
    Broadcast pins the physical strategy: the dim is orders of
    magnitude smaller than a 100-TB stream, and a per-batch broadcast
    avoids re-shuffling every micro-batch by the join key. Orphan
    events keep flowing with a NULL segment — the DQ layer decides
    their fate, not the join."""
    from news_data_pipeline_spark.streaming.ops import (
        enrich_stream_with_dim,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return enrich_stream_with_dim(events, dim, on="user_id")


@register(
    "streamed_ingest_dedup_corpus",
    # global keep-first semantics of the continuous-ingestion sink:
    # per fingerprint, the survivor is the lowest doc_id within the
    # EARLIEST batch containing it (batch = doc_id % 2 here, replayed
    # in order) — batch-internal keep-lowest composed with the
    # against-corpus anti-join. Null-text docs all survive (null is
    # "unknown", never a shared key).
    oracle="""
    WITH fp AS (
        SELECT doc_id, lang, source, doc_id % 2 AS batch,
               CASE WHEN text IS NULL THEN NULL
                    ELSE md5(regexp_replace(lower(text), '[^a-z0-9]', '',
                                            'g'))
               END AS f
        FROM documents),
    winners AS (
        SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (
                PARTITION BY f ORDER BY batch, doc_id) AS rn
            FROM fp WHERE f IS NOT NULL) t
        WHERE rn = 1)
    SELECT doc_id, lang, source FROM fp
    WHERE f IS NULL OR doc_id IN (SELECT doc_id FROM winners)
    """,
)
def streamed_ingest_dedup_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The continuous-ingestion dedup sink end-to-end
    (streaming.sinks.ingest_deduplicated, method='bloom'): documents
    arrive as two ordered availableNow micro-batches, each batch
    dedups internally (keep-lowest-id), probes the maintained Bloom
    filter + anti-join against everything previously accepted, and
    appends survivors as its own corpus partition. The final corpus
    must equal global keep-first dedup over the whole stream — the
    contract that makes per-batch ingestion equivalent to one giant
    batch job, driver-verified through the exact-dedup SQL (the Bloom
    filter is an access path, never a verdict change). Batch count is
    two, not three — the ``streamed_pq_codes`` round-10 profile
    measured ~2 s of FIXED per-trigger toll at gate scale, and two
    partitions already exercise every semantic this query pins
    (batch-internal dedup, against-corpus probe, per-batch append)."""
    import os
    import tempfile

    from news_data_pipeline_spark.streaming.sinks import ingest_deduplicated

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    if not docs.head(1):
        return spark.createDataFrame(
            [], "doc_id bigint, lang string, source string"
        )
    root = tempfile.mkdtemp(prefix="ingest_dedup_q_")
    landing = os.path.join(root, "landing")
    corpus_path = os.path.join(root, "corpus")
    # one sink call per arriving batch: the checkpoint carries ingest
    # state across calls, and ordering is by construction (a
    # single-start variant relying on the file source's oldest-first
    # mtime ordering was A/B'd in round 11 at 2.99 vs 3.12 s median —
    # within noise, so the shape that cannot misorder wins)
    for i in range(2):
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
        stream = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(landing, "*"))
        )
        q = ingest_deduplicated(
            stream,
            id_col="doc_id",
            text_col="text",
            corpus_path=corpus_path,
            checkpoint=os.path.join(root, "ckpt"),
            method="bloom",
            num_bits=4096,
            num_hashes=3,
            available_now=True,
        )
        q.awaitTermination()
    return spark.read.parquet(corpus_path).select(
        "doc_id", "lang", "source"
    )


@register(
    "streamed_ingest_dedup_compacted",
    # identical oracle to streamed_ingest_dedup_corpus: bit-table
    # compaction is an access-path change (one merged sentinel
    # partition + _covered.json manifest instead of per-batch bit
    # partitions) and must never change a keep/drop verdict.
    oracle="""
    WITH fp AS (
        SELECT doc_id, lang, source, doc_id % 2 AS batch,
               CASE WHEN text IS NULL THEN NULL
                    ELSE md5(regexp_replace(lower(text), '[^a-z0-9]', '',
                                            'g'))
               END AS f
        FROM documents),
    winners AS (
        SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (
                PARTITION BY f ORDER BY batch, doc_id) AS rn
            FROM fp WHERE f IS NOT NULL) t
        WHERE rn = 1)
    SELECT doc_id, lang, source FROM fp
    WHERE f IS NULL OR doc_id IN (SELECT doc_id FROM winners)
    """,
)
def streamed_ingest_dedup_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """streamed_ingest_dedup_corpus with bloom bit-table COMPACTION
    live (``compact_after=1`` — the round-10 maintenance path): after
    the first trigger its bit partition OR-merges into the sentinel
    ``batch_id=-1`` partition with a ``_covered.json`` manifest; the
    second trigger probes the merged sentinel (coverage comes from the
    manifest, not per-batch partitions), appends its own bits, and
    re-compacts them INTO the existing sentinel — exercising build,
    probe-after-compaction, and merge-into-sentinel in two triggers.
    The final corpus must STILL equal global keep-first dedup — the
    driver gate proves compaction is an access-path change only (it
    can only ADD false-positive maybe-rows, which the corpus anti-join
    resolves; never a false negative, which would append a true
    duplicate). Structure assertions (partition layout, manifest
    contents, resize-after-compaction rebuild) live in
    ``tests/test_streaming.py``. Two batches, not three — the fixed
    ~2 s/trigger toll dominated at gate scale (round-10 verdict item
    3: this was the slowest local-gate entry at ~24 s); the two-trigger
    shape above covers strictly more compaction paths than the old
    3-batch/compact_after=2 one (which merged once and never re-merged
    into an existing sentinel)."""
    import os
    import tempfile

    from news_data_pipeline_spark.streaming.sinks import ingest_deduplicated

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    if not docs.head(1):
        return spark.createDataFrame(
            [], "doc_id bigint, lang string, source string"
        )
    root = tempfile.mkdtemp(prefix="ingest_compact_q_")
    landing = os.path.join(root, "landing")
    corpus_path = os.path.join(root, "corpus")
    for i in range(2):
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
        stream = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(landing, "*"))
        )
        q = ingest_deduplicated(
            stream,
            id_col="doc_id",
            text_col="text",
            corpus_path=corpus_path,
            checkpoint=os.path.join(root, "ckpt"),
            method="bloom",
            num_bits=4096,
            num_hashes=3,
            available_now=True,
            compact_after=1,
        )
        q.awaitTermination()
    return spark.read.parquet(corpus_path).select(
        "doc_id", "lang", "source"
    )


@register(
    "streamed_sq_codes",
    # batch-encoded table == union of per-batch partitions encoded
    # under the FROZEN bounds artifact: each id lives in exactly one
    # batch, so the merged read must equal one whole-corpus encode
    oracle="""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE embedding IS NOT NULL),
    comp AS (
        SELECT id, u.p AS j, e[u.p] AS x
        FROM v, LATERAL unnest(range(1, len(e) + 1)) AS u(p)),
    bounds AS (
        SELECT j, min(x) AS lo, max(x) AS hi FROM comp GROUP BY j)
    SELECT c.id, c.j,
           CAST(coalesce(
               least(greatest(floor((c.x - b.lo)
                                    / nullif(b.hi - b.lo, 0.0)
                                    * 255 + 0.5), 0), 255),
               0) AS INT) AS code
    FROM comp c JOIN bounds b ON c.j = b.j
    """,
)
def streamed_sq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantized-index maintenance
    (streaming.sinks.maintain_sq_codes + read_sq_codes): SQ8 bounds
    train ONCE on the corpus (the frozen index artifact — per-batch
    retraining would silently re-scale history), then vectors stream
    through three availableNow micro-batches, each writing its own
    code partition; the merged table must equal one whole-corpus
    encode exactly. This is how a quantized ANN index actually grows
    under ingestion: codes append per batch, the bounds artifact only
    changes on an explicit re-index."""
    import os
    import tempfile

    from news_data_pipeline_spark.operators.sq import sq_train
    from news_data_pipeline_spark.streaming.sinks import (
        maintain_sq_codes,
        read_sq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    if not emb.head(1):
        # same declared schema as read_sq_codes' unwritten-path
        # fallback — j/code are INT (posexplode position), id bigint
        return spark.createDataFrame([], "id bigint, j int, code int")
    bounds = sq_train(emb)
    root = tempfile.mkdtemp(prefix="sq_stream_q_")
    landing = os.path.join(root, "landing")
    for i in range(3):
        emb.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = maintain_sq_codes(
        stream,
        bounds,
        id_col="vec_id",
        vec_col="embedding",
        codes_path=os.path.join(root, "codes"),
        checkpoint=os.path.join(root, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    return read_sq_codes(spark, os.path.join(root, "codes"))


def _pqr_oracle() -> str:
    from news_data_pipeline_spark.queries.corpusops import _PQR_PREFIX

    return f"""
    WITH {_PQR_PREFIX}
    SELECT cd.id, cd.sub, cd.code, a.ccid AS cid
    FROM codes cd JOIN cassign a ON cd.id = a.id
    """


_SPQ_ARTIFACTS: dict = {}


def _spq_frozen_artifacts(spark: SparkSession, emb, sf_dir: str):
    """Train-once frozen index artifacts for ``streamed_pq_codes``,
    keyed by (dataset directory, content fingerprint) — a regenerated
    dataset retrains instead of serving stale artifacts (the r7
    ``_pq_trained_codebooks``
    discipline: only bounded collected rows — 16 centroids +
    k*m*sub_dim codebook scalars — ever live on the driver; DataFrames
    are rebuilt on the calling session). Training is deterministic, so
    a cache hit is value-identical to retraining — and retraining per
    run was ~40% of the query's wall-clock for artifacts whose entire
    point is that they are frozen across micro-batches."""
    from news_data_pipeline_spark.operators.pq import (
        pq_residuals,
        pq_train,
    )

    key = (sf_dir, dataset_fingerprint(sf_dir, "embeddings"))
    art = _SPQ_ARTIFACTS.get(key)
    if art is None:
        cent_rows = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.orderBy("vec_id").limit(16).collect()
        ]
        centroids = spark.createDataFrame(
            cent_rows, "cid bigint, c_vec array<double>"
        )
        cb_rows = [
            (r["sub"], r["cid"], r["j"], r["value"])
            for r in pq_train(
                pq_residuals(emb, centroids),
                id_col="id",
                vec_col="rvec",
                m=4,
                k=16,
                sub_dim=16,
                iters=1,
            ).collect()
        ]
        art = (cent_rows, cb_rows)
        _evict_stale(_SPQ_ARTIFACTS, sf_dir)
        _SPQ_ARTIFACTS[key] = art
    cent_rows, cb_rows = art
    from news_data_pipeline_spark.operators.pq import _local_codebook

    return (
        spark.createDataFrame(cent_rows, "cid bigint, c_vec array<double>"),
        _local_codebook(spark, cb_rows),
    )


@register("streamed_pq_codes", oracle=_pqr_oracle())
def streamed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming residual IVF×PQ index maintenance
    (streaming.sinks.maintain_pq_codes + read_pq_codes — the
    by_residual=true twin of streamed_sq_codes, completing the
    streamed-index family for the FAISS-default layout): coarse
    centroids and residual codebooks train ONCE (frozen artifacts,
    bounded collected rows cached per dataset dir —
    ``_spq_frozen_artifacts``), then vectors stream through two
    availableNow micro-batches, each writing its own cid-carrying
    code partition; the merged table must equal one whole-corpus
    residual encode exactly. Codes append per batch, the artifacts
    only change on an explicit re-index.

    NULL embeddings are filtered up front to match the oracle's ``v``
    CTE (ADVICE r9: a NULL in the first 16 vec_ids would crash the
    centroid collect and diverge from the first-16-non-null
    convention). Batch count is two, not three — the round-10 profile
    measured ~2 s of FIXED per-trigger toll (stage scheduling, not
    data: 1/2/3 triggers → 2.7/4.6/6.6 s stream time at sf0.01), and
    two partitions already prove the merge semantics the query
    exists to pin."""
    import os
    import tempfile

    from news_data_pipeline_spark.streaming.sinks import (
        maintain_pq_codes,
        read_pq_codes,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    if not emb.head(1):
        return spark.createDataFrame(
            [], "id bigint, sub int, code int, cid bigint"
        )
    centroids, codebooks = _spq_frozen_artifacts(spark, emb, sf_dir)
    root = tempfile.mkdtemp(prefix="pq_stream_q_")
    landing = os.path.join(root, "landing")
    for i in range(2):
        emb.where(F.col("vec_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"f{i}"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = maintain_pq_codes(
        stream,
        centroids,
        codebooks,
        id_col="vec_id",
        vec_col="embedding",
        sub_dim=16,
        codes_path=os.path.join(root, "codes"),
        checkpoint=os.path.join(root, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    return read_pq_codes(spark, os.path.join(root, "codes"))
