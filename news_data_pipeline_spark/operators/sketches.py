"""Mergeable frequency sketches: count-min heavy hitters.

The reference pipeline reports exact token frequencies (its corpora fit
one node); at 100 TB the exact groupBy is still linear but its full
distinct-token table may not be, so streaming/telemetry consumers want
a fixed-size mergeable summary instead. A count-min sketch is the
standard answer: ``depth`` hash rows of ``width`` counters, updated by
adding each token's count to one counter per row, queried by taking the
min over its row counters. The sketch is a monoid — counters add — so
it partial-aggregates map-side, merges across partitions, executors,
days, or streams, and never exceeds ``depth * width`` BIGINTs.

Hashes are the repo's cross-engine scheme (md5 + substring + base-16,
as ``operators.dedup.simhash``): every bucket index reproduces exactly
in ANSI SQL, so the sketch is value-verifiable by the DuckDB oracle —
unlike xxhash64, which has no SQL twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bucket(col, row: int, width: int):
    """Counter index of ``col`` in hash row ``row``: the first 32 hash
    bits of md5('cms{row}:' || token) mod width. Non-negative, so plain
    ``%`` agrees between engines."""
    digest = F.md5(F.concat(F.lit(f"cms{row}:"), col))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % F.lit(width)
    ).cast("long")


def cms_sketch(
    weighted: DataFrame,
    term_col: str,
    weight_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of a weighted term table: (row, bucket, counter).

    One shuffle: the depth bucket columns melt through ``stack`` (still
    whole-stage codegen) and group to at most ``depth * width`` rows
    with map-side partial sums — the full sketch is a broadcastable
    constant-size frame no matter the corpus size. Union two sketches
    and re-group to merge streams/partitions/days.
    """
    term = F.col(term_col)
    stack_args: list = []
    for j in range(depth):
        stack_args.append(F.lit(j))
        stack_args.append(_bucket(term, j, width))
    melted = weighted.select(
        F.stack(F.lit(depth), *stack_args).alias("row", "bucket"),
        F.col(weight_col).alias("__w"),
    )
    return melted.groupBy("row", "bucket").agg(
        F.sum("__w").cast("long").alias("counter")
    )


def cms_estimates(
    terms: DataFrame,
    term_col: str,
    sketch: DataFrame,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query every term against the sketch: adds ``cms_estimate``.

    The estimate is the min over the term's ``depth`` counters; it
    over-counts (hash collisions only ever add), never under-counts.
    Each row's counters arrive by a broadcast join against the
    constant-size sketch — the probe side never shuffles.

    The sketch subtree re-executes once per hash row here (the same
    measured tradeoff as tfidf_cosine_pairs' weights: persisting a
    cheap subtree loses at local scale). On a cluster, persist or
    pre-write the sketch first — it is <= depth * width rows, the
    canonical "build once, probe forever" index artifact
    (maintain_cms_sketch in streaming.sinks does exactly that).
    """
    est = terms
    for j in range(depth):
        row_j = (
            sketch.where(F.col("row") == j)
            .select("bucket", F.col("counter").alias(f"__c{j}"))
        )
        est = est.join(
            F.broadcast(row_j),
            _bucket(F.col(term_col), j, width) == F.col("bucket"),
        ).drop("bucket")
    estimate = F.least(*[F.col(f"__c{j}") for j in range(depth)])
    return est.withColumn("cms_estimate", estimate.cast("long")).drop(
        *[f"__c{j}" for j in range(depth)]
    )


def cms_heavy_hitters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    k: int = 30,
) -> DataFrame:
    """Top-k corpus tokens by count-min estimate, with exact counts.

    Pipeline: exact token counts (one map-side-combined shuffle — the
    same linear pass any frequency query pays) -> constant-size sketch
    -> broadcast point-queries -> TakeOrderedAndProject top-k on
    (estimate DESC, token ASC). Emitting the exact count beside the
    estimate makes the sketch's one-sided error auditable:
    ``cms_estimate >= exact_count`` always (pinned in tests and by the
    oracle's value hash). At 100 TB, drop the exact-count column and the
    distinct-token table feeds ONLY the fixed-size sketch, which then
    answers point queries without rescanning the corpus.
    """
    from news_data_pipeline_spark.operators.dedup import word_shingles

    tokens = word_shingles(
        df, id_col, text_col, n=1, distinct=False
    ).withColumnRenamed("shingle", "token")
    counts = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    sketch = cms_sketch(
        counts, "token", "exact_count", depth=depth, width=width
    )
    est = cms_estimates(counts, "token", sketch, depth=depth, width=width)
    return (
        est.select("token", "cms_estimate", "exact_count")
        .orderBy(F.col("cms_estimate").desc(), F.col("token").asc())
        .limit(k)
    )
