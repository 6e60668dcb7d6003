"""Scalar quantization (SQ8): per-dimension uint8 codes + asymmetric
distance — FAISS's ``IndexScalarQuantizer(QT_8bit)`` recast as
DataFrame plans, completing the quantization family next to product
quantization (``operators.pq``) and sign buckets
(``similarity.sign_bucket``).

Where PQ compresses by joint sub-vector codebooks (4 bytes per 64-dim
vector at m=4), SQ keeps one byte PER DIMENSION (64 bytes) but needs no
codebook training — only per-dimension min/max bounds, a dims-sized
frame any scan produces in one map-side-combined pass. The trade is
the standard one: SQ is the cheap-to-build, moderate-compression arm;
PQ the trained, high-compression arm; both score candidates without
touching raw floats.

Exactness discipline (the repo's cross-engine contract): quantization
and dequantization are pure IEEE expressions (``(x-lo)/(hi-lo)*255``,
``lo + code*(hi-lo)/255``) — bit-identical on any engine for identical
inputs — and every distance is an exact BIGINT sum of 12dp-settled
per-dimension terms, settled once to 6dp at the end. No reference
counterpart (the reference has no ANN at all); the design follows the
public FAISS scalar-quantizer layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from news_data_pipeline_spark.functions.exact import settled_round, settled_units
from news_data_pipeline_spark.operators.fanout import fan_out
from news_data_pipeline_spark.operators.similarity import _as_double


def _components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, j, x): one row per vector component, j 1-based."""
    v = fan_out(
        df.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"), _as_double(vec_col).alias("__v")
        )
    )
    return v.select(
        "id", F.posexplode("__v").alias("__p", "x")
    ).select("id", (F.col("__p") + 1).alias("j"), "x")


def sq_train(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension quantization bounds: (j, lo, hi).

    One map-side-combined min/max aggregation — the whole "index
    training" is a dims-sized frame (64 rows for 64-dim vectors),
    broadcastable forever after. Unlike PQ there is nothing iterative:
    rebuilding after corpus growth is one linear pass.
    """
    return (
        _components(df, id_col, vec_col)
        .groupBy("j")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def _code_expr(x, lo, hi):
    # (x-lo)/(hi-lo)*255 half-up, clipped to [0,255]; a constant
    # dimension (hi == lo) carries no information -> code 0
    scaled = F.floor((x - lo) / F.nullif(hi - lo, F.lit(0.0)) * 255 + 0.5)
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(255)), F.lit(0)
    ).cast("int")


def sq_encode(
    df: DataFrame,
    bounds: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, j, code): every vector as one uint8-range code per
    dimension under the trained bounds — the stored form of an SQ
    index (pack to bytes at the storage boundary; scalar rows keep the
    engine join-friendly and the oracle canonicalizable). One narrow
    map + a broadcast of the dims-sized bounds frame."""
    comp = _components(df, id_col, vec_col)
    return comp.join(F.broadcast(bounds), on="j").select(
        "id", "j", _code_expr(F.col("x"), F.col("lo"), F.col("hi")).alias("code")
    )


def sq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    bounds: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Asymmetric top-``k`` by squared L2: exact query components
    against dequantized corpus codes — (query_id, neighbor_id,
    sq_dist, rank), ascending with neighbor-id tie-break, self-pairs
    excluded.

    Per (candidate component): dequantize ``lo + code*(hi-lo)/255``
    (broadcast bounds), square the difference against the broadcast
    query component, settle to 12dp BIGINT units, and sum exactly per
    pair — order-free, so partition layout can never flip a distance.
    The scan is ``codes`` joined to two bounded broadcasts with a
    map-side partial aggregation: the same single-pass shape as
    ``pq_adc_topk``'s flat scan, which SCALE.md's round-8 sweep showed
    is the right in-memory arm; compose with IVF cells exactly as PQ
    does when scan pruning matters.
    """
    qcomp = _components(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), "j", F.col("x").alias("qx")
    )
    deq = F.col("lo") + F.col("code") * (F.col("hi") - F.col("lo")) / 255
    diff = F.col("qx") - deq
    scored = (
        codes.join(F.broadcast(bounds), on="j")
        .join(F.broadcast(qcomp), on="j")
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(
            settled_round(
                F.sum(settled_units(diff * diff, 12)) / 1e12, 6
            ).alias("sq_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("sq_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sq_dist", "rank")
    )
