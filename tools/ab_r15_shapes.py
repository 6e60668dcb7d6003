"""Rotated A/Bs for the r15 shape changes (VERDICT items 3, 4, 6).

Three pairs, standing protocol (every arm warmed, within-round arm
order rotated, medians over >= 2 x n_arms rounds, noop sink, sf0.1):

- sq:       sq_adc_topk join form (stored codes) vs row-local scoring
- cms:      cms_heavy_hitters lazy sketch (5 corpus passes) vs
            materialize=True (bounded collect, 2 passes)
- curve:    ann_recall_nprobe_curve r15 multi-arm plan vs the pre-r15
            per-arm union (inlined here for comparison only)

Usage: python tools/ab_r15_shapes.py [sf_dir] [pair ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

WARM_ROUNDS = 1
TIMED_ROUNDS = 6


def curve_old(spark, emb, *, n_eval=10, nlist=16,
              nprobes=(1, 2, 4, 8, 16), k=5):
    """Pre-r15 per-arm union shape, verbatim (for the A/B only)."""
    from news_data_pipeline_spark.functions.exact import settled_round
    from news_data_pipeline_spark.operators import similarity
    from news_data_pipeline_spark.operators.similarity import (
        _assign_cells,
        dot,
    )

    queries = emb.where(F.col("vec_id") < n_eval)
    exact = similarity.cosine_topk(
        emb, queries, id_col="vec_id", k=k
    ).select("query_id", "neighbor_id")
    centroids = emb.orderBy("vec_id").limit(nlist).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    ).withColumn("c2", dot(F.col("c_vec"), F.col("c_vec")))
    cell_sizes = (
        _assign_cells(emb, centroids, "vec_id", "embedding", "nid", 1)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    arms = []
    for n in nprobes:
        approx = similarity.ivf_topk(
            emb, queries, k=k, nlist=nlist, nprobe=n,
        ).select("query_id", F.col("neighbor_id").alias("__hit"))
        joined = exact.join(
            approx,
            on=[
                exact.query_id == approx.query_id,
                exact.neighbor_id == approx.__hit,
            ],
            how="left",
        ).select("__hit")
        hits = joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        reads = (
            _assign_cells(
                queries, centroids, "vec_id", "embedding", "query_id", n
            )
            .join(cell_sizes, on="cid")
            .agg(F.sum("n").cast("long").alias("vectors_read"))
        )
        arms.append(
            hits.crossJoin(reads).select(
                F.lit(n).cast("int").alias("nprobe"),
                "n_exact",
                "n_hits",
                settled_round(
                    F.col("n_hits") / F.col("n_exact").cast("double"), 4
                ).alias("recall_at_5"),
                "vectors_read",
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out


def main() -> None:
    from news_data_pipeline_spark.operators.sketches import (
        cms_heavy_hitters as cms_op,
    )
    from news_data_pipeline_spark.operators.sq import (
        sq_adc_topk,
        sq_encode,
        sq_train,
    )
    from news_data_pipeline_spark.queries.llmdata import (
        _recall_nprobe_curve,
    )
    from news_data_pipeline_spark.session import get_spark
    from news_data_pipeline_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = sys.argv[2:] or ["sq", "cms", "curve"]
    spark = get_spark("ab_r15_shapes")

    def sq_join():
        emb = load_table(spark, sf_dir, "embeddings")
        bounds = sq_train(emb)
        codes = sq_encode(emb, bounds)
        q = emb.where(F.col("vec_id") < 5)
        return sq_adc_topk(q, codes, bounds, k=10)

    def sq_rowlocal():
        emb = load_table(spark, sf_dir, "embeddings")
        bounds = sq_train(emb)
        q = emb.where(F.col("vec_id") < 5)
        return sq_adc_topk(q, None, bounds, k=10, corpus=emb)

    def cms_lazy():
        docs = load_table(spark, sf_dir, "documents")
        return cms_op(docs, "doc_id", "text", depth=4, width=256, k=30)

    def cms_mat():
        docs = load_table(spark, sf_dir, "documents")
        return cms_op(
            docs, "doc_id", "text", depth=4, width=256, k=30,
            materialize=True,
        )

    def curve_new_arm():
        emb = load_table(spark, sf_dir, "embeddings")
        return _recall_nprobe_curve(spark, emb, n_eval=10)

    def curve_old_arm():
        emb = load_table(spark, sf_dir, "embeddings")
        return curve_old(spark, emb, n_eval=10)

    suites = {
        "sq": {"sq_join": sq_join, "sq_rowlocal": sq_rowlocal},
        "cms": {"cms_lazy": cms_lazy, "cms_mat": cms_mat},
        "curve": {"curve_old": curve_old_arm, "curve_new": curve_new_arm},
    }

    for pair in pairs:
        arms = suites[pair]
        names = tuple(arms)
        # value-parity first: the A/B is meaningless if arms diverge
        frames = {n: arms[n]() for n in names}
        a, b = (
            sorted(map(tuple, frames[names[0]].collect())),
            sorted(map(tuple, frames[names[1]].collect())),
        )
        print(f"{pair}: arms value-identical = {a == b} "
              f"({len(a)} rows)", flush=True)

        def run(n):
            t0 = time.perf_counter()
            arms[n]().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            return dt

        for _ in range(WARM_ROUNDS):
            for n in names:
                run(n)
        reps = {n: [] for n in names}
        for r in range(TIMED_ROUNDS):
            order = names[r % len(names):] + names[: r % len(names)]
            for n in order:
                reps[n].append(run(n))
        for n in names:
            med = statistics.median(reps[n])
            print(
                f"RESULT {pair:6s} {n:12s}: med {med:.3f}s "
                f"min {min(reps[n]):.3f} max {max(reps[n]):.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
