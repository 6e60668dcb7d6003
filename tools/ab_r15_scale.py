"""Cluster-shaped-fixture A/Bs for the r15 shape decisions that sf0.1
cannot decide (VERDICT items 3, 4, 7): synthetic inputs 1-2 orders
bigger than sf0.1, where data work dominates fixed overhead.

Pairs:
- sq:     sq_adc_topk join form vs row-local, synthetic n x 64-dim
          vectors (default 400k), 5 queries — plus per-arm shuffle
          bytes from the app status store so the byte elimination is
          a number, not a claim.
- cms:    cms_heavy_hitters lazy (depth+1 corpus passes) vs
          materialize=True (2 passes), synthetic documents (default
          400k docs x ~30 tokens).
- tfidf:  tfidf_cosine_pairs lazy weights (4 tokenize subtrees) vs a
          localCheckpoint'ed weights frame (1), same synthetic docs
          with a Zipf-ish vocab so max_df filtering stays realistic.

Standing protocol: warmed, rotated, medians over 6 rounds, noop sink.

Usage: python tools/ab_r15_scale.py [n_rows] [pair ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402

WARM_ROUNDS = 1
TIMED_ROUNDS = 6


def shuffle_totals(spark):
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    seq = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    return [
        (seq.apply(i).stageId(), seq.apply(i).shuffleWriteBytes())
        for i in range(seq.size())
    ]


def synth_vectors(spark, n):
    """n 64-dim deterministic vectors (id, embedding)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id") * 64 + j), F.lit(1000))
                / 500.0 - 1.0
            ),
        ).alias("embedding"),
    )


def synth_docs(spark, n):
    """n documents of 30 Zipf-ish tokens: token rank ~ hash^2 skew."""
    word = lambda c: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(
            F.pmod(F.xxhash64(c), F.lit(4000))
            * F.pmod(F.xxhash64(c + 7), F.lit(4000)) / 4000,
            F.lit(4000),
        ).cast("int").cast("string"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda j: word(F.col("id") * 31 + j),
            ),
        ).alias("text"),
    )


def main() -> None:
    from news_data_pipeline_spark.operators.sketches import (
        cms_heavy_hitters as cms_op,
    )
    from news_data_pipeline_spark.operators.sq import (
        sq_adc_topk,
        sq_encode,
        sq_train,
    )
    from news_data_pipeline_spark.operators.terms import (
        tfidf_cosine_pairs,
    )
    from news_data_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    pairs = sys.argv[2:] or ["sq", "cms", "tfidf"]
    spark = get_spark("ab_r15_scale")

    import tempfile

    root = tempfile.mkdtemp(prefix="ab_r15_scale_")
    synth_vectors(spark, n).write.parquet(f"{root}/emb")
    synth_docs(spark, n).write.parquet(f"{root}/docs")
    emb = spark.read.parquet(f"{root}/emb")
    docs = spark.read.parquet(f"{root}/docs")

    def sq_join():
        bounds = sq_train(emb)
        codes = sq_encode(emb, bounds)
        return sq_adc_topk(
            emb.where(F.col("vec_id") < 5), codes, bounds, k=10
        )

    def sq_rowlocal():
        bounds = sq_train(emb)
        return sq_adc_topk(
            emb.where(F.col("vec_id") < 5), None, bounds, k=10, corpus=emb
        )

    def cms_lazy():
        return cms_op(docs, "doc_id", "text", depth=4, width=256, k=30)

    def cms_mat():
        return cms_op(
            docs, "doc_id", "text", depth=4, width=256, k=30,
            materialize=True,
        )

    def tfidf_lazy():
        return tfidf_cosine_pairs(
            docs, "doc_id", "text", max_df=0.001, min_cosine=0.3
        )

    def tfidf_ckpt():
        return tfidf_cosine_pairs(
            docs, "doc_id", "text", max_df=0.001, min_cosine=0.3,
            materialize=True,
        )

    suites = {
        "sq": {"sq_join": sq_join, "sq_rowlocal": sq_rowlocal},
        "cms": {"cms_lazy": cms_lazy, "cms_mat": cms_mat},
        "tfidf": {"tfidf_lazy": tfidf_lazy, "tfidf_ckpt": tfidf_ckpt},
    }

    for pair in pairs:
        arms = suites[pair]
        names = tuple(arms)

        def run(nm):
            before = shuffle_totals(spark)
            last = max((sid for sid, _ in before), default=-1)
            t0 = time.perf_counter()
            arms[nm]().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            after = shuffle_totals(spark)
            wr = sum(w for sid, w in after if sid > last)
            return dt, wr

        for _ in range(WARM_ROUNDS):
            for nm in names:
                run(nm)
        reps = {nm: [] for nm in names}
        bytes_ = {nm: [] for nm in names}
        for r in range(TIMED_ROUNDS):
            order = names[r % len(names):] + names[: r % len(names)]
            for nm in order:
                dt, wr = run(nm)
                reps[nm].append(dt)
                bytes_[nm].append(wr)
        for nm in names:
            print(
                f"RESULT [{n}] {pair:6s} {nm:13s}: "
                f"med {statistics.median(reps[nm]):.3f}s "
                f"min {min(reps[nm]):.3f} max {max(reps[nm]):.3f} "
                f"shufWr {statistics.median(bytes_[nm])/1e6:.1f} MB",
                flush=True,
            )

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
