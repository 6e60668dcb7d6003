"""Reproduce the SCALE.md dedup probe: 100k duplicate-heavy docs.

Generates the corpus JVM-side (no driver transfer), then times
winnowing, SimHash, cluster-representative dedup, and (optionally,
``--pairs``) the quadratic-output pair enumeration for contrast.

    python tools/scale_probe.py [--docs 100000] [--pairs]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from news_data_pipeline_spark.operators import dedup  # noqa: E402
from news_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--pairs", action="store_true",
                    help="also run pair enumeration (quadratic output)")
    args = ap.parse_args()

    spark = get_spark("scale_probe")
    # ~40 words/doc from a 200-word vocabulary; doc ids repeat text every
    # 200 ids -> a 500-way-duplicated corpus at the default size, the
    # adversarial case for pair-based dedup.
    words = F.array(
        *[
            F.concat(
                F.lit("w"),
                ((F.col("id") * 37 + F.lit(i * 13)) % 200).cast("string"),
            )
            for i in range(40)
        ]
    )
    docs = (
        spark.range(args.docs)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .persist()
    )
    print(f"corpus: {docs.count()} docs")

    def timed(name, df):
        # accepts a DataFrame or a thunk; thunks time CONSTRUCTION too,
        # which matters for operators whose checkpoint cadence executes
        # jobs eagerly while the plan is being built (pagerank)
        t0 = time.perf_counter()
        if callable(df):
            df = df()
        n = df.count()
        print(f"{name}: {time.perf_counter() - t0:.1f}s, {n} rows")

    timed("winnow_fingerprints", dedup.winnow_fingerprints(docs, "doc_id", "text"))
    timed("span_dedup_stats", dedup.span_dedup_stats(docs, "doc_id", "text"))
    timed(
        "sorted_neighborhood_pairs",
        dedup.sorted_neighborhood_pairs(docs, "doc_id", "text"),
    )
    timed("simhash", dedup.simhash(docs, "doc_id", "text"))
    timed(
        "lsh_dedup_representatives",
        dedup.lsh_dedup_representatives(docs, "doc_id", "text"),
    )
    if args.pairs:
        timed(
            "minhash_lsh_dedup_pairs (quadratic output — expect minutes)",
            dedup.minhash_lsh_dedup_pairs(docs, "doc_id", "text"),
        )

    # Iterative graph ops on a synthetic power-law-ish link graph:
    # ~10 out-edges per node, destinations clustered by a modular hash
    # so components/ranks are non-trivial. Times the per-hop cost and
    # exercises the checkpoint cadence at depth.
    from news_data_pipeline_spark.operators import graph  # noqa: E402

    n_nodes = args.docs
    dsts = F.array(
        *[
            ((F.col("id") * F.lit(7 + 2 * k) + F.lit(k * k)) % n_nodes)
            for k in range(10)
        ]
    )
    edges = (
        spark.range(n_nodes)
        .select(F.col("id").alias("src"), F.explode(dsts).alias("dst"))
        .persist()
    )
    print(f"graph: {edges.count()} edges over {n_nodes} nodes")
    timed(
        "pagerank iters=10 (checkpoint_every=1)",
        lambda: graph.pagerank(edges, "src", "dst", iters=10),
    )
    timed(
        "connected_components max_iter=10 (checkpoint_every=2)",
        lambda: graph.connected_components(
            edges, "src", "dst", max_iter=10, checkpoint_every=2
        ),
    )
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
