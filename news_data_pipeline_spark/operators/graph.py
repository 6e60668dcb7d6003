"""Distributed graph clustering for dedup pipelines.

The near-dup operators emit PAIRS (edges); dedup needs GROUPS — every
document mapped to one canonical cluster id, so `id != component`
rows can be dropped in a single filter. ``connected_components`` is the
generic bridge: min-label propagation over an arbitrary edge list,
the same algorithm ``dedup.lsh_dedup_representatives`` runs on its
doc↔bucket bipartite graph, exposed for any pair source (MinHash/LSH
pairs, embedding near-dup pairs, exact-Jaccard survivors, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    nodes: DataFrame | None = None,
    node_col: str = "id",
    max_iter: int = 5,
) -> DataFrame:
    """(node, component) labels for the undirected graph in ``edges``,
    where ``component`` is the minimum node id reachable within
    ``max_iter`` hops — the full connected component whenever
    ``max_iter`` >= the component's diameter.

    Min-label propagation, one hop per iteration: every node takes the
    min of its own label and its neighbors' labels. Per iteration the
    cost is one shuffle of the (doubled) edge list plus a
    map-side-combined min aggregate — linear in |E|, nothing quadratic,
    no driver state; the plan grows linearly with ``max_iter`` (no
    checkpoints — same contract as ``lsh_dedup_representatives``, whose
    bipartite propagation this generalizes; near-dup clusters are
    near-cliques, so 2-3 hops close them). Isolated nodes (present in
    ``nodes`` but in no edge) keep their own id as the component.

    ``nodes`` optionally supplies the full vertex set (``node_col``);
    default is the nodes appearing in ``edges``. Node ids must be
    orderable and non-null.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if nodes is not None:
        base = nodes.select(F.col(node_col).alias("u")).distinct()
    else:
        base = sym.select("u").distinct()
    labels = base.withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("u").alias("v"), "label"), on="v")
            .groupBy("u")
            .agg(F.min("label").alias("__nbr"))
        )
        labels = labels.join(nbr_min, on="u", how="left").select(
            "u",
            F.least(
                F.col("label"), F.coalesce(F.col("__nbr"), F.col("label"))
            ).alias("label"),
        )
    return labels.select(
        F.col("u").alias(node_col), F.col("label").alias("component")
    )
