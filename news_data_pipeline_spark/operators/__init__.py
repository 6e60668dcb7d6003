from news_data_pipeline_spark.operators import (
    dedup,
    fanout,
    graph,
    joins,
    multimodal,
    packing,
    ranking,
    sampling,
    similarity,
    terms,
)

__all__ = [
    "dedup",
    "fanout",
    "graph",
    "joins",
    "multimodal",
    "packing",
    "ranking",
    "sampling",
    "similarity",
    "terms",
]
