"""Declared query surface: every operator from SURVEY §2 plus the
LLM-data-pipeline extensions, each as a (PySpark callable, ANSI-SQL
oracle) pair consumed by ``__spark_entry__`` and the driver's
DuckDB-oracle correctness gate.
"""

from news_data_pipeline_spark.queries.registry import QUERIES, oracle_map, query_map

# Importing the content modules populates the registry.
from news_data_pipeline_spark.queries import (  # noqa: E402,F401
    llmdata,
    pipeline,
    relational,
    streaming_batch,
)

__all__ = ["QUERIES", "oracle_map", "query_map"]
