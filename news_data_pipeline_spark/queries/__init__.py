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


def _interleave_registry() -> None:
    """Round-robin the registry across its defining modules.

    Harnesses that sweep ``queries()`` under a budget (the round-1
    driver recorded only the first ~50 entries, in registration order)
    should see a representative mix of every subsystem in ANY prefix —
    not all of one module and none of the last. Deterministic: module
    import order x in-module definition order.
    """
    import itertools

    groups: dict[str, list[str]] = {}
    for name, q in QUERIES.items():
        groups.setdefault(q.fn.__module__, []).append(name)
    order = [
        name
        for batch in itertools.zip_longest(*groups.values())
        for name in batch
        if name is not None
    ]
    reordered = {name: QUERIES[name] for name in order}
    QUERIES.clear()
    QUERIES.update(reordered)


_interleave_registry()

__all__ = ["QUERIES", "oracle_map", "query_map"]
