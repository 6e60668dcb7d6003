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


def _order_registry() -> None:
    """Order the registry: never-yet-verified queries first.

    Harnesses that sweep ``queries()`` under a budget (the driver
    records only the first ~50 entries, in registration order) should
    spend that budget on queries that have never had a recorded
    correctness row. ``RECORDED.txt`` (repo root, committed) lists the
    names already seen in a ``CORRECTNESS_r*.json``; unseen names sort
    first. Within each tier, round-robin across defining modules so any
    prefix still mixes every subsystem. Deterministic: tier x module
    import order x in-module definition order.
    """
    import itertools
    from pathlib import Path

    recorded: set[str] = set()
    recorded_file = Path(__file__).resolve().parents[2] / "RECORDED.txt"
    if recorded_file.is_file():
        recorded = set(recorded_file.read_text().split())

    def interleave(names: list[str]) -> list[str]:
        groups: dict[str, list[str]] = {}
        for name in names:
            groups.setdefault(QUERIES[name].fn.__module__, []).append(name)
        return [
            name
            for batch in itertools.zip_longest(*groups.values())
            for name in batch
            if name is not None
        ]

    unseen = [n for n in QUERIES if n not in recorded]
    seen = [n for n in QUERIES if n in recorded]
    order = interleave(unseen) + interleave(seen)
    reordered = {name: QUERIES[name] for name in order}
    QUERIES.clear()
    QUERIES.update(reordered)


_order_registry()

__all__ = ["QUERIES", "oracle_map", "query_map"]
