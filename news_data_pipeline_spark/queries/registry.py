"""Query registry: name -> (spark_fn, oracle_sql | None).

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing values, so names are part of correctness. Floating-point
aggregates are rounded (2dp money, 4dp ratios, 6dp similarities) on BOTH
sides so cross-engine summation-order differences can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: SparkQuery
    oracle: str | None  # None => driver runs the weaker rows-only check


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(fn=fn, oracle=oracle)
        return fn

    return deco


def query_signature(name: str) -> str:
    """Content signature of a registered query: oracle SQL + fn source.

    ``RECORDED.txt`` stores this signature next to each recorded name so
    that editing either the implementation or the oracle invalidates the
    stale correctness row — the registry ordering then re-prioritizes
    the query into the never-verified prefix a budgeted harness sweep
    actually reaches. Whitespace-normalized so pure reformatting does
    not churn entries.
    """
    import hashlib
    import inspect

    q = QUERIES[name]
    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):  # pragma: no cover - frozen/interactive
        src = q.fn.__qualname__
    blob = " ".join(((q.oracle or "") + "\n" + src).split())
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def query_map() -> dict[str, SparkQuery]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}
