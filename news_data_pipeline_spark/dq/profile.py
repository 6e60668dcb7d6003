"""One-pass column profiling: the "what am I looking at" DQ primitive.

The reference's DQ framework checks rules it's told about
(`/root/reference/notebooks/_lib_dq_helpers.py:105-190`); profiling is
the discovery step before that — per-column null rates, cardinalities,
and value ranges over an arbitrary frame, so rule thresholds (NotNull,
Unique, min_rows) are chosen from measured data instead of guessed.

Shape at scale: ONE aggregation job for the whole profile. The exact
path computes every column's `count(DISTINCT)` in the same aggregate,
which Spark plans as an Expand (input replicated once per distinct
aggregate) feeding a single shuffle — fine into the tens of columns,
but the replication factor IS the column count. The `exact=False` path
swaps in `approx_count_distinct` (HyperLogLog, relative error ~2.3%):
no Expand, plain one-shuffle partial aggregation — the 100-TB default,
with `exact=True` as the oracle-verifiable twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) into one row per column:
    ``(col_name, n_rows, n_non_null, n_distinct, min_value, max_value)``.

    min/max evaluate in each column's NATIVE ordering (numeric min, not
    lexicographic) and cast to string afterwards, so heterogeneous
    column types fit one output schema without changing semantics.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: no such columns {missing}")
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_non_null, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_non_null", "n_distinct", "min_value", "max_value"
    )
