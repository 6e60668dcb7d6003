"""Per-group model fitting via Arrow group-map (``applyInPandas``).

The escape hatch for per-group algorithms Catalyst can't express (the
reference runs them driver-side over collected pandas frames,
``03:58``-style): ship each group to an Arrow-batched Python worker and
fit there. Least squares IS expressible with built-in ``regr_*``
aggregates — ``queries/relational.py::nation_revenue_trend`` does
exactly that — so the grouped-OLS here deliberately duplicates a
Catalyst-expressible computation: it pins the ``applyInPandas`` path
against the same ANSI-SQL oracle, proving the pattern users will reach
for when their per-group fit (robust regression, seasonal decomposition,
changepoints) has no SQL twin.

Scale: group-map shuffles once on the grouping key and holds ONE group
in memory per task — safe while single groups fit in a worker (bounded
here: one group per nation x day rollup). Skewed mega-groups need
pre-aggregation before the fan-in, exactly as done here (fit runs on
the daily rollup, not raw orders).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    y_col: str,
    x_col: str,
) -> DataFrame:
    """Per-group simple least squares: (group..., slope, intercept, n).

    Fits with the textbook moment formula — slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2) — NOT numpy.polyfit's QR path, so the arithmetic
    matches the engines' ``regr_slope``/``regr_intercept`` definition
    and an ANSI-SQL oracle can verify the Python boundary exactly
    (within float rounding). Degenerate groups (n < 2 or zero x
    variance) return null slope/intercept, matching ``regr_*`` on the
    same input; pairs with a null x or y are skipped and ``n`` counts
    the surviving pairs (``regr_count`` semantics).
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import DoubleType, LongType

    group_cols = list(group_cols)
    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in group_cols if c not in by_name]
    if missing:
        raise ValueError(f"grouped_ols: unknown group columns {missing}")
    schema = StructType(
        [
            StructField(c, by_name[c].dataType, by_name[c].nullable)
            for c in group_cols
        ]
        + [
            StructField("slope", DoubleType()),
            StructField("intercept", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def fit(pdf):
        import pandas as pd

        # regr_* aggregates skip pairs where EITHER side is null; NaN
        # would otherwise poison every moment sum
        clean = pdf.dropna(subset=[x_col, y_col])
        x = clean[x_col].astype("float64")
        y = clean[y_col].astype("float64")
        n = float(len(clean))
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        denom = n * sxx - sx * sx
        if n < 2 or denom == 0.0:
            slope = intercept = None
        else:
            slope = (n * sxy - sx * sy) / denom
            intercept = (sy - slope * sx) / n
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame(
            {**head, "slope": [slope], "intercept": [intercept], "n": [int(n)]}
        )

    return df.groupBy(*group_cols).applyInPandas(fit, schema=schema)
