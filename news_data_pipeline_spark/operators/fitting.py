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


def logreg_train(
    df: DataFrame,
    *,
    y_col: str,
    vec_col: str,
    dims: int,
    iters: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """In-engine logistic-regression training: full-batch gradient
    descent on a binary target over the first ``dims`` embedding
    components, returning ``(pos, weight)`` scalar rows.

    The training-loop pattern is ``kmeans_iterate``'s (similarity.py):
    each iteration is ONE distributed aggregate — grad_j =
    avg((sigmoid(w.x) - y) * x_j), a posexplode + per-position average,
    map-side combined — and only the ``dims`` gradient values come back
    to the driver, re-planted as literals for the next pass. Plans stay
    constant-size at any iteration count; nothing quadratic, nothing
    cached. Deterministic: fixed zero init, fixed lr, full-batch (no
    sampling), so the whole trajectory is a pure function of the data —
    which is what lets an ANSI-SQL oracle unroll the iterations and
    verify the training loop EXACTLY (see ``logreg_label_weights``).

    No bias term and no regularization — this pins the distributed
    gradient machinery, not a production classifier; both are one more
    term in the same aggregate.
    """
    import pyspark.sql.functions as F

    if dims < 1 or iters < 1:
        raise ValueError(f"dims and iters must be >= 1, got {dims}, {iters}")
    base = df.select(
        F.col(y_col).cast("double").alias("y"),
        F.slice(F.col(vec_col).cast("array<double>"), 1, dims).alias("x"),
    ).where(F.col("x").isNotNull() & (F.size("x") == dims) & F.col("y").isNotNull())
    w = [0.0] * dims
    for _ in range(iters):
        w_lit = F.array(*[F.lit(wi) for wi in w])
        z = F.aggregate(
            F.zip_with(F.col("x"), w_lit, lambda x, wv: x * wv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")).alias(
            "r"
        )
        grads = (
            base.select(resid, F.posexplode("x").alias("pos", "xj"))
            .groupBy("pos")
            .agg(F.avg(F.col("r") * F.col("xj")).alias("g"))
            .collect()
        )
        g = {r["pos"]: r["g"] for r in grads}
        # empty training set (or all rows filtered) -> zero gradient:
        # GD over no data leaves the weights at their init, mirrored in
        # the SQL oracle by coalesce(avg(...), 0.0)
        w = [w[j] - lr * g.get(j, 0.0) for j in range(dims)]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, round(wj, 6)) for j, wj in enumerate(w)], "pos int, weight double"
    )
