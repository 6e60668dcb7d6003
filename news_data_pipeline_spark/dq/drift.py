"""Drift detection: schema drift and distribution drift (PSI).

Continuous ingestion fails quietly in two ways the row-level DQ rules
don't see: the SHAPE of the data changes (a source adds, drops, or
retypes a column — schema drift), and the DISTRIBUTION of values moves
while every row still passes its rules (population drift). Both are
standard pre-training-data gates; both are reported AS DATA (the DQ
engine's report-as-data philosophy, ``dq/engine.py``) so they compose
with the same sinks and thresholds as every other check.

Schema drift is pure driver-side metadata (two StructTypes) — zero
jobs. PSI is two ONE-PASS aggregations (one per frame): bin counts via
a shared fixed bin specification, then the index from the two
histograms — at 100 TB that is two map-side-combinable scans with
O(bins) shuffle rows, nothing collected but the final histogram.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def schema_drift(expected, observed) -> list[tuple[str, str, str, str]]:
    """Compare two schemas; [] means no drift.

    Returns ``(column, kind, expected, observed)`` rows with kinds
    ``missing`` (declared but absent), ``added`` (present but
    undeclared), ``type_changed``, and ``nullability_tightened``
    (expected nullable=False but observed nullable=True — the direction
    that breaks writers; loosening is not drift). Accepts StructType or
    any DataFrame (its schema is used).
    """
    es = expected.schema if isinstance(expected, DataFrame) else expected
    os_ = observed.schema if isinstance(observed, DataFrame) else observed
    e = {f.name: f for f in es.fields}
    o = {f.name: f for f in os_.fields}
    out: list[tuple[str, str, str, str]] = []
    for name, f in e.items():
        if name not in o:
            out.append((name, "missing", f.dataType.simpleString(), ""))
        else:
            g = o[name]
            if f.dataType != g.dataType:
                out.append(
                    (
                        name,
                        "type_changed",
                        f.dataType.simpleString(),
                        g.dataType.simpleString(),
                    )
                )
            if not f.nullable and g.nullable:
                out.append(
                    (name, "nullability_tightened", "not null", "nullable")
                )
    for name, g in o.items():
        if name not in e:
            out.append((name, "added", "", g.dataType.simpleString()))
    return out


def schema_drift_report(spark, expected, observed) -> DataFrame:
    """``schema_drift`` as a report frame: (column, kind, expected,
    observed) — empty frame == no drift."""
    rows = schema_drift(expected, observed)
    return spark.createDataFrame(
        rows, "column string, kind string, expected string, observed string"
    )


def _bin_counts(df: DataFrame, col: str, edges: list[float]) -> DataFrame:
    """(bin, n) histogram over fixed edges; nulls are their own bin -1,
    values outside [edges[0], edges[-1]] clamp into the end bins (a
    shifted distribution must LAND somewhere visible, not vanish)."""
    c = F.col(col).cast("double")
    nbins = len(edges) - 1
    # width-uniform edges -> closed-form bin index (no per-edge CASE
    # chain); clamp keeps outliers in the terminal bins
    lo, hi = edges[0], edges[-1]
    width = (hi - lo) / nbins
    idx = F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")
    idx = F.least(F.greatest(idx, F.lit(0)), F.lit(nbins - 1))
    # NaN is not null: without its own branch, floor(NaN).cast(int) is 0
    # in non-ANSI Spark and NaN rows would silently land in the lowest
    # bin — route them to the missing-value bin alongside nulls
    binned = F.when(c.isNull() | F.isnan(c), F.lit(-1)).otherwise(idx)
    return df.select(binned.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def population_stability_index(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> tuple[float, DataFrame]:
    """PSI of ``col`` between a reference and a current frame.

    PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref), with
    proportions floored at ``epsilon`` so an empty bin contributes a
    large-but-finite term (the standard convention). Rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action. The bin
    specification (``lo``/``hi``/``bins``) is an INPUT — both frames
    must be binned identically, and at 100 TB you choose it once from
    the reference profile (``dq/profile.py``) rather than re-deriving
    per batch. Null rates drift too, so nulls occupy their own bin.

    Returns ``(psi, detail)`` where ``detail`` is the per-bin frame
    (bin, ref_n, cur_n, ref_p, cur_p, contribution) — report-as-data.
    The per-bin arithmetic runs driver-side on the two collected
    histograms (O(bins) rows — bounded by construction).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    edges = [lo + (hi - lo) * i / bins for i in range(bins + 1)]
    ref = {r["bin"]: r["n"] for r in _bin_counts(reference, col, edges).collect()}
    cur = {r["bin"]: r["n"] for r in _bin_counts(current, col, edges).collect()}
    ref_total = sum(ref.values()) or 1
    cur_total = sum(cur.values()) or 1
    # floor-settled half-up, not round(): Python round is half-EVEN and
    # SQL round()s vary across engines/builds — an oracle mirroring this
    # frame needs the one rounding that is a plain IEEE floor everywhere
    def settle6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = []
    psi = 0.0
    for b in sorted(set(ref) | set(cur) | set(range(-1, bins))):
        rn, cn = ref.get(b, 0), cur.get(b, 0)
        rp = max(rn / ref_total, epsilon)
        cp = max(cn / cur_total, epsilon)
        term = (cp - rp) * math.log(cp / rp)
        psi += term
        rows.append((b, rn, cn, settle6(rp), settle6(cp), settle6(term)))
    spark = reference.sparkSession
    detail = spark.createDataFrame(
        rows,
        "bin int, ref_n long, cur_n long, ref_p double, cur_p double, "
        "contribution double",
    )
    return round(psi, 6), detail
