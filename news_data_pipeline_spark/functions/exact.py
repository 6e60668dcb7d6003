"""Exact cross-engine numeric aggregation (the integer-unit pattern).

``round(sum(<double expr>), d)`` is a latent wrong-answer class: Spark
and DuckDB sum doubles in different orders, the last-ulp residues
differ, and any group whose true sum lands within an ulp of a
``.xx5`` boundary flips a cent between engines (round-4 verdict:
``nation_pair_trade``, 11/4179 groups wrong by ±0.01). The driver's
correctness gate hashes values exactly, so "within 1e-6" is not good
enough.

The fix used across the registry: **settle each row to the output
granularity in exact integer units, then sum the integers.**

- ``settled_units(col, dp)`` → ``floor(col * 10^dp + 0.5)`` cast to
  BIGINT. The double multiply/add/floor are single IEEE operations on
  bit-identical inputs, so every engine computes the same integer.
  (Half-up toward +inf for negatives — a convention, applied equally
  on both engines.)
- ``SUM`` over BIGINT is exact and order-independent — no residue, no
  boundary, at any parallelism or scale.
- Dividing the integer sum by ``10^dp`` converts the same integer to
  the same double everywhere (integer→double conversion and IEEE
  division are deterministic; even past 2^53 both engines round the
  same integer to the same nearest double).

Averages use the same settled units plus a floor-based half-up:
``floor((2*sum(u) + n) / (2*n))`` — pure IEEE divide + floor on
identical operands, so sign-safe and engine-identical. Never use
integer division for this: Spark ``div`` truncates toward zero, and
DuckDB ``//`` has CHANGED semantics across releases (truncation in
1.0, floor division later) — so ``//``/``div`` pairs are both
sign-unsafe and DuckDB-version-fragile; the floor form is neither.

Semantics note: this computes "sum/avg of per-row values settled to
10^-dp" rather than "round(sum of raw doubles)". For money columns
stored at 2dp (TPC-H prices) settling recovers the intended exact
cents, so the integer sum is arguably *more* correct than the rounded
double sum. The SQL oracle twins mirror the same expressions, so both
engines agree by construction. ``*_avg`` uses ``count(*)`` — callers
must not pass nullable columns (all fixture columns are non-null).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def settled_units(col: Column, dp: int = 2) -> Column:
    """Per-row exact BIGINT units at 10^-dp granularity (half-up)."""
    return F.floor(col * (10 ** dp) + F.lit(0.5)).cast("long")


def exact_sum(col: Column, dp: int = 2) -> Column:
    """Aggregate: order-independent sum of ``col`` settled to dp digits."""
    return F.sum(settled_units(col, dp)) / float(10 ** dp)


def exact_avg(col: Column, dp: int = 4) -> Column:
    """Aggregate: avg of dp-settled values, half-up at dp digits."""
    u = F.sum(settled_units(col, dp))
    n = F.count(F.lit(1))
    return F.floor((2 * u + n) / (2 * n)) / float(10 ** dp)


def exact_window_sum(col: Column, window, dp: int = 2) -> Column:
    """Windowed order-independent settled sum (running/rolling money)."""
    return F.sum(settled_units(col, dp)).over(window) / float(10 ** dp)


def settled_round(col: Column, dp: int = 4) -> Column:
    """Scalar engine-stable half-up round: ``floor(x*10^dp + 0.5)/10^dp``.

    Use instead of ``F.round`` on values derived from engine-identical
    inputs (e.g. ratios of exact integer sums): ``round()`` itself is
    implemented differently per engine (BigDecimal HALF_UP vs scaled
    nearbyint) and can disagree on the same double within an ulp of a
    boundary; floor+IEEE arithmetic cannot.
    """
    scale = 10 ** dp
    return F.floor(col * scale + F.lit(0.5)).cast("long") / float(scale)


# --- SQL mirrors for the DuckDB oracle twins ------------------------------

def sql_units(expr: str, dp: int = 2) -> str:
    return f"CAST(floor(({expr}) * {10 ** dp} + 0.5) AS BIGINT)"


def sql_exact_sum(expr: str, dp: int = 2) -> str:
    return f"sum({sql_units(expr, dp)}) / {10 ** dp}.0"


def sql_exact_avg(expr: str, dp: int = 4) -> str:
    return (
        f"floor((2 * sum({sql_units(expr, dp)}) + count(*))"
        f" / (2.0 * count(*))) / {10 ** dp}.0"
    )


def sql_settled_round(expr: str, dp: int = 4) -> str:
    return f"CAST(floor(({expr}) * {10 ** dp} + 0.5) AS BIGINT) / {10 ** dp}.0"
