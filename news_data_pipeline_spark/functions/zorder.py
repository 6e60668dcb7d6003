"""Z-order (Morton) keys: multi-dimensional clustering for data skipping.

``write_clustered`` on ONE column gives disjoint per-file ranges for
that column only — a filter on any other column still scans every file.
Interleaving the bits of two bucketized dimensions into a Morton key
and range-clustering on THAT bounds every file to a small rectangle of
the 2-D key space, so selective filters on EITHER dimension (or both)
prune files. This is what Delta/Iceberg ``ZORDER BY`` does, expressed
as plain Catalyst integer arithmetic — codegen'd, no UDF, and exactly
reproducible in ANSI SQL (shift/mask/or), so the key itself is
oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def quantize(col: Column, *, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by linear bucketing over
    ``[lo, hi]`` (clamped). Rank-preserving, so range filters on the
    original column translate to range filters on the quantized one.
    NULL propagates (Spark's least/greatest SKIP nulls, which would
    otherwise silently send null rows to the TOP bucket) — coalesce
    before quantizing if nulls should cluster somewhere specific."""
    if hi <= lo:
        raise ValueError(f"quantize needs hi > lo, got [{lo}, {hi}]")
    span = hi - lo
    scaled = F.floor((col - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1))
    clamped = F.greatest(
        F.lit(0).cast("long"),
        F.least(scaled.cast("long"), F.lit((1 << bits) - 1).cast("long")),
    )
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def _spread_bits(col: Column, bits: int) -> Column:
    """Insert a zero between consecutive bits: b_i moves to position 2i."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)).cast("long"), 2 * b
            )
        )
    return out


def morton_key(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    into one Z-order key (x in even positions, y in odd). Inputs must
    already be quantized to ``[0, 2^bits)`` — see ``quantize``."""
    return _spread_bits(x, bits).bitwiseOR(
        F.shiftleft(_spread_bits(y, bits), 1)
    )
