"""Surrogate-key generation — scale-safe by construction.

The reference builds surrogate keys with ``row_number()`` over a GLOBAL
window and then truncates to 5 chars
(``03_gold_modeling_news_articles.py:38-44,58-59``) — a single-partition
exchange plus a collision generator (row 123456 collides with 12345;
SURVEY §2.5). Here keys are content hashes of the natural key: no
exchange, no collision-by-truncation, stable across runs and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def surrogate_key(*cols: Column | str, algo: str = "md5") -> Column:
    """Deterministic key from natural-key columns.

    md5 (hex string) is the oracle-friendly default — DuckDB computes the
    identical value. xxhash64 (bigint) is the cheaper pure-Spark variant
    for internal joins at scale.
    """
    columns = [F.col(c) if isinstance(c, str) else c for c in cols]
    normalized = [F.coalesce(c.cast("string"), F.lit("<NULL>")) for c in columns]
    joined = F.concat_ws("\x1f", *normalized)
    if algo == "md5":
        return F.md5(joined)
    if algo == "xxhash64":
        return F.xxhash64(joined)
    raise ValueError(f"unknown algo: {algo}")


def monotonic_row_id() -> Column:
    """Partition-local monotonic id — unique, not dense, no shuffle."""
    return F.monotonically_increasing_id()
