"""Join operators: the full Spark join surface plus engine idioms.

The reference uses three join shapes (SURVEY §2.3): inner equi-joins to
attach dim keys (``03:54-55``), an inner join against a bad-key set
(``_lib_dq_helpers.py:159``), and a left-anti subtraction (``:160``).
Here those become explicit, scale-annotated operators; semi/anti pairs
replace the reference's multiplicity-hazardous inner-against-keys.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dim_join(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension equi-join with an explicit broadcast hint.

    Dims are bounded by member count, so the build side always fits —
    broadcasting avoids shuffling the (huge) fact side entirely.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``df`` whose key appears in ``keys`` — preserves ``df``'s
    multiplicity exactly once per row (unlike the reference's inner join
    against a key set, which multiplies on duplicate keys)."""
    return df.join(keys, on=on, how="left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``df`` whose key does NOT appear in ``keys``
    (reference ``_lib_dq_helpers.py:160``)."""
    return df.join(keys, on=on, how="left_anti")


def partition_valid_invalid(
    df: DataFrame, bad_keys: DataFrame, on: str | Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """One-call valid/invalid split against a key set — the reference's
    ``get_valid_invalid`` (``_lib_dq_helpers.py:157-163``) as a semi/anti
    pair. Prefer ``dq.run_dq`` (no key-set materialization) when the
    rules are expressible as row predicates."""
    return anti_join(df, bad_keys, on), semi_join(df, bad_keys, on)


def salted_join(
    big: DataFrame,
    skewed: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, explode the small side.

    For hot keys (e.g. the reference's ``fillna("UNKNOWN")`` author bucket,
    ``03:42-44`` — SURVEY §7.3) where AQE skew splitting isn't enough.
    The small side is replicated ``salt_buckets`` times, so keep it small.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_small = skewed.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(exploded_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")
