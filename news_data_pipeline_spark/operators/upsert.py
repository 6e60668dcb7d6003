"""MERGE INTO semantics (Delta-style upsert) as a single full-outer join.

The reference's physical layer is Delta, whose headline write primitive
is ``MERGE INTO`` — matched target rows update, unmatched source rows
insert, optionally matched rows delete. Without the Delta jar this
module reproduces the row semantics declaratively, and
``merge_into_layer`` pairs it with ``VersionedLayer``'s pointer-swap
commit for the same reader-visible atomicity: readers see the old table
or the new table, never a half-merged one.

Semantics notes (mirroring the public MERGE contract):

* an update takes the source value EVEN WHEN IT IS NULL — so the
  resolution is match-flag driven, never ``coalesce`` (coalesce would
  silently keep stale target values wherever the source holds NULL);
* a source column missing from the target is ignored; a target column
  missing from the source stays untouched on updates and NULL on
  inserts;
* duplicate source keys are the caller's ambiguity, exactly as Delta
  errors on them — ``dedup_order_col`` resolves keep-latest
  deterministically when the source carries a version/timestamp column.

Scale: one sort-merge full-outer shuffle on the key (both sides hashed
on the same key, AQE skew-split applies). This is copy-on-write over
the WHOLE table; production table formats prune to the files that
actually contain matched keys and rewrite only those — with a
partitioned layer the same idea applies by semi-joining the touched
partition values first and unioning untouched partitions through
unrewritten. The full rewrite here is the honest baseline and the
correct semantics at any scale; the pruning is an I/O optimization.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: str | Sequence[str],
    *,
    delete: bool = False,
    dedup_order_col: str | None = None,
) -> DataFrame:
    """Merged frame with the target's schema.

    ``delete=False``: matched rows take source values (update), source
    rows without a match append (insert), unmatched target rows pass
    through. ``delete=True``: matched rows are removed instead —
    the WHEN MATCHED THEN DELETE arm (a left-anti join, kept here so
    both arms share one entry point).

    ``dedup_order_col``: when set, duplicate source keys resolve to the
    row with the greatest value of that column (ties on remaining
    columns are still ambiguous — callers wanting total determinism
    pass a unique version column). When unset, source keys MUST be
    unique; a duplicate would fan the full-outer join out and emit the
    target row once per duplicate.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if delete:
        return target.join(source.select(*key_list), on=key_list, how="left_anti")
    if dedup_order_col is not None:
        w = Window.partitionBy(*key_list).orderBy(F.desc(dedup_order_col))
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    shared = [c for c in target.columns if c in source.columns and c not in key_list]
    src = source.select(
        *key_list,
        F.lit(1).alias("__matched"),
        *[F.col(c).alias(f"__s_{c}") for c in shared],
    )
    joined = target.join(src, on=key_list, how="full_outer")
    resolved = [
        (
            F.when(F.col("__matched") == 1, F.col(f"__s_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            if c in shared
            else F.col(c)
        )
        for c in target.columns
        if c not in key_list
    ]
    return joined.select(*key_list, *resolved)


def merge_into_layer(
    spark: SparkSession,
    layer,
    source: DataFrame,
    keys: str | Sequence[str],
    *,
    delete: bool = False,
    dedup_order_col: str | None = None,
    partition_by: str | Sequence[str] | None = None,
) -> str:
    """Upsert ``source`` into a ``VersionedLayer`` and commit atomically.

    Read the current version, merge, write a fresh immutable version
    dir, pointer-swap — the Delta MERGE experience minus the log:
    readers resolve the old complete version until the single atomic
    rename, and a crash mid-merge leaves the layer untouched. Returns
    the committed version name. An empty layer (no committed version)
    bootstraps with the source as the initial table.
    """
    try:
        current = layer.read(spark)
    except IOError:
        return layer.overwrite(source, partition_by=partition_by)
    merged = merge_upsert(
        current,
        source,
        keys,
        delete=delete,
        dedup_order_col=dedup_order_col,
    )
    return layer.overwrite(merged, partition_by=partition_by)
