"""Column-shape operators: rename normalization, struct flattening.

Reference behaviors generalized here:

* ``format_column_names_upper_spaces`` — uppercase + space->underscore
  rename over all columns via a withColumnRenamed loop
  (``_lib_dq_helpers.py:68-72``; a conflicting variant at ``02:165-169``
  replaces underscores *with* spaces — SURVEY §1.2 picks the helpers-lib
  convention as operative). Implemented as ONE select with aliases so
  plan-build cost stays O(1) in depth at hundreds of columns.
* conditional struct flatten (``02:32-33``).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def normalize_column_names(
    df: DataFrame, *, case: str = "upper", space_to_underscore: bool = True
) -> DataFrame:
    """Canonical column naming in a single Project (no rename loop)."""

    def norm(name: str) -> str:
        out = re.sub(r"\s+", "_", name) if space_to_underscore else name
        return out.upper() if case == "upper" else out.lower()

    return df.select([F.col(f"`{c}`").alias(norm(c)) for c in df.columns])


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten one level of struct columns: ``source.name`` -> ``source_name``.

    Generalizes the reference's hardcoded single-field flatten
    (``02_silver_transformation_news_articles.py:32-33``) to every struct
    column present — schema-driven, so it composes with dynamic inputs.
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, StructType):
            for sub in field.dataType.fields:
                cols.append(
                    F.col(f"`{field.name}`.`{sub.name}`").alias(
                        f"{field.name}{sep}{sub.name}"
                    )
                )
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(cols)


def require_columns(df: DataFrame, required: list[str]) -> list[str]:
    """Schema predicate: which required columns are missing
    (reference ``check_column_exists``, ``_lib_dq_helpers.py:133-136``)."""
    have = set(df.columns)
    return [c for c in required if c not in have]
