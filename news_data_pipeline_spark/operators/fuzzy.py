"""Fuzzy record linkage: blocked edit-distance joins.

Data-cleaning workhorse the dedup family doesn't cover: near-identical
KEYS (misspelled source names, OCR'd titles, hand-entered entities)
rather than near-identical documents. The kernel is the standard
three-stage blocked join every linkage system uses:

1. **block** on shared character n-grams — a candidate pair must share
   at least one n-gram. Lossless for long-enough strings: one edit
   touches at most ``n`` n-grams, so within distance ``d`` any string
   of length >= d*n + n still has an untouched n-gram that is a
   substring of both sides. Shorter strings may be missed — that is
   the declared recall contract (same style as the LSH family);
2. **length prefilter** — ``|len_a - len_b| <= d`` is implied by edit
   distance ``d`` and costs one comparison;
3. **verify** with exact ``levenshtein`` (JVM-side, codegen'd; integer
   result — nothing to settle cross-engine).

Scale: candidate generation is the gram equi-join — linear in strings
for bounded gram document frequency; ``max_df`` prunes boilerplate
grams exactly like ``dedup.shared_shingles`` prunes hot shingles (a
gram shared by 10^6 keys is a 10^12-row join and carries no linkage
signal). The verify stage is per-candidate, embarrassingly parallel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from news_data_pipeline_spark.operators.fanout import fan_out


def char_ngrams(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """(id, gram): distinct character n-grams per string. Strings
    shorter than ``n`` emit themselves as their single gram so they can
    still block against equal-length near-matches."""
    s = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    ).where(F.col("__t").isNotNull())
    text = F.col("__t")
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(text) - n + 1, F.lit(1))
    )
    grams = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    return (
        s.select("id", F.explode(grams).alias("gram"))
        .where(F.length("gram") > 0)
        .distinct()
    )


def _candidates(
    left_grams: DataFrame, right_grams: DataFrame, max_df: int | None
) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing a gram, optionally pruning
    grams whose combined document frequency exceeds ``max_df``."""
    lg, rg = left_grams, right_grams
    if max_df is not None:
        df_counts = (
            lg.select("gram")
            .unionAll(rg.select("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("gram")
        )
        lg = lg.join(df_counts, on="gram", how="left_semi")
        rg = rg.join(df_counts, on="gram", how="left_semi")
    return (
        lg.withColumnRenamed("id", "id_a")
        .join(rg.withColumnRenamed("id", "id_b"), on="gram")
        .select("id_a", "id_b")
        .distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_distance: int = 2,
    ngram: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """(text_a, text_b, distance): pairs across two frames within
    ``max_distance`` edits, gram-blocked. Inputs are deduplicated on
    the join column — linkage is between VALUES; re-attach rows by
    joining back on the value."""
    lv = left.select(F.col(left_col).alias("id")).where(
        F.col("id").isNotNull()
    ).distinct()
    rv = right.select(F.col(right_col).alias("id")).where(
        F.col("id").isNotNull()
    ).distinct()
    cand = _candidates(
        char_ngrams(lv, "id", "id", n=ngram),
        char_ngrams(rv, "id", "id", n=ngram),
        max_df,
    )
    return (
        cand.where(
            F.abs(F.length("id_a") - F.length("id_b")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("id_a", "id_b"))
        .where(F.col("distance") <= max_distance)
        .select(
            F.col("id_a").alias("text_a"),
            F.col("id_b").alias("text_b"),
            "distance",
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    *,
    max_distance: int = 2,
    ngram: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Self-linkage: unordered distinct-value pairs within
    ``max_distance`` edits, each pair once (text_a < text_b)."""
    out = fuzzy_join(
        df,
        df,
        col,
        col,
        max_distance=max_distance,
        ngram=ngram,
        max_df=max_df,
    )
    return out.where(F.col("text_a") < F.col("text_b"))
