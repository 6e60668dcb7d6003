"""Blocked edit-distance linkage: grams, blocking recall, verify stage."""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.operators.fuzzy import (
    char_ngrams,
    fuzzy_join,
    fuzzy_pairs,
)


def _frame(spark, values, col="v"):
    return spark.createDataFrame([(x,) for x in values], [col])


def test_char_ngrams_and_short_strings(spark):
    df = _frame(spark, ["abc", "a"])
    got = sorted((r["id"], r["gram"]) for r in
                 char_ngrams(df, "v", "v").collect())
    assert got == [("a", "a"), ("abc", "ab"), ("abc", "bc")]


def test_fuzzy_pairs_basic(spark):
    df = _frame(spark, ["table", "tabel", "chair", "chairs", "zzz"])
    out = {(r["text_a"], r["text_b"]): r["distance"]
           for r in fuzzy_pairs(df, "v", max_distance=2).collect()}
    assert out[("tabel", "table")] == 2   # transposition = 2 edits
    assert out[("chair", "chairs")] == 1
    assert all("zzz" not in p for p in out)


def test_length_prefilter_excludes(spark):
    # shares grams but length gap > max_distance
    df = _frame(spark, ["ab", "ababababab"])
    assert fuzzy_pairs(df, "v", max_distance=2).count() == 0


def test_blocking_requires_shared_gram(spark):
    # distance 2 but zero shared bigrams (below the lossless length):
    # the declared recall contract — blocked out
    df = _frame(spark, ["ab", "ba"])
    assert fuzzy_pairs(df, "v", max_distance=2).count() == 0


def test_fuzzy_join_cross_frames(spark):
    left = _frame(spark, ["src1", "src25"], "a")
    right = _frame(spark, ["src10", "src2", "nomatch"], "b")
    out = {(r["text_a"], r["text_b"]): r["distance"]
           for r in fuzzy_join(left, right, "a", "b",
                               max_distance=1).collect()}
    assert out[("src1", "src10")] == 1
    assert out[("src1", "src2")] == 1
    assert out[("src25", "src2")] == 1
    assert not any(b == "nomatch" for _, b in out)


def test_max_df_prunes_hot_grams(spark):
    # every value shares the hot gram "xx"; with max_df below the
    # vocabulary size nothing blocks through the hot gram alone
    df = _frame(spark, [f"xx{i}{i}" for i in range(10)])
    unpruned = fuzzy_pairs(df, "v", max_distance=2).count()
    pruned = fuzzy_pairs(df, "v", max_distance=2, max_df=3).count()
    assert unpruned > 0 and pruned == 0


def test_nulls_and_duplicates_ignored(spark):
    df = spark.createDataFrame(
        [("abc",), (None,), ("abc",), ("abd",)], ["v"]
    )
    out = fuzzy_pairs(df, "v", max_distance=1).collect()
    assert [(r["text_a"], r["text_b"], r["distance"]) for r in out] == [
        ("abc", "abd", 1)
    ]
