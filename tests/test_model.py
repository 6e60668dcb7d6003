"""Star-schema builders: hash keys, FK integrity, date dimension."""

from __future__ import annotations

import datetime

from news_data_pipeline_spark.model.star import build_dim, build_fact, dim_date


def silver(spark):
    rows = [
        ("bbc", "alice", "2024-01-05", "t1"),
        ("bbc", "bob", "2024-01-06", "t2"),
        ("cnn", None, "2024-01-07", "t3"),
    ]
    return spark.createDataFrame(rows, ["source", "author", "published", "title"])


def test_build_dim_fills_unknown_and_keys_are_unique(spark):
    dim = build_dim(silver(spark), "author", id_col="author_id")
    rows = dim.collect()
    members = {r["author"] for r in rows}
    assert members == {"alice", "bob", "UNKNOWN"}
    keys = [r["author_id"] for r in rows]
    assert len(set(keys)) == len(keys)
    assert all(len(k) == 32 for k in keys)  # full md5 — no substr(1,5) collisions


def test_build_dim_keys_stable_across_runs(spark):
    a = {r["author"]: r["author_id"] for r in build_dim(silver(spark), "author").collect()}
    b = {r["author"]: r["author_id"] for r in build_dim(silver(spark), "author").collect()}
    assert a == b  # content hash, not row_number — run-order independent


def test_build_fact_fk_integrity(spark):
    df = silver(spark).fillna("UNKNOWN", subset=["author"])
    dims = {
        "source": build_dim(df, "source", id_col="source_id"),
        "author": build_dim(df, "author", id_col="author_id"),
    }
    fact = build_fact(
        df, dims, fact_id_cols=["title"], fact_id_name="article_id"
    )
    assert fact.count() == 3
    # every fact FK resolves to a dim member (the reference's inner joins
    # silently dropped unmatched rows; ours is a left join, so check)
    assert fact.where("source_id IS NULL OR author_id IS NULL").count() == 0
    # fact ids unique
    assert fact.select("article_id").distinct().count() == 3


def test_dim_date_fields(spark):
    dd = dim_date(silver(spark), "published")
    rows = {r["date_key"]: r for r in dd.collect()}
    assert set(rows) == {
        datetime.date(2024, 1, 5),
        datetime.date(2024, 1, 6),
        datetime.date(2024, 1, 7),
    }
    jan5 = rows[datetime.date(2024, 1, 5)]  # a Friday
    assert (jan5["year"], jan5["quarter"], jan5["month"], jan5["day"]) == (2024, 1, 1, 5)
    assert jan5["day_of_week"] == 5  # 0=Sunday convention (DuckDB dow)
    assert not jan5["is_weekend"]
    jan6 = rows[datetime.date(2024, 1, 6)]  # Saturday
    assert jan6["is_weekend"]


def test_upsert_dim_scd1(spark):
    existing = spark.createDataFrame(
        [("bbc", "UK"), ("cnn", "US")], ["source", "country"]
    )
    updates = spark.createDataFrame(
        [("cnn", "USA"), ("dw", "DE")], ["source", "country"]
    )
    from news_data_pipeline_spark.model.star import upsert_dim

    out = {r["source"]: r["country"] for r in
           upsert_dim(existing, updates, key="source").collect()}
    assert out == {"bbc": "UK", "cnn": "USA", "dw": "DE"}


def test_scd2_apply(spark):
    from news_data_pipeline_spark.model.star import scd2_apply

    dim = spark.createDataFrame(
        [
            ("bbc", "UK", "2024-01-01 00:00:00", None, True),
            ("cnn", "US", "2024-01-01 00:00:00", None, True),
            ("cnn", "XX", "2023-01-01 00:00:00", "2024-01-01 00:00:00", False),
        ],
        "source string, country string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "source", "country",
        "cast(valid_from as timestamp_ntz) valid_from",
        "cast(valid_to as timestamp_ntz) valid_to",
        "is_current",
    )
    changes = spark.createDataFrame(
        [("cnn", "USA"), ("dw", "DE"), ("bbc", "UK")],  # bbc unchanged
        ["source", "country"],
    )
    out = scd2_apply(
        dim, changes, key="source", attrs=["country"],
        effective_ts="2024-06-01 00:00:00",
    )
    rows = sorted(
        ((r["source"], r["country"], r["is_current"]) for r in out.collect())
    )
    assert rows == [
        ("bbc", "UK", True),          # unchanged — passes through
        ("cnn", "US", False),         # closed old current
        ("cnn", "USA", True),         # new current version
        ("cnn", "XX", False),         # prior history untouched
        ("dw", "DE", True),           # brand-new key
    ]
    closed = [r for r in out.collect()
              if r["source"] == "cnn" and r["country"] == "US"][0]
    assert str(closed["valid_to"]).startswith("2024-06-01")
    # exactly one current row per key
    cur = out.where("is_current").groupBy("source").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_build_fact_null_keys_resolve_to_unknown(spark):
    df = spark.createDataFrame(
        [("bbc", "t1"), (None, "t2")], ["source", "title"]
    )
    dims = {"source": build_dim(df, "source", id_col="source_id")}
    fact = build_fact(df, dims, fact_id_cols=["title"])
    rows = {r["title"]: r for r in fact.collect()}
    # null natural key joins the UNKNOWN dim member, not a null FK
    assert rows["t2"]["source"] == "UNKNOWN"
    assert rows["t2"]["source_id"] is not None
    assert fact.where("source_id IS NULL").count() == 0


def test_build_dim_extra_cols_one_row_per_key(spark):
    df = spark.createDataFrame(
        [("reuters", "UK"), ("reuters", "US"), ("bbc", "UK")],
        ["source", "country"],
    )
    dim = build_dim(df, "source", extra_cols=["country"])
    assert dim.count() == 2  # one row per natural key, not per variant
    row = {r["source"]: r["country"] for r in dim.collect()}
    assert row["reuters"] == "UK"  # deterministic: first by extra cols
    # the fan-out hazard: a fact join must not duplicate rows
    facts = df.selectExpr("source", "country AS fact_country")
    fact = build_fact(facts, {"source": dim}, fact_id_cols=["source", "fact_country"])
    assert fact.count() == 3


def test_fill_unknown_rejects_non_string_keys(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], ["num_key", "v"])
    with _pytest.raises(TypeError, match="string natural key"):
        build_dim(df, "num_key")
    with _pytest.raises(TypeError, match="string natural keys"):
        build_fact(df, {"num_key": spark.createDataFrame([(1, "k")], ["num_key", "id"])},
                   fact_id_cols=["v"])
    # explicit opt-out works for typed keys
    dim = build_dim(df, "num_key", fill_unknown=None)
    assert dim.count() == 1


def test_scd2_rejects_duplicate_change_keys(spark):
    import pytest

    from news_data_pipeline_spark.model.star import scd2_apply

    dim = spark.createDataFrame(
        [("k1", "a", "2024-01-01 00:00:00", None, True)],
        "key string, attr string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "key", "attr",
        "CAST(valid_from AS timestamp_ntz) valid_from",
        "CAST(valid_to AS timestamp_ntz) valid_to",
        "is_current",
    )
    dup_changes = spark.createDataFrame(
        [("k1", "b"), ("k1", "c")], "key string, attr string"
    )
    with pytest.raises(ValueError, match="multiple rows per key"):
        scd2_apply(
            dim, dup_changes, key="key", attrs=["attr"],
            effective_ts="2024-02-01 00:00:00",
        )


def test_global_row_number_matches_global_window(spark):
    import pyspark.sql.functions as F

    from news_data_pipeline_spark.functions.ids import global_row_number

    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 500).cast("string").alias("k")
    )
    out = global_row_number(df, "k", id_col="rid", num_partitions=8)
    rows = sorted((r["k"], r["rid"]) for r in out.collect())
    expected = sorted({r["k"] for r in df.collect()})
    # dense 1..n, assigned in sort order of k
    assert [rid for _, rid in rows] == list(range(1, 501))
    assert [k for k, _ in rows] == expected
    # and the plan never funnels through a single-partition window
    plan = out._jdf.queryExecution().toString()
    assert "SinglePartition" not in plan


def test_build_dim_compat_reference_ids(spark):
    from news_data_pipeline_spark.model.star import build_dim

    df = spark.createDataFrame(
        [("b",), ("a",), (None,), ("c",)], ["source"]
    )
    dim = build_dim(df, "source", id_col="source_id", compat_reference=True)
    got = {r["source"]: r["source_id"] for r in dim.collect()}
    # sequential by key order — binary collation, so uppercase UNKNOWN
    # sorts before the lowercase members
    assert got == {"UNKNOWN": "1", "a": "2", "b": "3", "c": "4"}
