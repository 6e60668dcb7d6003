"""Declarative pipeline plans: stage composition + the silver recipe."""

from __future__ import annotations

from pyspark.sql import Row

from news_data_pipeline_spark.plans import Pipeline
from news_data_pipeline_spark.plans.medallion import silver_enrichment


def test_pipeline_composes_lazily_in_order(spark):
    p = Pipeline("demo")
    p.add("double", lambda df: df.selectExpr("id", "id * 2 AS v"))
    p.add("filter", lambda df: df.where("v >= 4"), "keep v >= 4")
    out = p.run(spark.range(5))
    assert [r["v"] for r in out.orderBy("id").collect()] == [4, 6, 8]
    desc = p.describe()
    assert "1. double" in desc and "2. filter — keep v >= 4" in desc
    trace = p.run_with_trace(spark.range(5))
    assert set(trace) == {"double", "filter"}
    assert trace["double"].count() == 5


def test_silver_enrichment_plan(spark):
    bronze = spark.createDataFrame(
        [
            Row(
                source=Row(name="BBC"),
                author="alice",
                title="<b>Good</b> news",
                url="https://www.bbc.com/a1",
                publishedAt="2024-03-01T08:00:00",
                content="A good great day.",
                country="us",
            )
        ]
    )
    silver = silver_enrichment().run(bronze)
    row = silver.first()
    assert row["TITLE"] == "Good news"
    assert row["DOMAIN"] == "bbc.com"
    assert row["CONTENT_WORD_COUNT"] == 4
    assert row["SENTIMENT_LABEL"] == "positive"
    assert all(c == c.upper() for c in silver.columns)
