"""End-to-end bronze -> DQ/quarantine -> silver -> gold pipeline test.

Synthetic news-article fixture through the whole medallion flow
(SURVEY §5.3): assert gold schemas, FK integrity, quarantine contents,
and that registered tables are readable back — without double execution.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.dq import NotNull, Unique, run_dq, to_quarantine_records
from news_data_pipeline_spark.functions import text
from news_data_pipeline_spark.functions.columns import flatten_structs, normalize_column_names
from news_data_pipeline_spark.model.star import build_dim, build_fact
from news_data_pipeline_spark.sources import rest, writers


def fake_api_page():
    return {
        "status": "ok",
        "articles": [
            {
                "source": {"name": "BBC"},
                "author": "alice",
                "title": "<b>Markets up</b> on good news",
                "description": "desc",
                "url": "https://www.bbc.com/a1",
                "urlToImage": None,
                "publishedAt": "2024-03-01T08:00:00",
                "content": "Markets had a good great day with fast wins.",
            },
            {
                "source": {"name": "BBC"},
                "author": None,
                "title": None,  # DQ: null title -> quarantine
                "description": None,
                "url": "https://www.bbc.com/a2",
                "urlToImage": None,
                "publishedAt": "2024-03-01T09:00:00",
                "content": "c2",
            },
            {
                "source": {"name": "CNN"},
                "author": "bob",
                "title": "Slow bad quarter",
                "description": "d3",
                "url": "https://cnn.com/a3",
                "urlToImage": None,
                "publishedAt": "2024-03-02T10:00:00",
                "content": "A slow bad quarter with errors and fails.",
            },
            {
                "source": {"name": "CNN"},
                "author": "bob",
                "title": "Dup url",
                "description": "d4",
                "url": "https://cnn.com/a3",  # DQ: duplicate url
                "publishedAt": "2024-03-02T11:00:00",
                "urlToImage": None,
                "content": "c4",
            },
        ],
    }


def test_medallion_end_to_end(spark, tmp_path):
    # --- bronze: injected fetcher (no network), declared schema
    articles = rest.fetch_articles("http://fake", fetcher=lambda u, p: fake_api_page())
    bronze = rest.ingest_records(
        spark, articles, country="us", ingestion_time="2024-03-02 12:00:00"
    )
    assert bronze.schema["publishedAt"].dataType.typeName() == "timestamp"

    # --- DQ: one-pass rules, quarantine audit sink
    flat = flatten_structs(bronze)
    dq = run_dq(
        flat,
        [
            NotNull("title"),
            # keep-first semantics: earliest publishedAt survives the dup
            Unique("url", quarantine_all=False, order_by=("publishedAt",)),
        ],
    )
    assert dq.quarantined.count() == 2  # null title + the later dup-url copy
    qrec = to_quarantine_records(
        dq.quarantined, source_table="news_articles",
        ingestion_time="2024-03-02 12:00:00",
    )
    qpath = str(tmp_path / "quarantine")
    writers.quarantine_writer(qpath)(qrec)
    back = spark.read.parquet(qpath)
    assert back.count() == 2
    assert set(back.columns) == {"payload", "reason", "source_table", "ingestion_time"}

    # --- silver: enrich + canonical names, partitioned write
    silver = normalize_column_names(
        dq.valid.select(
            F.col("source_name").alias("source"),
            "author",
            text.strip_html(F.col("title")).alias("title"),
            text.extract_domain(F.col("url")).alias("domain"),
            F.to_date("publishedAt").alias("published_date"),
            "content",
            text.word_count(F.col("content")).alias("content_word_count"),
            text.sentiment_polarity(F.col("content")).alias("sentiment_score"),
            text.sentiment_label(
                text.sentiment_polarity(F.col("content"))
            ).alias("sentiment_label"),
            "country",
            "url",
        )
    )
    rows = {r["URL"]: r for r in silver.collect()}
    assert rows["https://www.bbc.com/a1"]["TITLE"] == "Markets up on good news"
    assert rows["https://www.bbc.com/a1"]["DOMAIN"] == "bbc.com"
    assert rows["https://www.bbc.com/a1"]["SENTIMENT_LABEL"] == "positive"
    assert rows["https://cnn.com/a3"]["SENTIMENT_LABEL"] == "negative"

    spath = str(tmp_path / "silver")
    writers.write_layer(silver, spath, partition_by="COUNTRY", mode="overwrite")

    # --- gold: hash-keyed dims + fact, registered without re-execution
    silver_back = spark.read.parquet(spath)
    dims = {
        "SOURCE": build_dim(silver_back, "SOURCE", id_col="SOURCE_ID"),
        "AUTHOR": build_dim(silver_back, "AUTHOR", id_col="AUTHOR_ID"),
    }
    fact = build_fact(
        silver_back.fillna("UNKNOWN", subset=["AUTHOR"]),
        dims,
        fact_id_cols=["URL"],
        fact_id_name="ARTICLE_ID",
    )
    assert fact.count() == 2
    assert fact.where("SOURCE_ID IS NULL OR AUTHOR_ID IS NULL").count() == 0

    gpath = str(tmp_path / "gold" / "fact_news_articles")
    writers.write_layer_and_register(
        fact, gpath, "fact_news_articles", database="test_news_gold"
    )
    registered = spark.table("test_news_gold.fact_news_articles")
    assert registered.count() == 2
    top = (
        registered.groupBy("SOURCE")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "SOURCE")
        .collect()
    )
    assert [(r["SOURCE"], r["n"]) for r in top] == [("BBC", 1), ("CNN", 1)]
