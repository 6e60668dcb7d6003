"""REST/JSON ingestion source (bronze layer).

The reference ingests NewsAPI top-headlines with a driver-side HTTP GET
and ``spark.createDataFrame(articles, schema)``
(``01_bronze_ingestion_news_articles.py:14-37``). That is fine for a
<=100-row API page but is a driver bottleneck at scale, so this module
offers both shapes:

* ``ingest_records`` — declared-schema createDataFrame for small driver-
  side payloads (the reference's S1/S2 path).
* ``ingest_json_landing`` — ``spark.read.json`` over a landing directory
  of raw API responses, which is the 100-TB shape: fetchers land files,
  Spark does distributed parse with an enforced schema.

HTTP itself is gated behind an import-try; in this container there is no
network, so ``fetch_articles`` raises unless a ``fetcher`` is injected
(tests inject a deterministic fake).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

# Bronze article schema, declared not inferred
# (reference: 01_bronze_ingestion_news_articles.py:26-35).
ARTICLE_SCHEMA = StructType(
    [
        StructField("source", StructType([StructField("name", StringType())])),
        StructField("author", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("url", StringType()),
        StructField("urlToImage", StringType()),
        StructField("publishedAt", StringType()),
        StructField("content", StringType()),
    ]
)


def fetch_articles(
    endpoint: str,
    params: dict[str, str] | None = None,
    fetcher: Callable[[str, dict[str, str] | None], dict[str, Any]] | None = None,
) -> list[dict[str, Any]]:
    """Fetch one API page of articles. ``fetcher`` is injectable for tests."""
    if fetcher is None:
        try:
            import requests  # noqa: PLC0415
        except ImportError as exc:  # no network stack in this container
            raise NotImplementedError(
                "no HTTP client available; inject a fetcher(endpoint, params)"
            ) from exc

        def fetcher(url: str, p: dict[str, str] | None) -> dict[str, Any]:
            resp = requests.get(url, params=p, timeout=30)
            resp.raise_for_status()
            return resp.json()

    data = fetcher(endpoint, params)
    return data.get("articles", [])


def with_ingestion_metadata(df: DataFrame, country: str, ingestion_time: str) -> DataFrame:
    """Stamp lineage columns and cast publishedAt, as the reference does
    (``01_bronze_ingestion_news_articles.py:40-44``)."""
    return (
        df.withColumn("ingestion_time", F.lit(ingestion_time))
        .withColumn("country", F.lit(country))
        .withColumn("publishedAt", F.col("publishedAt").cast("timestamp"))
    )


def ingest_records(
    spark: SparkSession,
    records: Sequence[dict[str, Any]],
    *,
    country: str,
    ingestion_time: str,
    schema: StructType = ARTICLE_SCHEMA,
) -> DataFrame:
    """Driver-side records -> bronze DataFrame with declared schema."""
    df = spark.createDataFrame(list(records), schema)
    return with_ingestion_metadata(df, country, ingestion_time)


def ingest_json_landing(
    spark: SparkSession,
    landing_path: str,
    *,
    country: str,
    ingestion_time: str,
    schema: StructType = ARTICLE_SCHEMA,
) -> DataFrame:
    """Distributed parse of landed JSON files — the at-scale bronze path."""
    df = spark.read.schema(schema).json(landing_path)
    return with_ingestion_metadata(df, country, ingestion_time)
