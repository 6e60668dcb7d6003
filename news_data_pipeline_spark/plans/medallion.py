"""The medallion pipeline as a declarative plan.

The reference's silver notebook (``02_silver_transformation_news_articles.py:63-96``)
is a 30-line imperative chain; here the same transform is stages-as-data
on the engine's operators, so the recipe is inspectable, testable
stage-by-stage, and composes into ONE Catalyst plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from news_data_pipeline_spark.functions import text
from news_data_pipeline_spark.functions.columns import (
    flatten_structs,
    normalize_column_names,
)
from news_data_pipeline_spark.plans.pipeline import Pipeline


def silver_enrichment() -> Pipeline:
    """Bronze articles -> silver shape (post-DQ): flatten, clean, enrich,
    canonical names. Mirrors ``02:63-96`` with Catalyst-only expressions
    (no pickled UDFs) and a real word count (``02:71`` used length())."""
    p = Pipeline("silver_enrichment")

    p.add("flatten", flatten_structs, "source.name -> source_name etc.")

    def enrich(df: DataFrame) -> DataFrame:
        # counts and sentiment read the STRIPPED content — computing them
        # on the raw column would count markup tokens and let lexicon
        # words inside tag attributes skew polarity
        clean = text.strip_html(F.col("content"))
        polarity = text.sentiment_polarity(clean)
        return df.select(
            F.col("source_name").alias("source"),
            "author",
            text.strip_html(F.col("title")).alias("title"),
            text.extract_domain(F.col("url")).alias("domain"),
            F.to_date("publishedAt").alias("published_date"),
            clean.alias("content"),
            text.word_count(clean).alias("content_word_count"),
            polarity.alias("sentiment_score"),
            text.sentiment_label(polarity).alias("sentiment_label"),
            "country",
            "url",
        )

    p.add("enrich", enrich, "strip html, domain, dates, counts, sentiment")
    p.add(
        "canonical_names",
        normalize_column_names,
        "UPPER_SNAKE columns in one Project (reference rename loop, "
        "_lib_dq_helpers.py:68-72)",
    )
    return p
