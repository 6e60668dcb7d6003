"""Corpus term statistics: TF-IDF and top-terms-per-document.

North-star extension (the reference has no term-level analytics): the
classic relevance/keyword feature over the ``documents`` table, built
entirely from explode + two groupBys + a per-document window — every
stage shuffles on a real key (doc id or term), nothing funnels through
a single partition, and the corpus size joins in as a broadcast
one-row aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): whitespace-token term counts per document.

    Tokenization is ``word_shingles(n=1)`` — ONE tokenizer definition
    shared with the dedup family, so token semantics (and their DuckDB
    oracle twins) can never drift between operators.
    """
    from news_data_pipeline_spark.operators.dedup import word_shingles

    tokens = word_shingles(df, id_col, text_col, n=1, distinct=False)
    return (
        tokens.withColumnRenamed("shingle", "term")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tfidf = tf * ln(N / df_term), rounded to 4dp BEFORE ranking so the
    ordering is reproducible across engines (ranking raw doubles would
    let a last-ulp log difference flip neighbors); ties break on the
    term itself. N counts documents with at least one token and rides
    in as a broadcast single-row aggregate — visible in the plan as a
    broadcast join, never a shuffle.
    """
    tf = term_frequencies(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, on="term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tf", "tfidf", "rank")
    )
