"""Term statistics: TF and TF-IDF top-terms."""

from __future__ import annotations

from news_data_pipeline_spark.operators.terms import term_frequencies, tf_idf_top_terms


def test_term_frequencies_counts_multiplicity(spark):
    df = spark.createDataFrame([(1, "a b a"), (2, "b")], ["doc_id", "body"])
    tf = term_frequencies(df, "doc_id", "body")
    got = {(r["id"], r["term"]): r["tf"] for r in tf.collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1}


def test_tfidf_ranks_rare_terms_above_ubiquitous(spark):
    # "common" appears in every doc -> idf 0 -> never a top term;
    # each doc's unique term must rank first.
    df = spark.createDataFrame(
        [(1, "common alpha common"), (2, "common beta"), (3, "common gamma")],
        ["doc_id", "body"],
    )
    out = tf_idf_top_terms(df, "doc_id", "body", k=1)
    got = {r["id"]: (r["term"], r["rank"]) for r in out.collect()}
    assert got == {1: ("alpha", 1), 2: ("beta", 1), 3: ("gamma", 1)}
