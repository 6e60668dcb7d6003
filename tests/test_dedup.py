"""Dedup operators: exact, MinHash/LSH, n-gram Jaccard, SimHash."""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.operators import dedup


def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different text about spark engines here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "body"])


def test_exact_dedup_keeps_one_per_fingerprint(spark):
    out = dedup.fingerprint_dedup(docs(spark), "body", "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert len(kept) == 3
    assert (1 in kept) != (4 in kept)  # exactly one of the exact pair


def test_word_shingles_small_doc(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "x y")], ["id", "t"])
    sh = dedup.word_shingles(df, "id", "t", n=3)
    got = {(r["id"], r["shingle"]) for r in sh.collect()}
    # 4 words -> 2 trigrams; 2 words -> one shorter-than-n shingle
    assert got == {(1, "a b c"), (1, "b c d"), (2, "x y")}


def test_word_shingles_distinct_flag(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["id", "t"])
    with_dups = dedup.word_shingles(df, "id", "t", n=2, distinct=False)
    without = dedup.word_shingles(df, "id", "t", n=2, distinct=True)
    assert with_dups.count() == 5
    assert without.count() == 2  # {"a b", "b a"}


def test_minhash_identical_docs_identical_signatures(spark):
    sh = dedup.word_shingles(docs(spark), "doc_id", "body", n=3)
    sigs = dedup.minhash_signatures(sh, num_hashes=16)
    rows = {r["id"]: [r[f"mh_{i}"] for i in range(16)] for r in sigs.collect()}
    assert rows[1] == rows[4]
    assert rows[1] != rows[3]


def test_lsh_finds_exact_and_near_pairs(spark):
    pairs = dedup.minhash_lsh_dedup_pairs(
        docs(spark), "doc_id", "body", shingle_n=3, bands=8, rows_per_band=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in got  # exact dup always collides in every band
    assert all(a < b for a, b in got)  # canonical ordering, no self/mirror


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "q r s t")], ["doc_id", "body"]
    )
    out = dedup.ngram_jaccard_pairs(df, "doc_id", "body", n=2, threshold=0.1)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    # bigrams(1)={ab,bc,cd}, bigrams(2)={ab,bc,ce}: |∩|=2, |∪|=4
    assert rows == {(1, 2): 0.5}


def test_simhash_near_dups_close_in_hamming(spark):
    out = dedup.simhash(docs(spark), "doc_id", "body")
    sims = {r["id"]: r["simhash"] for r in out.collect()}
    assert sims[1] == sims[4]

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(sims[1], sims[2]) < hamming(sims[1], sims[3])


def test_winnow_fingerprints_guarantee(spark):
    # Docs sharing a substring of length >= k + window - 1 must share at
    # least one fingerprint (the winnowing guarantee); disjoint docs
    # share none.
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "INTRO the quick brown fox jumps over something else"),
            (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"),
        ],
        ["doc_id", "body"],
    )
    fps = dedup.winnow_fingerprints(df, "doc_id", "body", k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    # sampling actually compresses: far fewer fingerprints than k-grams
    assert len(by_doc[1]) < 51 - 8 + 1


def test_lsh_dedup_representatives_no_pair_blowup(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # dup of 1
        (4, "completely different text about spark engines here"),
    ]
    reps = dedup.lsh_dedup_representatives(
        spark.createDataFrame(rows, ["doc_id", "body"]), "doc_id", "body",
        bands=8, rows_per_band=2,
    )
    got = {r["id"]: r["rep"] for r in reps.collect()}
    assert got[1] == got[2] == got[3] == 1  # cluster collapses to min id
    assert got[4] == 4
    # output is linear in docs — one row per document, no pairs
    assert reps.count() == 4


def test_lsh_dedup_transitive_chain(spark):
    # A~B and B~C share different buckets; label propagation must pull
    # C into A's cluster within max_iter iterations.
    rows = [
        (1, "aa bb cc dd ee ff gg hh"),
        (2, "aa bb cc dd ee xx yy zz"),   # shares first-half shingles with 1
        (3, "qq rr ss tt ee xx yy zz"),   # shares second-half shingles with 2
    ]
    reps = dedup.lsh_dedup_representatives(
        spark.createDataFrame(rows, ["doc_id", "body"]), "doc_id", "body",
        shingle_n=2, bands=8, rows_per_band=1, max_iter=3,
    )
    got = {r["id"]: r["rep"] for r in reps.collect()}
    # 1~2 guaranteed; if 2~3 collide in any band, 3 must ALSO label 1
    if got[3] != 3:
        assert got[3] == got[1] == 1
    assert got[2] == 1


def test_representatives_cover_blank_documents(spark):
    df = spark.createDataFrame(
        [(1, "real text with several words here"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, body string",
    )
    reps = dedup.lsh_dedup_representatives(df, "doc_id", "body")
    got = {r["id"]: r["rep"] for r in reps.collect()}
    # shingle-less docs keep themselves as representative, never vanish
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 2 and got[3] == 3 and got[4] == 4


def test_hamming_distance_accepts_columns_and_names(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(0b1011, 0b0010)], ["a", "b"])
    by_name = df.select(dedup.hamming_distance("a", "b").alias("d")).first()["d"]
    by_col = df.select(
        dedup.hamming_distance(F.col("a"), F.col("b")).alias("d")
    ).first()["d"]
    assert by_name == by_col == 2
