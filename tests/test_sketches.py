"""Count-min sketch (operators.sketches) and Gopher quality flags
(functions.text.gopher_flags): the sketch's one-sided-error and monoid
contracts, and each named quality rule firing on a crafted violator.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.functions.text import gopher_flags
from news_data_pipeline_spark.operators.sketches import (
    cms_estimates,
    cms_heavy_hitters,
    cms_sketch,
)

DEPTH, WIDTH = 4, 8  # tiny width so collisions actually happen


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "term string, n long")


def test_cms_estimate_never_undercounts(spark):
    # 26 terms into 8 buckets per row: collisions guaranteed, so some
    # estimates exceed exact — but none may undercount (CMS only adds)
    pairs = [(chr(ord("a") + i), (i % 5) + 1) for i in range(26)]
    terms = _counts(spark, pairs)
    sketch = cms_sketch(terms, "term", "n", depth=DEPTH, width=WIDTH)
    est = cms_estimates(terms, "term", sketch, depth=DEPTH, width=WIDTH)
    rows = est.collect()
    assert len(rows) == 26
    assert all(r.cms_estimate >= r.n for r in rows)
    # total mass per sketch row is conserved (each term lands in
    # exactly one bucket per row)
    total = sum(n for _, n in pairs)
    per_row = (
        sketch.groupBy("row").agg(F.sum("counter").alias("s")).collect()
    )
    assert len(per_row) == DEPTH
    assert all(r.s == total for r in per_row)


def test_cms_estimate_unseen_term_is_zero(spark):
    """A term absent from the sketch build must report estimate 0, not
    vanish: with a sparse sketch (few built terms, wide rows) an unseen
    term's bucket usually has NO counter row, and an inner join would
    silently drop it from the output (ADVICE r7)."""
    built = _counts(spark, [("alpha", 3), ("beta", 2)])
    sketch = cms_sketch(built, "term", "n", depth=DEPTH, width=WIDTH)
    probe = spark.createDataFrame(
        [("alpha",), ("never_seen_term",)], "term string"
    )
    est = {
        r.term: r.cms_estimate
        for r in cms_estimates(
            probe, "term", sketch, depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert set(est) == {"alpha", "never_seen_term"}
    assert est["alpha"] >= 3
    # one-sided error still holds: 0 unless EVERY depth row collides
    assert est["never_seen_term"] >= 0


def test_cms_sketch_bounded_and_mergeable(spark):
    pairs = [(f"t{i}", i + 1) for i in range(40)]
    whole = cms_sketch(
        _counts(spark, pairs), "term", "n", depth=DEPTH, width=WIDTH
    )
    assert whole.count() <= DEPTH * WIDTH
    # monoid: sketch(A) ++ sketch(B) regrouped == sketch(A ∪ B)
    a = cms_sketch(
        _counts(spark, pairs[:20]), "term", "n", depth=DEPTH, width=WIDTH
    )
    b = cms_sketch(
        _counts(spark, pairs[20:]), "term", "n", depth=DEPTH, width=WIDTH
    )
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_heavy_hitters_topk(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha beta"),
            (2, "alpha beta gamma"),
            (3, "beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    out = cms_heavy_hitters(
        docs, "doc_id", "text", depth=DEPTH, width=WIDTH, k=2
    ).collect()
    assert [r.token for r in out] == ["alpha", "beta"]
    assert out[0].exact_count == 4 and out[1].exact_count == 3
    assert all(r.cms_estimate >= r.exact_count for r in out)


GOOD = (
    "the quick brown fox and his friend went to visit all of that "
    "green valley with hope "  # stopwords + sane lengths
    + "word " * 45
)


def _flags(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    sel = df.select(
        *[c.alias(n) for n, c in gopher_flags(F.col("text")).items()]
    )
    return sel.collect()[0].asDict()


def test_gopher_all_rules_pass(spark):
    f = _flags(spark, GOOD)
    assert f["pass_gopher"] == 1
    assert all(v == 1 for k, v in f.items() if k.startswith("flag_"))


def test_gopher_word_count_rule(spark):
    f = _flags(spark, "the and of short doc")
    assert f["flag_word_count"] == 0 and f["pass_gopher"] == 0


def test_gopher_mean_word_length_rule(spark):
    long_words = " ".join(["the", "and"] + ["antidisestablishment"] * 60)
    f = _flags(spark, long_words)
    assert f["flag_mean_word_length"] == 0 and f["pass_gopher"] == 0
    short_words = " ".join(["the", "and"] + ["a b"] * 60)
    f = _flags(spark, short_words)
    assert f["flag_mean_word_length"] == 0


def test_gopher_symbol_ratio_rule(spark):
    f = _flags(spark, GOOD + " " + "#tag ... " * 20)
    assert f["flag_symbol_ratio"] == 0 and f["pass_gopher"] == 0


def test_gopher_stopword_rule(spark):
    # 60 words, only one distinct required stopword ('the')
    f = _flags(spark, "the " + "lorem ipsum dolor sit amet " * 12)
    assert f["flag_stopwords"] == 0 and f["pass_gopher"] == 0


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    """The streamed sketch (per-batch partitions merged on read) equals
    the batch sketch over the same corpus — the monoid contract live."""
    import os

    from news_data_pipeline_spark.operators.dedup import word_shingles
    from news_data_pipeline_spark.streaming import sinks as stx

    landing = tmp_path / "docs_in"
    os.makedirs(landing)
    schema = "doc_id long, text string"
    part1 = [(1, "alpha alpha beta"), (2, "beta gamma")]
    part2 = [(3, "alpha delta delta"), (4, "gamma gamma gamma")]
    spark.createDataFrame(part1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "f1"))
    spark.createDataFrame(part2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    q = stx.maintain_cms_sketch(
        stream,
        id_col="doc_id",
        text_col="text",
        sketch_path=str(tmp_path / "sketch"),
        checkpoint=str(tmp_path / "ckpt"),
        depth=DEPTH,
        width=WIDTH,
        available_now=True,
    )
    q.awaitTermination()

    streamed = stx.read_cms_sketch(spark, str(tmp_path / "sketch"))
    all_docs = spark.createDataFrame(part1 + part2, schema)
    counts = (
        word_shingles(all_docs, "doc_id", "text", n=1, distinct=False)
        .withColumnRenamed("shingle", "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch = cms_sketch(counts, "token", "n", depth=DEPTH, width=WIDTH)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # two batch partitions exist; re-merging is what keeps them honest
    raw = spark.read.option(
        "basePath", str(tmp_path / "sketch")
    ).parquet(str(tmp_path / "sketch"))
    assert raw.select("batch_id").distinct().count() == 2


def test_bloom_no_false_negatives(spark):
    from news_data_pipeline_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(50)], "fp string"
    )
    # tiny filter: collisions guaranteed, yet every member MUST hit
    bits = bloom_bits(members, "fp", num_bits=32, num_hashes=3)
    probed = bloom_probe(
        members, "fp", bits, num_bits=32, num_hashes=3
    ).collect()
    assert len(probed) == 50  # left joins preserve the probe rows
    assert all(r.maybe_member == 1 for r in probed)


def test_bloom_definite_negatives_and_size(spark):
    from news_data_pipeline_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(10)], "fp string"
    )
    bits = bloom_bits(members, "fp", num_bits=4096, num_hashes=4)
    n_bits = bits.count()
    assert n_bits <= 40  # at most k*n distinct positions
    # fpp at n=10, m=4096, k=4 is ~1e-8; these fixed probes are
    # deterministic (md5), so a pass today is a pass forever
    others = spark.createDataFrame(
        [(f"novel-{i}",) for i in range(20)], "fp string"
    )
    probed = bloom_probe(others, "fp", bits, num_bits=4096, num_hashes=4)
    assert all(r.maybe_member == 0 for r in probed.collect())


def test_bloom_mergeable(spark):
    from news_data_pipeline_spark.operators.sketches import bloom_bits

    rows = [(f"x{i}",) for i in range(30)]
    whole = bloom_bits(
        spark.createDataFrame(rows, "fp string"),
        "fp", num_bits=64, num_hashes=4,
    )
    a = bloom_bits(
        spark.createDataFrame(rows[:15], "fp string"),
        "fp", num_bits=64, num_hashes=4,
    )
    b = bloom_bits(
        spark.createDataFrame(rows[15:], "fp string"),
        "fp", num_bits=64, num_hashes=4,
    )
    merged = a.unionByName(b).distinct()
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in whole.collect()
    )


def test_bloom_prefilters_exact_antijoin(spark):
    """The 100-TB composition: probe new fingerprints against the
    corpus filter; definite-new rows skip the exact anti-join entirely
    and the final new-set equals the plain anti-join's answer."""
    import pyspark.sql.functions as F  # noqa: F811

    from news_data_pipeline_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    corpus = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(40)], "fp string"
    )
    batch = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(30, 50)]  # 10 dups, 10 new
        + [("doc-35",)],  # duplicate within the overlap
        "fp string",
    )
    bits = bloom_bits(corpus, "fp", num_bits=64, num_hashes=3)
    probed = bloom_probe(batch, "fp", bits, num_bits=64, num_hashes=3)
    definite_new = probed.where(F.col("maybe_member") == 0).drop(
        "maybe_member"
    )
    maybe = probed.where(F.col("maybe_member") == 1).drop("maybe_member")
    resolved_new = maybe.join(corpus, "fp", "left_anti")
    got = sorted(
        r.fp for r in definite_new.unionByName(resolved_new).collect()
    )
    want = sorted(r.fp for r in batch.join(corpus, "fp", "left_anti").collect())
    assert got == want
    # and every true member was routed to the maybe side
    overlap = {f"doc-{i}" for i in range(30, 40)}
    assert overlap <= {r.fp for r in maybe.collect()}


def test_streaming_bloom_matches_batch_filter(spark, tmp_path):
    """The streamed filter (per-batch bit partitions merged on read)
    equals the batch filter over the same members — and probing it
    routes every historical member to the maybe side."""
    import os

    from news_data_pipeline_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )
    from news_data_pipeline_spark.streaming import sinks as stx

    landing = tmp_path / "fp_in"
    os.makedirs(landing)
    schema = "fp string"
    part1 = [(f"doc-{i}",) for i in range(12)]
    part2 = [(f"doc-{i}",) for i in range(12, 25)]
    spark.createDataFrame(part1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "f1"))
    spark.createDataFrame(part2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    q = stx.maintain_bloom_filter(
        stream,
        term_col="fp",
        filter_path=str(tmp_path / "bloom"),
        checkpoint=str(tmp_path / "ckpt"),
        num_bits=64,
        num_hashes=3,
        available_now=True,
    )
    q.awaitTermination()

    streamed = stx.read_bloom_filter(spark, str(tmp_path / "bloom"))
    batch = bloom_bits(
        spark.createDataFrame(part1 + part2, schema),
        "fp", num_bits=64, num_hashes=3,
    )
    assert sorted(r.bit for r in streamed.collect()) == sorted(
        r.bit for r in batch.collect()
    )
    probed = bloom_probe(
        spark.createDataFrame(part1 + part2, schema),
        "fp", streamed, num_bits=64, num_hashes=3,
    )
    assert all(r.maybe_member == 1 for r in probed.collect())


def test_bloom_empty_member_set(spark):
    """An empty member set yields an empty filter; every probe is a
    definite negative (no bits set) and no row is lost."""
    from news_data_pipeline_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame([], "fp string")
    bits = bloom_bits(members, "fp", num_bits=64, num_hashes=3)
    assert bits.count() == 0
    probes = spark.createDataFrame([("a",), ("b",)], "fp string")
    out = bloom_probe(probes, "fp", bits, num_bits=64, num_hashes=3).collect()
    assert len(out) == 2
    assert all(r.maybe_member == 0 for r in out)


def test_sketch_readers_on_unwritten_paths(spark, tmp_path):
    """A sketch/filter path no batch has written yet reads as the
    monoid identity (empty sketch -> every estimate 0; empty filter ->
    every probe definitely-not-a-member), not an AnalysisException —
    the fresh-deployment / empty-stream frontier."""
    from news_data_pipeline_spark.streaming.sinks import (
        read_bloom_filter,
        read_cms_sketch,
    )

    sk = read_cms_sketch(spark, str(tmp_path / "never_written_sketch"))
    assert sk.columns == ["row", "bucket", "counter"]
    assert sk.count() == 0
    bf = read_bloom_filter(spark, str(tmp_path / "never_written_filter"))
    assert bf.columns == ["bit"]
    assert bf.count() == 0
