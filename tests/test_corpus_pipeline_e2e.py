"""End-to-end LLM-corpus pipeline: every stage a pipeline actually runs,
composed once, on deliberately dirty multi-format input.

landing (JSONL + CSV, with corrupt lines)
  -> declared-schema ingestion with quarantine
  -> Unicode normalization (ligature/accent variants must merge later)
  -> quality filtering (compression-ratio repetition gate)
  -> exact near-dup removal (fingerprint, AFTER normalization — the
     whole reason normalization precedes dedup)
  -> temperature mixture rebalancing across sources
  -> packed context-window layout for the training export

The unit tests pin each operator alone; this test pins that the
CONTRACTS line up — column names, null behavior, determinism — when a
user chains them the way the README sells it.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_dirty_multiformat_corpus_to_packed_export(spark, tmp_path):
    from news_data_pipeline_spark.functions.arrow_text import (
        compression_ratio,
        normalize_unicode,
    )
    from news_data_pipeline_spark.operators.dedup import fingerprint_dedup
    from news_data_pipeline_spark.operators.packing import pack_sequences
    from news_data_pipeline_spark.operators.sampling import (
        mixture_sample_by_rates,
        temperature_mixture_rates,
    )
    from news_data_pipeline_spark.sources.csvio import read_csv
    from news_data_pipeline_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt_records,
    )

    # --- landing: two formats, both dirty --------------------------------
    jdir = tmp_path / "jsonl"
    jdir.mkdir()
    (jdir / "web.jsonl").write_text(
        '{"doc_id": 1, "source": "web", "text": "the ﬁle of things"}\n'
        "NOT JSON AT ALL\n"
        '{"doc_id": 2, "source": "web", "text": "the file of things"}\n'
        '{"doc_id": 3, "source": "web", "text": "spam ham spam ham spam ham '
        'spam ham spam ham spam ham spam ham spam ham spam ham spam ham"}\n'
        + "".join(
            f'{{"doc_id": {10 + i}, "source": "web", '
            f'"text": "unique web document number {i} about topic {i * 7}"}}\n'
            for i in range(40)
        )
    )
    cdir = tmp_path / "csv"
    cdir.mkdir()
    (cdir / "wiki.csv").write_text(
        "doc_id,source,text\n"
        "100,wiki,café culture and history\n"   # decomposed accent
        "101,wiki,café culture and history\n"          # composed twin
        "bad-row-without-enough-fields\n"
        + "".join(
            f"{110 + i},wiki,encyclopedic article {i} on subject {i * 3}\n"
            for i in range(8)
        )
    )

    schema = "doc_id INT, source STRING, text STRING"
    jv, jq = split_corrupt_records(read_jsonl(spark, str(jdir), schema))
    cv, cq = split_corrupt_records(
        read_csv(spark, str(cdir), schema, skip_header=True)
    )
    assert jq.count() == 1 and cq.count() == 1  # nothing silently dropped
    corpus = jv.unionByName(cv)
    assert corpus.count() == 43 + 10

    # --- normalize, then quality-gate ------------------------------------
    normed = corpus.withColumn("text", normalize_unicode(F.col("text")))
    gated = normed.withColumn("cr", compression_ratio(F.col("text"))).where(
        # repetition gate only meaningfully applies to longer docs;
        # tiny docs always "compress badly" (header overhead)
        (F.length("text") < 60) | (F.col("cr") > 0.5)
    )
    assert 3 not in {r["doc_id"] for r in gated.select("doc_id").collect()}

    # --- dedup AFTER normalization: the ligature and accent twins merge --
    deduped = fingerprint_dedup(gated, "text", "doc_id")
    kept_ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert not {1, 2} <= kept_ids and ({1, 2} & kept_ids)
    assert not {100, 101} <= kept_ids and ({100, 101} & kept_ids)

    # --- temperature mixture: wiki (minority) keeps all, web downsamples -
    rates = temperature_mixture_rates(deduped, "source", alpha=0.0)
    mixed = mixture_sample_by_rates(deduped, "doc_id", "source", rates)
    by = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    n_wiki = deduped.where("source = 'wiki'").count()
    assert by["wiki"] == n_wiki            # capped at keep-everything
    assert by["web"] < deduped.where("source = 'web'").count()

    # --- packed export layout --------------------------------------------
    with_tokens = mixed.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )
    packed = pack_sequences(with_tokens, "doc_id", "n_tokens", ctx_len=16)
    rows = packed.select(
        "id", "start_offset", "seq_first", "seq_last", "n_ctx"
    ).collect()
    assert len(rows) == mixed.count()
    total_tokens = sum(
        r["n_tokens"] for r in with_tokens.select("n_tokens").collect()
    )
    # offsets tile the stream exactly: max(start+len) == total tokens
    lens = {
        r["doc_id"]: r["n_tokens"]
        for r in with_tokens.select("doc_id", "n_tokens").collect()
    }
    assert max(r["start_offset"] + lens[r["id"]] for r in rows) == total_tokens
    offs = sorted(r["start_offset"] for r in rows)
    assert offs[0] == 0 and len(set(offs)) == len(offs)
    assert all(r["seq_first"] == r["start_offset"] // 16 for r in rows)

    # --- the whole chain is deterministic: run it again, same answer -----
    jv2, _ = split_corrupt_records(read_jsonl(spark, str(jdir), schema))
    cv2, _ = split_corrupt_records(
        read_csv(spark, str(cdir), schema, skip_header=True)
    )
    corpus2 = jv2.unionByName(cv2).withColumn(
        "text", normalize_unicode(F.col("text"))
    )
    gated2 = corpus2.withColumn("cr", compression_ratio(F.col("text"))).where(
        (F.length("text") < 60) | (F.col("cr") > 0.5)
    )
    mixed2 = mixture_sample_by_rates(
        fingerprint_dedup(gated2, "text", "doc_id"),
        "doc_id",
        "source",
        temperature_mixture_rates(
            fingerprint_dedup(gated2, "text", "doc_id"), "source", alpha=0.0
        ),
    )
    assert sorted(r["doc_id"] for r in mixed2.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in mixed.select("doc_id").collect()
    )
