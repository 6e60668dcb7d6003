"""Streaming sinks: foreachBatch DQ split, availableNow runner.

``foreachBatch`` is where streaming meets the batch DQ engine: each
micro-batch is an ordinary DataFrame, so the same one-pass rule engine
(``dq.run_dq``) splits it and both sides are written transactionally per
batch — the streaming version of the reference's quarantine flow
(``02:43-52``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from news_data_pipeline_spark.dq.engine import run_dq, to_quarantine_records
from news_data_pipeline_spark.dq.rules import Rule
from news_data_pipeline_spark.sources.writers import write_layer


def split_to_silver_and_quarantine(
    stream: DataFrame,
    rules: list[Rule],
    *,
    silver_path: str,
    quarantine_path: str,
    checkpoint: str,
    source_table: str = "events",
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Per-micro-batch DQ split: valid rows land under silver, violations
    (with JSON payload + reasons) under the quarantine audit path.

    Idempotence: foreachBatch alone is only at-least-once (a crash
    between a write and the checkpoint commit replays the batch), so
    each batch writes to its own ``batch_id=N`` hive partition with
    OVERWRITE — a replayed batch rewrites the same directory instead of
    appending duplicates. Readers scan the parent path and see
    ``batch_id`` as an ordinary partition column.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        # Both split sides are consumed -> cache the annotated frame once.
        res = run_dq(batch, rules, cache=True)
        try:
            write_layer(
                res.valid,
                f"{silver_path}/batch_id={batch_id}",
                mode="overwrite",
                fmt=fmt,
            )
            processed_at = datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            quarantined = to_quarantine_records(
                res.quarantined,
                source_table=source_table,
                ingestion_time=processed_at,
            )
            write_layer(
                quarantined,
                f"{quarantine_path}/batch_id={batch_id}",
                mode="overwrite",
                fmt=fmt,
            )
        finally:
            # release the per-batch cache even when a write fails — a
            # retried batch would otherwise strand one cached frame per
            # attempt
            res._annotated.unpersist()

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def publish_snapshots(
    aggregated: DataFrame,
    *,
    layer_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = False,
    keep_versions: int = 2,
    vacuum_min_age_seconds: float = 3600.0,
) -> StreamingQuery:
    """Streaming materialized view with ATOMIC publishes.

    Each micro-batch of a complete-mode aggregate overwrites the whole
    result; writing it to a plain path would expose readers to Spark's
    delete-then-write window on every single batch. Routing the batch
    through ``VersionedLayer.overwrite`` makes each refresh a pointer
    swap: a reader always loads a complete snapshot — the previous one
    until the instant the new one commits. Old snapshots are vacuumed
    inline (never the current one, and never inside the vacuum grace
    window): with the default 1-hour ``vacuum_min_age_seconds``, a
    fast-triggering stream accumulates up to an hour of snapshots on
    disk before pruning — lower it (to, say, 2-3 trigger intervals) for
    high-frequency refreshes of large aggregates.

    This is the Spark-native answer to the reference's Delta gold
    tables refreshed per run (``_lib_dq_helpers.py:216,226``): the same
    always-consistent-read behavior, no table format required.
    """
    from news_data_pipeline_spark.sources.writers import VersionedLayer

    layer = VersionedLayer(layer_path, fmt=fmt)

    def _publish(batch: DataFrame, batch_id: int) -> None:
        # both the emptiness probe and the write consume the aggregate —
        # cache so the (possibly expensive) complete-mode result computes
        # once per trigger, mirroring run_dq(cache=True) in the DQ sink
        batch.persist()
        try:
            if not batch.head(1):
                return
            layer.overwrite(batch)
        finally:
            batch.unpersist()
        layer.vacuum(
            batch.sparkSession,
            keep=keep_versions,
            min_age_seconds=vacuum_min_age_seconds,
        )

    writer = (
        aggregated.writeStream.outputMode("complete")
        .foreachBatch(_publish)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _batch_partition_ids(spark, path: str) -> set:
    """``batch_id`` partition values present under ``path`` — a
    driver-side directory listing (O(#batches), no data scan), empty if
    the path does not exist. Used to prove the ``_bloom`` side table
    covers every corpus partition before trusting it."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return set()
    out = set()
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            out.add(int(name.split("=", 1)[1]))
    return out


def _fs(spark, path: str):
    """Hadoop FileSystem + Path for ``path`` (driver-side metadata IO)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _write_json_sidecar(spark, path: str, payload: dict) -> None:
    """Overwrite a tiny JSON metadata file at ``path`` via the Hadoop
    FS API — bytes-sized driver-side IO, invisible to Spark table
    readers when the file name is underscore-prefixed."""
    import json

    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def _read_json_sidecar(spark, path: str) -> dict | None:
    """Read a JSON sidecar written by ``_write_json_sidecar``; ``None``
    if absent or unparsable (callers treat that as "re-derive")."""
    import json

    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # py4j copies byte[] args, so stream.read(buf) can't fill a
        # Python bytearray — drain JVM-side via commons-io instead
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    try:
        return json.loads(text)
    except ValueError:
        return None


#: sentinel ``batch_id`` for the compacted bloom bit partition — real
#: micro-batch ids are non-negative, so the probe read's
#: ``batch_id != current`` filter always keeps it.
_COMPACTED_BATCH_ID = -1


def _bloom_partition_sizing(
    spark, bloom_path: str, part_id: int, fmt: str
) -> tuple | None:
    """The ``(num_bits, num_hashes)`` one bloom bit partition was
    hashed under, or ``None`` when unknowable (pre-stamping partition
    — the caller must rebuild it). Prefers the ``_sizing.json``
    sidecar (driver-side bytes read, no scan); partitions written
    before sidecars fall back to one single-partition parquet read."""
    side = _read_json_sidecar(
        spark, f"{bloom_path}/batch_id={part_id}/_sizing.json"
    )
    if side is not None and {"num_bits", "num_hashes"} <= set(side):
        return (side["num_bits"], side["num_hashes"])
    try:
        one = (
            spark.read.format(fmt)
            .load(f"{bloom_path}/batch_id={part_id}")
        )
        if {"num_bits", "num_hashes"} <= set(one.columns):
            row = one.select("num_bits", "num_hashes").head(1)
            if row:
                return (row[0]["num_bits"], row[0]["num_hashes"])
    except Exception:
        pass
    return None


def compact_bloom_partitions(
    spark,
    corpus_path: str,
    *,
    num_bits: int,
    num_hashes: int,
    fmt: str = "parquet",
) -> int:
    """OR-merge every bloom bit partition under ``{corpus_path}/_bloom``
    into the single sentinel partition ``batch_id=-1`` and record which
    corpus partitions it covers in a ``_covered.json`` root sidecar.

    Why: the per-partition layout is what makes replay idempotent (a
    replayed batch overwrites exactly its own bits), but after hundreds
    of triggers the per-trigger partition LISTING and the probe read's
    footer count grow with batch count (``SCALE.md`` round-9 noted the
    creep). Compaction restores O(1): one merged bit partition + one
    sidecar carrying the sizing and the covered ids, so the coverage
    and sizing guards keep working without per-partition metadata.

    Safety: only partitions verified to be hashed under the CURRENT
    ``(num_bits, num_hashes)`` are merged — merging foreign hash spaces
    is the Bloom false-negative bug the sizing guard exists to stop;
    mismatched partitions are left in place for the sink's rebuild
    path. A batch replayed AFTER its bits were merged re-creates its
    own partition; its stale bits remain inside the merged set, which
    is only false-positive-direction (extra maybe-rows re-checked by
    the corpus anti-join) — exact-parity is preserved.

    Returns the number of per-batch partitions merged away.
    """
    from pyspark.sql import functions as F

    bloom_path = f"{corpus_path}/_bloom"
    parts = _batch_partition_ids(spark, bloom_path)
    has_sentinel = _COMPACTED_BATCH_ID in parts
    parts.discard(_COMPACTED_BATCH_ID)
    prior = _read_json_sidecar(spark, f"{bloom_path}/_covered.json") or {}
    prior_ok = (
        prior.get("num_bits") == num_bits
        and prior.get("num_hashes") == num_hashes
    )
    # the coverage claim in _covered.json is only meaningful while the
    # sentinel partition that BACKS it exists: if the sentinel is lost
    # (crash between the delete and rename in the swap below, or an
    # external cleanup) the claimed-covered bits are gone, and trusting
    # the sidecar here would write a NEW _covered.json whose sentinel
    # holds only this call's mergeable bits — Bloom false negatives on
    # the previously-covered partitions (round-11 ADVICE). The in-sink
    # flow self-heals (rebuild precedes compaction); this guard makes
    # the standalone path equally safe.
    trusted_prior = prior_ok and has_sentinel
    covered = set(prior.get("covered", [])) if trusted_prior else set()
    mergeable = {
        pid
        for pid in parts
        if _bloom_partition_sizing(spark, bloom_path, pid, fmt)
        == (num_bits, num_hashes)
    }
    if not mergeable and trusted_prior:
        return 0
    sources = [f"{bloom_path}/batch_id={pid}" for pid in sorted(mergeable)]
    if trusted_prior:
        sources.append(f"{bloom_path}/batch_id={_COMPACTED_BATCH_ID}")
    if not sources:
        if prior and not has_sentinel:
            # orphaned coverage claim with no sentinel behind it —
            # remove it so no later call can be tempted to trust it
            fs, _ = _fs(spark, bloom_path)
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(
                    f"{bloom_path}/_covered.json"
                ),
                False,
            )
        return 0
    merged = (
        spark.read.format(fmt)
        .load(sources)
        .select("bit")
        .distinct()
        .withColumn("num_bits", F.lit(num_bits))
        .withColumn("num_hashes", F.lit(num_hashes))
    )
    # stage the merge, then swap: the sentinel partition may be one of
    # the inputs, so writing over it mid-read would corrupt the scan
    staging = f"{bloom_path}/_compact_staging"
    write_layer(merged, staging, mode="overwrite", fmt=fmt)
    fs, _ = _fs(spark, bloom_path)
    jvm = spark._jvm
    dest = jvm.org.apache.hadoop.fs.Path(
        f"{bloom_path}/batch_id={_COMPACTED_BATCH_ID}"
    )
    fs.delete(dest, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), dest)
    _write_json_sidecar(
        spark,
        f"{bloom_path}/batch_id={_COMPACTED_BATCH_ID}/_sizing.json",
        {"num_bits": num_bits, "num_hashes": num_hashes},
    )
    _write_json_sidecar(
        spark,
        f"{bloom_path}/_covered.json",
        {
            "covered": sorted(covered | mergeable),
            "num_bits": num_bits,
            "num_hashes": num_hashes,
        },
    )
    for pid in sorted(mergeable):
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{bloom_path}/batch_id={pid}"),
            True,
        )
    return len(mergeable)


def ingest_deduplicated(
    stream: DataFrame,
    *,
    id_col: str,
    text_col: str,
    corpus_path: str,
    checkpoint: str,
    method: str = "exact",
    fmt: str = "parquet",
    available_now: bool = False,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    compact_after: int | None = None,
) -> StreamingQuery:
    """Continuously ingest documents, deduplicating each micro-batch
    against everything already accepted — the streaming twin of
    ``dedup.exact_dedup_against_corpus`` / ``lsh_dedup_against_corpus``.

    Per batch: batch-internal exact dedup first (deterministic
    keep-lowest-id — a batch can carry its own duplicates), then the
    against-corpus probe (``method='exact'`` fingerprint anti-join,
    ``'lsh'`` MinHash band-bucket probe for near-dups, or ``'bloom'``
    — identical keep/drop to ``'exact'``, but a Bloom filter maintained
    under ``{corpus_path}/_bloom`` routes definite-new rows past the
    corpus anti-join entirely), and survivors append to the corpus as
    their own ``batch_id=N`` partition. The ``_bloom`` side table is
    invisible to corpus readers (Spark's file index skips
    underscore-prefixed paths) and each batch writes only its own
    survivors' bits — replay overwrites both partitions together.
    Before trusting the filter, each trigger compares the corpus and
    ``_bloom`` partition listings and backfills bits for any corpus
    partition that lacks them (e.g. partitions ingested earlier via
    ``method='exact'``) — a filter that misses corpus partitions would
    produce Bloom false negatives against the real corpus and append
    true duplicates, breaking the exact-parity contract. Each bit
    partition also records the ``(num_bits, num_hashes)`` it was
    hashed under (constant columns, RLE'd away by the format); a
    partition whose recorded sizing differs from the current call's
    (operator redeployed with new parameters) is rebuilt the same way
    — merging bit sets from different hash spaces is the same
    false-negative failure as a missing partition, just quieter.

    Idempotence: a replayed batch (crash between write and checkpoint
    commit) overwrites its own partition, and the corpus read EXCLUDES
    the current ``batch_id`` — otherwise a replay would see its own
    prior output as "corpus", flag every row duplicate, and overwrite
    the partition with nothing. Reading the parent path with
    ``basePath`` surfaces ``batch_id`` as an ordinary partition column,
    so the exclusion is partition pruning, not a scan-and-filter.

    Sizing validation is sidecar-based and memoized: each bit
    partition carries a ``_sizing.json`` (plus the stamped columns for
    pre-sidecar compatibility); a trigger validates only partitions it
    has not seen, with driver-side bytes reads — steady state does no
    validation IO at all (the round-8 guard re-scanned the whole bit
    table with ``mergeSchema`` every micro-batch). When
    ``compact_after`` is set, a trigger that leaves at least that many
    per-batch bit partitions OR-merges them into one sentinel
    partition via ``compact_bloom_partitions`` — the per-trigger
    partition listing and probe-read footer count stay O(1) over
    unbounded batch counts instead of growing with ingest history.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from news_data_pipeline_spark.functions.text import fingerprint
    from news_data_pipeline_spark.operators.dedup import (
        bloom_dedup_against_corpus,
        exact_dedup_against_corpus,
        fingerprint_dedup,
        lsh_dedup_against_corpus,
    )
    from news_data_pipeline_spark.operators.sketches import bloom_bits

    if method not in ("exact", "lsh", "bloom"):
        raise ValueError(
            f"method must be 'exact', 'lsh' or 'bloom', got {method!r}"
        )
    if "batch_id" in stream.columns:
        raise ValueError(
            "ingest_deduplicated reserves 'batch_id' for the corpus "
            "partition column; rename it first"
        )
    bloom_path = f"{corpus_path}/_bloom"

    def _stamped_bits(fp_frame: DataFrame) -> DataFrame:
        # bit partitions carry their sizing so a later trigger can
        # detect (and rebuild) partitions hashed under other parameters
        return (
            bloom_bits(
                fp_frame, "__fp", num_bits=num_bits, num_hashes=num_hashes
            )
            .withColumn("num_bits", F.lit(num_bits))
            .withColumn("num_hashes", F.lit(num_hashes))
        )

    def _write_bits(spark, fp_frame: DataFrame, part_id: int) -> None:
        part_path = f"{bloom_path}/batch_id={part_id}"
        write_layer(
            _stamped_bits(fp_frame), part_path, mode="overwrite", fmt=fmt
        )
        # sizing sidecar: lets later triggers validate this partition
        # with a driver-side bytes read instead of a parquet scan
        _write_json_sidecar(
            spark,
            f"{part_path}/_sizing.json",
            {"num_bits": num_bits, "num_hashes": num_hashes},
        )

    # bloom partitions whose sizing has been confirmed at the current
    # (num_bits, num_hashes) — validation is memoized across triggers so
    # steady state does zero per-partition IO (the round-8 guard read
    # the WHOLE bit table with mergeSchema every micro-batch)
    validated: set[int] = set()

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        deduped = fingerprint_dedup(batch, text_col, id_col)
        try:
            corpus = (
                spark.read.option("basePath", corpus_path)
                .format(fmt)
                .load(corpus_path)
                .where(F.col("batch_id") != batch_id)
                .drop("batch_id")
            )
            # force schema resolution now: an empty/first-run path must
            # fall into the no-corpus branch, not fail mid-probe
            corpus.schema
            have_corpus = True
        except AnalysisException:
            have_corpus = False
        if have_corpus:
            if method == "exact":
                deduped = exact_dedup_against_corpus(
                    deduped, corpus, text_col
                )
            elif method == "bloom":
                # The filter is only trustworthy if it covers EVERY
                # corpus partition: a corpus written (partly) by
                # method='exact'/'lsh' has partitions with no bits, and
                # probing a filter that misses them yields Bloom false
                # negatives against the real corpus — appending true
                # duplicates. Compare partition listings each trigger
                # (O(#batches) driver-side) and backfill any corpus
                # partition that lacks bits before probing.
                corpus_parts = _batch_partition_ids(spark, corpus_path)
                bloom_parts = _batch_partition_ids(spark, bloom_path)
                corpus_parts.discard(batch_id)
                bloom_parts.discard(batch_id)
                # Coverage alone isn't enough: a partition written
                # under DIFFERENT (num_bits, num_hashes) — operator
                # redeployed with new sizing — would merge a foreign
                # hash space into the bit set and produce Bloom false
                # negatives just like a missing partition. Each
                # unvalidated partition's sizing is read from its
                # ``_sizing.json`` sidecar (driver-side bytes, no
                # scan; pre-sidecar partitions fall back to one
                # single-partition read of their stamped columns) and
                # the verdict is memoized, so steady state re-checks
                # nothing. Mismatched or pre-stamping partitions are
                # rebuilt alongside the missing ones.
                stale: set[int] = set()
                for pid in sorted(bloom_parts - validated):
                    if _bloom_partition_sizing(
                        spark, bloom_path, pid, fmt
                    ) == (num_bits, num_hashes):
                        validated.add(pid)
                    else:
                        stale.add(pid)
                # the compacted sentinel partition covers the corpus
                # partitions listed in the root ``_covered.json``
                covered_ids: set[int] = set()
                if _COMPACTED_BATCH_ID in bloom_parts:
                    if _COMPACTED_BATCH_ID in stale:
                        # a sentinel hashed under foreign sizing would
                        # merge a foreign hash space into EVERY probe
                        # read: drop it; its covered partitions rebuild
                        # below like any other missing partition
                        fs, _ = _fs(spark, bloom_path)
                        jvm = spark._jvm
                        fs.delete(
                            jvm.org.apache.hadoop.fs.Path(
                                f"{bloom_path}/batch_id="
                                f"{_COMPACTED_BATCH_ID}"
                            ),
                            True,
                        )
                        fs.delete(
                            jvm.org.apache.hadoop.fs.Path(
                                f"{bloom_path}/_covered.json"
                            ),
                            False,
                        )
                        stale.discard(_COMPACTED_BATCH_ID)
                        bloom_parts.discard(_COMPACTED_BATCH_ID)
                    else:
                        meta = (
                            _read_json_sidecar(
                                spark, f"{bloom_path}/_covered.json"
                            )
                            or {}
                        )
                        if (
                            meta.get("num_bits") == num_bits
                            and meta.get("num_hashes") == num_hashes
                        ):
                            covered_ids = set(meta.get("covered", []))
                ok_parts = (bloom_parts - stale) - {_COMPACTED_BATCH_ID}
                for missing in sorted(
                    corpus_parts - (ok_parts | covered_ids)
                ):
                    part_fp = (
                        spark.read.format(fmt)
                        .load(f"{corpus_path}/batch_id={missing}")
                        .select(fingerprint(F.col(text_col)).alias("__fp"))
                    )
                    _write_bits(spark, part_fp, missing)
                    validated.add(missing)
                try:
                    bits = (
                        spark.read.option("basePath", bloom_path)
                        .format(fmt)
                        .load(bloom_path)
                        .where(F.col("batch_id") != batch_id)
                        .select("bit")
                        .distinct()
                    )
                    bits.schema
                except AnalysisException:
                    # corpus predates the filter entirely and had no
                    # partitions to backfill: build bits inline
                    bits = None
                deduped = bloom_dedup_against_corpus(
                    deduped,
                    corpus,
                    text_col,
                    num_bits=num_bits,
                    num_hashes=num_hashes,
                    corpus_bits=bits,
                )
            else:
                deduped = lsh_dedup_against_corpus(
                    deduped,
                    corpus,
                    id_col,
                    text_col,
                    shingle_n=shingle_n,
                    bands=bands,
                    rows_per_band=rows_per_band,
                )
        if method == "bloom":
            # survivors feed two writes (corpus + filter bits): compute
            # the dedup lineage once per batch
            deduped.persist()
        try:
            write_layer(
                deduped,
                f"{corpus_path}/batch_id={batch_id}",
                mode="overwrite",
                fmt=fmt,
            )
            if method == "bloom":
                surv_fp = deduped.select(
                    fingerprint(F.col(text_col)).alias("__fp")
                )
                _write_bits(spark, surv_fp, batch_id)
                validated.add(batch_id)
        finally:
            if method == "bloom":
                deduped.unpersist()
        if method == "bloom" and compact_after is not None:
            live = _batch_partition_ids(spark, bloom_path)
            live.discard(_COMPACTED_BATCH_ID)
            if len(live) >= compact_after:
                compact_bloom_partitions(
                    spark,
                    corpus_path,
                    num_bits=num_bits,
                    num_hashes=num_hashes,
                    fmt=fmt,
                )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now(
    df: DataFrame, *, checkpoint: str, out_path: str | None = None,
    fmt: str = "parquet", output_mode: str = "append",
) -> None:
    """Run a streaming plan over everything currently available, then stop.

    ``availableNow`` processes the backlog in bounded batches and
    terminates — the batch-replay mode used by tests and backfills.
    """
    writer = df.writeStream.trigger(availableNow=True).outputMode(output_mode)
    if out_path is None:
        q = writer.format("noop").start()
    else:
        q = (
            writer.format(fmt)
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    q.awaitTermination()


def apply_cdc_batch(
    batch: DataFrame,
    layer,
    key_list: list[str],
    *,
    dedup_order_col: str | None = None,
    op_col: str | None = None,
    delete_value: str = "d",
) -> None:
    """One CDC micro-batch against a ``VersionedLayer``: resolve the
    latest change per key (``dedup_order_col`` descending), split the
    delete arm, MERGE both arms, commit one new version. This IS the
    body ``apply_cdc`` runs per micro-batch — public so a bounded batch
    replay (backfill, test, the ``cdc_apply_final_state`` registry
    query) exercises the identical code path the streaming sink does.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from news_data_pipeline_spark.operators.upsert import merge_upsert

    if not batch.head(1):
        return
    b = batch
    if dedup_order_col is not None:
        w = Window.partitionBy(*key_list).orderBy(F.desc(dedup_order_col))
        b = (
            b.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    if op_col is not None:
        dels = b.where(F.col(op_col) == delete_value).select(*key_list)
        ups = b.where(
            (F.col(op_col) != delete_value) | F.col(op_col).isNull()
        ).drop(op_col)
    else:
        dels, ups = None, b
    spark = b.sparkSession
    try:
        merged = merge_upsert(layer.read(spark), ups, key_list)
    except IOError:  # first batch bootstraps the table
        merged = ups
    if dels is not None:
        merged = merge_upsert(merged, dels, key_list, delete=True)
    layer.overwrite(merged)


def apply_cdc(
    stream: DataFrame,
    *,
    keys: str | list[str],
    layer_path: str,
    checkpoint: str,
    dedup_order_col: str | None = None,
    op_col: str | None = None,
    delete_value: str = "d",
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously apply a change stream to a keyed table — the
    streaming MERGE INTO (the pattern every CDC/changefeed consumer
    runs): per micro-batch, keep the LATEST change per key, route
    deletes, and commit one new table version atomically.

    * ``dedup_order_col`` (a version/timestamp column on the stream)
      resolves multiple changes to one key inside a micro-batch —
      REQUIRED with ``op_col``, because whether the key ends deleted or
      upserted depends on which change is last; without ``op_col`` it
      is optional and batches must then carry unique keys.
    * ``op_col``/``delete_value``: rows whose op equals ``delete_value``
      remove their key; all other rows upsert (the op column itself is
      not stored).

    Semantics per batch are exactly ``operators.upsert.merge_upsert``
    (update arm, then delete arm) against the current
    ``VersionedLayer`` version, committed with the pointer swap —
    readers always see a complete table. Replay-idempotent: applying
    the same resolved batch to the already-merged table is a no-op
    (upserts rewrite identical values, deletes find nothing), so a
    crash between commit and checkpoint is safe.

    Scale: one full-outer shuffle per batch on the key — copy-on-write
    over the whole table each commit, the honest no-log baseline (a
    table format prunes rewrites to matched files; see
    ``operators/upsert`` module notes).
    """
    from news_data_pipeline_spark.sources.writers import VersionedLayer

    key_list = [keys] if isinstance(keys, str) else list(keys)
    if op_col is not None and dedup_order_col is None:
        raise ValueError(
            "op_col requires dedup_order_col: last-change-wins per key "
            "is undefined without an ordering column"
        )
    layer = VersionedLayer(layer_path, fmt=fmt)

    def _process(batch: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            batch,
            layer,
            key_list,
            dedup_order_col=dedup_order_col,
            op_col=op_col,
            delete_value=delete_value,
        )

    writer = (
        stream.writeStream.outputMode("update")
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_cms_sketch(
    stream: DataFrame,
    *,
    id_col: str,
    text_col: str,
    sketch_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain a count-min token sketch over a document stream — the
    streaming twin of ``operators.sketches.cms_heavy_hitters``'s build
    phase, and the reason the sketch is a monoid: each micro-batch
    contributes its own constant-size sketch, and the current corpus
    sketch is just the counter-sum of all of them.

    Each batch writes ITS OWN sketch to a ``batch_id=N`` partition
    (``depth * width`` rows at most, regardless of batch size), so a
    replayed batch (crash between write and checkpoint commit)
    overwrites its own partition instead of double-counting — the same
    idempotence contract as ``ingest_deduplicated``. Readers merge with
    ``read_cms_sketch``; a compaction job may fold old partitions into
    one at any time without changing any estimate, because counter
    addition is associative.
    """
    from pyspark.sql import functions as F

    from news_data_pipeline_spark.operators.dedup import word_shingles
    from news_data_pipeline_spark.operators.sketches import cms_sketch

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        tokens = word_shingles(
            batch, id_col, text_col, n=1, distinct=False
        ).withColumnRenamed("shingle", "token")
        counts = tokens.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        sketch = cms_sketch(counts, "token", "n", depth=depth, width=width)
        write_layer(
            sketch,
            f"{sketch_path}/batch_id={batch_id}",
            mode="overwrite",
            fmt=fmt,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_sketch(spark, sketch_path: str, *, fmt: str = "parquet"):
    """Merge every per-batch sketch partition into the current corpus
    sketch: one groupBy-sum over at most ``n_batches * depth * width``
    rows. Point-query it with ``operators.sketches.cms_estimates``.

    A sketch path no batch has written yet (empty stream, fresh
    deployment) reads as the EMPTY sketch — the monoid identity — not
    an error: every estimate against it is 0, which is the true count
    of everything an empty stream has seen."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        raw = (
            spark.read.option("basePath", sketch_path)
            .format(fmt)
            .load(sketch_path)
        )
        raw.schema
    except AnalysisException:
        return spark.createDataFrame(
            [], "row int, bucket bigint, counter bigint"
        )
    return raw.groupBy("row", "bucket").agg(
        F.sum("counter").cast("long").alias("counter")
    )


def maintain_bloom_filter(
    stream: DataFrame,
    *,
    term_col: str,
    filter_path: str,
    checkpoint: str,
    num_bits: int = 4096,
    num_hashes: int = 4,
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain a Bloom membership filter over a stream — the
    set-membership twin of ``maintain_cms_sketch``, and the live half
    of the incremental-dedup contract: new batches probe the merged
    filter (``operators.sketches.bloom_probe``) and only
    ``maybe_member`` rows pay the exact anti-join against history.

    Each batch writes ITS OWN bit set to a ``batch_id=N`` partition
    (at most ``num_bits`` rows regardless of batch size); a replayed
    batch overwrites its partition, and since the merge is
    union+distinct (bit-OR — idempotent, unlike CMS counter addition),
    even a duplicated partition could never corrupt the filter. A
    compaction job may fold old partitions into one at any time.
    """
    from news_data_pipeline_spark.operators.sketches import bloom_bits

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        bits = bloom_bits(
            batch, term_col, num_bits=num_bits, num_hashes=num_hashes
        )
        write_layer(
            bits,
            f"{filter_path}/batch_id={batch_id}",
            mode="overwrite",
            fmt=fmt,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bloom_filter(spark, filter_path: str, *, fmt: str = "parquet"):
    """Merge every per-batch bit partition into the current corpus
    filter: one distinct over at most ``n_batches * num_bits`` rows.
    Probe it with ``operators.sketches.bloom_probe``.

    A filter path no batch has written yet reads as the EMPTY filter
    (no bits set — every probe reports definitely-not-a-member, which
    is true of an empty corpus), not an error."""
    from pyspark.errors import AnalysisException

    try:
        raw = (
            spark.read.option("basePath", filter_path)
            .format(fmt)
            .load(filter_path)
        )
        raw.schema
    except AnalysisException:
        return spark.createDataFrame([], "bit bigint")
    return raw.select("bit").distinct()


def maintain_sq_codes(
    stream: DataFrame,
    bounds: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    codes_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain an SQ8 code table over a vector stream — the
    quantized-index twin of ``maintain_cms_sketch`` for the ANN
    family: each micro-batch encodes its vectors under the FROZEN
    ``bounds`` artifact (operators.sq.sq_train output — frozen is what
    makes per-batch codes mergeable; re-training bounds per batch
    would silently re-scale history) and writes its own ``batch_id=N``
    partition. A replayed batch overwrites its partition — the same
    idempotence contract as every maintenance sink here. Readers merge
    with ``read_sq_codes``; re-quantize from raw vectors if the bounds
    artifact is ever retrained.
    """
    from news_data_pipeline_spark.operators.sq import sq_encode

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        write_layer(
            sq_encode(batch, bounds, id_col=id_col, vec_col=vec_col),
            f"{codes_path}/batch_id={batch_id}",
            mode="overwrite",
            fmt=fmt,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sq_codes(spark, codes_path: str, *, fmt: str = "parquet"):
    """The current merged code table: every batch partition, batch_id
    dropped (each vector id appears in exactly one batch, so the union
    IS the table — no re-aggregation needed, unlike the CMS counters).
    An unwritten path reads as the empty table — declared with the
    schema ``sq_encode`` actually writes (``j``/``code`` are INT from
    posexplode's position; ``id`` takes the caller's id type, assumed
    bigint here), so a union with freshly encoded codes neither fails
    nor silently widens on the empty branch."""
    from pyspark.errors import AnalysisException

    try:
        raw = (
            spark.read.option("basePath", codes_path)
            .format(fmt)
            .load(codes_path)
        )
        raw.schema
    except AnalysisException:
        return spark.createDataFrame([], "id bigint, j int, code int")
    return raw.select("id", "j", "code")


def maintain_pq_codes(
    stream: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    codes_path: str,
    checkpoint: str,
    sub_dim: int = 16,
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain a residual IVF×PQ code table over a vector stream —
    the ``by_residual=true`` twin of ``maintain_sq_codes``, completing
    the streamed-index family for the FAISS-default layout: each
    micro-batch encodes its vectors under the FROZEN (centroids,
    codebooks) artifacts (``operators.pq.pq_residual_encode`` —
    frozen is what makes per-batch codes mergeable; re-training either
    artifact per batch would silently re-quantize history against a
    different geometry) and writes its own ``batch_id=N`` partition,
    cell id stored with every code. A replayed batch overwrites its
    partition — the same idempotence contract as every maintenance
    sink here. Readers merge with ``read_pq_codes``; re-encode from
    raw vectors if either artifact is ever retrained (an explicit
    re-index, exactly as in FAISS)."""
    from news_data_pipeline_spark.operators.pq import pq_residual_encode

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        write_layer(
            # rebalance before the shard write (guide §6): the r14
            # row-local encode is narrow, so the shard would otherwise
            # inherit the batch's input partitioning — tiny files the
            # merged reader then pays per probe; the hint coalesces to
            # advisory-sized outputs at any batch size
            pq_residual_encode(
                batch,
                centroids,
                codebooks,
                id_col=id_col,
                vec_col=vec_col,
                sub_dim=sub_dim,
            ).hint("rebalance"),
            f"{codes_path}/batch_id={batch_id}",
            mode="overwrite",
            fmt=fmt,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pq_codes(spark, codes_path: str, *, fmt: str = "parquet"):
    """The current merged residual-code table: every batch partition,
    batch_id dropped (each vector id appears in exactly one batch, so
    the union IS the table — no re-aggregation needed). An unwritten
    path reads as the empty table, declared with the schema
    ``pq_residual_encode`` actually writes (``sub``/``code`` INT,
    ``cid`` from the centroid frame's id type — bigint here, matching
    the first-``nlist``-by-id convention; ``id`` assumed bigint)."""
    from pyspark.errors import AnalysisException

    try:
        raw = (
            spark.read.option("basePath", codes_path)
            .format(fmt)
            .load(codes_path)
        )
        raw.schema
    except AnalysisException:
        return spark.createDataFrame(
            [], "id bigint, sub int, code int, cid bigint"
        )
    return raw.select("id", "sub", "code", "cid")
