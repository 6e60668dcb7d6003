"""Build degenerate table fixtures for oracle-parity sweeps.

The r14 ADVICE item (``compression_ratio_invariants`` emitting NULL
where the oracle emits 0 on a corpus with zero banded docs) is one
instance of a whole class: Spark-side and DuckDB-side aggregates can
disagree on DEGENERATE inputs (empty tables, all-NULL payloads) while
agreeing on every real fixture. The driver gate can never catch these
(its fixtures are non-degenerate), so this tool builds the degenerate
fixtures and the standing ``check_oracle`` harness does the rest::

    python tools/degenerate_fixture.py empty /tmp/empty_sf
    python tools/check_oracle.py /tmp/empty_sf

    python tools/degenerate_fixture.py nullpayload /tmp/nullpay_sf
    python tools/check_oracle.py /tmp/nullpay_sf

Variants:

- ``empty``: every table schema-preserved with ZERO rows (DuckDB
  ``LIMIT 0`` copy of sf0.001).
- ``nullpayload``: key/identity columns intact (sf0.001 values), every
  nullable payload column NULLed — documents.text/lang/source,
  events.value/props, embeddings.embedding. Exercises the
  all-null-aggregate and null-propagation paths with non-zero row
  counts (the exact ADVICE-1 shape: rows exist, none band).

r14 sweep results (inventory for r15 — see COVERAGE.md round 14):
``empty`` found 7 mismatches, all triaged:

- 4x Spark-vs-ANSI engine divergence: ``rollup``/``cube``/
  ``groupingSets`` emit NO grand-total row over empty input where
  DuckDB and PostgreSQL emit the () grouping-set row
  (``order_status_rollup``, ``lineitem_flag_cube``,
  ``shipdate_rollup_revenue``, and ``priority_grouping_sets`` — the
  last FIXED in r14 via the filtered global-count correction term,
  zero-cost because its registry row was already r9-stale; the three
  r10 rows are zero-cost edits in r15 when they rotate into the stale
  cohort).
- 2x Spark emits sweep arms over an empty eval set where the oracle
  emits nothing (``ann_recall_nprobe_curve``, ``ann_recall_trained_-
  curve`` — r10, same zero-cost r15 window).
- 1x Spark returns an empty frame where the oracle emits its 4
  invariant rows (``pca_projection_invariants`` — r12; the mirror
  image of the r14 compression-invariants fix).

``nullpayload`` found 20 mismatches (213/233 agree), triaged classes
(none fixed in r14 — every row is non-stale, so each edit would push
an r9 row out of the 50-slot driver sample; they queue behind the r15
r10 rotation):

- 8x ORACLE-side crash on NULL embeddings/text (``cosine_topk_*``,
  ``embedding_label_stats``, ``embedding_neardup_pairs``,
  ``bloom_probe``, ``streamed_bloom_filter``, ``hard_negative_mining``)
  — DuckDB's list functions raise where the Spark operators flow NULL
  through; hardening means null-guarding BOTH sides identically.
- 1x SPARK-side crash: ``pq_partitioned_cell_scan`` raises on an
  all-NULL embedding column (codebook training path) — the one
  genuine engine-robustness bug found; highest-priority r15 fix.
- 3x NULL-aggregate dtype divergence (``gopher_quality_flags`` flag
  sums, ``ann_recall_*_curve`` n_hits): Spark NULL sums materialize
  float64 vs DuckDB int — the ADVICE-1 / r5-r6 driver-red class;
  fix = coalesce-to-0 on the Spark side like the r14
  compression_ratio_invariants fix.
- 5x guard asymmetry (one engine emits rows on the degenerate input,
  the other none): ``mixture_rate_sampled_counts`` 1v0,
  ``url_canonicalization`` 1v0, ``cosine_topk_ivf`` 0v50,
  ``ann_recall_at_k`` 0v10, ``pca_projection_invariants`` 0v4.
- 3x value diffs needing per-query triage: ``document_language_id``,
  ``csv_quarantine_split``, ``langid_confusion``.

The real fixtures are non-degenerate, so none of these can turn a
driver row red today; they are robustness debt, paid down in
stale-cohort-aligned batches.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.001"

# payload columns to NULL per table for the nullpayload variant; key
# and join columns stay intact so every query still has work to do
NULL_COLS = {
    "documents.parquet": ("text", "lang", "source"),
    "events.parquet": ("value", "props"),
    "embeddings.parquet": ("embedding",),
}


def build(variant: str, dst: str, src: str = SRC) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    co = duckdb.connect()
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        cols = [
            (r[0], r[1])
            for r in co.execute(
                f"DESCRIBE SELECT * FROM '{src}/{fname}'"
            ).fetchall()
        ]
        if variant == "empty":
            sel = "*"
            suffix = "LIMIT 0"
        elif variant == "nullpayload":
            nulled = set(NULL_COLS.get(fname, ()))
            sel = ", ".join(
                f"CAST(NULL AS {typ}) AS {c}" if c in nulled else c
                for (c, typ) in cols
            )
            suffix = ""
        else:
            raise SystemExit(f"unknown variant {variant!r}")
        co.execute(
            f"COPY (SELECT {sel} FROM '{src}/{fname}' {suffix})"
            f" TO '{dst}/{fname}' (FORMAT PARQUET)"
        )
        n = co.execute(f"SELECT count(*) FROM '{dst}/{fname}'").fetchone()[0]
        print(f"{fname}: {n} rows")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    build(sys.argv[1], sys.argv[2])
