"""Physical-plan audit over the whole declared query surface.

Compiles (never executes, except operators whose construction runs
eager checkpoints) every registered query at sf0.001 and extracts the
scale-relevant plan facts:

* exchanges (shuffles) and whether any is a single-partition funnel
* join strategies (broadcast-hash vs sort-merge vs nested-loop)
* Python boundaries (ArrowEval/MapInPandas vs forbidden BatchEvalPython)
* parquet scan pushdown (PushedFilters non-empty when the query filters
  on scan columns)

Writes PLANS.md (markdown table + flagged anomalies). Run after
changing any operator's plan shape:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from news_data_pipeline_spark.queries import query_map  # noqa: E402
from news_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# Reviewed BroadcastNestedLoopJoin sites: each broadcast side is bounded
# by construction, so the nested loop is O(rows x small-constant), not
# all-pairs. New BNLJ flags without an entry here need review.
KNOWN_BNLJ = {
    "perplexity_cut_assignments": "two 1-row corpus token-total broadcasts (the LM-score subtree appears under both the scores and the cuts arms)",
    "pq_ivf_residual_topk": "nlist=16 centroid frame broadcast into the corpus cell-assign, the query probe, and the residual subtraction — all nlist-sized",
    "ann_recall_at_k": "bounded query-vector broadcast (10 queries) in the exact arm + nlist=16 centroids and the same query set in the IVF arm — all contract-bounded",
    "hard_negative_mining": "bounded query-vector set broadcast (contract: small query side, same as cosine_topk_bruteforce)",
    "ivf_cell_sizes": "nlist=16 centroid frame broadcast into the one cell-assignment pass",
    "multimodal_crossmodal_topk": "nlist=16 centroid frame broadcast into both cell-assignment passes (image corpus + 5 text queries) of the IVF-PQ subtree",
    "perplexity_buckets": "1-row corpus token-total broadcast into the unigram log-prob (same subtree as document_lm_scores)",
    "perplexity_bucket_cuts": "1-row corpus token-total broadcast into the unigram log-prob (same subtree as document_lm_scores)",
    "adaptive_stopword_removal": "1-row corpus total broadcast into the df-ratio threshold",
    "dsir_importance_weights": "two 1-row model-total aggregates (raw/target) broadcast into the smoothed log-ratios",
    "pq_ivf_adc_topk": "nlist=16 centroid frame broadcast into both cell-assignment passes (corpus + queries)",
    "pq_ivf_rerank_topk": "nlist=16 centroid frame broadcast into both cell-assignment passes of the ADC shortlist subtree",
    "bm25_search": "1-row corpus stats (N, avgdl) broadcast to scorers",
    "cosine_topk_bruteforce": "bounded query-vector set broadcast (contract: small query side)",
    "cosine_topk_ivf": "nlist centroids + query vectors broadcast (both bounded)",
    "multimodal_embedding_topk": "query embedding set broadcast (bounded)",
    "orders_above_avg": "1-row scalar subquery (global AVG) broadcast",
    "tfidf_top_terms": "1-row corpus doc-count broadcast into idf",
    "document_lm_scores": "1-row total-token-count broadcast into the log-prob",
    "price_winsorized_stats": "1-row (p01, p99) clip-boundary aggregate broadcast",
    "event_user_skew_report": "1-row corpus event-total broadcast into the share ratio",
    "user_decayed_value": "1-row max-timestamp anchor broadcast into the decay age",
    "customer_rfm_segments": "1-row ref-date + 1-row quartile-boundary aggregates broadcast",
    "document_balance_weights": "1-row corpus total + language count broadcast into the shares",
    "customer_abc_classes": "1-row grand-total aggregate broadcast into the cumulative share",
    "source_lang_independence": "1-row contingency grand total broadcast into the expectations",
    "event_type_entropy_daily": "per-day totals (bounded by date range) broadcast into the probabilities",
    "document_bigram_lm_scores": "1-row corpus token-total broadcast into the interpolated probability",
    "tfidf_cosine_pairs": "1-row doc-count broadcast into idf; x4 because the weights subtree (which carries it) recurs under norms and both posting sides",
    "bpe_word_encodings": "x6 = one 1-row merge-pair broadcast per replayed rank (merges.where(rank==k) over the NUM_MERGES-row local artifact; apply_pair contract)",
    "bpe_symbol_vocab": "x6 = one 1-row merge-pair broadcast per replayed rank (same apply_merges chain as bpe_word_encodings)",
    "pq_partitioned_cell_scan": "nlist=16 centroid frame broadcast into the ingest-side cell assign and the query probe (same pair as pq_ivf_adc_topk; the code-table read itself is a partition-pruned parquet scan)",
    "ann_recall_nprobe_curve": "x30 = 5 sweep arms x (10-query broadcast in the exact arm + nlist=16 centroid frames in the IVF/probe/cell-size assigns + the 1-row hits x 1-row reads cross join) — every side contract-bounded, output 5 rows",
    "ann_recall_trained_curve": "x30 = same decomposition as ann_recall_nprobe_curve (the trained centroids are a collected nlist=16 literal, so every broadcast side stays contract-bounded)",
    "crossmodal_topk_frozen": "x1 = nlist=16 collected-centroid frame broadcast into the 5-text-query probe assign (corpus-side assign happened once at index build; the stored-cid probe is a broadcast hash join, not BNLJ)",
}

# Plan facts worth counting. CartesianProduct/BatchEvalPython are hard
# failures (tests/test_plans.py rejects them); BroadcastNestedLoopJoin
# is a soft flag — legitimate only for tiny broadcast sides.
PATTERNS = {
    "exchanges": r"Exchange ",
    "single_part": r"Exchange SinglePartition",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "arrow_py": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "bad_py": r"BatchEvalPython",
    "scans": r"FileScan parquet|Scan parquet",
    "pushed": r"PushedFilters: \[[^\]]",
}


_TS_INEQ = {"LessThan", "LessThanOrEqual", "GreaterThan", "GreaterThanOrEqual"}


def _jwalk(node):
    yield node
    for i in range(node.children().size()):
        yield from _jwalk(node.children().apply(i))


def ts_residual_joins(df) -> tuple[int, int]:
    """(licensed, unlicensed) joins whose condition carries a timestamp
    inequality — the per-key-quadratic interval-join shape (SCALE.md
    round 12). Licensed = the equi-key set includes the ``__tb`` time
    bucket (``interval_join_bucketed``); anything else is the shape
    tests/test_plans.py rejects. Walks the optimized LOGICAL plan so
    residuals Catalyst pushed into join conditions are seen."""
    licensed = unlicensed = 0
    for n in _jwalk(df._jdf.queryExecution().optimizedPlan()):
        if n.nodeName() != "Join":
            continue
        cond = n.condition()
        if not cond.isDefined():
            continue
        n_ineq, bucketed = 0, False
        for e in _jwalk(cond.get()):
            kind = e.nodeName()
            if kind in _TS_INEQ:
                t = e.children().apply(0).dataType().typeName()
                if t.startswith("timestamp"):
                    n_ineq += 1
            elif kind == "EqualTo":
                for side in (0, 1):
                    c = e.children().apply(side)
                    if (
                        c.nodeName() == "AttributeReference"
                        and c.name() == "__tb"
                    ):
                        bucketed = True
        if n_ineq:
            if bucketed:
                licensed += 1
            else:
                unlicensed += 1
    return licensed, unlicensed


def audit(spark, name: str, fn) -> dict:
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    physical = plan.split("== Physical Plan ==")[-1]
    out = {"name": name}
    for key, pat in PATTERNS.items():
        out[key] = len(re.findall(pat, physical))
    out["tsj_ok"], out["tsj_bad"] = ts_residual_joins(df)
    return out


def main() -> None:
    spark = get_spark("plan_audit")
    rows = []
    for name, fn in sorted(query_map().items()):
        try:
            rows.append(audit(spark, name, fn))
        except Exception as exc:  # pragma: no cover - audit must not die
            rows.append({"name": name, "error": str(exc)[:120]})

    lines = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        f"Generated by `tools/plan_audit.py` at `{SF_DIR}`. Counts from",
        "the optimized physical plan: shuffles (`exch`, of which",
        "single-partition funnels `1part`), join strategies (broadcast",
        "hash `bhj`, sort-merge `smj`, broadcast nested-loop `bnlj`),",
        "Arrow-batched Python stages (`arrow`), parquet scans and how",
        "many carry pushed filters. `CartesianProduct`/`BatchEvalPython` never appear —",
        "`tests/test_plans.py` rejects them mechanically; `bnlj` is",
        "legitimate only against a provably tiny broadcast side.",
        "",
        "| query | exch | 1part | bhj | smj | bnlj | arrow | scans | pushed |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    flagged = []
    for r in rows:
        if "error" in r:
            flagged.append(f"- `{r['name']}`: audit error: {r['error']}")
            continue
        lines.append(
            "| {name} | {exchanges} | {single_part} | {bhj} | {smj} "
            "| {bnlj} | {arrow_py} | {scans} | {pushed} |".format(**r)
        )
        if r["cartesian"] or r["bad_py"]:
            flagged.append(
                f"- `{r['name']}`: FORBIDDEN node in plan "
                f"(cartesian={r['cartesian']}, batch_py={r['bad_py']})"
            )
        if r["bnlj"]:
            why = KNOWN_BNLJ.get(r["name"])
            flagged.append(
                f"- `{r['name']}`: BroadcastNestedLoopJoin x{r['bnlj']} — "
                + (f"reviewed, bounded: {why}" if why else
                   "UNREVIEWED — verify the broadcast side is bounded")
            )
        if r.get("tsj_bad"):
            flagged.append(
                f"- `{r['name']}`: timestamp-inequality join residual "
                f"WITHOUT the __tb bucket key x{r['tsj_bad']} — the "
                "per-key-quadratic interval-join shape "
                "(tests/test_plans.py rejects this; SCALE.md r12)"
            )
        if r.get("tsj_ok"):
            flagged.append(
                f"- `{r['name']}`: interval join via __tb time-bucket "
                f"equi-key x{r['tsj_ok']} — licensed "
                "(operators.joins.interval_join_bucketed)"
            )
    lines.append("")
    lines.append("## Flags")
    lines.append("")
    lines.extend(flagged if flagged else ["- none"])
    lines.append("")

    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md: {len(rows)} queries, {len(flagged)} flags")
    spark.stop()


if __name__ == "__main__":
    main()
