"""Property tests for the DQ engine vs a naive Python model.

The engine (dq/engine.py) evaluates every rule as a boolean column in
ONE annotated pass and splits valid/quarantined with two filters. These
tests re-derive the expected outcome per row with plain Python over
randomized frames and assert the engine agrees exactly:

* per-row flags: each row's quarantine ``reasons`` equals the model's
  violated-rule list, in rule order;
* split invariants: valid and quarantined partition the input — every
  row in exactly one side, multiplicities preserved;
* report: per-rule violation counts and pass/fail match the model, and
  ``passed`` is the conjunction.

Rows carry a unique ``rid`` so multisets can be compared row-by-row and
``Unique(quarantine_all=False)``'s keep-first is deterministic.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from news_data_pipeline_spark.dq import run_dq
from news_data_pipeline_spark.dq.rules import (
    InRange,
    InSet,
    Matches,
    MinRows,
    NotNull,
    Unique,
)

SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)

# (k: nullable text incl. empty, v: small int or null, s: shaped text)
row_strategy = st.tuples(
    st.one_of(st.none(), st.text(alphabet="ab", max_size=2)),
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
    st.one_of(st.none(), st.sampled_from(["x1", "y2", "zz", ""])),
)

SCHEMA = "rid bigint, k string, v bigint, s string"


def model_violations(rows: list[tuple]) -> dict[int, list[str]]:
    """Naive Python re-derivation of every rule flag, keyed by rid.

    Must mirror the registered rule ORDER in RULES below — reasons
    arrays preserve it.
    """
    from collections import Counter

    v_counts = Counter(r[2] for r in rows)  # None groups like a value

    out: dict[int, list[str]] = {}
    for rid, k, v, s in rows:
        reasons = []
        if k is None or k == "":
            reasons.append("not_null(k)")
        if v_counts[v] > 1:
            reasons.append("unique(v)")
        if v is not None and (v < -1 or v > 2):
            reasons.append("in_range(v,-1,2)")
        if s is not None and not re.search(r"^[a-z]\d$", s):
            reasons.append("matches(s)")
        if s is not None and s not in ("x1", "y2"):
            reasons.append("in_set(s)")
        out[rid] = reasons
    return out


@given(st.lists(row_strategy, min_size=1, max_size=12))
@SETTINGS
def test_dq_engine_matches_python_model(spark, rows):
    tagged = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(tagged, schema=SCHEMA)

    rules = [
        NotNull("k"),
        Unique("v"),
        InRange("v", lo=-1, hi=2),
        Matches("s", r"[a-z]\d", full_match=True),
        InSet("s", ["x1", "y2"]),
    ]
    expected = model_violations(tagged)

    res = run_dq(df, rules)
    got_valid = {r["rid"] for r in res.valid.collect()}
    got_q = {r["rid"]: list(r["reasons"]) for r in res.quarantined.collect()}

    # per-row flags match the model, in rule order
    for rid, reasons in expected.items():
        if reasons:
            assert got_q.get(rid) == reasons, (rid, got_q.get(rid), reasons)
        else:
            assert rid in got_valid

    # split partitions the input: disjoint, union = all rids
    assert got_valid.isdisjoint(got_q)
    assert got_valid | set(got_q) == {t[0] for t in tagged}
    assert res.valid.count() + res.quarantined.count() == len(tagged)

    # report counts mirror the model
    report = res.report
    for rule in rules:
        n = sum(1 for r in expected.values() if rule.rule_name() in r)
        entry = report[rule.rule_name()]
        assert entry["violations"] == n
        assert entry["passed"] == (n == 0)
    assert res.passed == all(not r for r in expected.values())


@given(st.lists(row_strategy, min_size=2, max_size=10))
@SETTINGS
def test_dq_keep_first_unique_matches_model(spark, rows):
    """Unique(quarantine_all=False): exactly one survivor per duplicated
    key — the rid-smallest — and every extra copy quarantined."""
    tagged = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(tagged, schema=SCHEMA)
    res = run_dq(df, [Unique("v", quarantine_all=False, order_by=("rid",))])

    from collections import Counter

    v_counts = Counter(t[2] for t in tagged)
    first = {}
    for rid, _, v, _ in sorted(tagged):
        first.setdefault(v, rid)
    expected_q = {
        rid for rid, _, v, _ in tagged if v_counts[v] > 1 and first[v] != rid
    }
    got_q = {r["rid"] for r in res.quarantined.collect()}
    assert got_q == expected_q
    # survivors: every distinct v appears exactly once among valid rows
    valid_vs = [r["v"] for r in res.valid.collect()]
    assert sorted(valid_vs, key=lambda x: (x is None, x)) == sorted(
        set(t[2] for t in tagged), key=lambda x: (x is None, x)
    )


@given(st.lists(row_strategy, min_size=1, max_size=8), st.integers(1, 12))
@SETTINGS
def test_dq_min_rows_threshold(spark, rows, threshold):
    tagged = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(tagged, schema=SCHEMA)
    res = run_dq(df, [MinRows(threshold)])
    entry = res.report[f"min_rows({threshold})"]
    assert entry["passed"] == (len(tagged) >= threshold)
    # MinRows is table-level: it never quarantines rows
    assert res.quarantined.count() == 0
    assert res.valid.count() == len(tagged)


# --- round-4 operator properties (same randomized-model discipline) ---

doc_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abc x", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=10,
)


@given(doc_strategy, st.sampled_from([0.3, 0.5, 0.9]))
@SETTINGS
def test_remove_frequent_segments_matches_model(spark, rows, ratio):
    """Randomized docs vs a Python model of df-threshold segment
    removal (delimiter=' '): kept segments, order, and counts agree."""
    from collections import defaultdict

    from news_data_pipeline_spark.operators.dedup import (
        remove_frequent_segments,
    )

    tagged = [(i, t[0]) for i, t in enumerate(rows)]
    df = spark.createDataFrame(tagged, "doc_id long, text string")

    seg_docs = defaultdict(set)
    for rid, text in tagged:
        for seg in text.split(" "):
            if seg:
                seg_docs[seg].add(rid)
    n = len(tagged)
    hot = {s for s, ds in seg_docs.items() if len(ds) > ratio * n}
    expected = {}
    for rid, text in tagged:
        kept = [s for s in text.split(" ") if s and s not in hot]
        expected[rid] = (" ".join(kept), len(kept))

    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_segments_kept"])
        for r in remove_frequent_segments(
            df, "doc_id", "text", delimiter=" ", max_doc_ratio=ratio
        ).collect()
    }
    assert got == expected


@given(
    st.lists(st.sampled_from(["aa bb", "cc dd", "", "ee"]), min_size=1, max_size=6),
    st.lists(st.sampled_from(["AA,bb!", "cc dd", "ff gg"]), min_size=1, max_size=6),
)
@SETTINGS
def test_exact_against_corpus_matches_model(spark, corpus_texts, batch_texts):
    """Survivors = batch rows whose normalization fingerprint (lowercase
    alphanumeric) is absent from the corpus; empty fingerprints always
    survive (null-key anti-join semantics)."""
    import re as _re

    from news_data_pipeline_spark.operators.dedup import (
        exact_dedup_against_corpus,
    )

    def fp(t):
        return _re.sub(r"[^a-z0-9]", "", t.lower())

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    corpus_fps = {fp(t) for t in corpus_texts if fp(t)}
    expected = {
        100 + i
        for i, t in enumerate(batch_texts)
        if not fp(t) or fp(t) not in corpus_fps
    }
    got = {
        r["doc_id"]
        for r in exact_dedup_against_corpus(
            batch, corpus, "text"
        ).collect()
    }
    assert got == expected
