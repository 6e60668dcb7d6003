"""Scalar text/column/id functions — reference parity + fixed semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Row

from news_data_pipeline_spark.functions import columns as C
from news_data_pipeline_spark.functions import ids, text


def one(spark, value, fn):
    df = spark.createDataFrame([(value,)], schema="v string")
    return df.select(fn(F.col("v")).alias("out")).first()["out"]


def test_strip_html(spark):
    assert one(spark, "<p>Hello <b>world</b></p>", text.strip_html) == "Hello world"
    assert one(spark, "no tags", text.strip_html) == "no tags"
    assert one(spark, None, text.strip_html) is None  # null-safe, no UDF


def test_extract_domain(spark):
    # The reference's URL regex (02:70) incl. the www-strip group.
    assert one(spark, "https://www.example.com/a/b", text.extract_domain) == "example.com"
    assert one(spark, "http://news.site.org/x", text.extract_domain) == "news.site.org"
    assert one(spark, "not a url", text.extract_domain) == ""


def test_word_count_is_a_real_token_count(spark):
    # Fixes the reference's length(content) mislabeled as word count (02:71).
    assert one(spark, "one two  three", text.word_count) == 3
    assert one(spark, "   ", text.word_count) == 0
    assert one(spark, "", text.word_count) == 0


def test_token_count_counts_punctuation_separately(spark):
    assert one(spark, "hello, world!", text.token_count) == 4


def test_sentiment_deterministic_lexicon(spark):
    # polarity = (pos - neg) / max(words, 1); label from sign.
    assert one(spark, "good good bad x", text.sentiment_polarity) == 0.25
    assert one(spark, "bad", text.sentiment_polarity) == -1.0
    assert one(spark, "nothing here", text.sentiment_polarity) == 0.0
    df = spark.createDataFrame([("good day",), ("bad day",), ("meh",)], ["v"])
    labels = [
        r["l"]
        for r in df.select(
            text.sentiment_label(text.sentiment_polarity(F.col("v"))).alias("l")
        ).collect()
    ]
    assert labels == ["positive", "negative", "neutral"]


def test_detect_language(spark):
    assert one(spark, "the cat and the dog of the house", text.detect_language) == "en"
    assert one(spark, "el perro y la casa de que", text.detect_language) == "es"
    assert one(spark, "zzz qqq xxx", text.detect_language) == "und"


def test_fingerprint_stable_under_formatting(spark):
    a = one(spark, "Hello,   World!", text.fingerprint)
    b = one(spark, "hello world", text.fingerprint)
    c = one(spark, "hello there", text.fingerprint)
    assert a == b != c


def test_quality_score_band(spark):
    # 10 clean words: 0.5*10/50 + 0.3*1.0 + 0.2 = 0.6
    assert one(spark, "w " * 9 + "w", text.quality_score) == 0.6


def test_normalize_column_names_single_project(spark):
    df = spark.createDataFrame([Row(**{"published at": 1, "Source Name": 2})])
    out = C.normalize_column_names(df)
    assert out.columns == ["PUBLISHED_AT", "SOURCE_NAME"]
    # one Project in the plan, not a rename-loop tower
    assert str(out.logicalPlan if hasattr(out, "logicalPlan") else "").count("Project") <= 1


def test_flatten_structs(spark):
    df = spark.createDataFrame(
        [Row(source=Row(name="bbc", id=7), title="t")]
    )
    out = C.flatten_structs(df)
    assert set(out.columns) == {"source_name", "source_id", "title"}
    assert out.first()["source_name"] == "bbc"


def test_require_columns(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    assert C.require_columns(df, ["a", "b", "c"]) == ["b", "c"]


def test_surrogate_key_stable_and_null_safe(spark):
    df = spark.createDataFrame([("x", None), ("x", None), ("y", "z")], ["a", "b"])
    out = df.select(ids.surrogate_key("a", "b").alias("k")).collect()
    assert out[0]["k"] == out[1]["k"]  # deterministic, run-independent
    assert out[0]["k"] != out[2]["k"]
    assert len(out[0]["k"]) == 32  # md5 hex — no 5-char truncation collisions


def test_surrogate_key_xxhash_variant(spark):
    df = spark.createDataFrame([("x",)], ["a"])
    v = df.select(ids.surrogate_key("a", algo="xxhash64").alias("k")).first()["k"]
    assert isinstance(v, int)


def test_surrogate_key_component_boundaries(spark):
    # ('ab','c') and ('a','bc') must NOT collide (separator between parts)
    df = spark.createDataFrame([("ab", "c", "a", "bc")], ["w", "x", "y", "z"])
    r = df.select(
        ids.surrogate_key("w", "x").alias("k1"),
        ids.surrogate_key("y", "z").alias("k2"),
    ).first()
    assert r["k1"] != r["k2"]


def test_redact_pii(spark):
    s = (
        "mail me at jane.doe+x@corp.example.com or call +1 (555) 123-4567; "
        "server 10.0.0.1, ssn 123-45-6789"
    )
    out = one(spark, s, text.redact_pii)
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out and "<SSN>" in out
    assert "jane" not in out and "555" not in out and "10.0.0.1" not in out
    assert one(spark, "no pii here", text.redact_pii) == "no pii here"
    n = one(spark, s, text.pii_count)
    assert n >= 3  # email, phone, ip, ssn (phone/ssn may overlap-count)


def test_clean_text_strips_controls_and_collapses_whitespace(spark):
    from news_data_pipeline_spark.functions.text import clean_text
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("a\x00b\x07c",),            # control chars -> spaces -> collapsed
            ("  lots\t\tof\n\nspace  ",),
            ("\x0bvertical\x0btab\x0b",),
            ("",),
        ],
        "t string",
    )
    got = [r["c"] for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    assert got == ["a b c", "lots of space", "vertical tab", ""]


def test_global_running_sum_matches_single_window(spark):
    from pyspark.sql import Window
    from news_data_pipeline_spark.functions.ids import global_running_sum

    df = spark.range(100).select(
        F.col("id"), ((F.col("id") * 37) % 11).cast("double").alias("v")
    )
    got = {
        r["id"]: r["running_sum"]
        for r in global_running_sum(
            df, "id", "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want
    # empty input
    empty = spark.createDataFrame([], "id long, v double")
    assert global_running_sum(empty, "id", "v").count() == 0


def test_bench_compact_line_stays_driver_parseable():
    # The round driver captures only a tail of bench.py's stdout; the
    # LAST line must be complete, self-sufficient JSON and stay well
    # under any plausible capture window even with every suite query
    # timed (r4 regression: one 2.8 KB detail line -> "parsed": null).
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    timings = {name: 1.234 for name in bench.HEADLINE_QUERIES}
    minmax = {name: [1.1, 1.4] for name in bench.HEADLINE_QUERIES}
    tail = {name: 2.345 for name in bench.TAIL_QUERIES}
    tail_mm = {name: [2.1, 2.6] for name in bench.TAIL_QUERIES}
    build = {name: 6.789 for name in bench.BUILD_COST_QUERIES}
    build_mm = {name: [6.1, 7.2] for name in bench.BUILD_COST_QUERIES}
    detail, compact = bench.format_output(
        timings, minmax, tail, tail_mm, 0.1, build, build_mm
    )
    parsed = _json.loads(compact)
    assert parsed["metric"] == "headline_query_wall_clock"
    assert {
        "value", "unit", "queries", "tail_value", "build_value", "sf"
    } <= set(parsed)
    assert parsed["value"] == round(1.234 * len(bench.HEADLINE_QUERIES), 3)
    # build-cost trackers are reported but NEVER folded into the
    # cross-round comparison totals (round-11 tier split)
    assert parsed["tail_value"] == round(
        2.345 * len(bench.TAIL_QUERIES), 3
    )
    assert parsed["build_value"] == round(
        6.789 * len(bench.BUILD_COST_QUERIES), 3
    )
    assert set(bench.BUILD_COST_QUERIES).isdisjoint(bench.TAIL_QUERIES)
    assert set(bench.BUILD_COST_QUERIES).isdisjoint(bench.HEADLINE_QUERIES)
    assert len(compact) < 1024  # stays inside a conservative tail window
    assert "\n" not in compact and "\n" not in detail  # one line each


def test_normalize_unicode_forms_and_nulls(spark):
    import pytest

    import pyspark.sql.functions as F

    from news_data_pipeline_spark.functions.arrow_text import (
        normalize_unicode,
    )

    rows = [
        ("ﬁle",),          # ligature fi + "le"
        ("café",),        # decomposed accent
        ("plain",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [
        r["n"]
        for r in df.select(
            normalize_unicode(F.col("t"), form="NFKC").alias("n")
        ).collect()
    ]
    assert got == ["file", "café", "plain", None]
    # NFC keeps compatibility characters (the ligature survives)
    nfc = [
        r["n"]
        for r in df.select(
            normalize_unicode(F.col("t"), form="NFC").alias("n")
        ).collect()
    ]
    assert nfc[0] == "ﬁle" and nfc[1] == "café"
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(F.col("t"), form="NFX")


def test_compression_ratio_separates_repetition_from_prose(spark):
    import pytest

    import pyspark.sql.functions as F

    from news_data_pipeline_spark.functions.arrow_text import (
        compression_ratio,
    )

    rows = [
        ("spam ham " * 500,),                          # pure repetition
        ("The quick brown fox jumps over the lazy dog. "
         "Pack my box with five dozen liquor jugs. "
         "Sphinx of black quartz, judge my vow. " * 12,),  # prose-ish
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [
        r["r"]
        for r in df.select(compression_ratio(F.col("t")).alias("r")).collect()
    ]
    rep, prose, empty, null = got
    assert rep is not None and prose is not None
    assert rep < 0.02          # run-length floor for pure repetition
    assert rep < prose         # repetition compresses (much) better
    assert empty is None and null is None
    with pytest.raises(ValueError, match="level"):
        compression_ratio(F.col("t"), level=0)


def test_compression_ratio_bands_match_stdlib_zlib(spark):
    """Exact band evidence the SQL oracle cannot state (no engine
    exposes a zlib scalar): the band histogram — built here exactly as
    ``compression_ratio_invariants`` builds it — must equal a
    stdlib-zlib recomputation over the same parquet, cell for cell.
    Same evidence strength as the driver's value hash, delivered
    locally; the registered query's oracle covers the implied
    invariants (conservation, bounds, run-length floor)."""
    import math
    import zlib
    from collections import Counter

    import duckdb

    from news_data_pipeline_spark.functions.arrow_text import (
        compression_ratio,
    )
    from news_data_pipeline_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    band = F.floor(compression_ratio(F.col("text")) * 10).cast("int")
    hist = (
        load_table(spark, sf, "documents")
        .select(band.alias("ratio_band"))
        .groupBy("ratio_band")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    got = {r.ratio_band: r.n_docs for r in hist.collect()}
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    ]
    want: Counter = Counter()
    for t in texts:
        if t is None or not t.encode("utf-8"):
            want[None] += 1
            continue
        raw = t.encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / len(raw)
        want[math.floor(ratio * 10)] += 1
    assert got == dict(want)

    # and the registered invariants query's values, recomputed exactly
    from news_data_pipeline_spark.queries import query_map

    inv = {
        r.invariant: r.value
        for r in query_map()["compression_ratio_invariants"](
            spark, sf
        ).collect()
    }
    n_null = want.pop(None, 0)
    assert inv == {
        "n_docs_banded": sum(want.values()),
        "n_null_band": n_null,
        "n_band_out_of_bounds": 0,
        "repeat_text_band": 0,
    }


def test_compression_ratio_invariants_survive_empty_and_blank_texts(
    spark, tmp_path, monkeypatch
):
    """Empty-string documents have blen=0: the bounds division uses
    try_divide so the zero divisor can never throw under ANSI
    regardless of expression evaluation order (the when()'s And guard
    short-circuits today, but that is an implementation detail, not a
    contract). Blank and null texts count into n_null_band; neither
    crashes nor lands out-of-bounds."""
    from news_data_pipeline_spark.queries import corpusops, query_map

    docs = spark.createDataFrame(
        [(1, "a natural prose document with words", "en"),
         (2, "", "en"),
         (3, None, "en"),
         (4, "x", "en")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    real = corpusops.load_table
    monkeypatch.setattr(
        corpusops,
        "load_table",
        lambda s, d, t: s.read.parquet(path) if t == "documents"
        else real(s, d, t),
    )
    inv = {
        r.invariant: r.value
        for r in query_map()["compression_ratio_invariants"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert inv == {
        "n_docs_banded": 2,
        "n_null_band": 2,
        "n_band_out_of_bounds": 0,
        "repeat_text_band": 0,
    }


def test_union_evolved_widens_and_fills(spark):
    import datetime

    from news_data_pipeline_spark.functions.columns import union_evolved

    day1 = spark.createDataFrame(
        [(1, "alpha", datetime.date(2024, 1, 1))],
        "id int, title string, seen date",
    )
    day2 = spark.createDataFrame(
        [(2**40, "beta", datetime.datetime(2024, 1, 2, 3, 4, 5), "en")],
        "id long, title string, seen timestamp, lang string",
    )
    out = union_evolved([day1, day2])
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {
        "id": "bigint",
        "title": "string",
        "seen": "timestamp",
        "lang": "string",
    }
    rows = {r.id: r for r in out.collect()}
    assert rows[1].lang is None  # missing column -> typed NULL
    assert rows[1].seen == datetime.datetime(2024, 1, 1, 0, 0)  # date widened
    assert rows[2**40].lang == "en"
    # column order is first-seen
    assert out.columns == ["id", "title", "seen", "lang"]


def test_union_evolved_conflict_falls_back_to_string(spark):
    from news_data_pipeline_spark.functions.columns import union_evolved

    a = spark.createDataFrame([(1, True)], "id int, flag boolean")
    b = spark.createDataFrame([(2, 7)], "id int, flag long")
    out = union_evolved([a, b])
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["flag"] == "string"
    got = {r.id: r.flag for r in out.collect()}
    assert got == {1: "true", 2: "7"}


def test_union_evolved_decimal_pairs_widen_to_covering_decimal(spark):
    """decimal/decimal drift keeps exact decimal arithmetic: the
    covering decimal(max int digits + max scale) represents every
    value of both inputs, where the old double fallback silently
    rounded past ~15-16 significant digits (ADVICE r7)."""
    from decimal import Decimal

    from news_data_pipeline_spark.functions.columns import union_evolved

    a = spark.createDataFrame(
        [(Decimal("12345678901234567890.123456789012345678"),)],
        "v decimal(38,18)",
    )
    b = spark.createDataFrame(
        [(Decimal("9.9999999999"),)], "v decimal(20,10)"
    )
    out = union_evolved([a, b])
    assert out.schema["v"].dataType.simpleString() == "decimal(38,18)"
    got = sorted(r.v for r in out.collect())
    # exactness: the 38-digit value survives bit-for-bit (double would
    # have rounded it)
    assert got == [
        Decimal("9.9999999999"),
        Decimal("12345678901234567890.123456789012345678"),
    ]
    # decimal + integral also covers exactly: bigint needs 19 integer
    # digits, so decimal(10,4) + bigint -> decimal(23,4)
    c = spark.createDataFrame([(Decimal("1.5000"),)], "v decimal(10,4)")
    d = spark.createDataFrame([(9223372036854775807,)], "v bigint")
    out2 = union_evolved([c, d])
    assert out2.schema["v"].dataType.simpleString() == "decimal(23,4)"
    assert sorted(r.v for r in out2.collect()) == [
        Decimal("1.5000"),
        Decimal("9223372036854775807.0000"),
    ]
    # past the 38-digit cap the covering decimal does not exist:
    # documented double fallback, and float/decimal mixes stay double
    e = spark.createDataFrame(
        [(Decimal("1"),)], "v decimal(38,0)"
    )
    f = spark.createDataFrame([(Decimal("1.5"),)], "v decimal(2,1)")
    assert (
        union_evolved([e, f]).schema["v"].dataType.simpleString()
        == "double"
    )
    g = spark.createDataFrame([(1.5,)], "v double")
    assert (
        union_evolved([f, g]).schema["v"].dataType.simpleString()
        == "double"
    )


def test_union_evolved_decimal_vs_nonnumeric_is_string(spark):
    """decimal vs a NON-numeric peer is a true conflict → string, the
    same fallback every other conflicting pair gets (ADVICE r8: the
    decimal branch hijacked these pairs to double, which NULLs — or
    under ANSI mode throws on — the string frame's non-numeric rows)."""
    from decimal import Decimal

    from news_data_pipeline_spark.functions.columns import (
        _widen,
        union_evolved,
    )

    assert _widen("decimal(12,2)", "string") == "string"
    assert _widen("string", "decimal(12,2)") == "string"
    assert _widen("decimal(12,2)", "boolean") == "string"
    assert _widen("date", "decimal(12,2)") == "string"
    # numeric peers still take the decimal branch
    assert _widen("decimal(12,2)", "bigint") == "decimal(21,2)"
    assert _widen("decimal(12,2)", "double") == "double"

    a = spark.createDataFrame(
        [(1, Decimal("19.99"))], "id int, v decimal(12,2)"
    )
    b = spark.createDataFrame([(2, "not-a-number")], "id int, v string")
    out = union_evolved([a, b])
    assert out.schema["v"].dataType.simpleString() == "string"
    got = {r.id: r.v for r in out.collect()}
    # the non-numeric value SURVIVES (double would have nulled/thrown)
    assert got == {1: "19.99", 2: "not-a-number"}


def test_union_evolved_single_and_empty(spark):
    import pytest

    from news_data_pipeline_spark.functions.columns import union_evolved

    df = spark.createDataFrame([(1,)], "id int")
    assert union_evolved([df]).collect() == df.collect()
    with pytest.raises(ValueError):
        union_evolved([])


def test_union_evolved_mixed_numeric_to_double(spark):
    from news_data_pipeline_spark.functions.columns import union_evolved

    a = spark.createDataFrame([(1, 5)], "id int, v long")
    b = spark.createDataFrame([(2, 2.5)], "id int, v double")
    out = union_evolved([a, b])
    assert dict(out.dtypes)["v"] == "double"
    assert {r.v for r in out.collect()} == {5.0, 2.5}


def test_canonicalize_url_edges(spark):
    from news_data_pipeline_spark.functions.text import canonicalize_url

    cases = [
        # fragment + utm stripped, real param kept
        ("https://A.example.com/p?utm_s=1&id=2#frag",
         "https://a.example.com/p?id=2"),
        # all params are tracking -> no dangling '?'
        ("https://a.example.com/p?utm_a=1&utm_b=2",
         "https://a.example.com/p"),
        # no query at all; trailing slash stripped
        ("https://a.example.com/p/", "https://a.example.com/p"),
        # utm mid-string; order of kept params preserved
        ("https://a.example.com/p?id=1&utm_x=9&q=2",
         "https://a.example.com/p?id=1&q=2"),
        # 'utmost' is not a tracking prefix match victim
        ("https://a.example.com/p?utmost=1",
         "https://a.example.com/p?utmost=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_widen_lattice_properties():
    """_widen is the join of a widening lattice: commutative,
    idempotent, and never maps a non-numeric type into a numeric one
    (the ADVICE-r8 decimal-hijack class, pinned for every pair)."""
    from itertools import product

    from news_data_pipeline_spark.functions.columns import _widen

    types = [
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "decimal(12,2)", "decimal(38,18)", "decimal(20,10)",
        "string", "boolean", "date", "timestamp",
    ]
    numerics = {
        "tinyint", "smallint", "int", "bigint", "float", "double",
    }

    def is_numeric(t):
        return t in numerics or t.startswith("decimal")

    for a, b in product(types, types):
        w = _widen(a, b)
        assert w == _widen(b, a), (a, b)          # commutative
        assert _widen(a, a) == a, a               # idempotent
        assert _widen(w, w) == w, (a, b)          # result is a fixpoint
        # a numeric result only ever comes from two numeric inputs
        if is_numeric(w):
            assert is_numeric(a) and is_numeric(b), (a, b, w)
        # mixed numeric/non-numeric is ALWAYS the string fallback
        if is_numeric(a) != is_numeric(b):
            assert w == "string", (a, b, w)
