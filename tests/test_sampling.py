"""Deterministic splitting/sampling invariants."""

from __future__ import annotations

import pytest

from news_data_pipeline_spark.operators.sampling import (
    assign_splits,
    deterministic_sample,
)


def docs(spark, n=2000):
    return spark.range(n).selectExpr(
        "id AS doc_id", "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END AS lang"
    )


def test_splits_are_stable_and_partition_the_data(spark):
    df = docs(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = assign_splits(df, "doc_id", weights=w)
    b = assign_splits(df, "doc_id", weights=w)
    # pure function of the key: two runs agree row-for-row
    assert a.join(b.withColumnRenamed("split", "split2"), "doc_id").where(
        "split != split2"
    ).count() == 0
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"]  # roughly weight-proportional
    assert abs(counts["train"] / 2000 - 0.8) < 0.05


def test_growing_a_split_keeps_existing_members(spark):
    df = docs(spark)
    small = assign_splits(df, "doc_id", weights={"train": 0.5, "val": 0.5})
    big = assign_splits(df, "doc_id", weights={"train": 0.7, "val": 0.3})
    # contiguous hash ranges: everyone in 50% train stays in 70% train
    moved = (
        small.where("split = 'train'")
        .select("doc_id")
        .join(big.where("split != 'train'").select("doc_id"), "doc_id")
    )
    assert moved.count() == 0


def test_overweight_splits_rejected(spark):
    with pytest.raises(ValueError):
        assign_splits(docs(spark), "doc_id", weights={"a": 0.8, "b": 0.3})


def test_deterministic_sample_rate_and_stability(spark):
    df = docs(spark)
    s1 = deterministic_sample(df, "doc_id", fraction=0.2, strata=["lang"])
    s2 = deterministic_sample(df, "doc_id", fraction=0.2, strata=["lang"])
    ids1 = {r["doc_id"] for r in s1.collect()}
    assert ids1 == {r["doc_id"] for r in s2.collect()}
    # per-stratum rate ~ fraction
    for lang, total in [("en", 667), ("de", 1333)]:
        got = s1.where(f"lang = '{lang}'").count()
        assert abs(got / total - 0.2) < 0.06, (lang, got, total)
    # growing the fraction only ADDS rows (hash-threshold monotonicity)
    s_big = deterministic_sample(df, "doc_id", fraction=0.5, strata=["lang"])
    assert ids1 <= {r["doc_id"] for r in s_big.collect()}


def test_null_keys_are_assigned_not_dropped(spark):
    df = spark.createDataFrame([(None,), (1,)], "doc_id bigint")
    out = assign_splits(df, "doc_id", weights={"train": 0.5, "val": 0.5})
    labels = {r["doc_id"]: r["split"] for r in out.collect()}
    assert labels[None] in ("train", "val")  # sentinel-hashed, not holdout
    kept = deterministic_sample(df, "doc_id", fraction=1.0)
    assert kept.count() == 2  # fraction=1.0 keeps EVERY row, nulls included


def test_strata_tuples_do_not_collide(spark):
    # ('x','yz') and ('xy','z') concatenate identically without a
    # separator — the \x1f join must give them independent draws.
    rows = [(k, "x", "yz") for k in range(300)]
    rows += [(k, "xy", "z") for k in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "s1", "s2"])
    kept = deterministic_sample(df, "doc_id", fraction=0.5, strata=["s1", "s2"])
    by_stratum = {
        ("x", "yz"): set(),
        ("xy", "z"): set(),
    }
    for r in kept.collect():
        by_stratum[(r["s1"], r["s2"])].add(r["doc_id"])
    # identical key sets would mean the strata share one salt
    assert by_stratum[("x", "yz")] != by_stratum[("xy", "z")]


def test_temperature_rates_match_python_reference(spark):
    from news_data_pipeline_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    # skewed corpus: en 700, fr 250, sw 50
    rows = (
        [(i, "en") for i in range(700)]
        + [(700 + i, "fr") for i in range(250)]
        + [(950 + i, "sw") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: (r["n"], r["p"], r["q"], r["rate"])
        for r in temperature_mixture_rates(df, "lang", alpha=0.3).collect()
    }
    n = {"en": 700, "fr": 250, "sw": 50}
    p = {k: v / 1000 for k, v in n.items()}
    qraw = {k: v ** 0.3 for k, v in p.items()}
    z = sum(qraw.values())
    for k in n:
        nk, pk, qk, rk = got[k]
        assert nk == n[k]
        assert pk == pytest.approx(p[k])
        assert qk == pytest.approx(qraw[k] / z)
        assert rk == pytest.approx(min(1.0, (qraw[k] / z) * 1000 / n[k]))
    # alpha=0.3 flattens: minority keeps everything, majority down-samples
    assert got["sw"][3] == 1.0
    assert got["en"][3] < 1.0
    # alpha=1 reproduces the natural mixture exactly: every rate 1
    nat = temperature_mixture_rates(df, "lang", alpha=1.0).collect()
    assert all(r["rate"] == pytest.approx(1.0) for r in nat)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture_rates(df, "lang", alpha=-0.1)


def test_mixture_sample_by_rates_matches_dict_variant(spark):
    from news_data_pipeline_spark.operators.sampling import (
        mixture_sample,
        mixture_sample_by_rates,
    )

    rows = [(i, ["web", "wiki"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    rates = {"web": 0.25, "wiki": 1.0}
    want = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df, "doc_id", "src", rates=rates, default_rate=0.0
        ).collect()
    )
    rframe = spark.createDataFrame(
        list(rates.items()), "src string, rate double"
    )
    got = sorted(
        r["doc_id"]
        for r in mixture_sample_by_rates(
            df, "doc_id", "src", rframe
        ).collect()
    )
    # identical salted row-hash -> identical kept set, join or CASE
    assert got == want
    assert 0 < len(got) < 400


def test_temperature_rates_then_sample_realizes_mixture(spark):
    from news_data_pipeline_spark.operators.sampling import (
        mixture_sample_by_rates,
        temperature_mixture_rates,
    )

    rows = (
        [(i, "en") for i in range(4000)]
        + [(4000 + i, "sw") for i in range(400)]
        + [(4400 + i, None) for i in range(100)]  # null group participates
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = temperature_mixture_rates(df, "lang", alpha=0.0)
    kept = mixture_sample_by_rates(df, "doc_id", "lang", rates)
    by = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    # alpha=0 targets UNIFORM thirds of 4500: ~1500 each; the small
    # groups cap at keeping everything, en down-samples toward its share
    assert by[None] == 100 and by["sw"] == 400
    assert 1300 <= by["en"] <= 1700


def test_repeat_sample_up_and_down_weights(spark):
    from news_data_pipeline_spark.operators.sampling import (
        mixture_sample_by_rates,
        repeat_sample_by_rates,
    )

    rows = [(i, "wiki" if i < 100 else "web") for i in range(1100)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    rates = spark.createDataFrame(
        [("wiki", 2.5), ("web", 0.3)], "src string, rate double"
    )
    out = repeat_sample_by_rates(df, "doc_id", "src", rates)
    by = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # wiki: 2 full copies of 100 + ~50% third copy
    assert 230 <= by["wiki"] <= 270
    # web: fractional-only -> identical kept SET as the filter variant
    web_filter = sorted(
        r["doc_id"]
        for r in mixture_sample_by_rates(
            df, "doc_id", "src", rates, salt="rep:"
        ).collect()
        if r["src"] == "web"
    )
    web_repeat = sorted(
        r["doc_id"] for r in out.collect() if r["src"] == "web"
    )
    assert web_repeat == web_filter
    # copy numbering: every wiki doc kept has copies 1..k contiguous
    wiki = {}
    for r in out.collect():
        if r["src"] == "wiki":
            wiki.setdefault(r["doc_id"], []).append(r["copy"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in wiki.values())
    assert all(len(v) in (2, 3) for v in wiki.values())

    import pytest

    bad = spark.createDataFrame([("wiki", -0.1)], "src string, rate double")
    with pytest.raises(ValueError, match="negative rate"):
        repeat_sample_by_rates(df, "doc_id", "src", bad)


def test_dsir_importance_weights_favor_target_like_docs(spark):
    """Documents made of target-domain words must score a strictly
    higher log-importance than documents of non-target words, and
    n_words must count the whitespace tokens."""
    from news_data_pipeline_spark.operators.sampling import (
        dsir_importance_weights,
    )

    rows = [
        (0, "alpha beta alpha beta", "en"),
        (1, "alpha beta gamma", "en"),
        (2, "zeta eta theta", "fr"),
        (3, "zeta eta zeta eta", "fr"),
        (4, "alpha zeta", "de"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    target = docs.where("lang = 'en'")
    out = {
        r["id"]: r
        for r in dsir_importance_weights(
            docs, target, "doc_id", "text", n_buckets=16
        ).collect()
    }
    assert out[0]["n_words"] == 4 and out[2]["n_words"] == 3
    # all-target-vocabulary docs beat all-non-target docs
    assert out[0]["log_importance"] > out[3]["log_importance"]
    assert out[1]["log_importance"] > out[2]["log_importance"]
    # the mixed doc sits strictly between the extremes
    assert (
        out[3]["log_importance"]
        < out[4]["log_importance"]
        < out[0]["log_importance"]
    )


def test_dsir_importance_weights_empty_target(spark):
    """An empty target degrades to the smoothed-uniform model instead
    of dividing by zero: weights are finite and defined for every doc."""
    from news_data_pipeline_spark.operators.sampling import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e")], ["doc_id", "text"]
    )
    out = dsir_importance_weights(
        docs, docs.where("doc_id < 0"), "doc_id", "text", n_buckets=8
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["log_importance"] is not None
