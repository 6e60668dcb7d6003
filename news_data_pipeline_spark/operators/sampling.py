"""Deterministic dataset splitting and sampling.

Training-data pipelines need splits and samples that are REPRODUCIBLE
across runs, engines, and data re-partitioning — which rules out
``randomSplit``/``sample`` (seeded per-partition RNG: results change
when partitioning does). Everything here keys off a content hash of a
stable id column, so membership is a pure function of the row:

* the same document lands in the same split on every run and engine;
* adding documents never reshuffles existing assignments (the property
  that keeps eval sets stable as corpora grow).

Hash = first 8 hex chars of md5 (32 bits) mod 10_000 — ANSI-SQL
expressible, so the DuckDB oracle reproduces every assignment exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKETS = 10_000


def hash_bucket(col: Column | str, *, salt: str = "") -> Column:
    """Stable [0, 10000) bucket from a key column (+ optional salt to
    derive independent assignments from the same key). Null keys bucket
    via a sentinel — a null must not silently vanish from every split
    and sample (concat of a null would null the hash)."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(salt), F.coalesce(c.cast("string"), F.lit("<NULL>")))
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long") % _BUCKETS


def assign_splits(
    df: DataFrame,
    key_col: str,
    *,
    weights: dict[str, float],
    salt: str = "split:",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by weight (e.g. train/val/test).

    Weights must sum to <= 1; any remainder is unassigned-by-design
    (label ``holdout``). Assignment is by contiguous hash ranges in
    dict order. Stability caveat: growing the FIRST split only extends
    its range (its members and everything before the moved boundary
    stay put), but growing an earlier split SHIFTS every later split's
    range — rows move between later splits. To keep an eval set frozen
    while train grows, either put eval ranges first, or derive eval
    membership separately with its own ``salt`` and never change it.
    """
    if not weights:
        raise ValueError("assign_splits needs at least one split weight")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = hash_bucket(key_col, salt=salt)
    expr = None
    lo = 0.0
    for name, w in weights.items():
        hi = lo + w
        # round, not int(): 0.57*10000 is 5699.999... in binary and
        # int() would floor the boundary one bucket low
        cond = (bucket >= round(lo * _BUCKETS)) & (bucket < round(hi * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo = hi
    expr = expr.otherwise(F.lit("holdout"))
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    *,
    fraction: float,
    strata: Sequence[str] = (),
    salt: str = "sample:",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash.

    With ``strata``, the threshold applies per stratum independently
    (same expected rate everywhere — stratified sampling without a
    per-stratum shuffle; the hash is salted by the stratum values so
    strata draw independently). Salt, stratum values, and key join with
    the ``\\x1f`` unit separator ``surrogate_key`` uses — a bare concat
    would collide distinct strata tuples like ``('x','yz')`` and
    ``('xy','z')`` into one salt, silently correlating their draws.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    keyed = F.concat_ws(
        "\x1f",
        F.lit(salt),
        # '<NULL>' sentinel (same as the key below): coalescing to ''
        # would collapse a NULL stratum and an empty-string stratum
        # into one salt, correlating their draws
        *[F.coalesce(F.col(s).cast("string"), F.lit("<NULL>")) for s in strata],
        F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")),
    )
    return df.where(hash_bucket(keyed) < round(fraction * _BUCKETS))


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    *,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix:",
) -> DataFrame:
    """Down/up-weight data sources by keeping a per-group fraction of
    rows — the mixture-reweighting step of a training-data pipeline
    (e.g. keep all wiki, half of web, a tenth of boilerplate-heavy
    crawls). ``rates`` maps ``group_col`` values to keep-fractions;
    unlisted (and NULL) groups use ``default_rate``.

    Membership is the same pure row-hash as ``deterministic_sample``
    (salted by the group value, so groups draw independently):
    reproducible across runs and engines, stable under corpus growth,
    and executed as one codegen'd filter — no shuffle, no RNG state.
    Changing a group's rate only adds/removes rows at the moving
    threshold; every row kept at rate r stays kept at rate r' > r
    (nested samples, the property that makes mixture sweeps cheap to
    compare).
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    thr = F.lit(round(default_rate * _BUCKETS))
    for name, r in rates.items():
        thr = F.when(F.col(group_col) == name, F.lit(round(r * _BUCKETS))).otherwise(
            thr
        )
    keyed = F.concat_ws(
        "\x1f",
        F.lit(salt),
        F.coalesce(F.col(group_col).cast("string"), F.lit("<NULL>")),
        F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")),
    )
    return df.where(hash_bucket(keyed) < thr)


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    *,
    alpha: float,
    budget_fraction: float = 1.0,
) -> DataFrame:
    """Per-group keep-rates realizing a temperature-flattened mixture —
    the multilingual-corpus reweighting standard (XLM-R uses alpha=0.3,
    mT5 0.3-0.7; alpha=1 keeps the natural mixture, alpha=0 targets
    uniform, matching the uniform-target balance-weights query).

    Target mixture q_g proportional to p_g^alpha (p_g = group share);
    with an overall row budget of ``budget_fraction * N``, group g's
    keep-rate is ``min(1, q_g * budget * N / n_g)`` — capped, because a
    small group can't be up-sampled past keeping everything (true
    up-sampling is repetition, a separate policy decision this operator
    deliberately does not smuggle in).

    Fully distributed: one count aggregate, then normalizations as
    windows over the GROUPS frame (bounded rows — sources/languages,
    not documents); no driver collect, no group-count cap. Feed the
    result straight to ``mixture_sample_by_rates``. NULL groups count
    as their own group (they exist in the corpus; a mixture that
    ignores them silently ships them all).
    """
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError(
            f"budget_fraction must be in (0,1], got {budget_fraction}"
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    p = F.col("n") / F.sum("n").over(w)
    qraw = F.pow(p, F.lit(alpha))
    q = (qraw / F.sum(qraw).over(w)).alias("q")
    return (
        counts.select(
            group_col,
            "n",
            p.alias("p"),
            q,
            F.sum("n").over(w).alias("__N"),
        )
        .select(
            group_col,
            "n",
            "p",
            "q",
            F.least(
                F.lit(1.0),
                F.col("q") * F.lit(budget_fraction) * F.col("__N") / F.col("n"),
            ).alias("rate"),
        )
    )


def mixture_sample_by_rates(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: DataFrame,
    *,
    rate_col: str = "rate",
    salt: str = "mix:",
) -> DataFrame:
    """``mixture_sample`` with the rates as a FRAME instead of a dict —
    the high-cardinality shape: a dict compiles to an O(groups) CASE
    chain in the plan, while this broadcast-joins the (group, rate)
    frame and filters with the same salted row-hash, so ten thousand
    source domains cost one small join, not ten thousand plan nodes.
    Groups absent from ``rates`` (including NULL, unless present as a
    row) drop — pass an explicit rate for every group you want kept;
    ``temperature_mixture_rates`` emits exactly that."""
    r = rates.select(
        F.col(group_col).alias("__g"), F.col(rate_col).alias("__rate")
    )
    keyed = F.concat_ws(
        "\x1f",
        F.lit(salt),
        F.coalesce(F.col(group_col).cast("string"), F.lit("<NULL>")),
        F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")),
    )
    joined = df.join(
        F.broadcast(r),
        F.col(group_col).eqNullSafe(F.col("__g")),
        "inner",
    )
    return (
        joined.where(
            # floor(x+0.5), not round(): the threshold is computed IN
            # the plan from a frame value, so it must use the rounding
            # both engines (and every DuckDB build) implement identically
            hash_bucket(keyed)
            < F.floor(F.col("__rate") * _BUCKETS + F.lit(0.5))
        )
        .drop("__g", "__rate")
    )


def repeat_sample_by_rates(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: DataFrame,
    *,
    rate_col: str = "rate",
    salt: str = "rep:",
    copy_col: str = "copy",
) -> DataFrame:
    """Mixture application where rates may EXCEED 1: rate 2.7 keeps two
    full copies of every row plus a deterministic 70% third copy — the
    epoch-style up-sampling of small high-quality sources (e.g.
    Wikipedia x3) that down-sampling-only mixtures can't express.

    Each output row carries ``copy_col`` (1..k) so downstream exact
    dedup doesn't silently undo the repetition and the training export
    can interleave copies across epochs. The fractional copy uses the
    same salted row-hash as ``mixture_sample`` — reproducible, nested
    (raising a rate only ever ADDS copies), and engine-mirrorable.
    Row explosion is `sequence` + `explode` — codegen'd, no Python.
    Groups absent from ``rates`` drop, as in ``mixture_sample_by_rates``.
    """
    r = rates.select(
        F.col(group_col).alias("__g"), F.col(rate_col).alias("__rate")
    )
    bad = r.where(F.col("__rate") < 0).limit(1).collect()
    if bad:
        raise ValueError(f"negative rate for group {bad[0]['__g']!r}")
    keyed = F.concat_ws(
        "\x1f",
        F.lit(salt),
        F.coalesce(F.col(group_col).cast("string"), F.lit("<NULL>")),
        F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")),
    )
    joined = df.join(
        F.broadcast(r), F.col(group_col).eqNullSafe(F.col("__g")), "inner"
    )
    full = F.floor(F.col("__rate")).cast("int")
    frac = F.col("__rate") - full
    n_copies = full + (
        hash_bucket(keyed) < F.floor(frac * _BUCKETS + F.lit(0.5))
    ).cast("int")
    return (
        joined.withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__g", "__rate", "__n")
    )


def dsir_importance_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how much its hashed word-feature
    distribution looks like a TARGET domain's — the weight that drives
    importance resampling of a web-scale corpus toward a quality/domain
    target.

    Words hash into ``n_buckets`` feature buckets (same md5 mechanics
    as ``hash_bucket``); the bucket unigram models are Laplace-smoothed
    ``(count+1) / (total+n_buckets)``, and a document's log importance
    is ``sum_b c_b * (ln p_target(b) - ln p_raw(b))`` over its bucket
    occurrence counts. The per-bucket log-ratio settles to 1e-10
    integer units BEFORE the per-document sum, so the sum is exact
    BIGINT arithmetic — order-independent and engine-identical (the
    ``event_type_entropy_daily`` convention; ln itself can differ in
    the last ulp across libm builds, which the settle absorbs except on
    measure-zero half-way cells).

    Scale: two bucket aggregates (n_buckets rows each — model-sized,
    broadcast) + one per-(doc, bucket) count whose width is capped at
    ``n_buckets`` per doc; nothing quadratic, no driver collect.
    Returns ``(id, n_words, log_importance)``.
    """
    def word_buckets(frame: DataFrame, out_id: str) -> DataFrame:
        return (
            frame.select(
                F.col(id_col).alias(out_id),
                F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                    "__w"
                ),
            )
            .where(F.length("__w") > 0)
            .select(
                out_id,
                (
                    F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast(
                        "long"
                    )
                    % n_buckets
                ).alias("__b"),
            )
        )

    doc_b = (
        word_buckets(df, "id")
        .groupBy("id", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    raw_b = doc_b.groupBy("__b").agg(F.sum("__c").alias("__cr"))
    tgt_b = (
        word_buckets(target, "id")
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    raw_tot = raw_b.agg(F.sum("__cr").alias("__r"))
    tgt_tot = tgt_b.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__t"))
    lr = (
        raw_b.join(tgt_b, on="__b", how="left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "__b",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("__ct"), F.lit(0)) + 1)
                        / (F.col("__t") + float(n_buckets))
                    )
                    - F.log(
                        (F.col("__cr") + 1) / (F.col("__r") + float(n_buckets))
                    )
                )
                * 1e10
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__u"),
        )
    )
    return (
        doc_b.join(F.broadcast(lr), on="__b")
        .groupBy("id")
        .agg(
            F.sum("__c").alias("n_words"),
            (F.sum(F.col("__c") * F.col("__u")) / 1e10).alias(
                "log_importance"
            ),
        )
    )
