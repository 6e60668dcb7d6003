"""Driver-environment bisection probes (round 7).

Three queries (``duplicated_span_fraction``, ``token_budget_selection``,
``csv_quarantine_split``) failed the driver's value-hash for two rounds
while passing the strict local oracle gate exactly — so the divergence
is environmental, not semantic. Round-7 analysis found the one type
difference separating exactly those three from the 182 greens: each
oracle emitted an UNCAST ``sum(<BIGINT>)``, which DuckDB types as
HUGEINT (int128). pandas has no int128, so a pandas-materialized oracle
result renders those cells float64 ("500.0") while the Spark result
stays int64 ("500") — rows and column names match, the value hash does
not. The greens with NULL-able int columns (``shipdate_rollup_revenue``,
``supplier_balance_distribution``) don't contradict this: BOTH engines'
pandas conversions go float64 there, so the hashes agree.

The three production oracles are fixed with ``CAST(... AS BIGINT)``
(semantic no-ops). The probes in this module confirm or refute the
mechanism THROUGH the driver itself, one variable per probe:

- ``probe_control``           — trivial projection; red here = harness
                                drift, every other probe uninterpretable.
- ``probe_hugeint_sum_cast``  — CAST(sum AS BIGINT): expected green.
- ``probe_hugeint_sum_raw``   — identical query, sum left HUGEINT:
                                expected RED iff the pandas-float64
                                theory is right; green means the theory
                                is wrong and the column probes below
                                localize the real divergence.
- ``tbsel_probe_nwords``      — token_budget_selection's word count
                                alone (no window): isolates the
                                regexp-split/trim path.
- ``span_probe_ndocs``        — duplicated_span_fraction's shingle
                                generation as an integer histogram:
                                isolates shingling from the final sums.
- ``csvq_probe_populations``  — csv_quarantine_split's corrupt-record
                                routing alone (counts, no checksums).

``probe_hugeint_sum_raw`` is a deliberate one-round diagnostic: it is
EXPECTED to be red at the driver if the fix for the three production
queries is correct, and will be retired once CORRECTNESS_r07 settles
the question. Every other probe is expected green and is a strict
subset of a production query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from news_data_pipeline_spark.queries.registry import register
from news_data_pipeline_spark.sources.catalog import load_table


@register(
    "probe_control",
    oracle="SELECT doc_id FROM documents WHERE doc_id < 10",
)
def probe_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harness control: a bare integer projection with no aggregate,
    no string, no float. If this row is red, the divergence is in the
    compare harness itself and no other probe is interpretable."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id").where(F.col("doc_id") < 10)


@register(
    "probe_hugeint_sum_cast",
    oracle="""
    SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id < 100
    """,
)
def probe_hugeint_sum_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential pair, cast arm: DuckDB sums BIGINT into HUGEINT;
    the explicit CAST pins the result back to int64. Expected green —
    and the only difference from probe_hugeint_sum_raw is that cast."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < 100).agg(
        F.sum("n_chars").alias("total_chars")
    )


@register(
    "probe_hugeint_sum_raw",
    oracle="""
    -- DELIBERATELY uncast: sum(BIGINT) -> HUGEINT. See module docstring;
    -- expected RED at the driver iff HUGEINT->float64 canonicalization
    -- is what broke the three production queries. Retire after r7.
    SELECT sum(n_chars) AS total_chars
    FROM documents WHERE doc_id < 100
    """,
)
def probe_hugeint_sum_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential pair, raw arm (diagnostic; expected driver-red —
    see module docstring). Locally both arms pass: fetchall() returns
    HUGEINT as an exact Python int, so the divergence only exists in a
    pandas/Arrow materialization of the oracle result."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < 100).agg(
        F.sum("n_chars").alias("total_chars")
    )


@register(
    "tbsel_probe_nwords",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END AS BIGINT) AS n_words
    FROM documents
    """,
)
def tbsel_probe_nwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_budget_selection stage 1 in isolation: the whitespace word
    count, no window, no budget filter. Localizes any residual red to
    the regexp-split/trim path vs the cumulative-sum path."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(F.split(F.trim("text"), r"\s+"), lambda w: F.length(w) > 0)
    )
    return docs.select("doc_id", n_words.cast("bigint").alias("n_words"))


@register(
    "span_probe_ndocs",
    oracle="""
    WITH sh AS (
        SELECT id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS shingle
        FROM (SELECT doc_id AS id,
                     regexp_split_to_array(trim(text), '\\s+') AS ws,
                     unnest(range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 1) + 1)) AS i
              FROM documents) t
        WHERE concat_ws(' ', ws[i], ws[i+1], ws[i+2]) <> ''),
    per_doc AS (SELECT DISTINCT id, shingle FROM sh),
    nd AS (SELECT shingle, count(*) AS ndocs FROM per_doc GROUP BY shingle)
    SELECT ndocs, count(*) AS n_shingles FROM nd GROUP BY ndocs
    """,
)
def span_probe_ndocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicated_span_fraction stage 1 in isolation: the trigram
    document-frequency histogram (how many shingles occur in exactly
    ndocs documents) — integer-only, string-free output that pins the
    shingle GENERATION as identical across engines without shipping the
    shingle text through the driver's canonicalizer."""
    from news_data_pipeline_spark.operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    shingles = word_shingles(docs, "doc_id", "text", n=3, distinct=True)
    nd = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("ndocs"))
    return nd.groupBy("ndocs").agg(F.count(F.lit(1)).alias("n_shingles"))


@register(
    "csvq_probe_populations",
    oracle="""
    WITH lines AS (
        SELECT doc_id,
               (doc_id % 13 = 0 OR doc_id % 17 = 0) AS corrupt
        FROM documents)
    SELECT 'valid' AS population, count(*) AS n_rows
    FROM lines WHERE NOT corrupt
    UNION ALL
    SELECT 'quarantined', count(*) FROM lines WHERE corrupt
    """,
)
def csvq_probe_populations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csv_quarantine_split's corrupt-record ROUTING in isolation: the
    same injected corruption and the same from_csv parse, but only the
    population row counts — no sum() checksums. count(*) is BIGINT on
    both engines, so a red here means the CSV grammar itself routed
    differently (parser behavior), not value canonicalization."""
    from news_data_pipeline_spark.sources.csvio import parse_csv_lines
    from news_data_pipeline_spark.sources.jsonl import split_corrupt_records

    docs = load_table(spark, sf_dir, "documents")
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(","),
        F.col("lang"),
        F.lit(","),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit("n"), F.col("n_chars").cast("string")),
        ).otherwise(F.col("n_chars").cast("string")),
        F.when(F.col("doc_id") % 17 == 0, F.lit(",extra")).otherwise(
            F.lit("")
        ),
    )
    parsed = parse_csv_lines(
        docs.select(line.alias("value")),
        "doc_id bigint, lang string, n_chars bigint",
    )
    valid, quarantine = split_corrupt_records(parsed)
    v = valid.agg(
        F.lit("valid").alias("population"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    q = quarantine.agg(
        F.lit("quarantined").alias("population"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return v.unionAll(q)
