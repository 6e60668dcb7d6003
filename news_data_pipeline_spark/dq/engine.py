"""Single-pass data-quality engine.

Replaces the reference's ``DataQualityChecker`` + ``run_dq_from_config``
(``_lib_dq_helpers.py:114-190``), which runs one Spark job per rule
(``bad.count()`` at ``:126``, ``dup_keys.count()`` at ``:140``) and then
splits valid/invalid with inner + left_anti joins against an accumulated
``bad_keys`` set (``:157-163``). At 100 TB that is O(rules) full scans
plus two shuffled joins.

Here every rule contributes a boolean violation column; the annotated
frame is computed once (window rules share a single shuffle per distinct
key set), and valid/quarantine are two filters over it. The pass/fail
report is one aggregate over the same frame. Fail-open semantics are
preserved: a failing report does not stop valid rows from flowing
(reference ``02:38-62``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from news_data_pipeline_spark.dq.rules import ColumnExists, MinRows, Rule

_FLAG_PREFIX = "__dq_violates_"


@dataclass
class DQResult:
    valid: DataFrame
    quarantined: DataFrame  # original columns + ``reasons array<string>``
    report: dict[str, dict]

    @property
    def passed(self) -> bool:
        return all(r["passed"] for r in self.report.values())


def run_dq(df: DataFrame, rules: list[Rule], *, cache: bool = True) -> DQResult:
    """Evaluate all rules in one annotated pass and split the frame."""
    schema_report: dict[str, dict] = {}
    flag_cols: list[str] = []
    annotated = df

    for i, rule in enumerate(rules):
        if isinstance(rule, ColumnExists):
            missing = rule.missing(df)
            schema_report[rule.rule_name()] = {
                "passed": not missing,
                "violations": len(missing),
                "detail": {"missing_columns": missing},
            }
            continue
        if isinstance(rule, MinRows):
            continue  # needs the total count — folded into the report agg
        violation = rule.violation(df)
        flag = f"{_FLAG_PREFIX}{i}_{rule.rule_name()}"
        annotated = annotated.withColumn(flag, F.coalesce(violation, F.lit(False)))
        flag_cols.append(flag)

    if cache and flag_cols:
        annotated = annotated.cache()

    # One aggregate computes every per-rule violation count AND the total
    # row count — single job instead of the reference's job-per-rule.
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.col(c).cast("long")).alias(c) for c in flag_cols
    ]
    counts = annotated.agg(*aggs).collect()[0].asDict()

    report = dict(schema_report)
    for i, rule in enumerate(rules):
        if isinstance(rule, ColumnExists):
            continue
        if isinstance(rule, MinRows):
            total = counts["__total"]
            report[rule.rule_name()] = {
                "passed": total >= rule.threshold,
                "violations": 0 if total >= rule.threshold else 1,
                "detail": {"rows": total, "threshold": rule.threshold},
            }
            continue
        flag = f"{_FLAG_PREFIX}{i}_{rule.rule_name()}"
        n = counts.get(flag) or 0
        report[rule.rule_name()] = {"passed": n == 0, "violations": int(n)}

    if not flag_cols:
        return DQResult(valid=df, quarantined=df.limit(0).withColumn(
            "reasons", F.array().cast("array<string>")), report=report)

    any_violation = F.array_contains(
        F.array(*[F.col(c) for c in flag_cols]), True
    )
    reasons = F.filter(
        F.array(*[
            F.when(F.col(flag), F.lit(rule_name(flag))).otherwise(F.lit(None))
            for flag in flag_cols
        ]),
        lambda x: x.isNotNull(),
    )
    original_cols = [c for c in annotated.columns if not c.startswith(_FLAG_PREFIX)]
    valid = annotated.where(~any_violation).select(original_cols)
    quarantined = (
        annotated.where(any_violation)
        .withColumn("reasons", reasons)
        .select([*original_cols, "reasons"])
    )
    return DQResult(valid=valid, quarantined=quarantined, report=report)


def rule_name(flag_col: str) -> str:
    """Recover the rule name from a violation-flag column name."""
    return flag_col[len(_FLAG_PREFIX):].split("_", 1)[1]


def to_quarantine_records(
    quarantined: DataFrame, *, source_table: str, ingestion_time: str
) -> DataFrame:
    """Shape failed rows for the audit sink: full-row JSON payload +
    reason + lineage (reference ``02:44-48``)."""
    data_cols = [c for c in quarantined.columns if c != "reasons"]
    return quarantined.select(
        F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("payload"),
        F.array_join("reasons", "; ").alias("reason"),
        F.lit(source_table).alias("source_table"),
        F.lit(ingestion_time).cast("timestamp_ntz").alias("ingestion_time"),
    )
