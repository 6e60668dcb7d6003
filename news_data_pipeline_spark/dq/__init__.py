from news_data_pipeline_spark.dq.rules import (
    ColumnExists,
    Freshness,
    FunctionalDependency,
    InRange,
    InSet,
    Matches,
    MinRows,
    NotNull,
    Rule,
    Unique,
    config_to_rules,
)
from news_data_pipeline_spark.dq.profile import profile_columns, suggest_rules
from news_data_pipeline_spark.dq.drift import (
    population_stability_index,
    schema_drift,
    schema_drift_report,
)
from news_data_pipeline_spark.dq.engine import (
    DQResult,
    from_quarantine_records,
    run_dq,
    to_quarantine_records,
)

__all__ = [
    "ColumnExists",
    "Freshness",
    "FunctionalDependency",
    "InRange",
    "InSet",
    "Matches",
    "DQResult",
    "MinRows",
    "NotNull",
    "Rule",
    "Unique",
    "config_to_rules",
    "from_quarantine_records",
    "profile_columns",
    "population_stability_index",
    "schema_drift",
    "schema_drift_report",
    "run_dq",
    "suggest_rules",
    "to_quarantine_records",
]
