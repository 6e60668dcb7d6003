"""Standing driver-harness canary.

Round 7 ran a six-probe bisection here that root-caused the r5/r6
driver reds: DuckDB types a bare ``sum(<integer>)`` as HUGEINT (int128),
which the driver's pandas canonicalization renders float64 ("500.0" vs
Spark's int64 "500"), failing the value hash with rows/schema green.
CORRECTNESS_r07 confirmed the mechanism through the driver itself
(``probe_hugeint_sum_raw`` red, the identical-but-CAST arm green,
control green), the three production oracles were fixed with
``CAST(... AS BIGINT)``, and
``test_registry_order.py::test_no_oracle_emits_hugeint`` statically
bans the class from every oracle. The five single-purpose probes were
retired in round 8 per that settled verdict.

``probe_control`` remains as a permanent harness canary: a bare integer
projection with no aggregate, no string, no float. If this row ever
goes red, the compare harness itself has drifted and every other
correctness row should be re-read in that light.
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
