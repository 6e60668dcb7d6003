"""Schema-declared file ingestion with corrupt-record quarantine.

The reference lands REST payloads and reads them back with a declared
schema (`/root/reference/notebooks/01_bronze_ingestion_news_articles.py`
pattern); at scale the bronze input is landed FILES — JSON lines or
CSV — where some rows are malformed (truncated writes, encoding junk,
schema drift). Spark's PERMISSIVE mode keeps those rows instead of
failing the job or silently dropping them (DROPMALFORMED): each
malformed row surfaces with the raw text in a corrupt-record column
and NULL typed fields. These readers split that into (good, bad) so
the bad half can flow into the same quarantine sink the DQ engine uses
— nothing is lost, the job never dies on one bad line, and both halves
stay lazy.

The same schema + corrupt-column pattern works unchanged on
``spark.readStream`` for streaming bronze ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _read_with_quarantine(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType,
    *,
    corrupt_col: str = CORRUPT_COL,
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field; "
            "rename one of them"
        )
    # copy — StructType.add mutates in place
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    # keep the typed (nulled) columns alongside the raw text: Spark
    # refuses scans whose required schema is ONLY the internal corrupt
    # column, and quarantine triage wants both anyway
    bad = df.where(F.col(corrupt_col).isNotNull()).withColumnRenamed(
        corrupt_col, "raw_record"
    )
    return good, bad


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    corrupt_col: str = CORRUPT_COL,
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines files under ``path`` against a declared schema.

    Returns ``(good, bad)``: ``good`` has exactly ``schema``'s columns
    (missing fields NULL — absence is not corruption); ``bad`` carries
    every unparseable line's raw text as ``raw_record`` plus the
    NULLed typed columns. Both are lazy scans of the same files —
    Catalyst prunes each side's filter into the scan, so neither pays
    for the other's rows.
    """
    return _read_with_quarantine(
        spark, "json", path, schema, corrupt_col=corrupt_col, options=options
    )


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    corrupt_col: str = CORRUPT_COL,
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_json_with_quarantine`` (malformed = wrong
    arity, unparseable types, broken quoting)."""
    opts = {"header": str(header).lower()}
    opts.update(options or {})
    return _read_with_quarantine(
        spark, "csv", path, schema, corrupt_col=corrupt_col, options=opts
    )
