"""CSV corpus interchange: declared-schema reads with corrupt-record
quarantine, and bounded-shard writes.

The CSV twin of ``sources/jsonl.py``, with the same discipline: schema
is an INPUT, never inferred (inference costs a full extra pass at
100 TB and silently widens types on dirty data), and malformed lines
are captured, not dropped. ``from_csv`` in PERMISSIVE mode marks a
line corrupt for type mismatches, missing fields, AND extra fields
(probed: all three populate the corrupt column), while quoted
delimiters parse correctly — so the quarantine boundary is the CSV
grammar itself, not a naive split.

Reads go through a TEXT scan + ``from_csv`` expression rather than the
CSV file source, for the same reason as ``read_jsonl``: the file
source forbids plans referencing only its internal corrupt column
(SPARK-26243), which breaks exactly the quarantine queries this reader
exists for. The text scan still splits, prunes, and parallelizes like
any file source, and the parse is JVM-side Univocity either way.

Relationship to ``sources/files.py::read_csv_with_quarantine``: that is
the file-source fast path (PERMISSIVE CSV source, corrupt rows kept by
carrying the typed columns alongside — the SPARK-26243 workaround).
This module is the expression-parse path, exactly as ``jsonl.py`` is
for ``read_json_with_quarantine``: use it when the plan touches ONLY
the quarantine column, or for the bounded-shard ``write_csv`` the file
path has no twin for.

Headers: a text scan has no per-file "first line" notion, so
``skip_header=True`` drops lines that EXACTLY match the canonical
header (schema field names joined by the delimiter) — the header shape
``write_csv(header=True)`` produces. Exotic headers (reordered,
re-quoted, renamed) are data errors and surface in quarantine, where
they belong.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from news_data_pipeline_spark.sources.jsonl import CORRUPT_COL, _as_struct


def parse_csv_lines(
    lines: DataFrame,
    schema: str | StructType,
    *,
    delimiter: str = ",",
    value_col: str = "value",
) -> DataFrame:
    """The expression core of ``read_csv``: parse a string column of CSV
    lines against a declared schema, surfacing malformed lines in
    ``_corrupt_record``. Public so in-memory line streams (a Kafka
    value column, a constructed frame) get the identical quarantine
    grammar as file reads — one parser definition, one corrupt taxonomy.
    """
    spark = lines.sparkSession
    struct = _as_struct(spark, schema)
    if CORRUPT_COL in struct.fieldNames():
        raise ValueError(
            f"schema must not declare {CORRUPT_COL!r}; it is appended "
            "automatically"
        )
    with_corrupt = StructType(
        list(struct.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = lines.select(
        F.from_csv(
            F.col(value_col),
            with_corrupt.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": delimiter,
            },
        ).alias("__row"),
        F.col(value_col).alias("__raw"),
    )
    return parsed.select(
        *[F.col(f"__row.{f.name}") for f in struct.fields],
        # a blank/unparseable line nulls the whole struct; both that and
        # the parser-flagged corrupt cases quarantine the RAW line
        F.when(
            F.col(f"__row.{CORRUPT_COL}").isNotNull() | F.col("__row").isNull(),
            F.col("__raw"),
        ).alias(CORRUPT_COL),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    *,
    delimiter: str = ",",
    skip_header: bool = False,
    streaming: bool = False,
) -> DataFrame:
    """Read CSV with a DECLARED schema; malformed lines surface in the
    ``_corrupt_record`` column instead of vanishing. Compose with
    ``sources.jsonl.split_corrupt_records`` for the (valid, quarantine)
    split — the corrupt column is an ordinary expression here, so both
    populations are plain filters. ``streaming=True`` reads the same
    landing directory incrementally (``readStream.text``); parse,
    header-skip, and split are all stateless expressions, so batch and
    stream produce identical rows per file.
    """
    struct = _as_struct(spark, schema)
    lines = (
        spark.readStream.format("text").load(path)
        if streaming
        else spark.read.text(path)
    )
    if skip_header:
        header = delimiter.join(f.name for f in struct.fields)
        lines = lines.where(F.col("value") != F.lit(header))
    return parse_csv_lines(lines, struct, delimiter=delimiter)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    delimiter: str = ",",
    header: bool = True,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a frame as CSV with bounded shards (``maxRecordsPerFile``
    rolls files inside each task — no extra shuffle). Same compression
    caveat as ``write_jsonl``: gzip is not splittable; leave ``None``
    when the next scan must parallelize per file."""
    writer = df.write.mode(mode).option("sep", delimiter).option(
        "header", str(header).lower()
    )
    if max_records_per_file is not None:
        if max_records_per_file < 1:
            raise ValueError(
                f"max_records_per_file must be >= 1, got {max_records_per_file}"
            )
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.csv(path)
