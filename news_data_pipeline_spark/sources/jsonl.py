"""JSONL corpus interchange: declared-schema reads with corrupt-record
quarantine, and bounded-shard writes.

JSON-lines is the lingua franca of LLM training corpora (one document
object per line; WebDataset/HF dumps, filtering-pipeline handoffs).
The reference ingests REST JSON with a DECLARED StructType rather than
inference (`01_bronze_ingestion_news_articles.py:26-35`); this module
applies the same discipline to files: schema is an input, never
inferred (inference costs a full extra pass at 100 TB and silently
widens types on dirty data), and malformed lines are captured, not
dropped — the quarantine philosophy of the DQ engine extended to the
parse boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _as_struct(spark: SparkSession, schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    *,
    streaming: bool = False,
) -> DataFrame:
    """Read JSONL with a DECLARED schema; malformed lines surface in the
    ``_corrupt_record`` column instead of vanishing.

    ``streaming=True`` swaps the text scan for ``readStream.text`` —
    every downstream expression here is stateless, so the same parse +
    quarantine semantics run incrementally over a landing directory
    (``split_corrupt_records`` stays two plain filters on the stream).

    Implementation: the file is scanned as TEXT and each line parsed
    with ``from_json`` in PERMISSIVE mode — a line that is not valid
    JSON (or whose values cannot fit the declared types) yields nulls
    plus the raw line in ``_corrupt_record``. Parsing as an expression
    rather than via the JSON file source deliberately sidesteps
    SPARK-26243 (the file source forbids plans that reference only its
    internal corrupt column, which breaks exactly the quarantine
    queries this reader exists for); the text scan still splits,
    prunes, and parallelizes like any file source, and the parse is
    JVM-side Jackson either way. Use :func:`split_corrupt_records` to
    separate the populations.
    """
    struct = _as_struct(spark, schema)
    if CORRUPT_COL in struct.fieldNames():
        raise ValueError(
            f"schema must not declare {CORRUPT_COL!r}; it is appended "
            "automatically"
        )
    with_corrupt = StructType(
        list(struct.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    lines = (
        spark.readStream.format("text").load(path)
        if streaming
        else spark.read.text(path)
    )
    parsed = lines.select(
        F.from_json(
            F.col("value"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__row"),
        F.col("value"),
    )
    return parsed.select(
        *[F.col(f"__row.{f.name}") for f in struct.fields],
        F.when(
            F.col(f"__row.{CORRUPT_COL}").isNotNull() | F.col("__row").isNull(),
            F.col("value"),
        ).alias(CORRUPT_COL),
    )


def split_corrupt_records(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, corrupt) split of a ``read_jsonl`` frame.

    Valid rows drop the corrupt column; corrupt rows keep only the raw
    line as ``payload`` (the quarantine-record shape — feed it to the
    audit sink with lineage columns as needed). Both filters are
    ordinary column predicates because ``read_jsonl`` computes the
    corrupt column as an expression — the JSON file source's
    corrupt-column query restriction (SPARK-26243) does not apply.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"frame has no {CORRUPT_COL!r} column — was it read with "
            "read_jsonl?"
        )
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    valid = df.where(F.col(CORRUPT_COL).isNull()).select(data_cols)
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("payload")
    )
    return valid, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a frame as JSONL, optionally bounding rows per shard.

    ``maxRecordsPerFile`` rolls files inside each task — no extra
    shuffle, same mechanism as ``write_sharded`` — so downstream
    loaders that map one worker per file see bounded shards.
    ``compression='gzip'/'zstd'`` trades CPU for the ~5-10x text
    compression JSONL invites; leave None when the consumer needs
    splittable files (gzip is not splittable — one giant .gz file
    serializes the next scan).
    """
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        if max_records_per_file < 1:
            raise ValueError(
                f"max_records_per_file must be >= 1, got {max_records_per_file}"
            )
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
