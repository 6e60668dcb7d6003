"""Table catalog over the driver-provided parquet fixtures.

Generalizes the reference's layer readers
(``spark.read.format("delta").load(path)`` at
``02_silver_transformation_news_articles.py:29``,
``03_gold_modeling_news_articles.py:30``) into a schema-aware catalog:
one place that knows how each table is read, normalized, and typed, so
every operator downstream sees identical shapes on every scale factor.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from news_data_pipeline_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dataset_fingerprint(sf_dir: str, *names: str) -> tuple:
    """Content fingerprint of one or more fixture tables: sorted
    ``(relpath, size, mtime_ns)`` of every data file under each table
    path. The frozen-artifact memo caches (``_pq_trained_codebooks``,
    ``_pqr_frozen_artifacts``, ``_spq_frozen_artifacts``,
    ``_crossmodal_frozen_index``) fold this into their keys so a
    dataset REGENERATED AT THE SAME PATH within one session can never
    serve stale centroids/codebooks (round-11 ADVICE: keying on
    ``sf_dir`` alone had no invalidation). A missing table fingerprints
    as an empty entry set rather than raising — the caller's read is
    where absence should surface.

    Local-FS walk: the gate fixtures are local paths. A cluster
    deployment would take the same triple from a Hadoop FileSystem
    listing (``listFiles`` returns path/len/modificationTime); the key
    shape is deliberately FS-agnostic.
    """
    entries = []
    for name in names:
        root = f"{sf_dir.rstrip('/')}/{name}.parquet"
        if os.path.isfile(root):
            st = os.stat(root)
            entries.append((name, st.st_size, st.st_mtime_ns))
        elif os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for fname in files:
                    p = os.path.join(dirpath, fname)
                    st = os.stat(p)
                    entries.append(
                        (
                            os.path.relpath(p, sf_dir),
                            st.st_size,
                            st.st_mtime_ns,
                        )
                    )
    return tuple(sorted(entries))


def evict_stale_artifacts(cache: dict, sf_dir: str) -> None:
    """Drop a frozen-artifact memo cache's entries for ``sf_dir``
    (keys are ``(sf_dir, fingerprint)`` tuples) before inserting the
    freshly-trained one: one live dataset per path, so a directory
    regenerated many times within a session cannot grow the cache
    unboundedly, and a stale fingerprint can never be served again."""
    for k in [k for k in cache if isinstance(k, tuple) and k[0] == sf_dir]:
        del cache[k]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing types for engine-wide parity.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with ``nanosAsLong`` it arrives as an
    int64 of nanoseconds and is converted here to microsecond-precision
    TIMESTAMP_NTZ (truncating, which matches DuckDB's own ns->us read).
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_layer(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    merge_schema: bool = False,
    require_success: bool = False,
) -> DataFrame:
    """Read a written layer back; ``merge_schema=True`` unions the
    schemas of all files so layers whose shape evolved across appends
    (new columns in later batches) read as one frame with nulls for
    rows written before a column existed.

    Schema evolution is the reference's declared future work
    (``docs/pipeline_overview.md:161``) — implemented here via parquet
    schema merging; Delta-enabled clusters get the same from
    ``mergeSchema`` on the Delta reader. Merging reads every file
    footer, so leave it off for stable-schema layers (the default).

    ``require_success=True`` refuses directories without the
    ``_SUCCESS`` marker — a writer that died mid-job leaves files but no
    marker, and a plain read would silently return truncated data (the
    parquet-layer stand-in for Delta's transaction-log guarantee).
    """
    if require_success:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_SUCCESS")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            raise IOError(
                f"layer at {path} has no _SUCCESS marker — refusing to read "
                "a possibly partial write (pass require_success=False to force)"
            )
    reader = spark.read.format(fmt)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)
