"""Every registered query must survive fully-EMPTY input tables.

At 100 TB, empty inputs are routine — a partition-pruned scan, a filter
that matches nothing, a fresh ingestion slot. An engine whose operators
throw on zero rows (seed collects indexing row 0, percentile of
nothing, div-by-zero under ANSI) fails exactly when a cluster is
retrying around it. This sweep runs the ENTIRE ``queries()`` registry
against schema-identical empty parquet tables and requires a clean
(possibly empty) answer from every one.

Known-good nonzero outputs on empty input are legitimate: DQ report
queries emit their "0 rows checked" summary rows, and full-table
correlation/stat queries emit null-valued stat rows.
"""

from __future__ import annotations

import pytest

from news_data_pipeline_spark.sources.catalog import TABLES

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/{t}.parquet"
        )
    return path


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            failures.append((name, repr(ex)[:120]))
    assert not failures, failures


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sf_one"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(1).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/{t}.parquet"
        )
    return path


def test_every_query_survives_single_row_tables(spark, single_row_sf_dir):
    # n=1 exercises the other degenerate frontier: stddev/variance of
    # one value (null), windows with one row, percentiles without
    # interpolation neighbors, self-joins with no second partner —
    # none of it may throw.
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            fn(spark, single_row_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, repr(ex)[:120]))
    assert not failures, failures
