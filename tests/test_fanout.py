"""fan_out guard invariants: fans out narrow scans, never touches (or
eagerly executes) wide plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.operators.fanout import (
    _is_narrow_scan_chain,
    fan_out,
)


def test_narrow_chain_fans_out(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path).where("v > 10").select("id")
    assert _is_narrow_scan_chain(df)
    out = fan_out(df, min_partitions=8)
    assert out.rdd.getNumPartitions() >= 8
    assert out.count() == 994


def test_wide_plan_passes_through_untouched(spark):
    # joins/aggregates must short-circuit BEFORE any .rdd probe: under
    # AQE that probe would eagerly execute the upstream shuffle stages
    base = spark.range(100).selectExpr("id", "id % 7 AS k")
    agg = base.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    joined = base.join(agg, on="k")
    for df in (agg, joined, base.repartition(2)):
        assert not _is_narrow_scan_chain(df)
        assert fan_out(df) is df  # identical object: no plan change


def test_already_parallel_scan_is_left_alone(spark, tmp_path):
    path = str(tmp_path / "many.parquet")
    spark.range(1000).repartition(16).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    if df.rdd.getNumPartitions() >= 4:
        assert fan_out(df, min_partitions=4) is df


def test_union_explode_and_newline_literals_stay_narrow(spark, tmp_path):
    # shapes the old string-parsed classifier got wrong: a filter whose
    # literal embeds a newline (split the rendered node across lines),
    # a union, and a generate (explode) — all narrow, all must fan out
    path = str(tmp_path / "u.parquet")
    spark.range(400).selectExpr("id", "array(id, id+1) AS arr").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path)
    newline_filter = scan.where(F.col("id").cast("string") != F.lit("a\nb"))
    unioned = scan.unionByName(scan)
    exploded = scan.select("id", F.explode("arr").alias("x"))
    for df, rows in ((newline_filter, 400), (unioned, 800), (exploded, 800)):
        assert _is_narrow_scan_chain(df)
        out = fan_out(df, min_partitions=8)
        assert out.rdd.getNumPartitions() >= 8
        assert out.count() == rows


def test_subquery_expression_is_not_probed(spark, tmp_path):
    # a scalar subquery inside a filter would EXECUTE on an .rdd probe;
    # the guard must reject the plan even though the host node is Filter
    path = str(tmp_path / "s.parquet")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("fanout_sub_t")
    df = spark.sql(
        "SELECT * FROM fanout_sub_t "
        "WHERE id > (SELECT avg(id) FROM fanout_sub_t)"
    )
    assert not _is_narrow_scan_chain(df)
    assert fan_out(df) is df


def test_sorted_limited_plan_passes_through(spark, tmp_path):
    path = str(tmp_path / "l.parquet")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).orderBy("id").limit(10)
    assert not _is_narrow_scan_chain(df)
    assert fan_out(df) is df


def test_mapinpandas_chain_still_fans_out(spark, tmp_path):
    path = str(tmp_path / "m.parquet")
    spark.range(500).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    def ident(batches):
        for b in batches:
            yield b

    mapped = df.mapInPandas(ident, "id long")
    assert _is_narrow_scan_chain(mapped)
    assert fan_out(mapped, min_partitions=8).rdd.getNumPartitions() >= 8
