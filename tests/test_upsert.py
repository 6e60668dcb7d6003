"""MERGE INTO semantics: update/insert/delete arms, null updates,
duplicate-source resolution, and the versioned-layer atomic path."""

from __future__ import annotations

import pyspark.sql.functions as F

from news_data_pipeline_spark.operators.upsert import (
    merge_into_layer,
    merge_upsert,
)
from news_data_pipeline_spark.sources.writers import VersionedLayer


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "tag", "val"],
    )


def test_update_insert_passthrough(spark):
    src = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "tag", "val"]
    )
    out = {r["k"]: (r["tag"], r["val"]) for r in
           merge_upsert(_target(spark), src, "k").collect()}
    assert out == {
        1: ("a", 10.0),   # unmatched target: untouched
        2: ("B", 99.0),   # matched: source wins
        3: ("c", 30.0),
        4: ("d", 40.0),   # unmatched source: insert
    }


def test_update_takes_source_null(spark):
    # the coalesce trap: an update must propagate source NULLs, not
    # keep the stale target value
    src = spark.createDataFrame([(2, None, None)], "k long, tag string, val double")
    out = {r["k"]: (r["tag"], r["val"]) for r in
           merge_upsert(_target(spark), src, "k").collect()}
    assert out[2] == (None, None)
    assert out[1] == ("a", 10.0)


def test_source_extra_and_missing_columns(spark):
    # source lacks `val` (stays untouched on update, NULL on insert)
    # and carries an extra column (ignored)
    src = spark.createDataFrame(
        [(2, "B", "x"), (4, "d", "y")], ["k", "tag", "extra"]
    )
    out = {r["k"]: (r["tag"], r["val"]) for r in
           merge_upsert(_target(spark), src, "k").collect()}
    assert out[2] == ("B", 20.0)
    assert out[4] == ("d", None)
    assert "extra" not in merge_upsert(_target(spark), src, "k").columns


def test_delete_arm(spark):
    dels = spark.createDataFrame([(1,), (3,), (9,)], ["k"])
    out = merge_upsert(_target(spark), dels, "k", delete=True)
    assert sorted(r["k"] for r in out.collect()) == [2]


def test_dedup_order_col_keeps_latest(spark):
    src = spark.createDataFrame(
        [(2, "old", 1.0, 1), (2, "new", 2.0, 5), (2, "mid", 3.0, 3)],
        ["k", "tag", "val", "version"],
    )
    out = {r["k"]: r["tag"] for r in
           merge_upsert(_target(spark), src, "k",
                        dedup_order_col="version").collect()}
    assert out[2] == "new"
    assert len(out) == 3  # no fan-out


def test_composite_keys(spark):
    tgt = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0)], ["k1", "k2", "val"]
    )
    src = spark.createDataFrame(
        [(1, "y", 99.0), (2, "z", 5.0)], ["k1", "k2", "val"]
    )
    out = {(r["k1"], r["k2"]): r["val"] for r in
           merge_upsert(tgt, src, ["k1", "k2"]).collect()}
    assert out == {(1, "x"): 10.0, (1, "y"): 99.0, (2, "z"): 5.0}


def test_merge_into_layer_bootstrap_and_upsert(spark, tmp_path):
    layer = VersionedLayer(str(tmp_path / "table"))
    v1 = merge_into_layer(spark, layer, _target(spark), "k")
    assert layer.current_version(spark) == v1
    src = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)],
                                ["k", "tag", "val"])
    v2 = merge_into_layer(spark, layer, src, "k")
    assert v2 != v1 and layer.current_version(spark) == v2
    got = {r["k"]: r["tag"] for r in layer.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # time travel: the pre-merge version is still a readable snapshot
    old = {r["k"]: r["tag"] for r in layer.read(spark, version=v1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_into_layer_delete(spark, tmp_path):
    layer = VersionedLayer(str(tmp_path / "table"))
    merge_into_layer(spark, layer, _target(spark), "k")
    dels = spark.createDataFrame([(1,), (3,)], ["k"])
    merge_into_layer(spark, layer, dels, "k", delete=True)
    assert sorted(r["k"] for r in layer.read(spark).collect()) == [2]
