"""connected_components: hop-bounded min-label propagation."""

from __future__ import annotations

import pytest

from news_data_pipeline_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_isolated_node(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "id long")
    got = _cc(spark, edges, nodes=nodes, max_iter=3)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_needs_diameter_hops(spark):
    # path 5-4-3-2-1: label 1 travels one hop per iteration
    edges = [(5, 4), (4, 3), (3, 2), (2, 1)]
    after1 = _cc(spark, edges, max_iter=1)
    assert after1[5] == 4  # only the direct neighbor's id yet
    after4 = _cc(spark, edges, max_iter=4)
    assert set(after4.values()) == {1}


def test_clique_converges_in_one_hop(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _cc(spark, edges, max_iter=1)
    assert set(got.values()) == {0}


def test_invalid_max_iter_raises(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(df, max_iter=0)


def test_plan_has_no_cartesian_or_python(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = (
        connected_components(df, max_iter=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
