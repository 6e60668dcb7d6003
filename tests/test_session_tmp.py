"""Session-temp artifact lifecycle (round-10 verdict item 5).

Every spooling query (layer round-trips, streaming checkpoints,
frozen-index shards, bucketed-table locations) creates roots with
``tempfile.mkdtemp``; the engine redirects ``tempfile.tempdir`` into
one tracked per-process parent at ``tune()`` time and reclaims the
whole parent at interpreter exit, so a long judging/bench session
cannot accumulate orphan parquet trees.
"""

from __future__ import annotations

import os
import tempfile

from news_data_pipeline_spark import session as sess


def test_mkdtemp_lands_under_tracked_parent(spark):
    # the spark fixture went through tune(), so the redirect is active
    parent = sess.session_tmp_parent()
    assert os.path.isdir(parent)
    assert tempfile.gettempdir() == parent
    leaf = tempfile.mkdtemp(prefix="probe_root_")
    assert os.path.dirname(leaf) == parent


def test_cleanup_reclaims_and_restarts(spark):
    parent = sess.session_tmp_parent()
    leaf = tempfile.mkdtemp(prefix="probe_root_")
    assert os.path.isdir(leaf)
    sess.cleanup_session_tmp()
    assert not os.path.exists(parent)
    assert not os.path.exists(leaf)
    # next acquisition starts a fresh parent and re-points tempfile
    parent2 = sess.session_tmp_parent()
    assert parent2 != parent
    assert os.path.isdir(parent2)
    assert tempfile.gettempdir() == parent2


def test_reaped_parent_is_recreated(spark):
    import shutil

    parent = sess.session_tmp_parent()
    shutil.rmtree(parent)
    parent2 = sess.session_tmp_parent()
    assert os.path.isdir(parent2)


def test_spooling_query_root_is_tracked(spark):
    # a real registered query that spools a layer: its temp root must
    # live under the tracked parent (and thus die with the process)
    from news_data_pipeline_spark.queries.pipeline import (
        orc_layer_roundtrip,
    )

    parent = sess.session_tmp_parent()
    before = set(os.listdir(parent))
    orc_layer_roundtrip(spark, "/root/testdata/sf0.001").collect()
    new = [
        d
        for d in set(os.listdir(parent)) - before
        if d.startswith("orc_layer_q_")
    ]
    assert new, "spooled root not under the tracked session parent"
