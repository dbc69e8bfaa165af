"""Physical-plan hygiene guards for flagship queries: the properties the
scale design depends on must survive refactors — broadcast dimension
joins stay broadcast, no row-at-a-time Python UDF appears in a hot path,
no cartesian products or wasted mid-plan global sorts creep in
(tools/audit_plans.py's checklist, enforced as tests on sf0.001)."""

import sys

sys.path.insert(0, "/root/repo")

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    import __spark_entry__ as em

    df = em.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def push_conf(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_join_agg_broadcasts_dimensions(push_conf):
    plan = _plan(push_conf, "xml_join_agg")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle-join
    assert "CartesianProduct" not in plan


def test_no_row_python_udf_in_hot_paths(push_conf):
    # BatchEvalPython = row-at-a-time Python UDF; ArrowEvalPython /
    # mapInPandas are the only acceptable Python surfaces
    for name in ("xml_agg_q1", "dedup_minhash", "dedup_jaccard",
                 "text_filter_pipeline", "ann_cosine_topk"):
        assert "BatchEvalPython" not in _plan(push_conf, name), name


def test_audit_checklist_on_flagships(push_conf):
    from tools.audit_plans import audit

    for name in ("xml_agg_q1", "xml_join_agg", "xml_window_rank",
                 "dedup_minhash", "events_sessionize"):
        flags = audit(_plan(push_conf, name))
        assert flags == [], f"{name}: {flags}"


def test_partial_aggregation_in_agg_q1(push_conf):
    # map-side combine must exist: partial_ aggregate below the exchange
    plan = _plan(push_conf, "xml_agg_q1")
    assert "partial_" in plan
