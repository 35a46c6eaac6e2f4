"""Plan audits (SURVEY.md §5.3): the physical plans must show the shapes
we designed for — predicate pushdown into the parquet scan, broadcast
joins for dims, no row-at-a-time Python UDFs in relational operators.
These are the properties that decide whether the same code survives a
100x scale-up."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q6_pushes_filters_to_scan(spark):
    from hedera_spark.operators.tpch import tpch_q6

    plan = _formatted(tpch_q6(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # the shipdate range must reach the scan, not sit in a post-filter only
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_tpch_q1_prunes_columns(spark):
    from hedera_spark.operators.tpch import tpch_q1

    plan = _formatted(tpch_q1(spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_orderkey" not in read_schema  # not referenced by q1


def test_dim_joins_are_broadcast(spark):
    from hedera_spark.operators.anchors import id2title
    from hedera_spark.operators.tpch import tpch_q5

    assert "BroadcastHashJoin" in _plan(id2title(spark, SF_DIR))
    assert "BroadcastHashJoin" in _plan(tpch_q5(spark, SF_DIR))


def test_rev_filter_pushdown(spark):
    from hedera_spark.operators.revisions import rev_filter_time

    plan = _formatted(rev_filter_time(spark, SF_DIR))
    # event_type filter is pushable; ts is a derived column (nanos->micros)
    # so its range filter sits above the scan by design
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters")[1].split("]")[0]


@pytest.mark.parametrize(
    "qname",
    ["anchor_count", "term_stats", "dedup_minhash", "rev_diff", "tpch_q1"],
)
def test_hot_paths_have_no_python_udf(spark, qname):
    from hedera_spark.registry import QUERIES

    plan = _plan(QUERIES[qname](spark, SF_DIR))
    assert "BatchEvalPython" not in plan  # row-at-a-time Python UDF
    assert "ArrowEvalPython" not in plan  # pandas UDF — not needed in these


def test_whole_stage_codegen_covers_q1(spark):
    from hedera_spark.operators.tpch import tpch_q1

    df = tpch_q1(spark, SF_DIR)
    df.collect()  # AQE finalizes the physical plan on execution
    plan = _plan(df)
    # '*(n)' operator prefixes mark whole-stage-codegen spans in plan strings
    assert "WholeStageCodegen" in plan or "*(" in plan
