"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json). The real inventory lives in
``hedera_spark.registry``; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from hedera_spark.operators.tpch import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Embedding note: several operators deliberately persist intermediates
    whose lifetime extends past the returned (lazy) frame — required for
    single-execution plans. A LONG-LIVED session running many queries
    should call ``hedera_spark.session.reset_session_state(spark)``
    between independent queries (bench.py and the test suite do): it
    releases those caches and the in-process model registries, keeping
    later plans clean and preventing stale cached reads after an
    in-place rewrite of the parquet inputs.
    ``tests/test_plans.py::test_reset_session_state_clears_all_persisted_frames``
    pins the contract."""
    from hedera_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (where expressible)."""
    from hedera_spark.registry import ORACLE

    return dict(ORACLE)
