"""SQL-surface parity: the engine's tables register as temp views and the
same analytics run via pure spark.sql — users of the reference's Pig
scripts get a SQL entry point, not just the DataFrame API."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.oracle_compare import assert_frames_match


def test_spark_sql_matches_dataframe_api(spark):
    from hedera_spark.operators.tpch import tpch_q1
    from hedera_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    sql_result = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    ).toPandas()
    df_result = tpch_q1(spark, SF_DIR).toPandas()
    assert_frames_match(sql_result, df_result, "sql_vs_dataframe_q1")


def test_window_ops_via_sql(spark):
    from hedera_spark.operators.revisions import rev_ids
    from hedera_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    sql_result = spark.sql(
        """
        SELECT user_id AS page_id, event_id AS rev_id,
               coalesce(lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS parent_id
        FROM events
        """
    ).toPandas()
    df_result = rev_ids(spark, SF_DIR).toPandas()
    assert_frames_match(sql_result, df_result, "sql_vs_dataframe_rev_ids")
