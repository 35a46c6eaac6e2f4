"""Layout-technique tests: salting preserves join semantics; bucketed
joins run without a shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from hedera_spark.plans import executed_plan
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    from hedera_spark.operators.layout import salted_join
    from hedera_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("user_id").alias("k"), "value"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = (
        ev.join(cust, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    salted = (
        salted_join(ev, cust, "k", salt=4)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted((r["k"], r["n"]) for r in plain) == sorted(
        (r["k"], r["n"]) for r in salted
    )


def test_bucketed_join_has_no_shuffle(spark):
    # tables land in the default spark-warehouse dir (gitignored), dropped below
    import shutil

    from hedera_spark.operators.layout import bucketed_join, write_bucketed
    from hedera_spark.sources.tables import load_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", n_buckets=4)
    # the test tables are tiny, so the planner would broadcast and never
    # consult the buckets; force the sort-merge path the technique targets
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        # sanity: result matches the plain join count
        assert joined.count() == lineitem.join(orders, "o_orderkey").count()
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing elided both shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
