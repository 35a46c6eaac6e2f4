"""Streaming parity: replaying the events log through the Structured
Streaming hourly rollup must equal the batch pv_hourly operator."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.oracle_compare import assert_frames_match


def test_stream_pv_hourly_equals_batch(spark):
    from hedera_spark.operators.timeseries import pv_hourly
    from hedera_spark.streaming.pageviews import stream_pv_hourly

    stream_df = stream_pv_hourly(spark, SF_DIR)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("pv_hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from pv_hourly_stream").toPandas()
    want = pv_hourly(spark, SF_DIR).toPandas()
    assert_frames_match(got, want, "stream_pv_hourly")


def test_stream_user_totals_equals_batch(spark):
    """The stateful running-total op after consuming the whole file must
    equal the batch aggregate."""
    from pyspark.sql import functions as F

    from hedera_spark.sources.tables import load_table
    from hedera_spark.streaming.stateful import stream_user_totals

    out = stream_user_totals(spark, SF_DIR)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r
        for r in spark.sql(
            "select * from user_totals_stream"
        ).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(F.unix_timestamp("ts")).alias("last_unix"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n_events"] == w["n_events"]
        assert abs(g["sum_value"] - w["sum_value"]) < 0.05
        assert g["last_unix"] == w["last_unix"]
