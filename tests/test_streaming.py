"""Streaming parity: replaying the events log through the Structured
Streaming hourly rollup must equal the batch pv_hourly operator."""

from __future__ import annotations

import pandas as pd

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
