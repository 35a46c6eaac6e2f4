"""Group H — Structured Streaming variants (SURVEY.md §2.H).

Hedera's pageview preprocessing (reference: mapreduce/
PreprocessEZPageviews.java, LocalEZPageviewHour.java) is a batch job over
an append-only log — exactly the shape Structured Streaming models. The
same aggregation expressed over `readStream` gives incremental hourly
rollups with watermark-bounded state; the batch operator in
operators/timeseries.py and this streaming one share the aggregation
logic, which is the Spark-first guarantee that replaying the stream equals
the batch answer.

Scale: state is keyed on (user, hour-window); the 2-hour watermark bounds
state size to |active users| x 3 windows regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.streaming.source import event_stream


def _hourly_agg(events: DataFrame) -> DataFrame:
    """The shared aggregation: counts + sums per (user, hour window)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("hour"),
            "n_events",
            "sum_value",
        )
    )


def stream_pv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly pageview rollup from a parquet file stream.
    Returns the streaming DataFrame; callers attach a writeStream sink
    (tests use a memory sink and compare against the batch operator)."""
    return _hourly_agg(event_stream(spark, sf_dir))
