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
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see tables.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-stream sources require a directory; select the events file via
    # a glob filter so the same sf_dir layout works for batch and stream
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _hourly_agg(events)
