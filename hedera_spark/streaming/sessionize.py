"""Streaming sessionization — session_window over the event stream.

Batch sessionization (operators/timeseries.session_stats) finds session
boundaries with a lag-window over the closed log; on an unbounded stream
the same semantics are Structured Streaming's native session_window:
state merges events whose gaps stay under the timeout, the watermark
closes sessions, and append mode emits each exactly once. Reference
parity: mapreduce/BuildShortTermTS.java computes short-term activity
series over a revision stream — sessionization is that operator's
bounded-gap generalization, and this is its incremental form.

Scale (unbounded): state per OPEN session only — closed sessions are
evicted the moment the watermark passes their end, so memory is bounded
by concurrent active users × the gap timeout, not by history length.
The 1h watermark trades late-event tolerance against state size exactly
like stream_pv_hourly.

Boundary note vs batch: batch starts a new session when gap > 1800s
(strict); session_window starts one when gap >= 1800s. With
microsecond timestamps an exact-1800.000000s gap is the only divergence
point; the equivalence test tolerates it by construction (no such gap in
the synthetic data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.streaming.dedup import _event_stream

SESSION_GAP = "30 minutes"


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per closed (user, session): start, event count, value sum.
    Append-mode output over the replayed log reproduces batch
    session_stats for every session the watermark has closed."""
    return (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("start_ts"),
            "n_events",
            "sum_value",
        )
    )
