"""Streaming deduplication (SURVEY.md §2.H + §2.G composed).

The batch dedup operators (operators/dedup.py) assume a closed corpus; a
crawl/ingest pipeline sees an unbounded stream and must drop duplicates
on the fly. Structured Streaming expresses this as `dropDuplicates` over
the keyed stream — state keyed by the dedup key, exactly-once per key in
append mode. Reference parity: Hedera's ingest path dedups revisions by
(page, rev id) when re-reading overlapping dump slices
(io/input/WikiRevisionPageInputFormat.java re-seeks split boundaries so a
revision is emitted once); the streaming statement generalizes that to
any key.

Scale (100 TB / unbounded): plain dropDuplicates keeps one state row per
distinct key forever — fine for bounded replays, unbounded growth on a
real stream. The production variant is dropDuplicatesWithinWatermark:
state is evicted once the watermark passes, bounding memory to the
duplicate-arrival horizon (duplicates in web crawls cluster in time —
re-fetches, mirror bursts), at the cost of re-emitting a key whose
duplicate arrives later than the horizon. Both are exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hedera_spark.streaming.source import event_stream as _event_stream


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence-only stream of (user_id, event_type) keys.
    Replaying the whole log and collecting the append-mode output equals
    the batch `SELECT DISTINCT user_id, event_type` (tests assert this).
    Unbounded state by design — see stream_dedup_within_watermark for
    the bounded-state production variant."""
    return (
        _event_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup: duplicates arriving within the
    24h event-time horizon are dropped; state for keys older than the
    watermark is evicted. Output is a superset of stream_dedup's (a key
    can re-emit after eviction) and a subset of the raw stream — the
    trade a real ingest pipeline makes to keep state finite."""
    return (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def stream_dedup_vs_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static ANTI join: drop incoming events whose
    (user_id, event_type, hour-of-day) behavior key already exists in
    the historical log — the ingest-time "have we already crawled this"
    filter, third of the three dedup shapes (unbounded state:
    stream_dedup; watermark-bounded: stream_dedup_within_watermark;
    against a static corpus: this).

    The static side is planned per micro-batch and broadcast; no state
    store at all — history membership is the static table's job (at
    100 TB that side is a bloom-filter-compacted key table, same plan
    shape). Replaying the post-cutoff stream and collecting equals the
    batch anti join exactly (stateless, no watermark caveats)."""
    from pyspark.sql import functions as F

    from hedera_spark.sources.tables import load_table

    cutoff = "2024-01-15"
    hist = (
        load_table(spark, sf_dir, "events")
        .where(F.to_date("ts") < F.lit(cutoff))
        .select("user_id", "event_type", F.hour("ts").alias("hr"))
        .distinct()
    )
    return (
        _event_stream(spark, sf_dir)
        .where(F.to_date("ts") >= F.lit(cutoff))
        .withColumn("hr", F.hour("ts"))
        .join(F.broadcast(hist), ["user_id", "event_type", "hr"], "left_anti")
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
