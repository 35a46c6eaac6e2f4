"""Stream-static enrichment join — the ingest-time dimension lookup.

The reference enriches revision streams with static side tables (e.g.
id→title resolution in pig/load/* and the Freebase-join experiments);
the streaming form is Structured Streaming's stream-static join: the
static side is planned per micro-batch and broadcast, the stream side
never shuffles for the join, and no state store is involved (a static
row can't be late).

Scale (unbounded): per-batch cost is the broadcast of the static dim
(bounded — here a per-user profile aggregate; in general anything under
the broadcast threshold) times map-side lookups. This is the ONLY join
shape that adds zero state to an unbounded pipeline, which is why ingest
enrichment should always be expressed stream-static rather than
stream-stream when one side is slowly-changing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table
from hedera_spark.streaming.dedup import _event_stream


def user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user profile: historical event count and value mean —
    the slowly-changing dim a crawler would refresh out-of-band."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("hist_events"),
            F.round(F.avg("value"), 4).alias("hist_avg_value"),
        )
    )


def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each streamed event joined (broadcast, stateless) to its user's
    static profile, emitting the event with history context and a
    deviation-from-history flag."""
    profiles = F.broadcast(user_profiles(spark, sf_dir))
    return (
        _event_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "event_type", "value")
        .join(profiles, "user_id", "left")
        .withColumn(
            "above_hist_avg", (F.col("value") > F.col("hist_avg_value")).cast("int")
        )
    )


def stream_scd2_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each streamed event joined (broadcast, stateless) to the SCD2
    dimension version live at its event time — the temporal form of the
    stream-static lookup: equality on the entity key plus the half-open
    interval residual ts ∈ [valid_from, valid_to). Because the dim rows
    partition each entity's timeline (operators/scd.scd2_build), every
    event matches exactly one version; replaying the whole log equals
    batch scd2_resolve row-for-row (tested).

    Scale: the dim is |change points| rows (bounded, broadcast per
    micro-batch — at 100 TB, only CURRENT-horizon versions need to ride
    along, old versions can be pruned by the stream's minimum event
    time); zero state store, the stream never shuffles."""
    from hedera_spark.operators.scd import scd2_build

    dim = F.broadcast(
        scd2_build(spark, sf_dir).select(
            "user_id", "attr", "valid_from", "valid_to", "version"
        )
    )
    ev = _event_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    return (
        ev.join(dim, "user_id")
        .where(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "ts", "attr", "version")
    )
