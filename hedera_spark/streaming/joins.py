"""Stream-stream join — time-bounded event correlation on two live streams.

The last streaming join shape (stream-static is streaming/enrich.py):
both sides unbounded, so the state store must hold each side's recent
rows until the OTHER side's watermark proves no more matches can arrive.
Structured Streaming derives that retention directly from the join's
time-range condition — here a purchase matches a view by the same user
within [view_ts, view_ts + 2h], so view state is held ~2h past the
purchase watermark and purchase state ~0 past the view watermark.

Reference parity: the revision/pageview correlation the reference does
as batch joins over time-bucketed files (python/JoinEZPageview.py,
BuildShortTermTS) — expressed as a live correlated stream instead.

Scale (unbounded): state is bounded by (active keys x the 2h window +
1h watermark slack), independent of stream age. The join itself
shuffles both streams on user_id once — the same keyed-exchange shape
as the batch join, just incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.streaming.dedup import _event_stream

ATTRIBUTION_WINDOW = "2 hours"


def _side_of(ev: DataFrame, kind: str, prefix: str) -> DataFrame:
    """One watermarked, prefixed side of the correlation join, from any
    normalized event stream (file replay, rate source, …)."""
    return (
        ev.where(F.col("event_type") == kind)
        .select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )
        .withWatermark(f"{prefix}_ts", "1 hour")
    )


def _side(spark: SparkSession, sf_dir: str, kind: str, prefix: str) -> DataFrame:
    return _side_of(_event_stream(spark, sf_dir), kind, prefix)


def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to the same user's views within the 2h
    attribution window — inner stream-stream join with the time-range
    predicate that bounds both state stores."""
    views = _side(spark, sf_dir, "view", "v")
    purchases = _side(spark, sf_dir, "purchase", "p")
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    ).select(
        "v_user",
        "v_id",
        "p_id",
        "v_ts",
        "p_ts",
        "p_value",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("lag_seconds"),
    )


def stream_view_purchase_left_join(
    spark: SparkSession, sf_dir: str, base: DataFrame | None = None
) -> DataFrame:
    """LEFT OUTER stream-stream join: every view, with its attributed
    purchase where one exists — the null-padded row for a never-converted
    view is emitted only once the purchase-side watermark proves no match
    can still arrive (Structured Streaming's outer-join contract; the
    inner variant above never emits it at all). The conversion-rate
    dashboard shape: matched and unmatched views in ONE stream.

    Scale: identical state bounds to the inner join — the outer side
    adds no state, only deferred null emission at watermark passage.

    `base` overrides the event stream (e.g. a multi-file daily replay,
    whose batch boundaries advance the watermark so null emission is
    actually observable — the test harness's shape; semantics are
    source-independent)."""
    ev = base if base is not None else _event_stream(spark, sf_dir)
    views = _side_of(ev, "view", "v")
    purchases = _side_of(ev, "purchase", "p")
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
        "left_outer",
    ).select(
        "v_user",
        "v_id",
        "v_ts",
        "p_id",
        "p_ts",
        "p_value",
        (F.col("p_id").isNotNull()).cast("int").alias("converted"),
    )
