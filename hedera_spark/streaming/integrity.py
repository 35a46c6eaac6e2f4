"""Streaming integrity checksums — the incremental twin of
operators/profile.checksum_by_type.

An ingest pipeline reconciles "did the stream deliver exactly the rows
the lake holds?" by comparing per-key checksums, not by diffing rows.
XOR of a per-row hash is the right running state for that: commutative
(arrival order never matters), self-inverse (a replayed duplicate
cancels itself OUT — visibly corrupting the checksum rather than
silently inflating a count), and O(1) per key. The streaming aggregate
below maintains exactly the batch operator's number; the
replay-equals-batch test pins the two together.

Scale: state is one (count, 60-bit xor) pair per event_type — bounded
by the key universe, mergeable across micro-batches and shuffle
partitions (bit_xor is a declarative aggregate with a partial merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.operators.profile import EVENT_CHECKSUM_SERIAL
from hedera_spark.streaming.source import event_stream


def stream_checksum(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running (n_events, checksum) per event_type over the event
    stream — complete-mode aggregate, same serial and 60-bit md5-XOR as
    checksum_by_type."""
    events = event_stream(spark, src_dir)
    h = F.conv(
        F.substring(F.md5(F.expr(EVENT_CHECKSUM_SERIAL)), 1, 15), 16, 10
    ).cast("long")
    return (
        events.select("event_type", h.alias("h"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )
    )


def stream_cms(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running Count-Min counter grid over the event stream — the
    incremental twin of operators/sketches._cms_counters. The sketch is
    the canonical STREAMING summary (its original setting): per
    micro-batch each cell adds its partial count, state is the fixed
    d×w grid (≤ 1024 rows) regardless of key cardinality, and after
    consuming the whole log the grid equals the batch one bit-for-bit
    (replay-equals-batch test). Complete-mode aggregate on (j, bucket)."""
    from hedera_spark.operators.sketches import _cms_counters

    return _cms_counters(event_stream(spark, src_dir))


def stream_hll(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running HyperLogLog registers over the event stream — the
    incremental twin of operators/sketches.hll_union's merged sketch:
    per micro-batch each register keeps max(rho), state is the fixed
    ≤ 256-row register table regardless of user cardinality, and after
    consuming the whole log the registers equal the batch ones
    bit-for-bit (replay-equals-batch test) — max is commutative and
    idempotent, which is exactly why HLL survives replays and
    at-least-once sources. Complete-mode aggregate on bucket."""
    from hedera_spark.operators.sketches import hll_rho_rows

    events = event_stream(spark, src_dir).select("user_id")
    return (
        hll_rho_rows(events)
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def stream_moments(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running moments-sketch state over the event stream — the
    incremental twin of operators/sketches.moment_sums (the 5-integer
    power-sum state behind moments_quantiles). Power sums merge by
    addition, so the complete-mode agg after consuming the whole log
    equals the batch sums bit-for-bit (replay-equals-batch test), and
    the per-type state is FIVE integers no matter how many events
    stream through — the quantile monitor you can keep running forever
    without state growth."""
    from hedera_spark.operators.sketches import moment_sums

    return moment_sums(event_stream(spark, src_dir))


def stream_linreg(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running OLS sufficient statistics over the event stream — the
    incremental twin of operators/timeseries.linreg_sums (the 6-integer
    state behind linreg_value_hour). Sums merge by addition, so the
    complete-mode agg after consuming the whole log equals the batch
    sums exactly (replay-equals-batch test); per-type state is SIX
    integers forever — the regression kept live at the ingest edge so
    a drifting value-vs-hour trend (a pricing bug, a bot burst at 3am)
    surfaces without a nightly refit."""
    from hedera_spark.operators.timeseries import linreg_sums

    return linreg_sums(event_stream(spark, src_dir))


def stream_benford(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running Benford leading-digit counters over the event stream —
    the incremental twin of operators/profile.benford_counts (the ≤9
    integers behind benford_audit). Counts merge by addition, so the
    complete-mode agg after consuming the whole log equals the batch
    counts exactly (replay-equals-batch test); a value-generation bug
    (a stuck sensor, a unit mixup, synthetic padding) bends the digit
    histogram at ingest time, long before the nightly audit."""
    from hedera_spark.operators.profile import benford_counts

    return benford_counts(event_stream(spark, src_dir))


def stream_dp_counts(spark: SparkSession, src_dir: str) -> DataFrame:
    """The ε-DP event-type histogram release maintained live — the
    incremental twin of operators/profile.dp_counts via the shared
    dp_count_release: complete-mode true counts per micro-batch, the
    deterministic per-key Laplace draw applied on emission. After
    consuming the whole log the release equals the batch one exactly
    (replay-equals-batch test). Continual-observation caveat documented
    on the helper: one draw per key, budget covers the final table."""
    from hedera_spark.operators.profile import dp_count_release

    g = (
        event_stream(spark, src_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    )
    return dp_count_release(g)


def stream_ams(spark: SparkSession, src_dir: str) -> DataFrame:
    """Running AMS F₂ sign sums over the event stream — the incremental
    twin of operators/sketches.ams_sign_sums (the 16-integer state
    behind ams_f2). Sign sums merge by addition, so the complete-mode
    agg after consuming the whole log equals the batch sums exactly
    (replay-equals-batch test) — the self-join-size/skew monitor kept
    live for the join planner, state bounded at 17 integers forever."""
    from hedera_spark.operators.sketches import ams_sign_sums

    return ams_sign_sums(event_stream(spark, src_dir).select("user_id"))
