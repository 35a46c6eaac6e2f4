"""Custom stateful streaming operator — applyInPandasWithState.

The reference's short-term time series job (mapreduce/BuildShortTermTS.java)
accumulates per-entity counters across a sorted stream with a secondary-
sort reducer. The Structured Streaming statement of that pattern is
arbitrary per-key state maintained across micro-batches: here a running
(n_events, sum_value, last_ts) per user, updated incrementally as batches
arrive. This is the escape hatch for stateful logic that windowed
aggregation can't express (custom eviction, session models, decaying
counters); the state store checkpoints it per key.

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only keys present in the batch. State size = O(unique
users), bounded further by the GroupStateTimeout if keyed state should
expire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hedera_spark.streaming.source import event_stream

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_unix long"
STATE_SCHEMA = "n long, s double, last_unix long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["unix_sec"].max()))
    # keep the raw accumulator in state — rounding per batch would
    # re-quantize and drift from the batch aggregate across many batches
    state.update((n, s, last))
    yield pd.DataFrame(
        [(key[0], n, round(s, 2), last)],
        columns=["user_id", "n_events", "sum_value", "last_unix"],
    )


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state."""
    events = event_stream(spark, sf_dir).select(
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("unix_sec"),
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT_SCHEMA = (
    "user_id long, day_num long, cnt long, mean_7 double, z_score double,"
    " is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "days array<long>, cnts array<long>"
ANOMALY_WINDOW = 7
ANOMALY_MIN_OBS = 4


def _update_pv_anomaly(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online z-score anomaly scoring: per-user state is the trailing
    ANOMALY_WINDOW (day, count) pairs; each batch merges its per-day
    counts in day order and re-scores every day it completes, using the
    SAME exact-integer statistics as batch pv_anomaly (n, Σx, Σx² →
    one double division + sqrt), so the replayed stream reproduces the
    batch scores bit-for-bit. State is O(window) per user — bounded
    regardless of stream length. Where the batch operator emits NULL z
    (zero variance), the Arrow float path emits NaN."""
    hist: dict[int, int] = {}
    if state.exists:
        days, cnts = state.get
        hist = dict(zip(days, cnts))
    merged: dict[int, int] = {}
    for pdf in pdfs:
        if not len(pdf):
            continue
        for day, cnt in pdf.groupby("day_num").size().items():
            merged[int(day)] = merged.get(int(day), 0) + int(cnt)
    out = []
    for day in sorted(merged):
        hist[day] = hist.get(day, 0) + merged[day]
        # evict beyond the trailing window (state bound)
        for old in sorted(hist)[: max(0, len(hist) - ANOMALY_WINDOW)]:
            del hist[old]
        win = [hist[d] for d in sorted(hist) if d <= day][-ANOMALY_WINDOW:]
        n = len(win)
        if n < ANOMALY_MIN_OBS:
            continue
        s = sum(win)
        ss = sum(c * c for c in win)
        x = hist[day]
        var_num = n * ss - s * s
        mean = s / n
        if var_num > 0:
            z = (x - mean) / ((var_num / (n * (n - 1))) ** 0.5)
            flag = abs(z) >= 2.0
            z = round(z, 6)
        else:
            z = float("nan")
            flag = False
        out.append((key[0], day, x, round(mean, 6), z, flag))
    sd = sorted(hist)[-ANOMALY_WINDOW:]
    state.update((sd, [hist[d] for d in sd]))
    yield pd.DataFrame(
        out,
        columns=["user_id", "day_num", "cnt", "mean_7", "z_score", "is_anomaly"],
    )


def stream_pv_anomaly(spark: SparkSession, src_dir: str, **source_kw) -> DataFrame:
    """Streaming twin of operators/timeseries.pv_anomaly: online rolling
    z-score anomaly flags over the replayed event log, custom keyed
    state via applyInPandasWithState (the ring buffer + integer-sum
    statistics windowed aggregation cannot express)."""
    from hedera_spark.streaming.source import stream_events_dir

    events = stream_events_dir(spark, src_dir, **source_kw).select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_pv_anomaly,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
