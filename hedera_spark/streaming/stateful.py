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
