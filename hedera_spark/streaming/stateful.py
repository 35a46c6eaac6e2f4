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


FUNNEL_OUT_SCHEMA = (
    "user_id long, n_seen long, t_view timestamp, "
    "t_click_after_view timestamp, t_purchase_after_click timestamp"
)
FUNNEL_STATE_SCHEMA = "n long, v long, c long, p long"
_NONE = -1


def _update_funnel(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: "GroupState"
) -> "Iterator[pd.DataFrame]":
    n, v, c, p = state.get if state.exists else (0, _NONE, _NONE, _NONE)
    for pdf in pdfs:
        n += len(pdf)
        for et, us in zip(pdf["event_type"], pdf["us"]):
            us = int(us)
            if et == "view" and (v == _NONE or us < v):
                v = us
            elif et == "click" and (c == _NONE or us < c):
                c = us
            elif et == "purchase" and (p == _NONE or us < p):
                p = us
    state.update((n, v, c, p))
    # ordered gating EXACTLY as the batch funnel: the stage minimum
    # counts only if it is at-or-after the previous stage's minimum
    gc = c if (v != _NONE and c != _NONE and c >= v) else None
    gp = p if (gc is not None and p != _NONE and p >= c) else None
    ts = lambda u: pd.to_datetime(u, unit="us") if u is not None and u != _NONE else pd.NaT  # noqa: E731
    yield pd.DataFrame(
        [(key[0], n, ts(v), ts(gc), ts(gp))],
        columns=[
            "user_id",
            "n_seen",
            "t_view",
            "t_click_after_view",
            "t_purchase_after_click",
        ],
    )


def stream_funnel(spark: SparkSession, sf_dir: str, **source_kw) -> DataFrame:
    """Online ordered view→click→purchase funnel: per-user keyed state
    holds the three RAW stage minima (micros) plus an event counter; the
    ordered gating is applied at emit time, so late events that lower a
    stage minimum can flip a conversion off exactly as re-running the
    batch operator would. Replaying the full log reproduces batch
    `funnel` bit-for-bit (tested); the emitted n_seen makes "latest row
    per user" well-defined for downstream consumers regardless of
    micro-batch count.

    Scale: state is four longs per user, partitioned by the grouping
    key; each micro-batch touches only the users it carries — the same
    bounded-keyed-state shape as stream_user_totals.

    Pass source_kw (e.g. recursive=True) to replay an arbitrary
    day-file directory instead of the canonical sf_dir events table —
    the restart test drives it that way."""
    if source_kw:
        from hedera_spark.streaming.source import stream_events_dir

        src = stream_events_dir(spark, sf_dir, **source_kw)
    else:
        src = event_stream(spark, sf_dir)
    events = src.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOTKEY_OUTPUT_SCHEMA = "user_id long, threshold long, total_at_emit long"
HOTKEY_STATE_SCHEMA = "total long, emitted_below long"
HOTKEY_MIN_EXP = 3
HOTKEY_MAX_EXP = 30


def _update_hot_keys(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Online hot-key detector: per-user state is (lifetime total,
    highest threshold already emitted). When the total crosses new
    power-of-two thresholds, one row per crossed threshold is emitted.
    The emitted (user, threshold) SET depends only on the final totals
    — identical for any micro-batch slicing, which is what the
    replay-equals-batch test pins against operators/timeseries.
    user_thresholds."""
    total, emitted = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total += len(pdf)
    rows = []
    for exp in range(HOTKEY_MIN_EXP, HOTKEY_MAX_EXP + 1):
        thr = 1 << exp
        if emitted < thr <= total:
            rows.append((key[0], thr, total))
            emitted = thr
    state.update((total, emitted))
    if rows:
        yield pd.DataFrame(
            rows, columns=["user_id", "threshold", "total_at_emit"]
        )


def stream_hot_keys(spark: SparkSession, sf_dir: str, **source_kw) -> DataFrame:
    """Streaming hot-key detection with exponential emission: state is
    two longs per user (bounded regardless of stream length), and output
    volume is O(|users|·log total) — the pattern for surfacing skewed
    keys from an unbounded stream without ever materializing per-key
    event history. BuildShortTermTS's accumulating reducer, specialized
    to threshold alerts. Extra source_kw route to stream_events_dir
    (restart tests feed a growing directory)."""
    if source_kw:
        from hedera_spark.streaming.source import stream_events_dir

        events = stream_events_dir(spark, sf_dir, **source_kw).select("user_id")
    else:
        events = event_stream(spark, sf_dir).select("user_id")
    return events.groupBy("user_id").applyInPandasWithState(
        _update_hot_keys,
        outputStructType=HOTKEY_OUTPUT_SCHEMA,
        stateStructType=HOTKEY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LATE_OUTPUT_SCHEMA = (
    "user_id long, n_events long, c_in_order long, c_lt_1s long,"
    " c_lt_1m long, c_lt_10m long, c_lt_1h long, c_ge_1h long"
)
LATE_STATE_SCHEMA = "runmax long, counts array<long>"
_LATE_BOUNDS_US = (1_000_000, 60_000_000, 600_000_000, 3_600_000_000)


def _late_bucket_idx(disorder_us: int) -> int:
    if disorder_us == 0:
        return 0
    for k, bound in enumerate(_LATE_BOUNDS_US):
        if disorder_us < bound:
            return k + 1
    return 5


def _update_late_events(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: "GroupState"
) -> "Iterator[pd.DataFrame]":
    """Online out-of-orderness accounting (the streaming twin of
    operators/timeseries.late_events): per-user state is the running max
    event-time plus six cumulative disorder-bucket counters. Rows are
    folded in event_id order within each batch; under the file-replay
    contract (the log is written in event_id order) the cumulative
    counters after the last batch equal the batch operator's per-user
    rollup regardless of micro-batch slicing (tested)."""
    runmax, counts = state.get if state.exists else (-1, [0] * 6)
    counts = list(counts)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["arr_key", "event_id"])
        for us in pdf["tsu"].astype("int64"):
            us = int(us)
            disorder = max(runmax - us, 0) if runmax >= 0 else 0
            counts[_late_bucket_idx(disorder)] += 1
            runmax = max(runmax, us)
    state.update((runmax, counts))
    yield pd.DataFrame(
        [(key[0], sum(counts), *counts)],
        columns=[
            "user_id",
            "n_events",
            "c_in_order",
            "c_lt_1s",
            "c_lt_1m",
            "c_lt_10m",
            "c_lt_1h",
            "c_ge_1h",
        ],
    )


def stream_late_events(spark: SparkSession, sf_dir: str, **source_kw) -> DataFrame:
    """Streaming watermark-design dial: per-user running max event-time
    + six bucket counters (state = two longs and a fixed-6 array per
    user, bounded regardless of stream length). The live version of the
    question `what watermark delay would drop how much?` — run it
    against production traffic before committing a withWatermark value.
    Extra source_kw route to stream_events_dir (restart tests feed a
    growing directory)."""
    if source_kw:
        from hedera_spark.streaming.source import stream_events_dir

        src = stream_events_dir(spark, sf_dir, **source_kw)
    else:
        src = event_stream(spark, sf_dir)
    events = src.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        # the same deterministic arrival permutation as the batch
        # operator (see _late_events_per_user — test fixture, drops out
        # on a real log); equality with batch holds when permuted blocks
        # do not straddle a micro-batch boundary, which the canonical
        # single-file replay guarantees
        (
            F.col("event_id")
            + F.when(F.col("event_id") % 8 == 0, F.lit(5)).otherwise(F.lit(0))
        ).alias("arr_key"),
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_late_events,
        outputStructType=LATE_OUTPUT_SCHEMA,
        stateStructType=LATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTR_OUTPUT_SCHEMA = (
    "user_id long, purchase_event_id long, campaign int, cents long"
)
ATTR_STATE_SCHEMA = "v_tsu long, v_event_id long, k int"


def _update_attribution(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # state = the latest view seen so far: (event-time micros, event_id,
    # campaign k). Bounded: one small tuple per user, forever.
    v_tsu, v_eid, k = state.get if state.exists else (-1, -1, None)
    out = []
    for pdf in pdfs:
        # event-time order within the batch; views before purchases at
        # equal ts (is_v desc) so a same-instant view gets credit, and
        # among same-ts views the highest event_id ends up last
        pdf = pdf.sort_values(
            ["tsu", "is_p", "event_id"], kind="mergesort"
        )
        for row in pdf.itertuples(index=False):
            if row.is_p == 0:
                if (row.tsu, row.event_id) > (v_tsu, v_eid):
                    v_tsu, v_eid = int(row.tsu), int(row.event_id)
                    k = None if pd.isna(row.k) else int(row.k)
            else:
                out.append(
                    (
                        int(key[0]),
                        int(row.event_id),
                        k if v_eid >= 0 else None,
                        int(row.cents),
                    )
                )
    state.update((v_tsu, v_eid, k))
    cols = ["user_id", "purchase_event_id", "campaign", "cents"]
    yield pd.DataFrame(out, columns=cols)


def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online last-touch attribution: each purchase is credited AS IT
    ARRIVES to the latest view seen so far for that user — the streaming
    twin of attribution_last_touch (per-purchase rows here; the test
    rolls them up and matches the batch rollup exactly on the ordered
    replay). State is one (ts, event_id, campaign) tuple per user —
    bounded regardless of stream length; a late out-of-order view cannot
    retro-steal an already-emitted purchase, which is the documented
    online semantics (late_events / stream_late_events is the dial that
    measures how much lateness the log actually has)."""
    events = event_stream(spark, sf_dir).where(
        F.col("event_type").isin("view", "purchase")
    )
    prepped = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        F.when(
            F.col("event_type") == "view",
            F.get_json_object("props", "$.k").cast("int"),
        ).alias("k"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_attribution,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SAMPLE_OUTPUT_SCHEMA = (
    "event_type string, n_seen long, sample_ids array<long>"
)
SAMPLE_STATE_SCHEMA = "n long, hashes array<string>, ids array<long>"
SAMPLE_K = 16


def _update_sample(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Bounded bottom-K-hash reservoir per event type: state is the K
    smallest (md5(event_id), event_id) pairs seen so far plus a count.
    Bottom-K of a hash is MERGEABLE (union then re-trim) and
    order-free, so after any micro-batch slicing the final sample
    equals the batch operator's (replay-equals-batch test) — the
    property rand()-reservoirs lack."""
    import hashlib

    n, hashes, ids = state.get if state.exists else (0, [], [])
    pool = list(zip(hashes, ids))
    for pdf in pdfs:
        n += len(pdf)
        for eid in pdf["event_id"].astype("int64"):
            eid = int(eid)
            pool.append((hashlib.md5(str(eid).encode()).hexdigest(), eid))
        pool = sorted(pool)[:SAMPLE_K]
    state.update((n, [h for h, _ in pool], [i for _, i in pool]))
    yield pd.DataFrame(
        [(key[0], n, [i for _, i in pool])],
        columns=["event_type", "n_seen", "sample_ids"],
    )


def stream_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fixed-K deterministic sample per event type — the
    incremental twin of operators/timeseries.events_sample_k: keyed
    state is the K smallest md5(event_id) pairs (K longs + K hashes,
    bounded forever), each batch emits the current sample with its
    n_seen watermark; the row with the max n_seen per type is the
    final sample and equals the batch bottom-K exactly. The streaming
    eval-set builder: a stable dev sample maintained while the log
    grows, no nightly re-scan."""
    events = event_stream(spark, sf_dir).select("event_type", "event_id")
    return events.groupBy("event_type").applyInPandasWithState(
        _update_sample,
        outputStructType=SAMPLE_OUTPUT_SCHEMA,
        stateStructType=SAMPLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
