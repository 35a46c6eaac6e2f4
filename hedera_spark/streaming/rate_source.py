"""Rate-shaped streaming source — the non-file ingest adapter.

The file-replay source (streaming/source.py) proves the streaming
operators against the parquet log; a production ingest would instead be
a message-bus source (Kafka et al.). Spark's `rate-micro-batch` source
has exactly the Kafka source's contract — offsets per micro-batch, a
schema fixed up front, unbounded arrival — minus the external broker, so
it is the in-container stand-in that proves the operator family is
source-agnostic: `_hourly_agg` and friends consume this stream unchanged.
(A real Kafka hookup is this module with `.format("kafka")` + the same
`_map_rate`-style projection from the value bytes; the operators do not
change, which is the point.)

Reference parity: Hedera's ingest story is batch re-reads of growing
dump slices (java/main/org/hedera/io/input/WikiRevisionPageInputFormat
re-seeks split boundaries); a live source replaces re-reading with
offset-tracked arrival, and this module is that seam.

Determinism: rate-micro-batch batch k emits values [k·rowsPerBatch,
(k+1)·rowsPerBatch) all stamped startTimestamp + k·advanceMillisPerBatch
— so the exact consumed input is reconstructible batch-side from the
last committed batch id, which is what the equivalence test does (stream
agg over N batches == batch agg over the reconstructed N batches).

Scale: the source scales by numPartitions (per-partition offset ranges,
like Kafka partitions); everything downstream is the same watermarked
agg already audited in streaming/pageviews.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RATE_START_TS_MS = 1704067200000  # 2024-01-01 00:00:00 UTC
RATE_ROWS_PER_BATCH = 600
RATE_ADVANCE_MS = 600_000  # each micro-batch advances event time 10 min
RATE_NUM_PARTITIONS = 4
RATE_N_USERS = 100

_EVENT_TYPES = ("view", "click", "purchase")


def _map_rate(raw: DataFrame) -> DataFrame:
    """(timestamp, value) -> the events schema. Pure column expressions
    (md5-derived value, modulo user/type) so the same mapping applies to
    the stream and to the batch-side reconstruction bit-identically."""
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(RATE_N_USERS)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _EVENT_TYPES]),
            (F.pmod(F.col("value"), F.lit(len(_EVENT_TYPES))) + 1).cast("int"),
        ).alias("event_type"),
        (
            F.conv(F.substring(F.md5(F.col("value").cast("string")), 1, 4), 16, 10)
            .cast("double")
            / 65535.0
        ).alias("value"),
        F.lit("{}").alias("props"),
    )


def rate_events(
    spark: SparkSession,
    rows_per_batch: int = RATE_ROWS_PER_BATCH,
    start_ts_ms: int = RATE_START_TS_MS,
    advance_ms: int = RATE_ADVANCE_MS,
    num_partitions: int = RATE_NUM_PARTITIONS,
) -> DataFrame:
    """Unbounded events stream from the rate-micro-batch source."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("numPartitions", str(num_partitions))
        .option("startTimestamp", str(start_ts_ms))
        .option("advanceMillisPerBatch", str(advance_ms))
        .load()
    )
    return _map_rate(raw)


def rate_events_batch(
    spark: SparkSession,
    n_batches: int,
    rows_per_batch: int = RATE_ROWS_PER_BATCH,
    start_ts_ms: int = RATE_START_TS_MS,
    advance_ms: int = RATE_ADVANCE_MS,
) -> DataFrame:
    """Batch reconstruction of exactly the first `n_batches` micro-batches
    the streaming source emits — the comparison side of the equivalence
    test."""
    raw = spark.range(n_batches * rows_per_batch).select(
        F.timestamp_millis(
            F.lit(start_ts_ms)
            + (F.col("id") / rows_per_batch).cast("long") * advance_ms
        ).alias("timestamp"),
        F.col("id").alias("value"),
    )
    return _map_rate(raw)


def stream_pv_hourly_rate(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """The pv_hourly streaming rollup on the rate source — identical
    aggregation code as the file-replay variant (streaming/pageviews.py),
    different source: the operators are source-agnostic. `sf_dir` is
    accepted and ignored to keep the (spark, sf_dir) operator signature."""
    from hedera_spark.streaming.pageviews import _hourly_agg

    return _hourly_agg(rate_events(spark))
