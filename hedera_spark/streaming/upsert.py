"""Streaming CDC upsert — foreachBatch MERGE into a bucketed key-value
state table, last-writer-wins per entity.

The streaming twin of operators/scd.upsert_merge: the change log arrives
as a file stream, and every micro-batch is folded into a persistent
"current state per entity" parquet table. The reference's analogue is
re-reading overlapping dump slices and keeping the newest revision per
page (io/input/WikiRevisionPageInputFormat.java split-boundary dedup) —
here maintained incrementally instead of by re-scan.

The 100 TB economics live in the state layout: the state table is
partitioned by a deterministic key bucket (xxhash64 mod N). Each
micro-batch (1) reduces itself to latest-per-key map-side, (2) reads
ONLY the state buckets its delta touches, (3) re-merges those, and
(4) rewrites exactly those partitions via dynamic partition overwrite.
A batch touching 3 of 64 buckets rewrites 3/64ths of the state, never
the whole table — the same economics as dedup_incremental's
never-pair-old×old rule, applied to the serving-state side.

Idempotent by construction: the merge key is max(ts, event_id) per
entity, so re-applying a batch after a checkpoint loss or retry is a
no-op (last-writer-wins is commutative-idempotent over replays).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hedera_spark.streaming.source import stream_events_dir

N_STATE_BUCKETS = 16

_STATE_COLS = ("user_id", "event_type", "value", "ts", "event_id")


def _latest_per_key(df: DataFrame) -> DataFrame:
    """Last-writer-wins reduction: newest (ts, event_id) row per user."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _bucketed(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(N_STATE_BUCKETS))
    )


def read_upsert_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current state table (one row per entity), bucket column dropped."""
    return spark.read.parquet(state_dir).drop("bucket")


def stream_upsert(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    recursive: bool = True,
) -> StreamingQuery:
    """Replay the events file stream from `src_dir`, maintaining the
    latest-per-entity state table at `state_dir` (availableNow trigger —
    drains what exists, then stops)."""
    ev = stream_events_dir(spark, src_dir, recursive=recursive).select(*_STATE_COLS)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        delta = _bucketed(_latest_per_key(batch_df))
        touched = [r["bucket"] for r in delta.select("bucket").distinct().collect()]
        if not touched:
            return
        # probe for prior state through Spark itself, not os.path —
        # state_dir may live on HDFS/S3 where driver-local filesystem
        # calls silently report "no state" and the merge would drop
        # every bucket not touched by the first batch
        try:
            # localCheckpoint materializes the prior state so the dynamic
            # overwrite below never reads the files it is replacing
            prev = (
                sess.read.parquet(state_dir)
                .where(F.col("bucket").isin(touched))
                .localCheckpoint(eager=True)
            )
            merged = _latest_per_key(prev.unionByName(delta))
        except AnalysisException as ex:
            # ONLY the missing-path case means "first batch, nothing to
            # merge" — a schema mismatch, corrupt footer, or permission
            # error must abort the batch, or the dynamic overwrite below
            # would silently replace touched buckets without merging
            # their prior rows
            cls = ex.getCondition() if hasattr(ex, "getCondition") else None
            if cls != "PATH_NOT_FOUND" and "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = delta
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(state_dir)
        )

    return (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
