"""Streaming access-log ingest — the batch Common Log parse applied to a
live file stream unchanged (the `tail -f access.log` deployment shape).

The parse is a pure column transform (sources/formats.parse_common_log),
so it is source-agnostic: readStream.text replays/tails the log
directory and the SAME regexp/typing expressions run per micro-batch —
stateless map stage, no watermark, no state store. Tested row-exact
against the batch reader after full replay.

Reference: java/experiments/com/manning/hip/common/
CommonLogInputFormat.java — the Hadoop streaming-ingest seam for access
logs; Spark-first that seam is the file-source + the shared transform.

Scale: file-source streaming inherits checkpointed offsets and per-file
splits; the regexp stays JVM-side and whole-stage-codegen'd, and a
status-only downstream aggregation prunes every other column before the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.formats import parse_common_log


def stream_common_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Tail a directory of Apache access logs as a typed stream."""
    lines = (
        spark.readStream.option("maxFilesPerTrigger", "1")
        .text(log_dir)
    )
    return parse_common_log(lines)


def stream_status_counts(spark: SparkSession, log_dir: str) -> DataFrame:
    """Per-(status_code, method) request counts over the tailed log —
    the canonical ops dashboard aggregation; complete-mode agg whose
    replay total equals the batch groupBy exactly."""
    return (
        stream_common_log(spark, log_dir)
        .groupBy("status_code", "method")
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )
