"""Streaming corpus cleaning — batch gate projections applied to a live
document stream unchanged.

Cleaning gates that are pure per-row projections (blocklist_gate here;
pii_redact and text_quality share the shape) are source-agnostic in
Structured Streaming: no watermark, no state store, no rewrite — the
SAME expression object the batch operator builds runs per micro-batch.
That is the ingest-time cleaning story at 100 TB: gate at the edge as
documents arrive, instead of re-scanning the lake afterwards. Tested
row-exact against the batch operator after full replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hedera_spark.operators.corpus_clean import _apply_blocklist
from hedera_spark.streaming.source import probe_schema


def stream_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet replayed as a file stream -> the batch
    blocklist projection, unchanged (stateless map stage)."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = probe_schema(spark, path)
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    return _apply_blocklist(docs)
