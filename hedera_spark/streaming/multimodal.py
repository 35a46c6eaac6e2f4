"""Streaming multimodal ingest — the batch Arrow decode plumbing applied
to a live stream unchanged.

mapInPandas is source-agnostic in Structured Streaming: the SAME
_decode_batches generator that powers operators/multimodal.multimodal_meta
runs per micro-batch here, so a 100 TB image/video ingest decodes at the
edge with zero operator rewrite (stateless map stage — no watermark, no
state store). Tested row-exact against the batch operator after full
replay.

Reference: the ingest-time ETL story of WIKIREVISION.md, with binary
payloads instead of revision XML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.operators.multimodal import DECODE_SCHEMA, _decode_batches
from hedera_spark.streaming.source import probe_schema


def stream_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet replayed as a file stream -> binary payload ->
    Arrow-batched stub decode, identical to the batch operator."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    schema = probe_schema(spark, path)
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
