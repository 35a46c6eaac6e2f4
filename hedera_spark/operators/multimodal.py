"""Group G.4 — multimodal columns (SURVEY.md §2.G): binary payloads with
typed metadata, decoded through Arrow-batched Pandas plumbing.

The container has no image/audio codecs, so the decode itself is a
clearly-marked deterministic stub — but the Spark-side plumbing is real
and is exactly what a production pipeline needs: a `binary` column,
`mapInPandas` with an explicit schema, Arrow batch transfer, and per-batch
vectorized work. Swapping `_decode_stub` for PIL/ffmpeg is a one-function
change; the plan shape (scan → mapInPandas → downstream relational ops)
stays identical.

Scale: mapInPandas streams Arrow batches — constant memory per task, no
per-row Python overhead; partitioning is inherited from the scan, so at
100 TB this is an embarrassingly-parallel map stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int, format string"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int, int, str]:
    """Deterministic fake decoder. A real deployment replaces this with
    PIL.Image.open / av.open — NOT implemented here because the codecs are
    not in the container (see module docstring)."""
    n = len(payload)
    return (
        n,
        64 + n % 512,
        64 + (n * 7) % 512,
        1 + n % 16,
        "png" if n % 2 == 0 else "jpeg",
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        meta = [_decode_stub(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            meta, columns=["n_bytes", "width", "height", "n_frames", "format"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload (here: utf-8 doc bytes standing in for an
    image blob) → typed metadata via Arrow-batched mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
