"""Revision-view adapters — the Spark-first equivalent of Hedera's
InputFormats (reference: java/main/org/hedera/io/input/WikiRevisionPageInputFormat.java,
WikiRevisionTextInputFormat.java and io/etl/*ETLReader.java).

Hedera spends ~half its code splitting giant XML dumps into per-revision
records while preserving (page, revision, parent, timestamp) lineage. On
Spark the analog is a *view*: a DataFrame with the revision schema, derived
declaratively from the underlying columnar storage. Two adapters:

- ``revisions_from_events``: the `events` table as a revision *stream*
  (user_id ≈ page_id, event_id ≈ rev_id, ts ≈ timestamp).
- ``snapshots_from_documents``: the `documents` table as page *snapshots*
  (source ≈ page, doc_id ≈ revision sequence, text ≈ revision content).

Both are pure projections — Catalyst collapses them into the parquet scan,
so unlike the reference there is no materialization step and column pruning
still reaches storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table


def revisions_from_events(events: DataFrame) -> DataFrame:
    """events → (page_id, rev_id, ts, kind, value, props) revision stream."""
    return events.select(
        F.col("user_id").alias("page_id"),
        F.col("event_id").alias("rev_id"),
        F.col("ts"),
        F.col("event_type").alias("kind"),
        F.col("value"),
        F.col("props"),
    )


def snapshots_from_documents(documents: DataFrame) -> DataFrame:
    """documents → (page_id, rev_seq, text, lang, n_chars) snapshots."""
    return documents.select(
        F.col("source").alias("page_id"),
        F.col("doc_id").alias("rev_seq"),
        F.col("text"),
        F.col("lang"),
        F.col("n_chars"),
    )


def load_revisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revisions_from_events(load_table(spark, sf_dir, "events"))


def load_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    return snapshots_from_documents(load_table(spark, sf_dir, "documents"))
