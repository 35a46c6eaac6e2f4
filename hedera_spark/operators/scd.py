"""Slowly-changing-dimension (SCD2) build / resolve and change-log upsert.

The reference's whole domain is *versioned records*: a page's revision
stream IS a slowly changing dimension, and its interval readers
(io/etl/IntervalRevisionETLReader.java, io/input/
WikiRevisionTimeInputFormat.java) materialize "which revision was live at
time T" by walking timestamps. A warehouse expresses the same idea as the
SCD Type-2 pattern: one row per (entity, attribute-version) with a
half-open validity interval, `is_current` on the open row, and an as-of
resolve joining facts to the version live at their event time. The third
member, `upsert_merge`, is the MERGE/CDC step a lakehouse runs to fold a
change log into a base snapshot (Hedera's analogue: re-reading a dump
slice and keeping only the newest revision per page —
io/input/WikiRevisionPageInputFormat.java split-boundary dedup).

Data mapping: `events` is the change log (user_id = entity, event_type =
the tracked attribute value, ts = change time).

Scale notes (100 TB):
- scd2_build is two stacked windows on ONE user_id shuffle — no join, no
  self-join; the dimension is |change points|, not |events|.
- scd2_resolve uses the asof-join discipline (temporal_join.py): union
  dim rows and probe rows, one keyed window, last-non-null fill — ZERO
  join operators, so there is no per-event × per-version fan-out. The
  equivalent interval join (the oracle's formulation) would multiply
  every event by every version of its entity before filtering.
- upsert_merge shuffles each side once on the entity key and resolves
  with a single full-outer join; both "latest per key" reductions are
  window row_number=1 over the same partitioning Catalyst reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

UPSERT_CUTOFF = "2024-01-20"


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change points of the tracked attribute: rows where event_type
    differs from the entity's previous event (or is the first)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("attr"),
                F.col("ts").alias("valid_from"), "event_id")
    )


def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from the change log: (user_id, attr,
    valid_from, valid_to, version, is_current) with half-open
    [valid_from, valid_to) intervals; valid_to NULL on the open row."""
    chg = _changes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return chg.select(
        "user_id",
        "attr",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


def scd2_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of resolve: every event joined to the dimension version live at
    its timestamp — via the union+window as-of discipline (no join, no
    per-version fan-out; see temporal_join.asof_join)."""
    dim = scd2_build(spark, sf_dir).select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        "attr",
        "version",
        F.lit(1).alias("is_dim"),
    )
    probes = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("string").alias("attr"),
        F.lit(None).cast("long").alias("version"),
        F.lit(0).alias("is_dim"),
    )
    u = dim.unionByName(probes)
    # dim rows sort before probes at equal ts (a change event resolves to
    # the version it opens); event_id breaks any remaining tie.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_dim"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("attr", F.last("attr", ignorenulls=True).over(w))
        .withColumn("version", F.last("version", ignorenulls=True).over(w))
        .where(F.col("is_dim") == 0)
        .select("event_id", "user_id", "ts", "attr", "version")
    )


def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: fold the post-cutoff change log into the pre-cutoff base
    snapshot, last-writer-wins per entity. Output one row per entity in
    either side: final (attr, value), number of applied change rows, and
    the merge action (insert / update / carryover)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(UPSERT_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    base = (
        ev.where(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("base_attr"),
                F.col("value").alias("base_value"))
    )
    latest_chg = (
        ev.where(F.col("ts") >= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("chg_attr"),
                F.col("value").alias("chg_value"))
    )
    n_chg = (
        ev.where(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_changes"))
    )
    return (
        base.join(latest_chg, "user_id", "full_outer")
        .join(n_chg, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("chg_attr", "base_attr").alias("attr"),
            F.coalesce("chg_value", "base_value").alias("value"),
            F.coalesce("n_changes", F.lit(0)).cast("long").alias("n_changes"),
            F.when(F.col("base_attr").isNull(), "insert")
            .when(F.col("chg_attr").isNull(), "carryover")
            .otherwise("update")
            .alias("merge_action"),
        )
    )
