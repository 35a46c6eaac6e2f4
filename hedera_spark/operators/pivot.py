"""Pivot / unpivot — the wide↔long reshaping surface.

The reference's pageview pipeline reshapes between long (one row per
title×hour) and wide (a day's 24 hourly counts packed into one
compact-encoded field) layouts (mapreduce/PreprocessEZPageviews.java
decodes the packed form; pig/pageview/* re-aggregate it). Spark states
the two directions declaratively: `groupBy().pivot(values=...)` and
`unpivot` — both single-shuffle when the pivot values are pinned.

Scale: passing the explicit value list to pivot() matters — without it
Spark runs an extra distinct job to discover the columns, and an
unbounded value domain would make the row width data-dependent. With a
pinned, bounded domain (the 5 event types), the pivot is ONE partial
agg shuffle to |days| rows, and unpivot is a map-only explode back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pv_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily matrix: one row per day, one (count, value-sum) pair of
    columns per event type — groupBy(day).pivot(event_type, pinned)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    wide = (
        ev.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    cols = [F.col("day")]
    for t in EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}"))
        cols.append(F.coalesce(F.col(f"{t}_sum_value"), F.lit(0.0)).alias(f"sum_{t}"))
    return wide.select(*cols)


def pv_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long form back out of the wide matrix: unpivot the per-type count
    columns to (day, event_type, n) — proving the reshape round-trips
    (rows with zero events that day are dropped, as in the source)."""
    wide = pv_pivot(spark, sf_dir)
    long = wide.unpivot(
        "day",
        [f"n_{t}" for t in EVENT_TYPES],
        "event_type",
        "n",
    ).where(F.col("n") > 0)
    return long.select(
        "day",
        F.expr("substring(event_type, 3)").alias("event_type"),
        "n",
    )
