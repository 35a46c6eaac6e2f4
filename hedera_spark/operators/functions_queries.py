"""Group E query vehicles: the scalar functions exercised over the test
tables so the oracle gate checks them value-by-value (SURVEY.md §2.E)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark import functions as hf
from hedera_spark.sources.tables import load_table


def time_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every time-conversion eval func over the event stream. Reference:
    pig/eval/UnixToYYYYMMdd.java, YYYYMMddHHToYYYYMMdd.java,
    OneDayMore.java, UnixToElasticTime.java."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("unix_sec"),
        hf.ts_to_yyyymmdd(F.col("ts")).alias("ymd"),
        hf.one_day_more(F.col("ts")).alias("ymd_next"),
        hf.unix_to_elastic_time(F.col("ts")).alias("iso_time"),
    )


def extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload field extraction + bucket aggregation. Reference:
    pig/eval/wikipedia/ExtractTemplate.java (pull typed params out of a
    nested payload)."""
    ev = load_table(spark, sf_dir, "events")
    k = hf.extract_prop(F.col("props"), "k").cast("int")
    return (
        ev.select("event_id", k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def extract_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain extraction + CutLast over the doc source ids. Reference:
    pig/eval/wikipedia/ExtractDomain.java, CutLast.java."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            hf.extract_domain(F.col("source")).alias("domain"),
            F.expr("substring(source, 1, length(source) - 1)").alias("cut_last"),
            "doc_id",
        )
        .groupBy("domain", "cut_last")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
