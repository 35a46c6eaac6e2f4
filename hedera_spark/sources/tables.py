"""Table registry over the parquet test data.

Plays the role of Hedera's loaders (reference: java/main/org/hedera/pig/load/
WikiRevisionLoader.java, LiteWikipediaLoader.java, FileNameLoader.java):
a single entry point that hands back analysis-ready DataFrames. Spark-first:
`spark.read.parquet` gives us column pruning + predicate pushdown for free,
so unlike the reference there is no bespoke split/reader machinery — Catalyst
plans the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    # Set at runtime (not only in our builder) so a driver-provided session
    # can read the nanosecond-timestamp parquet too; UTC keeps to_date /
    # date_format aligned with the tz-naive DuckDB oracle regardless of the
    # host session's zone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nanos columns arrive as LongType under the legacy conf; restore them
    # to TimestampType at microsecond precision (matching DuckDB's
    # ns→us truncation) so downstream operators see real timestamps.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql access)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
