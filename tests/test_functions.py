"""Unit tests for the scalar function family (Pig eval UDF parity),
especially the markup processors."""

from __future__ import annotations

from pyspark.sql import functions as F

MARKUP = (
    "{{Infobox|name=x}} The '''quick''' [[brown fox|fox]] jumps"
    "<ref name=a>Smith 2001</ref> over [[lazy dog]].<br/>"
)


def test_extract_links(spark):
    from hedera_spark.functions import extract_links

    df = spark.createDataFrame([(MARKUP,)], "text string")
    links = df.select(extract_links("text").alias("l")).first()["l"]
    assert links == ["brown fox", "lazy dog"]


def test_extract_references(spark):
    from hedera_spark.functions import extract_references

    df = spark.createDataFrame([(MARKUP,)], "text string")
    refs = df.select(extract_references("text").alias("r")).first()["r"]
    assert refs == ["Smith 2001"]


def test_strip_markup(spark):
    from hedera_spark.functions import strip_markup

    df = spark.createDataFrame([(MARKUP,)], "text string")
    plain = df.select(strip_markup("text").alias("p")).first()["p"]
    assert plain == "The quick fox jumps over lazy dog."


def test_time_functions(spark):
    from hedera_spark import functions as hf

    df = spark.createDataFrame([(1704067200,)], "unix long")  # 2024-01-01 UTC
    row = df.select(
        hf.unix_to_yyyymmdd("unix").alias("ymd"),
        hf.one_day_more(F.timestamp_seconds(F.col("unix"))).alias("next"),
    ).first()
    assert row["ymd"] == "20240101"
    assert row["next"] == "20240102"


def test_extract_domain_and_cut_last(spark):
    from hedera_spark.functions import cut_last, extract_domain

    df = spark.createDataFrame([("src42",)], "source string")
    row = df.select(
        extract_domain(F.col("source")).alias("d"),
        cut_last("source").alias("c"),
    ).first()
    assert row["d"] == "src"
    assert row["c"] == "src4"
